"""Fixed StructType schemas for the engine.

The reference's schemas are implicit (directory-layout conventions,
``FileIngestor.py:256-259``); ours are explicit and checked at read time
per ``BASELINE.json.input_hint``.
"""

from pyspark.sql import types as T

# Input: Iceberg/Parquet table of multi-turn transcripts.
TRANSCRIPTS_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
    ]
)

SPAN_TYPE = T.StructType(
    [
        T.StructField("start", T.IntegerType(), True),
        T.StructField("end", T.IntegerType(), True),
        T.StructField("label", T.StringType(), True),
        T.StructField("kept", T.BooleanType(), True),
    ]
)

PRESERVED_TYPE = T.StructType(
    [
        T.StructField("kind", T.StringType(), True),  # 'table' | 'figure'
        T.StructField("k", T.IntegerType(), True),  # per-(turn, kind) counter
        T.StructField("payload", T.StringType(), True),  # JSON for the serializer
    ]
)

# Intermediate: output of the tokenize→merge→mask→stamp mapInPandas stage.
SKELETON_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("kind", T.StringType(), True),  # 'plain'|'html'|'pdf'
        T.StructField("skeleton", T.StringType(), True),
        T.StructField("spans", T.ArrayType(SPAN_TYPE), True),
        T.StructField("preserved", T.ArrayType(PRESERVED_TYPE), True),
        T.StructField("n_blocks_kept", T.IntegerType(), True),
        T.StructField("n_blocks_dropped", T.IntegerType(), True),
    ]
)

# Final per-turn output (SURVEY.md §1.2).
OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("extracted_text", T.StringType(), True),
        T.StructField("spans", T.ArrayType(SPAN_TYPE), True),
        T.StructField("n_blocks_kept", T.IntegerType(), True),
        T.StructField("n_blocks_dropped", T.IntegerType(), True),
        T.StructField("chars_extracted", T.LongType(), True),
    ]
)

# Checkpoint/lineage table (the job-store analog, ocr_app.py:1243-1259).
CHECKPOINT_SCHEMA = T.StructType(
    [
        T.StructField("run_id", T.StringType(), False),
        T.StructField("bucket", T.IntegerType(), False),
        T.StructField("status", T.StringType(), False),  # queued|processing|completed|failed
        T.StructField("n_turns", T.LongType(), True),
        T.StructField("n_blocks_kept", T.LongType(), True),
        T.StructField("n_blocks_dropped", T.LongType(), True),
        T.StructField("chars_extracted", T.LongType(), True),
        T.StructField("created_at", T.TimestampType(), True),
        T.StructField("updated_at", T.TimestampType(), True),
    ]
)
