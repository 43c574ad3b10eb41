"""MERGE emulation semantics, the status-lifecycle upsert, payload
truncation guard, and the FIXTURES skew bound (salting keeps the salted
stitch's partial-group sizes bounded)."""

import pandas as pd

from pyspark.sql import functions as F

from ocr_pipeline_fastapi_latency_optimization_spark.operators.extraction import (
    extract_pipeline,
    truncate_payloads,
)
from ocr_pipeline_fastapi_latency_optimization_spark.plans.merge import (
    merge_upsert,
    scd2_upsert,
)
from ocr_pipeline_fastapi_latency_optimization_spark.sources.transcripts import (
    gen_transcripts,
    transcripts_df,
)


def _jobs(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["run_id", "bucket", "status", "n_turns"])
    )


def test_merge_upsert_updates_and_inserts(spark, tmp_path):
    target = str(tmp_path / "lineage")
    merge_upsert(
        spark,
        target,
        _jobs(spark, [("r1", 0, "queued", 0), ("r1", 1, "queued", 0)]),
        keys=["run_id", "bucket"],
    )
    # transition bucket 0 → completed, add bucket 2
    merge_upsert(
        spark,
        target,
        _jobs(spark, [("r1", 0, "completed", 57), ("r1", 2, "processing", 0)]),
        keys=["run_id", "bucket"],
    )
    out = (
        spark.read.parquet(target)
        .orderBy("bucket")
        .select("bucket", "status", "n_turns")
        .collect()
    )
    assert [tuple(r) for r in out] == [
        (0, "completed", 57),
        (1, "queued", 0),
        (2, "processing", 0),
    ]


def test_merge_upsert_idempotent(spark, tmp_path):
    target = str(tmp_path / "lineage")
    rows = [("r1", 0, "completed", 10)]
    merge_upsert(spark, target, _jobs(spark, rows), keys=["run_id", "bucket"])
    merge_upsert(spark, target, _jobs(spark, rows), keys=["run_id", "bucket"])
    assert spark.read.parquet(target).count() == 1


def test_scd2_keeps_history(spark, tmp_path):
    target = str(tmp_path / "dim")
    scd2_upsert(
        spark, target, _jobs(spark, [("r1", 0, "queued", 0)]), keys=["run_id", "bucket"]
    )
    scd2_upsert(
        spark,
        target,
        _jobs(spark, [("r1", 0, "completed", 9)]),
        keys=["run_id", "bucket"],
    )
    out = spark.read.parquet(target).orderBy("is_current").collect()
    assert len(out) == 2
    assert [r["status"] for r in out if r["is_current"]] == ["completed"]
    assert [r["status"] for r in out if not r["is_current"]] == ["queued"]


def test_truncate_payload_guard(spark):
    pdf = gen_transcripts(n_convs=2, mean_turns=3, seed=1)
    pdf.loc[0, "text"] = "x" * 5000 + " tail that must disappear"
    df = truncate_payloads(transcripts_df(spark, pdf), max_chars=5000)
    got = df.filter(F.col("truncated")).collect()
    assert len(got) == 1
    assert len(got[0]["text"]) == 5000
    # pipeline runs fine on the truncated corpus
    out = extract_pipeline(
        transcripts_df(spark, pdf), max_payload_chars=5000
    ).toPandas()
    assert len(out) == len(pdf)


def test_salting_bounds_group_sizes(spark):
    """FIXTURES §1 skew test: one conversation with ~100x the turns of the
    others; the salted stitch's phase-1 groups must stay bounded by the
    chunk size (no single reducer sees the whole skew conv)."""
    corpus = gen_transcripts(
        n_convs=8, mean_turns=4, seed=21, skew_conv="conv000000", skew_turns=400
    )
    per_turn = extract_pipeline(transcripts_df(spark, corpus))
    chunk = 32
    groups = (
        per_turn.withColumn("salt", (F.col("turn_idx") / chunk).cast("int"))
        .groupBy("conv_id", "salt")
        .count()
        .collect()
    )
    sizes = [r["count"] for r in groups]
    assert max(sizes) <= chunk
    skew_groups = [r for r in groups if r["conv_id"] == "conv000000"]
    assert len(skew_groups) == 400 // chunk + (1 if 400 % chunk else 0)
