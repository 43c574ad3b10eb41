"""Streaming dedup-on-ingest: the streaming analog of
``operators/dedup.py::incremental_dedup``.

A training-data ingest stream deduplicates as documents arrive, not in
nightly batches. Structured Streaming gives exactly this shape with
``dropDuplicatesWithinWatermark``: state holds one fingerprint per seen
document inside the watermark horizon; duplicates arriving within the
horizon are dropped; state is evicted past it, so memory is bounded by
(ingest rate × horizon), never corpus size. Cross-horizon exact dedup
remains the batch fingerprint-index anti-join (``incremental_dedup``) —
the standard two-tier design.

The fingerprint is the same canonical form the batch path uses
(``functions/textstats.py::fingerprint``), so a document dropped by the
stream is exactly the document the batch index would have flagged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..functions.textstats import fingerprint

DEDUP_WATERMARK = "10 minutes"


def streaming_dedup(
    docs: DataFrame, watermark: str = DEDUP_WATERMARK
) -> DataFrame:
    """``docs`` is a streaming frame with (doc_id, text, ts). Emits the
    first arrival of every distinct canonical fingerprint within the
    watermark horizon; later duplicates are dropped stateful-side.

    Uses ``dropDuplicatesWithinWatermark`` (event-time-bounded state)
    rather than ``dropDuplicates`` (unbounded state — a memory leak at
    10^12 docs)."""
    from pyspark.sql import functions as F

    fp = docs.withColumn("fp", fingerprint(F.col("text")))
    return fp.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(["fp"])


def streaming_curate(
    transcripts_stream: DataFrame, watermark: str = DEDUP_WATERMARK
) -> DataFrame:
    """The production ingest composite in ONE streaming query: the
    narrow mapInPandas extract stage, then dedup-on-ingest keyed on the
    canonical fingerprint of the EXTRACTED text (not the raw payload —
    two payloads with different markup but identical main content are
    one document). Per micro-batch cost: extraction O(rows) +
    one bounded-state dedup keyed on a 32-byte fingerprint.

    Input must carry (conv_id, turn_idx, text, ts); ts survives
    alongside the extraction output to drive the watermark."""
    from typing import Iterator

    import pandas as pd
    from pyspark.sql import functions as F

    from ..functions.extract import extract_turn_full

    def run(batches: "Iterator[pd.DataFrame]"):
        for pdf in batches:
            results = [
                extract_turn_full(t, int(i))
                for t, i in zip(pdf["text"], pdf["turn_idx"])
            ]
            yield pd.DataFrame(
                {
                    "conv_id": pdf["conv_id"].values,
                    "turn_idx": pdf["turn_idx"].astype("int32").values,
                    "extracted_text": [r["extracted_text"] for r in results],
                    "chars_extracted": [r["chars_extracted"] for r in results],
                    "ts": pdf["ts"].values,
                }
            )

    extracted = transcripts_stream.select(
        "conv_id", "turn_idx", "text", "ts"
    ).mapInPandas(
        run,
        schema=(
            "conv_id string, turn_idx int, extracted_text string, "
            "chars_extracted long, ts timestamp"
        ),
    )
    fp = extracted.withColumn("fp", fingerprint(F.col("extracted_text")))
    return fp.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(["fp"])
