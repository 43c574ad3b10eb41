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
