"""Streaming sketch maintenance: corpus statistics that update per
micro-batch with bounded state and replay-idempotent storage.

The batch sketches (``operators/sketches.py``) merge associatively —
CMS by cell-wise ``+``, HLL by register-wise ``max``. That is the whole
streaming design: each micro-batch writes ITS OWN partial sketch to a
``batch_id=`` partition directory (overwriting it, so a foreachBatch
retry after a crash-before-checkpoint replays to the identical bytes —
the ``streaming_semantic_verdicts`` idempotence pattern; note a plain
cumulative read-merge-write would DOUBLE-COUNT CMS cells on replay,
which is exactly why partial-per-batch is the layout), and the current
corpus statistic is the merge over partials at read time. The merge
reads ≤ cells·batches rows — bounded state per batch, tiny forever at
sandbox scale; a long-running production stream compacts old partials
with the same merge (associativity makes compaction trivially correct).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.sketches import (
    CMS_DEPTH,
    CMS_WIDTH,
    cms_sketch,
    hll_register_sketch,
    _tokens,
)


def streaming_sketch_update(
    spark: SparkSession,
    docs_stream: DataFrame,
    out_path: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
):
    """foreachBatch writer maintaining partial CMS + HLL sketches under
    ``out_path`` (one ``batch_id=`` partial per micro-batch for each
    sketch). Call ``.start()`` with a checkpoint location on the
    returned writer."""

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        batch = batch_df.select("doc_id", "text")
        if batch.isEmpty():
            return
        cms_sketch(_tokens(batch), depth, width).write.mode(
            "overwrite"
        ).parquet(f"{out_path}/cms/batch_id={int(batch_id)}")
        hll_register_sketch(spark, "", docs=batch).write.mode(
            "overwrite"
        ).parquet(f"{out_path}/hll/batch_id={int(batch_id)}")

    return docs_stream.writeStream.foreachBatch(handle)


def read_cms(spark: SparkSession, out_path: str) -> DataFrame:
    """Current CMS over everything streamed so far: cell-wise sum of
    the per-batch partials."""
    return (
        spark.read.parquet(f"{out_path}/cms")
        .groupBy("d", "pos")
        .agg(F.sum("cnt").alias("cnt"))
    )


def read_hll(spark: SparkSession, out_path: str) -> DataFrame:
    """Current HLL registers over everything streamed so far:
    register-wise max of the per-batch partials."""
    return (
        spark.read.parquet(f"{out_path}/hll")
        .groupBy("register")
        .agg(F.max("max_rank").alias("max_rank"))
        .orderBy("register")
    )
