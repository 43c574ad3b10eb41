"""Spark wiring of the extraction pipeline.

One lazy DataFrame DAG (SURVEY §3.1 translation):

    read → [mapInPandas: classify/tokenize/merge/mask/stamp]   (narrow, no shuffle)
         → preserved-block explode → serialize (pandas UDF)    (narrow)
         → enrichment left join on (conv_id, turn_idx)         (shuffle or broadcast)
         → finalize (sentinel substitution, fence strip)       (narrow)
         [→ optional per-conversation stitch]                  (shuffle on conv_id)

All per-row logic is Arrow-batched pandas (no row-at-a-time Python UDFs);
everything else is built-in Catalyst-planned DataFrame ops. The extract
stage is pipelined and shuffle-free, which is what makes near-linear
scaling achievable: per-partition work dominates, coordination is
O(partitions) (SURVEY §4).
"""

from __future__ import annotations

from typing import Iterator, Optional

import pandas as pd

from pyspark.sql import DataFrame, functions as F, types as T

from ..functions.extract import (
    enrich_skeleton,
    extract_turn,
    serialize_block,
    strip_code_fences,
)

_SKELETON_DDL = (
    "conv_id string, turn_idx int, kind string, skeleton string, "
    "spans array<struct<start:int,end:int,label:string,kept:boolean>>, "
    "preserved array<struct<kind:string,k:int,payload:string>>, "
    "n_blocks_kept int, n_blocks_dropped int"
)


def extract_stage(df: DataFrame, merge_visual: bool = False) -> DataFrame:
    """Stage 1: per-turn tokenize→merge→mask→stamp via ``mapInPandas``.

    Narrow transformation — each input partition maps to one output
    partition with zero shuffle; Arrow batch size bounds Python memory
    (``spark.sql.execution.arrow.maxRecordsPerBatch``).
    """

    mv = bool(merge_visual)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            results = [
                extract_turn(text, int(turn_idx), merge_visual=mv)
                for text, turn_idx in zip(pdf["text"], pdf["turn_idx"])
            ]
            yield pd.DataFrame(
                {
                    "conv_id": pdf["conv_id"].values,
                    "turn_idx": pdf["turn_idx"].astype("int32").values,
                    "kind": [r["kind"] for r in results],
                    "skeleton": [r["skeleton"] for r in results],
                    "spans": [
                        [
                            {"start": s, "end": e, "label": lb, "kept": kp}
                            for (s, e, lb, kp) in r["spans"]
                        ]
                        for r in results
                    ],
                    "preserved": [
                        [
                            {"kind": kind, "k": k, "payload": p}
                            for (kind, k, p) in r["preserved"]
                        ]
                        for r in results
                    ],
                    "n_blocks_kept": [r["n_blocks_kept"] for r in results],
                    "n_blocks_dropped": [r["n_blocks_dropped"] for r in results],
                }
            )

    return df.select("conv_id", "turn_idx", "text").mapInPandas(
        run, schema=_SKELETON_DDL
    )


@F.pandas_udf(T.StringType())
def _serialize_udf(payload: pd.Series) -> pd.Series:
    return payload.map(serialize_block)


def crops_stage(skeletons: DataFrame) -> DataFrame:
    """The "crop store" as a DataFrame (J2 analog, ``DLA.py:588-620``):
    explode preserved blocks, serialize each (X4'), and re-aggregate to
    one replacements array per turn. Counters ``k`` were assigned once in
    the extract stage, so stamp and crop enumerations agree (INV-3)."""
    exploded = (
        skeletons.select(
            "conv_id", "turn_idx", F.explode("preserved").alias("pb")
        )
        .select(
            "conv_id",
            "turn_idx",
            F.concat_ws("_", F.col("pb.kind"), F.col("pb.k")).alias("key"),
            _serialize_udf(F.col("pb.payload")).alias("content"),
        )
    )
    return exploded.groupBy("conv_id", "turn_idx").agg(
        F.collect_list(F.struct("key", "content")).alias("replacements")
    )


def finalize_stage(skeletons: DataFrame, crops: DataFrame) -> DataFrame:
    """Stage 2: the enrichment join (JN1, left join + missing-crop
    fallback, ``MarkdownEnricher.py:69-94``) followed by sentinel
    substitution (JN4 dict-callback, ``MarkdownEnricher.py:62-67``) and
    the code-fence strip (P9)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            texts = []
            for skeleton, reps in zip(pdf["skeleton"], pdf["replacements"]):
                mapping = {}
                if reps is not None:
                    for entry in reps:
                        mapping[entry["key"]] = entry["content"]
                texts.append(strip_code_fences(enrich_skeleton(skeleton, mapping)))
            out = pd.DataFrame(
                {
                    "conv_id": pdf["conv_id"].values,
                    "turn_idx": pdf["turn_idx"].astype("int32").values,
                    "extracted_text": texts,
                    "spans": pdf["spans"].values,
                    "n_blocks_kept": pdf["n_blocks_kept"].values,
                    "n_blocks_dropped": pdf["n_blocks_dropped"].values,
                }
            )
            out["chars_extracted"] = [len(t) for t in texts]
            yield out

    joined = skeletons.join(crops, ["conv_id", "turn_idx"], "left")
    return joined.mapInPandas(
        run,
        schema=(
            "conv_id string, turn_idx int, extracted_text string, "
            "spans array<struct<start:int,end:int,label:string,kept:boolean>>, "
            "n_blocks_kept int, n_blocks_dropped int, chars_extracted long"
        ),
    )


_OUTPUT_DDL = (
    "conv_id string, turn_idx int, extracted_text string, "
    "spans array<struct<start:int,end:int,label:string,kept:boolean>>, "
    "n_blocks_kept int, n_blocks_dropped int, chars_extracted long"
)


def fused_extract_stage(df: DataFrame, merge_visual: bool = False) -> DataFrame:
    """The whole per-turn pipeline — tokenize→merge→mask→stamp→serialize→
    enrich→fence-strip — in ONE narrow ``mapInPandas`` stage with zero
    shuffles.

    This is the scale-preferred physical strategy: unlike the reference,
    where crops are separate files that force a join
    (``MarkdownEnricher.py:69-94``), our preserved blocks never leave
    their row, so the "join" degenerates to an in-row lookup. ``explain``
    on the join variant shows Catalyst running the extract stage twice
    (once per join side) — a 2× cost the fused stage eliminates. The
    join variant remains below for shape parity and as the path you'd
    use if crops ever became a genuinely separate table.
    """
    from ..functions.extract import extract_turn_full

    mv = bool(merge_visual)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            results = [
                extract_turn_full(text, int(turn_idx), merge_visual=mv)
                for text, turn_idx in zip(pdf["text"], pdf["turn_idx"])
            ]
            yield pd.DataFrame(
                {
                    "conv_id": pdf["conv_id"].values,
                    "turn_idx": pdf["turn_idx"].astype("int32").values,
                    "extracted_text": [r["extracted_text"] for r in results],
                    "spans": [
                        [
                            {"start": s, "end": e, "label": lb, "kept": kp}
                            for (s, e, lb, kp) in r["spans"]
                        ]
                        for r in results
                    ],
                    "n_blocks_kept": [r["n_blocks_kept"] for r in results],
                    "n_blocks_dropped": [r["n_blocks_dropped"] for r in results],
                    "chars_extracted": [r["chars_extracted"] for r in results],
                }
            )

    return df.select("conv_id", "turn_idx", "text").mapInPandas(
        run, schema=_OUTPUT_DDL
    )


def blocks_table(df: DataFrame, merge_visual: bool = False) -> DataFrame:
    """Exploded block-level view (UDTF shape): one row per tokenized
    block with its label, keep-verdict and source span — the
    interpretability surface for 'why was this block dropped?'.
    Narrow mapInPandas; snippet is the raw source slice when offsets
    exist (html/plain), empty for box-addressed pdf blocks."""
    from ..functions.extract import extract_turn

    mv = bool(merge_visual)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "conv_id": [], "turn_idx": [], "block_idx": [],
                "label": [], "kept": [], "start": [], "end": [], "snippet": [],
            }
            for conv, turn, text in zip(pdf["conv_id"], pdf["turn_idx"], pdf["text"]):
                r = extract_turn(text, int(turn), merge_visual=mv)
                for bi, (s, e, lb, kp) in enumerate(r["spans"]):
                    out["conv_id"].append(conv)
                    out["turn_idx"].append(int(turn))
                    out["block_idx"].append(bi)
                    out["label"].append(lb)
                    out["kept"].append(bool(kp))
                    out["start"].append(s)
                    out["end"].append(e)
                    out["snippet"].append(text[s:e][:120] if s >= 0 and text else "")
            yield pd.DataFrame(out)

    return df.select("conv_id", "turn_idx", "text").mapInPandas(
        run,
        schema=(
            "conv_id string, turn_idx int, block_idx int, label string, "
            "kept boolean, start int, end int, snippet string"
        ),
    )


# O10 analog (OCR.py:62-79 downscales oversized images before the
# expensive call): guard against pathological payloads before the UDF.
MAX_PAYLOAD_CHARS = 1_000_000


def truncate_payloads(df: DataFrame, max_chars: int = MAX_PAYLOAD_CHARS) -> DataFrame:
    """Bound per-row payload size JVM-side (substring is codegen'd);
    adds a ``truncated`` flag column for lineage metrics."""
    return df.withColumn(
        "truncated", F.length("text") > max_chars
    ).withColumn(
        "text",
        F.when(F.col("truncated"), F.substring("text", 1, max_chars)).otherwise(
            F.col("text")
        ),
    )


def extract_pipeline(
    transcripts: DataFrame,
    merge_visual: bool = False,
    broadcast_crops: Optional[bool] = None,
    mode: str = "fused",
    max_payload_chars: Optional[int] = None,
    cache_skeletons: bool = True,
) -> DataFrame:
    """Full per-turn pipeline: transcripts in, OUTPUT_SCHEMA rows out.

    ``mode='fused'`` (default): one shuffle-free mapInPandas stage — see
    ``fused_extract_stage``.

    ``mode='join'``: the explicit JN1-shaped plan — extract skeletons,
    explode+serialize preserved blocks, left-join replacements back on
    ``(conv_id, turn_idx)``, substitute sentinels. Catalyst broadcasts
    the crop side when small; AQE handles the rest. Costs a second run
    of the extract stage (both join sides derive from it), which is why
    it is not the default.
    """
    if max_payload_chars is not None:
        transcripts = truncate_payloads(transcripts, max_payload_chars)
    if mode == "fused":
        return fused_extract_stage(transcripts, merge_visual=merge_visual)
    skeletons = extract_stage(transcripts, merge_visual=merge_visual)
    if cache_skeletons:
        # both join sides derive from the extract stage; without reuse
        # Catalyst runs the Python extract twice (measured 3.4× the
        # fused plan, round-1 bench). MEMORY_AND_DISK keeps the sandbox
        # honest; at corpus scale stage skeletons to a table instead.
        from pyspark import StorageLevel

        skeletons = skeletons.persist(StorageLevel.MEMORY_AND_DISK)
    crops = crops_stage(skeletons)
    if broadcast_crops:
        crops = F.broadcast(crops)
    return finalize_stage(skeletons, crops)


STITCH_SEP = "\n\n---\n\n"  # PageProcessor.py:112
_STITCH_CHUNK = 4096  # turns per salt bucket in the two-phase stitch


def stitch_conversations(per_turn: DataFrame) -> DataFrame:
    """A6 conversation stitch: ordered concat of turn texts per conv_id.

    Ordering comes from data (``array_sort`` over ``struct(turn_idx,
    text)``), never from the scheduler (O3 analog,
    ``PageProcessor.py:107-112``).
    """
    return (
        per_turn.groupBy("conv_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("turn_idx", "extracted_text"))
            ).alias("ordered"),
            F.count("*").alias("n_turns"),
            F.sum("chars_extracted").alias("chars_extracted"),
        )
        .select(
            "conv_id",
            "n_turns",
            "chars_extracted",
            F.array_join(F.col("ordered.extracted_text"), STITCH_SEP).alias(
                "conversation_text"
            ),
        )
    )


def stitch_conversations_grouped(per_turn: DataFrame) -> DataFrame:
    """A6 stitch as a grouped-map ``applyInPandas`` (the SURVEY §2.12
    UDF-surface form): one pandas frame per conversation, sorted and
    joined in Python. Semantically identical to the collect_list form;
    the aggregate form is preferred at scale (map-side partials), this
    one exists for groups needing arbitrary per-conversation Python."""
    import pandas as pd

    def stitch(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values("turn_idx", kind="stable")
        return pd.DataFrame(
            {
                "conv_id": [pdf["conv_id"].iloc[0]],
                "n_turns": [len(pdf)],
                "chars_extracted": [int(pdf["chars_extracted"].sum())],
                "conversation_text": [STITCH_SEP.join(pdf["extracted_text"])],
            }
        )

    return (
        per_turn.select("conv_id", "turn_idx", "extracted_text", "chars_extracted")
        .groupBy("conv_id")
        .applyInPandas(
            stitch,
            schema=(
                "conv_id string, n_turns long, chars_extracted long, "
                "conversation_text string"
            ),
        )
    )


def stitch_conversations_salted(
    per_turn: DataFrame, chunk: int = _STITCH_CHUNK
) -> DataFrame:
    """Skew-safe two-phase stitch (SURVEY §4 custom-handling #1): a
    pathological conversation with 10^6+ turns must not serialize one
    reducer. Phase 1 groups on ``(conv_id, salt)`` where
    ``salt = turn_idx div chunk`` covers a *contiguous* turn range, so
    partial concats are order-correct by construction; phase 2 concats
    the (few) salted partials in salt order. Both phases are hash
    aggregations with map-side partials."""
    partial = (
        per_turn.withColumn("salt", (F.col("turn_idx") / F.lit(chunk)).cast("int"))
        .groupBy("conv_id", "salt")
        .agg(
            F.array_join(
                F.array_sort(
                    F.collect_list(F.struct("turn_idx", "extracted_text"))
                ).extracted_text,
                STITCH_SEP,
            ).alias("partial_text"),
            F.count("*").alias("n_turns"),
            F.sum("chars_extracted").alias("chars_extracted"),
        )
    )
    return (
        partial.groupBy("conv_id")
        .agg(
            F.array_join(
                F.array_sort(F.collect_list(F.struct("salt", "partial_text"))).partial_text,
                STITCH_SEP,
            ).alias("conversation_text"),
            F.sum("n_turns").alias("n_turns"),
            F.sum("chars_extracted").alias("chars_extracted"),
        )
        .select("conv_id", "n_turns", "chars_extracted", "conversation_text")
    )
