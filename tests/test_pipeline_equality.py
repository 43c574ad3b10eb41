"""The north-rule gate: the Spark pipeline's per-turn output must equal
the single-node pandas oracle bit-for-bit under stable (conv_id, turn_idx)
ordering — over the full deterministic synthetic corpus (all payload
kinds, shuffled input order, both merge_visual settings), plus the
conversation stitch and the skew-salted stitch variant."""

import pandas as pd
import pytest

from ocr_pipeline_fastapi_latency_optimization_spark import oracle
from ocr_pipeline_fastapi_latency_optimization_spark.operators.extraction import (
    extract_pipeline,
    stitch_conversations,
    stitch_conversations_salted,
)
from ocr_pipeline_fastapi_latency_optimization_spark.sources.transcripts import (
    gen_transcripts,
    transcripts_df,
)


@pytest.fixture(scope="module")
def corpus():
    return gen_transcripts(n_convs=20, mean_turns=10, seed=42)


def _spark_per_turn(spark, pdf, **kw) -> pd.DataFrame:
    df = extract_pipeline(transcripts_df(spark, pdf), **kw)
    out = df.toPandas()
    return out.sort_values(["conv_id", "turn_idx"], kind="stable").reset_index(
        drop=True
    )


def test_per_turn_equality(spark, corpus):
    got = _spark_per_turn(spark, corpus)
    want = oracle.extract_frame(corpus)
    assert len(got) == len(want) == len(corpus)
    assert got["conv_id"].tolist() == want["conv_id"].tolist()
    assert got["turn_idx"].tolist() == want["turn_idx"].tolist()
    # bit-exact text equality, every turn
    mismatches = [
        (c, t, a, b)
        for c, t, a, b in zip(
            got["conv_id"], got["turn_idx"], got["extracted_text"], want["extracted_text"]
        )
        if a != b
    ]
    assert mismatches == []
    assert got["n_blocks_kept"].tolist() == want["n_blocks_kept"].tolist()
    assert got["n_blocks_dropped"].tolist() == want["n_blocks_dropped"].tolist()
    assert got["chars_extracted"].tolist() == want["chars_extracted"].tolist()
    # spans equality (struct rows come back as Row objects)
    def norm(span) -> tuple:
        return (span["start"], span["end"], span["label"], span["kept"])

    for g, w in zip(got["spans"], want["spans"]):
        assert [norm(x) for x in g] == [norm(x) for x in w]


def test_per_turn_equality_merge_visual(spark, corpus):
    got = _spark_per_turn(spark, corpus, merge_visual=True)
    want = oracle.extract_frame(corpus, merge_visual=True)
    assert got["extracted_text"].tolist() == want["extracted_text"].tolist()


def test_join_mode_same_result(spark, corpus):
    got = _spark_per_turn(spark, corpus, mode="join")
    want = oracle.extract_frame(corpus)
    assert got["extracted_text"].tolist() == want["extracted_text"].tolist()


def test_join_mode_broadcast_same_result(spark, corpus):
    got = _spark_per_turn(spark, corpus, mode="join", broadcast_crops=True)
    want = oracle.extract_frame(corpus)
    assert got["extracted_text"].tolist() == want["extracted_text"].tolist()


def test_stitch_equality(spark, corpus):
    per_turn = extract_pipeline(transcripts_df(spark, corpus))
    got = (
        stitch_conversations(per_turn)
        .toPandas()
        .sort_values("conv_id", kind="stable")
        .reset_index(drop=True)
    )
    want = oracle.stitch_frame(oracle.extract_frame(corpus))
    assert got["conv_id"].tolist() == want["conv_id"].tolist()
    assert got["conversation_text"].tolist() == want["conversation_text"].tolist()
    assert got["n_turns"].tolist() == want["n_turns"].tolist()


def test_grouped_map_stitch_matches_plain(spark, corpus):
    from ocr_pipeline_fastapi_latency_optimization_spark.operators.extraction import (
        stitch_conversations_grouped,
    )

    per_turn = extract_pipeline(transcripts_df(spark, corpus))
    plain = (
        stitch_conversations(per_turn)
        .toPandas()
        .sort_values("conv_id")
        .reset_index(drop=True)
    )
    grouped = (
        stitch_conversations_grouped(per_turn)
        .toPandas()
        .sort_values("conv_id")
        .reset_index(drop=True)
    )
    assert plain["conversation_text"].tolist() == grouped["conversation_text"].tolist()
    assert plain["n_turns"].tolist() == grouped["n_turns"].tolist()
    assert plain["chars_extracted"].tolist() == grouped["chars_extracted"].tolist()


def test_salted_stitch_matches_plain(spark):
    # skewed corpus: one conversation much longer than the rest; the
    # two-phase salted stitch must produce the identical ordered concat
    pdf = gen_transcripts(
        n_convs=5, mean_turns=6, seed=7, skew_conv="conv000000", skew_turns=500
    )
    per_turn = extract_pipeline(transcripts_df(spark, pdf))
    plain = (
        stitch_conversations(per_turn)
        .toPandas()
        .sort_values("conv_id")
        .reset_index(drop=True)
    )
    salted = (
        stitch_conversations_salted(per_turn, chunk=64)
        .toPandas()
        .sort_values("conv_id")
        .reset_index(drop=True)
    )
    assert plain["conversation_text"].tolist() == salted["conversation_text"].tolist()
    assert plain["n_turns"].tolist() == salted["n_turns"].tolist()
    assert plain["chars_extracted"].tolist() == salted["chars_extracted"].tolist()
