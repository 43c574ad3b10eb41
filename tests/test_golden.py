"""Committed golden files (FIXTURES.md §3): the smoke corpus's expected
per-turn output, frozen at generation time. Any semantic drift in the
extraction core — intended or not — fails here and forces a conscious
golden regeneration. Both drivers (pandas oracle and Spark) must match
the goldens bit-for-bit."""

import json
import os

import pytest

from ocr_pipeline_fastapi_latency_optimization_spark import oracle
from ocr_pipeline_fastapi_latency_optimization_spark.operators.extraction import (
    extract_pipeline,
    stitch_conversations,
)
from ocr_pipeline_fastapi_latency_optimization_spark.sources.transcripts import (
    gen_transcripts,
    transcripts_df,
)

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden")


def _load(name):
    with open(os.path.join(GOLDEN_DIR, name)) as f:
        return [json.loads(line) for line in f]


@pytest.fixture(scope="module")
def corpus():
    return gen_transcripts(n_convs=20, mean_turns=10, seed=42)


def test_oracle_matches_golden(corpus):
    golden = _load("smoke_extract.jsonl")
    got = oracle.extract_frame(corpus).to_dict("records")
    assert len(got) == len(golden)
    for g, w in zip(got, golden):
        assert g["conv_id"] == w["conv_id"] and g["turn_idx"] == w["turn_idx"]
        assert g["extracted_text"] == w["extracted_text"], (
            g["conv_id"],
            g["turn_idx"],
        )
        assert g["spans"] == [
            {k: s[k] for k in ("start", "end", "label", "kept")} for s in w["spans"]
        ]
        assert g["chars_extracted"] == w["chars_extracted"]


def test_oracle_merge_visual_matches_golden(corpus):
    golden = _load("smoke_extract_mergevisual.jsonl")
    got = oracle.extract_frame(corpus, merge_visual=True).to_dict("records")
    for g, w in zip(got, golden):
        assert g["extracted_text"] == w["extracted_text"]


def test_spark_matches_golden(spark, corpus):
    golden = _load("smoke_extract.jsonl")
    got = (
        extract_pipeline(transcripts_df(spark, corpus))
        .toPandas()
        .sort_values(["conv_id", "turn_idx"], kind="stable")
        .to_dict("records")
    )
    assert len(got) == len(golden)
    for g, w in zip(got, golden):
        assert g["extracted_text"] == w["extracted_text"], (
            g["conv_id"],
            g["turn_idx"],
        )


def test_stitch_matches_golden(spark, corpus):
    golden = _load("smoke_stitch.jsonl")
    got = (
        stitch_conversations(extract_pipeline(transcripts_df(spark, corpus)))
        .toPandas()
        .sort_values("conv_id")
        .to_dict("records")
    )
    for g, w in zip(got, golden):
        assert g["conv_id"] == w["conv_id"]
        assert g["conversation_text"] == w["conversation_text"]
        assert g["n_turns"] == w["n_turns"]
