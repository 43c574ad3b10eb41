"""Digest goldens: sha256 over the oracle's full output for a 1907-turn
corpus (10× the smoke goldens) — a one-line tripwire that pins the
extraction semantics over a much larger payload mix than the committed
JSONL goldens, at zero storage cost. Any intentional semantic change
must update these two constants alongside tests/golden/*."""

import hashlib

from ocr_pipeline_fastapi_latency_optimization_spark import oracle
from ocr_pipeline_fastapi_latency_optimization_spark.sources.transcripts import (
    gen_transcripts,
)

N_TURNS = 1907
DIGEST = "a585f9d66a0831bc42309dd16bd97fff476ccd6c92a59c48a65ae75be2e8b462"
DIGEST_MERGE_VISUAL = (
    "26f6d899e0de4c1524e25f64d0a640e5ca7169e7d7f39b472989a686bef7927d"
)


def _corpus():
    return gen_transcripts(n_convs=200, mean_turns=10, seed=1234)


def test_digest_golden():
    out = oracle.extract_frame(_corpus())
    assert len(out) == N_TURNS
    h = hashlib.sha256()
    for _, r in out.iterrows():
        h.update(
            f"{r['conv_id']}\x00{r['turn_idx']}\x00{r['extracted_text']}\x00"
            f"{r['chars_extracted']}\x1e".encode()
        )
    assert h.hexdigest() == DIGEST


def test_digest_golden_merge_visual():
    mv = oracle.extract_frame(_corpus(), merge_visual=True)
    h = hashlib.sha256()
    for _, r in mv.iterrows():
        h.update(f"{r['extracted_text']}\x1e".encode())
    assert h.hexdigest() == DIGEST_MERGE_VISUAL
