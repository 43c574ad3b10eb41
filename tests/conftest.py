import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from ocr_pipeline_fastapi_latency_optimization_spark.session import get_spark

    s = get_spark(app_name="tests", cpus=8, shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def band_collider():
    """(base_text, collider_text): a deterministic LSH false positive —
    the collider is the base doc (one repeated-token shingle) plus one
    searched suffix token, so shingle Jaccard is exactly 1/2 yet at
    least one MinHash band's sub-signature collides. Searched once per
    session with the same affine Python oracle the Spark expressions
    replicate; shared by the three false-positive tests so a family
    change (perms/bands/hash) re-searches in ONE place."""
    from ocr_pipeline_fastapi_latency_optimization_spark.operators.dedup import (
        MINHASH_BANDS,
        MINHASH_PERMS,
        minhash_signature_affine_py,
    )

    rows_per_band = MINHASH_PERMS // MINHASH_BANDS
    base = "alpha " * 5
    sa = minhash_signature_affine_py(base.strip())
    for i in range(20000):
        cand = base + f"tok{i}"
        sb = minhash_signature_affine_py(cand)
        if any(
            sa[b * rows_per_band : (b + 1) * rows_per_band]
            == sb[b * rows_per_band : (b + 1) * rows_per_band]
            for b in range(MINHASH_BANDS)
        ):
            return base.strip(), cand
    raise AssertionError("no banded collision in the search space")
