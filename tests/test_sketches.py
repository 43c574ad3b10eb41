"""Count-min and HyperLogLog sketches: exact arithmetic replay against
pure-python references, the sketch guarantees (CMS never under-counts;
HLL estimator error), and MERGEABILITY — the property that makes a
fixed-size sketch the right structure at corpus scale (partial sketches
combine across partitions/snapshots without materializing the key
space)."""

import hashlib
import random

import pytest

from ocr_pipeline_fastapi_latency_optimization_spark.operators import sketches


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _mkdocs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _rand_corpus(n_docs, vocab, seed, tag=""):
    rng = random.Random(seed)
    return [
        (i, " ".join(f"{tag}t{rng.randrange(vocab)}" for _ in range(30)))
        for i in range(n_docs)
    ]


# --- count-min ----------------------------------------------------------------


def _cms_ref(tokens, depth, width):
    cells = {}
    for t in tokens:
        for s in range(depth):
            cells[(s, _h60(f"{t}:{s}") % width)] = (
                cells.get((s, _h60(f"{t}:{s}") % width), 0) + 1
            )
    return cells


def test_cms_matches_python_reference_with_forced_collisions(spark):
    """width=8 forces collisions on a 40-token vocabulary; estimates
    must still equal the python CMS replay exactly, and every
    overcount must be non-negative."""
    rows = _rand_corpus(20, 40, seed=7)
    docs = _mkdocs(spark, rows)
    out = sketches.cms_token_counts(
        spark, "", depth=3, width=8, k=1000, docs=docs
    ).toPandas()
    toks = [t for _, x in rows for t in x.split(" ")]
    cells = _cms_ref(toks, 3, 8)
    from collections import Counter

    exact = Counter(toks)
    assert len(out) == len(exact)
    for r in out.itertuples(index=False):
        est_ref = min(cells[(s, _h60(f"{r.token}:{s}") % 8)] for s in range(3))
        assert r.est_count == est_ref, r.token
        assert r.exact_count == exact[r.token]
        assert r.overcount >= 0
    assert (out.overcount > 0).any(), "width=8 must actually collide"


def test_cms_sketch_is_mergeable_by_cellwise_add(spark):
    """sketch(A ∪ B) == cell-wise sum of sketch(A) and sketch(B) — the
    associativity that lets partial sketches combine across partitions
    or ingest days."""
    a = _mkdocs(spark, _rand_corpus(10, 30, seed=1, tag="a"))
    b = _mkdocs(spark, _rand_corpus(10, 30, seed=2, tag="b"))
    ta, tb = sketches._tokens(a), sketches._tokens(b)
    sa = {
        (r.d, r.pos): r.cnt
        for r in sketches.cms_sketch(ta, 3, 16).toPandas().itertuples(index=False)
    }
    sb = {
        (r.d, r.pos): r.cnt
        for r in sketches.cms_sketch(tb, 3, 16).toPandas().itertuples(index=False)
    }
    su = {
        (r.d, r.pos): r.cnt
        for r in sketches.cms_sketch(ta.unionByName(tb), 3, 16)
        .toPandas()
        .itertuples(index=False)
    }
    merged = {}
    for k, v in list(sa.items()) + list(sb.items()):
        merged[k] = merged.get(k, 0) + v
    assert merged == su


def test_cms_rejects_bad_params(spark):
    with pytest.raises(ValueError):
        sketches.cms_token_counts(spark, "", depth=0)
    with pytest.raises(ValueError):
        sketches.cms_token_counts(spark, "", width=1)


# --- hyperloglog --------------------------------------------------------------


def _hll_ref_registers(tokens, log2m=sketches.HLL_LOG2M):
    m = 1 << log2m
    regs = {}
    for t in tokens:
        h = _h60(t)
        reg, w = h % m, h // m
        if w == 0:
            rank = sketches.HLL_WBITS + 1
        else:
            rank = sketches.HLL_WBITS + 1 - w.bit_length()
        regs[reg] = max(regs.get(reg, 0), rank)
    return regs


def test_hll_registers_match_python_reference(spark):
    rows = _rand_corpus(30, 500, seed=11)
    docs = _mkdocs(spark, rows)
    out = sketches.hll_register_sketch(spark, "", docs=docs).toPandas()
    got = dict(zip(out.register, out.max_rank))
    want = _hll_ref_registers(t for _, x in rows for t in x.split(" "))
    assert {int(k): int(v) for k, v in got.items()} == want


def test_hll_sketch_is_mergeable_by_registerwise_max(spark):
    a = _mkdocs(spark, _rand_corpus(15, 300, seed=3, tag="a"))
    b = _mkdocs(spark, _rand_corpus(15, 300, seed=4, tag="b"))
    ra = sketches.hll_register_sketch(spark, "", docs=a).toPandas()
    rb = sketches.hll_register_sketch(spark, "", docs=b).toPandas()
    ru = sketches.hll_register_sketch(
        spark, "", docs=a.unionByName(b)
    ).toPandas()
    merged = {}
    for df in (ra, rb):
        for r in df.itertuples(index=False):
            merged[int(r.register)] = max(
                merged.get(int(r.register), 0), int(r.max_rank)
            )
    assert merged == {
        int(r.register): int(r.max_rank) for r in ru.itertuples(index=False)
    }


def test_hll_estimate_relative_error(spark):
    """The harmonic estimator over the 256 integer registers lands
    within the ~3·(1.04/sqrt(256)) ≈ 20% envelope of the exact distinct
    count on a 2,000-distinct-token corpus (and the exact count is far
    outside the trivial guesses 0 and total-token-count)."""
    rng = random.Random(19)
    rows = [
        (i, " ".join(f"u{rng.randrange(4000)}" for _ in range(40)))
        for i in range(200)
    ]
    docs = _mkdocs(spark, rows)
    out = sketches.hll_register_sketch(spark, "", docs=docs).toPandas()
    regs = {int(r.register): int(r.max_rank) for r in out.itertuples(index=False)}
    est = sketches.hll_estimate(regs)
    exact = len({t for _, x in rows for t in x.split(" ")})
    assert exact > 2000
    assert abs(est - exact) / exact < 0.20, (est, exact)
