"""Planted-ground-truth property tests for the hash families that green
twin oracles cannot protect — the round-6 MinHash-modulus lesson: when
Spark, DuckDB, and the pandas oracle all replicate the same degenerate
math, every cross-engine comparison stays green while recall silently
dies. Each family here gets an INDEPENDENT oracle frozen in this file
(its own md5 arithmetic written from the algorithm's definition, never
imported from the package) plus an anti-degeneracy property that fails
under a deliberately-degenerate family constant:

* SimHash — independent signature oracle, banding output == brute-force
  Hamming ground truth on a planted radius pair (a constant-bit prefix
  slice or wrong band extraction fails), and per-bit balance over 400
  production-path signatures (a degenerate digest slice fails);
* winnowing — independent gram/window-minima oracle, and the theorem
  itself: ANY shared run of k+w-1 tokens yields >=1 shared fingerprint
  at arbitrary, different offsets (fails if selection or gram hashing
  drifts from the definition);
* bloom — exact (word, mask) bitmap equality against an independent
  bit-by-bit simulation, the zero-false-negative guarantee on a planted
  re-ingest batch, and a filter-population check (sum of bit_count ==
  oracle's distinct positions; k collapsed hash functions fail).
"""

import hashlib
import re

import pandas as pd
import pytest

from pyspark.sql import functions as F

from ocr_pipeline_fastapi_latency_optimization_spark.operators import dedup

# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def _simhash_oracle(text: str) -> int:
    """Independent 60-bit SimHash: +-1 vote per token md5 bit."""
    acc = [0] * 60
    for tok in text.split():
        h = int(hashlib.md5(tok.encode()).hexdigest()[:15], 16)
        for b in range(60):
            acc[b] += 1 if (h >> b) & 1 else -1
    return sum(1 << b for b in range(60) if acc[b] > 0)


def _hamming(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def _write_docs(spark, tmp_path, rows):
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    pdf["lang"], pdf["source"] = "en", "s"
    pdf["n_chars"] = pdf["text"].str.len()
    path = str(tmp_path / "pt")
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(
        f"{path}/documents.parquet"
    )
    return path


def test_simhash_banding_equals_bruteforce_on_planted_radius_pair(
    spark, tmp_path
):
    # plant a pair whose TRUE Hamming distance (independent oracle) is
    # in (0, radius]: start from an 80-token doc and find a single-token
    # substitution that lands there — deterministic search, no RNG
    base_toks = [f"pt{i}" for i in range(80)]
    base = " ".join(base_toks)
    sig0 = _simhash_oracle(base)
    planted = None
    for i in range(80):
        for r in range(40):
            toks = list(base_toks)
            toks[i] = f"sub{r}"
            cand = " ".join(toks)
            d = _hamming(sig0, _simhash_oracle(cand))
            if 0 < d <= dedup.SIMHASH_RADIUS:
                planted = (cand, d)
                break
        if planted:
            break
    assert planted is not None, "fixture search failed — family degenerate?"
    near, true_d = planted

    rows = [(0, base), (1, near)] + [
        (2 + j, " ".join(f"far{j}_{i}" for i in range(80))) for j in range(4)
    ]
    path = _write_docs(spark, tmp_path, rows)

    # production signatures must equal the independent oracle bit-for-bit
    sigs = {
        r["doc_id"]: r["simhash"]
        for r in dedup.simhash_signatures(spark, path).collect()
    }
    for doc_id, text in rows:
        assert sigs[doc_id] == _simhash_oracle(text), f"doc {doc_id}"

    # banded output == brute-force Hamming ground truth over ALL pairs
    # (recall AND precision — pigeonhole: radius<=3 with 4x15-bit bands)
    truth = set()
    for i, (da, ta) in enumerate(rows):
        for db, tb in rows[i + 1 :]:
            if _hamming(_simhash_oracle(ta), _simhash_oracle(tb)) <= (
                dedup.SIMHASH_RADIUS
            ):
                truth.add((da, db))
    got = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.simhash_near_dup_pairs(spark, path).collect()
    }
    assert got == truth
    assert (0, 1) in got  # the planted pair specifically
    got_d = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in dedup.simhash_near_dup_pairs(spark, path).collect()
    }
    assert got_d[(0, 1)] == true_d


def test_simhash_bits_balanced_over_production_signatures(spark, tmp_path):
    # single-token docs: the signature IS the token's 60-bit md5 prefix,
    # so each bit position should be ~Bernoulli(1/2) across 400 docs.
    # n=400, sigma=10: [120, 280] is an 8-sigma corridor — a degenerate
    # digest slice (constant or replicated hex chars) leaves some
    # position outside it.
    rows = [(i, f"balance{i}") for i in range(400)]
    path = _write_docs(spark, tmp_path, rows)
    sigs = [
        r["simhash"] for r in dedup.simhash_signatures(spark, path).collect()
    ]
    assert len(sigs) == 400
    for b in range(60):
        ones = sum((s >> b) & 1 for s in sigs)
        assert 120 <= ones <= 280, f"bit {b} set in {ones}/400 signatures"


# ---------------------------------------------------------------------------
# Winnowing
# ---------------------------------------------------------------------------


def _winnow_oracle(text: str, k: int = 4, w: int = 4) -> set:
    """Independent winnowing: k-token gram md5-60bit hashes, min of each
    w-window selected BY VALUE, distinct set."""
    toks = [t for t in text.split(" ") if t]
    if len(toks) < k:
        return set()
    gs = [
        int(
            hashlib.md5(" ".join(toks[p : p + k]).encode()).hexdigest()[:15],
            16,
        )
        for p in range(len(toks) - k + 1)
    ]
    return {min(gs[j : j + w]) for j in range(max(len(gs) - w + 1, 1))}


def test_winnowing_offset_robustness_theorem(spark, tmp_path):
    # THE winnowing guarantee (Schleimer et al.): any shared token run of
    # length >= k + w - 1 produces >= 1 shared fingerprint, wherever the
    # run sits in each document. k=4, w=4 -> run of EXACTLY 7 tokens —
    # the tight case: one full window of w identical grams exists in
    # both docs, and its BY-VALUE minimum is the same hash on each side.
    run = [f"run{i}" for i in range(dedup.WINNOW_K + dedup.WINNOW_W - 1)]
    doc_a = " ".join([f"a{i}" for i in range(11)] + run + [f"za{i}" for i in range(9)])
    doc_b = " ".join([f"b{i}" for i in range(23)] + run + [f"zb{i}" for i in range(3)])
    doc_c = " ".join(f"c{i}" for i in range(30))  # disjoint control

    rows = [(0, doc_a), (1, doc_b), (2, doc_c)]
    path = _write_docs(spark, tmp_path, rows)
    docs = spark.read.parquet(f"{path}/documents.parquet")

    # production fingerprint sets == independent oracle, per doc
    got = (
        dedup.winnow_fingerprints(docs)
        .groupBy("doc_id")
        .agg(F.collect_set("fp").alias("fps"))
        .collect()
    )
    got = {r["doc_id"]: set(r["fps"]) for r in got}
    for doc_id, text in rows:
        assert got[doc_id] == _winnow_oracle(text), f"doc {doc_id}"

    # the theorem's witness: the full shared window's min, computed
    # independently, is in BOTH production fingerprint sets
    shared_grams = [
        int(
            hashlib.md5(
                " ".join(run[p : p + dedup.WINNOW_K]).encode()
            ).hexdigest()[:15],
            16,
        )
        for p in range(dedup.WINNOW_W)
    ]
    witness = min(shared_grams)
    assert witness in got[0] and witness in got[1]

    # and the pair verdict surfaces it (min_shared=1 for the tight run)
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.winnowing_overlap(
            spark, path, docs=docs, min_shared=1
        ).collect()
    }
    assert (0, 1) in pairs
    assert not any(2 in p for p in pairs)  # disjoint control stays out


# ---------------------------------------------------------------------------
# Bloom
# ---------------------------------------------------------------------------


def _bloom_oracle_fp(text: str) -> str:
    return hashlib.md5(
        re.sub(r"\s+", " ", text.lower()).strip().encode()
    ).hexdigest()


def _bloom_oracle_positions(fp: str, m: int, k: int) -> list:
    return [
        int(hashlib.md5(f"{fp}:{s}".encode()).hexdigest()[:15], 16) % m
        for s in range(k)
    ]


def test_bloom_bitmap_and_membership_match_independent_simulation(
    spark, tmp_path
):
    m, k = dedup.BLOOM_BITS, dedup.BLOOM_HASHES
    existing = [(i, f"bloom existing doc {i} " + "x" * (i % 7)) for i in range(40)]
    reingest = [(100 + i, existing[i][1]) for i in range(20)]  # known members
    fresh = [(200 + i, f"bloom fresh doc {i}") for i in range(20)]
    rows = existing + reingest + fresh
    path = _write_docs(spark, tmp_path, rows)
    docs = spark.read.parquet(f"{path}/documents.parquet")

    # independent bit-by-bit simulation of the corpus filter
    want_words: dict[int, int] = {}
    npos = set()
    for _, text in existing:
        for pos in _bloom_oracle_positions(_bloom_oracle_fp(text), m, k):
            npos.add(pos)
            word, bit = divmod(pos, dedup.BLOOM_WORD_BITS)
            want_words[word] = want_words.get(word, 0) | (1 << bit)

    built = dedup.bloom_filter_words(
        docs.filter(F.col("doc_id") < 100), m, k
    ).collect()
    got_words = {r["word"]: r["mask"] for r in built}
    assert got_words == want_words  # exact bitmap equality

    # population check: collapsed hash functions set ~n bits, not ~k*n
    assert sum(bin(v).count("1") for v in got_words.values()) == len(npos)
    assert len(npos) >= 150  # 40 keys x 4 positions, collisions rare

    # membership verdicts: zero false negatives is the Bloom GUARANTEE —
    # every planted re-ingest must come back dup_candidate; at 160/61440
    # load the expected FP count over 20 fresh probes is ~1e-9, so any
    # fresh doc flagged dup_candidate is a real defect, not bad luck
    verdicts = {
        r["doc_id"]: r["verdict"]
        for r in dedup.bloom_dedup_probe(
            spark, path, boundary=100, m_bits=m, n_hashes=k, docs=docs
        ).collect()
    }
    for doc_id, _ in reingest:
        assert verdicts[doc_id] == "dup_candidate", f"false negative {doc_id}"
    for doc_id, _ in fresh:
        assert verdicts[doc_id] == "new", f"false positive {doc_id}"
