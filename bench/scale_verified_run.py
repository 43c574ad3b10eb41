"""Verified-dedup scale rung: the exact-Jaccard verify tier measured
at 1x and 10x corpus size.

Corpus: synthetic unrelated documents (100 tokens each, vocabulary
scaled with N), generated JVM-side. Planted per 500 docs:

- a TRUE near-dup pair (member 1 = member 0's text + a 3-token suffix;
  shingle Jaccard ~ 0.97, above the 0.8 criterion) — these must VERIFY
  and cluster, so planted recall is countable and grows linearly;
- a SUB-THRESHOLD candidate pair (member 2 = member 0's first 70
  tokens + 30 novel; Jaccard ~ 0.52 < 0.8, but ~ 0.52^4 per band gives
  each of the 8 bands a real collision chance) — when these collide
  they are candidates the verify must REJECT, so the rejected count is
  a live, N-proportional demonstration of what the tier is for.

Measured at N = 5,000 and N = 50,000:

1. ``verified_near_dedup`` wall, raw candidate count, verified-pair
   count, rejected count, and planted true-pair recall. The scale
   claim: verify cost tracks CANDIDATES (bounded by the banding
   family), never C(N,2).
2. ``minhash_verified_verdicts_for_batch``: the SAME fixed 500-doc
   batch (250 true dups of corpus docs + 250 novel) probed against a
   persisted index of EACH level's corpus — wall + verdict counts.
   The claim: probe wall is ~flat across the index decade (pruned
   scan + O(matched) partner-text fetch), the same flatness the
   pruned fingerprint probe and the bloom probe established for their
   families.

Prints ONE JSON line (BASELINE.md section maintained by hand from it,
same policy as the other rungs). Run on an otherwise idle machine.
"""

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
BASE_N = int(os.environ.get("SPARK_GRAFT_VERIFIED_BASE_N", "5000"))
DOC_TOKENS = 100


def gen_docs(spark, n: int):
    """Deterministic corpus; per 500-doc block: ids %500==0/1 are a
    true near-dup pair, ids %500==2 a sub-threshold candidate of the
    block head."""
    from pyspark.sql import functions as F

    vocab = 20 * n
    head_tok = (
        "transform(sequence(1, {dt}), p -> concat('t', "
        "pmod(xxhash64(CAST(doc_id div 500 AS LONG) * 500, p), {v})))"
    ).format(dt=DOC_TOKENS, v=vocab)
    own_tok = (
        "transform(sequence(1, {dt}), p -> concat('t', "
        "pmod(xxhash64(doc_id, p), {v})))"
    ).format(dt=DOC_TOKENS, v=vocab)
    novel30 = (
        "transform(sequence(1, 30), p -> concat('n', "
        "pmod(xxhash64(doc_id, -p), {v})))"
    ).format(v=vocab)
    toks = (
        f"CASE WHEN doc_id % 500 = 0 THEN {head_tok} "
        f"WHEN doc_id % 500 = 1 THEN concat({head_tok}, "
        "array('sfx1', 'sfx2', 'sfx3')) "
        f"WHEN doc_id % 500 = 2 THEN concat(slice({head_tok}, 1, 70), {novel30}) "
        f"ELSE {own_tok} END"
    )
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.expr(f"array_join({toks}, ' ')").alias("text"),
    )


def main() -> None:
    import tempfile

    from pyspark.sql import functions as F

    from ocr_pipeline_fastapi_latency_optimization_spark.operators import dedup
    from ocr_pipeline_fastapi_latency_optimization_spark.session import get_spark

    spark = get_spark(cpus=CPUS)
    out = {"base_n": BASE_N, "cpus": CPUS, "levels": {}}

    # warm the session outside all timings
    dedup.verified_near_dedup(spark, "", docs=gen_docs(spark, 200)).count()

    for mult in (1, 10):
        n = BASE_N * mult
        docs = gen_docs(spark, n)
        docs.cache()
        docs.count()
        lvl = {"n_docs": n}

        # raw candidates via the shared builder pieces (count only)
        sig = dedup.minhash_signatures(docs, hash_fn="md5_affine")
        b = dedup.minhash_band_buckets(sig)
        a1, a2 = b.alias("a"), b.alias("b")
        raw = (
            a1.join(
                a2,
                (F.col("a.band") == F.col("b.band"))
                & (F.col("a.bucket") == F.col("b.bucket"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
            .distinct()
        )
        lvl["raw_candidates"] = raw.count()
        ver = dedup._verified_pairs(spark, "", docs=docs)
        lvl["verified_pairs"] = ver.count()
        lvl["rejected_candidates"] = lvl["raw_candidates"] - lvl["verified_pairs"]

        t0 = time.time()
        verdicts = dedup.verified_near_dedup(spark, "", docs=docs)
        rows = verdicts.filter(~F.col("keep")).collect()
        lvl["verified_dedup_wall_s"] = round(time.time() - t0, 3)
        lvl["docs_dropped"] = len(rows)
        # planted true pairs: (500k, 500k+1) must share a cluster,
        # i.e. the higher id is dropped
        dropped = {r["doc_id"] for r in rows}
        planted = [500 * k + 1 for k in range(n // 500)]
        rec = sum(1 for d in planted if d in dropped)
        lvl["planted_recall"] = f"{rec}/{len(planted)}"

        # incremental probe: fixed 500-doc batch vs THIS level's index
        name = f"t_vrung_{mult}"
        d = tempfile.mkdtemp()
        dedup.persist_minhash_index(spark, docs, name, f"{d}/idx")
        members = docs.filter(F.col("doc_id") < 250)
        batch = members.select(
            (F.col("doc_id") + 10_000_000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" xtra1 xtra2")).alias("text"),
        ).unionByName(
            members.select(
                (F.col("doc_id") + 20_000_000).alias("doc_id"),
                F.concat(F.lit("novel "), F.reverse(F.col("text"))).alias("text"),
            )
        )
        batch.cache().count()
        t0 = time.time()
        v = dedup.minhash_verified_verdicts_for_batch(spark, batch, name, docs)
        counts = {r["verdict"]: r["n"] for r in v.groupBy("verdict").agg(
            F.count("*").alias("n")).collect()}
        lvl["probe_wall_s"] = round(time.time() - t0, 3)
        lvl["probe_verdicts"] = counts
        spark.sql(f"DROP TABLE IF EXISTS {name}")

        docs.unpersist()
        out["levels"][str(mult)] = lvl

    print(json.dumps(out))


if __name__ == "__main__":
    main()
