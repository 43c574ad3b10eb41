"""Sketch/winnowing scale rung: the round-6 additions measured at 1x
and 10x corpus size.

Corpus: synthetic unrelated documents (100 tokens each, vocabulary
scaled with N so natural duplication stays negligible), generated
entirely JVM-side (xxhash64(doc_id, pos) — deterministic, no driver
data). One ground-truth pair of locally-overlapping docs is planted per
1,000 docs: both members of a pair carry the same block-specific
12-token run, at DIFFERENT offsets (head vs middle) — so recall counts
exercise winnowing's offset robustness, and the ground-truth pair count
grows linearly with N (5 pairs at 5k docs, 50 at 50k).

Measured, at N = 5,000 and N = 50,000:

1. ``winnowing_overlap`` wall + emitted pair count + planted-pair
   recall. The honest scale claim: selected fingerprints grow linearly
   (~2/(w+1) of grams) and the max-df cap bounds any bucket's fan-out,
   so pair generation tracks the TRUE overlap present, not C(N,2).
2. ``bloom``: filter BUILD wall at each N, then the SAME fixed 500-doc
   probe batch against both filters. The claim unique to this family:
   probe wall is FLAT in corpus size because the filter is m bits at
   any N — the contrast to the round-5 finding that the persisted
   fingerprint-index probe was scan-bounded (1.69x per index decade)
   until storage pruning. Also reports the measured false-positive
   count on the novel probes (expected ~ (1-e^{-kn/m})^k).
3. ``cms_token_counts`` + ``hll_register_sketch`` wall at each N plus
   the materialized sketch row counts — constant (depth*width / <= 2^p)
   while the token count grows 10x — and the HLL estimate's relative
   error vs the exact distinct count at each N.

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
BASE_N = int(os.environ.get("SPARK_GRAFT_SKETCH_BASE_N", "5000"))
DOC_TOKENS = 100
RUN_TOKENS = 12  # > WINNOW_K + WINNOW_W - 1 = 7: guaranteed to fingerprint


def gen_docs(spark, n: int):
    """Deterministic unrelated corpus with one planted overlap pair per
    1,000 docs (members at doc_id % 1000 in {0, 1}; the shared run sits
    at the head of member 0 and mid-document in member 1)."""
    from pyspark.sql import functions as F

    vocab = 20 * n
    base_tok = (
        "transform(sequence(1, {dt}), p -> concat('t', "
        "pmod(xxhash64(doc_id, p), {v})))"
    ).format(dt=DOC_TOKENS, v=vocab)
    run = (
        "transform(sequence(1, {rt}), i -> concat('shared', "
        "CAST(doc_id div 1000 AS STRING), '_', CAST(i AS STRING)))"
    ).format(rt=RUN_TOKENS)
    toks = (
        f"CASE WHEN doc_id % 1000 = 0 THEN concat({run}, slice({base_tok}, "
        f"{RUN_TOKENS} + 1, {DOC_TOKENS} - {RUN_TOKENS})) "
        f"WHEN doc_id % 1000 = 1 THEN concat(slice({base_tok}, 1, 40), "
        f"{run}, slice({base_tok}, 41 + {RUN_TOKENS}, "
        f"{DOC_TOKENS} - 40 - {RUN_TOKENS})) "
        f"ELSE {base_tok} END"
    )
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.expr(f"array_join({toks}, ' ')").alias("text"),
    )


def main() -> None:
    from pyspark.sql import functions as F

    from ocr_pipeline_fastapi_latency_optimization_spark.operators import (
        dedup,
        sketches,
    )
    from ocr_pipeline_fastapi_latency_optimization_spark.session import get_spark

    spark = get_spark(cpus=CPUS)
    out = {"base_n": BASE_N, "cpus": CPUS, "levels": {}}

    # warm the session (python workers, codegen) outside all timings
    dedup.bloom_filter_words(gen_docs(spark, 100)).count()
    sketches.hll_register_sketch(spark, "", docs=gen_docs(spark, 100)).count()

    for mult in (1, 10):
        n = BASE_N * mult
        docs = gen_docs(spark, n)
        docs.cache()
        docs.count()  # materialize outside the timings
        lvl = {"n_docs": n}

        # fixed-SIZE probe batch per level: 250 members of THIS level's
        # corpus (true dups — the corpus text depends on n through the
        # vocabulary) + 250 novel docs. Batch size is what flatness is
        # claimed over; the filter is m bits at every level.
        members = docs.filter(F.col("doc_id") < 250)
        probe = members.unionByName(
            members.select(
                (F.col("doc_id") + 10_000_000).alias("doc_id"),
                F.concat(F.lit("novel "), F.col("text")).alias("text"),
            )
        )
        probe.cache().count()

        t0 = time.time()
        pairs = dedup.winnowing_overlap(spark, "", docs=docs, min_shared=1)
        rows = pairs.collect()
        lvl["winnow_wall_s"] = round(time.time() - t0, 3)
        lvl["winnow_pairs"] = len(rows)
        planted = {
            (b * 1000, b * 1000 + 1) for b in range(n // 1000)
        }
        got = {(r["doc_a"], r["doc_b"]) for r in rows}
        lvl["winnow_planted_recall"] = f"{len(planted & got)}/{len(planted)}"

        t0 = time.time()
        words = dedup.bloom_filter_words(docs)
        words.cache()
        lvl["bloom_words_rows"] = words.count()
        lvl["bloom_build_wall_s"] = round(time.time() - t0, 3)
        # probe the fixed batch against THIS level's filter via the
        # words frame directly (same plan as the index-table path)
        pb = (
            probe.select(
                "doc_id",
                F.md5(
                    F.trim(F.regexp_replace(F.lower("text"), r"\s+", " "))
                ).alias("fp"),
            )
            .select(
                "doc_id",
                F.explode(
                    dedup._bloom_positions(
                        "fp", dedup.BLOOM_BITS, dedup.BLOOM_HASHES
                    )
                ).alias("pos"),
            )
            .select(
                "doc_id",
                F.expr(f"pos div {dedup.BLOOM_WORD_BITS}").alias("word"),
                F.expr(f"pos % {dedup.BLOOM_WORD_BITS}").alias("bit"),
            )
        )
        hit = F.expr(
            "CASE WHEN mask IS NOT NULL AND "
            "(shiftright(mask, CAST(bit AS INT)) & 1L) = 1L THEN 1L ELSE 0L END"
        )
        t0 = time.time()
        verdicts = (
            pb.join(F.broadcast(words), "word", "left")
            .select("doc_id", hit.alias("hit"))
            .groupBy("doc_id")
            .agg(F.sum("hit").alias("bits_set"))
            .collect()
        )
        lvl["bloom_probe_wall_s"] = round(time.time() - t0, 3)
        dup = sum(1 for r in verdicts if r["bits_set"] == dedup.BLOOM_HASHES)
        lvl["bloom_dup_candidates"] = dup  # 250 true + false positives
        lvl["bloom_false_positives"] = dup - 250

        # the m-scales-with-n lever, EXECUTED: the fixed sandbox m
        # saturates as n grows (the FPR column above shows it); size m
        # from the corpus count by the standard formula
        # m = n·ln(1/p)/ln²2 at p = 1% and the false positives return
        # to ~1% of the novel half. (Production derives n from the HLL
        # sketch below — the cardinality statistic sizes the filter.)
        sized_m = ((int(9.585 * n) // dedup.BLOOM_WORD_BITS) + 1) * (
            dedup.BLOOM_WORD_BITS
        )
        sized_words = dedup.bloom_filter_words(docs, m_bits=sized_m)
        sized_words.cache().count()
        pb_sized = (
            probe.select(
                "doc_id",
                F.md5(
                    F.trim(F.regexp_replace(F.lower("text"), r"\s+", " "))
                ).alias("fp"),
            )
            .select(
                "doc_id",
                F.explode(
                    dedup._bloom_positions("fp", sized_m, dedup.BLOOM_HASHES)
                ).alias("pos"),
            )
            .select(
                "doc_id",
                F.expr(f"pos div {dedup.BLOOM_WORD_BITS}").alias("word"),
                F.expr(f"pos % {dedup.BLOOM_WORD_BITS}").alias("bit"),
            )
        )
        t0 = time.time()
        sized_verdicts = (
            pb_sized.join(F.broadcast(sized_words), "word", "left")
            .select("doc_id", hit.alias("hit"))
            .groupBy("doc_id")
            .agg(F.sum("hit").alias("bits_set"))
            .collect()
        )
        lvl["bloom_sized_m_bits"] = sized_m
        lvl["bloom_sized_probe_wall_s"] = round(time.time() - t0, 3)
        sized_dup = sum(
            1 for r in sized_verdicts if r["bits_set"] == dedup.BLOOM_HASHES
        )
        lvl["bloom_sized_false_positives"] = sized_dup - 250
        sized_words.unpersist()

        t0 = time.time()
        cms = sketches.cms_token_counts(spark, "", docs=docs).collect()
        lvl["cms_wall_s"] = round(time.time() - t0, 3)
        lvl["cms_max_overcount"] = max(r["overcount"] for r in cms)
        lvl["cms_sketch_rows"] = sketches.cms_sketch(
            sketches._tokens(docs)
        ).count()

        t0 = time.time()
        regs = sketches.hll_register_sketch(spark, "", docs=docs).collect()
        lvl["hll_wall_s"] = round(time.time() - t0, 3)
        lvl["hll_registers"] = len(regs)
        est = sketches.hll_estimate(
            {r["register"]: r["max_rank"] for r in regs}
        )
        exact = (
            sketches._tokens(docs).select("token").distinct().count()
        )
        lvl["hll_est"] = round(est, 1)
        lvl["hll_exact_distinct"] = exact
        lvl["hll_rel_err"] = round(abs(est - exact) / exact, 4)

        docs.unpersist()
        words.unpersist()
        probe.unpersist()
        out["levels"][f"{mult}x"] = lvl

    print(json.dumps(out))


if __name__ == "__main__":
    main()
