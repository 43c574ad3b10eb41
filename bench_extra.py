"""Optimization-round measurement harness (guide §1.1/§1.4) — NOT the
number of record (`bench.py` is frozen for measurement; this file only
isolates and explains).

Usage:
    python bench_extra.py --list
    python bench_extra.py --plan  <query> [--out plans/r08/x_before.txt]
    python bench_extra.py --time  <query> [--reps 5] [--no-warm]
    python bench_extra.py --plans-all <dir>      # dump every plan
    python bench_extra.py --time-all [--reps 3]  # JSON line like bench.py

Each query builder returns the SAME DataFrame the frozen bench.py times,
built from the same inputs ($SPARK_GRAFT_SF_DIR + the cached synthetic
transcript corpus). Timing uses the noop sink so the computation is
measured, not the sink; jobs are labeled via setJobDescription.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
BENCH_CONVS = int(os.environ.get("SPARK_GRAFT_BENCH_CONVS", "12000"))
MEAN_TURNS = int(os.environ.get("SPARK_GRAFT_BENCH_MEAN_TURNS", "12"))
SEED = 42
CORPUS_DIR = f"/tmp/spark_graft_bench_corpus_c{BENCH_CONVS}_m{MEAN_TURNS}_s{SEED}"


def _force(df) -> int:
    df.write.format("noop").mode("overwrite").save()
    return 0


def _builders(spark):
    """name -> zero-arg builder returning the DataFrame bench.py times."""
    from pyspark.sql import functions as F

    from ocr_pipeline_fastapi_latency_optimization_spark.functions.textstats import (
        bpe_ish_token_count,
        fingerprint,
        lang_id,
        quality_score_e4,
        token_count,
    )
    from ocr_pipeline_fastapi_latency_optimization_spark.operators import (
        chunking,
        curation,
        dedup,
        embedding,
        maintenance,
        similarity,
        sketches,
    )
    from ocr_pipeline_fastapi_latency_optimization_spark.operators.extraction import (
        blocks_table,
        extract_pipeline,
        stitch_conversations_salted,
    )
    from ocr_pipeline_fastapi_latency_optimization_spark.sources.transcripts import (
        documents_as_transcripts,
        gen_transcripts_spark,
        read_transcripts,
    )

    if not os.path.exists(os.path.join(CORPUS_DIR, "_SUCCESS")):
        gen_transcripts_spark(
            spark, BENCH_CONVS, MEAN_TURNS, seed=SEED, partitions=CPUS * 2
        ).write.mode("overwrite").parquet(CORPUS_DIR)
    corpus = read_transcripts(spark, CORPUS_DIR)
    per_turn_dir = f"{CORPUS_DIR}_per_turn"
    if not os.path.exists(os.path.join(per_turn_dir, "_SUCCESS")):
        extract_pipeline(corpus).write.mode("overwrite").parquet(per_turn_dir)
    per_turn = spark.read.parquet(per_turn_dir)

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    stats = docs.select(
        "doc_id",
        token_count(F.col("text")).alias("n_tok"),
        bpe_ish_token_count(F.col("text")).alias("n_bpe"),
        quality_score_e4(F.col("text")).alias("q"),
        lang_id(F.col("text")).alias("lang"),
        fingerprint(F.col("text")).alias("fp"),
    )

    def _sem_decon():
        d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        ev = d.filter(F.col("doc_id") % 13 == 0).select(
            "doc_id",
            F.concat(F.col("text"), F.lit(" heldout benchmark answer")).alias(
                "text"
            ),
        )
        return curation.semantic_decontaminate(spark, SF_DIR, eval_docs=ev)

    return {
        "extract_transcripts": lambda: extract_pipeline(corpus),
        "extract_join_mode": lambda: extract_pipeline(corpus, mode="join"),
        "extract_documents": lambda: extract_pipeline(
            documents_as_transcripts(spark, SF_DIR)
        ),
        "stitch_salted": lambda: stitch_conversations_salted(per_turn),
        "dedup_minhash_lsh": lambda: dedup.minhash_lsh_pairs(
            spark, SF_DIR, hash_fn="affine"
        ),
        "dedup_exact": lambda: dedup.exact_duplicate_groups(spark, SF_DIR),
        "verified_near_dedup": lambda: dedup.verified_near_dedup(spark, SF_DIR),
        "knn_ivf": lambda: similarity.ivf_knn(spark, SF_DIR),
        "textstats": lambda: stats,
        "pii_mask": lambda: curation.pii_mask(spark, SF_DIR),
        "boilerplate_lines": lambda: curation.boilerplate_lines(spark, SF_DIR),
        "quality_threshold_filter": lambda: curation.quality_threshold_filter(
            spark, SF_DIR
        ),
        "curation_funnel_full": lambda: curation.curation_funnel_full(
            spark, SF_DIR
        ),
        "embed_documents": lambda: embedding.embed_documents(spark, SF_DIR),
        "semantic_text_dedup": lambda: embedding.semantic_dedup_text_corpus(
            spark, SF_DIR
        ),
        "semantic_text_dedup_domain": lambda: (
            embedding.semantic_dedup_text_by_domain(spark, SF_DIR)
        ),
        "semantic_text_dedup_clustered": lambda: (
            embedding.semantic_dedup_text_clustered(spark, SF_DIR)
        ),
        "ccnet_perplexity_buckets": lambda: curation.ccnet_perplexity_buckets(
            spark, SF_DIR
        ),
        "semantic_decontaminate": _sem_decon,
        "substring_span_dedup": lambda: dedup.substring_span_dedup(spark, SF_DIR),
        "lm_bigram_score": lambda: curation.lm_bigram_score(spark, SF_DIR),
        "winnowing_overlap": lambda: dedup.winnowing_overlap(spark, SF_DIR),
        "incremental_winnowing": lambda: dedup.incremental_winnowing_overlap(
            spark, SF_DIR
        ),
        "bloom_dedup_probe": lambda: dedup.bloom_dedup_probe(spark, SF_DIR),
        "cdc_chunks": lambda: chunking.cdc_chunks(spark, SF_DIR),
        "cms_token_counts": lambda: sketches.cms_token_counts(spark, SF_DIR),
        "hll_register_sketch": lambda: sketches.hll_register_sketch(
            spark, SF_DIR
        ),
        "cosine_lsh": lambda: similarity.cosine_lsh_pairs(spark, SF_DIR),
        "blocks_table": lambda: blocks_table(
            documents_as_transcripts(spark, SF_DIR)
        ),
        "rate_window": lambda: maintenance.rate_window(spark, SF_DIR),
        "top_k_recent": lambda: maintenance.top_k_recent(spark, SF_DIR),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--list", action="store_true")
    ap.add_argument("--plan", metavar="QUERY")
    ap.add_argument("--out", metavar="PATH")
    ap.add_argument("--time", metavar="QUERY")
    ap.add_argument("--plans-all", metavar="DIR")
    ap.add_argument("--suffix", default="", help="plan filename suffix")
    ap.add_argument("--time-all", action="store_true")
    ap.add_argument("--only", default="", help="comma list for --time-all")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--no-warm", action="store_true")
    args = ap.parse_args()

    from ocr_pipeline_fastapi_latency_optimization_spark.session import get_spark

    if args.list:
        # names only — no session needed beyond builder construction
        spark = get_spark(app_name="bench_extra", cpus=CPUS,
                          shuffle_partitions=CPUS)
        print("\n".join(_builders(spark)))
        return

    spark = get_spark(app_name="bench_extra", cpus=CPUS, shuffle_partitions=CPUS)
    builders = _builders(spark)

    def plan_text(name: str) -> str:
        df = builders[name]()
        return df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )

    if args.plan:
        txt = plan_text(args.plan)
        if args.out:
            os.makedirs(os.path.dirname(args.out), exist_ok=True)
            with open(args.out, "w") as f:
                f.write(txt)
            print(f"wrote {args.out}")
        else:
            print(txt)
        return

    if args.plans_all:
        os.makedirs(args.plans_all, exist_ok=True)
        for name in builders:
            path = os.path.join(args.plans_all, f"{name}{args.suffix}.txt")
            try:
                with open(path, "w") as f:
                    f.write(plan_text(name))
            except Exception as exc:  # pragma: no cover - diagnostics
                print(f"{name}: FAILED {exc}", file=sys.stderr)
        print(f"wrote plans to {args.plans_all}")
        return

    def timed(name: str) -> list:
        fn = builders[name]
        spark.sparkContext.setJobDescription(f"bench_extra: {name}")
        if not args.no_warm:
            _force(fn())
        runs = []
        for _ in range(max(1, args.reps)):
            t = time.time()
            _force(fn())
            runs.append(round(time.time() - t, 3))
        spark.sparkContext.setJobDescription(None)
        return runs

    if args.time:
        runs = timed(args.time)
        print(json.dumps({
            "query": args.time, "runs": runs,
            "median": sorted(runs)[len(runs) // 2],
        }))
        return

    if args.time_all:
        only = [q for q in args.only.split(",") if q]
        out = {}
        for name in (only or builders):
            runs = timed(name)
            out[name] = sorted(runs)[len(runs) // 2]
        print(json.dumps({"queries": out, "total": round(sum(out.values()), 3)}))
        return

    ap.print_help()


if __name__ == "__main__":
    main()
