"""10x scale rung (round-3 verdict #7): the per-round bench corpus is
~143k turns; the 100x design claims should not extrapolate from that
alone. This script runs the three hottest paths — fused extract, the
full curation funnel, and MinHash-LSH dedup — over a corpus TEN TIMES
the bench size (~1.43M turns), and proves per-turn equality at that
scale: the 10x corpus is ten tagged copies of the base corpus, so every
copy's extraction output must checksum-match the base run exactly
(order-independent sum of per-turn xxhash64 over (conv_id, turn_idx,
extracted_text) — any per-turn divergence flips the sum).

The copies also make the dedup rung adversarial on purpose: 90% of the
10x corpus is exact duplicates, so the MinHash banding sees maximal
bucket collisions — the worst realistic shape for candidate generation.

Prints ONE JSON line with the measured rates and checksum verdicts
(run on an otherwise idle machine; same caveat as
bench/scaling_run.py). The 10x section of BENCH/BASELINE.md is
maintained by hand from that JSON — this script does not write it
(round-4 ADVICE #4: the earlier docstring claimed an append that
bench/scaling_run.py's template actually owns).
"""

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

CONVS = int(os.environ.get("SPARK_GRAFT_BENCH_CONVS", "12000"))
MEAN_TURNS = int(os.environ.get("SPARK_GRAFT_BENCH_MEAN_TURNS", "12"))
SEED = 42
COPIES = 10
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
BASE_DIR = f"/tmp/spark_graft_bench_corpus_c{CONVS}_m{MEAN_TURNS}_s{SEED}"
X10_DIR = f"{BASE_DIR}_x{COPIES}"


def main() -> None:
    from pyspark.sql import functions as F

    from ocr_pipeline_fastapi_latency_optimization_spark.operators.curation import (
        funnel_over_turns,
    )
    from ocr_pipeline_fastapi_latency_optimization_spark.operators.dedup import (
        minhash_band_buckets,
        minhash_signatures,
    )
    from ocr_pipeline_fastapi_latency_optimization_spark.operators.extraction import (
        extract_pipeline,
    )
    from ocr_pipeline_fastapi_latency_optimization_spark.session import get_spark
    from ocr_pipeline_fastapi_latency_optimization_spark.sources.transcripts import (
        gen_transcripts_spark,
        read_transcripts,
    )

    spark = get_spark(app_name="scale10", cpus=CPUS, shuffle_partitions=2 * CPUS)

    if not os.path.exists(os.path.join(BASE_DIR, "_SUCCESS")):
        gen_transcripts_spark(
            spark, CONVS, MEAN_TURNS, seed=SEED, partitions=CPUS * 2
        ).write.mode("overwrite").parquet(BASE_DIR)
    base = read_transcripts(spark, BASE_DIR)
    if not os.path.exists(os.path.join(X10_DIR, "_SUCCESS")):
        tagged = None
        for i in range(COPIES):
            c = base.withColumn(
                "conv_id", F.concat(F.lit(f"c{i}:"), F.col("conv_id"))
            )
            tagged = c if tagged is None else tagged.unionByName(c)
        tagged.write.mode("overwrite").parquet(X10_DIR)
    c10 = read_transcripts(spark, X10_DIR)
    n_turns = c10.count()

    def force(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    # untimed warm-up (Python worker spin-up + JIT)
    force(extract_pipeline(base.limit(2000)))

    timings = {}
    t0 = time.time()
    force(extract_pipeline(c10))
    timings["extract_10x"] = round(time.time() - t0, 3)

    # per-turn equality at 10x: every copy's checksum equals the base
    # run's checksum (order-independent decimal sum — ANSI-safe)
    def checksum_frame(per_turn):
        return per_turn.select(
            F.split(F.col("conv_id"), ":", 2).getItem(0).alias("copy"),
            F.xxhash64(
                F.split(F.col("conv_id"), ":", 2).getItem(1),
                F.col("turn_idx"),
                F.col("extracted_text"),
            )
            .cast("decimal(38,0)")
            .alias("h"),
        ).groupBy("copy").agg(F.sum("h").alias("checksum"), F.count("*").alias("n"))

    per_copy = checksum_frame(extract_pipeline(c10)).collect()
    base_row = (
        extract_pipeline(base)
        .select(
            F.xxhash64("conv_id", "turn_idx", "extracted_text")
            .cast("decimal(38,0)")
            .alias("h")
        )
        .agg(F.sum("h").alias("checksum"), F.count("*").alias("n"))
        .collect()[0]
    )
    assert len(per_copy) == COPIES, per_copy
    for r in per_copy:
        assert r["n"] == base_row["n"], (r, base_row)
        assert r["checksum"] == base_row["checksum"], (r, base_row)
    equality = "pass"

    t0 = time.time()
    splits = {
        r["split"]: r["n"] for r in funnel_over_turns(extract_pipeline(c10)).collect()
    }
    timings["funnel_10x"] = round(time.time() - t0, 3)
    # the funnel's exact-dedup gate must collapse the 10 copies: final
    # survivor mass can be at most the base corpus
    assert sum(splits.values()) <= base_row["n"], splits

    # dedup rung: signatures + banded buckets over all 10x turns (unique
    # ids via a copy-salted hash; the planted 10x duplicates maximize
    # bucket collisions on purpose). Candidate PAIRS over a 90%-dup
    # corpus are O(copies^2 * turns) by construction, so the rung times
    # signature + banding + the bucket-width histogram — the index-build
    # side of the incremental probe design, which is what runs at scale.
    docs10 = extract_pipeline(c10).select(
        F.xxhash64("conv_id", "turn_idx").alias("doc_id"),
        F.col("extracted_text").alias("text"),
    )
    t0 = time.time()
    buckets = minhash_band_buckets(minhash_signatures(docs10, hash_fn="affine"))
    width = buckets.groupBy("band", "bucket").agg(F.count("*").alias("w"))
    stats = width.agg(
        F.count("*").alias("n_buckets"), F.max("w").alias("max_width")
    ).collect()[0]
    timings["minhash_index_10x"] = round(time.time() - t0, 3)

    out = {
        "metric": "10x-scale rung (extract + funnel + minhash index)",
        "unit": "sec",
        "turns": n_turns,
        "copies": COPIES,
        "queries": timings,
        "extract_turns_per_sec": round(n_turns / timings["extract_10x"], 1),
        "per_turn_equality": equality,
        "funnel_splits": splits,
        "lsh_buckets": int(stats["n_buckets"]),
        "lsh_max_bucket_width": int(stats["max_width"]),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
