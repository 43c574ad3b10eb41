"""Child process: run the extraction pipeline once on local[N] over a
pre-generated corpus; print one JSON line {cpus, turns, sec, turns_per_sec}.
Run via bench/scaling_run.py, one fresh JVM per parallelism level."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    cpus = int(sys.argv[1])
    corpus_dir = sys.argv[2]
    from ocr_pipeline_fastapi_latency_optimization_spark.operators.extraction import (
        extract_pipeline,
    )
    from ocr_pipeline_fastapi_latency_optimization_spark.session import get_spark
    from ocr_pipeline_fastapi_latency_optimization_spark.sources.transcripts import (
        read_transcripts,
    )

    spark = get_spark(app_name=f"scaling-{cpus}", cpus=cpus, shuffle_partitions=cpus)
    # cache the input (isolates extraction cost from disk), balance load
    # with ~8 waves of tasks per core
    corpus = read_transcripts(spark, corpus_dir).repartition(cpus * 8).cache()
    n = corpus.count()
    # warm every JVM task thread + python worker so we time steady state
    extract_pipeline(corpus.sample(0.02, seed=1)).write.format("noop").mode(
        "overwrite"
    ).save()
    # best-of-2: this shared VM shows ±30% ambient variance; the faster
    # pass is the less-contended sample of the same deterministic work
    sec = float("inf")
    for _ in range(2):
        t0 = time.time()
        extract_pipeline(corpus).write.format("noop").mode("overwrite").save()
        sec = min(sec, time.time() - t0)
    print(
        json.dumps(
            {
                "cpus": cpus,
                "turns": n,
                "sec": round(sec, 3),
                "turns_per_sec": round(n / sec, 1),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
