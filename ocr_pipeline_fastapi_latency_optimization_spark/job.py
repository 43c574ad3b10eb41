"""spark-submit entry point.

Usage (cluster or local; package the library with scripts/package_pyfiles.py):

    spark-submit --py-files dist/ocr_pipeline_spark.zip \\
        -m ocr_pipeline_fastapi_latency_optimization_spark.job ... (or job.py) \\
        --input /path/to/transcripts_parquet \\
        --output /path/to/out --checkpoint /path/to/ckpt \\
        --run-id run1 --buckets 256 [--merge-visual] [--stitch]

Or generate a deterministic corpus instead of reading one:

    ... --gen-convs 50000 --gen-mean-turns 40 --seed 42

The job is resumable: re-running with the same --checkpoint recomputes
only buckets without a completed lineage row (plans/checkpoint.py).
"""

from __future__ import annotations

import argparse
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="transcript main-content extraction")
    p.add_argument("--input", help="parquet dir of transcripts")
    p.add_argument("--gen-convs", type=int, help="generate a synthetic corpus instead")
    p.add_argument("--gen-mean-turns", type=int, default=10)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--output", required=True)
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--run-id", required=True)
    p.add_argument("--buckets", type=int, default=256)
    p.add_argument("--merge-visual", action="store_true")
    p.add_argument("--stitch", action="store_true", help="also write conv-level stitch")
    p.add_argument(
        "--funnel", action="store_true",
        help="also run the curation funnel (quality → lang → dedup → "
        "split) over the extracted turns and write per-split counts",
    )
    p.add_argument("--cpus", type=int, default=None, help="local[N] when no cluster")
    p.add_argument(
        "--concurrency", type=int, default=1,
        help="buckets processed concurrently (driver-side worker pool)",
    )
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    if not args.input and not args.gen_convs:
        print("need --input or --gen-convs", file=sys.stderr)
        return 2
    # absolute imports: this file also runs as a top-level script under
    # ``spark-submit job.py`` (no parent package in that mode)
    from ocr_pipeline_fastapi_latency_optimization_spark.operators.extraction import (
        stitch_conversations_salted,
    )
    from ocr_pipeline_fastapi_latency_optimization_spark.plans.checkpoint import (
        lineage_metrics,
        read_output,
        run_with_checkpoint,
    )
    from ocr_pipeline_fastapi_latency_optimization_spark.session import get_spark
    from ocr_pipeline_fastapi_latency_optimization_spark.sources.transcripts import (
        gen_transcripts_spark,
        read_transcripts,
    )

    spark = get_spark(app_name=f"extract-{args.run_id}", cpus=args.cpus)
    if args.input:
        transcripts = read_transcripts(spark, args.input)
    elif args.gen_convs:
        transcripts = gen_transcripts_spark(
            spark, args.gen_convs, args.gen_mean_turns, seed=args.seed
        )
    else:
        print("need --input or --gen-convs", file=sys.stderr)
        return 2

    processed = run_with_checkpoint(
        spark,
        transcripts,
        out_dir=args.output,
        checkpoint_dir=args.checkpoint,
        run_id=args.run_id,
        n_buckets=args.buckets,
        merge_visual=args.merge_visual,
        concurrency=args.concurrency,
    )
    print(f"processed {len(processed)} buckets: {processed[:16]}{'…' if len(processed) > 16 else ''}")
    m = lineage_metrics(spark, args.checkpoint).collect()[0]
    print(
        f"lineage: buckets={m['buckets_done']} turns={m['n_turns']} "
        f"kept={m['n_blocks_kept']} dropped={m['n_blocks_dropped']} "
        f"chars={m['chars_extracted']}"
    )
    if args.stitch:
        out = read_output(spark, args.output)
        stitch_conversations_salted(out).write.mode("overwrite").parquet(
            f"{args.output.rstrip('/')}_conversations"
        )
    if args.funnel:
        from ocr_pipeline_fastapi_latency_optimization_spark.operators.curation import (
            funnel_over_turns,
        )

        splits = funnel_over_turns(read_output(spark, args.output))
        splits.write.mode("overwrite").parquet(
            f"{args.output.rstrip('/')}_splits"
        )
        rows = {r["split"]: r["n"] for r in splits.collect()}
        print(f"funnel splits: {rows}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
