"""Table-catalog shim: Iceberg when available, parquet otherwise.

Production deployments run the transcripts/output/checkpoint tables on
Iceberg (partition pruning by bucket spec, snapshot isolation, MERGE
for the lineage table). This sandbox has no Iceberg jars, so the shim
probes the runtime once and degrades to directory-backed parquet with
the same call sites — the downstream plans are identical either way
(SURVEY §7.4e).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

ICEBERG_CATALOG = "spark_catalog"


def iceberg_available(spark: SparkSession) -> bool:
    """True when an Iceberg SparkCatalog is on the classpath and
    configured. Probe is conf-based — never raises."""
    try:
        impl = spark.conf.get(f"spark.sql.catalog.{ICEBERG_CATALOG}", None)
        if impl and "iceberg" in impl.lower():
            return True
        # classpath probe: the catalog class must be loadable
        jvm = spark.sparkContext._jvm
        jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


def read_table(spark: SparkSession, identifier: str) -> DataFrame:
    """``identifier`` is an Iceberg table name when the catalog exists,
    else a parquet path."""
    if iceberg_available(spark) and not identifier.startswith("/"):
        return spark.read.format("iceberg").load(identifier)
    return spark.read.parquet(identifier)


def write_table(df: DataFrame, identifier: str, mode: str = "append") -> None:
    spark = df.sparkSession
    if iceberg_available(spark) and not identifier.startswith("/"):
        df.writeTo(identifier).append() if mode == "append" else df.writeTo(
            identifier
        ).createOrReplace()
        return
    df.write.mode(mode if mode != "replace" else "overwrite").parquet(identifier)


def write_bucketed_table(
    df: DataFrame,
    name: str,
    path: str,
    bucket_cols: list,
    n_buckets: int = 32,
    sort_cols: list | None = None,
    mode: str = "overwrite",
) -> str:
    """Persist ``df`` as a bucketed (and optionally sort-ordered) table —
    the storage layout that makes repeated joins/aggregations on the
    bucket key SHUFFLE-FREE: two tables bucketed identically co-locate
    matching keys file-by-file, so Spark plans the join without an
    Exchange on either side (asserted in tests/test_plans.py).

    This is the sandbox twin of DESIGN_100TB.md's Iceberg
    ``bucket(N, conv_id)`` partition transform: at 10^12 turns, every
    per-conversation stage (stitch, checkpoint buckets, enrichment join)
    reads pre-co-located data instead of shuffling the corpus. Bucketed
    parquet via ``saveAsTable`` keeps the same observable property with
    the session catalog."""
    writer = (
        df.write.format("parquet")
        .mode(mode)
        .option("path", path)
        .bucketBy(int(n_buckets), *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(name)
    return name


def set_table_properties(spark: SparkSession, name: str, props: dict) -> None:
    """Record build-time metadata (index parameters, content watermarks)
    as table properties — the catalog-level analog of the checkpoint
    manifest (plans/checkpoint.py::write_or_check_manifest): a probe
    can fail fast on a parameter mismatch instead of silently producing
    wrong verdicts (round-4 ADVICE #1). Values are stringified."""
    kv = ", ".join(
        "'{}'='{}'".format(str(k).replace("'", "''"), str(v).replace("'", "''"))
        for k, v in sorted(props.items())
    )
    spark.sql(f"ALTER TABLE {name} SET TBLPROPERTIES ({kv})")


def get_table_properties(spark: SparkSession, name: str) -> dict:
    return {
        r["key"]: r["value"]
        for r in spark.sql(f"SHOW TBLPROPERTIES {name}").collect()
    }


def check_index_params(
    spark: SparkSession, name: str, expected: dict, kind: str
) -> dict:
    """Fail-fast parameter handshake between a persisted index table and
    a probe: every key in ``expected`` must be present in the table's
    recorded properties and string-equal. A property-less table (built
    by an older version of this library, or by hand) gets a dedicated
    error — its guarantees cannot be checked (same policy as the
    old-layout checkpoint manifest)."""
    props = get_table_properties(spark, name)
    missing = [k for k in expected if k not in props]
    if missing:
        raise ValueError(
            f"{kind} index table {name} records no build parameters for "
            f"{sorted(missing)} — it was written by an older version of "
            "this library (or not by persist_*_index at all); a probe "
            "cannot verify hash-parameter compatibility. Rebuild the "
            "index with the current persist function."
        )
    mismatched = {
        k: (props[k], str(v)) for k, v in expected.items() if props[k] != str(v)
    }
    if mismatched:
        detail = ", ".join(
            f"{k}: index={a!r} probe={b!r}" for k, (a, b) in sorted(mismatched.items())
        )
        raise ValueError(
            f"{kind} index table {name} was built with different "
            f"parameters than this probe ({detail}); probing it would "
            "produce silently wrong dup/new verdicts. Use the index's "
            "parameters or rebuild the index."
        )
    return props
