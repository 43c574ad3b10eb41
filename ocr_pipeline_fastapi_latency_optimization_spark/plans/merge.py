"""MERGE INTO emulation for parquet targets (SURVEY §7.4e).

Production would run Iceberg ``MERGE INTO`` for checkpoint-row updates
(the job-store status transitions queued→processing→completed/failed,
``ocr_app.py:1243-1259``). Without an Iceberg catalog in the sandbox we
emulate with the standard anti-join + union overwrite, which has the
same observable upsert semantics:

    target' = (target ⟕anti updates on key) ∪ updates

The write goes through a staging directory + atomic-ish swap so a
failed job never leaves a half-written target (the resume tests rely on
lineage reads staying consistent).
"""

from __future__ import annotations

import os
import shutil
import uuid
from typing import List

from pyspark.sql import DataFrame, SparkSession, functions as F


def merge_upsert(
    spark: SparkSession,
    target_dir: str,
    updates: DataFrame,
    keys: List[str],
) -> None:
    """Upsert ``updates`` into the parquet table at ``target_dir`` by
    ``keys``: matching target rows are replaced, new rows appended."""
    staging = f"{target_dir.rstrip('/')}_staging_{uuid.uuid4().hex[:8]}"
    try:
        existing = spark.read.parquet(target_dir)
        merged = existing.join(updates.select(*keys), keys, "left_anti").unionByName(
            updates
        )
    except Exception:
        merged = updates
    merged.write.mode("overwrite").parquet(staging)
    backup = f"{target_dir.rstrip('/')}_old_{uuid.uuid4().hex[:8]}"
    if os.path.exists(target_dir):
        os.rename(target_dir, backup)
    os.rename(staging, target_dir)
    if os.path.exists(backup):
        shutil.rmtree(backup)


def scd2_upsert(
    spark: SparkSession,
    target_dir: str,
    updates: DataFrame,
    keys: List[str],
    ts_col: str = "updated_at",
) -> None:
    """Slowly-changing-dimension (type 2) emulation: keep history — old
    versions get ``is_current = false``, incoming rows become current."""
    updates = updates.withColumn("is_current", F.lit(True))
    try:
        existing = spark.read.parquet(target_dir)
        demoted = existing.join(
            updates.select(*keys).distinct(), keys, "left_semi"
        ).withColumn("is_current", F.lit(False))
        untouched = existing.join(updates.select(*keys).distinct(), keys, "left_anti")
        merged = untouched.unionByName(demoted).unionByName(updates)
    except Exception:
        merged = updates
    staging = f"{target_dir.rstrip('/')}_staging_{uuid.uuid4().hex[:8]}"
    merged.write.mode("overwrite").parquet(staging)
    backup = f"{target_dir.rstrip('/')}_old_{uuid.uuid4().hex[:8]}"
    if os.path.exists(target_dir):
        os.rename(target_dir, backup)
    os.rename(staging, target_dir)
    if os.path.exists(backup):
        shutil.rmtree(backup)
