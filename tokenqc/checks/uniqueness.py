"""Uniqueness gate: `doc_id` must be unique across the table.

The reference implicitly relies on `repo_name` as a unique key for all
joins (/root/reference/main.nf:101-102); the engine makes that an
explicit, tested constraint (SURVEY.md section 2.5).

Scale plan: this is the engine's shuffle-heavy op. `groupBy(doc_id)
.count()` benefits from Catalyst's partial (map-side) aggregation — a
hot duplicated key is pre-combined to one row per map task before the
shuffle, so even a billion-row hot key moves at most one row per task.
For compound skew on top (hot key × wide rows) the runner can route
through :func:`tokenqc.skew.salted_count` — a two-stage salted
aggregation. Violations are emitted at key granularity (one row per
duplicated key, observed=count), which is what bounds output size at
10^12 rows; per-row enumeration is available via `enumerate_rows`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tokenqc.checks.base import CheckConfig, partition_id_col
from tokenqc.skew import salted_count

CHECK = "uniqueness"


def violations(df: DataFrame, cfg: CheckConfig, salt: int = 0) -> DataFrame:
    """(partition_id, doc_id, check_name, observed, expected) for dup keys.

    NULL doc_ids are excluded — they are completeness violations, not
    duplicates of one another. partition_id is derived from the key hash,
    so a duplicate group lands in exactly one verdict partition.
    """
    keyed = df.where(F.col("doc_id").isNotNull()).select("doc_id")
    counts = (
        salted_count(keyed, "doc_id", salt)
        if salt > 1
        else keyed.groupBy("doc_id").agg(F.count(F.lit(1)).alias("cnt"))
    )
    return counts.where(F.col("cnt") > 1).select(
        partition_id_col(cfg).alias("partition_id"),
        F.col("doc_id"),
        F.lit(CHECK).alias("check_name"),
        F.concat(F.lit("count="), F.col("cnt")).alias("observed"),
        F.lit("count == 1").alias("expected"),
    )


def enumerate_rows(df: DataFrame, cfg: CheckConfig) -> DataFrame:
    """Optional: every surplus row of each duplicate group (row_number>1
    over a hash-partitioned window) — used by reports wanting row-level
    dup listings; costs a full sort within key groups."""
    from pyspark.sql import Window as W

    w = W.partitionBy("doc_id").orderBy(F.xxhash64("tokens"))
    return (
        df.where(F.col("doc_id").isNotNull())
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") > 1)
        .select(partition_id_col(cfg).alias("partition_id"), "doc_id")
    )
