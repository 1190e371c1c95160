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
    dup listings; costs a full sort within key groups.

    **Skew warning**: the window moves EVERY row of a key to one task —
    a hot doc_id family (the north rule's skew case) becomes a single
    straggler holding 10%+ of the table. Use
    :func:`enumerate_rows_skewsafe` when the key distribution is not
    trusted; it emits the same (partition_id, doc_id) multiset without
    ever co-locating a key's rows (bench: BENCH/skew_result.json)."""
    from pyspark.sql import Window as W

    w = W.partitionBy("doc_id").orderBy("__sig")
    return (
        df.where(F.col("doc_id").isNotNull())
        # project to (doc_id, sig) BEFORE the window: the shuffle moves
        # 16 bytes/row, not the token arrays
        .select("doc_id", F.xxhash64("tokens").alias("__sig"))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") > 1)
        .select(partition_id_col(cfg).alias("partition_id"), "doc_id")
    )


def enumerate_rows_skewsafe(df: DataFrame, cfg: CheckConfig) -> DataFrame:
    """Surplus-row enumeration WITHOUT the per-key window — the
    formulation that survives a hot key at 10^12 rows.

    Shape: aggregate per (doc_id, sig=xxhash64(tokens)) — the sig spreads
    a hot key's rows evenly across reducers — then per-key totals +
    representative (min sig), both partial-agg-bounded; the dup-key
    dimension (keys with total > 1) is joined back BROADCAST onto the
    per-sig counts (bounded rows, never the data), and each group's
    surplus multiplicity is exploded: the representative sig contributes
    count-1 rows, every other sig all its rows. Output is the exact
    (partition_id, doc_id) multiset of :func:`enumerate_rows` — group
    size minus one row per duplicate group — but the table is never
    shuffled BY KEY at all, so there is no straggler to salt away.
    """
    sig = F.xxhash64("tokens")
    keyed = df.where(F.col("doc_id").isNotNull()).select(
        "doc_id", sig.alias("__sig")
    )
    per_sig = keyed.groupBy("doc_id", "__sig").agg(F.count(F.lit(1)).alias("c"))
    reps = per_sig.groupBy("doc_id").agg(
        F.min("__sig").alias("__rep"), F.sum("c").alias("total")
    )
    dups = reps.where(F.col("total") > 1).select("doc_id", "__rep")
    surplus = (
        per_sig.join(F.broadcast(dups), "doc_id")
        .withColumn(
            "n_surplus",
            F.when(F.col("__sig") == F.col("__rep"), F.col("c") - 1).otherwise(F.col("c")),
        )
        .where(F.col("n_surplus") > 0)
    )
    return surplus.select(
        partition_id_col(cfg).alias("partition_id"),
        "doc_id",
        F.explode(F.sequence(F.lit(1), F.col("n_surplus"))).alias("__i"),
    ).drop("__i")
