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


#: Both explode levels stay <= 2^20 elements (~8 MB of longs) for
#: n_surplus <= 2^40 — past the 10^12-row north-rule target.
_EXPLODE_CHUNK = 1 << 20


def _surplus_counts(df: DataFrame, cfg: CheckConfig) -> DataFrame:
    """(partition_id, doc_id, n_surplus) per duplicate group, computed
    without ever shuffling the table BY KEY.

    Shape: aggregate per (doc_id, sig=xxhash64(tokens)) — the sig spreads
    a hot key's rows evenly across reducers — then per-key totals +
    representative (min sig), both partial-agg-bounded; the dup-key
    dimension (keys with total > 1) joins back onto the per-sig counts.
    The join carries NO broadcast hint: the dup-key cardinality is
    data-dependent (a corpus where most doc_ids are duplicated would
    blow an unconditional 8 GB broadcast); AQE upgrades the exchange to
    a broadcast at runtime when the actual size is small.
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
    return (
        per_sig.join(dups, "doc_id")
        .withColumn(
            "n_surplus",
            F.when(F.col("__sig") == F.col("__rep"), F.col("c") - 1).otherwise(F.col("c")),
        )
        .where(F.col("n_surplus") > 0)
        .select(
            partition_id_col(cfg).alias("partition_id"), "doc_id", "n_surplus"
        )
    )


def enumerate_counts(df: DataFrame, cfg: CheckConfig) -> DataFrame:
    """Surplus-row COUNTS per duplicate group — (partition_id, doc_id,
    n_surplus) — for consumers that only aggregate. At 10^12 rows an
    enumerated per-row listing is itself terabytes; this is the form a
    report/metric consumer should join against (sum(n_surplus) equals
    the enumerated row count exactly)."""
    return _surplus_counts(df, cfg)


def enumerate_rows_skewsafe(df: DataFrame, cfg: CheckConfig) -> DataFrame:
    """Surplus-row enumeration WITHOUT the per-key window — the
    formulation that survives a hot key at 10^12 rows.

    Output is the exact (partition_id, doc_id) multiset of
    :func:`enumerate_rows` — group size minus one row per duplicate
    group — but the table is never shuffled BY KEY at all, so there is
    no straggler to salt away (bench: BENCH/skew_result.json).

    The surplus multiplicity is exploded in bounded CHUNKS — two nested
    sequence/explode levels, each array capped at 2^20 elements — so an
    exact-duplicate hot key (ONE (doc_id, sig) group holding ~all rows)
    never materializes an O(group-size) array in a single row; the
    single-level `sequence(1, n_surplus)` allocated multi-GB arrays and
    hard-fails past 2^31 elements. Chunk rows are round-robin
    repartitioned between the levels (a shuffle of ~n_dup_keys slim
    rows, NOT the data) so the row-generation work of a huge group is
    spread across the cluster instead of pipelined in one task.
    """
    K = _EXPLODE_CHUNK
    surplus = _surplus_counts(df, cfg)
    n_chunks_minus_1 = F.floor((F.col("n_surplus") - F.lit(1)) / F.lit(K)).cast("long")
    chunked = surplus.select(
        "partition_id",
        "doc_id",
        "n_surplus",
        F.explode(F.sequence(F.lit(0), n_chunks_minus_1)).alias("__chunk"),
    ).repartition(cfg.n_partitions)
    chunk_len = F.least(
        F.lit(K).cast("long"), F.col("n_surplus") - F.col("__chunk") * F.lit(K)
    )
    return chunked.select(
        "partition_id",
        "doc_id",
        F.explode(F.sequence(F.lit(1), chunk_len)).alias("__i"),
    ).drop("__i")


def enumerate_rows_auto(
    df: DataFrame,
    cfg: CheckConfig,
    hot_share_threshold: float = 0.2,
    sample_fraction: float = 0.02,
    seed: int = 7,
) -> DataFrame:
    """Probe key skew on a small sample, then dispatch: the per-key
    window (:func:`enumerate_rows`, fastest on balanced keys) vs the
    no-key-shuffle formulation (:func:`enumerate_rows_skewsafe`).

    Calibration (BENCH/skew_result.json, 6 M rows, local[32]): at 10%
    hot mass the window wins wall (2.87 s vs 5.64 s) with bounded
    max/p50 task skew (~5.8×); at 50% hot its max/p50 hits 37× — the
    single-straggler shape a real cluster cannot absorb — while
    skewsafe bounds it at ≤4.7×. The 0.2 threshold sits between the
    two measured points; max-task ratio, not local wall, is the
    cluster predictor.

    The probe is ONE cheap job on a ~2% sample; its `groupBy.count` is
    itself partial-agg-robust under the hot key (measured: count_plain
    in the same bench), so probing skewed input is safe.
    """
    keyed = df.where(F.col("doc_id").isNotNull()).select("doc_id")
    probe = (
        keyed.sample(fraction=sample_fraction, seed=seed)
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(F.max("c").alias("mx"), F.sum("c").alias("tot"))
        .first()
    )
    tot = probe["tot"] or 0
    hot_share = (probe["mx"] / tot) if tot else 0.0
    if hot_share >= hot_share_threshold:
        return enumerate_rows_skewsafe(df, cfg)
    return enumerate_rows(df, cfg)
