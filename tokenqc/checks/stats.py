"""Column-stats profile: the engine's Almanack.

Engine analogue of the reference's per-item metric table
(/root/reference/modules/RunAlmanack.nf:68 `almanack.table()` → a JSON
list of named metrics consumed by bin/analyze_joss.py:51-78). Here: one
fused `groupBy(source).agg(...)` computing every per-column statistic in
a single scan — count, null counts, min/max/avg n_tok, HyperLogLog
approx-distinct of doc_id, and the n_tok bucket histogram — so every
threshold gate downstream feeds off one pass (the reference, by
contrast, re-reads its README three times per repo; SURVEY.md §4.1).

Scale notes: partial+final hash aggregation and whole-stage codegen are
Catalyst built-ins; `approx_count_distinct` is a mergeable HLL sketch so
the distinct count never shuffles raw ids. `profile()` touches the
tokens column ONLY through `isNull()` — parquet answers that from
definition levels, so token *values* are never decoded — while
`histogram()` prunes tokens out of its scan entirely (both pinned in
tests/test_plans.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tokenqc.checks.base import CheckConfig

CHECK = "stats"


def profile(df: DataFrame, cfg: CheckConfig, rsd: float = 0.01) -> DataFrame:
    """Per-source profile; one row per source (plus one `__all__` row via
    grouping sets would be possible with cube(), kept per-source here).

    Output columns are stable and aliased for oracle comparison.
    """
    w = cfg.bucket_width
    return (
        df.groupBy(F.coalesce(F.col("source"), F.lit("__null__")).alias("source"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("doc_id").isNull().cast("long")).alias("null_doc_id"),
            F.sum(F.col("tokens").isNull().cast("long")).alias("null_tokens"),
            F.sum(F.col("n_tok").isNull().cast("long")).alias("null_n_tok"),
            F.min("n_tok").alias("min_n_tok"),
            F.max("n_tok").alias("max_n_tok"),
            F.avg("n_tok").alias("avg_n_tok"),
            F.approx_count_distinct("doc_id", rsd).alias("approx_distinct_doc_id"),
            F.sum("n_tok").cast("long").alias("total_tokens"),
        )
        .withColumn("null_rate_doc_id", F.col("null_doc_id") / F.col("n_rows"))
    )


def histogram(df: DataFrame, cfg: CheckConfig) -> DataFrame:
    """n_tok histogram per source: (source, bucket, cnt)."""
    return (
        df.where(F.col("n_tok").isNotNull() & F.col("source").isNotNull())
        .groupBy(
            "source",
            F.floor(F.col("n_tok") / cfg.bucket_width).cast("int").alias("bucket"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def robust_outliers(
    df: DataFrame,
    id_col: str = "doc_id",
    value_col: str = "n_tok",
    by: str = "source",
    k: float = 3.0,
) -> DataFrame:
    """Per-group Tukey-fence outlier gate on DISCRETE quantiles: flag
    rows whose `value_col` falls outside [q1 − k·IQR, q3 + k·IQR],
    where q1/q3 are the smallest values whose per-group cumulative
    count reaches ceil(0.25·n)/ceil(0.75·n) — the robust-stats length
    gate ("this 50k-token row is not like the others from this
    source") the mean/stddev profile misses under heavy tails.

    Discrete, not interpolated, quantiles on purpose: every quantity
    is integer arithmetic (counts and values), so the fence — and
    therefore ROW MEMBERSHIP of the flagged set — is bit-identical in
    any engine; interpolated percentiles differ in final-ulp float ops
    across engines and would flip boundary rows.

    Scale shape: one partial-agg'd (group, value) count — the only
    data-sized pass; the quantile walk is a window over that HISTOGRAM
    (groups × distinct values rows, e.g. sources × max_len — metadata-
    sized for bounded domains like token lengths; bucket a genuinely
    unbounded domain first). Fences broadcast back; the flag filter is
    codegen'd in the join projection.

    Reference analogue: the reference's numeric threshold gates over
    almanack metrics (/root/reference/bin/analyze_joss.py:302-345),
    made distribution-relative.

    Output: flagged rows (id, group, value, q1, q3, lo, hi).
    """
    v, g = F.col(value_col), F.col(by)
    base = df.where(v.isNotNull() & g.isNotNull())
    hist = base.groupBy(by, value_col).agg(F.count(F.lit(1)).alias("c"))
    from pyspark.sql import Window

    w = Window.partitionBy(by).orderBy(value_col)
    wg = Window.partitionBy(by)
    cum = (
        hist.withColumn("cum", F.sum("c").over(w))
        .withColumn("n_s", F.sum("c").over(wg))
    )
    qv = lambda p: F.min(  # noqa: E731
        F.when(F.col("cum") >= F.ceil(F.col("n_s") * p), v)
    )
    fences = (
        cum.groupBy(by)
        .agg(qv(0.25).alias("q1"), qv(0.75).alias("q3"))
        .withColumn("lo", F.col("q1") - k * (F.col("q3") - F.col("q1")))
        .withColumn("hi", F.col("q3") + k * (F.col("q3") - F.col("q1")))
    )
    return (
        base.join(F.broadcast(fences), by)
        .where((v < F.col("lo")) | (v > F.col("hi")))
        .select(id_col, by, value_col, "q1", "q3", "lo", "hi")
    )
