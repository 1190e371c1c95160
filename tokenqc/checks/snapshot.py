"""Snapshot-to-snapshot STRUCTURAL validation — the table-level diff a
corpus pipeline runs between two versions of the same training table
(yesterday's Iceberg snapshot vs today's) BEFORE any per-row gate: did a
source vanish, did one shrink (append-only corpora treat any shrink as
upstream data loss), did one double overnight (a re-crawled dump
ingested twice), did the schema itself move?

Reference analogue: the reference workflow re-runs its per-tool checks
on every sync and compares against the previous report
(/root/reference/bin/analyze_joss.py writes per-run CSVs; the operator
here is the diff between two such runs, keyed by partition instead of
tool). Distribution drift (KS/chi-square, checks/drift.py) grades VALUE
distributions; this module grades STRUCTURE — row inventory per key and
the column set — which is cheaper (two key-bounded partial aggs) and
catches a different failure class (lost partitions, double ingests,
silent schema evolution).

Scale shape: `table_diff` runs one partial-aggregated count per side —
the exchanges carry at most tasks x |keys| rows — then a full-outer
join of two key-bounded frames (AQE broadcasts the smaller). No row
data ever shuffles. `schema_diff` touches only driver-side metadata
(zero jobs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

NULL_KEY = "__null__"


def table_diff(
    cur: DataFrame,
    base: DataFrame,
    key_col: str = "source",
    grow_warn_ppm: int = 500_000,
) -> DataFrame:
    """Per-key row-inventory diff of two snapshots of the same table.

    Verdicts (append-only corpus expectations):
      NEW_KEY      key absent from the baseline snapshot
      DROPPED_KEY  key absent from the current snapshot  (hard fail)
      SHRUNK       fewer rows than baseline               (hard fail)
      GROWN        growth beyond `grow_warn_ppm` vs base  (warn: double
                   ingest / re-crawl suspicion)
      STABLE       everything else

    NULL keys count under the ``__null__`` sentinel so a nulled-out
    partition column shows up as a key movement, not a silent drop.
    ``delta_ppm`` is integer (delta * 10^6 DIV n_base, truncating
    toward zero — identical in Spark and DuckDB), NULL for NEW_KEY.

    Output: (key, n_cur, n_base, delta, delta_ppm, verdict).
    """
    def counted(df: DataFrame, out: str) -> DataFrame:
        k = F.coalesce(F.col(key_col).cast("string"), F.lit(NULL_KEY))
        return (
            df.select(k.alias("key"))
            .groupBy("key")
            .agg(F.count(F.lit(1)).alias(out))
        )

    j = counted(cur, "n_cur").join(counted(base, "n_base"), "key", "full_outer")
    delta = F.coalesce(F.col("n_cur"), F.lit(0)) - F.coalesce(
        F.col("n_base"), F.lit(0)
    )
    out = j.select(
        "key",
        "n_cur",
        "n_base",
        delta.alias("delta"),
        F.when(F.col("n_base").isNotNull(), 1).otherwise(0).alias("_hb"),
    ).withColumn(
        "delta_ppm",
        F.when(
            F.col("_hb") == 1, F.expr("delta * 1000000L DIV n_base")
        ),
    )
    verdict = (
        F.when(F.col("n_base").isNull(), F.lit("NEW_KEY"))
        .when(F.col("n_cur").isNull(), F.lit("DROPPED_KEY"))
        .when(F.col("delta") < 0, F.lit("SHRUNK"))
        .when(F.col("delta_ppm") > grow_warn_ppm, F.lit("GROWN"))
        .otherwise(F.lit("STABLE"))
    )
    return out.select(
        "key", "n_cur", "n_base", "delta", "delta_ppm", verdict.alias("verdict")
    )


def row_diff(
    cur: DataFrame,
    base: DataFrame,
    digest_col: str,
    key_col: str = "source",
) -> DataFrame:
    """Row-granularity snapshot diff: per key, how many distinct row
    identities (a content digest or stable id column) were ADDED,
    REMOVED, or kept between two snapshots — `table_diff` says a source
    shrank by 2%; this says WHICH 2% churned (a same-size source that
    silently swapped half its rows is invisible to row counts but is a
    retraining-scale event).

    Scale shape: each side collapses to DISTINCT (key, digest) with
    map-side partial aggregation, then ONE full-outer join keyed on
    (key, digest) — slim digest rows only, AQE skew-splits hot keys;
    the per-key rollup partial-aggregates again. Row payloads never
    shuffle. `churn_ppm` = (added + removed) * 10^6 DIV base-size,
    NULL for keys with no baseline rows.

    Output: (key, n_added, n_removed, n_common, churn_ppm).
    """
    def side(df: DataFrame, flag: str) -> DataFrame:
        k = F.coalesce(F.col(key_col).cast("string"), F.lit(NULL_KEY))
        return (
            df.select(k.alias("key"), F.col(digest_col).alias("dg"))
            .distinct()
            .withColumn(flag, F.lit(1))
        )

    j = side(cur, "_c").join(side(base, "_b"), ["key", "dg"], "full_outer")
    agg = j.groupBy("key").agg(
        F.sum(
            F.when(F.col("_c").isNotNull() & F.col("_b").isNull(), 1).otherwise(0)
        ).alias("n_added"),
        F.sum(
            F.when(F.col("_b").isNotNull() & F.col("_c").isNull(), 1).otherwise(0)
        ).alias("n_removed"),
        F.sum(
            F.when(F.col("_c").isNotNull() & F.col("_b").isNotNull(), 1).otherwise(0)
        ).alias("n_common"),
    )
    return agg.withColumn(
        "churn_ppm",
        F.when(
            F.col("n_removed") + F.col("n_common") > 0,
            F.expr("(n_added + n_removed) * 1000000L DIV (n_removed + n_common)"),
        ),
    )


def schema_diff(cur: DataFrame, base: DataFrame) -> DataFrame:
    """Column-set diff of two snapshots — driver-side metadata only
    (zero Spark jobs; at 10^12 rows the schema is still just the
    catalog entry). Nullability is deliberately ignored: writers
    commonly tighten it without a semantic change.

    Output: (column, change in {ADDED, DROPPED, TYPE_CHANGED},
    cur_type, base_type, compat) — empty when the schemas agree.
    `compat` grades each movement against Iceberg's schema-evolution
    rules: ADDED is COMPATIBLE (old readers ignore unknown columns),
    DROPPED is BREAKING, and a type change is WIDENED only for the
    value-preserving primitive promotions (int->bigint, float->double,
    ...), BREAKING otherwise.
    """
    cur_t = {f.name: f.dataType.simpleString() for f in cur.schema.fields}
    base_t = {f.name: f.dataType.simpleString() for f in base.schema.fields}
    rows = []
    for name in sorted(set(cur_t) | set(base_t)):
        c, b = cur_t.get(name), base_t.get(name)
        if c is None:
            # readers selecting the column break
            rows.append((name, "DROPPED", None, b, "BREAKING"))
        elif b is None:
            # old readers ignore unknown columns
            rows.append((name, "ADDED", c, None, "COMPATIBLE"))
        elif c != b:
            compat = "WIDENED" if (b, c) in _SAFE_WIDENINGS else "BREAKING"
            rows.append((name, "TYPE_CHANGED", c, b, compat))
    return cur.sparkSession.createDataFrame(
        rows,
        "column string, change string, cur_type string, base_type string, "
        "compat string",
    )


# The value-preserving primitive promotions (Iceberg's schema-evolution
# rules: int->long, float->double, decimal scale growth is omitted —
# simpleString carries precision so it would need parsing). Everything
# else — narrowing, string<->numeric, nested-type edits — is BREAKING.
# date->timestamp is NOT here: Iceberg v1/v2 do not permit that
# promotion, so grading it WIDENED could report a reader-breaking
# change as compatible (r5 ADVICE).
_SAFE_WIDENINGS = {
    ("int", "bigint"),
    ("smallint", "int"),
    ("smallint", "bigint"),
    ("tinyint", "smallint"),
    ("tinyint", "int"),
    ("tinyint", "bigint"),
    ("float", "double"),
}
