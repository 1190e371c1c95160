"""Relational extras Spark lacks as built-ins: as-of join, range join.

Both are expressed as compositions of existing DataFrame ops (the preferred
order: composition > pandas UDF > mapPartitions), with the
shuffle/sort shape stated explicitly.

- **as-of join**: for each left row, the latest right row at or before
  its timestamp, per key — the canonical time-series enrichment
  (trades→quotes, events→config snapshots). Implemented with the
  union+window formulation: tag both sides, union, one window per key
  ordered by (ts, side) carrying the right side's payload forward with
  `last(..., ignorenulls)`. Cost: ONE shuffle on the key + ONE sort per
  partition — strictly cheaper than the naive range join (which explodes
  candidates) and never collects either side.
- **range join**: equi-join on overlapping numeric buckets + exact
  BETWEEN filter — turns the quadratic theta-join into a bucketed join
  the same way the dedup LSH paths bound candidate generation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    tolerance_seconds: int | None = None,
    max_key_rows: int | None = 10_000_000,
) -> DataFrame:
    """Backward as-of join: every `left` row gains the most recent
    `right` row with right_ts <= left_ts for the same `on` key (NULLs
    when no prior right row, or it is older than `tolerance_seconds`).

    Ties (right_ts == left_ts): the right row wins (sorted first via a
    side marker), matching DuckDB/pandas `asof` backward semantics.
    Contract: `right` must be unique per (on, right_ts) — with duplicate
    right timestamps the carried row is partition-order-dependent;
    pre-aggregate duplicates (as the harness query does) for a
    deterministic result.

    Skew contract: the window partitions by `on`, so a single hot key
    (one key holding a large fraction of both sides) becomes one
    straggler task sorting that key's full history — the standard cost
    of the union+window formulation. The guard ENFORCES the bound the
    docstring used to merely advertise (pack.token_offsets pattern):
    one cheap partial-agg-bounded probe of per-key row counts over both
    sides' key columns; past `max_key_rows` (default 10 M rows ≈ a
    single task sorting ~hundreds of MB) it raises, pointing at
    :func:`asof_join_bucketed` — identical semantics, per-task sort
    bounded to one time bucket. Pass ``max_key_rows=None`` to skip the
    probe when the key distribution is already known safe.
    """
    right_cols = right_cols or [
        c for c in right.columns if c not in (on, right_ts)
    ]
    if max_key_rows is not None:
        hot = (
            left.select(F.col(on))
            .unionByName(right.select(F.col(on)))
            .groupBy(on)
            .agg(F.count(F.lit(1)).alias("c"))
            .agg(F.max("c").alias("mx"))
            .first()["mx"]
            or 0
        )
        if hot > max_key_rows:
            raise ValueError(
                f"asof_join: hottest {on!r} key holds {hot} rows across both "
                f"sides (> max_key_rows={max_key_rows}): the per-key window "
                "would sort that key's entire history in ONE task. Use "
                "asof_join_bucketed (identical semantics, per-task sort "
                "bounded to one time bucket) or raise max_key_rows "
                "deliberately."
            )
    l_tag = left.select(
        F.col(on),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__l"),
        F.lit(None).cast("timestamp").alias("__rts"),
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"__r_{c}") for c in right_cols],
    )
    r_tag = right.select(
        F.col(on),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.lit(None).cast(l_tag.schema["__l"].dataType).alias("__l"),
        F.col(right_ts).cast("timestamp").alias("__rts"),
        *[F.col(c).alias(f"__r_{c}") for c in right_cols],
    )
    unioned = l_tag.unionByName(r_tag)
    # one shuffle on the key, one sort: right rows sort before left rows
    # at equal timestamps so an exact-time match is visible to the left
    w = (
        Window.partitionBy(on)
        .orderBy("__ts", "__side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.select(
        on,
        "__ts",
        "__side",
        "__l",
        F.last("__rts", ignorenulls=True).over(w).alias("__last_rts"),
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"__last_{c}")
            for c in right_cols
        ],
    ).where(F.col("__side") == 1)
    stale = (
        F.lit(False)
        if tolerance_seconds is None
        else (
            F.col("__last_rts").isNull()
            | (
                F.unix_timestamp(F.col("__ts").cast("timestamp"))
                - F.unix_timestamp("__last_rts")
                > tolerance_seconds
            )
        )
    )
    left_cols = [F.col("__l")[c].alias(c) for c in left.columns]
    matched = [
        F.when(~stale, F.col(f"__last_{c}")).alias(c) for c in right_cols
    ]
    return carried.select(*left_cols, *matched)


def asof_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    tolerance_seconds: int | None = None,
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Backward as-of join with a BOUNDED per-task sort — the hot-key
    escape hatch :func:`asof_join`'s docstring promises, implemented.

    Same semantics and contracts as asof_join (right wins ties, right
    unique per (on, right_ts), tolerance on the ORIGINAL right
    timestamp). Different shuffle shape: time is cut into
    `bucket_seconds` buckets and the window partitions by (key, bucket)
    instead of key, so a hot key's straggler shrinks from its ENTIRE
    history to one bucket's rows. Cross-bucket carry is restored
    exactly:

    1. per (key, right-bucket): keep only the LAST right row
       (max_by aggregation — partial-agg bounded, spread across
       buckets);
    2. bucket-granularity as-of: a per-KEY window over those one-row-
       per-bucket summaries plus the left side's distinct buckets
       computes each left bucket's carry-in (the latest right row from
       any STRICTLY earlier bucket). Per-key window input is
       O(#buckets), independent of row counts — bounded by time range /
       bucket_seconds, not by data volume;
    3. main pass: union left rows, right rows and one synthetic
       carry-in row per (key, left-bucket) (sorted before everything in
       its bucket), window per (key, bucket) — exact in-bucket backward
       match, carry-in covering lefts before the bucket's first right.

    Choose bucket_seconds so a hot key's densest bucket fits a task;
    the bucket count (and step-2 window width) is time_span/bucket.
    """
    right_cols = right_cols or [c for c in right.columns if c not in (on, right_ts)]
    w = int(bucket_seconds)
    if w <= 0:
        raise ValueError(f"bucket_seconds must be positive, got {w}")
    lb = F.floor(F.unix_timestamp(F.col(left_ts).cast("timestamp")) / w).alias("__b")
    rb = F.floor(F.unix_timestamp(F.col(right_ts).cast("timestamp")) / w).alias("__b")

    # (1) last right row per (key, bucket)
    r_payload = F.struct(
        F.col(right_ts).cast("timestamp").alias("__rts"),
        *[F.col(c).alias(f"__r_{c}") for c in right_cols],
    )
    bucket_last = right.select(F.col(on), rb, r_payload.alias("__p")).groupBy(
        on, "__b"
    ).agg(F.max_by("__p", F.col("__p.__rts")).alias("__p"))

    # (2) carry-in per (key, left-bucket): bucket-level as-of over
    # one-row-per-bucket summaries — right bucket b becomes visible at
    # b+1 (in-bucket rows are matched exactly in step 3)
    lb_rows = left.select(F.col(on), lb).distinct().withColumn("__side", F.lit(1))
    bl_rows = bucket_last.select(
        on, (F.col("__b") + 1).alias("__b"), F.lit(0).alias("__side"), "__p"
    )
    bw = (
        Window.partitionBy(on)
        .orderBy("__b", "__side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carry = (
        lb_rows.withColumn("__p", F.lit(None).cast(bl_rows.schema["__p"].dataType))
        .unionByName(bl_rows)
        .select(on, "__b", "__side", F.last("__p", ignorenulls=True).over(bw).alias("__p"))
        .where((F.col("__side") == 1) & F.col("__p").isNotNull())
    )

    # (3) main pass, windowed per (key, bucket)
    l_tag = left.select(
        F.col(on),
        lb,
        F.col(left_ts).cast("timestamp").alias("__ts"),
        F.lit(1).alias("__side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__l"),
        F.lit(None).cast(bl_rows.schema["__p"].dataType).alias("__p"),
    )
    r_tag = right.select(
        F.col(on),
        rb,
        F.col(right_ts).cast("timestamp").alias("__ts"),
        F.lit(0).alias("__side"),
        F.lit(None).cast(l_tag.schema["__l"].dataType).alias("__l"),
        r_payload.alias("__p"),
    )
    c_tag = carry.select(
        F.col(on),
        "__b",
        F.timestamp_seconds(F.col("__b") * w).alias("__ts"),  # bucket start: sorts first
        F.lit(-1).alias("__side"),
        F.lit(None).cast(l_tag.schema["__l"].dataType).alias("__l"),
        "__p",
    )
    mw = (
        Window.partitionBy(on, "__b")
        .orderBy("__ts", "__side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = (
        l_tag.unionByName(r_tag)
        .unionByName(c_tag)
        .select(
            on, "__b", "__ts", "__side", "__l",
            F.last("__p", ignorenulls=True).over(mw).alias("__p"),
        )
        .where(F.col("__side") == 1)
    )
    stale = (
        F.lit(False)
        if tolerance_seconds is None
        else (
            F.col("__p").isNull()
            | (
                F.unix_timestamp("__ts") - F.unix_timestamp(F.col("__p.__rts"))
                > tolerance_seconds
            )
        )
    )
    left_out = [F.col("__l")[c].alias(c) for c in left.columns]
    matched = [
        F.when(~stale, F.col(f"__p.__r_{c}")).alias(c) for c in right_cols
    ]
    return carried.select(*left_out, *matched)


def range_bucket_join(
    facts: DataFrame,
    ranges: DataFrame,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
    bucket_width: int = 100,
) -> DataFrame:
    """Join facts to [lo, hi] ranges containing their value — without the
    quadratic theta-join: each range explodes to the buckets it overlaps
    (sequence arithmetic, JVM-side), facts join on their single bucket
    (equi-join → hash join, broadcast when ranges are small), then the
    exact BETWEEN predicate filters in-bucket. Candidates per fact are
    bounded by ranges-per-bucket, not |ranges|."""
    rb = ranges.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / bucket_width),
                F.floor(F.col(hi_col) / bucket_width),
            )
        ),
    )
    fb = facts.withColumn("__bucket", F.floor(F.col(value_col) / bucket_width))
    return (
        fb.join(rb, on="__bucket")
        .where(F.col(value_col).between(F.col(lo_col), F.col(hi_col)))
        .drop("__bucket")
    )


def time_rollup(
    df: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    group_cols: tuple[str, ...] = ("event_type",),
    levels: tuple[str, ...] = ("minute", "hour", "day"),
) -> DataFrame:
    """Hypertable-style multi-resolution rollup: the finest level
    aggregates raw rows ONCE; every coarser level re-aggregates the
    previous level's partials (sum of counts/sums, min of mins, max of
    maxes) — so a day bucket costs a scan of hour partials, never a
    re-scan of 10^12 raw rows. This is the continuous-aggregate
    maintenance shape: at scale each level is a stored table and the
    coarser levels refresh incrementally from the finer one.

    Mergeability is what makes re-aggregation legal (count/sum/min/max
    here; HLL sketches compose the same way for distincts). Output: one
    frame with (level, *group_cols, bucket_start: epoch seconds, n_rows,
    sum_value, min_value, max_value).
    """
    gcols = list(group_cols)
    fine = (
        df.where(F.col(value_col).isNotNull())
        .groupBy(*gcols, F.date_trunc(levels[0], F.col(ts_col)).alias("__b"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(value_col).alias("sum_value"),
            F.min(value_col).alias("min_value"),
            F.max(value_col).alias("max_value"),
        )
    )
    out_levels = [fine.withColumn("level", F.lit(levels[0]))]
    cur = fine
    for lv in levels[1:]:
        cur = (
            cur.groupBy(*gcols, F.date_trunc(lv, F.col("__b")).alias("__b"))
            .agg(
                F.sum("n_rows").alias("n_rows"),
                F.sum("sum_value").alias("sum_value"),
                F.min("min_value").alias("min_value"),
                F.max("max_value").alias("max_value"),
            )
        )
        out_levels.append(cur.withColumn("level", F.lit(lv)))
    unioned = out_levels[0]
    for o in out_levels[1:]:
        unioned = unioned.unionByName(o)
    return unioned.select(
        "level",
        *gcols,
        F.unix_timestamp("__b").alias("bucket_start"),
        "n_rows",
        F.round("sum_value", 6).alias("sum_value"),
        "min_value",
        "max_value",
    )


def rate_spikes(
    df: DataFrame,
    ts_col: str = "ts",
    type_col: str = "event_type",
    window: int = 6,
    z_max: float = 3.0,
) -> DataFrame:
    """Event-rate spike gate: per (type, hour) counts graded against a
    trailing per-type baseline — the ingestion-anomaly question a
    pipeline asks of its OWN telemetry (a crawler burst, a stuck
    producer, a replayed partition all show up as rate spikes before
    they show up as content problems).

    z = (count − mean_prev_W) / stddev_prev_W over the `window`
    PRECEDING observed buckets (rows-based frame: missing hours
    compress — the gate grades against recent observed behavior, not
    calendar adjacency; documented, matched exactly by the oracle).
    status: SPIKE (z > z_max), OK, WARMUP (< window prior buckets —
    never graded on a thin baseline), FLAT (zero variance baseline —
    z undefined, surfaced rather than divided through).

    Scale shape: the only data-sized pass is the partial-aggregated
    (type, hour) count; the rolling window runs over the
    metadata-sized hourly table partitioned BY TYPE (bounded groups:
    hours-per-type is calendar-bounded — never the unpartitioned
    global window the engine bans). stddev is the sample form in both
    Spark and DuckDB; z rounds to 6 dp (the cross-engine float rule).
    Reference analogue: run_tests.py's outcome-count deltas between
    runs (/root/reference/bin/run_tests.py:131-162), graded per time
    bucket instead of per run.
    """
    if window < 2:
        raise ValueError(f"window must be >= 2, got {window}")
    hourly = hourly_counts(df, ts_col=ts_col, type_col=type_col)
    return grade_hourly(hourly, window=window, z_max=z_max)


def hourly_counts(
    df: DataFrame, ts_col: str = "ts", type_col: str = "event_type"
) -> DataFrame:
    """Per-(type, hour) event counts — the one data-sized pass of the
    spike gate, partial-aggregated map-side; also the mergeable unit
    the streaming gate accumulates (counts sum across micro-batches)."""
    return (
        df.where(F.col(type_col).isNotNull() & F.col(ts_col).isNotNull())
        .groupBy(
            F.col(type_col).alias("event_type"),
            F.date_trunc("hour", F.col(ts_col)).alias("bucket_ts"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def grade_hourly(hourly: DataFrame, window: int = 6, z_max: float = 3.0) -> DataFrame:
    """Grade an (event_type, bucket_ts, cnt) table with the trailing
    z-score rule — ONE formula shared by the batch gate and
    `streaming.streaming_rate_spikes` (a stream that has consumed rows
    X grades identically to a batch run over X)."""
    w = (
        Window.partitionBy("event_type")
        .orderBy("bucket_ts")
        .rowsBetween(-window, -1)
    )
    mean = F.avg("cnt").over(w)
    sd = F.stddev("cnt").over(w)
    n_prev = F.count(F.lit(1)).over(w)
    z = F.round((F.col("cnt") - mean) / sd, 6)
    out = hourly.select(
        "event_type",
        "bucket_ts",
        "cnt",
        F.round(mean, 6).alias("baseline_mean"),
        F.round(sd, 6).alias("baseline_sd"),
        n_prev.alias("n_prev"),
        F.when((n_prev >= window) & (sd > 0), z).alias("z"),
    )
    status = (
        F.when(F.col("n_prev") < window, "WARMUP")
        .when(F.col("baseline_sd") == 0, "FLAT")
        .when(F.col("z") > float(z_max), "SPIKE")
        .otherwise("OK")
    )
    return out.withColumn("status", status)


def funnel_counts(
    df: DataFrame,
    steps: tuple[str, ...] | list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered funnel over the event stream: how many users performed
    step 1, then step 2 STRICTLY AFTER their first step 1, then step 3
    strictly after that first qualifying step 2, ... — the classic
    conversion funnel (view -> click -> purchase) over pipeline/user
    telemetry. "First qualifying" semantics: each stage anchors at the
    user's EARLIEST event of that type after the previous anchor, the
    standard unordered-window funnel definition.

    Scale shape: one pass per step — a type-filtered, partial-aggregated
    min-timestamp groupBy on the user key, joined to the previous
    stage's user-bounded anchor frame (the per-user state is ONE
    timestamp, never an event list; AQE broadcasts the shrinking anchor
    side when small). len(steps) is a query constant, so the whole plan
    is len(steps) scans — no window over the raw stream, no event
    materialization per user. Timestamps compare at epoch-second
    granularity; same-second events do NOT satisfy "strictly after"
    (deterministic in both engines).

    Output: (step, event_type, n_users, conv_ppm) — conv_ppm relative
    to the PREVIOUS step (NULL for step 1), monotone by construction.
    """
    if len(steps) < 2:
        raise ValueError("a funnel needs >= 2 steps")
    ep = F.unix_timestamp(F.col(ts_col))
    reached = (
        df.where(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(ep).alias("_t"))
    )
    stages = [reached]
    for s in steps[1:]:
        nxt = (
            df.where(F.col(type_col) == s)
            .select(F.col(user_col), ep.alias("_e"))
            .join(reached, user_col)
            .where(F.col("_e") > F.col("_t"))
            .groupBy(user_col)
            .agg(F.min("_e").alias("_t"))
        )
        stages.append(nxt)
        reached = nxt
    summary = None
    for i, (s, frame) in enumerate(zip(steps, stages)):
        row = frame.agg(F.count(F.lit(1)).alias("n_users")).select(
            F.lit(i + 1).alias("step"), F.lit(s).alias("event_type"), "n_users"
        )
        summary = row if summary is None else summary.unionByName(row)
    w = Window.orderBy("step")
    return (
        summary.withColumn("_prev", F.lag("n_users").over(w))
        .withColumn(
            "conv_ppm",
            F.expr("CASE WHEN _prev > 0 THEN n_users * 1000000L DIV _prev END"),
        )
        .drop("_prev")
    )
