"""Table-LAYOUT validation and repair keys — does the physical
organization of the corpus table support partition pruning at 10^12
rows, and if not, what sort key fixes it?

At web scale the difference between a pruned scan and a full scan is
the job: a query gated on `n_tok BETWEEN a AND b` (every length-bucket
pipeline stage) prunes file groups only if each partition's min/max
range is narrow and ranges overlap little. `clustering_audit` measures
exactly that from the table itself — the same min/max-per-partition
stats an Iceberg manifest carries; `zorder_key` emits the interleaved
sort key (the Delta/Iceberg OPTIMIZE ZORDER idea) that co-clusters two
or more dimensions so range predicates on ANY of them prune.

Reference analogue: the reference workflow fans per-tool work into
per-partition chunks (main.nf:91-132) and assumes healthy chunking;
this module is the check that assumption gets at Spark scale.

Scale shape: `clustering_audit` reduces the table to one row per
partition with a map-side partial-aggregated min/max/count pass (the
exchange carries tasks x P rows), then self-joins the P-row range
table — P is the PARTITION count (metadata-bounded, ~10^3..10^5), so
the quadratic stays driver-scale and Spark broadcasts it. `zorder_key`
needs one tiny global min/max aggregate per column (one row,
broadcast) and is otherwise a pure in-row bit-interleave projection —
zero extra shuffles; writing the table sorted by the key is the
caller's `repartitionByRange`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def clustering_audit(
    df: DataFrame, part_col: str, value_col: str
) -> DataFrame:
    """Per-partition value-range stats + pairwise range-overlap counts
    for one column — the partition-pruning health check. A perfectly
    clustered table has n_overlaps = 0 everywhere (disjoint ranges: a
    range predicate touches one partition); a randomly loaded table has
    n_overlaps ~ P-1 (every scan is a full scan). NULL values carry no
    range information and are excluded (they are completeness
    violations upstream).

    Output: (part, lo, hi, n_rows, n_overlaps) — overlap counted
    closed-interval ([lo,hi] sharing any point), self excluded.
    """
    rng = (
        df.where(F.col(value_col).isNotNull())
        .groupBy(F.col(part_col).alias("part"))
        .agg(
            F.min(value_col).alias("lo"),
            F.max(value_col).alias("hi"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )
    other = rng.select(
        F.col("part").alias("_p2"), F.col("lo").alias("_lo2"), F.col("hi").alias("_hi2")
    )
    pairs = rng.join(
        F.broadcast(other),
        (F.col("lo") <= F.col("_hi2"))
        & (F.col("_lo2") <= F.col("hi"))
        & (F.col("part") != F.col("_p2")),
        "left",
    )
    return pairs.groupBy("part", "lo", "hi", "n_rows").agg(
        F.count(F.col("_p2")).alias("n_overlaps")
    )


def zorder_key(
    df: DataFrame,
    cols: tuple[str, ...] | list[str],
    bits: int = 16,
    out_col: str = "zkey",
) -> DataFrame:
    """Z-order (Morton) sort key over 2+ numeric columns: each column
    normalizes to a `bits`-bit integer cell against its GLOBAL min/max
    (floor(x+0.5) affine — the scalar_quantize idiom, deterministic
    IEEE doubles, exactly reproducible), then the cells' bits
    interleave LSB-first: bit i of column c lands at position
    i * ncols + c. Sorting / range-partitioning by the key gives every
    interleaved column pruning power at once. NULLs in any keyed
    column yield a NULL key (they sort together at the end; rows with
    no range information cannot be placed).

    ncols * bits must fit a signed 64-bit key (<= 63). The min/max
    aggregate is ONE broadcast row; the key itself is in-row bit math —
    no shuffle, no Python.
    """
    cols = list(cols)
    if len(cols) < 2:
        raise ValueError("zorder needs >= 2 columns")
    if bits < 1 or bits * len(cols) > 63:
        raise ValueError("bits * ncols must be in [len(cols), 63]")
    aggs = []
    for c in cols:
        aggs += [
            F.min(F.col(c).cast("double")).alias(f"_lo_{c}"),
            F.max(F.col(c).cast("double")).alias(f"_hi_{c}"),
        ]
    bounds = df.agg(*aggs)
    out = df.crossJoin(F.broadcast(bounds))
    mx = float((1 << bits) - 1)
    cells = []
    for c in cols:
        lo, hi = F.col(f"_lo_{c}"), F.col(f"_hi_{c}")
        v = F.col(c).cast("double")
        cell = F.when(hi == lo, F.lit(0)).otherwise(
            F.least(
                F.lit(mx),
                F.greatest(
                    F.lit(0.0), F.floor((v - lo) / (hi - lo) * F.lit(mx) + F.lit(0.5))
                ),
            )
        ).cast("long")
        cells.append(cell)
    n = len(cols)
    key = F.lit(0).cast("long")
    for i in range(bits):
        for ci, cell in enumerate(cells):
            key = key + F.shiftleft(
                F.shiftright(cell, i).bitwiseAND(F.lit(1)), i * n + ci
            )
    null_any = None
    for c in cols:
        isn = F.col(c).isNull()
        null_any = isn if null_any is None else (null_any | isn)
    return out.withColumn(
        out_col, F.when(null_any, F.lit(None).cast("long")).otherwise(key)
    ).drop(*[f"_lo_{c}" for c in cols], *[f"_hi_{c}" for c in cols])
