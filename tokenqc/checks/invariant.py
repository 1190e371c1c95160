"""Per-row invariant gate: token arrays must equal the reference copy.

Engine analogue of the reference re-running each repo's own test suite
and comparing outcomes (/root/reference/bin/run_tests.py:109-125,
modules/TestExecutor.nf) — ground truth re-checked per item.

Scale plan: at 10^12 rows the `tokens` array dominates I/O and shuffle,
so we never shuffle the arrays themselves. Each side is first reduced to
(doc_id, xxhash64(tokens)) in a narrow projection — the array is read
once, hashed JVM-side inside whole-stage codegen, and dropped before the
join — then a sort-merge (or broadcast, if the reference slice is small)
equi-join compares 16 bytes per row instead of KBs. 64-bit collisions
(~n²/2⁶⁵) are documented; `exact=True` joins the raw arrays for audits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tokenqc.checks.base import CheckConfig, partition_id_col

CHECK = "invariant"


def violations(
    df: DataFrame, reference: DataFrame, cfg: CheckConfig, exact: bool = False
) -> DataFrame:
    """Rows whose tokens differ from the reference copy (inner join on
    doc_id: rows absent from the reference are not checked — UNKNOWN,
    not FAIL, matching the reference's missing-input default,
    /root/reference/bin/analyze_joss.py:96-105)."""
    if exact:
        left = df.where(F.col("doc_id").isNotNull()).select("doc_id", F.col("tokens").alias("_t"))
        right = reference.select("doc_id", F.col("tokens_ref").alias("_r"))
        mismatch = ~(
            (F.col("_t").isNull() & F.col("_r").isNull())
            | (F.col("_t").isNotNull() & F.col("_r").isNotNull() & (F.col("_t") == F.col("_r")))
        )
    else:
        left = df.where(F.col("doc_id").isNotNull()).select(
            "doc_id", F.xxhash64("tokens").alias("_t")
        )
        right = reference.select("doc_id", F.xxhash64("tokens_ref").alias("_r"))
        mismatch = F.col("_t") != F.col("_r")
    return (
        left.join(right, on="doc_id", how="inner")
        .where(mismatch)
        .select(
            partition_id_col(cfg).alias("partition_id"),
            "doc_id",
            F.lit(CHECK).alias("check_name"),
            F.lit("tokens != tokens_ref").alias("observed"),
            F.lit("tokens == tokens_ref").alias("expected"),
        )
    )
