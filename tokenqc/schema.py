"""Fixed StructType schemas for every engine table.

The reference is stringly-typed (CSV rows, positional Nextflow tuples,
JSON — see /root/reference/modules/ProcessRepo.nf:85 and
bin/analyze_joss.py:510-515); the engine replaces that with explicit,
enforced columnar schemas (SURVEY.md section 1.3).
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---- input -----------------------------------------------------------------
# Exact shape mandated by BASELINE.json `input_hint`.
SEQUENCES = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), True),
        T.StructField("tokens", T.ArrayType(T.IntegerType(), containsNull=False), True),
        T.StructField("n_tok", T.IntegerType(), True),
        T.StructField("source", T.StringType(), True),
    ]
)

# ---- dimensions / snapshots ------------------------------------------------
# Referential whitelist: recast of the reference's URL-format gate
# (/root/reference/main.nf:62-66) as a broadcast anti-join check.
ALLOWED_SOURCES = T.StructType(
    [
        T.StructField("source", T.StringType(), False),
        T.StructField("active", T.BooleanType(), False),
    ]
)

# Drift baseline: recast of the reference's expected-status ground truth
# (/root/reference/README.md expected-status table).
BASELINE_HIST = T.StructType(
    [
        T.StructField("source", T.StringType(), False),
        T.StructField("bucket", T.IntegerType(), False),
        T.StructField("p", T.DoubleType(), False),
    ]
)

# Per-row invariant oracle (the analogue of the reference re-running each
# repo's own test suite, /root/reference/bin/run_tests.py:109-125).
REFERENCE_TOKENS = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("tokens_ref", T.ArrayType(T.IntegerType(), containsNull=False), True),
    ]
)

# ---- outputs ---------------------------------------------------------------
# Verdict rows: the status-CSV row (ProcessRepo.nf:85) + scored criteria
# report (analyze_joss.py:510-515) merged into one long-format table.
VERDICTS = T.StructType(
    [
        T.StructField("run_id", T.StringType(), False),
        T.StructField("partition_id", T.IntegerType(), False),
        T.StructField("check_name", T.StringType(), False),
        T.StructField("status", T.StringType(), False),  # PASS | FAIL | UNKNOWN
        T.StructField("metrics", T.MapType(T.StringType(), T.DoubleType()), True),
        T.StructField("details", T.StringType(), True),
    ]
)

# Violation rows: the reference's `issues`/`details` lists
# (analyze_joss.py:216-219) as first-class rows.
VIOLATIONS = T.StructType(
    [
        T.StructField("run_id", T.StringType(), False),
        T.StructField("partition_id", T.IntegerType(), False),
        T.StructField("doc_id", T.StringType(), True),
        T.StructField("check_name", T.StringType(), False),
        T.StructField("observed", T.StringType(), True),
        T.StructField("expected", T.StringType(), True),
    ]
)

# Checkpoint/lineage table: the engine's explicit replacement for
# Nextflow's workDir-based `-resume` (nextflow.config:14).
QC_STATE = T.StructType(
    [
        T.StructField("run_id", T.StringType(), False),
        T.StructField("partition_id", T.IntegerType(), False),
        T.StructField("status", T.StringType(), False),
        T.StructField("n_rows", T.LongType(), False),
        T.StructField("n_viol", T.LongType(), False),
        T.StructField("wall_ms", T.LongType(), False),
        T.StructField("finished_at", T.TimestampType(), False),
    ]
)

PASS = "PASS"
FAIL = "FAIL"
UNKNOWN = "UNKNOWN"
