"""tokenqc — a PySpark-native schema + constraint validation engine.

A from-scratch re-expression of the QC capabilities of
mc2-center/cckp-toolkit-workflow (a Nextflow repo-QC pipeline: presence,
format, execution and content checks fanned over items, joined by key,
scored into PASS/FAIL verdicts and reports — see /root/reference/main.nf)
as a single-pass, columnar, Catalyst-optimized validation pipeline over
tables of pre-tokenized training sequences:

    sequences(doc_id string, tokens array<int>, n_tok int, source string)

Design stance (SURVEY.md section 7.0): pure ``pyspark.sql`` DataFrame API,
vectorized pandas/Arrow UDFs only where SQL genuinely cannot express the
math (drift statistics on pre-aggregated histograms), no per-row Python,
no RDDs, no custom Catalyst rules.
"""

__version__ = "0.1.0"

from tokenqc.session import get_spark  # noqa: F401
