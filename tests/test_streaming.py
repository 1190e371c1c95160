"""Incremental (Structured Streaming) QC: micro-batches flow through the
same row-level gates; checkpoint makes re-runs skip consumed files."""

from __future__ import annotations

import pyarrow.parquet as pq

from tokenqc import streaming, synth
from tokenqc.checks.base import CheckConfig


def _allowed(spark):
    return spark.createDataFrame(
        [(s, True) for s in synth.SOURCES], "source string, active boolean"
    )


def test_qc_stream_end_to_end(spark, tmp_path, expected):
    inp = tmp_path / "stream_in"
    inp.mkdir()
    seq = synth.generate_sequences(2000, seed=42)
    pq.write_table(seq.slice(0, 1000), str(inp / "f1.parquet"))
    pq.write_table(seq.slice(1000, 1000), str(inp / "f2.parquet"))
    out = str(tmp_path / "stream_out")

    q = streaming.qc_stream(
        spark, str(inp), out, _allowed(spark), CheckConfig(n_partitions=8), run_id="s1"
    )
    q.awaitTermination(120)

    viol = spark.read.parquet(f"{out}/violations_stream")
    exp2k = synth.plan_expected(2000)
    want = (
        len(exp2k.null_doc_id) + len(exp2k.null_tokens) + len(exp2k.empty_tokens)
        + len(exp2k.null_ntok) + len(exp2k.null_source) + len(exp2k.ntok_mismatch)
        + len(exp2k.bad_format) + len(exp2k.rogue_source)
    )
    assert viol.count() == want
    assert viol.select("epoch").distinct().count() >= 1

    # restart with the same checkpoint: no new files → no duplicate rows
    q2 = streaming.qc_stream(
        spark, str(inp), out, _allowed(spark), CheckConfig(n_partitions=8), run_id="s1"
    )
    q2.awaitTermination(120)
    assert spark.read.parquet(f"{out}/violations_stream").count() == want


def test_incremental_file_arrival(spark, tmp_path):
    inp = tmp_path / "inc_in"
    inp.mkdir()
    out = str(tmp_path / "inc_out")
    seq = synth.generate_sequences(1000, seed=7)
    pq.write_table(seq, str(inp / "f1.parquet"))
    q = streaming.qc_stream(spark, str(inp), out, _allowed(spark), CheckConfig(n_partitions=8))
    q.awaitTermination(120)
    n1 = spark.read.parquet(f"{out}/violations_stream").count()
    # a new file lands; only its rows are processed on the next trigger
    pq.write_table(seq, str(inp / "f2.parquet"))
    q2 = streaming.qc_stream(spark, str(inp), out, _allowed(spark), CheckConfig(n_partitions=8))
    q2.awaitTermination(120)
    assert spark.read.parquet(f"{out}/violations_stream").count() == 2 * n1
