"""End-to-end runner: verdicts, violations, state, resume, error isolation.

Mirrors the reference test strategy (/root/reference/main.nf.test): a
happy-path run with exact expected counts, negative-config cases, and a
resume case (Nextflow `-resume` analogue)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tokenqc.checks.base import CheckConfig
from tokenqc.runner import QCRunner


def _total_expected_violations(expected):
    return (
        len(expected.null_doc_id)
        + len(expected.null_tokens)
        + len(expected.empty_tokens)
        + len(expected.null_ntok)
        + len(expected.null_source)
        + len(expected.ntok_mismatch)
        + len(expected.bad_format)
        + len(expected.rogue_source)
        + len(set(expected.dup_pairs.tolist()))  # one violation per dup key
        + len(expected.perturbed_ref)
    )


@pytest.fixture()
def runner(spark, tmp_path):
    return QCRunner(spark, CheckConfig(n_partitions=16), out_dir=str(tmp_path / "qc_out"))


def test_end_to_end(runner, tables, expected):
    res = runner.run(
        tables["sequences"],
        allowed_sources=tables["allowed_sources"],
        baseline_hist=tables["baseline_hist"],
        reference_tokens=tables["reference_tokens"],
        run_id="r1",
    )
    assert res.errors == {}
    assert res.violations.count() == _total_expected_violations(expected)
    # per-check violation totals are exact
    by_check = {
        r.check_name: r.c
        for r in res.violations.groupBy("check_name").agg(F.count("*").alias("c")).collect()
    }
    assert by_check["format"] == len(expected.bad_format)
    assert by_check["referential"] == len(expected.rogue_source)
    assert by_check["uniqueness"] == len(set(expected.dup_pairs.tolist()))
    assert by_check["invariant"] == len(expected.perturbed_ref)

    # every (partition, check) pair has a verdict; thresholds=0 ⇒ any
    # violation fails the partition
    verd = res.verdicts.where(F.col("partition_id") >= 0)
    assert verd.count() == 16 * 6  # 6 non-drift checks
    assert verd.where("status not in ('PASS','FAIL')").count() == 0
    fail_parts = {
        r.partition_id for r in verd.where("status = 'FAIL'").select("partition_id").distinct().collect()
    }
    viol_parts = {
        r.partition_id for r in res.violations.select("partition_id").distinct().collect()
    }
    assert fail_parts == viol_parts

    # drift verdicts present: code FAILs, web PASSes, spam9 UNKNOWN
    drift = {r.check_name: r.status for r in res.verdicts.where("partition_id = -1").collect()}
    assert drift["drift:code"] == "FAIL"
    assert drift["drift:web"] == "PASS"
    assert drift["drift:spam9"] == "UNKNOWN"

    # qc_state covers all partitions with consistent totals
    st = res.state
    assert st.select("partition_id").distinct().count() == 16
    assert st.agg(F.sum("n_rows")).first()[0] == 5000


def test_resume_skips_completed(runner, tables):
    r1 = runner.run(tables["sequences"], allowed_sources=tables["allowed_sources"], run_id="rr")
    assert r1.skipped_partitions == []
    r2 = runner.run(tables["sequences"], allowed_sources=tables["allowed_sources"], run_id="rr")
    assert r2.skipped_partitions == list(range(16))
    # idempotent: outputs unchanged after the no-op resume
    assert r2.violations.count() == r1.violations.count()


def test_partial_resume(spark, tables, tmp_path):
    """Seed state for partitions 0..7, assert only 8..15 get re-validated."""
    out = str(tmp_path / "qc_out")
    runner = QCRunner(spark, CheckConfig(n_partitions=16), out_dir=out)
    full = runner.run(tables["sequences"], run_id="full")

    import shutil

    # simulate an interrupted run: copy only a state slice for partitions 0..7
    seeded = full.state.where("partition_id < 8").select(
        "partition_id", "status", "n_rows", "n_viol", "wall_ms", "finished_at"
    )
    seeded.write.mode("overwrite").parquet(f"{out}/qc_state/run_id=part/batch=0")
    r = runner.run(tables["sequences"], run_id="part")
    assert r.skipped_partitions == list(range(8))
    done = {x.partition_id for x in r.violations.select("partition_id").distinct().collect()}
    assert done <= set(range(8, 16))


def test_threshold_tolerance(spark, tables, tmp_path):
    """With a generous threshold every partition passes despite violations."""
    cfg = CheckConfig(n_partitions=16, default_threshold=0.5, checks=("completeness", "format"))
    runner = QCRunner(spark, cfg, out_dir=str(tmp_path / "qc2"))
    res = runner.run(tables["sequences"], run_id="tol")
    verd = res.verdicts.where("partition_id >= 0")
    assert verd.where("status = 'FAIL'").count() == 0
    assert res.violations.count() > 0


def test_missing_baseline_is_unknown(spark, tables, tmp_path):
    runner = QCRunner(spark, CheckConfig(n_partitions=4, checks=("drift",)), out_dir=str(tmp_path / "qc3"))
    res = runner.run(tables["sequences"], run_id="nb")
    row = res.verdicts.where("check_name = 'drift'").first()
    assert row.status == "UNKNOWN"


def test_bad_config_rejected():
    with pytest.raises(ValueError):
        CheckConfig(n_partitions=0)
    with pytest.raises(ValueError):
        CheckConfig(default_threshold=1.5)
    with pytest.raises(ValueError):
        CheckConfig(thresholds={"format": -0.1})
    with pytest.raises(ValueError):
        CheckConfig(checks=("nonsense",))


def test_report_scores(runner, tables):
    runner.run(tables["sequences"], allowed_sources=tables["allowed_sources"], run_id="rep")
    rep = runner.report("rep")
    rows = rep.collect()
    assert len(rows) == 16
    for r in rows:
        assert 0.0 <= r.overall_score <= 1.0
        assert r.n_checks == 5  # completeness, structural, format, uniqueness, referential


# ---------------------------------------------------------------------------
# round-2 regressions: error→UNKNOWN grading, resume batch numbering,
# run-level drift, once-per-run uniqueness, missing-input UNKNOWNs
# ---------------------------------------------------------------------------
def test_no_allowed_sources_runs_clean(spark, tables, tmp_path):
    """Without allowed_sources the row-level pass must still run (no
    AnalysisException) and referential must be UNKNOWN at run level."""
    runner = QCRunner(spark, CheckConfig(n_partitions=16), out_dir=str(tmp_path / "q"))
    res = runner.run(tables["sequences"], run_id="na")
    assert res.errors == {}
    # completeness/structural/format violations are really found
    checks = {r.check_name for r in res.violations.select("check_name").distinct().collect()}
    assert {"completeness", "structural", "format"} <= checks
    # referential: one run-level UNKNOWN row, not a silent PASS
    ref = res.verdicts.where("check_name = 'referential'").collect()
    assert len(ref) == 1 and ref[0].status == "UNKNOWN" and ref[0].partition_id == -1
    # invariant + drift missing inputs are likewise UNKNOWN at run level
    inv = res.verdicts.where("check_name = 'invariant'").collect()
    assert len(inv) == 1 and inv[0].status == "UNKNOWN"
    # partitions still complete (missing input is not an error)
    assert res.state.where("status not in ('PASS','FAIL')").count() == 0


def test_errored_family_unknown_and_revalidated(spark, tables, tmp_path, monkeypatch):
    """A check family that errors must grade UNKNOWN (never PASS) and its
    partitions must NOT be marked complete — resume re-validates them."""
    from tokenqc.checks import uniqueness

    out = str(tmp_path / "qerr")
    runner = QCRunner(spark, CheckConfig(n_partitions=16), out_dir=out)

    def boom(*a, **k):
        raise RuntimeError("uniqueness exploded")

    monkeypatch.setattr(uniqueness, "violations", boom)
    res = runner.run(tables["sequences"], allowed_sources=tables["allowed_sources"], run_id="er")
    assert "uniqueness" in res.errors
    uv = res.verdicts.where("check_name = 'uniqueness'")
    assert uv.where("status != 'UNKNOWN'").count() == 0
    assert uv.where("partition_id >= 0").count() == 16  # per-partition, not -1
    # every partition carries the UNKNOWN → none are complete
    assert res.state.where("status = 'UNKNOWN'").count() == 16

    monkeypatch.undo()
    res2 = runner.run(tables["sequences"], allowed_sources=tables["allowed_sources"], run_id="er")
    assert res2.skipped_partitions == []  # re-validated, not skipped
    assert res2.errors == {}
    assert res2.verdicts.where("check_name = 'uniqueness' and status = 'UNKNOWN'").count() == 0
    assert res2.state.where("status = 'UNKNOWN'").count() == 0


def test_resume_does_not_clobber_completed_batches(spark, tables, tmp_path):
    """Crash mid-batch-1 of a 2-batch run: resume must continue numbering
    from the committed batch, drop the orphaned slices, and end with the
    same totals as an uninterrupted run (ADVICE r1: 132→76 regression)."""
    import shutil

    from tokenqc import io as qio

    out = str(tmp_path / "qcl")
    runner = QCRunner(spark, CheckConfig(n_partitions=16), out_dir=out, n_batches=2)
    ref = runner.run(tables["sequences"], allowed_sources=tables["allowed_sources"], run_id="ok")
    full_viol = ref.violations.count()
    full_verd = ref.verdicts.where("partition_id >= 0").count()

    r1 = runner.run(tables["sequences"], allowed_sources=tables["allowed_sources"], run_id="cr")
    batch0_parts = sorted(
        r.partition_id for r in r1.state.where("batch = 0").select("partition_id").collect()
    )
    # simulate a crash during batch 1: its state commit never happened
    shutil.rmtree(f"{out}/qc_state/run_id=cr/batch=1")
    assert qio.list_batches(spark, out, "violations", "cr") == [0, 1]

    r2 = runner.run(tables["sequences"], allowed_sources=tables["allowed_sources"], run_id="cr")
    assert r2.skipped_partitions == batch0_parts
    assert r2.violations.count() == full_viol
    assert r2.verdicts.where("partition_id >= 0").count() == full_verd
    assert r2.state.select("partition_id").distinct().count() == 16
    # numbering continued past the committed batch (orphan 1 was dropped,
    # the 8 pending partitions re-ran as batches 1 and 2) and every
    # written slice is committed (violations/verdicts/state agree)
    committed = qio.list_batches(spark, out, "qc_state", "cr")
    assert committed == [0, 1, 2]
    assert qio.list_batches(spark, out, "violations", "cr") == committed
    assert qio.list_batches(spark, out, "verdicts", "cr") == committed


def test_drift_once_per_run_with_batches(spark, tables, tmp_path):
    """n_batches > 1 must produce ONE drift verdict set computed on the
    full input, not per-batch partial histograms."""
    out = str(tmp_path / "qdr")
    runner = QCRunner(spark, CheckConfig(n_partitions=16), out_dir=out, n_batches=4)
    res = runner.run(
        tables["sequences"],
        allowed_sources=tables["allowed_sources"],
        baseline_hist=tables["baseline_hist"],
        run_id="dr",
    )
    drift_rows = res.verdicts.where("partition_id = -1 and check_name like 'drift:%'")
    per_source = drift_rows.groupBy("check_name").count().collect()
    assert all(r["count"] == 1 for r in per_source)  # no duplicates
    # identical statuses to a single-batch run (full-input statistics)
    single = QCRunner(spark, CheckConfig(n_partitions=16), out_dir=str(tmp_path / "qdr1")).run(
        tables["sequences"],
        allowed_sources=tables["allowed_sources"],
        baseline_hist=tables["baseline_hist"],
        run_id="dr1",
    )
    got = {r.check_name: r.status for r in drift_rows.collect()}
    want = {
        r.check_name: r.status
        for r in single.verdicts.where("partition_id = -1 and check_name like 'drift:%'").collect()
    }
    assert got == want


def test_uniqueness_planned_once_per_run(spark, tables, tmp_path, monkeypatch):
    """The dup-count shuffle is planned once per run, not once per batch."""
    from tokenqc.checks import uniqueness

    calls = []
    real = uniqueness.violations

    def counting(*a, **k):
        calls.append(1)
        return real(*a, **k)

    monkeypatch.setattr(uniqueness, "violations", counting)
    runner = QCRunner(spark, CheckConfig(n_partitions=16), out_dir=str(tmp_path / "qu"), n_batches=4)
    runner.run(tables["sequences"], allowed_sources=tables["allowed_sources"], run_id="u1")
    assert len(calls) == 1


def test_token_drift_verdicts(spark, tables, tmp_path):
    """Token-unigram drift as a first-class runner check: source-level
    token_drift:<source> verdict rows at partition -1 — the planted
    even-residue baseline FAILs code, uniform sources PASS, the rogue
    source (absent from the baseline) is UNKNOWN; details carries the
    JS value."""
    import json

    cfg = CheckConfig(
        n_partitions=4, checks=("completeness", "token_drift"), token_js_max=0.05
    )
    runner = QCRunner(spark, cfg, out_dir=str(tmp_path / "qtd"))
    res = runner.run(
        tables["sequences"],
        run_id="td1",
        token_baseline_hist=tables["token_baseline"],
    )
    assert res.errors == {}
    rows = {
        r.check_name: r
        for r in res.verdicts.where(
            "partition_id = -1 and check_name like 'token_drift:%'"
        ).collect()
    }
    assert rows["token_drift:code"].status == "FAIL"
    for s in ("web", "books", "wiki"):
        assert rows[f"token_drift:{s}"].status == "PASS"
    assert rows["token_drift:spam9"].status == "UNKNOWN"
    # n_rows counts tokens, details carries the JS divergence
    assert rows["token_drift:web"].n_rows > 0
    js = json.loads(rows["token_drift:code"].details)["js_divergence"]
    assert js > 0.05


def test_token_drift_missing_baseline_is_unknown(spark, tables, tmp_path):
    cfg = CheckConfig(n_partitions=4, checks=("token_drift",))
    runner = QCRunner(spark, cfg, out_dir=str(tmp_path / "qtd2"))
    res = runner.run(tables["sequences"], run_id="td2")
    row = res.verdicts.where("check_name = 'token_drift'").first()
    assert row.status == "UNKNOWN" and row.partition_id == -1


def test_phase_detail_modes_equivalent(spark, tables, tmp_path, monkeypatch):
    """TOKENQC_PHASE_DETAIL only changes when the violations frame is
    materialized (attribution vs single fused compute+write pass) —
    outputs are identical; each mode stamps its own timing mark."""
    import os

    cfg = CheckConfig(n_partitions=4, checks=("completeness",))
    monkeypatch.setenv("TOKENQC_PHASE_DETAIL", "1")
    r1 = QCRunner(spark, cfg, out_dir=str(tmp_path / "pd1")).run(
        tables["sequences"], run_id="pd1"
    )
    monkeypatch.delenv("TOKENQC_PHASE_DETAIL")
    r2 = QCRunner(spark, cfg, out_dir=str(tmp_path / "pd2")).run(
        tables["sequences"], run_id="pd2"
    )
    assert r1.violations.count() == r2.violations.count()
    assert sorted(
        (r.partition_id, r.check_name, r.status) for r in r1.verdicts.collect()
    ) == sorted((r.partition_id, r.check_name, r.status) for r in r2.verdicts.collect())
    assert "violations_compute" in r1.timings and "violations_write" in r1.timings
    assert "violations_compute_write" in r2.timings
    assert "violations_compute" not in r2.timings


def test_degenerate_gate_end_to_end(spark, tmp_path):
    """The degenerate-content gate as an engine check: planted
    entropy-collapse and tiling rows land as violation rows with the
    standard shape, the verdict grid grows a 'degenerate' row per
    partition, and both violation values equal the standalone ops'."""
    rows = [
        ("doc-0000000%d" % i, list(range(50 + i)), "web") for i in range(6)
    ] + [
        ("doc-deg-flood", [7] * 40, "web"),           # entropy 0 + tiling
        ("doc-deg-tile", [1, 2, 3, 4] * 12, "web"),   # entropy ln(4), tiles
        ("doc-short", [1, 2], "web"),                 # < k: entropy only
    ]
    seq = spark.createDataFrame(rows, "doc_id string, tokens array<int>, source string").withColumn(
        "n_tok", F.size("tokens")
    )
    cfg = CheckConfig(
        n_partitions=4,
        checks=("completeness", "degenerate"),
        min_entropy=1.5,
        max_dup_kgram_frac=0.2,
    )
    runner = QCRunner(spark, cfg, out_dir=str(tmp_path / "degen_out"))
    res = runner.run(seq, run_id="dg1")
    assert res.errors == {}
    viol = res.violations.where("check_name = 'degenerate'").collect()
    by_doc = {}
    for r in viol:
        by_doc.setdefault(r.doc_id, set()).add(r.observed.split(":")[0])
    assert by_doc["doc-deg-flood"] == {"low_entropy", "repetitive"}
    # ln(4) ~ 1.386 < 1.5: the tile row trips BOTH facets too
    assert by_doc["doc-deg-tile"] == {"low_entropy", "repetitive"}
    # the short row has no k-gram stat and healthy-enough entropy ln(2)?
    # ln(2) ~ 0.693 < 1.5 -> low_entropy only, never 'repetitive'
    assert by_doc["doc-short"] == {"low_entropy"}
    assert set(by_doc) == {"doc-deg-flood", "doc-deg-tile", "doc-short"}
    # verdict grid: a degenerate row per partition, FAIL where planted
    dverd = res.verdicts.where("check_name = 'degenerate'")
    assert dverd.count() == 4
    assert dverd.where("status = 'FAIL'").count() >= 1
    assert res.verdicts.where("check_name = 'completeness'").count() == 4
