"""Driver-contract checks: entry() smoke, every oracle-paired query
matches DuckDB at sf0.001 (full sf0.01 parity is exercised by the driver
and was verified manually at sf0.01), rows-only queries return rows."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import __spark_entry__ as E  # noqa: E402
from oracle_util import compare  # noqa: E402

SF = "/root/testdata/sf0.001"


def test_entry_smoke(spark):
    df = E.entry(spark)
    rows = df.collect()
    assert len(rows) == 16 * 4  # partitions × row-level checks
    assert set(df.columns) == {"partition_id", "check_name", "n_viol", "status"}


def test_every_oracle_key_has_query():
    q = E.queries()
    for k in E.oracle_sql():
        assert k in q, k
    xq = E.extra_queries()
    for k in E.extra_oracle_sql():
        assert k in xq, k


def test_driver_surface_is_exactly_50():
    """The driver records at most 50 CORRECTNESS rows (r03: 57 declared,
    50 recorded) — the declared surface must fit so EVERY query gets a
    row, and every main query except none must have an oracle."""
    q = E.queries()
    assert len(q) == 50
    assert set(E.oracle_sql()) == set(q)  # 100% oracle coverage, 0 rows-only
    assert not (set(E.extra_queries()) & set(q))  # no double-declared keys


@pytest.mark.parametrize("name", sorted(E.oracle_sql().keys()))
def test_query_matches_oracle_sf0001(spark, name):
    q = E.queries()[name]
    ok, msg = compare(q(spark, SF), SF, E.oracle_sql()[name])
    assert ok, f"{name}: {msg}"


@pytest.mark.parametrize("name", sorted(E.extra_oracle_sql().keys()))
def test_extra_query_matches_oracle_sf0001(spark, name):
    """Queries folded out of the 50-row driver surface keep full oracle
    parity here — coverage is unchanged, only the driver rows moved."""
    q = E.extra_queries()[name]
    ok, msg = compare(q(spark, SF), SF, E.extra_oracle_sql()[name])
    assert ok, f"{name}: {msg}"


def test_rows_only_queries_run(spark):
    df = E.extra_queries()["simhash_pairs"](spark, SF)
    assert df.count() >= 0  # executes without error; recall gated by
    # simhash_planted_recall (driver) + brute-force Hamming (unit)


def test_drift_verdict_full_statuses(spark):
    out = {r.source: r.status for r in E.queries()["drift_verdicts_full"](spark, SF).collect()}
    assert out["web"] == "PASS"  # web measured against its own shape
