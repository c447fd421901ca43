"""Every declared query must run at sf0.001 and keep a stable schema —
the cheap gate that catches accidental breakage of any registry entry
(the DuckDB value-parity gate is tools/oracle_check.py at sf0.01)."""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod

SF = "/root/testdata/sf0.001"
ALL = sorted(entry_mod.queries().items())


@pytest.mark.parametrize("name,fn", ALL, ids=[n for n, _ in ALL])
def test_query_runs_and_has_columns(spark, name, fn):
    df = fn(spark, SF)
    assert df.columns, f"{name} returned no columns"
    rows = df.limit(5).collect()
    assert rows is not None


def test_every_oracle_has_a_query():
    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    assert set(oracles) <= set(qs)
    # declared surface size — bump intentionally when adding operators
    assert len(qs) >= 111 and len(oracles) >= 106


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0 and "sum_qty" in df.columns
