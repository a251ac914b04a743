"""Smoke: the driver contract — entry() returns rows with a stable
schema; every queries() key either has an oracle or is documented as
rows-only; pagination/top-k determinism."""

from __future__ import annotations

import __spark_entry__ as entrymod


def test_entry_returns_rows(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert len(df.columns) > 0


def test_queries_and_oracles_aligned():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert set(oracles) <= set(qs)
    # every query callable is (spark, sf_dir) -> DataFrame
    assert all(callable(f) for f in qs.values())


def test_queries_run_at_sf0001(spark, sf0001):
    for name, fn in entrymod.queries().items():
        df = fn(spark, sf0001)
        assert df.count() >= 0, name
