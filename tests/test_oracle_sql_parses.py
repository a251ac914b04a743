"""Fast guard: every oracle_sql() twin must PARSE and PLAN in DuckDB
(EXPLAIN over the real sf0.001 views — no Spark session, seconds not
minutes). Catches SQL typos/renames immediately; value equivalence is
the verify_local / driver gate's job."""

from __future__ import annotations

import duckdb

import __spark_entry__ as entrymod

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def test_every_oracle_sql_plans_in_duckdb(sf0001):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf0001}/{t}.parquet')"
        )
    oracles = entrymod.oracle_sql()
    queries = entrymod.queries()
    # keys line up (corpus_cardinality is the declared rows-only slot)
    assert set(oracles) == set(queries) - {"corpus_cardinality"}
    bad = {}
    for name, sql in oracles.items():
        try:
            con.execute(f"EXPLAIN {sql}")
        except Exception as e:  # noqa: BLE001 - collect all failures
            bad[name] = str(e).splitlines()[0]
    assert not bad, f"oracle SQL fails to plan: {bad}"
