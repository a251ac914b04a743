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


def test_oracle_and_spark_column_names_match(spark, sf0001):
    """Schema-parity guard (r8 lesson): the driver's compare sorts
    columns BY NAME before hashing, so a Spark-side widening without
    its oracle twin ships a silent schema_match=false. Compare DuckDB
    DESCRIBE <oracle> column names against the Spark query's
    ``.columns`` — schema-only, lazy, no execution; a deliberately
    added extra Spark column turns this red at commit time."""
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf0001}/{t}.parquet')"
        )
    oracles = entrymod.oracle_sql()
    queries = entrymod.queries()
    bad = {}
    for name, sql in oracles.items():
        duck_cols = sorted(
            r[0] for r in con.execute(f"DESCRIBE {sql}").fetchall()
        )
        spark_cols = sorted(queries[name](spark, sf0001).columns)
        if duck_cols != spark_cols:
            extra = sorted(set(spark_cols) - set(duck_cols))
            missing = sorted(set(duck_cols) - set(spark_cols))
            bad[name] = f"spark-only={extra} oracle-only={missing}"
    assert not bad, f"column-name drift (spark vs oracle): {bad}"
