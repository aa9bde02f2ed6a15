"""Replicates the driver's correctness gate: run each queries() entry
on Spark and its oracle_sql() on DuckDB over the same parquet tables,
compare row counts + order-insensitive values (column-name sorted).

Marked 'spark' — run with ``pytest tests/test_oracles.py`` (slow-ish;
one shared local session).
"""

import math

import duckdb
import pytest

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


@pytest.fixture(scope="module")
def duck(sf_dir_oracle):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir_oracle}/{t}.parquet'"
        )
    return con


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 9)
    return v


def _rows(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm(r[i]) for i in order) for r in rows]
    return sorted(out, key=lambda t: tuple((v is None, str(v)) for v in t))


def _oracle_names():
    from __spark_entry__ import oracle_sql

    return sorted(oracle_sql().keys())


@pytest.mark.parametrize("name", _oracle_names())
def test_query_matches_oracle(name, spark, duck, sf_dir_oracle):
    from __spark_entry__ import oracle_sql, queries

    sdf = queries()[name](spark, sf_dir_oracle)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    res = duck.execute(oracle_sql()[name])
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (spark_cols, duck_cols)
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count {len(spark_rows)} vs {len(duck_rows)}"
    )
    a = _rows(spark_rows, spark_cols)
    b = _rows(duck_rows, duck_cols)
    if a != b:
        mism = [(x, y) for x, y in zip(a, b) if x != y][:5]
        pytest.fail(f"{name}: value mismatch, first diffs: {mism}")


def _rows_only_names():
    from __spark_entry__ import oracle_sql, queries

    return sorted(set(queries()) - set(oracle_sql()))


@pytest.mark.parametrize("name", _rows_only_names())
def test_rows_only_queries_run(name, spark, sf_dir_oracle):
    from __spark_entry__ import queries

    df = queries()[name](spark, sf_dir_oracle)
    assert df.count() >= 0
    assert len(df.columns) > 0


def test_entry_smoke(spark):
    from __spark_entry__ import entry

    df = entry(spark)
    assert df.count() > 0
