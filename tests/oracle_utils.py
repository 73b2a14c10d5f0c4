"""Local replica of the driver's oracle-differential check: run a registry
query on Spark and its oracle SQL on DuckDB over the same parquet tables,
then compare row count, column names, and (order-insensitively) values.
"""

from __future__ import annotations

import math
from pathlib import Path

import duckdb

from hadoop_map_reduce_spark.session import TABLES

REL_TOL = 1e-9
ABS_TOL = 1e-9


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = Path(sf_dir) / f"{t}.parquet"
        if path.exists():
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
            )
    return con


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def _sorted_rows(cols: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    projected = [tuple(_norm(r[i]) for i in order) for r in rows]
    return sorted(projected, key=repr)


def compare_query(spark, sf_dir: str, name: str) -> None:
    """Assert Spark result == DuckDB oracle result for registry query `name`."""
    from hadoop_map_reduce_spark.plans import REGISTRY

    q = REGISTRY[name]
    assert q.oracle is not None, f"{name} has no oracle"

    sdf = q.fn(spark, sf_dir)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    con = duckdb_connection(sf_dir)
    try:
        res = con.execute(q.oracle)
        duck_cols = [d[0] for d in res.description]
        duck_rows = res.fetchall()
    finally:
        con.close()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch spark={spark_cols} duckdb={duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count spark={len(spark_rows)} duckdb={len(duck_rows)}"
    )

    s_rows = _sorted_rows(spark_cols, spark_rows)
    d_rows = _sorted_rows(duck_cols, duck_rows)
    mismatches = 0
    for i, (sr, dr) in enumerate(zip(s_rows, d_rows)):
        if not _rows_equal(sr, dr):
            mismatches += 1
            if mismatches <= 5:
                print(f"{name}: row {i} mismatch\n  spark ={sr}\n  duckdb={dr}")
    assert mismatches == 0, f"{name}: {mismatches} mismatching rows"


def _rows_equal(a: tuple, b: tuple) -> bool:
    if len(a) != len(b):
        return False
    for x, y in zip(a, b):
        if isinstance(x, float) and isinstance(y, float):
            if x != y and not math.isclose(x, y, rel_tol=REL_TOL, abs_tol=ABS_TOL):
                return False
        elif x != y:
            return False
    return True
