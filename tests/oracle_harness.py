"""Local stand-in for the driver's oracle-differential check.

Runs a declared Spark query and its DuckDB oracle on the same parquet
fixtures, then compares row count, column-name set, and an
order-insensitive canonicalized value multiset — the same contract as
CORRECTNESS_r{N}.json (row-count + schema + value-hash).
"""

from __future__ import annotations

import datetime as _dt
import math
from collections import Counter

import duckdb

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duckdb_rows(sql: str, sf_dir: str) -> tuple[list[str], list[tuple]]:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    return cols, cur.fetchall()


def _canon(v):
    if v is None:
        return "␀"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.9g}"
    if isinstance(v, (_dt.datetime, _dt.date)):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    return str(v)


def canon_rows(cols: list[str], rows: list[tuple]) -> Counter:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return Counter(
        "|".join(_canon(row[i]) for i in order) for row in rows
    )


def compare(spark_df, oracle: str, sf_dir: str) -> dict:
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    d_cols, d_rows = duckdb_rows(oracle, sf_dir)

    out = {
        "rows_spark": len(s_rows),
        "rows_duckdb": len(d_rows),
        "cols_spark": sorted(s_cols),
        "cols_duckdb": sorted(d_cols),
    }
    out["rows_match"] = out["rows_spark"] == out["rows_duckdb"]
    out["schema_match"] = out["cols_spark"] == out["cols_duckdb"]
    if not (out["rows_match"] and out["schema_match"]):
        out["hash_match"] = False
        return out

    sc = canon_rows(s_cols, s_rows)
    dc = canon_rows(d_cols, d_rows)
    out["hash_match"] = sc == dc
    if not out["hash_match"]:
        only_spark = list((sc - dc).items())[:3]
        only_duck = list((dc - sc).items())[:3]
        out["diff_sample"] = {"spark_only": only_spark, "duckdb_only": only_duck}
    return out


def assert_match(spark_df, oracle: str, sf_dir: str, name: str = "?") -> None:
    res = compare(spark_df, oracle, sf_dir)
    assert res["rows_match"], f"{name}: row count {res}"
    assert res["schema_match"], f"{name}: schema {res}"
    assert res["hash_match"], f"{name}: value hash {res.get('diff_sample')}"
