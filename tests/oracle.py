"""Local mirror of the driver's DuckDB-oracle comparison: row count,
column-name set, and order-insensitive value equality (exact string
equality after the in-query rounding both sides apply)."""

from __future__ import annotations

import math

import duckdb


def duck_connection(sf_dir: str):
    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _norm_cell(v):
    # NOTE: this normalizer is LAXER than the driver's comparator — it
    # folds integral floats to int strings, so a DuckDB HUGEINT/DECIMAL
    # column (materialized as float64/object by pandas) still matches
    # here while the driver hash-reds on "3.0" vs "3".
    # tests/test_oracle_types.py lints that divergence out of oracles.
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(round(v, 9))
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def canonical_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return [cols[i] for i in order], out


def compare(spark_df, con, sql: str) -> dict:
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    res = con.sql(sql)
    d_cols = res.columns
    d_rows = res.fetchall()
    sc, srows = canonical_rows(s_cols, s_rows)
    dc, drows = canonical_rows(d_cols, d_rows)
    report = {
        "rows_spark": len(srows), "rows_duck": len(drows),
        "cols_spark": sc, "cols_duck": dc,
        "cols_match": sc == dc,
        "rows_match": len(srows) == len(drows),
        "values_match": srows == drows,
    }
    if not report["values_match"] and report["cols_match"]:
        diffs = [(a, b) for a, b in zip(srows, drows) if a != b]
        report["first_diffs"] = diffs[:5]
        only_s = set(srows) - set(drows)
        only_d = set(drows) - set(srows)
        report["only_spark"] = sorted(only_s)[:5]
        report["only_duck"] = sorted(only_d)[:5]
    return report
