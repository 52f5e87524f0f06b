"""Local replica of the driver's DuckDB oracle comparison.

Compares a Spark DataFrame against a DuckDB result: row count, column
names (sorted), and order-insensitive values with float tolerance.
"""

from __future__ import annotations

import math


def _norm_val(v):
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else round(v, 6)
    if hasattr(v, "tolist"):  # numpy scalar or array
        return _norm_val(v.tolist())
    if isinstance(v, (list, tuple)):
        return tuple(_norm_val(x) for x in v)
    return v


def _normalize(rows, cols):
    out = [tuple(_norm_val(v) for v in row) for row in rows]
    out.sort(key=lambda r: tuple(str(x) for x in r))
    return out


def assert_matches_oracle(spark_df, duck_con, sql: str, name: str = "?") -> None:
    sdf = spark_df.toPandas()
    ddf = duck_con.sql(sql).df()

    scols = sorted(sdf.columns)
    dcols = sorted(ddf.columns)
    assert scols == dcols, f"[{name}] column mismatch: spark={scols} duck={dcols}"

    sdf = sdf[scols]
    ddf = ddf[dcols]
    assert len(sdf) == len(ddf), f"[{name}] row count: spark={len(sdf)} duck={len(ddf)}"

    srows = _normalize(sdf.itertuples(index=False, name=None), scols)
    drows = _normalize(ddf.itertuples(index=False, name=None), dcols)
    for i, (a, b) in enumerate(zip(srows, drows)):
        assert a == b, f"[{name}] row {i} differs:\n  spark={a}\n  duck ={b}"
