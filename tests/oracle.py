"""Local replica of the driver's DuckDB oracle comparison.

Compares a Spark DataFrame against a DuckDB result: row count, column
names (sorted), and order-insensitive values with float tolerance.
"""

from __future__ import annotations

import math


def _normalize(rows, cols):
    out = []
    for row in rows:
        vals = []
        for v in row:
            if isinstance(v, float):
                if math.isnan(v):
                    vals.append("NaN")
                else:
                    vals.append(round(v, 6))
            else:
                vals.append(v)
        out.append(tuple(vals))
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
