"""Local replica of the driver's DuckDB oracle comparison.

Compares a Spark DataFrame against a DuckDB result with the DRIVER'S
EXACT semantics: row count, column names (sorted), then
``sorted(map(str, df[cols].round(6).itertuples(...)))`` on both sides.
The stringified compare is deliberately type-strict — pandas dtype
differences the tolerant ``==`` would forgive (DuckDB HUGEINT → float
``4540.0`` vs Spark long ``4540``) fail the driver's hash, so they
must fail here too (caught live: ``char_bigram_lm`` round 6).
"""

from __future__ import annotations


def _driver_rows(df, cols):
    return sorted(map(str, df[cols].round(6).itertuples(index=False, name=None)))


def assert_matches_oracle(spark_df, duck_con, sql: str, name: str = "?") -> None:
    sdf = spark_df.toPandas()
    ddf = duck_con.sql(sql).df()

    scols = sorted(sdf.columns)
    dcols = sorted(ddf.columns)
    assert scols == dcols, f"[{name}] column mismatch: spark={scols} duck={dcols}"

    assert len(sdf) == len(ddf), f"[{name}] row count: spark={len(sdf)} duck={len(ddf)}"

    srows = _driver_rows(sdf, scols)
    drows = _driver_rows(ddf, dcols)
    for i, (a, b) in enumerate(zip(srows, drows)):
        assert a == b, f"[{name}] row {i} differs:\n  spark={a}\n  duck ={b}"
