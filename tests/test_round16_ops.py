"""Round-16 tests (optimization round 2): the ADVICE r15 hardening —
the CC loop's conf overrides folded into one depth-guarded scope,
local_frame's row-arity validation and createDataFrame-parity
nullability — plus pins for any operator internals this round's
optimizations restructure."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T


# --------------------------------------------------------------------------
# ADVICE r15 (medium) — the CC loop's shuffle-partition override must
# live in the SAME depth-guarded scope as the constraint-propagation
# toggle: a nested/overlapping connected_components call on one session
# must never capture the outer call's scratch value, and the outermost
# exit must restore the TRUE pre-entry values of BOTH confs.
# --------------------------------------------------------------------------


def test_cc_conf_scope_is_depth_guarded_for_nested_calls(spark, monkeypatch):
    from udacity_dsnd_projects_spark.functions import curation

    _SP = "spark.sql.shuffle.partitions"
    _CP = "spark.sql.constraintPropagation.enabled"
    before_sp = spark.conf.get(_SP)
    before_cp = spark.conf.get(_CP)
    assert before_sp != "1", "test needs a pre-entry value != loop scratch"

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (4, 5)], "doc_a long, doc_b long"
    )
    seen: dict[str, str] = {}
    real_loop = curation._connected_components_loop

    def nested_once(p):
        if "inner_sp" not in seen:
            # simulate an overlapping call: by the time the inner call
            # starts, the outer loop has already set its scratch values
            out = real_loop(p)
            seen["inner_sp"] = "marker"
            inner = curation.connected_components(pairs)
            inner.collect()
            # the inner exit must NOT have restored anything yet
            # (depth > 1): the session still runs the loop regime
            seen["after_inner_sp"] = spark.conf.get(_SP)
            seen["after_inner_cp"] = spark.conf.get(_CP)
            return out
        return real_loop(p)

    monkeypatch.setattr(curation, "_connected_components_loop", nested_once)
    out = {
        r["doc_id"]: r["component"]
        for r in curation.connected_components(pairs).collect()
    }
    assert out == {1: 1, 2: 1, 3: 1, 4: 4, 5: 4}
    # while nested, the inner exit left the scoped confs alone
    assert seen["after_inner_cp"] == "false"
    # outermost exit restored the true pre-entry values of BOTH confs
    assert spark.conf.get(_SP) == before_sp
    assert spark.conf.get(_CP) == before_cp


# --------------------------------------------------------------------------
# ADVICE r15 (low) — local_frame input validation + nullability parity
# --------------------------------------------------------------------------


def test_local_frame_rejects_short_and_long_rows(spark):
    from udacity_dsnd_projects_spark.operators.localframe import local_frame

    with pytest.raises(ValueError, match="1 values for 2"):
        local_frame(spark, [("a",)], "k string, n long")
    with pytest.raises(ValueError, match="3 values for 2"):
        local_frame(spark, [("a", 1, 2)], "k string, n long")


def test_local_frame_nullability_matches_createdataframe(spark):
    """All-non-null literal columns must come out with the DECLARED
    nullability, exactly like createDataFrame — not nullable=False."""
    from udacity_dsnd_projects_spark.operators.localframe import local_frame

    schema = T.StructType(
        [
            T.StructField("k", T.StringType(), True),
            T.StructField("n", T.LongType(), True),
        ]
    )
    rows = [("a", 1), ("b", 2)]
    lf = local_frame(spark, rows, schema)
    cf = spark.createDataFrame(rows, schema)
    assert lf.schema == cf.schema
    assert sorted(map(tuple, lf.collect())) == sorted(map(tuple, cf.collect()))
    # the literal path must stay task-free: no Python-RDD scan
    plan = lf._jdf.queryExecution().executedPlan().toString()
    assert "ExistingRDD" not in plan
