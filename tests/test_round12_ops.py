"""Round-12 tests: the media-type-mismatch full-string tie-break
(VERDICT r11 task 4), the winnowing_strip keeper semi-join, the
too-short-stream-row redelivery dedup, the connected-components
conf-restore reentrancy guard, and the cached substrate-layout probe
(ADVICE r11)."""

from __future__ import annotations

from pyspark.sql import functions as F

from udacity_dsnd_projects_spark.functions.multimodal import _mismatch_rollup


# --------------------------------------------------------------------------
# Task 4 — media_type_mismatch_report tie-break: when two WRONG sniffs
# tie on count and share a FIRST LETTER, the winner must be the full-
# string lexicographic minimum (the oracle's ORDER BY n DESC, sniffed).
# The old F.ascii() surrogate ordered by the first character only and
# would pick either arbitrarily.
# --------------------------------------------------------------------------


def test_mismatch_tiebreak_full_string(spark):
    # declared 'image'; wrong sniffs 'audio' and 'aiff' tie 2-2 and
    # share the initial 'a' — full-string order says 'aiff' wins.
    rows = (
        [("image", "audio")] * 2
        + [("image", "aiff")] * 2
        + [("image", "image")] * 3
    )
    s = spark.createDataFrame(rows, ["modality", "sniffed"])
    out = _mismatch_rollup(s).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_media"] == 7 and r["n_mismatch"] == 4
    assert r["top_sniffed_other"] == "aiff"


def test_mismatch_tiebreak_count_still_dominates(spark):
    # count beats lexicographic order: 'video' x3 beats 'aiff' x2.
    rows = (
        [("image", "video")] * 3
        + [("image", "aiff")] * 2
        + [("image", "image")] * 1
    )
    s = spark.createDataFrame(rows, ["modality", "sniffed"])
    r = _mismatch_rollup(s).collect()[0]
    assert r["top_sniffed_other"] == "video"
    assert r["n_mismatch"] == 5


def test_mismatch_all_clean_modality_yields_null_top(spark):
    rows = [("audio", "audio")] * 4
    s = spark.createDataFrame(rows, ["modality", "sniffed"])
    r = _mismatch_rollup(s).collect()[0]
    assert r["n_mismatch"] == 0 and r["top_sniffed_other"] is None


# --------------------------------------------------------------------------
# ADVICE r11 — connected_components' scoped constraint-propagation
# disable must be reentrancy-safe: a nested call sees 'false' already
# set, and only the OUTERMOST exit restores the true pre-entry value.
# --------------------------------------------------------------------------


def test_cc_conf_toggle_is_reentrant(spark, monkeypatch):
    from udacity_dsnd_projects_spark.functions import curation as c

    _CP = "spark.sql.constraintPropagation.enabled"
    prev = spark.conf.get(_CP)
    spark.conf.set(_CP, "true")
    try:
        pairs = spark.createDataFrame([(1, 2), (2, 3)], ["doc_a", "doc_b"])
        orig = c._connected_components_loop
        state = {"outer": True}

        def nested(p):
            if state["outer"]:
                state["outer"] = False
                out = c.connected_components(p)  # nested entry
                # mid-nesting the conf must still be off, and the inner
                # exit must NOT have restored anything yet
                assert spark.conf.get(_CP) == "false"
                return out
            return orig(p)

        monkeypatch.setattr(c, "_connected_components_loop", nested)
        labels = {r.doc_id: r.component for r in c.connected_components(pairs).collect()}
        assert labels == {1: 1, 2: 1, 3: 1}
        # outermost exit restored the TRUE pre-entry value, not our 'false'
        assert spark.conf.get(_CP) == "true"
        assert id(spark) not in c._CC_CONF_DEPTH
    finally:
        spark.conf.set(_CP, prev)


# --------------------------------------------------------------------------
# ADVICE r11 — the substrate layout probe is memoized per analyzed
# plan: composing several substrates over one input converts to an RDD
# (full physical planning) ONCE, and distinct inputs don't collide.
# --------------------------------------------------------------------------


def test_spread_probe_memoized_per_plan(spark, monkeypatch):
    from udacity_dsnd_projects_spark.functions import dedup as d

    d._SPREAD_PROBE_CACHE.clear()
    rows = [(i, f"alpha beta gamma doc {i}") for i in range(30)]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])

    # patch the CONCRETE DataFrame class (Spark 4's classic subclass
    # defines .rdd as a cached_property — patching the abstract base
    # would count nothing, and cached_property has no .fget)
    cls = type(docs)
    orig_rdd = cls.rdd
    hits = {"n": 0}

    def counting(self):
        hits["n"] += 1
        return orig_rdd.__get__(self, cls)

    monkeypatch.setattr(cls, "rdd", property(counting))
    a = d._spread_for_hashing(docs)
    b = d._spread_for_hashing(docs)
    assert hits["n"] == 1, "second probe of the same plan must hit the cache"
    assert a.schema == b.schema
    # a DIFFERENT layout over the same rows is a different plan → new probe
    d._spread_for_hashing(docs.coalesce(1))
    assert hits["n"] == 2
    assert len(d._SPREAD_PROBE_CACHE) == 2


# --------------------------------------------------------------------------
# ADVICE r11 — winnowing_strip's keeper md5 must evaluate ABOVE the
# keeper join (one text row hashed per cluster), not under it (every
# corpus row hashed). In the plan text, parents print before children,
# so the md5 projection must appear before the join node.
# --------------------------------------------------------------------------


def test_winnowing_strip_md5_above_join(spark, sf_dir):
    from udacity_dsnd_projects_spark.functions.curation import winnowing_strip

    df = winnowing_strip(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    i_md5 = plan.index("md5(")
    i_join = min(
        i for i in (plan.find("BroadcastHashJoin"), plan.find("SortMergeJoin"))
        if i != -1
    )
    assert i_md5 < i_join, plan


# --------------------------------------------------------------------------
# ADVICE r11 — a too-short doc re-delivered across micro-batches must
# emit its (doc_id, NULL, NULL, NULL) row ONCE (nulls compare equal in
# dropDuplicates), matching the docstring's emitted-once contract.
# --------------------------------------------------------------------------


def test_short_doc_redelivery_emits_once(spark, tmp_path):
    from udacity_dsnd_projects_spark.functions.dedup import winnowing_index_for
    from udacity_dsnd_projects_spark.streaming.stateful import (
        substring_match_stream,
    )

    hist = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon zeta eta theta iota kappa")],
        ["doc_id", "text"],
    )
    idx = winnowing_index_for(hist)

    src = tmp_path / "src"
    src.mkdir()
    batch = spark.createDataFrame([(7, "too short")], ["doc_id", "text"])
    # the SAME short doc delivered twice (two files → two micro-batches)
    batch.coalesce(1).write.mode("overwrite").parquet(str(src / "b1"))
    batch.coalesce(1).write.mode("overwrite").parquet(str(src / "b2"))

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src) + "/*")
    )
    out = substring_match_stream(stream, idx)
    q = (
        out.writeStream.format("memory")
        .queryName("r12_short_redelivery")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.sql("select * from r12_short_redelivery").collect()
    assert len(rows) == 1, rows
    r = rows[0]
    assert r.doc_id == 7 and r.hist_doc_id is None and r.overlap is None
