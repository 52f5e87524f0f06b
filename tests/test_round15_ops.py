"""Round-15 tests: the chunk-spine invariants VERDICT r14 asked to
pin — ``n_units`` as a pure function of ``chunk_hash`` (task 4) — and
the ADVICE r14 fixes (chunk_dedup_stream's bounded watermark form,
shard_packed_chunks' integer-DIV position)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T


# --------------------------------------------------------------------------
# VERDICT r14 task 4 — chunk_dedup_frame reduces n_units with min() on
# the comment-level claim "identical words → identical count". Pin the
# claim itself: if a future face ever makes n_units depend on anything
# outside chunk_hash, this fails loudly instead of being silently
# min'd (the accounting gate would only catch the sum-level effect).
# --------------------------------------------------------------------------


def test_chunk_units_are_pure_function_of_hash(spark, sf_dir):
    """Over the real corpus: every chunk_hash group in the raw chunk
    frame carries exactly one distinct n_units value (min == max)."""
    from udacity_dsnd_projects_spark.functions.text import bpe_encode_chunks

    drift = (
        bpe_encode_chunks(spark, sf_dir)
        .groupBy("chunk_hash")
        .agg(
            F.min("n_units").alias("lo"),
            F.max("n_units").alias("hi"),
            F.count(F.lit(1)).alias("n"),
        )
        .filter(F.col("lo") != F.col("hi"))
    )
    assert drift.count() == 0, drift.limit(5).collect()


def test_chunk_units_invariant_on_planted_duplicates(spark, tmp_path):
    """The invariant on a corpus DESIGNED to stress it: the same chunk
    content planted across documents of different langs/sources and in
    documents of different total length must still agree on n_units."""
    from udacity_dsnd_projects_spark.functions.text import encode_chunks_frame

    boiler = "standard footer text repeated on every page"
    rows = [
        (0, boiler, "en", "web"),
        (1, boiler, "fr", "books"),
        (2, boiler + " plus a unique continuation here", "en", "web"),
        (3, boiler, "de", "news"),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )
    chunks = encode_chunks_frame(docs, [("s", "t", 0), ("st", "a", 0)])
    agg = (
        chunks.groupBy("chunk_hash")
        .agg(F.min("n_units").alias("lo"), F.max("n_units").alias("hi"))
        .collect()
    )
    assert agg and all(r["lo"] == r["hi"] for r in agg)


# --------------------------------------------------------------------------
# ADVICE r14 — chunk_dedup_stream mirrors dedup_stream's signature:
# the event-time form bounds state with dropDuplicatesWithinWatermark
# instead of forcing callers to bypass the screen for bounded state.
# --------------------------------------------------------------------------


def test_chunk_dedup_stream_watermark_form_matches_compat(spark, tmp_path):
    """The bounded (event-time) form emits the same survivors as the
    compat unbounded form when duplicates arrive within the delay —
    and still screens against the static history index."""
    from udacity_dsnd_projects_spark.streaming.sources import (
        file_stream,
        run_to_memory,
    )
    from udacity_dsnd_projects_spark.streaming.stateful import (
        chunk_dedup_stream,
    )

    schema = T.StructType(
        [
            T.StructField("chunk_hash", T.StringType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("doc_id", T.LongType()),
        ]
    )
    base = dt.datetime(2024, 6, 1)
    # h_hist is known to history; h_dup arrives twice within the delay
    b1 = [("h_hist", base, 0), ("h_dup", base, 1), ("h_new", base, 2)]
    b2 = [("h_dup", base + dt.timedelta(minutes=10), 3)]
    path = str(tmp_path / "chunks")
    spark.createDataFrame(b1, schema).coalesce(1).write.mode("append").parquet(path)
    spark.createDataFrame(b2, schema).coalesce(1).write.mode("append").parquet(path)
    hist = spark.createDataFrame([("h_hist",)], ["chunk_hash"])

    compat = run_to_memory(
        chunk_dedup_stream(file_stream(spark, path, schema), hist),
        "cds_compat",
    ).collect()
    bounded = run_to_memory(
        chunk_dedup_stream(
            file_stream(spark, path, schema), hist, "ts", "2 hours"
        ),
        "cds_bounded",
    ).collect()
    assert sorted(r["chunk_hash"] for r in compat) == ["h_dup", "h_new"]
    assert sorted(r["chunk_hash"] for r in bounded) == sorted(
        r["chunk_hash"] for r in compat
    )


def test_incremental_dedup_stream_watermark_form_matches_compat(
    spark, tmp_path
):
    """The ADVICE r14 doctrine applied family-wide: the document-level
    ingest screen's bounded (event-time) form emits the same survivors
    as the compat form when duplicates arrive within the delay — the
    md5 projection preserves the event-time column, so no caller-side
    plumbing is needed."""
    from pyspark.sql import functions as F

    from udacity_dsnd_projects_spark.streaming.sources import (
        file_stream,
        run_to_memory,
    )
    from udacity_dsnd_projects_spark.streaming.stateful import (
        incremental_dedup_stream,
    )

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("ts", T.TimestampType()),
        ]
    )
    base = dt.datetime(2024, 6, 1)
    b1 = [
        (0, "snapshot doc", base),
        (1, "fresh one", base),
    ]
    b2 = [
        (2, "fresh one", base + dt.timedelta(minutes=5)),  # in-stream dup
        (3, "fresh two", base + dt.timedelta(minutes=6)),
    ]
    path = str(tmp_path / "docs")
    spark.createDataFrame(b1, schema).coalesce(1).write.mode("append").parquet(path)
    spark.createDataFrame(b2, schema).coalesce(1).write.mode("append").parquet(path)
    hist = (
        spark.createDataFrame([("snapshot doc",)], ["text"])
        .select(F.md5(F.col("text").cast("binary")).alias("content_md5"))
    )
    compat = run_to_memory(
        incremental_dedup_stream(file_stream(spark, path, schema), hist),
        "ids_compat",
    ).collect()
    bounded = run_to_memory(
        incremental_dedup_stream(
            file_stream(spark, path, schema), hist,
            event_time_col="ts", delay="2 hours",
        ),
        "ids_bounded",
    ).collect()
    assert sorted(r["doc_id"] for r in compat) == [1, 3]
    assert sorted(r["doc_id"] for r in bounded) == sorted(
        r["doc_id"] for r in compat
    )


def test_near_dup_stream_watermark_form_matches_compat(
    spark, tmp_path_factory
):
    """Same doctrine for the fuzzy screen: the event-time column rides
    the signature/banding projections (keep_cols), so the pair-dedup
    state can be watermark-bounded; the bounded replay emits the same
    flagged pairs and scores as the compat replay."""
    from pyspark.sql import functions as F

    from udacity_dsnd_projects_spark.functions.dedup import minhash_bands_for
    from udacity_dsnd_projects_spark.sources.catalog import load_table
    from udacity_dsnd_projects_spark.streaming.sources import (
        file_stream,
        run_to_memory,
    )
    from udacity_dsnd_projects_spark.streaming.stateful import near_dup_stream

    sf_dir = "/root/testdata/sf0.001"
    hist = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    index = minhash_bands_for(hist).localCheckpoint(eager=True)
    base_txt = {
        r["doc_id"]: r["text"]
        for r in hist.filter(F.col("doc_id") < 4).collect()
    }
    root = tmp_path_factory.mktemp("neardup_wm")
    path = str(root / "rows")
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("ts", T.TimestampType()),
        ]
    )
    t0 = dt.datetime(2024, 6, 1)
    b1 = [(9000001, base_txt[3], t0)]
    b2 = [(9000002, base_txt[3], t0 + dt.timedelta(minutes=5))]
    spark.createDataFrame(b1, schema).coalesce(1).write.mode("append").parquet(path)
    spark.createDataFrame(b2, schema).coalesce(1).write.mode("append").parquet(path)

    compat = run_to_memory(
        near_dup_stream(file_stream(spark, path, schema), index),
        "nds_compat",
    ).collect()
    bounded = run_to_memory(
        near_dup_stream(
            file_stream(spark, path, schema), index,
            event_time_col="ts", delay="2 hours",
        ),
        "nds_bounded",
    ).collect()
    key = lambda r: (r["doc_id"], r["hist_doc_id"], r["est_jaccard"])
    assert sorted(map(key, bounded)) == sorted(map(key, compat))
    assert any(r["doc_id"] == 9000001 and r["hist_doc_id"] == 3 for r in compat)
    # output schema is unchanged by the bounded form (ts dropped)
    assert bounded == [] or set(bounded[0].asDict()) == {
        "doc_id", "hist_doc_id", "est_jaccard"
    }


# --------------------------------------------------------------------------
# VERDICT r14 task 5 — curriculum ordering over the packed bins: the
# chunk spine's ordering policy (documents → chunks → dedup → pack →
# order), curriculum_order's NTILE recipe at sequence granularity.
# --------------------------------------------------------------------------


def test_curriculum_pack_order_phases_and_positions(spark, sf_dir):
    """Every packed bin appears exactly once; phases partition the
    bins into CURRICULUM_PHASES NTILE-sized groups ordered
    easy-to-hard by max_units; positions are a 1..n permutation inside
    each phase; and a rerun is bit-identical (no RNG state)."""
    from collections import Counter

    from udacity_dsnd_projects_spark.functions.text import (
        curriculum_pack_order,
        pack_deduped_chunks,
    )
    from udacity_dsnd_projects_spark.functions.training import (
        CURRICULUM_PHASES,
    )

    packed = pack_deduped_chunks(spark, sf_dir).collect()
    rows = curriculum_pack_order(spark, sf_dir).collect()
    assert sorted(r["bin"] for r in rows) == sorted({r["bin"] for r in packed})
    # NTILE sizing: phase sizes differ by at most 1, earlier phases
    # take the remainder
    per = Counter(r["phase"] for r in rows)
    n = len(rows)
    k = min(CURRICULUM_PHASES, n)
    assert sorted(per) == list(range(1, k + 1))
    for ph, cnt in per.items():
        assert cnt == n // CURRICULUM_PHASES + (
            1 if ph <= n % CURRICULUM_PHASES else 0
        )
    # easy-to-hard: every bin in phase p has max_units <= every bin in
    # phase p+1 (up to NTILE's boundary ties broken by bin id)
    by_phase = {}
    for r in rows:
        by_phase.setdefault(r["phase"], []).append(r["max_units"])
    phases = sorted(by_phase)
    for a, b in zip(phases, phases[1:]):
        assert max(by_phase[a]) <= min(by_phase[b]) or sorted(
            by_phase[a]
        )[-1] == sorted(by_phase[b])[0]
    # positions: 1..len permutation per phase
    pos = {}
    for r in rows:
        pos.setdefault(r["phase"], []).append(r["position"])
    for ph, ps in pos.items():
        assert sorted(ps) == list(range(1, len(ps) + 1))
    # deterministic
    again = curriculum_pack_order(spark, sf_dir).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, rows))


def test_curriculum_pack_order_matches_oracle(spark, sf_dir, duck):
    """Full value agreement with the DuckDB oracle at the test SF —
    the same compare the driver runs."""
    from udacity_dsnd_projects_spark.functions.text import (
        ORACLE_CURRICULUM_PACK_ORDER,
        curriculum_pack_order,
    )

    sdf = curriculum_pack_order(spark, sf_dir).toPandas()
    ddf = duck.sql(ORACLE_CURRICULUM_PACK_ORDER).df()
    cols = sorted(sdf.columns)
    assert cols == sorted(ddf.columns)
    a = sorted(map(tuple, sdf[cols].itertuples(index=False, name=None)))
    b = sorted(map(tuple, ddf[cols].itertuples(index=False, name=None)))
    assert a == b


def test_curriculum_pack_order_rides_checkpointed_frames(spark, sf_dir):
    """The consumable plan must read only materialized checkpoints
    (the packer's keeper frame and the one-row-per-bin phase frame) —
    a parquet scan anywhere in the plan tree would mean the training
    fold or the pack machinery re-runs under the position pass's
    triple scan (the packer's single-materialization doctrine extended
    to the scheduler)."""
    from tests.test_round14_ops import _preorder_node_names
    from udacity_dsnd_projects_spark.functions.text import (
        curriculum_pack_order,
    )

    names = _preorder_node_names(
        curriculum_pack_order(spark, sf_dir)._jdf.queryExecution().executedPlan()
    )
    scans = [n for n in names if "Scan" in n]
    assert scans and any("ExistingRDD" in n for n in scans), scans
    assert not any("parquet" in n.lower() or "FileScan" in n for n in scans), scans


def test_curriculum_pack_order_fewer_bins_than_phases(
    spark, tmp_path_factory
):
    """NTILE's n<k edge: a corpus packing into fewer bins than
    CURRICULUM_PHASES must still agree with the DuckDB oracle —
    each bin becomes its own phase (SQL NTILE semantics), positions
    all 1."""
    import duckdb

    from udacity_dsnd_projects_spark.functions.text import (
        ORACLE_CURRICULUM_PACK_ORDER,
        curriculum_pack_order,
    )
    from udacity_dsnd_projects_spark.functions.training import (
        CURRICULUM_PHASES,
    )

    d = tmp_path_factory.mktemp("tinybins")
    rows = [
        (0, "alpha beta gamma delta", "en", "web", 22),
        (1, "epsilon zeta eta theta", "en", "web", 22),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    sdf = curriculum_pack_order(spark, str(d)).toPandas()
    n_bins = len(sdf)
    assert 0 < n_bins < CURRICULUM_PHASES
    assert sorted(sdf["phase"]) == list(range(1, n_bins + 1))
    assert set(sdf["position"]) == {1}
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{d}/documents.parquet/*.parquet')"
    )
    ddf = con.sql(ORACLE_CURRICULUM_PACK_ORDER).df()
    cols = sorted(sdf.columns)
    assert cols == sorted(ddf.columns)
    assert sorted(map(tuple, sdf[cols].itertuples(index=False, name=None))) == sorted(
        map(tuple, ddf[cols].itertuples(index=False, name=None))
    )


def test_curriculum_pack_order_empty_corpus(spark, tmp_path_factory):
    """The ordering face survives an empty chunk frame (the writer
    trio's degenerate contract extends to the scheduler)."""
    from udacity_dsnd_projects_spark.functions.text import (
        curriculum_pack_order,
    )

    d = tmp_path_factory.mktemp("noword2")
    spark.createDataFrame(
        [(0, "  ", "en", "web", 2)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    assert curriculum_pack_order(spark, str(d)).count() == 0


# --------------------------------------------------------------------------
# Round-15 OPTIMIZATION pins: driver-local metadata frames must be JVM
# literal relations (operators/localframe.py), never pickled Python
# RDDs — a createDataFrame offsets frame launches one Python-worker
# task per defaultParallelism partition on every action (measured:
# 31/32 task threads blocked in SparkEnv.createPythonWorker inside
# curriculum_pack_order's broadcast builds).
# --------------------------------------------------------------------------


def test_local_frame_equals_createdataframe(spark):
    """Value/schema equality with createDataFrame on typed rows,
    nulls included, plus the empty-frame case."""
    from udacity_dsnd_projects_spark.operators.localframe import local_frame

    schema = T.StructType(
        [
            T.StructField("g", T.StringType()),
            T.StructField("b", T.DoubleType()),
            T.StructField("o", T.LongType()),
        ]
    )
    rows = [("x", 1.5, 3), (None, 2.0, 0), ("y", None, None)]
    lf = local_frame(spark, rows, schema)
    cf = spark.createDataFrame(rows, schema)
    assert lf.schema == cf.schema
    key = lambda t: tuple(map(str, t))  # None-safe sort
    assert sorted(map(tuple, lf.collect()), key=key) == sorted(
        map(tuple, cf.collect()), key=key
    )
    empty = local_frame(spark, [], schema)
    assert empty.schema == schema and empty.count() == 0


def test_local_frame_plan_has_no_python_stage(spark):
    """The literal relation's physical plan must contain no Python
    evaluation or RDD scan node — that is the whole point."""
    from udacity_dsnd_projects_spark.operators.localframe import local_frame

    lf = local_frame(spark, [(1, "a")], "k long, v string")
    plan = lf._jdf.queryExecution().executedPlan().toString()
    for bad in ("BatchEvalPython", "ArrowEvalPython", "ExistingRDD", "PythonRDD"):
        assert bad not in plan, plan


def test_rank_offsets_join_has_no_python_stage(spark, sf_dir):
    """exact_group_rank's broadcast offsets side rides the literal
    relation: the whole ranked plan is Python-free."""
    from udacity_dsnd_projects_spark.operators.ranks import exact_group_rank
    from udacity_dsnd_projects_spark.sources.catalog import load_table

    li = load_table(spark, "lineitem", sf_dir).select(
        "l_orderkey", "l_extendedprice", F.col("l_linenumber").cast("long").alias("ln")
    )
    ranked = exact_group_rank(
        li, ["ln"], "l_extendedprice", ["l_orderkey"], rank_col="rk"
    )
    plan = ranked._jdf.queryExecution().executedPlan().toString()
    for bad in ("BatchEvalPython", "ArrowEvalPython", "PythonRDD"):
        assert bad not in plan, plan
    # and the rank values still match the window-function reference
    from pyspark.sql import Window

    w = Window.partitionBy("ln").orderBy(
        F.col("l_extendedprice").asc(), F.col("l_orderkey").asc()
    )
    ref = li.withColumn("rk2", F.row_number().over(w))
    bad_rows = (
        ranked.join(ref, ["ln", "l_orderkey", "l_extendedprice"])
        .filter(F.col("rk") != F.col("rk2"))
        .count()
    )
    assert bad_rows == 0


def test_cc_loop_restores_shuffle_partitions(spark, sf_dir):
    """The CC loop sizes spark.sql.shuffle.partitions to label volume
    for its own actions and must restore the session value on exit
    (including the convergence path)."""
    from udacity_dsnd_projects_spark.functions.curation import (
        connected_components,
    )

    before = spark.conf.get("spark.sql.shuffle.partitions")
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (4, 5)], "doc_a long, doc_b long"
    )
    out = {r["doc_id"]: r["component"] for r in connected_components(pairs).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 4: 4, 5: 4}
    assert spark.conf.get("spark.sql.shuffle.partitions") == before


def test_fused_winnow_kernel_equals_single_family_substrates(spark, sf_dir):
    """signatures_and_winnow_vectorized must be bit-identical to the
    standalone MinHash kernel AND the JVM winnowing substrate — corpus
    plus adversarial rows (unicode, exactly-3-token, below-one-window,
    sub-3-token drops)."""
    from udacity_dsnd_projects_spark.functions.dedup import (
        _winnow_fp_arrays,
        signatures_and_winnow_vectorized,
        signatures_vectorized,
    )
    from udacity_dsnd_projects_spark.sources.catalog import load_table

    docs = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    extra = spark.createDataFrame(
        [
            (90001, "héllo wörld ünïcode tokens here extra words beyond window"),
            (90002, "a b c"),
            (90003, "a b c d e"),
            (90004, "x y z w v u t s r q p"),
            (90005, "  "),
            (90006, "one two"),
        ],
        "doc_id long, text string",
    )
    d = docs.unionByName(extra)
    fused = {
        r["doc_id"]: (list(r["mh"]), sorted(r["fps"]))
        for r in signatures_and_winnow_vectorized(d).collect()
    }
    mh_ref = {
        r["doc_id"]: list(r["mh"]) for r in signatures_vectorized(d).collect()
    }
    fp_ref = {
        r["doc_id"]: sorted(r["fps"]) for r in _winnow_fp_arrays(d).collect()
    }
    assert set(fused) == set(mh_ref)
    assert {k: v[0] for k, v in fused.items()} == mh_ref
    # JVM face drops docs below one window; fused emits them with
    # empty fps — the exploded row sets must agree exactly
    assert {k: v[1] for k, v in fused.items() if v[1]} == fp_ref
    assert fused[90002][1] == [] and fused[90003][1] == []
    assert 90005 not in fused and 90006 not in fused
