"""Property tests for the training-data pipeline operators beyond the
oracle equality checks: recall of the LSH candidate generators against
the exact methods, Pandas-UDF face vs JVM face, multimodal plumbing."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_minhash_lsh_finds_strong_near_dups(spark, sf_dir):
    """LSH candidates must include every pair the exact n-gram jaccard
    marks as a strong near-dup (banding theory: J≥0.7 pairs collide in
    ≥1 of 4 bands with overwhelming probability)."""
    from udacity_dsnd_projects_spark.functions.dedup import (
        minhash_lsh_pairs,
        ngram_jaccard_pairs,
    )

    strong = {
        (r.doc_a, r.doc_b)
        for r in ngram_jaccard_pairs(spark, sf_dir).filter(F.col("jaccard") > 0.7).collect()
    }
    assert strong, "corpus should contain planted strong near-dups"
    lsh = {(r.doc_a, r.doc_b) for r in minhash_lsh_pairs(spark, sf_dir).collect()}
    missed = strong - lsh
    assert not missed, f"LSH missed strong near-dups: {missed}"


def test_simhash_near_dups_overlap_jaccard(spark, sf_dir):
    """SimHash hamming≤6 pairs should substantially overlap the exact
    strong-jaccard pairs (different estimator, same planted dups)."""
    from udacity_dsnd_projects_spark.functions.dedup import (
        ngram_jaccard_pairs,
        simhash_near_dup_pairs,
    )

    strong = {
        (r.doc_a, r.doc_b)
        for r in ngram_jaccard_pairs(spark, sf_dir).filter(F.col("jaccard") > 0.8).collect()
    }
    sim = {(r.doc_a, r.doc_b) for r in simhash_near_dup_pairs(spark, sf_dir).collect()}
    assert strong
    recall = len(strong & sim) / len(strong)
    assert recall >= 0.8, f"simhash recall too low: {recall} ({strong - sim})"


def test_exact_dedup_finds_planted_copies(spark, sf_dir):
    from udacity_dsnd_projects_spark.functions.dedup import exact_dedup

    res = exact_dedup(spark, sf_dir).collect()
    dup_groups = [r for r in res if r.n_copies > 1]
    assert dup_groups
    # every planted copy (doc_id % 10 == 0) collapses onto the original
    assert all(r.canonical_id % 10 == 0 for r in dup_groups)


def test_approx_count_distinct_close_to_exact(spark, sf_dir):
    from udacity_dsnd_projects_spark.operators.aggregations import (
        approx_count_distinct,
        count_distinct,
    )

    exact = {
        r.l_returnflag: r.n_parts for r in count_distinct(spark, sf_dir).collect()
    }
    approx = {
        r.l_returnflag: r.approx_parts
        for r in approx_count_distinct(spark, sf_dir).collect()
    }
    # HLL++ configured at rsd=0.02 — 5% is a 2.5-sigma bound
    for k, v in exact.items():
        assert abs(approx[k] - v) / v < 0.05, (k, approx[k], v)


def test_pandas_simhash_equals_jvm_simhash(spark, sf_dir):
    from udacity_dsnd_projects_spark.functions.dedup import (
        simhash_fingerprints,
        simhash_fingerprints_pandas,
    )

    a = {r.doc_id: r.simhash for r in simhash_fingerprints(spark, sf_dir).collect()}
    b = {
        r.doc_id: r.simhash
        for r in simhash_fingerprints_pandas(spark, sf_dir).collect()
    }
    assert a == b and a


def test_quantile_sketch_close_to_exact(spark, duck, sf_dir):
    """approx_percentile must land within 2% relative error of DuckDB's
    exact continuous quantile at this corpus size."""
    from udacity_dsnd_projects_spark.operators.aggregations import quantile_sketch

    got = {r["l_linestatus"]: (r["p50"], r["p90"], r["p99"]) for r in quantile_sketch(spark, sf_dir).collect()}
    exact = {
        r[0]: (r[1], r[2], r[3])
        for r in duck.sql(
            """SELECT l_linestatus, quantile_cont(l_extendedprice, 0.5),
                      quantile_cont(l_extendedprice, 0.9),
                      quantile_cont(l_extendedprice, 0.99)
               FROM lineitem GROUP BY 1"""
        ).fetchall()
    }
    assert set(got) == set(exact)
    for k in got:
        for a, b in zip(got[k], exact[k]):
            assert abs(a - b) / b < 0.02, (k, a, b)


def test_pandas_cosine_equals_jvm_cosine(spark, sf_dir):
    """The Arrow/numpy face must agree with the JVM expression face."""
    from udacity_dsnd_projects_spark.functions.similarity import (
        cosine_scores_pandas,
        cosine_topk_bruteforce,
    )

    jvm = {
        (r.query_id, r.vec_id): r.cosine
        for r in cosine_topk_bruteforce(spark, sf_dir).collect()
    }
    pandas_face = {
        (r.query_id, r.vec_id): r.cosine
        for r in cosine_scores_pandas(spark, sf_dir).collect()
    }
    for key, cos in jvm.items():
        assert abs(pandas_face[key] - cos) < 1e-4


def test_ivf_topk_recall_vs_bruteforce(spark, sf_dir):
    """Multi-probe IVF top-k must recover most of the exact top-k: with
    6 hyperplanes and hamming-1 probing, expected recall is well above
    half (each true neighbor lands in the probed set unless it differs
    from the query bucket by ≥2 plane signs)."""
    from udacity_dsnd_projects_spark.functions.similarity import (
        cosine_topk_bruteforce,
        cosine_topk_ivf,
    )

    exact = {
        (r.query_id, r.vec_id) for r in cosine_topk_bruteforce(spark, sf_dir).collect()
    }
    approx = {(r.query_id, r.vec_id) for r in cosine_topk_ivf(spark, sf_dir).collect()}
    assert exact, "bruteforce top-k should be non-empty"
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, f"IVF recall too low: {recall:.2f}"


def test_ann_index_query_equals_inline_ivf(spark, sf_dir, tmp_path_factory):
    """The persisted ANN index returns exactly what the inline IVF
    computes (same probes, same scoring), and the probe join against
    the bucketed index table plans without an index-side exchange."""
    from udacity_dsnd_projects_spark.functions.ann import (
        ann_query,
        build_ann_index,
        query_set,
    )
    from udacity_dsnd_projects_spark.functions.similarity import cosine_topk_ivf

    path = str(tmp_path_factory.mktemp("ann") / "index")
    build_ann_index(spark, sf_dir, "ann_idx", path)
    try:
        got = ann_query(spark, "ann_idx", query_set(spark, sf_dir))
        want = cosine_topk_ivf(spark, sf_dir)
        assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
        plan = got._jdf.queryExecution().executedPlan().toString()
        # broadcast probe join: the index table is never shuffled
        assert "Exchange hashpartitioning" not in plan.split("Window")[-1]
    finally:
        spark.sql("DROP TABLE IF EXISTS ann_idx")


def test_lsh_buckets_group_near_dups(spark, sf_dir):
    """Near-identical vectors must land in the same LSH bucket (the
    corpus has no true embedding dups — max pairwise cosine ≈ 0.51 —
    so plant some here), and the bucketed pair report must be
    non-empty and thresholded on this corpus."""
    from udacity_dsnd_projects_spark.functions.similarity import (
        NEAR_DUP_COSINE,
        embedding_near_dup,
        lsh_bucket,
    )
    from pyspark.sql import types as T

    base = [((i * 37 + d * 11) % 19 - 9.0) / 9.0 for i in range(1) for d in range(64)]
    rows = []
    for i in range(6):
        noise = [((i * d) % 7 - 3) * 1e-4 for d in range(64)]
        rows.append((i, [b + n for b, n in zip(base, noise)]))
    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("v", T.ArrayType(T.DoubleType())),
        ]
    )
    df = spark.createDataFrame(rows, schema)
    buckets = {r.vec_id: r.bucket for r in df.select(
        "vec_id", lsh_bucket(F.col("v"), 64).alias("bucket")
    ).collect()}
    assert len(set(buckets.values())) == 1, f"near-identical vectors split: {buckets}"

    pairs = embedding_near_dup(spark, sf_dir).collect()
    assert pairs, "bucketed similar-pair report should be non-empty"
    assert all(r.cosine > NEAR_DUP_COSINE for r in pairs)


def test_media_pipeline_plumbing(spark, sf_dir):
    """Multimodal plumbing: schema contract, Arrow batching, stubbed
    decode determinism, codec registration."""
    from udacity_dsnd_projects_spark.functions import multimodal as mm

    media = mm.synthesize_media(spark, sf_dir)
    assert [f.name for f in media.schema.fields] == [
        "media_id",
        "modality",
        "content",
        "meta",
    ]
    feats = mm.extract_features(media)
    rows = feats.collect()
    assert len(rows) == media.count()
    assert all(len(r.feature) == 8 for r in rows)
    # deterministic fake decode: feature[0] == n_bytes
    assert all(r.feature[0] == r.n_bytes for r in rows)

    # registering a codec changes only that modality
    mm.register_codec("image", lambda content, meta: [1.0])
    try:
        rows2 = mm.extract_features(media).collect()
        img = [r for r in rows2 if r.modality == "image"]
        other = [r for r in rows2 if r.modality != "image"]
        assert all(r.feature == [1.0] for r in img)
        assert all(len(r.feature) == 8 for r in other)
    finally:
        mm._CODECS.pop("image", None)


def test_media_codec_not_implemented_yields_null(spark, sf_dir):
    from udacity_dsnd_projects_spark.functions import multimodal as mm

    def real_decoder_missing(content, meta):
        raise NotImplementedError("image codec not available in container")

    mm.register_codec("audio", real_decoder_missing)
    try:
        rows = mm.extract_features(mm.synthesize_media(spark, sf_dir)).collect()
        audio = [r for r in rows if r.modality == "audio"]
        assert audio and all(r.feature is None for r in audio)
    finally:
        mm._CODECS.pop("audio", None)
