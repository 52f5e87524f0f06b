"""Round-10 additions: the stratum quality-drift EMD gate and the
driver-visible observe-metrics face."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


# --- quality_drift_report ---------------------------------------------------


def test_quality_drift_report_is_a_distribution_distance(spark, sf_dir):
    """EMD properties the grid construction must provide: every
    stratum of the corpus appears exactly once, n_docs adds back up to
    the corpus size, the normalized distance lands in [0, 1], and the
    drifted flag is exactly (emd > threshold)."""
    from udacity_dsnd_projects_spark.functions.curation import (
        QUALITY_DRIFT_T,
        quality_drift_report,
    )
    from udacity_dsnd_projects_spark.sources.catalog import load_table

    docs = load_table(spark, "documents", sf_dir)
    rows = quality_drift_report(spark, sf_dir).collect()
    want_strata = {
        (r["lang"], r["source"])
        for r in docs.select("lang", "source").distinct().collect()
    }
    assert {(r["lang"], r["source"]) for r in rows} == want_strata
    assert sum(r["n_docs"] for r in rows) == docs.count()
    for r in rows:
        assert 0.0 <= r["emd"] <= 1.0, r
        assert r["drifted"] == int(r["emd"] > QUALITY_DRIFT_T), r


def test_quality_drift_report_scans_corpus_once(spark, sf_dir):
    """The cell frame is eagerly checkpointed before its four
    consumers, so the FINAL plan re-reads the checkpointed
    (stratum × band) counts — metadata-sized — and never the documents
    parquet: zero FileScans in the returned frame's plan."""
    from udacity_dsnd_projects_spark.functions.curation import (
        quality_drift_report,
    )

    plan = quality_drift_report(spark, sf_dir)._sc._jvm.PythonSQLUtils.explainString(
        quality_drift_report(spark, sf_dir)._jdf.queryExecution(), "formatted"
    )
    assert "Scan parquet" not in plan


def test_quality_drift_skewed_stratum_fires(spark, sf_dir):
    """Sanity on the metric itself, via the shared grid math on a
    crafted corpus: a stratum whose mass sits entirely in the opposite
    band of everyone else must show a near-maximal EMD. Verified
    through the registered query by writing a tiny documents table."""
    import tempfile

    from udacity_dsnd_projects_spark.functions.curation import (
        quality_drift_report,
    )

    # band-0 text: short, all digits/punct, no stopwords → score 0
    bad = "9!" * 5
    # band-4 text: long, clean, stopword-rich → score 1
    good = "the and is of a plain clean sentence with many common words"
    rows = [(i, good, "en", "webA", len(good)) for i in range(50)]
    rows += [(100 + i, bad, "en", "spamB", len(bad)) for i in range(50)]
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, n_chars long"
        ).write.parquet(f"{d}/documents.parquet")
        got = {
            r["source"]: r for r in quality_drift_report(spark, d).collect()
        }
    # each stratum is half the corpus at the opposite extreme: EMD vs
    # the 50/50 global mix is exactly 0.5 for both, over the full band
    # span — and both clear the drift gate
    assert got["spamB"]["emd"] == pytest.approx(0.5, abs=1e-6)
    assert got["webA"]["emd"] == pytest.approx(0.5, abs=1e-6)
    assert got["spamB"]["drifted"] == 1 and got["webA"]["drifted"] == 1


# --- guard_metrics_report ---------------------------------------------------


def test_guard_metrics_report_equals_direct_aggregation(spark, sf_dir):
    """The one-row observed-counters frame must equal the same
    aggregates computed directly — the in-pass measurement adds no
    scan and loses no rows."""
    from udacity_dsnd_projects_spark.metrics import guard_metrics_report
    from udacity_dsnd_projects_spark.sources.catalog import load_table

    docs = load_table(spark, "documents", sf_dir)
    got = guard_metrics_report(spark, sf_dir).collect()[0].asDict()
    want = docs.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count_if(F.col("text").isNull()).alias("null_text"),
        F.count_if(F.col("lang").isNull()).alias("null_lang"),
        F.count_if(F.col("source").isNull()).alias("null_source"),
        F.count_if(F.length("text") == 0).alias("bad_empty_text"),
        F.count_if(F.length("text") != F.col("n_chars")).alias(
            "bad_len_mismatch"
        ),
        F.count_if(F.col("n_chars") <= 0).alias("bad_nonpos_chars"),
    ).collect()[0].asDict()
    assert got == want
    assert got["n_rows"] > 0
