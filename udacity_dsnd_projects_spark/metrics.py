"""In-flight data-quality metrics via Spark's ``observe`` API.

A 100 TB pipeline needs per-job row counts, null rates and domain
violations — and it must NOT pay an extra corpus scan for them.
``DataFrame.observe`` attaches aggregate expressions to a plan node;
the metrics are accumulated AS the action runs (the same pass that does
the real work) and surface:

- batch: on the ``pyspark.sql.Observation`` handle after any action;
- streaming: per micro-batch in ``StreamingQueryProgress
  .observedMetrics`` — the same dictionary the bench's peak-state
  metric reads, so a quality alarm rides the progress stream a
  monitoring agent already consumes.

This is the engine's answer to side-channel quality counters (Beam
metrics, Flink accumulators): declarative, exactly-once per action, and
free. Only full aggregates are allowed in an observation (no windows,
no distinct) — exactly what the guard metrics below are.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F


def quality_metrics(
    cols: list[str],
    domain_checks: dict[str, Column] | None = None,
) -> list[Column]:
    """The standard guard-metric expressions: total rows, per-column
    null counts, plus one violation count per named domain check
    (a boolean Column, True = VIOLATION). All plain aggregates, all
    computable in the observe pass."""
    metrics = [F.count(F.lit(1)).alias("n_rows")]
    metrics += [
        F.count_if(F.col(c).isNull()).alias(f"null_{c}") for c in cols
    ]
    for name, bad in (domain_checks or {}).items():
        metrics.append(F.count_if(bad).alias(f"bad_{name}"))
    return metrics


def observed(
    df: DataFrame,
    cols: list[str],
    domain_checks: dict[str, Column] | None = None,
    name: str = "quality",
) -> tuple[DataFrame, Observation]:
    """BATCH face: attach the guard metrics to ``df`` and return
    (df, observation). After the caller's next action on the returned
    frame, ``observation.get`` holds the metrics — measured during
    that action's own scan, not a second one.

        df, obs = observed(df, ["price"], {"neg_price": F.col("price") < 0})
        df.write.parquet(out)          # the real job
        assert obs.get["bad_neg_price"] == 0
    """
    obs = Observation(name)
    return df.observe(obs, *quality_metrics(cols, domain_checks)), obs


def observed_stream(
    df: DataFrame,
    cols: list[str],
    domain_checks: dict[str, Column] | None = None,
    name: str = "quality",
) -> DataFrame:
    """STREAMING face: same guard metrics, surfaced per micro-batch in
    ``StreamingQueryProgress.observedMetrics[name]`` (an ``Observation``
    handle is batch-only; streams observe by name)."""
    return df.observe(name, *quality_metrics(cols, domain_checks))
