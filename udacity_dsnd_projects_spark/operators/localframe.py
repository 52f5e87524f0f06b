"""Driver-local metadata frames without the Python-RDD boundary.

``SparkSession.createDataFrame(rows, schema)`` on a driver-local list
builds a PICKLED PYTHON RDD parallelized across ``defaultParallelism``
partitions. Every action over such a frame (including the job a
``BroadcastExchange`` runs to build its relation) launches one task
per partition, and each concurrently-running task needs its own
Python worker: ``SparkEnv.createPythonWorker`` is synchronized, so a
32-core local session serializes ~32 fork+handshake rounds per stage
with near-zero CPU. Measured on ``curriculum_pack_order`` (round-15
profile): a 32-task stage with 55.7 s summed executorRunTime and
0.36 s executorCpuTime, thread dumps showing 31/32 task threads
BLOCKED in ``createPythonWorker`` — the guide §4.1 Python-boundary
cost in its sneakiest form, paid for frames that hold a few dozen
driver-built metadata rows (rank bucket offsets, BPE merge lists,
observation reports).

:func:`local_frame` avoids the boundary entirely: rows already in
driver memory are shipped as JVM literals —
``inline(array(struct(...), ...))`` — which analyzes to a local
relation: scanning it is task-free (``LocalTableScan``), broadcasting
it never launches a job, and no Python worker is ever forked. Rows
beyond :data:`MAX_LITERAL_ROWS` fall back to ``createDataFrame``
(a literal expression tree should stay metadata-sized, like the
frames themselves)."""

from __future__ import annotations

from typing import Iterable, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Above this many rows the literal expression tree (rows × columns
#: ``lit().cast()`` nodes) starts to cost real analysis time, and a
#: frame that size is data, not metadata — fall back to the RDD path.
MAX_LITERAL_ROWS = 4096


def local_frame(
    spark: SparkSession,
    rows: Sequence[Iterable],
    schema: T.StructType | str,
) -> DataFrame:
    """A DataFrame over driver-local ``rows`` with ``schema``,
    value-identical to ``spark.createDataFrame(rows, schema)`` but
    built as a JVM literal relation: zero jobs, zero Python workers
    (see module docstring). ``rows`` must be metadata-sized; each row
    is a sequence aligned with ``schema``'s fields; values must be
    plain literals (numbers, strings, bools, None, datetimes)."""
    if isinstance(schema, str):
        schema = T._parse_datatype_string(schema)
    if len(rows) > MAX_LITERAL_ROWS:
        return spark.createDataFrame(rows, schema)
    fields = schema.fields
    if not rows:
        return spark.range(0, 0, 1, 1).select(
            *[F.lit(None).cast(f.dataType).alias(f.name) for f in fields]
        )
    structs = [
        F.struct(
            *[
                F.lit(v).cast(f.dataType).alias(f.name)
                for v, f in zip(row, fields)
            ]
        )
        for row in rows
    ]
    # one explicit partition: the default would split the 1-row range
    # defaultParallelism ways, scheduling ~32 empty tasks per scan
    return spark.range(0, 1, 1, 1).select(F.inline(F.array(*structs)))
