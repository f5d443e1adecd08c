"""Driver-local relations as genuine LocalTableScans.

`SparkSession.createDataFrame(list_of_tuples, ddl)` builds a PICKLED-RDD
frame: the rows are parallelized over defaultParallelism partitions and
every downstream action evaluates them through Python workers — measured
~0.2-0.5 s per action on this host for a handful of rows, and ~6 s when a
`coalesce(1)` forces one task to drain all (mostly empty) pickled
partitions sequentially (one Python-worker round trip each). The serving
layer has dodged this for rounds with SQL VALUES literals
(`api.HybridEngine._fused_literal_df`); this module is the same fix for
the plan layer's many small driver-side relations (query batches, probe
tables, codebooks, hyperplanes): hand Spark a pyarrow Table, which lands
as a JVM LocalRelation — no Python workers at action time, broadcast
builds driver-side with no job (guide §4: keep the JVM↔Python boundary
out of the query path).
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame, SparkSession

try:
    import pyarrow as pa
except ImportError:  # pragma: no cover — pyspark ships pyarrow
    pa = None

_log = logging.getLogger(__name__)


def local_df(spark: SparkSession, rows: list, ddl: str) -> DataFrame:
    """`spark.createDataFrame(rows, ddl)` with a LocalTableScan plan.

    Rows are positional tuples (or anything indexable) matching the DDL
    field order, exactly like the classic call. Falls back to the classic
    pickled-RDD path on a NAMED set of Arrow conversion gaps (exotic
    types, values a pa.array refuses) — the fallback produces the same
    values, just slower. The except is deliberately narrow and the
    fallback logged (round-13 ADVICE): a broad silent except would mask
    caller bugs behind a slow path and make an ExistingRDD reappearing in
    plans undetectable."""
    if pa is None:
        return spark.createDataFrame(rows, ddl)
    try:
        from pyspark.sql.pandas.types import to_arrow_schema
        from pyspark.sql.types import StructType

        schema = StructType.fromDDL(ddl)
        arrow_schema = to_arrow_schema(schema)
        cols = [pa.array([r[i] for r in rows], type=f.type)
                for i, f in enumerate(arrow_schema)]
        return spark.createDataFrame(
            pa.Table.from_arrays(cols, schema=arrow_schema))
    except (ImportError, ValueError, TypeError, KeyError, IndexError,
            OverflowError, pa.lib.ArrowInvalid, pa.lib.ArrowTypeError,
            pa.lib.ArrowNotImplementedError) as e:
        _log.debug("local_df: Arrow path fell back to pickled-RDD "
                   "(%s: %s)", type(e).__name__, e)
        return spark.createDataFrame(rows, ddl)
