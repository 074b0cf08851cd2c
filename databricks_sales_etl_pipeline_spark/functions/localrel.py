"""Arrow-backed local relations for tiny driver-computed tables.

``spark.createDataFrame(list_of_tuples, ddl)`` compiles to a ``Scan
ExistingRDD`` over a defaultParallelism-sliced *Python* RDD: every
consumption of the frame — including building a broadcast side — launches a
32-task job whose only work is spinning up Python workers to unpickle a
~1 KB table. Measured at sf0.1 (round-13 profiling, stage metrics): 47 s of
executor time per carry table in ext_empirical_copula, 90 s across the three
carries in ext_rfm_segmentation, 115 s in ext_nn_matching — all with zero
bytes of input or shuffle.

``spark.createDataFrame(pyarrow.Table, schema)`` instead plans a
``LocalTableScan``: the rows live in the plan, no job runs to produce them,
and a broadcast build reads them directly on the driver. Verified on a
VANILLA session (the driver's): the pyarrow path does NOT depend on
``spark.sql.execution.arrow.pyspark.enabled``. Rows, column names, types and
nullability are identical to the list form — same DDL, same values.

Use this for every bounded model artifact the engine ships back into a plan
(exclusive-carry offsets, Lloyd/BPE model tables, seed frontiers, report
rows). Data-proportional frames must never come through here — the rows
transit the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def local_df(
    spark: SparkSession, rows: list, ddl: str | StructType
) -> DataFrame:
    """Drop-in replacement for ``spark.createDataFrame(rows, ddl)`` for
    small driver-side row lists: plans a LocalTableScan (zero tasks) instead
    of a Python-RDD scan (one 32-task Python-worker job per consumption).
    ``rows`` is a list of tuples matching the DDL column order; None cells
    become SQL NULLs exactly as in the list form."""
    import pyarrow as pa
    from pyspark.sql.pandas.types import to_arrow_type

    schema = ddl if isinstance(ddl, StructType) else StructType.fromDDL(ddl)
    arrays = [
        pa.array(
            [r[i] for r in rows], type=to_arrow_type(f.dataType)
        )
        for i, f in enumerate(schema.fields)
    ]
    table = pa.Table.from_arrays(arrays, names=[f.name for f in schema.fields])
    return spark.createDataFrame(table, schema)
