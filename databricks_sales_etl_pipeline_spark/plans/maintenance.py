"""Table maintenance: schema-drift reporting and small-file compaction.

Schema drift (SURVEY §1.6): inference is allowed only at Bronze ingest, and
every inferred batch is diffed against the registered contract before it is
appended — the reference's silent mergeSchema drift
(`03_scheduling_automation.py:123`, fatturato_medio→ordine_medio) becomes an
explicit, reviewable event.

Compaction: streaming/incremental appends produce many small files; scans
then pay per-file open/footer costs and lose row-group locality. Compaction
rewrites a table to ~target-sized files. At 100 TB this runs per partition,
only on partitions whose small-file count crosses a threshold.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from databricks_sales_etl_pipeline_spark.io import read_table, write_table
from databricks_sales_etl_pipeline_spark.session import TARGET_PARTITION_BYTES


@dataclass
class SchemaDrift:
    added: list[str] = field(default_factory=list)       # in batch, not contract
    missing: list[str] = field(default_factory=list)     # in contract, not batch
    retyped: list[tuple[str, str, str]] = field(default_factory=list)

    @property
    def clean(self) -> bool:
        return not (self.added or self.missing or self.retyped)


def diff_schemas(want: dict[str, str], got: dict[str, str]) -> SchemaDrift:
    """Pure diff of two {column: type} maps (shared by the ingest gate and
    the sink_schema_drift report query)."""
    return SchemaDrift(
        added=sorted(set(got) - set(want)),
        missing=sorted(set(want) - set(got)),
        retyped=sorted(
            (c, want[c], got[c]) for c in set(want) & set(got) if want[c] != got[c]
        ),
    )


def schema_drift(contract: T.StructType, batch: DataFrame) -> SchemaDrift:
    """Diff an incoming (possibly inferred) batch against the registered
    contract: added / missing columns and type changes."""
    want = {f.name: f.dataType.simpleString() for f in contract.fields}
    return diff_schemas(want, dict(batch.dtypes))


def ingest_with_drift_check(
    batch: DataFrame,
    contract: T.StructType,
    path: str,
    allow_evolution: bool = False,
) -> SchemaDrift:
    """Bronze append gated on the drift report: clean batches append;
    drifted batches append only when evolution is explicitly allowed
    (then with mergeSchema, so the event is visible in the table too)."""
    drift = schema_drift(contract, batch)
    if not drift.clean and not allow_evolution:
        raise ValueError(f"schema drift rejected: {drift}")
    write_table(batch, path, mode="append", merge_schema=not drift.clean)
    return drift


def compact_table(spark: SparkSession, path: str) -> int:
    """Rewrite a parquet table to ~TARGET_PARTITION_BYTES files; returns the
    new file count. Uses the scan's own size statistics for the estimate."""
    df = read_table(spark, path)
    size_bytes = df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
    n_files = max(1, math.ceil(int(size_bytes) / TARGET_PARTITION_BYTES))
    staged = df.repartition(n_files).localCheckpoint(eager=True)
    write_table(staged, path, mode="overwrite")
    return n_files
