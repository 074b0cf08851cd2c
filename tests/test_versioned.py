"""Versioned-table (Delta-lite) contract: time travel, OPTIMIZE, VACUUM,
checkpointed history truncation, single-writer commit guard."""

from __future__ import annotations

import glob
import os

import pytest

from databricks_sales_etl_pipeline_spark.catalog import load
from databricks_sales_etl_pipeline_spark.plans.versioned import (
    ConcurrentWriteError,
    VersionedTable,
)
from tests.conftest import SF_DIR


@pytest.fixture
def nation(spark):
    return load(spark, SF_DIR, "nation")


def test_time_travel_snapshots(spark, nation, tmp_path):
    t = VersionedTable(spark, str(tmp_path / "t"))
    n = nation.count()
    t.write(nation, mode="overwrite")            # v0
    t.write(nation.limit(7), mode="append")      # v1
    t.write(nation.limit(3), mode="overwrite")   # v2
    assert t.read(version=0).count() == n
    assert t.read(version=1).count() == n + 7
    assert t.read(version=2).count() == 3
    assert t.read().count() == 3                 # latest
    ops = [h["operation"] for h in t.history()]
    assert ops == ["WRITE", "APPEND", "WRITE"]


def test_time_travel_values_exact(spark, nation, tmp_path):
    t = VersionedTable(spark, str(tmp_path / "t"))
    t.write(nation, mode="overwrite")
    t.write(nation.withColumn("n_name", nation.n_name.substr(1, 1)), mode="overwrite")
    v0 = {tuple(r) for r in t.read(version=0).collect()}
    src = {tuple(r) for r in nation.collect()}
    assert v0 == src                              # v0 unchanged by v1 overwrite


def test_optimize_compacts_and_preserves(spark, nation, tmp_path):
    t = VersionedTable(spark, str(tmp_path / "t"))
    t.write(nation.repartition(16), mode="overwrite")
    before = len(t.live_files())
    assert before >= 16
    v = t.optimize()
    assert len(t.live_files()) < before
    assert t.read().count() == nation.count()
    # pre-OPTIMIZE snapshot still readable (files retained until VACUUM)
    assert t.read(version=v - 1).count() == nation.count()


def test_vacuum_deletes_and_breaks_old_time_travel(spark, nation, tmp_path):
    t = VersionedTable(spark, str(tmp_path / "t"))
    t.write(nation, mode="overwrite")            # v0
    t.write(nation.limit(5), mode="overwrite")   # v1 (v0's files now dead)
    doomed = t.vacuum(retain_last=1)
    assert doomed                                 # v0's files physically gone
    for f in doomed:
        assert not os.path.exists(os.path.join(t.path, f))
    assert t.read().count() == 5                  # current snapshot intact
    with pytest.raises(ValueError, match="vacuumed or never written"):
        t.read(version=0)


def test_vacuum_checkpoint_preserves_append_chain(spark, nation, tmp_path):
    """The horizon commit must be checkpointed: its snapshot references
    files added in truncated earlier commits."""
    t = VersionedTable(spark, str(tmp_path / "t"))
    n = nation.count()
    t.write(nation, mode="overwrite")            # v0
    t.write(nation, mode="append")               # v1 references v0's files
    t.vacuum(retain_last=1)
    assert t.read().count() == 2 * n              # v1 snapshot survives intact
    assert t.read(version=1).count() == 2 * n
    ops = [h["operation"] for h in t.history()]
    assert ops == ["CHECKPOINT", "VACUUM"]


def test_concurrent_commit_guard(spark, nation, tmp_path, monkeypatch):
    """Two writers that both resolve next-version=1 (the lost-update race):
    the second put-if-absent create must FAIL loudly, not clobber."""
    t = VersionedTable(spark, str(tmp_path / "t"))
    t.write(nation, mode="overwrite")             # v0
    t.write(nation, mode="append")                # v1 (writer A wins)
    # writer B still believes history is [0] → targets version 1 again
    monkeypatch.setattr(t, "versions", lambda: [0])
    with pytest.raises(ConcurrentWriteError):
        t.write(nation, mode="append")


def test_write_write_conflict_and_retry(spark, nation, tmp_path):
    """Delta's optimistic-concurrency protocol end-to-end: two handles read
    the same snapshot, both attempt the next version; the loser raises
    ConcurrentWriteError (its data files never enter the log) and a retry
    from a fresh snapshot succeeds. The winner's committed rows are
    unaffected by the failed commit."""
    path = str(tmp_path / "t")
    writer_a = VersionedTable(spark, path)
    writer_b = VersionedTable(spark, path)
    writer_a.write(nation, mode="overwrite")       # v0
    base = writer_a.snapshot_version()
    assert base == writer_b.snapshot_version() == 0
    assert writer_b.write(nation, mode="append", base_version=base) == 1
    with pytest.raises(ConcurrentWriteError):
        writer_a.write(nation, mode="append", base_version=base)
    # failed commit left no log entry; snapshot still reflects B's append
    assert writer_a.versions() == [0, 1]
    n = nation.count()
    assert writer_a.read().count() == 2 * n
    # standard recovery: re-read the snapshot and retry
    assert writer_a.write(nation, mode="append") == 2
    assert writer_a.read().count() == 3 * n


def test_read_gives_pushdown_pruned_scan(spark, nation, tmp_path):
    """Snapshot reads are plain parquet scans — predicate pushdown and
    column pruning must survive the explicit file list."""
    t = VersionedTable(spark, str(tmp_path / "t"))
    t.write(nation, mode="overwrite")
    df = t.read().where("n_regionkey = 2").select("n_name")
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "EqualTo(n_regionkey,2)" in plan       # pushed filter
    assert "ReadSchema" in plan and "n_comment" not in plan.split("ReadSchema")[1].split("\n")[0]


def test_streaming_foreachbatch_into_versioned_table(spark, tmp_path):
    """Streaming sink → ACID table: a Structured Streaming query appends
    each micro-batch into the commit log via foreachBatch (the Delta
    streaming-sink shape). Two AvailableNow runs over one checkpoint: each
    input file lands as exactly one APPEND commit, rows survive exactly,
    and time travel can read the table as of the first batch."""
    import glob
    import os

    from databricks_sales_etl_pipeline_spark.streaming.util import await_finished

    indir = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    table = VersionedTable(spark, str(tmp_path / "t"))
    schema = "k bigint, v string"

    def feed(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(indir)

    def run_once():
        stream = spark.readStream.schema(schema).parquet(indir)
        q = (
            stream.writeStream.foreachBatch(
                lambda batch_df, batch_id: table.write(batch_df, mode="append")
                if batch_df.count()
                else None
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        await_finished(q, 120)

    feed([(1, "a"), (2, "b")])
    run_once()
    v_after_first = table.snapshot_version()
    assert table.read().count() == 2
    feed([(3, "c")])
    run_once()
    assert table.read().count() == 3
    # exactly-once across restarts: batch 1 was not re-appended
    ops = [h["operation"] for h in table.history()]
    assert ops.count("APPEND") == len(
        [p for p in glob.glob(os.path.join(indir, "part-*"))]
    )
    # time travel to the pre-second-batch snapshot
    assert table.read(version=v_after_first).count() == 2
