"""Custom Python DataSource writer: the reference's text sink with its
atomic temp-file + rename commit, on Spark 4's writer extension point.

The reference worker writes each reduce partition to ``mr-tmp-*`` and
atomically renames to ``mr-out-N`` only on success (reference
src/mr/worker.go:83-99); a failed task leaves only temp litter, never a
partial output file. This module reproduces that exact protocol through
the Python DataSource writer API:

- each task writes its partition's "key value" lines to
  ``_tmp-<uuid>`` and returns the temp name + its partition id in the
  commit message;
- ``commit`` (driver-side, runs once after every task succeeded) renames
  each temp to ``part-NNNNN.txt`` — rename is the atomic boundary;
- ``abort`` deletes the temps, so failed/speculated attempts leave no
  visible output.

Usage::

    spark.dataSource.register(KVTextDataSource)
    df.select("key", "value").write.format("kv_text").mode("append") \
        .option("path", out_dir).save()

(`mode` is accepted for API shape; the sink always appends new part files
— the reference has no overwrite concept.)

Deployment contract: ``commit``/``abort`` run DRIVER-side and rename/delete
paths written by executor tasks, so driver and executors must share one
filesystem at ``path`` — true in local mode and on any shared mount (NFS/
EFS — the reference's own deployment, run.sh), NOT on independent executor-
local disks or object stores. That matches the reference exactly (its
workers rename on a shared filesystem too); for HDFS/S3 output use Spark's
built-in sinks, whose FileOutputCommitter implements the same temp+rename
protocol through the Hadoop FS API (see sources/sinks.py).
"""

from __future__ import annotations

import glob
import os
import uuid

from pyspark.sql.datasource import DataSource, DataSourceWriter, WriterCommitMessage


class KVTextCommit(WriterCommitMessage):
    def __init__(self, tmp_path: str, partition_id: int, n_rows: int):
        self.tmp_path = tmp_path
        self.partition_id = partition_id
        self.n_rows = n_rows


class KVTextWriter(DataSourceWriter):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("kv_text writer requires option 'path'")
        # One id per WRITE JOB (constructed driver-side, pickled to every
        # task): final filenames carry it so a second append to the same
        # directory gets fresh part files instead of os.replace silently
        # clobbering a previous job's part-NNNNN output.
        self.job_id = uuid.uuid4().hex[:12]

    def write(self, iterator) -> KVTextCommit:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        os.makedirs(self.path, exist_ok=True)
        # Temp names carry the job id so abort() can sweep THIS job's
        # orphans (a task killed mid-write never returns a commit message
        # naming its temp) without touching a concurrent job's files.
        tmp = os.path.join(self.path, f"_tmp-{self.job_id}-{uuid.uuid4().hex}")
        n = 0
        with open(tmp, "w", encoding="utf-8") as f:
            for row in iterator:
                f.write(f"{row[0]} {row[1]}\n")
                n += 1
        return KVTextCommit(tmp, pid, n)

    def commit(self, messages) -> None:
        for m in messages:
            if m is None:
                continue
            final = os.path.join(
                self.path, f"part-{m.partition_id:05d}-{self.job_id}.txt"
            )
            os.replace(m.tmp_path, final)  # the atomic boundary

    def abort(self, messages) -> None:
        # Messages cover tasks that RETURNED; a task that died mid-write
        # left a temp no message names. The job-id prefix scopes a glob
        # sweep to exactly this job's litter (the reference leaves such
        # litter behind; test-mr.sh tolerates it — we clean it up).
        for m in messages:
            if m is not None and os.path.exists(m.tmp_path):
                os.remove(m.tmp_path)
        for orphan in glob.glob(os.path.join(self.path, f"_tmp-{self.job_id}-*")):
            try:
                os.remove(orphan)
            except OSError:
                pass


class KVTextDataSource(DataSource):
    """`kv_text` sink: two-column (key, value) frames to "key value" text
    lines, one file per partition, atomic-rename commit."""

    @classmethod
    def name(cls) -> str:
        return "kv_text"

    def writer(self, schema, overwrite: bool) -> DataSourceWriter:
        return KVTextWriter(self.options)
