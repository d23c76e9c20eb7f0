"""Custom Python Data Source WRITER (``DataSourceWriter``) — the write
half of the Spark 4 extension point, shaped as the reference's text KV
sink (``WordCount.java:61`` TextOutputFormat: ``key TAB value`` lines,
``_SUCCESS`` marker, job fails rather than overwrites unless asked).

The JVM path for that contract lives in ``sources/sinks.write_text_kv``;
this sink re-states it through the task-commit protocol a custom writer
must honor at scale:

- each TASK writes its own uniquely-named part file (no coordination,
  no renames of shared paths) and returns a commit message naming it;
- the DRIVER's ``commit(messages)`` runs once after every task
  succeeded and publishes the ``_SUCCESS`` marker — readers treat its
  absence as "job never completed";
- ``abort()`` removes the orphaned part files a failed job left, so a
  retry starts clean. Speculative/retried task attempts get distinct
  UUID names and only the attempts named in commit messages count.

That protocol — not the line formatting — is what makes a 1000-task
write exactly-once; it is the same contract FileOutputCommitter
implements for the JVM sinks.
"""

from __future__ import annotations

import os
import uuid
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceWriter,
    WriterCommitMessage,
)


@dataclass
class _PartFile(WriterCommitMessage):
    path: str
    n_rows: int


class KVTextWriter(DataSourceWriter):
    def __init__(self, options: dict, overwrite: bool) -> None:
        self.path = options.get("path")
        if not self.path:
            raise ValueError("pykv sink requires a path")
        self.sep = options.get("sep", "\t")
        self.overwrite = overwrite

    def write(self, rows) -> _PartFile:
        """Runs on an executor, once per task: write THIS task's rows
        to a uniquely-named part file and report it upward."""
        os.makedirs(self.path, exist_ok=True)
        part = os.path.join(self.path, f"part-{uuid.uuid4().hex}.txt")
        n = 0
        with open(part, "w") as f:
            for row in rows:
                f.write(f"{row[0]}{self.sep}{row[1]}\n")
                n += 1
        return _PartFile(path=part, n_rows=n)

    def commit(self, messages) -> None:
        """Driver-side, after ALL tasks succeeded: publish atomically."""
        total = sum(m.n_rows for m in messages)
        with open(os.path.join(self.path, "_SUCCESS"), "w") as f:
            f.write(f"{total}\n")

    def abort(self, messages) -> None:
        """Driver-side on job failure: remove orphaned part files."""
        for m in messages:
            if m is not None and os.path.exists(m.path):
                os.remove(m.path)


class KVTextDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "pykv"

    def writer(self, schema, overwrite: bool) -> KVTextWriter:
        if len(schema.fields) != 2:
            raise ValueError(
                f"pykv sink writes (key, value) pairs; got {len(schema.fields)} columns"
            )
        # Reference TextOutputFormat contract (same as sinks.write_text_kv
        # mode('error')): a job FAILS rather than overwrites unless asked.
        # This runs driver-side before any task launches; without it a
        # re-run would mix stale and new part files under a fresh
        # _SUCCESS. With overwrite, stale parts are cleared here so the
        # commit publishes only this job's files.
        path = self.options.get("path")
        if path and os.path.isdir(path):
            stale = [
                f for f in os.listdir(path)
                if f.startswith("part-") or f == "_SUCCESS"
            ]
            if stale and not overwrite:
                raise FileExistsError(
                    f"pykv sink target {path} already contains output "
                    f"({len(stale)} files); use mode('overwrite') to replace"
                )
            for f in stale:
                os.remove(os.path.join(path, f))
        return KVTextWriter(self.options, overwrite)


def register_kv_sink(spark) -> None:
    spark.dataSource.register(KVTextDataSource)
