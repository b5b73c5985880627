"""Custom Python STREAMING SINK (Spark 4
``pyspark.sql.datasource.DataSourceStreamWriter``):
``format("jsonldir")`` — a directory sink with a real two-phase
commit, completing the Python connector matrix (batch read:
corpusgen; stream read: eventgen simple + partitioned; stream AND
batch write: this — ``JsonlDirBatchWriter`` below reuses the same
stage-then-publish protocol for ``df.write``).

Protocol (the contract any exactly-once file/queue sink implements):

- ``write`` runs per task on executors: rows stream to a STAGED file
  (``.staged/<uuid>.jsonl``) and the returned commit message carries
  the staged path + row count — nothing is visible yet.
- ``commit`` runs on the driver once every task succeeded: staged
  files move into ``batch=<id>/`` and a ``_COMMIT`` marker lands
  last, so readers only ever see whole batches.  Replays are
  detected by the existing marker — a re-delivered batch's staged
  files are discarded, making the sink idempotent under the
  at-least-once micro-batch contract (exactly-once PUBLICATION).
- ``abort`` deletes the staged files; a half-written batch leaves
  nothing visible.

``read_committed`` is the reader twin: only ``batch=*`` directories
bearing the marker participate.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamWriter,
    DataSourceWriter,
    WriterCommitMessage,
)


@dataclass
class StagedFile(WriterCommitMessage):
    path: str
    rows: int


def _stage_rows(staged_dir: str, iterator) -> StagedFile:
    """Task-side staging shared by the stream and batch writers: rows
    stream to a uniquely-named file under ``staged_dir``; nothing is
    visible until a commit publishes it."""
    os.makedirs(staged_dir, exist_ok=True)
    staged = os.path.join(staged_dir, f"{uuid.uuid4().hex}.jsonl")
    n = 0
    with open(staged, "w") as f:
        for row in iterator:
            f.write(json.dumps(row.asDict(), default=str) + "\n")
            n += 1
    return StagedFile(path=staged, rows=n)


class JsonlDirStreamWriter(DataSourceStreamWriter):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsonldir sink requires option 'path'")

    def write(self, iterator) -> StagedFile:
        return _stage_rows(os.path.join(self.path, ".staged"), iterator)

    def commit(self, messages, batchId: int) -> None:
        batch_dir = os.path.join(self.path, f"batch={batchId}")
        marker = os.path.join(batch_dir, "_COMMIT")
        if os.path.exists(marker):
            # replayed batch: already published exactly once — drop the
            # re-delivered staged files
            for m in messages:
                if m is not None and os.path.exists(m.path):
                    os.remove(m.path)
            self._sweep_staged_orphans(messages)
            return
        os.makedirs(batch_dir, exist_ok=True)
        total = 0
        for i, m in enumerate(messages):
            if m is None:
                continue
            os.replace(m.path, os.path.join(batch_dir, f"part-{i:05d}.jsonl"))
            total += m.rows
        with open(marker, "w") as f:
            f.write(json.dumps({"batchId": batchId, "rows": total}))
        self._sweep_staged_orphans(messages)

    def abort(self, messages, batchId: int) -> None:
        for m in messages:
            if m is not None and os.path.exists(m.path):
                os.remove(m.path)
        self._sweep_staged_orphans(messages)

    def _sweep_staged_orphans(self, messages) -> None:
        """Remove staged files no surviving commit message references.

        Failed or speculative-loser task attempts stage a file but
        their message never reaches commit/abort, so without this the
        ``.staged/`` dir leaks one file per failed attempt forever on
        a long-running stream.  Safe to sweep wholesale at commit
        time: micro-batches are sequential, and commit/abort only run
        after every task of the batch has finished, so anything still
        in ``.staged/`` belongs to a dead attempt (an open fd in a
        zombie process keeps working on POSIX; its path is simply
        never published).
        """
        staged_dir = os.path.join(self.path, ".staged")
        if not os.path.isdir(staged_dir):
            return
        keep = {m.path for m in messages if m is not None}
        for f in os.listdir(staged_dir):
            p = os.path.join(staged_dir, f)
            if p not in keep:
                try:
                    os.remove(p)
                except OSError:
                    pass  # concurrent sweep; nothing visible either way


class JsonlDirDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "jsonldir"

    def schema(self) -> str:  # sink-only; schema comes from the stream
        return "event_id bigint, user_id bigint, value bigint"

    def streamWriter(self, schema, overwrite: bool) -> JsonlDirStreamWriter:
        return JsonlDirStreamWriter(self.options)

    def writer(self, schema, overwrite: bool) -> "JsonlDirBatchWriter":
        return JsonlDirBatchWriter(self.options, overwrite)


def register(spark) -> None:
    """Idempotent registration of the jsonldir sink format."""
    spark.dataSource.register(JsonlDirDataSource)


def read_committed(spark, path: str):
    """Read back ONLY committed batches (dirs bearing the _COMMIT
    marker) — the reader half of the two-phase contract."""
    committed = [
        os.path.join(path, d)
        for d in sorted(os.listdir(path))
        if d.startswith("batch=")
        and os.path.exists(os.path.join(path, d, "_COMMIT"))
    ]
    if not committed:
        raise ValueError(f"no committed batches under {path}")
    return spark.read.json([os.path.join(d, "*.jsonl") for d in committed])


def clean(path: str) -> None:
    shutil.rmtree(path, ignore_errors=True)


class JsonlDirBatchWriter(DataSourceWriter):
    """The BATCH write half (``df.write.format("jsonldir")``): same
    stage-then-publish protocol as the stream writer, one publish per
    job into a JOB-UNIQUE directory ``batch=job-<uuid>/`` (mirroring
    the stream writer's ``batch=<id>/`` layout) — so two append jobs
    can never collide on part names or clobber each other's marker,
    and ``read_committed`` reads stream and batch publications alike.
    Commit moves every staged task file under the job dir and drops
    the marker last; abort discards staging."""

    def __init__(self, options, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsonldir sink requires option 'path'")
        self.overwrite = overwrite
        # one id per writer instance == per job: generated on the
        # driver, carried to executors by pickling, stable across the
        # job's tasks
        self.job_id = uuid.uuid4().hex[:12]

    def _stage_root(self) -> str:
        # job-scoped staging dir: a concurrent batch job's commit-time
        # sweep must never be able to touch THIS job's staged files
        # (the stream writer sweeps the shared .staged/ safely because
        # one query owns the sink and micro-batches are sequential; two
        # batch jobs appending concurrently have no such ordering)
        return os.path.join(self.path, ".staged", f"job-{self.job_id}")

    def write(self, iterator) -> StagedFile:
        return _stage_rows(self._stage_root(), iterator)

    def commit(self, messages) -> None:
        if self.overwrite and os.path.isdir(self.path):
            for d in os.listdir(self.path):
                if d != ".staged":
                    shutil.rmtree(os.path.join(self.path, d), ignore_errors=True)
        out_dir = os.path.join(self.path, f"batch=job-{self.job_id}")
        os.makedirs(out_dir, exist_ok=True)
        total = 0
        for i, m in enumerate(messages):
            if m is None:
                continue
            os.replace(m.path, os.path.join(out_dir, f"part-{i:05d}.jsonl"))
            total += m.rows
        with open(os.path.join(out_dir, "_COMMIT"), "w") as f:
            f.write(json.dumps({"rows": total, "job": self.job_id}))
        # whole-dir orphan hygiene: everything left under this job's
        # staging root belongs to failed attempts of THIS job
        shutil.rmtree(self._stage_root(), ignore_errors=True)

    def abort(self, messages) -> None:
        shutil.rmtree(self._stage_root(), ignore_errors=True)
