"""Custom Python STREAMING DataSource (Spark 4
``pyspark.sql.datasource.SimpleDataSourceStreamReader``):
``format("eventgen")`` — the streaming twin of
:mod:`.corpusgen`'s batch reader.

Why it exists: the connector surface has two halves per direction;
the batch reader (corpusgen) covers programmatic scans, this covers a
programmatic *micro-batch* source with real offset bookkeeping —
``initialOffset`` / ``read(start) -> (rows, end)`` /
``readBetweenOffsets(start, end)`` for replay after restart — i.e.
the contract a queue/CDC-feed connector implements.  The engine's
other streams are all file-backed; this one generates events in
bounded chunks, so a query drains it in ``ceil(n / batch_rows)``
micro-batches and then reports no-new-data (``processAllAvailable``
returns).

Rows are a pure closed form of the index ``i`` (shared with the
registry's ``generate_series`` oracle): ``user_id = i % 37``,
``value = (i * i) % 101`` — so exactly-once replay is testable
bit-for-bit: ``readBetweenOffsets`` must reproduce precisely the
slice a crashed batch claimed.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StructType


def event_row(i: int) -> tuple[int, int, int]:
    return i, i % 37, (i * i) % 101


class EventGenStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options):
        self.n = int(options.get("n", 5000))
        self.batch_rows = int(options.get("batch_rows", 1100))

    def initialOffset(self) -> dict:
        return {"index": 0}

    def read(self, start: dict):
        # the prefetcher wants the iterator protocol but materializes
        # rows driver-side for pickling: iter(list), never a bare
        # generator (unpicklable) or a bare list (not an iterator)
        lo = int(start["index"])
        # never regress the offset: a checkpoint from a run with a
        # larger n must not make end < start after reconfiguration
        hi = max(lo, min(lo + self.batch_rows, self.n))
        return iter([event_row(i) for i in range(lo, hi)]), {"index": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        # replay path: a restarted query re-reads a planned-but-
        # uncommitted batch; must be bit-identical to the original
        return iter(
            [event_row(i) for i in range(int(start["index"]), int(end["index"]))]
        )

    def commit(self, end: dict) -> None:
        pass  # nothing external to clean up; offsets live in the checkpoint


class EventGenDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "eventgen"

    def schema(self) -> str:
        return "event_id bigint, user_id bigint, value bigint"

    def simpleStreamReader(self, schema: StructType) -> EventGenStreamReader:
        return EventGenStreamReader(self.options)


def register(spark) -> None:
    """Idempotent registration of the eventgen format on a session."""
    spark.dataSource.register(EventGenDataSource)


# ---------------------------------------------------------------------------
# Partition-planned variant: the scale path.  The simple reader above
# prefetches rows driver-side (fine for control-plane-sized feeds);
# this one implements the full DataSourceStreamReader contract —
# latestOffset claims a bounded chunk per micro-batch, partitions()
# splits the claimed offset range into slices, and read() runs ON THE
# EXECUTORS, one task per slice — so a single logical feed fans out
# across the cluster like a file scan does.
# ---------------------------------------------------------------------------


class _Range(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class EventGenParallelStreamReader(DataSourceStreamReader):
    def __init__(self, options):
        self.n = int(options.get("n", 5000))
        self.batch_rows = int(options.get("batch_rows", 1100))
        self.parallelism = int(options.get("parallelism", 4))
        self._latest = 0
        # False until initialOffset() runs.  Spark calls
        # initialOffset() ONLY when the query has no checkpoint; a
        # reader constructed for a RESTARTED query goes straight to
        # partitions()/latestOffset().  Until one of those has synced
        # the cursor to the checkpointed start, the in-memory cursor
        # (0) is meaningless and must not be offered as an offset —
        # a regressed end would make Spark re-plan from below the
        # checkpoint and re-emit committed rows.
        self._cursor_valid = False

    def initialOffset(self) -> dict:
        self._cursor_valid = True  # fresh query: cursor 0 is the truth
        return {"index": 0}

    def latestOffset(self) -> dict:
        # One bounded chunk per micro-batch planning cycle (poor man's
        # admission control — the Python API has no latestOffset(start,
        # limit)).  If the cursor has not been validated yet (restart
        # after a cleanly committed batch: no initialOffset, no replay
        # partitions() call before planning), chunking from the stale
        # in-memory 0 would REGRESS the offset below the checkpoint and
        # duplicate rows; the external truth — all n rows exist — is
        # always safe, so offer the full range and let the final batch
        # be unchunked.
        if not self._cursor_valid:
            self._latest = self.n
            self._cursor_valid = True
        else:
            self._latest = min(self._latest + self.batch_rows, self.n)
        return {"index": self._latest}

    def partitions(self, start: dict, end: dict):
        lo, hi = int(start["index"]), int(end["index"])
        # Sync the chunk cursor to the batch range Spark holds: both
        # offsets come from the offset log, so the cursor can never
        # sit below them.  On an uncommitted-batch replay this runs
        # BEFORE the next planning cycle, so chunked pacing resumes
        # from the replayed batch's END, not from 0.
        if max(lo, hi) > self._latest:
            self._latest = max(lo, hi)
        self._cursor_valid = True
        if hi < lo:
            # A strictly backward batch can only mean the checkpoint
            # holds an offset beyond this run's configured n (the
            # restart fallback claims at most n).  Letting it through
            # would WAL the regressed end, and a LATER restart with n
            # restored would replay already-delivered rows — fail loud
            # with the operational fix instead of silently duplicating.
            raise ValueError(
                f"eventgenpar: checkpointed offset {lo} exceeds the "
                f"configured n={self.n}; restart with n >= {lo} or use "
                "a fresh checkpoint location"
            )
        if hi == lo:
            return []
        per = max(1, -(-(hi - lo) // self.parallelism))  # ceil
        return [_Range(a, min(a + per, hi)) for a in range(lo, hi, per)]

    def read(self, partition: _Range):
        # executor-side: generate only this slice
        for i in range(partition.start, partition.end):
            yield event_row(i)

    def commit(self, end: dict) -> None:
        # keep the chunk cursor at least at the committed point —
        # a committed end is checkpoint-proven, so it validates the
        # cursor just like a partitions() sync does
        self._latest = max(self._latest, int(end["index"]))
        self._cursor_valid = True


class EventGenParDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "eventgenpar"

    def schema(self) -> str:
        return "event_id bigint, user_id bigint, value bigint"

    def streamReader(self, schema: StructType) -> EventGenParallelStreamReader:
        return EventGenParallelStreamReader(self.options)


def register_parallel(spark) -> None:
    """Idempotent registration of the eventgenpar format."""
    spark.dataSource.register(EventGenParDataSource)
