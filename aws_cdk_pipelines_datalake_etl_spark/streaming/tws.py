"""Spark 4 ``transformWithStateInPandas``: the successor stateful API
(typed composite state — ValueState/ListState/MapState/timers — vs
``applyInPandasWithState``'s single state tuple, which
streaming/stateful.py demonstrates).

Operator here: per-key running DISTINCT-set tracker.  Each user's seen
event types live in a ``MapState`` (one entry per type — state is
O(distinct types per key), never O(events)); every micro-batch emits
the key's distinct count so far.  The count is monotone
non-decreasing, so ``max()`` over the emissions equals the batch
``COUNT(DISTINCT)`` REGARDLESS of how the stream was split into
micro-batches or which order files arrive — deterministic semantics by
construction, which is what makes the oracle in the tests exact.

ENVIRONMENT GATE: the transformWithState Python worker speaks a
protobuf protocol to the JVM state server, so it requires the
``protobuf`` package — absent in this sandbox (no installs allowed).
:func:`tws_available` reports whether the runtime can execute it;
``stream_distinct_types`` raises a clear error up front instead of a
mid-query worker crash.  The operator semantics are pinned by
``tests/test_streaming.py::test_tws_distinct_types`` which runs
wherever protobuf exists and skips (not passes) here — the
``applyInPandasWithState`` operators in streaming/stateful.py are the
fully-exercised stateful path in this environment.
"""

from __future__ import annotations

import os
import uuid
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

OUTPUT_SCHEMA = "user_id bigint, n_types bigint"


def tws_available() -> bool:
    """True when the runtime can execute transformWithState (the
    Python worker needs protobuf for the state-server protocol)."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


class DistinctTypeCounter(StatefulProcessor):
    """MapState-backed distinct set; emits (key, n_distinct_so_far)."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._seen = handle.getMapState("seen", "t string", "one int")

    def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
        batch_types: set[str] = set()
        for pdf in rows:
            batch_types.update(pdf["event_type"].dropna().unique().tolist())
        for t in batch_types:
            if not self._seen.containsKey((t,)):
                self._seen.updateValue((t,), (1,))
        n = sum(1 for _ in self._seen.keys())
        yield pd.DataFrame(
            {
                "user_id": pd.Series([key[0]], dtype="int64"),
                "n_types": pd.Series([n], dtype="int64"),
            }
        )

    def close(self) -> None:
        pass


def stream_distinct_types(
    spark: SparkSession,
    events_path: str,
    key_col: str = "user_id",
    max_files_per_trigger: int | None = 1,
) -> DataFrame:
    """Drive a file-source event stream through the transformWithState
    distinct tracker (AvailableNow) and return the FINAL distinct count
    per key (max over the monotone per-batch emissions)."""
    from aws_cdk_pipelines_datalake_etl_spark.sources.testdata import (
        fix_nanos_timestamps,
    )

    if not tws_available():
        raise ImportError(
            "transformWithStateInPandas needs the protobuf package for "
            "its state-server protocol; install protobuf or use the "
            "applyInPandasWithState operators (streaming/stateful.py)"
        )
    schema = spark.read.parquet(events_path).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    if os.path.isfile(events_path):
        reader = reader.option("pathGlobFilter", os.path.basename(events_path))
        stream_path = os.path.dirname(events_path)
    else:
        stream_path = events_path
    stream = fix_nanos_timestamps(reader.parquet(stream_path), ("ts",))
    out = stream.groupBy(key_col).transformWithStateInPandas(
        statefulProcessor=DistinctTypeCounter(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="append",
        timeMode="none",
    )
    name = f"tws_out_{uuid.uuid4().hex[:8]}"
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return (
        spark.table(name)
        .groupBy(key_col)
        .agg(F.max("n_types").alias("n_types"))
    )
