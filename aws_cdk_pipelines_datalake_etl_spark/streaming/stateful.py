"""Custom stateful streaming operator: gap-based sessionization via
``applyInPandasWithState`` (Tier E — the reference has no streaming;
its event-triggered batch model, SURVEY §2.5 O1, is the seed).

Semantics: events for a user belong to one session while consecutive
event times are within ``gap``; a session closes when a newer event
arrives beyond the gap (emitted immediately) or when the event-time
watermark passes ``last_ts + gap`` (emitted via ``EventTimeTimeout``).
State per key is one open session — four scalars — so state size is
O(active users), not O(events): the 100 TB-stream shape.

The arrow-batched pandas function sorts each key's micro-batch rows,
merges them with the open-session state, and does a vectorized
diff/cumsum sessionization — no per-row Python in the hot path beyond
the per-key group loop that ``applyInPandasWithState`` itself owns.
"""

from __future__ import annotations

import os
import uuid
from typing import Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id bigint, session_start timestamp, session_end timestamp, "
    "n_events bigint, total_value double"
)
STATE_SCHEMA = "start_us bigint, last_us bigint, n bigint, total double"


def _make_session_fn(gap_us: int, ts_col: str, value_col: str):
    def fn(
        key: Tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        def out(rows: list[tuple[int, int, int, float]]) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "user_id": pd.Series([key[0]] * len(rows), dtype="int64"),
                    "session_start": pd.to_datetime(
                        [r[0] for r in rows], unit="us"
                    ),
                    "session_end": pd.to_datetime(
                        [r[1] for r in rows], unit="us"
                    ),
                    "n_events": pd.Series([r[2] for r in rows], dtype="int64"),
                    "total_value": pd.Series(
                        [r[3] for r in rows], dtype="float64"
                    ),
                }
            )

        if state.hasTimedOut:
            start_us, last_us, n, total = state.get
            state.remove()
            yield out([(start_us, last_us, n, total)])
            return

        pdf = pd.concat(list(pdfs), ignore_index=True)
        pdf = pdf.sort_values(ts_col, kind="mergesort", ignore_index=True)
        ts_us = pdf[ts_col].astype("datetime64[us]").astype("int64")
        vals = pdf[value_col].astype("float64")

        new_session = ts_us.diff().fillna(gap_us + 1) > gap_us
        sid = new_session.cumsum()
        grouped = pd.DataFrame(
            {"sid": sid, "ts": ts_us, "v": vals}
        ).groupby("sid", sort=True)
        sessions = [
            (int(g["ts"].iloc[0]), int(g["ts"].iloc[-1]), len(g), float(g["v"].sum()))
            for _, g in grouped
        ]

        closed: list[tuple[int, int, int, float]] = []
        if state.exists:
            start_us, last_us, n, total = state.get
            first = sessions[0]
            if first[0] - last_us <= gap_us:
                sessions[0] = (
                    start_us,
                    first[1],
                    n + first[2],
                    total + first[3],
                )
            else:
                closed.append((start_us, last_us, n, total))

        closed.extend(sessions[:-1])
        open_s = sessions[-1]
        state.update(open_s)
        # live-stream path: emit the open session once the event-time
        # watermark passes its gap deadline
        state.setTimeoutTimestamp(open_s[1] // 1000 + gap_us // 1000)
        if closed:
            yield out(closed)

    return fn


def sessionize_stream(
    spark: SparkSession,
    path: str,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    gap: str = "30 minutes",
    watermark: str = "90 days",
) -> DataFrame:
    """Run gap-sessionization over a parquet directory AS A STREAM and
    return the emitted (closed) sessions as a batch DataFrame.

    With the default far watermark and a finite source, no timeout
    fires, so the emitted set is exactly "every session except each
    user's last (still-open) one" — a pure SQL-expressible predicate,
    which is what the oracle asserts.  A live deployment uses a real
    watermark delay and gets open sessions flushed by timeout.
    """
    from aws_cdk_pipelines_datalake_etl_spark.sources.testdata import (
        fix_nanos_timestamps,
    )

    assert gap.endswith(" minutes")
    gap_us = int(gap.split()[0]) * 60 * 1_000_000

    schema = spark.read.parquet(path).schema
    reader = spark.readStream.schema(schema)
    if os.path.isfile(path):
        reader = reader.option("pathGlobFilter", os.path.basename(path))
        stream_path = os.path.dirname(path)
    else:
        stream_path = path
    stream = fix_nanos_timestamps(reader.parquet(stream_path), (ts_col,))

    sessions = (
        stream.withWatermark(ts_col, watermark)
        .groupBy(user_col)
        .applyInPandasWithState(
            _make_session_fn(gap_us, ts_col, value_col),
            OUTPUT_SCHEMA,
            STATE_SCHEMA,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )
    name = f"sessions_{uuid.uuid4().hex[:8]}"
    q = sessions.writeStream.outputMode("append").format("memory").queryName(name).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name)
