"""Event-sourced job audit trail (SURVEY §2.2 K5-K6, FIXTURES.md §5).

The reference keys a DynamoDB item by ``execution_id`` and mutates
``job_latest_status`` in place
(``state_machine_trigger/lambda_handler.py:25-46``,
``etl_job_auditor/lambda_handler.py:50-107``).  A mutable KV store is
the wrong shape for a data lake, so the engine event-sources it:
every status change appends one immutable Parquet row; "latest
status" is a window query.  Appends are tiny and conflict-free at any
scale; the read path is a standard last-row-per-key window.
"""

from __future__ import annotations

from datetime import datetime, timezone

from pyspark.sql import DataFrame, Row, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType
from pyspark.sql.window import Window

from pyspark.sql.types import LongType

AUDIT_SCHEMA = StructType(
    [
        StructField("event_seq", LongType(), False),
        StructField("execution_id", StringType(), False),
        StructField("execution_name", StringType(), True),
        StructField("pipeline_id", StringType(), True),
        StructField("job_input", StringType(), True),
        StructField("job_latest_status", StringType(), True),
        StructField("job_start_date", StringType(), True),
        StructField("joblast_updated_timestamp", StringType(), True),
        StructField("error_message", StringType(), True),
    ]
)


class AuditLog:
    def __init__(self, spark: SparkSession, location: str, clock=None):
        self.spark = spark
        self.location = location
        self._clock = clock or (lambda: datetime.now(timezone.utc))
        self._seq = 0

    def _now(self) -> str:
        return self._clock().strftime("%Y-%m-%d %H:%M:%S.%f")

    def _append(self, row: dict) -> None:
        # event_seq breaks same-timestamp ties (e.g. an injected frozen
        # clock); real multi-writer ordering still rides the timestamp.
        self._seq += 1
        df = self.spark.createDataFrame(
            [Row(event_seq=self._seq, **row)], schema=AUDIT_SCHEMA
        )
        df.coalesce(1).write.mode("append").parquet(self.location)

    def insert_started(
        self,
        execution_id: str,
        execution_name: str,
        pipeline_id: str,
        job_input: str,
    ) -> None:
        """K5: STARTED record (lambda_handler.py:25-46)."""
        ts = self._now()
        self._append(
            {
                "execution_id": execution_id,
                "execution_name": execution_name,
                "pipeline_id": pipeline_id,
                "job_input": job_input,
                "job_latest_status": "STARTED",
                "job_start_date": ts,
                "joblast_updated_timestamp": ts,
                "error_message": None,
            }
        )

    def update_status(
        self, execution_id: str, status: str, error_message: str | None = None
    ) -> None:
        """K6: status update; FAILED carries the error message
        (etl_job_auditor/lambda_handler.py:50-107)."""
        self._append(
            {
                "execution_id": execution_id,
                "execution_name": None,
                "pipeline_id": None,
                "job_input": None,
                "job_latest_status": status,
                "job_start_date": None,
                "joblast_updated_timestamp": self._now(),
                "error_message": error_message,
            }
        )

    def read(self) -> DataFrame:
        return self.spark.read.schema(AUDIT_SCHEMA).parquet(self.location)

    def latest_status(self) -> DataFrame:
        """Current status per execution: last event wins (the DynamoDB
        ``update_item`` semantics, replayed as a window query)."""
        w = Window.partitionBy("execution_id").orderBy(
            F.col("joblast_updated_timestamp").desc(), F.col("event_seq").desc()
        )
        return (
            self.read()
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
