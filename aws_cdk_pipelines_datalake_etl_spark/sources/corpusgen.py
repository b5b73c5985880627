"""Custom Python DataSource (Spark 4 ``pyspark.sql.datasource``): a
deterministic synthetic-corpus generator, ``format("corpusgen")``.

Why it exists: the engine's source family (CSV/JSON/parquet/ORC/text)
is all file-backed; this demonstrates the OTHER half of the connector
surface — a programmatic source that plugs into the reader API with
its own partition planning, so Spark parallelizes it like any scan.
Practically it is the load-/soak-test corpus: any size of reproducible
documents without touching disk.

Scale shape: ``n`` rows split into ``parallelism`` partitions; each
executor generates ONLY its slice (no driver materialization, no
shuffle).  Rows are a pure function of ``doc_id``, so the output is
engine-reproducible — the registry oracle rebuilds the exact rows in
SQL from ``generate_series``.

Row formula (closed form, shared with the oracle): doc_id ``i`` has
``4 + i % 5`` tokens, token ``j`` = ``'w' || ((i * 7 + j * 3) % 13)``.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import StructType


def corpus_row(i: int) -> tuple[int, str]:
    n_tokens = 4 + i % 5
    text = " ".join(f"w{(i * 7 + j * 3) % 13}" for j in range(n_tokens))
    return i, text


class _Slice(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class CorpusGenReader(DataSourceReader):
    def __init__(self, options):
        self.n = int(options.get("n", 1000))
        self.parallelism = int(options.get("parallelism", 8))

    def partitions(self):
        per = max(1, -(-self.n // self.parallelism))  # ceil
        return [
            _Slice(lo, min(lo + per, self.n))
            for lo in range(0, self.n, per)
        ]

    def read(self, partition: _Slice):
        for i in range(partition.start, partition.end):
            yield corpus_row(i)


class CorpusGenDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "corpusgen"

    def schema(self) -> str:
        return "doc_id bigint, text string"

    def reader(self, schema: StructType) -> CorpusGenReader:
        return CorpusGenReader(self.options)


def register(spark) -> None:
    """Idempotent registration of the corpusgen format on a session."""
    spark.dataSource.register(CorpusGenDataSource)
