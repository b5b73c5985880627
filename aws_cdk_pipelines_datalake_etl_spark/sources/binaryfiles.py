"""Raw-blob directory ingest: Spark's built-in ``binaryFile`` source
as the front door for multimodal corpora.

A real multimodal lake stores blobs in parquet ``binary`` columns
(splittable, column-prunable, co-located with metadata) — but the
*ingest edge* is a directory of raw files (crawl dumps, camera
uploads).  ``read_binary_dir`` is that edge: the built-in
``binaryFile`` format yields ``(path, modificationTime, length,
content)`` rows, distributed across executors, with a pushed
``pathGlobFilter`` so non-matching files are never opened.

Scale notes: ``binaryFile`` has per-FILE task overhead (one row per
file, no intra-file splitting) — right for the one-time ingest hop,
wrong as the steady state.  The companion ``write_blobs_dir`` goes
the other way (blob column -> files) and runs INSIDE executors via
``mapInPandas`` — each task writes its own partition's files, no
driver collect, which is also what makes it an honest 100 TB exporter.

``spark.sql.files.maxPartitionBytes`` / ``openCostInBytes`` govern the
file->task packing exactly as for parquet scans.

The reference ingests CSV only (etl_raw_to_conformed.py:1); Tier-E
multimodal surface.
"""

from __future__ import annotations

import os
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_binary_dir(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
    id_from_name: bool = True,
) -> DataFrame:
    """Read a directory of raw files as ``(doc_id?, file_name, length,
    content)`` rows.

    ``glob`` (e.g. ``*.png``) becomes ``pathGlobFilter`` — applied at
    file-listing time, so filtered files cost nothing.  With
    ``id_from_name`` the numeric run in the basename (our exporter
    writes ``<id>.<ext>``) is parsed back into a ``doc_id`` column —
    round-tripping the id through the filename keeps blob identity
    without a manifest file.
    """
    reader = spark.read.format("binaryFile")
    if glob is not None:
        reader = reader.option("pathGlobFilter", glob)
    d = reader.load(path).select(
        F.element_at(F.split(F.col("path"), "/"), -1).alias("file_name"),
        F.col("length"),
        F.col("content"),
    )
    if id_from_name:
        d = d.select(
            F.regexp_extract("file_name", r"(\d+)", 1).cast("bigint").alias("doc_id"),
            "file_name",
            "length",
            "content",
        )
    return d


def write_blobs_dir(
    df: DataFrame,
    out_dir: str,
    id_col: str = "doc_id",
    blob_col: str = "blob",
    ext: str = "bin",
) -> DataFrame:
    """Export a blob column to ``<out_dir>/<id>.<ext>`` files —
    executor-side (``mapInPandas``): every task writes the files of
    its own partition, so the export parallelizes with the data and
    the driver never sees a byte.  Returns one row per written file
    ``(doc_id, file_name, n_bytes)``; the write happens when that
    result is consumed (action-at-sink, like any Spark write).

    ``out_dir`` must be a shared filesystem on a real cluster (DFS /
    fuse mount) — same contract as any Spark output path.
    """
    schema = "doc_id bigint, file_name string, n_bytes bigint"
    os.makedirs(out_dir, exist_ok=True)

    def write_part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            names, sizes = [], []
            for i, blob in zip(pdf[id_col], pdf[blob_col]):
                name = f"{int(i)}.{ext}"
                data = bytes(blob)
                with open(os.path.join(out_dir, name), "wb") as f:
                    f.write(data)
                names.append(name)
                sizes.append(len(data))
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "file_name": names,
                    "n_bytes": sizes,
                }
            )

    return df.select(id_col, blob_col).mapInPandas(write_part, schema)
