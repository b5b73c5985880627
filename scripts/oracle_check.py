"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin
on DuckDB at sf0.01, then compares row count, column names, and the
order-insensitive multiset of values (exact for non-floats; floats
compared exactly too since both sides round — mismatches print the
max delta for debugging).

Usage: python scripts/oracle_check.py [query_name ...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("ORACLE_SF_DIR", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def dtype_kinds(df: pd.DataFrame) -> dict[str, str]:
    """Per-column dtype *kind* ('i' int, 'f' float, 'O'/'M'→'s' textual).

    The driver's canonicalizer hashes raw dtypes, so a DuckDB oracle that
    returns HUGEINT (→ pandas float64) against a Spark int64 column is a
    driver hash-red even when every value matches (round-6 lesson:
    ``lm_bigram_logprob`` / ``web_pagerank`` missing ``CAST(... AS BIGINT)``).
    We therefore compare kinds and FAIL on int-vs-float cross-kind — only
    width differences within a kind (int32/int64, float32/float64) are
    unified, matching what the driver tolerates.
    """
    kinds = {}
    for c in df.columns:
        k = df[c].dtype.kind
        kinds[c] = k if k in ("i", "u", "f", "b") else "s"
    return kinds


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]").astype(str)
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")  # unify widths WITHIN the int kind
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
    return df.sort_values(by=list(df.columns), ignore_index=True)


def main(argv: list[str] | None = None, spark=None) -> int:
    from aws_cdk_pipelines_datalake_etl_spark.session import get_spark
    from __spark_entry__ import oracle_sql, queries

    if spark is None:
        spark = get_spark(
            app_name="oracle-check", master="local[8]", shuffle_partitions=8
        )
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )

    qs, oracles = queries(), oracle_sql()
    only = set(sys.argv[1:] if argv is None else argv)
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {e}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"skip  {name}: rows-only ({len(sdf)} rows) [{time.time()-t0:.1f}s]")
            continue
        ddf = con.sql(oracles[name]).df()
        sk, dk = dtype_kinds(sdf), dtype_kinds(ddf)
        s, d = normalize(sdf), normalize(ddf)
        status = []
        if len(s) != len(d):
            status.append(f"rows {len(s)} != {len(d)}")
        if list(s.columns) != list(d.columns):
            status.append(f"cols {list(s.columns)} != {list(d.columns)}")
        else:
            kind_mismatch = [
                f"{c} spark:{sk[c]} oracle:{dk[c]}"
                for c in s.columns
                if sk[c] != dk[c] and not (sk[c] in ("i", "u") and dk[c] in ("i", "u"))
            ]
            if kind_mismatch:
                status.append(
                    "dtype-kind (driver would hash-red): " + "; ".join(kind_mismatch)
                )
        if not status:
            if not s.equals(d):
                diffs = []
                for c in s.columns:
                    if not s[c].equals(d[c]):
                        if pd.api.types.is_float_dtype(s[c]) and pd.api.types.is_float_dtype(d[c]):
                            delta = (s[c] - d[c]).abs().max()
                            diffs.append(f"{c} (max |Δ|={delta})")
                        else:
                            ex = (s[c] != d[c]).idxmax()
                            diffs.append(f"{c} (e.g. {s[c][ex]!r} vs {d[c][ex]!r})")
                status.append("values: " + "; ".join(diffs))
        if status:
            print(f"FAIL  {name}: {'; '.join(status)} [{time.time()-t0:.1f}s]")
            failures.append(name)
        else:
            print(f"ok    {name}: {len(s)} rows match [{time.time()-t0:.1f}s]")
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
