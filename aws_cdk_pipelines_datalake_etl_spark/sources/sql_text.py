"""Transform-SQL lookup by table-name convention (SURVEY §2.2 S3).

The reference fetches ``<prefix>/<table_name>.sql`` from its scripts
bucket (``etl_conformed_to_purposebuilt.py:181-199``); here the
convention is a ``transforms/`` directory keyed by conformed table
name (SURVEY §1.5-1 resolves the README/DynamoDB discrepancy in favor
of the code's SQL-file-per-table design).
"""

from __future__ import annotations

from pathlib import Path

DEFAULT_TRANSFORMS_DIR = Path(__file__).resolve().parents[2] / "transforms"


class TransformNotFoundError(FileNotFoundError):
    """No ``<table_name>.sql`` exists for the requested table."""


def load_transform_sql(
    table_name: str, transforms_dir: str | Path | None = None
) -> str:
    """Return the SQL text for ``table_name`` (parity: S3 fetch +
    utf-8 decode, etl_conformed_to_purposebuilt.py:181-199)."""
    base = Path(transforms_dir) if transforms_dir else DEFAULT_TRANSFORMS_DIR
    path = base / f"{table_name}.sql"
    if not path.is_file():
        raise TransformNotFoundError(
            f"no transformation SQL for table '{table_name}' at {path}"
        )
    return path.read_text(encoding="utf-8")
