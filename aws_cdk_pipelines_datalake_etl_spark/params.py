"""Job parameters + path-convention parsing (SURVEY §2.5 O2-O4).

The reference marshals a flat string dict from an S3 event through
Lambda -> Step Functions -> Glue ``getResolvedOptions``
(``lib/state_machine_trigger/lambda_handler.py:64-126``,
``etl_raw_to_conformed.py:19-33``).  Here it is one dataclass built
from a raw-zone file path, with an injectable clock so the
ingest-date partition stamps (SURVEY §1.5-6) are deterministic in
tests.
"""

from __future__ import annotations

import uuid
from dataclasses import dataclass, field
from datetime import datetime, timezone
from pathlib import PurePosixPath
from urllib.parse import unquote


@dataclass(frozen=True)
class JobParams:
    """The 10-key job-parameter record (FIXTURES.md §6).

    Parity: lambda_handler.py:112-126 builds the same fields (all
    strings); ``p_year/p_month/p_day`` come from the ingest clock,
    not from the data (lambda_handler.py:93-103).
    """

    source_system_name: str  # first path segment -> target database
    table_name: str  # second path segment
    base_file_name: str
    source_path: str  # full path to the raw file
    p_year: str
    p_month: str
    p_day: str
    execution_id: str = field(default_factory=lambda: str(uuid.uuid4()))

    @property
    def target_database_name(self) -> str:
        # lambda_handler.py:115 — target db IS the source system name
        return self.source_system_name

    @property
    def partition_values(self) -> tuple[str, str, str]:
        return (self.p_year, self.p_month, self.p_day)


def parse_raw_key(key: str) -> tuple[str, str, str]:
    """Split a raw-zone relative key into (source_system, table, file).

    Parity: lambda_handler.py:64-92 — first segment is the source
    system (= target database), second the table name, basename the
    file; ``%3D`` style URL-encoding is decoded; an empty basename
    (directory marker) is rejected.
    """
    key = unquote(key)
    parts = PurePosixPath(key).parts
    if len(parts) < 3:
        raise ValueError(
            f"raw key {key!r} must be <source_system>/<table_name>/<file>"
        )
    source_system, table_name, base_file = parts[0], parts[1], parts[-1]
    if not base_file:
        raise ValueError(f"raw key {key!r} has no file component")
    return source_system, table_name, base_file


def make_job_params(
    raw_root: str,
    key: str,
    now: datetime | None = None,
    execution_id: str | None = None,
) -> JobParams:
    """Build JobParams from a file's arrival in the raw zone.

    ``now`` is the injectable ingest clock (parity:
    lambda_handler.py:93-103 uses trigger-time ``datetime.now``;
    zero-padded %Y/%m/%d strings).
    """
    ts = now or datetime.now(timezone.utc)
    source_system, table_name, base_file = parse_raw_key(key)
    kwargs = {}
    if execution_id is not None:
        kwargs["execution_id"] = execution_id
    return JobParams(
        source_system_name=source_system,
        table_name=table_name,
        base_file_name=base_file,
        source_path=f"{raw_root.rstrip('/')}/{key}",
        p_year=ts.strftime("%Y"),
        p_month=ts.strftime("%m"),
        p_day=ts.strftime("%d"),
        **kwargs,
    )
