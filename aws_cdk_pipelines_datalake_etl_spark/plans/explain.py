"""Physical-plan introspection helpers.

Scale regressions usually show up in the plan long before they show
up in wall-clock: a filter that stopped reaching the parquet scan, a
broadcast that silently became a sort-merge join, a projection that
reads every column.  These helpers make those properties assertable
in tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def assert_pushed_filter(df: DataFrame, fragment: str) -> None:
    plan = formatted_plan(df)
    assert "PushedFilters" in plan, plan
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert any(fragment in ln for ln in pushed), (
        f"filter on {fragment!r} not pushed to scan:\n" + "\n".join(pushed)
    )


def assert_broadcast_join(df: DataFrame) -> None:
    plan = formatted_plan(df)
    assert "BroadcastHashJoin" in plan, plan


def assert_read_schema_only(df: DataFrame, table_fragment: str, cols: set[str]) -> None:
    """Assert the scan of the file whose path contains
    ``table_fragment`` reads exactly ``cols`` (column pruning)."""
    plan = formatted_plan(df)
    # formatted plans list scan nodes as "(N) Scan parquet" followed by
    # indented attribute lines (Location, ReadSchema, ...)
    lines = plan.splitlines()
    blocks: list[list[str]] = []
    for ln in lines:
        if "Scan parquet" in ln:
            blocks.append([ln])
        elif blocks and ln.strip() and not ln.lstrip().startswith("("):
            blocks[-1].append(ln)
        elif blocks and not ln.strip():
            blocks.append([])  # terminate current block
    for b in blocks:
        body = "\n".join(b)
        if table_fragment in body and "ReadSchema" in body:
            schema_line = next(
                ln for ln in b if ln.strip().startswith("ReadSchema")
            )
            read = {
                part.split(":")[0].strip()
                for part in schema_line.split("struct<", 1)[1].rstrip(">").split(",")
            }
            assert read == cols, f"scan reads {read}, expected {cols}"
            return
    raise AssertionError(f"no scan of {table_fragment!r} found in plan:\n{plan}")
