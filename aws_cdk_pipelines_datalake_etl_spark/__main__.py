"""CLI for the pipeline runner — the reference's S3-event trigger as
a command (``python -m aws_cdk_pipelines_datalake_etl_spark``).

Modes:
  --file KEY     process one raw-zone key (the Lambda-per-object model)
  --scan         process every file currently in the raw zone
  --watch N      poll the raw zone N times, firing per new arrival
"""

from __future__ import annotations

import argparse
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="aws_cdk_pipelines_datalake_etl_spark",
        description="Run the raw->conformed->purpose-built pipeline over a local lake.",
    )
    p.add_argument("--lake", required=True, help="lake root (raw/ conformed/ purposebuilt/)")
    p.add_argument("--transforms", default=None, help="directory of <table>.sql transforms")
    p.add_argument("--warehouse", default=None, help="spark-warehouse dir for catalog tables")
    mode = p.add_mutually_exclusive_group(required=True)
    mode.add_argument("--file", help="one raw-zone-relative key to process")
    mode.add_argument("--scan", action="store_true", help="process all raw files once")
    mode.add_argument("--watch", type=int, metavar="POLLS", help="poll the raw zone POLLS times")
    p.add_argument("--poll-seconds", type=float, default=5.0)
    p.add_argument(
        "--ledger",
        default=None,
        help="durable processed-file ledger for --watch (skip across restarts)",
    )
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    from aws_cdk_pipelines_datalake_etl_spark import get_spark
    from aws_cdk_pipelines_datalake_etl_spark.runner import LakeLayout, PipelineRunner

    spark = get_spark(warehouse_dir=args.warehouse)
    runner = PipelineRunner(
        spark=spark,
        layout=LakeLayout(args.lake),
        transforms_dir=args.transforms,
        notifier=lambda subject, message: print(f"[{subject}] {message}"),
    )
    if args.file:
        results = [runner.on_file(args.file)]
    elif args.scan:
        results = runner.scan_raw_zone()
    else:
        results = runner.watch(
            polls=args.watch,
            poll_seconds=args.poll_seconds,
            ledger_path=args.ledger,
        )
    failed = [r for r in results if r.status != "SUCCEEDED"]
    for r in results:
        print(
            f"{r.status:9s} {r.params.source_system_name}/{r.params.table_name}"
            f" conformed={r.conformed_rows} purposebuilt={r.purposebuilt_rows}"
            + (f" error={r.error_message}" if r.error_message else "")
        )
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
