"""Driver-program entry point — ``python -m sbs_suptech_etl_v2_spark``.

The reference exposes ``python main.py worker|api`` (src/main.py:22-43)
as its operational surface; the engine's equivalent is a query runner
over the declared registry:

- ``list``                      — every registered query name
- ``run <query> [--limit N]``   — execute and print JSON lines
- ``explain <query>``           — the formatted physical plan
- ``oracle <query>``            — the DuckDB oracle SQL (audit aid)
- ``curate [--report]``         — the composed training-data curation
  plan (plans/trainprep_pipeline.py): curated corpus as JSON lines,
  or the per-drop-reason accounting with ``--report``

``--sf-dir`` defaults to $SPARK_GRAFT_SF_DIR (TESTDATA.md layout); any
directory with the same parquet table names works. Rows stream to
stdout as JSON lines (timestamps ISO-8601) — pipe-friendly, no driver
materialization beyond the requested limit.
"""

from __future__ import annotations

import argparse
import json
import sys

from sbs_suptech_etl_v2_spark.io import DEFAULT_SF_DIR


def _json_default(v):
    return v.isoformat() if hasattr(v, "isoformat") else str(v)


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="sbs_suptech_etl_v2_spark")
    sub = parser.add_subparsers(dest="cmd", required=True)
    sub.add_parser("list", help="list registered queries")
    for cmd, desc in (
        ("run", "execute a query and print JSON lines"),
        ("explain", "print the formatted physical plan"),
        ("oracle", "print the DuckDB oracle SQL"),
    ):
        p = sub.add_parser(cmd, help=desc)
        p.add_argument("query")
        if cmd != "oracle":
            p.add_argument("--sf-dir", default=DEFAULT_SF_DIR)
            p.add_argument("--cpus", default="4")
        if cmd == "run":
            p.add_argument("--limit", type=int, default=None)
    cur = sub.add_parser(
        "curate", help="run the composed training-data curation plan"
    )
    cur.add_argument("--sf-dir", default=DEFAULT_SF_DIR)
    cur.add_argument("--cpus", default="4")
    cur.add_argument("--limit", type=int, default=None)
    cur.add_argument(
        "--report",
        action="store_true",
        help="print the per-drop-reason accounting instead of the corpus",
    )
    args = parser.parse_args(argv)

    from sbs_suptech_etl_v2_spark.registry import ORACLE, QUERIES

    if args.cmd == "list":
        for name in sorted(QUERIES):
            oracle = "oracle" if name in ORACLE else "rows-only"
            print(f"{name}\t{oracle}")
        return 0

    if args.cmd != "curate" and args.query not in QUERIES:
        print(f"unknown query {args.query!r}; see `list`", file=sys.stderr)
        return 2

    if args.cmd == "oracle":
        if args.query not in ORACLE:
            print(f"{args.query} is rows-only (no oracle SQL)", file=sys.stderr)
            return 1
        print(ORACLE[args.query].strip())
        return 0

    from pyspark.sql import SparkSession

    from sbs_suptech_etl_v2_spark.session import get_spark

    # getOrCreate may hand back a session some host process owns (e.g.
    # the test harness) — only stop a session this invocation created
    preexisting = SparkSession.getActiveSession() is not None
    spark = get_spark(app_name=f"cli-{args.cmd}", master=f"local[{args.cpus}]")
    try:
        if args.cmd == "curate":
            from sbs_suptech_etl_v2_spark.plans.trainprep_pipeline import (
                curate_corpus,
                curation_report,
            )

            build = curation_report if args.report else curate_corpus
            df = build(spark, args.sf_dir)
        else:
            df = QUERIES[args.query](spark, args.sf_dir)
        if args.cmd == "explain":
            df.explain("formatted")
            return 0
        if args.limit is not None:
            df = df.limit(args.limit)
        for row in df.toLocalIterator():
            print(json.dumps(row.asDict(recursive=True), default=_json_default))
        return 0
    finally:
        if not preexisting:
            spark.stop()


if __name__ == "__main__":
    sys.exit(main())
