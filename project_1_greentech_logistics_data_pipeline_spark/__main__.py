"""CLI entry point: run any declared query by name against a testdata dir.

    python -m project_1_greentech_logistics_data_pipeline_spark list
    python -m project_1_greentech_logistics_data_pipeline_spark run q01_pricing_summary
    python -m project_1_greentech_logistics_data_pipeline_spark run q44_ngram_jaccard_neardup \
        --sf-dir /root/testdata/sf0.01 --limit 20 --explain

`list` prints every query name with an [oracle]/[rows-only] marker; `run`
executes one query and prints up to --limit rows (plus the formatted
physical plan with --explain). Exit code 2 on unknown query names.
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="project_1_greentech_logistics_data_pipeline_spark")
    sub = parser.add_subparsers(dest="cmd", required=True)
    sub.add_parser("list", help="list declared queries")
    runp = sub.add_parser("run", help="run one query by name")
    runp.add_argument("name")
    runp.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    runp.add_argument("--limit", type=int, default=20)
    runp.add_argument("--explain", action="store_true")
    args = parser.parse_args(argv)

    from . import registry

    queries = registry.queries()
    oracles = registry.oracle_sql()

    if args.cmd == "list":
        for name in queries:
            marker = "oracle" if name in oracles else "rows-only"
            print(f"{name}  [{marker}]")
        return 0

    if args.name not in queries:
        print(f"unknown query: {args.name!r} (see `list`)", file=sys.stderr)
        return 2

    from .session import get_spark

    spark = get_spark("p1gl-cli")
    df = queries[args.name](spark, args.sf_dir)
    if args.explain:
        df.explain("formatted")
    df.show(args.limit, truncate=False)
    print(f"({df.count()} rows total)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
