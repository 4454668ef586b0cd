"""CLI entry point: run registered queries or list the catalog.

Usage (the command-line face of the api.py handlers — same registry,
same transport-free core):

    python -m real_value_etl_spark list
    python -m real_value_etl_spark run q1_pricing_summary \
        --sf-dir /root/testdata/sf0.01 --limit 20 [--json]
    python -m real_value_etl_spark explain dedup_jaccard_prefix \
        --sf-dir /root/testdata/sf0.01

`run` prints the rows (default: Spark's .show table; --json: one JSON
object per row). `explain` prints the formatted physical plan — the
inspection loop this repo's plan tests are built on, exposed to users.
"""

from __future__ import annotations

import argparse
import json
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="real_value_etl_spark")
    sub = p.add_subparsers(dest="cmd", required=True)
    sub.add_parser("list", help="list registered queries")
    for cmd, hlp in (
        ("run", "run a query and print rows"),
        ("explain", "print a query's physical plan"),
    ):
        c = sub.add_parser(cmd, help=hlp)
        c.add_argument("name")
        c.add_argument("--sf-dir", default="/root/testdata/sf0.01")
        if cmd == "run":
            c.add_argument("--limit", type=int, default=20)
            c.add_argument("--json", action="store_true")
    return p


def main(argv: list[str] | None = None, spark=None) -> int:
    args = build_parser().parse_args(argv)

    if args.cmd == "list":
        from .api import handle_list_queries

        for q in handle_list_queries()["queries"]:
            oracle = "oracle" if q["has_oracle"] else "rows-only"
            print(f"{q['name']:40s} [{oracle}] {','.join(q['tags'])}")
        return 0

    if spark is None:
        from .session import get_spark

        spark = get_spark(app_name=f"rve-cli-{args.cmd}")

    if args.cmd == "explain":
        from .queries import all_queries  # noqa: F401
        from .queries.registry import REGISTRY

        spec = REGISTRY.get(args.name)
        if spec is None:
            print(f"unknown query: {args.name}", file=sys.stderr)
            return 2
        spec.fn(spark, args.sf_dir).explain("formatted")
        return 0

    # run
    from .api import handle_run_query

    out = handle_run_query(spark, args.name, args.sf_dir, limit=args.limit)
    if out["status"] != "success":
        print(out["error"], file=sys.stderr)
        return 2
    if args.json:
        for row in out["rows"]:
            print(json.dumps(row, default=str))
    else:
        cols = [c["name"] for c in out["schema"]]
        print("\t".join(cols))
        for row in out["rows"]:
            print("\t".join(str(row[c]) for c in cols))
    return 0


if __name__ == "__main__":
    sys.exit(main())
