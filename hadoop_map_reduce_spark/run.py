"""CLI query runner: ``python -m hadoop_map_reduce_spark.run <query>
[sf_dir] [--explain] [--limit N]``.

Runs any registry query against an sf directory (default
``$SPARK_GRAFT_SF_DIR`` or sf0.1) and prints the rows (tab-separated,
column header first) or, with ``--explain``, the formatted physical plan
instead. ``list`` prints every registered query name with its one-line
description. ``sql "<statement>"`` runs an ad-hoc Spark SQL statement
with every synthetic table pre-registered as a view — the free-form SQL
front door next to the named-query registry. Complements ``compat.main``
(the reference's drop-in CLI): this is the front door to everything the
engine added beyond the reference.
"""

from __future__ import annotations

import argparse
import os
import sys

_SF_DEFAULT = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _emit(df, explain: bool, limit: int) -> int:
    """Shared output path for both CLI modes: plan or header + rows."""
    if explain:
        df.explain("formatted")
        return 0
    print("\t".join(df.columns))
    for row in df.limit(limit).collect():
        print("\t".join("" if v is None else str(v) for v in row))
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("query", help="registry query name, 'list', or 'sql'")
    p.add_argument(
        "statement",
        nargs="?",
        default=None,
        help="SQL text (only with the 'sql' subcommand)",
    )
    p.add_argument("sf_dir", nargs="?", default=None)
    p.add_argument("--explain", action="store_true", help="print the plan")
    p.add_argument("--limit", type=int, default=20, help="max rows printed")
    args = p.parse_args(argv)
    # `statement` only means SQL text under the 'sql' subcommand; for a
    # named query the second positional is the sf directory as before —
    # and a third positional is the error it always was.
    if args.query != "sql":
        if args.statement is not None and args.sf_dir is not None:
            p.error(f"unrecognized argument: {args.sf_dir}")
        if args.statement is not None:
            args.sf_dir = args.statement
    if args.sf_dir is None:
        args.sf_dir = _SF_DEFAULT

    from hadoop_map_reduce_spark.plans import REGISTRY

    if args.query == "sql":
        if not args.statement:
            print("usage: run sql \"<statement>\" [sf_dir]", file=sys.stderr)
            return 2
        from hadoop_map_reduce_spark.session import get_spark, register_views

        spark = get_spark(app_name="run:sql")
        register_views(spark, args.sf_dir)
        return _emit(spark.sql(args.statement), args.explain, args.limit)

    if args.query == "list":
        for name, q in REGISTRY.items():
            oracle = "oracled" if q.oracle else "rows-only"
            print(f"{name}\t[{oracle}]\t{q.description.strip()}")
        return 0

    if args.query not in REGISTRY:
        print(f"unknown query: {args.query} (try 'list')", file=sys.stderr)
        return 2

    from hadoop_map_reduce_spark.session import get_spark

    spark = get_spark(app_name=f"run:{args.query}")
    return _emit(
        REGISTRY[args.query].fn(spark, args.sf_dir), args.explain, args.limit
    )


if __name__ == "__main__":
    raise SystemExit(main())
