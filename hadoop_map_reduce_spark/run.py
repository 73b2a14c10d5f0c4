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

``index`` (round-11, VERDICT r10 #7) drives the persisted ANN index
end-to-end without writing Python::

    run index build  <index_dir> [sf_dir] [--n-cells N] [--metadata-cols label] [--where SQL]
    run index append <index_dir> [sf_dir] --where SQL
    run index search <index_dir> [sf_dir] [--k K] [--n-probe P] [--refine R] [--filter SQL]
    run index vacuum <index_dir> [--keep N]
    run index status <index_dir>

The corpus is the ``embeddings`` table of ``sf_dir``; ``--where`` is a
SQL predicate selecting which corpus rows to encode, ``--filter`` a SQL
predicate over the STORED metadata columns restricting search results
(the metadata-filtered serve path).
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


def _index_main(argv: list[str]) -> int:
    """The persisted-index lifecycle as CLI verbs (build / append /
    search / vacuum) — thin wrappers over ``operators.ann_index``; all
    the commit/claim/pointer discipline lives there."""
    p = argparse.ArgumentParser(prog="run index", description="persisted ANN index lifecycle")
    p.add_argument(
        "verb", choices=["build", "append", "search", "vacuum", "status"]
    )
    p.add_argument("index_dir")
    p.add_argument("sf_dir", nargs="?", default=_SF_DEFAULT)
    p.add_argument("--n-cells", type=int, default=None, help="coarse cells (default: auto, cells ∝ corpus)")
    p.add_argument("--m", type=int, default=8, help="PQ subspaces")
    p.add_argument("--ksub", type=int, default=16, help="codes per subspace")
    p.add_argument("--metadata-cols", default="", help="comma-separated corpus columns stored beside the codes (filterable at search)")
    p.add_argument("--where", default=None, help="SQL predicate choosing corpus rows (build/append)")
    p.add_argument("--filter", dest="filter_sql", default=None, help="SQL predicate over stored metadata (search)")
    p.add_argument("--strategy", choices=["pre", "post"], default="pre")
    p.add_argument("--k", type=int, default=5)
    p.add_argument("--n-probe", type=int, default=4)
    p.add_argument("--refine", type=int, default=8)
    p.add_argument("--queries", default="vec_id < 10", help="SQL predicate choosing query rows (search)")
    p.add_argument("--keep", type=int, default=2, help="versions retained by vacuum")
    p.add_argument("--limit", type=int, default=20, help="max rows printed (search)")
    a = p.parse_args(argv)

    from pyspark.sql import functions as F

    from hadoop_map_reduce_spark.operators import ann_index
    from hadoop_map_reduce_spark.session import get_spark, load_table

    if a.verb == "vacuum":
        removed = ann_index.ann_index_vacuum(a.index_dir, keep=a.keep)
        print(f"removed\t{','.join(map(str, removed)) or '-'}")
        return 0
    if a.verb == "status":
        from hadoop_map_reduce_spark.streaming import cdc_sink

        codes_dir = os.path.join(a.index_dir, "codes")
        with open(os.path.join(codes_dir, cdc_sink.POINTER)) as fh:
            current = fh.read().strip()
        meta = ann_index.ann_index_meta(a.index_dir)
        print(
            "current=%s\tversions=%s\tn_cells=%d\tm=%d\tksub=%d\t"
            "metadata=%s"
            % (
                current,
                ",".join(map(str, cdc_sink.list_versions(codes_dir))),
                meta["n_cells"],
                meta["m"],
                meta["ksub"],
                ",".join(meta.get("metadata_cols", [])) or "-",
            )
        )
        return 0

    spark = get_spark(app_name=f"run:index-{a.verb}")
    corpus = load_table(spark, a.sf_dir, "embeddings")
    if a.verb == "build":
        subset = corpus.filter(F.expr(a.where)) if a.where else corpus
        meta = ann_index.ann_index_build(
            subset,
            a.index_dir,
            n_cells=a.n_cells,
            m=a.m,
            ksub=a.ksub,
            metadata_cols=tuple(
                c for c in a.metadata_cols.split(",") if c
            ),
        )
        print(
            "built\tn_cells=%d\tm=%d\tksub=%d\tmetadata=%s"
            % (
                meta["n_cells"],
                meta["m"],
                meta["ksub"],
                ",".join(meta["metadata_cols"]) or "-",
            )
        )
        return 0
    if a.verb == "append":
        if not a.where:
            print("append needs --where to choose the batch", file=sys.stderr)
            return 2
        version = ann_index.ann_index_append(
            spark, a.index_dir, corpus.filter(F.expr(a.where))
        )
        print(f"appended\tversion={version}")
        return 0
    queries = corpus.filter(F.expr(a.queries)).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    result = ann_index.ann_index_search(
        spark,
        a.index_dir,
        corpus,
        queries,
        k=a.k,
        n_probe=a.n_probe,
        refine=a.refine,
        predicate=F.expr(a.filter_sql) if a.filter_sql else None,
        strategy=a.strategy,
    )
    return _emit(result, explain=False, limit=a.limit)


def main(argv: list[str] | None = None) -> int:
    if argv is None:
        argv = sys.argv[1:]
    if argv and argv[0] == "index":
        return _index_main(argv[1:])
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
