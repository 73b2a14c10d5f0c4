"""Round-12 in-session A/B harness (VERDICT r11 #10): alternate OLD and
NEW implementations of each optimized path inside ONE warm Spark
session, timing each run into the noop sink — the only measurement this
VM's ±20% cross-session drift cannot fake.

Usage: python tools/r12_ab.py <experiment> [rounds]

Experiments:
  pagerank        gate _RANKS_BROADCAST_MAX 0 (old shuffled join) vs new
  pagerank_conv   same gate, graph_pagerank_converged
  kcore           gate _KCORE_COALESCE_ROWS 1 (old: no tail coalesce) vs new
  kcore_conv      same gate, graph_kcore_converged
  rrf             OLD round-11 pipeline (inlined below, verbatim from git
                  HEAD) vs the new fused-rank registry plan
  jaccard         OLD round-11 hashed-size bounds (inlined) vs the new
                  collision-aware bounds (expected ~equal: correctness fix)
  minhash_split   construct-vs-execute split for dedup_minhash_lsh with
                  OLD per-call pandas_udf + per-band py4j unroll vs NEW
                  cached-udf + one-expr banding (construction-only claim)

OLD variants reproduce the round-11 code exactly: either by flipping the
runtime gate the new code added (broadcast/coalesce thresholds), or by
inlining the round-11 function body verbatim. Outputs one JSON line per
run; read the alternation, not the mean.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

os.environ.setdefault("SPARK_GRAFT_MAX_PARTITION_BYTES", "4m")
os.environ.setdefault("SPARK_GRAFT_OPEN_COST_BYTES", "1m")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _noop(df):
    df.write.mode("overwrite").format("noop").save()


def _warm_page_cache():
    for fname in sorted(os.listdir(SF_DIR)):
        if fname.endswith(".parquet"):
            with open(os.path.join(SF_DIR, fname), "rb") as fh:
                while fh.read(1 << 24):
                    pass


def _ab(spark, label_a, run_a, label_b, run_b, rounds=4):
    """Alternate a/b `rounds` times after one untimed warmup each."""
    run_a()
    run_b()
    out = {label_a: [], label_b: []}
    for _ in range(rounds):
        for label, run in ((label_a, run_a), (label_b, run_b)):
            t0 = time.perf_counter()
            run()
            out[label].append(round(time.perf_counter() - t0, 3))
    for label, runs in out.items():
        print(json.dumps({label: runs, "median": statistics.median(runs)}))


# --------------------------------------------------------------------------
# OLD round-11 search_hybrid_rrf (verbatim tail from git HEAD 440ca05,
# shared head built by calling into the same operators the new code uses)
# --------------------------------------------------------------------------


def old_search_hybrid_rrf(spark, sf_dir):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from hadoop_map_reduce_spark.functions.text import sanitize, tokenize
    from hadoop_map_reduce_spark.operators.caching import cache_one_slot
    from hadoop_map_reduce_spark.operators.relational import (
        exact_ranks_for,
        top_k,
    )
    from hadoop_map_reduce_spark.plans.llm_queries5 import (
        _HYBRID_TERMS,
        _RRF_K,
    )
    from hadoop_map_reduce_spark.session import load_table

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    toks = docs.select(
        "doc_id", F.explode(tokenize(sanitize(F.col("text")))).alias("term")
    ).filter(F.col("term").isin(*_HYBRID_TERMS))
    tf = toks.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )
    idf = toks.groupBy("term").agg(
        F.countDistinct("doc_id").cast("long").alias("df")
    )
    n_docs = docs.agg(F.count(F.lit(1)).alias("_ndocs"))
    lex_scored = (
        tf.join(F.broadcast(idf), "term")
        .crossJoin(F.broadcast(n_docs))
        .groupBy("doc_id")
        .agg(
            F.sum(
                F.col("tf")
                * F.floor((F.col("_ndocs") * F.lit(1e6)) / F.col("df"))
            ).cast("long").alias("score")
        )
    )
    q_e6 = F.transform(
        F.col("q_embedding"), lambda x: F.round(x * 1e6).cast("long")
    )
    e_e6 = F.transform(
        F.col("embedding"), lambda x: F.round(x * 1e6).cast("long")
    )
    qvec = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("q_embedding")
    )
    dots = (
        emb.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(qvec))
        .select(
            F.col("vec_id").alias("doc_id"),
            F.aggregate(
                F.zip_with(e_e6, q_e6, lambda a, b: a * b),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ).alias("dot"),
        )
    )
    lex_scored = cache_one_slot(lex_scored, "hybrid_rrf_lex")
    dots = cache_one_slot(dots, "hybrid_rrf_vec")

    M = 100
    lex_top = top_k(
        lex_scored, M, F.col("score").desc(), F.col("doc_id").asc()
    )
    vec_top = top_k(dots, M, F.col("dot").desc(), F.col("doc_id").asc())
    w_lex = Window.orderBy(F.col("score").desc(), F.col("doc_id").asc())
    w_vec = Window.orderBy(F.col("dot").desc(), F.col("doc_id").asc())
    lex_rank_top = cache_one_slot(
        lex_top.select(
            "doc_id", F.row_number().over(w_lex).cast("long").alias("r_lex")
        ),
        "hybrid_rrf_lex_top",
    )
    vec_rank_top = cache_one_slot(
        vec_top.select(
            "doc_id", F.row_number().over(w_vec).cast("long").alias("r_vec")
        ),
        "hybrid_rrf_vec_top",
    )
    cands = (
        lex_rank_top.select("doc_id")
        .union(vec_rank_top.select("doc_id"))
        .distinct()
    )
    lex_missing = cands.join(lex_rank_top, "doc_id", "left_anti")
    vec_missing = cands.join(vec_rank_top, "doc_id", "left_anti")
    lex_rank_extra = exact_ranks_for(
        lex_scored, lex_missing, "score", "doc_id", "r_lex"
    )
    vec_rank_extra = exact_ranks_for(
        dots, vec_missing, "dot", "doc_id", "r_vec"
    )
    lex_ranks = lex_rank_top.union(lex_rank_extra)
    vec_ranks = vec_rank_top.union(vec_rank_extra)

    fused = (
        cands.join(lex_ranks, "doc_id", "left")
        .join(vec_ranks, "doc_id", "left")
        .select(
            "doc_id",
            (
                F.coalesce(
                    F.floor(F.lit(1e6) / (F.lit(_RRF_K) + F.col("r_lex"))),
                    F.lit(0),
                )
                + F.coalesce(
                    F.floor(F.lit(1e6) / (F.lit(_RRF_K) + F.col("r_vec"))),
                    F.lit(0),
                )
            ).cast("long").alias("rrf_e6"),
            F.coalesce(F.col("r_lex"), F.lit(0)).cast("long").alias("r_lex"),
            F.coalesce(F.col("r_vec"), F.lit(0)).cast("long").alias("r_vec"),
        )
    )
    return top_k(
        fused, 20, F.col("rrf_e6").desc(), F.col("doc_id").asc()
    )


# --------------------------------------------------------------------------
# OLD round-11 ngram_jaccard_pairs_prefix (hashed-size bounds, verbatim
# from git HEAD 440ca05)
# --------------------------------------------------------------------------


def old_ngram_jaccard_pairs_prefix(df, threshold, n=3, id_col="doc_id"):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from hadoop_map_reduce_spark.operators.dedup import (
        _cache_one_slot,
        jaccard,
        with_shingles,
    )

    sh = with_shingles(df, n=n, text_col="text", id_col=id_col)
    sized = _cache_one_slot(
        sh.select(
            F.col(id_col),
            F.col("_sh"),
            F.array_distinct(
                F.transform(F.col("_sh"), lambda s: F.xxhash64(s))
            ).alias("_hs"),
        ).select(
            F.col(id_col),
            F.col("_sh"),
            F.col("_hs"),
            F.size("_hs").alias("_nh"),
        )
    )
    postings = sized.select(
        F.col(id_col), F.col("_nh"), F.explode("_hs").alias("_h")
    )
    dfreq = postings.groupBy("_h").agg(F.count(F.lit(1)).alias("_df"))
    w = Window.partitionBy(id_col).orderBy(
        F.col("_df").asc(), F.col("_h").asc()
    )
    required = F.ceil(F.lit(threshold) * F.col("_nh") - F.lit(1e-9))
    prefix_len = F.col("_nh") - required + 1
    prefix = (
        postings.join(dfreq, "_h")
        .withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= prefix_len)
        .select(id_col, "_nh", "_h", "_rk")
    )
    a, b = prefix.alias("a"), prefix.alias("b")
    sized_ok = (
        F.col("b._nh") >= F.lit(threshold) * F.col("a._nh") - F.lit(1e-9)
    ) & (
        F.col("a._nh") >= F.lit(threshold) * F.col("b._nh") - F.lit(1e-9)
    )
    _overlap_goal = F.lit(threshold / (1.0 + threshold)) * (
        F.col("_na") + F.col("_nb")
    )
    alpha = F.ceil(
        _overlap_goal - _overlap_goal * F.lit(1e-12) - F.lit(1e-9)
    )
    cands = (
        a.join(b, F.col("a._h") == F.col("b._h"))
        .filter((F.col(f"a.{id_col}") < F.col(f"b.{id_col}")) & sized_ok)
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a._nh").alias("_na"),
            F.col("b._nh").alias("_nb"),
        )
        .agg(
            F.min("a._rk").alias("_ra"),
            F.min("b._rk").alias("_rb"),
        )
        .filter(
            F.lit(1)
            + F.least(
                F.col("_na") - F.col("_ra"), F.col("_nb") - F.col("_rb")
            )
            >= alpha
        )
        .select("id_a", "id_b")
    )
    sh_a = sized.select(F.col(id_col).alias("id_a"), F.col("_sh").alias("sh_a"))
    sh_b = sized.select(F.col(id_col).alias("id_b"), F.col("_sh").alias("sh_b"))
    jac = jaccard(F.col("sh_a"), F.col("sh_b"))
    return (
        cands.join(sh_a, "id_a")
        .join(sh_b, "id_b")
        .select("id_a", "id_b", F.round(jac, 6).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


# --------------------------------------------------------------------------
# OLD round-11 containment_pairs_prefix (verbatim from git HEAD 440ca05)
# --------------------------------------------------------------------------


def old_containment_pairs_prefix(df, threshold, n=3, id_col="doc_id"):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from hadoop_map_reduce_spark.operators.dedup import (
        _cache_one_slot,
        with_shingles,
    )

    sh = with_shingles(df, n=n, text_col="text", id_col=id_col)
    sized = _cache_one_slot(
        sh.select(
            F.col(id_col),
            F.col("_sh"),
            F.array_distinct(
                F.transform(F.col("_sh"), lambda s: F.xxhash64(s))
            ).alias("_hs"),
        ).select(
            F.col(id_col),
            F.col("_sh"),
            F.size("_sh").alias("_n"),
            F.col("_hs"),
            F.size("_hs").alias("_nh"),
        )
    )
    postings = sized.select(
        F.col(id_col), F.col("_n"), F.col("_nh"),
        F.explode("_hs").alias("_h"),
    )
    dfreq = postings.groupBy("_h").agg(F.count(F.lit(1)).alias("_df"))
    w = Window.partitionBy(id_col).orderBy(
        F.col("_df").asc(), F.col("_h").asc()
    )
    required = F.ceil(F.lit(threshold) * F.col("_nh") - F.lit(1e-9))
    prefix = (
        postings.join(dfreq, "_h")
        .withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= F.col("_nh") - required + 1)
        .select(id_col, "_n", "_nh", "_h")
    )
    a, b = prefix.alias("a"), postings.alias("b")
    directed = (F.col("a._n") < F.col("b._n")) | (
        (F.col("a._n") == F.col("b._n"))
        & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
    )
    size_ok = F.col("b._nh") >= F.ceil(
        F.lit(threshold) * F.col("a._nh") - F.lit(1e-9)
    )
    cands = (
        a.join(b, F.col("a._h") == F.col("b._h"))
        .filter(
            (F.col(f"a.{id_col}") != F.col(f"b.{id_col}"))
            & directed
            & size_ok
        )
        .select(
            F.col(f"a.{id_col}").alias("id_small"),
            F.col(f"b.{id_col}").alias("id_big"),
        )
        .dropDuplicates(["id_small", "id_big"])
    )
    sh_a = sized.select(
        F.col(id_col).alias("id_small"),
        F.col("_sh").alias("sh_a"),
        F.col("_n").alias("n_small"),
    )
    sh_b = sized.select(
        F.col(id_col).alias("id_big"), F.col("_sh").alias("sh_b")
    )
    inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
    cont = inter / F.col("n_small")
    return (
        cands.join(sh_a, "id_small")
        .join(sh_b, "id_big")
        .filter(cont >= threshold)
        .select(
            "id_small",
            "id_big",
            F.col("n_small").cast("long").alias("n_small"),
            inter.cast("long").alias("n_shared"),
            F.round(cont, 6).alias("containment"),
        )
    )


def main() -> None:
    from hadoop_map_reduce_spark import get_spark
    from hadoop_map_reduce_spark.plans import REGISTRY, graph_queries

    exp = sys.argv[1]
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    spark = get_spark(app_name=f"r12-ab-{exp}")
    spark.sparkContext.setLogLevel("ERROR")
    _warm_page_cache()

    def gated(name, attr, old_value):
        fn = REGISTRY[name].fn
        default = getattr(graph_queries, attr)

        def run_old():
            setattr(graph_queries, attr, old_value)
            try:
                _noop(fn(spark, SF_DIR))
            finally:
                setattr(graph_queries, attr, default)

        def run_new():
            _noop(fn(spark, SF_DIR))

        _ab(spark, f"{name}:old", run_old, f"{name}:new", run_new, rounds)

    if exp == "pagerank":
        gated("graph_pagerank", "_RANKS_BROADCAST_MAX", 0)
    elif exp == "pagerank_conv":
        gated("graph_pagerank_converged", "_RANKS_BROADCAST_MAX", 0)
    elif exp == "kcore":
        gated("graph_kcore_bounded", "_KCORE_COALESCE_ROWS", 1)
    elif exp == "kcore_conv":
        gated("graph_kcore_converged", "_KCORE_COALESCE_ROWS", 1)
    elif exp == "rrf":
        new_fn = REGISTRY["search_hybrid_rrf"].fn
        _ab(
            spark,
            "rrf:old",
            lambda: _noop(old_search_hybrid_rrf(spark, SF_DIR)),
            "rrf:new",
            lambda: _noop(new_fn(spark, SF_DIR)),
            rounds,
        )
    elif exp == "jaccard":
        from hadoop_map_reduce_spark.operators.dedup import (
            ngram_jaccard_pairs_prefix,
        )
        from hadoop_map_reduce_spark.session import load_table

        docs = load_table(spark, SF_DIR, "documents")
        _ab(
            spark,
            "jaccard:old",
            lambda: _noop(old_ngram_jaccard_pairs_prefix(docs, 0.5)),
            "jaccard:new",
            lambda: _noop(ngram_jaccard_pairs_prefix(docs, 0.5)),
            rounds,
        )
    elif exp == "containment":
        from hadoop_map_reduce_spark.operators.dedup import (
            containment_pairs_prefix,
        )
        from hadoop_map_reduce_spark.session import load_table

        docs = load_table(spark, SF_DIR, "documents")
        _ab(
            spark,
            "containment:old",
            lambda: _noop(old_containment_pairs_prefix(docs, 0.7)),
            "containment:new",
            lambda: _noop(containment_pairs_prefix(docs, 0.7)),
            rounds,
        )
    elif exp == "minhash_split":
        # Construction-only claim: time fn() plan building alternated
        # between the old per-call pandas_udf + per-band Column unroll
        # and the new cached-udf + one-expr banding. Execution plans are
        # identical (parity pinned by tests), so only construct is A/B'd.
        from pyspark.sql import functions as F

        from hadoop_map_reduce_spark.operators import dedup

        fn = REGISTRY["dedup_minhash_lsh"].fn

        def old_band_expr(bands, rows_per_band):
            return F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.xxhash64(
                            F.slice(
                                F.col("_sig"),
                                i * rows_per_band + 1,
                                rows_per_band,
                            )
                        ).alias("bhash"),
                    )
                    for i in range(bands)
                ]
            )

        def old_sig_udf(num_hashes, seed):
            # the round-11 shape: a FRESH pandas_udf wrap per invocation
            dedup._SIG_UDF_CACHE.clear()
            return dedup._sig_udf(num_hashes, seed)

        def run_old():
            dedup._SIG_UDF_CACHE.clear()
            old_expr, dedup._band_array_expr = (
                dedup._band_array_expr,
                old_band_expr,
            )
            try:
                t0 = time.perf_counter()
                fn(spark, SF_DIR)
                print(
                    json.dumps(
                        {"construct:old": round(time.perf_counter() - t0, 3)}
                    )
                )
            finally:
                dedup._band_array_expr = old_expr

        def run_new():
            t0 = time.perf_counter()
            fn(spark, SF_DIR)
            print(
                json.dumps(
                    {"construct:new": round(time.perf_counter() - t0, 3)}
                )
            )

        run_old()
        run_new()
        for _ in range(rounds):
            run_old()
            run_new()
    else:
        raise SystemExit(f"unknown experiment {exp!r}")
    spark.stop()


if __name__ == "__main__":
    main()
