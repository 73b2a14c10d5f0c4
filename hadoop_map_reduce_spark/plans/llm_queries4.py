"""Round-2 additions, batch 9 (text statistics): windowed token
co-occurrence association (lift).

Reference scope note: the reference engine counts adjacent bigrams
(WordCountV2.java:81-95); this generalizes to a ±2-token co-occurrence
window with an association strength (lift = p(x,y)/(p(x)p(y))) kept
engine-exact as an integer-rational-in-double with identical operation
order on both engines (products stay below 2^53 at these corpus sizes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hadoop_map_reduce_spark.functions.text import sanitize, tokenize
from hadoop_map_reduce_spark.operators.relational import top_k
from hadoop_map_reduce_spark.plans.llm_queries import _TOKS
from hadoop_map_reduce_spark.plans.registry import register
from hadoop_map_reduce_spark.session import load_table


@register(
    "token_lift_pairs",
    tags=("llm", "text", "aggregation"),
    description=(
        "Top-100 token associations by lift over a ±2-token window: "
        "pair slots from two lead windows (no self-join), unordered "
        "canonical pairs, lift = n_xy·N²/(P·n_x·n_y) floor-scaled to "
        "ppm; ties broken (lift DESC, tok_a, tok_b). Pairs with "
        "n_xy >= 5 rank."
    ),
    oracle=f"""
        WITH toks AS (
            SELECT doc_id,
                   unnest(arr) AS tok,
                   unnest(generate_series(1, len(arr))) AS pos
            FROM (SELECT doc_id, {_TOKS} AS arr FROM documents)
        ), led AS (
            SELECT tok,
                   LEAD(tok, 1) OVER (PARTITION BY doc_id ORDER BY pos)
                       AS t1,
                   LEAD(tok, 2) OVER (PARTITION BY doc_id ORDER BY pos)
                       AS t2
            FROM toks
        ), slots AS (
            SELECT LEAST(tok, t1) AS tok_a, GREATEST(tok, t1) AS tok_b
            FROM led WHERE t1 IS NOT NULL
            UNION ALL
            SELECT LEAST(tok, t2), GREATEST(tok, t2)
            FROM led WHERE t2 IS NOT NULL
        ), pair_counts AS (
            SELECT tok_a, tok_b, COUNT(*) AS n_xy
            FROM slots GROUP BY 1, 2
        ), uni AS (
            SELECT tok, COUNT(*) AS n_x FROM toks GROUP BY 1
        ), scored AS (
            SELECT p.tok_a, p.tok_b, p.n_xy,
                   CAST(FLOOR(
                       1e6 * ((CAST(p.n_xy AS DOUBLE)
                               * (SELECT COUNT(*) FROM toks)
                               * (SELECT COUNT(*) FROM toks))
                              / ((SELECT COUNT(*) FROM slots)
                                 * ua.n_x * ub.n_x))
                   ) AS BIGINT) AS lift_ppm
            FROM pair_counts p
            JOIN uni ua ON ua.tok = p.tok_a
            JOIN uni ub ON ub.tok = p.tok_b
            WHERE p.n_xy >= 5
        )
        SELECT tok_a, tok_b, n_xy, lift_ppm,
               CAST(rk AS BIGINT) AS rk
        FROM (
            SELECT *, ROW_NUMBER() OVER (
                ORDER BY lift_ppm DESC, tok_a, tok_b) AS rk
            FROM scored
        ) WHERE rk <= 100
    """,
)
def token_lift_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plan shape: posexplode → one doc-keyed window (two leads share
    it) → pair-slot explode → (pair) count; unigram counts and the two
    scalar totals ride broadcast joins. The global top-100 is a
    TakeOrderedAndProject (per-partition heaps + k-row merge, fully
    parallel — no single-partition sort of the pair table, which is
    corpus-sized at scale); row_number then ranks only the 100
    survivors."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.posexplode(tokenize(sanitize(F.col("text")))).alias("pos", "tok"),
    )
    by_doc = Window.partitionBy("doc_id").orderBy("pos")
    led = toks.select(
        "tok",
        F.lead("tok", 1).over(by_doc).alias("t1"),
        F.lead("tok", 2).over(by_doc).alias("t2"),
    )
    slots = (
        led.select(
            F.explode(F.array("t1", "t2")).alias("other"), F.col("tok")
        )
        .filter(F.col("other").isNotNull())
        .select(
            F.least("tok", "other").alias("tok_a"),
            F.greatest("tok", "other").alias("tok_b"),
        )
    )
    pair_counts = (
        slots.groupBy("tok_a", "tok_b")
        .agg(F.count(F.lit(1)).alias("n_xy"))
        .filter(F.col("n_xy") >= 5)
    )
    uni = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("n_x"))
    n_toks = toks.agg(F.count(F.lit(1)).alias("_n"))
    n_slots = slots.agg(F.count(F.lit(1)).alias("_p"))
    scored = (
        pair_counts.join(
            F.broadcast(uni.select(F.col("tok").alias("tok_a"),
                                   F.col("n_x").alias("_na"))),
            "tok_a",
        )
        .join(
            F.broadcast(uni.select(F.col("tok").alias("tok_b"),
                                   F.col("n_x").alias("_nb"))),
            "tok_b",
        )
        .crossJoin(F.broadcast(n_toks))
        .crossJoin(F.broadcast(n_slots))
        .select(
            "tok_a",
            "tok_b",
            "n_xy",
            F.floor(
                F.lit(1e6)
                * (
                    (F.col("n_xy").cast("double") * F.col("_n") * F.col("_n"))
                    / (F.col("_p") * F.col("_na") * F.col("_nb"))
                )
            )
            .cast("long")
            .alias("lift_ppm"),
        )
    )
    # Scale-safe global top-k: orderBy().limit() plans as a fully
    # parallel TakeOrderedAndProject (per-partition heaps, k-row merge);
    # the row_number window then runs over the 100 survivors only — its
    # Exchange SinglePartition input is constant-bounded by the limit.
    # The (lift DESC, tok_a, tok_b) order is total (pairs unique after
    # the groupBy), so top-100-then-rank is identical to the former
    # global row_number + filter(rk<=100) over the whole pair table.
    top = top_k(
        scored,
        100,
        F.col("lift_ppm").desc(),
        F.col("tok_a").asc(),
        F.col("tok_b").asc(),
    )
    rk = Window.orderBy(
        F.col("lift_ppm").desc(), F.col("tok_a").asc(), F.col("tok_b").asc()
    )
    return top.withColumn("rk", F.row_number().over(rk).cast("long"))


_QUERY_TERMS = ("join", "filter", "window")


@register(
    "search_rank_docs",
    tags=("llm", "text", "topk"),
    description=(
        "Ranked retrieval: top-20 documents for the fixed query "
        "{join, filter, window} scored sum(tf x idf) with the integer "
        "idf surrogate floor(N*1e6/df) (tfidf_top_terms discipline — "
        "no floating-point logarithms), ties (score DESC, doc_id ASC)."
    ),
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, unnest({_TOKS}) AS term FROM documents
        ), tf AS (
            SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
            FROM toks WHERE term IN ('join', 'filter', 'window')
            GROUP BY 1, 2
        ), df AS (
            SELECT term, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
            FROM toks WHERE term IN ('join', 'filter', 'window')
            GROUP BY 1
        ), scored AS (
            SELECT tf.doc_id,
                   CAST(SUM(tf.tf * FLOOR(
                       ((SELECT COUNT(*) FROM documents) * 1e6) / df.df
                   )) AS BIGINT) AS score,
                   CAST(COUNT(*) AS BIGINT) AS n_terms_hit
            FROM tf JOIN df ON df.term = tf.term
            GROUP BY 1
        )
        SELECT doc_id, score, n_terms_hit, CAST(rk AS BIGINT) AS rk
        FROM (
            SELECT *, ROW_NUMBER() OVER (
                ORDER BY score DESC, doc_id ASC) AS rk
            FROM scored
        ) WHERE rk <= 20
    """,
)
def search_rank_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plan shape: the token explode filters to the 3 query terms BEFORE
    any shuffle (term pruning at the scan side), tf and df aggregate the
    tiny filtered stream, df and the doc count broadcast. The global
    top-20 is a TakeOrderedAndProject over the hit-doc table (which is
    corpus-sized at 100 TB — the 3 terms are common words); row_number
    ranks only the 20 survivors, so no single-partition sort touches a
    corpus-sized input."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(tokenize(sanitize(F.col("text")))).alias("term")
    ).filter(F.col("term").isin(*_QUERY_TERMS))
    tf = toks.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )
    df_ = toks.groupBy("term").agg(
        F.countDistinct("doc_id").cast("long").alias("df")
    )
    n_docs = docs.agg(F.count(F.lit(1)).alias("_n"))
    scored = (
        tf.join(F.broadcast(df_), "term")
        .crossJoin(F.broadcast(n_docs))
        .groupBy("doc_id")
        .agg(
            F.sum(
                F.col("tf")
                * F.floor((F.col("_n") * F.lit(1e6)) / F.col("df"))
            )
            .cast("long")
            .alias("score"),
            F.count(F.lit(1)).cast("long").alias("n_terms_hit"),
        )
    )
    # (score DESC, doc_id ASC) is a total order (doc_id unique after
    # the groupBy), so top-20-then-rank ≡ global row_number+filter.
    top = top_k(scored, 20, F.col("score").desc(), F.col("doc_id").asc())
    rk = Window.orderBy(F.col("score").desc(), F.col("doc_id").asc())
    return top.withColumn("rk", F.row_number().over(rk).cast("long"))
