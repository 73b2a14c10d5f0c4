"""Round-3 additions, batch 5 of the LLM-pipeline surface: asymmetric
containment dedup (quote/subset duplicates that symmetric Jaccard
misses), hybrid lexical+vector retrieval with reciprocal-rank fusion,
int8 embedding quantization (the storage/bandwidth lever for 100-TB
vector corpora), a k-anonymity privacy audit, and BPE tokenizer
APPLICATION (closing the train→apply loop of ``bpe_train_merges``).

Reference scope note: the reference engine (a 3-file Hadoop MapReduce
job, SURVEY.md §0) has none of these; they extend the training-data
curation surface (SURVEY.md §7.1). Float discipline throughout:
integer-scaled scores (floor/round to BIGINT) on both engines, never
floating-point accumulation in compared columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hadoop_map_reduce_spark.functions.text import sanitize, tokenize
from hadoop_map_reduce_spark.operators.caching import cache_one_slot
from hadoop_map_reduce_spark.operators.relational import (
    exact_ranks_for,
    top_k,
)
from hadoop_map_reduce_spark.plans.llm_queries import _SHINGLES, _TOKS
from hadoop_map_reduce_spark.plans.registry import register
from hadoop_map_reduce_spark.session import load_table


@register(
    "dedup_containment",
    tags=("llm", "dedup"),
    headline=True,
    description=(
        "Asymmetric containment dedup: directed pairs where >= 70% of "
        "the smaller document's trigram shingles appear in the larger "
        "one (C(A->B) = |A∩B|/|A|). Catches quotes / subset duplicates "
        "that symmetric Jaccard misses when sizes differ: J(A,B) <= "
        "|A|/|B| can sit far below any Jaccard threshold while A is "
        "wholly contained in B."
    ),
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, {_TOKS} AS t FROM documents
        ), sh AS (
            SELECT doc_id, {_SHINGLES} AS s FROM toks WHERE len(t) >= 3
        )
        SELECT a.doc_id AS id_small, b.doc_id AS id_big,
               CAST(len(a.s) AS BIGINT) AS n_small,
               CAST(len(list_intersect(a.s, b.s)) AS BIGINT) AS n_shared,
               ROUND(len(list_intersect(a.s, b.s)) * 1.0 / len(a.s), 6)
                   AS containment
        FROM sh a JOIN sh b
          ON a.doc_id <> b.doc_id
         AND (len(a.s) < len(b.s)
              OR (len(a.s) = len(b.s) AND a.doc_id < b.doc_id))
        WHERE len(list_intersect(a.s, b.s)) * 1.0 / len(a.s) >= 0.7
    """,
)
def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered plan: the asymmetric-prefix formulation
    (operators/dedup.py:containment_pairs_prefix) — the jaccard
    precedent of registering the scale-right variant. The prefix bound
    is ONE-SIDED for containment: the contained side emits only its
    |A|-ceil(t·|A|)+1 rarest shingles (hot shingles become suffix and
    stop being join keys, killing the Σ df² term), the container side
    emits all postings pruned by |B| >= ceil(t·|A|), and the exact
    array-intersect verify restores exactness. Bit-identical to the
    plain postings-count twin (parity test-pinned; 3.0 s vs 2.5 s warm
    at sf0.1, and the plain twin needs a one-slot cache to avoid
    Catalyst re-inlining the regex pipeline per join side — 26 regex
    copies, 44 s — a lesson recorded in BASELINE.md)."""
    from hadoop_map_reduce_spark.operators.dedup import (
        containment_pairs_prefix,
    )

    return containment_pairs_prefix(
        load_table(spark, sf_dir, "documents"), threshold=0.7
    )


_RRF_K = 60
_HYBRID_TERMS = ("join", "filter", "window")


@register(
    "search_hybrid_rrf",
    tags=("llm", "similarity", "topk"),
    headline=True,
    description=(
        "Hybrid retrieval with reciprocal-rank fusion: a lexical "
        "tf-idf ranking (search_rank_docs scoring) and a vector "
        "ranking (exact integer inner product against the query "
        "embedding, vectors quantized to round(x*1e6) BIGINT) are "
        "fused as floor(1e6/(60+rank)) per list (0 when unranked), "
        "top-20 by fused score. All compared columns integer — no "
        "float accumulation crosses an engine boundary."
    ),
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, unnest({_TOKS}) AS term FROM documents
        ), tf AS (
            SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
            FROM toks WHERE term IN ('join', 'filter', 'window')
            GROUP BY 1, 2
        ), idf AS (
            SELECT term, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
            FROM toks WHERE term IN ('join', 'filter', 'window')
            GROUP BY 1
        ), lex AS (
            SELECT doc_id, ROW_NUMBER() OVER (ORDER BY score DESC, doc_id)
                       AS r_lex
            FROM (
                SELECT tf.doc_id,
                       CAST(SUM(tf.tf * FLOOR(
                           ((SELECT COUNT(*) FROM documents) * 1e6) / idf.df
                       )) AS BIGINT) AS score
                FROM tf JOIN idf ON idf.term = tf.term
                GROUP BY 1
            )
        ), dots AS (
            SELECT e.vec_id AS doc_id,
                   CAST(SUM(CAST(ROUND(ev * 1e6) AS BIGINT)
                            * CAST(ROUND(qv * 1e6) AS BIGINT)) AS BIGINT)
                       AS dot
            FROM (
                SELECT e.vec_id, unnest(e.embedding) AS ev,
                       unnest(q.embedding) AS qv
                FROM embeddings e,
                     (SELECT embedding FROM embeddings WHERE vec_id = 0) q
                WHERE e.vec_id <> 0
            ) e
            GROUP BY 1
        ), vec AS (
            SELECT doc_id,
                   ROW_NUMBER() OVER (ORDER BY dot DESC, doc_id) AS r_vec
            FROM dots
        ), fused AS (
            SELECT COALESCE(l.doc_id, v.doc_id) AS doc_id,
                   CAST(COALESCE(FLOOR(1e6 / ({_RRF_K} + l.r_lex)), 0)
                        + COALESCE(FLOOR(1e6 / ({_RRF_K} + v.r_vec)), 0)
                        AS BIGINT) AS rrf_e6,
                   CAST(COALESCE(l.r_lex, 0) AS BIGINT) AS r_lex,
                   CAST(COALESCE(v.r_vec, 0) AS BIGINT) AS r_vec
            FROM lex l FULL OUTER JOIN vec v ON v.doc_id = l.doc_id
        )
        SELECT doc_id, rrf_e6, r_lex, r_vec
        FROM (
            SELECT *, ROW_NUMBER() OVER (
                ORDER BY rrf_e6 DESC, doc_id) AS rk
            FROM fused
        ) WHERE rk <= 20
    """,
)
def search_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plan shape: the lexical side prunes to the 3 query terms before
    any shuffle and ranks only hit docs; the vector side quantizes each
    embedding to BIGINTs (exact: |x|<~6, so round(x*1e6) products stay
    under 2^53 across 64 dims) and folds the inner product as a pure
    Column expression against the broadcast query vector — one scan, no
    Python. Global row_number windows are the bounded verify form; at
    corpus scale both sides become per-partition TakeOrdered top-k
    (operators/relational.top_k) and fusion joins two k-row tables.
    vec_id 0 doubles as the query document (deterministic, no RNG);
    docs are ranked against it, itself excluded.

    Scale-safe ranking (round 4): neither side sorts its corpus-sized
    scored table on one task. Each side takes top-M (M=100) via
    TakeOrderedAndProject; the final top-20 set is provably inside the
    union of the two top-100s — a doc outside both has
    rrf <= 2*floor(1e6/161) = 12422 < floor(1e6/80) = 12500, and
    whichever side holds >100 docs supplies >=20 docs at >=12500.
    Winners' EXACT global r_lex/r_vec (the output columns) are
    recovered for candidates outside a side's top-100 by
    operators/relational.exact_ranks_for — a broadcast count-of-better
    pass, no single-partition window anywhere over an unbounded input.
    Bit-identical to the global-row_number oracle at every scale."""
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
    # Both scored tables feed several branches below (top-k, candidate
    # probe, count-of-better) — one-slot persist so Catalyst doesn't
    # re-inline the regex tokenizer / 64-dim fold per consumer (the
    # round-3 re-inlining trap, BASELINE.md).
    lex_scored = cache_one_slot(lex_scored, "hybrid_rrf_lex")
    dots = cache_one_slot(dots, "hybrid_rrf_vec")

    M = 100  # covers the RRF bound for top-20 (see docstring)
    lex_top = top_k(
        lex_scored, M, F.col("score").desc(), F.col("doc_id").asc()
    )
    vec_top = top_k(dots, M, F.col("dot").desc(), F.col("doc_id").asc())
    # row_number over a LIMIT-100 input: Exchange SinglePartition over a
    # Round-12 (optimization round, VERDICT r11 #4): the candidate set
    # is just the union of the two top-100 doc_id lists — it does not
    # need per-side RANK tables first. The old shape materialized a
    # 100-row row_number table per side (one-slot cache + Exchange
    # SinglePartition each), anti-joined candidates against it to find
    # the "missing" docs, ran count-of-better for those, and unioned
    # the two rank sources back together. ONE count-of-better pass per
    # side over ALL ~200 candidates computes the identical exact global
    # rank (1 + |{better}| under the same total order) for top-100
    # members and missing docs alike — same answers, half the plan:
    # 2 window exchanges, 2 anti-joins, 2 unions and 2 cache slots
    # gone; the broadcast-nested-loop count pass stays candidate-
    # bounded (<= 200 rows broadcast against the cached scored tables).
    # <= 200 rows; feeds three consumers (two rank passes + the fused
    # base) — one-slot persist so the TakeOrdered scans run once.
    cands = cache_one_slot(
        lex_top.select("doc_id").union(vec_top.select("doc_id")).distinct(),
        "hybrid_rrf_cands",
    )
    lex_ranks = exact_ranks_for(
        lex_scored, cands, "score", "doc_id", "r_lex"
    )
    vec_ranks = exact_ranks_for(dots, cands, "dot", "doc_id", "r_vec")

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
    # fused is bounded (<=2M rows by construction); top-20 by fused
    # score with the doc_id tiebreak — TakeOrdered on a tiny input.
    return top_k(
        fused, 20, F.col("rrf_e6").desc(), F.col("doc_id").asc()
    )


@register(
    "embedding_quantize_int8",
    tags=("llm", "similarity", "aggregation"),
    description=(
        "Per-vector symmetric int8 quantization audit: q_i = "
        "round(127*x_i/maxabs) — the 4x storage / bandwidth lever for "
        "100-TB vector corpora. Emits exact integer invariants of the "
        "quantized vector (sum, sum of squares, saturation count) so "
        "the whole quantization is hash-pinned cross-engine."
    ),
    oracle="""
        WITH m AS (
            SELECT vec_id,
                   list_max(list_transform(embedding, x -> abs(x)))
                       AS maxabs
            FROM embeddings
        ), q AS (
            SELECT e.vec_id,
                   CAST(ROUND(127 * ev / m.maxabs) AS BIGINT) AS qv
            FROM (SELECT vec_id, unnest(embedding) AS ev
                  FROM embeddings) e
            JOIN m ON m.vec_id = e.vec_id
            WHERE m.maxabs > 0
        )
        SELECT q.vec_id,
               CAST(COUNT(*) AS BIGINT) AS n_dims,
               CAST(SUM(q.qv) AS BIGINT) AS sum_q,
               CAST(SUM(q.qv * q.qv) AS BIGINT) AS sum_q2,
               CAST(SUM(CASE WHEN abs(q.qv) = 127 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_saturated,
               ROUND(MAX(m2.maxabs), 6) AS maxabs_r6
        FROM q JOIN m m2 ON m2.vec_id = q.vec_id
        GROUP BY 1
    """,
)
def embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """127*x/maxabs is the same double-precision expression on both
    engines (float32 widens exactly; one multiply, one divide — IEEE
    ops agree bit-for-bit), so round-to-BIGINT matches — the repo's
    CAST(ROUND(...)) cents discipline. All aggregates are over exact
    integers. Pure Column expressions per row, shuffle-free except the
    final (tiny) nothing — there is no shuffle at all: maxabs, the
    transform, and the three sums fold inside one projection per
    vector."""
    emb = load_table(spark, sf_dir, "embeddings")
    maxabs = F.array_max(F.transform(F.col("embedding"), lambda x: F.abs(x)))
    q = F.transform(
        F.col("embedding"),
        lambda x: F.round(F.lit(127) * x / F.col("_maxabs")).cast("long"),
    )
    isum = lambda col: F.aggregate(  # noqa: E731
        col, F.lit(0).cast("long"), lambda acc, x: acc + x
    )
    return (
        emb.select("vec_id", "embedding", maxabs.alias("_maxabs"))
        .filter(F.col("_maxabs") > 0)
        .select(
            "vec_id",
            F.size("embedding").cast("long").alias("n_dims"),
            q.alias("_q"),
            F.round(F.col("_maxabs"), 6).alias("maxabs_r6"),
        )
        .select(
            "vec_id",
            "n_dims",
            isum(F.col("_q")).alias("sum_q"),
            isum(F.zip_with(F.col("_q"), F.col("_q"), lambda a, b: a * b))
            .alias("sum_q2"),
            isum(
                F.transform(
                    F.col("_q"),
                    lambda x: F.when(F.abs(x) == 127, F.lit(1).cast("long"))
                    .otherwise(F.lit(0).cast("long")),
                )
            ).alias("n_saturated"),
            "maxabs_r6",
        )
    )


@register(
    "dq_k_anonymity",
    tags=("llm", "dq", "aggregation"),
    description=(
        "k-anonymity privacy audit (k=5): equivalence classes of the "
        "quasi-identifier (nation, market segment, account-balance "
        "bucket) with fewer than k customers — the classes where a "
        "joined external dataset could re-identify individuals; the "
        "audit any PII-bearing corpus release runs next to "
        "curation_pii_scrub."
    ),
    oracle="""
        SELECT c_nationkey,
               c_mktsegment,
               CAST(FLOOR(c_acctbal / 1000) AS BIGINT) AS bal_bucket,
               CAST(COUNT(*) AS BIGINT) AS class_size
        FROM customer
        GROUP BY 1, 2, 3
        HAVING COUNT(*) < 5
    """,
)
def dq_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One partial-aggregated shuffle on the quasi-identifier; the
    HAVING filter runs post-aggregation on class-count rows (bounded by
    the QI domain, not the table). At 100 TB the QI cardinality, not
    the row count, sizes the reduce side — the same property as any
    group-by audit."""
    cust = load_table(spark, sf_dir, "customer")
    return (
        cust.groupBy(
            "c_nationkey",
            "c_mktsegment",
            F.floor(F.col("c_acctbal") / 1000).cast("long").alias("bal_bucket"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("class_size"))
        .filter(F.col("class_size") < 5)
    )


@register(
    "bpe_segment_counts",
    tags=("llm", "text", "tokenizer"),
    description=(
        "BPE tokenizer APPLICATION: segment the whole corpus with the "
        "merge table learned by bpe_train_merges (24 merges) and count "
        "the 30 most frequent symbols (count DESC, symbol ASC) — the "
        "train→apply loop a tokenizer pipeline runs (rows-only: BPE "
        "segmentation is iterative string rewriting with no SQL "
        "oracle; pinned bit-for-bit by the pure-Python BPE "
        "recomputation test, the bpe_train_merges standing)."
    ),
)
def bpe_segment_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Segmentation runs over the DISTINCT-WORD table, weighted by word
    frequency — never over every token occurrence. The 24-merge fold
    (operators/bpe.py:bpe_segment) is a deep chained Column expression;
    applied per occurrence it cost 51 s at sf0.1, applied per distinct
    word it is vocabulary-sized work regardless of corpus size (the
    same word-table formulation bpe_train itself uses). symbol_count =
    Σ_word freq(word) · count(symbol ∈ segment(word)) — identical
    totals, one extra (tiny) word-count shuffle."""
    from hadoop_map_reduce_spark.operators.bpe import bpe_segment, bpe_train

    docs = load_table(spark, sf_dir, "documents")
    merges = bpe_train(docs, n_merges=24)
    words = (
        docs.select(
            F.explode(tokenize(sanitize(F.col("text")))).alias("_w")
        )
        .groupBy("_w")
        .agg(F.count(F.lit(1)).alias("_freq"))
    )
    syms = words.select(
        "_freq",
        F.explode(bpe_segment(F.array(F.col("_w")), merges)).alias("symbol"),
    )
    counts = syms.groupBy("symbol").agg(
        F.sum("_freq").cast("long").alias("n")
    )
    return (
        counts.orderBy(F.col("n").desc(), F.col("symbol").asc()).limit(30)
    )


@register(
    "curation_decontaminate_13gram",
    tags=("llm", "curation", "dedup"),
    description=(
        "Benchmark decontamination by EXACT 13-gram overlap (the "
        "GPT-3 / PaLM recipe): training docs sharing any exact 13-token "
        "span with the benchmark set (doc_id % 50 == 0 stands in) are "
        "flagged with how many distinct grams and benchmark docs they "
        "hit. Complements contamination_pairs (whole-doc Jaccard): a "
        "verbatim quoted benchmark item inside a long doc never reaches "
        "a Jaccard threshold but always shares its 13-grams."
    ),
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, {_TOKS} AS t FROM documents
        ), g AS (
            SELECT doc_id,
                   list_distinct([array_to_string(t[i:i+12], ' ')
                                  for i in range(1, len(t) - 11)]) AS gs
            FROM toks WHERE len(t) >= 13
        ), bench AS (
            SELECT DISTINCT gram, bench_id FROM (
                SELECT unnest(gs) AS gram, doc_id AS bench_id
                FROM g WHERE doc_id % 50 = 0
            )
        ), train AS (
            SELECT doc_id, unnest(gs) AS gram
            FROM g WHERE doc_id % 50 <> 0
        )
        SELECT t.doc_id,
               CAST(COUNT(DISTINCT t.gram) AS BIGINT) AS n_shared_grams,
               CAST(COUNT(DISTINCT b.bench_id) AS BIGINT) AS n_bench_docs
        FROM train t JOIN bench b ON b.gram = t.gram
        GROUP BY 1
    """,
)
def curation_decontaminate_13gram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plan shape: the benchmark side (benchmarks are tiny — here 2% of
    the corpus, in production a few MB of eval sets against 100 TB of
    train) explodes to distinct (gram, bench_id) and BROADCASTS; the
    train side streams its grams through a broadcast hash join — the
    train corpus is scanned once and never shuffled on text. The
    per-doc aggregation shuffles only (doc_id, gram-hit) hits, which
    decontamination expects to be rare. The gram table goes through the
    one-slot cache: it feeds the broadcast build AND the probe side,
    and without it Catalyst re-inlines the tokenize→13-gram pipeline
    per consumer (measured 14.1 s → 0.9 s warm at sf0.1; the 13-gram
    expression itself uses ngrams' array_join(slice) form — the
    expanded element_at tree was 11x slower at n=13). At 100 TB the
    equivalent is materializing the gram postings once (the signature-
    store pattern), not an in-memory cache."""
    from hadoop_map_reduce_spark.functions.text import ngrams
    from hadoop_map_reduce_spark.operators.caching import cache_one_slot

    docs = load_table(spark, sf_dir, "documents")
    grams = cache_one_slot(
        docs.select(
            "doc_id", tokenize(sanitize(F.col("text"))).alias("_t")
        )
        .filter(F.size("_t") >= 13)
        .select(
            "doc_id",
            F.array_distinct(ngrams(F.col("_t"), n=13, sep=" ")).alias("_gs"),
        ),
        "decontaminate-grams",
    )
    bench = (
        grams.filter(F.col("doc_id") % 50 == 0)
        .select(
            F.col("doc_id").alias("bench_id"), F.explode("_gs").alias("gram")
        )
        .distinct()
    )
    train = grams.filter(F.col("doc_id") % 50 != 0).select(
        "doc_id", F.explode("_gs").alias("gram")
    )
    return (
        train.join(F.broadcast(bench), "gram")
        .groupBy("doc_id")
        .agg(
            F.countDistinct("gram").cast("long").alias("n_shared_grams"),
            F.countDistinct("bench_id").cast("long").alias("n_bench_docs"),
        )
    )


# First-digit probabilities log10(1 + 1/d), d = 1..9, as source-literal
# constants (identical doubles on both engines; no runtime libm — the
# repo's float discipline).
_BENFORD = {
    1: 0.3010299956639812,
    2: 0.17609125905568124,
    3: 0.12493873660829993,
    4: 0.09691001300805642,
    5: 0.07918124604762482,
    6: 0.06694678963061322,
    7: 0.05799194697768673,
    8: 0.05115252244738129,
    9: 0.04575749056067514,
}


@register(
    "dq_benford",
    tags=("llm", "dq", "aggregation"),
    description=(
        "Benford's-law first-digit audit over order totals: observed "
        "first-significant-digit counts vs floor(n * log10(1+1/d) * "
        "1e6) expected (integer-exact; the probabilities are source "
        "literals, no runtime logarithms). The classic fraud / "
        "synthetic-data screen a DQ suite runs over monetary columns."
    ),
    oracle=f"""
        WITH d AS (
            SELECT CAST(substr(CAST(CAST(ROUND(o_totalprice * 100)
                AS BIGINT) AS VARCHAR), 1, 1) AS INT) AS digit
            FROM orders WHERE o_totalprice > 0
        )
        SELECT digit,
               CAST(COUNT(*) AS BIGINT) AS observed,
               CAST(FLOOR(CASE digit
                   {' '.join(f'WHEN {k} THEN {v!r}' for k, v in _BENFORD.items())}
                   END * 1e6) AS BIGINT) AS expected_ppm
        FROM d
        GROUP BY digit
    """,
)
def dq_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First digit from the integer-cents STRING (BIGINT-to-string is
    locale/notation-free on both engines, unlike double formatting).
    One partial-agg shuffle over 9 digit groups; expected_ppm =
    floor(p_d * 1e6) is per-digit constant — emitted per row so the
    audit is self-describing."""
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") > 0
    )
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    digit = F.substring(cents.cast("string"), 1, 1).cast("int")
    expected = F.lit(None).cast("double")
    for k, v in _BENFORD.items():
        expected = F.when(F.col("digit") == k, F.lit(v)).otherwise(expected)
    return (
        orders.select(digit.alias("digit"))
        .groupBy("digit")
        .agg(F.count(F.lit(1)).cast("long").alias("observed"))
        .select(
            "digit",
            "observed",
            F.floor(expected * 1e6).cast("long").alias("expected_ppm"),
        )
    )


@register(
    "sample_reservoir_hash",
    tags=("llm", "relational", "window"),
    description=(
        "Deterministic per-key uniform k-sample (reservoir-sampling "
        "equivalent without RNG): keep each user's 3 events with the "
        "smallest md5(event_id) — hash order is uniform and stable "
        "across runs/partitionings, so the sample is reproducible AND "
        "unbiased, unlike rand()-based sampling whose stream depends "
        "on partitioning."
    ),
    oracle="""
        SELECT user_id, event_id, CAST(rk AS BIGINT) AS rk
        FROM (
            SELECT user_id, event_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY user_id
                       ORDER BY md5(CAST(event_id AS VARCHAR)), event_id
                   ) AS rk
            FROM events
        ) WHERE rk <= 3
    """,
)
def sample_reservoir_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One hash exchange on user_id + in-partition sort — and Spark
    plans the rank<=3 filter as WindowGroupLimit (per-partition top-3
    heaps before the exchange), so the shuffle carries at most 3 rows
    per (input partition, user): the same property as topk_per_group,
    here keyed by a hash for uniformity rather than a value for
    relevance."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.md5(F.col("event_id").cast("string").cast("binary")).asc(),
        F.col("event_id").asc(),
    )
    return (
        events.select("user_id", "event_id")
        .withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= 3)
    )


# ---------------------------------------------------------------------------
# multimodal_scene_cuts (round-8): video scene segmentation census
# ---------------------------------------------------------------------------
#
# The frame->phash CTE chain below is the SAME spec text as the
# multimodal_frame_hash_matches oracle (llm_queries.py — 128-byte
# frames, byte-bigram histogram gradient); duplicated verbatim rather
# than shared so that editing one oracle can never silently re-enter
# the other's driver verdict. The cut threshold (hamming > 18) sits at
# the adjacent-frame distance median of this corpus (measured 6..31,
# median ~18), so the census genuinely splits.


@register(
    "multimodal_scene_cuts",
    tags=("llm", "multimodal", "window"),
    description=(
        "Video scene segmentation: per-frame perceptual hashes, a "
        "scene boundary where consecutive frames differ by more than "
        "18 bits (operators/multimodal.scene_cuts); census per media "
        "of frames, scenes, and the longest scene."
    ),
    oracle="""
        WITH fr AS (
            SELECT doc_id, j, substring(text, j * 128 + 1, 128) AS f
            FROM (
                SELECT doc_id, text,
                       unnest(generate_series(0, CAST(GREATEST(LEAST(
                           CEIL(length(text) / 128.0) - 1, 7), 0)
                           AS BIGINT))) AS j
                FROM documents
            )
        ),
        fr2 AS (SELECT doc_id, j, f FROM fr WHERE length(f) >= 2),
        buck AS (
            SELECT doc_id, j,
                   (ord(substring(f, p, 1)) * 30
                    + ord(substring(f, p + 1, 1))) % 64 AS k
            FROM (
                SELECT doc_id, j, f,
                       unnest(generate_series(1, length(f) - 1)) AS p
                FROM fr2
            )
        ),
        cnt AS (
            SELECT doc_id, j, k, COUNT(*) AS c FROM buck GROUP BY 1, 2, 3
        ),
        grid AS (
            SELECT d.doc_id, d.j, i.i, COALESCE(cnt.c, 0) AS c
            FROM (SELECT doc_id, j FROM fr2) d
            CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS i) i
            LEFT JOIN cnt ON cnt.doc_id = d.doc_id AND cnt.j = d.j
                         AND cnt.k = i.i
        ),
        h AS (
            SELECT g1.doc_id, g1.j,
                   CAST(SUM(CASE WHEN g1.c > g2.c
                                 THEN (CAST(1 AS BIGINT) << g1.i)
                                 ELSE 0 END) AS BIGINT) AS phash
            FROM grid g1
            JOIN grid g2 ON g2.doc_id = g1.doc_id AND g2.j = g1.j
                        AND g2.i = g1.i + 1
            WHERE g1.i < 63
            GROUP BY 1, 2
        ),
        lagd AS (
            SELECT doc_id, j, phash,
                   LAG(phash) OVER (PARTITION BY doc_id ORDER BY j)
                       AS prev
            FROM h),
        cut AS (
            SELECT doc_id, j,
                   CASE WHEN prev IS NULL
                             OR bit_count(xor(phash, prev)) > 18
                        THEN 1 ELSE 0 END AS is_cut
            FROM lagd),
        seg AS (
            SELECT doc_id,
                   SUM(is_cut) OVER (PARTITION BY doc_id ORDER BY j)
                       AS scene_id
            FROM cut),
        per_scene AS (
            SELECT doc_id, scene_id, COUNT(*) AS sl
            FROM seg GROUP BY 1, 2)
        SELECT doc_id AS media_id,
               CAST(SUM(sl) AS BIGINT) AS n_frames,
               CAST(COUNT(*) AS BIGINT) AS n_scenes,
               CAST(MAX(sl) AS BIGINT) AS longest_scene
        FROM per_scene GROUP BY 1
    """,
)
def multimodal_scene_cuts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded fan-out (max 8 frames/media), one media-partitioned
    window, two narrow aggregates — per-media state only. At 100 TB of
    video this is the shot-boundary pass that precedes per-scene
    sampling and dedup; the real pixel decoder slots into
    perceptual_hash's use_real_decoder leg without changing this
    plan."""
    from hadoop_map_reduce_spark.operators.multimodal import (
        scene_cuts,
        with_binary_content,
    )

    media = with_binary_content(load_table(spark, sf_dir, "documents"))
    return scene_cuts(
        media, every_n_bytes=128, max_frames=8, max_hamming=18
    )
