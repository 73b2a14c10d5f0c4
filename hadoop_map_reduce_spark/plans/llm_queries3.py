"""LLM training-data pipeline queries, batch 3: fuzzy matching and
source mixing.

- Levenshtein near-dup pairs: character-level fuzzy duplicates that
  token-shingle Jaccard misses (typo variants). Blocked on the first
  token so the candidate join is an equi-join; the edit-distance verify
  runs only within blocks. Both engines ship the same classic
  Wagner-Fischer ``levenshtein``, so the oracle is exact.
- Weighted source mixing: per-source deterministic sampling rates via
  the md5 bucket, the standard way to hit a target data mixture without
  a shuffle or an RNG whose stream depends on partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_map_reduce_spark.operators.similarity import ivf_topk
from hadoop_map_reduce_spark.plans.llm_queries2 import (
    _md5_bucket_spark,
    _md5_bucket_sql,
)
from hadoop_map_reduce_spark.plans.llm_queries import _TOKS
from hadoop_map_reduce_spark.plans.registry import register
from hadoop_map_reduce_spark.session import load_table

# Sampling percentage per source for the mixing query; unlisted sources
# fall back to 25%. Literal on both engines (sources are src0..src19 in
# the synthetic corpus).
_MIX_WEIGHTS = {"src0": 90, "src1": 70, "src2": 40, "src3": 10}
_MIX_DEFAULT = 25


@register(
    "dedup_fuzzy_levenshtein",
    tags=("llm", "dedup"),
    description=(
        "Character-level fuzzy near-dup pairs: docs sharing their first "
        "token whose 64-char prefixes are within Levenshtein distance 8. "
        "First-token blocking keeps candidate generation an equi-join; "
        "the quadratic edit-distance verify runs only inside blocks."
    ),
    oracle="""
        WITH keyed AS (
            SELECT doc_id,
                   regexp_extract(lower(regexp_replace(text,
                       '([^\\s\\w]|_)+', ' ', 'g')), '[a-z0-9]+', 0)
                       AS block_key,
                   substr(lower(regexp_replace(text,
                       '([^\\s\\w]|_)+', ' ', 'g')), 1, 64) AS prefix
            FROM documents
        )
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               CAST(levenshtein(a.prefix, b.prefix) AS BIGINT) AS edit_dist
        FROM keyed a
        JOIN keyed b ON a.block_key = b.block_key AND a.doc_id < b.doc_id
        WHERE a.block_key <> ''
          AND levenshtein(a.prefix, b.prefix) <= 8
    """,
)
def dedup_fuzzy_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    sanitized = F.lower(F.regexp_replace("text", r"([^\s\w]|_)+", " "))
    keyed = docs.select(
        "doc_id",
        F.regexp_extract(sanitized, "[a-z0-9]+", 0).alias("block_key"),
        F.substring(sanitized, 1, 64).alias("prefix"),
    ).filter(F.col("block_key") != "")
    a = keyed.select(
        F.col("doc_id").alias("id_a"),
        "block_key",
        F.col("prefix").alias("_pa"),
    )
    b = keyed.select(
        F.col("doc_id").alias("id_b"),
        "block_key",
        F.col("prefix").alias("_pb"),
    )
    # Banded DP: with the threshold argument Spark computes only the
    # |i-j| <= 8 diagonal band and early-exits past it (-1), ~4-8x less
    # work per candidate pair than the full 64x64 matrix — and the
    # returned value is the exact distance whenever it is <= threshold,
    # so results are identical to the unbounded form filtered afterward.
    dist = F.levenshtein(F.col("_pa"), F.col("_pb"), 8)
    return (
        a.join(b, "block_key")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", dist.cast("long").alias("edit_dist"))
        .filter(F.col("edit_dist") >= 0)
    )


@register(
    "similarity_ivf",
    tags=("llm", "similarity"),
    description=(
        "ANN via IVF coarse quantization: corpus assigned once to "
        "deterministic sampled-centroid Voronoi cells, queries probe "
        "their 6 nearest cells, exact cosine re-ranks (equi-join on the "
        "cell id; recall<1 by design, so no SQL oracle — recall pinned "
        "vs brute force in tests)."
    ),
    oracle=None,
)
def similarity_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return ivf_topk(emb, queries, k=5, n_cells=16, n_probe=6)


@register(
    "similarity_pq",
    tags=("llm", "similarity"),
    description=(
        "ANN via product quantization + asymmetric distance: 64-dim "
        "float vectors encode to 8 nibble codes packed in one INT "
        "(64x memory compression — the billion-vector index layout), "
        "ADC lookup-table scan over the codes column, exact-cosine "
        "re-rank of the per-query top-40 survivors (recall<1 by "
        "quantization, so no SQL oracle — recall and exact-sim parity "
        "pinned vs brute force in tests)."
    ),
    oracle=None,
)
def similarity_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic end-to-end: codebooks from lowest-xxhash64 sample
    + fixed-iteration exact-integer k-means, encode and ADC are pure
    Column arithmetic. Plan shape (the 100-TB story): train on a
    bounded sample, encode in one shuffle-free scan, search touches
    12 bytes/row plus a broadcast of 10 LUT-carrying query rows, and
    the only shuffles are the two WindowGroupLimit top-k cuts."""
    from hadoop_map_reduce_spark.operators.pq import (
        pq_encode,
        pq_topk_adc,
        pq_train_codebooks,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    books = pq_train_codebooks(emb, m=8, ksub=16, n_iter=3)
    codes = pq_encode(emb, books)
    return pq_topk_adc(codes, emb, queries, books, k=5, refine=8)


def _rp_oracle() -> str:
    """SQL twin of random_projection_e6: the md5-derived sign matrix is
    baked as per-output-dim array LITERALS (source constants, same
    bytes as the Spark plan), summed against 1e6-quantized coordinates
    — exact BIGINT on both engines."""
    from hadoop_map_reduce_spark.operators.similarity import rp_sign_matrix

    signs = rp_sign_matrix(64, 16)
    projs = ",\n            ".join(
        "CAST(list_sum([e6[i] * ([{lits}])[i] "
        "for i in generate_series(1, 64)]) AS BIGINT) AS p{j}".format(
            lits=", ".join(str(signs[i][j]) for i in range(64)), j=j
        )
        for j in range(16)
    )
    return f"""
        WITH e AS (
            SELECT vec_id,
                   [CAST(ROUND(CAST(x AS DOUBLE) * 1000000) AS BIGINT)
                    for x in embedding] AS e6
            FROM embeddings
        )
        SELECT vec_id,
            {projs}
        FROM e
    """


@register(
    "embedding_random_projection",
    tags=("llm", "similarity"),
    description=(
        "Johnson-Lindenstrauss random projection 64 -> 16 dims with a "
        "deterministic +/-1 Achlioptas sign matrix (md5-derived source "
        "literals, identical constants in both engines): coordinates "
        "quantized to round(x*1e6) BIGINT, outputs are exact signed "
        "integer folds — no float crosses the engine boundary, no "
        "shuffle anywhere in the plan."
    ),
    oracle=_rp_oracle(),
)
def embedding_random_projection_q(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """One explode + one map-side-combined shuffle; the sign matrix
    never materializes (inline hash of (i, j), constants shared
    verbatim with the SQL). Output is 4x narrower than the input — the
    cheap first stage before ANN/clustering at corpus scale. Distance
    preservation is pinned empirically (test_random_projection_
    preserves_distances), not assumed."""
    from hadoop_map_reduce_spark.operators.similarity import (
        random_projection_e6,
    )

    return random_projection_e6(
        load_table(spark, sf_dir, "embeddings"), out_dims=16
    )


def _mix_case_sql() -> str:
    whens = " ".join(
        f"WHEN source = '{s}' THEN {w}" for s, w in sorted(_MIX_WEIGHTS.items())
    )
    return f"CASE {whens} ELSE {_MIX_DEFAULT} END"


@register(
    "mix_sources_weighted",
    tags=("llm", "pipeline"),
    description=(
        "Deterministic weighted source mixing: keep each doc when its "
        "md5 bucket falls under the source's target percentage — a "
        "reshuffle-proof Bernoulli sample per source, summarized as "
        "kept/total counts per source."
    ),
    oracle=f"""
        SELECT source,
               COUNT(*) AS n_total,
               CAST(SUM(CASE WHEN {_md5_bucket_sql('doc_id', 100)}
                             < {_mix_case_sql()}
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
        FROM documents GROUP BY source
    """,
)
def mix_sources_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    rate = F.lit(_MIX_DEFAULT)
    for s, w in sorted(_MIX_WEIGHTS.items()):
        rate = F.when(F.col("source") == s, F.lit(w)).otherwise(rate)
    keep = _md5_bucket_spark(F.col("doc_id"), 100) < rate
    return docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum(F.when(keep, 1).otherwise(0)).alias("n_kept"),
    )


_LM_SCORE_SQL = f"""
    WITH toks AS (
        SELECT doc_id, {_TOKS} AS t FROM documents
    ), bg AS (
        SELECT doc_id,
               unnest([t[i] for i in range(1, len(t))]) AS w1,
               unnest([t[i + 1] for i in range(1, len(t))]) AS w2
        FROM toks WHERE len(t) >= 2
    ), c12 AS (
        SELECT w1, w2, COUNT(*) AS c12 FROM bg GROUP BY w1, w2
    ), c1 AS (
        SELECT w1, COUNT(*) AS c1 FROM bg GROUP BY w1
    ), scored AS (
        SELECT bg.doc_id,
               CAST(ROUND(1e6 * (c12.c12 + 1)
                    / (c1.c1 + (SELECT COUNT(DISTINCT w2) FROM bg)))
                    AS BIGINT) AS micro
        FROM bg
        JOIN c12 ON c12.w1 = bg.w1 AND c12.w2 = bg.w2
        JOIN c1 ON c1.w1 = bg.w1
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           ROUND(CAST(SUM(micro) AS DOUBLE) / COUNT(*), 6) AS avg_prob_micro
    FROM scored
    GROUP BY doc_id
"""


@register(
    "quality_lm_score",
    tags=("llm", "text", "quality"),
    description=(
        "CCNet-style language-model quality score, in-engine: a bigram "
        "LM trained on the corpus itself scores each document by its "
        "mean add-1-smoothed bigram probability (micro-units). Boiler-"
        "plate and fluent text score high; gibberish scores low. Exact "
        "integer discipline — counts and one ROUND per bigram, no "
        "floating-point logarithms to disagree on (same choice as "
        "tfidf_top_terms); real CCNet ranks by log-perplexity, which "
        "orders nearly identically at these magnitudes."
    ),
    oracle=_LM_SCORE_SQL,
)
def quality_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale shape: the LM 'training' is ONE aggregate over the bigram
    stream (map-side combined) — prefix counts and the continuation
    vocabulary both derive from the tiny c12 table, not from re-reading
    the corpus — and the scoring pass re-joins it on bigram/prefix
    keys, all equi-joins on token keys; text never shuffles whole. The
    vocabulary scalar broadcasts. This is the perplexity-filter stage
    of a corpus pipeline with model and scoring fused in one lineage."""
    from hadoop_map_reduce_spark.functions.text import sanitize, tokenize

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", tokenize(sanitize(F.col("text"))).alias("t")
    ).filter(F.size("t") >= 2)
    n = F.size("t")
    bg = toks.select(
        "doc_id",
        F.explode(
            F.arrays_zip(
                F.slice("t", 1, n - 1).alias("w1"),
                F.slice("t", 2, n - 1).alias("w2"),
            )
        ).alias("_p"),
    ).select("doc_id", F.col("_p.w1").alias("w1"), F.col("_p.w2").alias("w2"))
    from hadoop_map_reduce_spark.operators.caching import cache_one_slot

    # The LM itself (c12) is vocabulary-sized, not corpus-sized: persist
    # it in a bounded slot so the tokenize+explode corpus pass behind it
    # runs ONCE, and derive prefix counts and the continuation
    # vocabulary from it — they are exact functions of c12. Only the
    # scoring join re-reads the bigram stream (2 corpus passes total;
    # the naive formulation re-aggregated bg three times for 4).
    c12 = cache_one_slot(
        bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12")),
        "lm-bigram-counts",
    )
    c1 = c12.groupBy("w1").agg(F.sum("c12").alias("c1"))
    vocab = c12.agg(F.countDistinct("w2").alias("_v"))
    scored = (
        bg.join(c12, ["w1", "w2"])
        .join(c1, ["w1"])
        .crossJoin(F.broadcast(vocab))
        .select(
            "doc_id",
            F.round(
                F.lit(1e6) * (F.col("c12") + 1) / (F.col("c1") + F.col("_v"))
            )
            .cast("long")
            .alias("micro"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.round(
            F.sum("micro").cast("double") / F.count(F.lit(1)), 6
        ).alias("avg_prob_micro"),
    )


_CHUNKS_SQL = f"""
    WITH toks AS (
        SELECT doc_id, {_TOKS} AS t FROM documents
    ), starts AS (
        SELECT doc_id, t, unnest(range(1, len(t) + 1, 96)) AS s
        FROM toks WHERE len(t) >= 1
    )
    SELECT doc_id,
           CAST(FLOOR((s - 1) / 96) AS BIGINT) AS chunk_idx,
           CAST(len(t[s:s+127]) AS BIGINT) AS chunk_len,
           md5(array_to_string(t[s:s+127], ' ')) AS chunk_hash
    FROM starts
"""


@register(
    "doc_chunks_overlap",
    tags=("llm", "text"),
    description=(
        "Training-window chunking: each document split into 128-token "
        "chunks on a 96-token stride (32-token overlap, so no context is "
        "lost at chunk boundaries). Emits (doc_id, chunk_idx, length, "
        "md5-of-chunk) — the manifest a tokenizer shard consumes; the "
        "md5 makes the chunk CONTENT oracle-checkable without hauling "
        "chunk text through the comparison."
    ),
    oracle=_CHUNKS_SQL,
)
def doc_chunks_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure per-row expansion — tokenize once, explode the stride grid,
    slice per start: no shuffle at all until a downstream consumer
    groups the manifest. Expansion factor is bounded by ~n/96 chunks
    per doc, proportional to input size (the 100-TB-safe property);
    contrast pack_token_chunks, which PACKS docs into fixed windows
    and needs a per-shard cumsum window."""
    from hadoop_map_reduce_spark.functions.text import sanitize, tokenize

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", tokenize(sanitize(F.col("text"))).alias("t")
    ).filter(F.size("t") >= 1)
    starts = toks.select(
        "doc_id",
        "t",
        F.explode(
            F.sequence(F.lit(1), F.size("t"), F.lit(96))
        ).alias("s"),
    )
    chunk = F.slice("t", F.col("s"), 128)
    return starts.select(
        "doc_id",
        F.floor((F.col("s") - 1) / 96).cast("long").alias("chunk_idx"),
        F.size(chunk).cast("long").alias("chunk_len"),
        F.md5(F.concat_ws(" ", chunk)).alias("chunk_hash"),
    )


@register(
    "dedup_semantic",
    tags=("llm", "dedup", "similarity"),
    description=(
        "SemDeDup-style semantic dedup: deterministic k-means blocking, "
        "then exact within-cluster cosine pairs >= 0.4 (rows-only: the "
        "iterative clustering has no SQL oracle; exactness is pinned by "
        "the pure-Python k-means recomputation test plus the "
        "Spark-exact pair subset check)."
    ),
)
def dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate generation is n²/k instead of n² (SemDeDup,
    arXiv:2303.09540): the within-cluster self-join is an equi-join on
    the cluster key, so cost is Σ cluster_i² and the cross-cluster
    boundary pairs are the documented recall loss. k is DERIVED from a
    cheap corpus count (k = max(8, n // 64), n/k held constant — see
    SEMANTIC_TARGET_CLUSTER_SIZE), so candidate work stays n·64 linear
    in n at 100 TB instead of going quadratic with a frozen k; the
    kmeans assignment stage stays a shuffle-free Column fold per row."""
    from hadoop_map_reduce_spark.operators.similarity import (
        semantic_dedup_pairs,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    return semantic_dedup_pairs(emb, threshold=0.4, k=None, n_iter=5)


@register(
    "bpe_train_merges",
    tags=("llm", "text", "tokenizer"),
    description=(
        "BPE tokenizer-vocabulary training over the corpus: 24 merge "
        "rounds on the word-frequency table, deterministic tie-breaks "
        "(rows-only: iterative training has no SQL oracle; the full "
        "merge table is pinned bit-for-bit by a pure-Python BPE "
        "recomputation test)."
    ),
)
def bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One corpus-sized pass (groupBy word), then vocabulary-sized merge
    iterations — the standard efficient BPE formulation; see
    operators/bpe.py for the 100-TB scale analysis."""
    from hadoop_map_reduce_spark.operators.bpe import bpe_train

    docs = load_table(spark, sf_dir, "documents")
    merges = bpe_train(docs, n_merges=24)
    return spark.createDataFrame(
        merges, "rank BIGINT, lhs STRING, rhs STRING, pair_count BIGINT"
    )
