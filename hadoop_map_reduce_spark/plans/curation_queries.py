"""Corpus-curation query batch: the filter/report stages a training-data
pipeline runs between raw ingestion and tokenization.

- Banned-term filtering (the C4-style "bad word" gate): per-doc hit
  count + keep flag from an integer density threshold, so the decision
  is exact on both engines.
- Repetition ratio (Gopher-style quality signal): distinct-token /
  total-token ratio per doc, the cheap proxy for boilerplate and
  template spam.
- Per-source caps: keep at most N docs per source (domain frequency
  capping) via one window shuffle on the source key.
- Quality funnel: cumulative survival counts across the whole gate
  chain in a single aggregate pass — the curation report that tells you
  which stage is eating your corpus.

All four are pure Column expressions (JVM-side, whole-stage codegen);
per-doc work is embarrassingly parallel, and the only shuffles are the
window partition (cap) and the final single-row aggregate (funnel),
both of which hold at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hadoop_map_reduce_spark.plans.llm_queries import _JACCARD_PAIRS_SQL
from hadoop_map_reduce_spark.plans.registry import register
from hadoop_map_reduce_spark.session import load_table

# Tokenizer shared by the batch: lowercase alnum runs, the same
# convention as functions/text.py. One regex literal spelled identically
# for Java regex (Spark) and RE2 (DuckDB).
_TOKEN_RE = "[a-z0-9]+"
# Stand-in banned vocabulary (the synthetic corpus has no profanity);
# \b is a word boundary in both Java regex and RE2.
_BANNED_RE = r"\b(key|hash|slow)\b"


def _tokens(col):
    return F.regexp_extract_all(F.lower(col), F.lit(_TOKEN_RE), 0)


@register(
    "curation_banned_terms",
    tags=("llm", "curation"),
    description=(
        "Banned-term gate: per-doc banned-vocabulary hits and a keep "
        "flag at <10% token density (integer cross-multiplication, no "
        "float threshold)."
    ),
    oracle=f"""
        WITH t AS (
            SELECT doc_id,
                   len(regexp_extract_all(lower(text), '{_TOKEN_RE}'))
                       AS n_tokens,
                   len(regexp_extract_all(lower(text), '{_BANNED_RE}'))
                       AS n_banned
            FROM documents)
        SELECT doc_id,
               CAST(n_tokens AS BIGINT) AS n_tokens,
               CAST(n_banned AS BIGINT) AS n_banned,
               n_banned * 10 < n_tokens AS keep
        FROM t
    """,
)
def curation_banned_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    n_tokens = F.size(_tokens(F.col("text"))).cast("long")
    n_banned = F.size(
        F.regexp_extract_all(F.lower("text"), F.lit(_BANNED_RE), 0)
    ).cast("long")
    return docs.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        n_banned.alias("n_banned"),
        (F.col("n_banned") * 10 < F.col("n_tokens")).alias("keep"),
    )


@register(
    "curation_repetition_ratio",
    tags=("llm", "curation"),
    description=(
        "Repetition quality signal: distinct-token / total-token ratio "
        "per doc (low ratio = template spam). Ratio is an exact-int "
        "division, bit-identical across engines."
    ),
    oracle=f"""
        WITH t AS (
            SELECT doc_id,
                   regexp_extract_all(lower(text), '{_TOKEN_RE}') AS toks
            FROM documents)
        SELECT doc_id,
               CAST(len(toks) AS BIGINT) AS n_tokens,
               CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct,
               CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)
                   AS distinct_ratio
        FROM t WHERE len(toks) > 0
    """,
)
def curation_repetition_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select("doc_id", _tokens(F.col("text")).alias("toks"))
    n_tokens = F.size("toks").cast("long")
    n_distinct = F.size(F.array_distinct("toks")).cast("long")
    return (
        t.filter(F.size("toks") > 0)
        .select(
            "doc_id",
            n_tokens.alias("n_tokens"),
            n_distinct.alias("n_distinct"),
            (n_distinct.cast("double") / n_tokens).alias("distinct_ratio"),
        )
    )


@register(
    "curation_cap_per_source",
    tags=("llm", "curation"),
    description=(
        "Domain frequency capping: keep at most 20 docs per source, "
        "deterministic by doc_id order (one window shuffle on the "
        "source key; at scale, skewed sources split via AQE)."
    ),
    oracle="""
        SELECT doc_id, source, rn FROM (
            SELECT doc_id, source,
                   ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id)
                       AS rn
            FROM documents)
        WHERE rn <= 20
    """,
)
def curation_cap_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy("doc_id")
    return (
        docs.select(
            "doc_id",
            "source",
            F.row_number().over(w).cast("long").alias("rn"),
        )
        .filter(F.col("rn") <= 20)
    )


# Funnel gates and oracle shared with the streaming twin
# (streaming_queries.stream_quality_funnel): ONE definition of the gate
# chain so a threshold tweak can never desynchronize the pair.
FUNNEL_ORACLE = f"""
    WITH t AS (
        SELECT n_chars, lang,
               len(regexp_extract_all(lower(text), '{_TOKEN_RE}'))
                   AS n_tok,
               len(list_distinct(
                   regexp_extract_all(lower(text), '{_TOKEN_RE}')))
                   AS n_dist
        FROM documents)
    SELECT COUNT(*) AS n_docs,
           CAST(COALESCE(SUM(CASE WHEN n_chars >= 100 THEN 1 ELSE 0 END),
                         0) AS BIGINT) AS pass_len,
           CAST(COALESCE(SUM(CASE WHEN n_chars >= 100 AND n_tok >= 30
                         THEN 1 ELSE 0 END), 0) AS BIGINT) AS pass_tokens,
           CAST(COALESCE(SUM(CASE WHEN n_chars >= 100 AND n_tok >= 30
                         AND n_dist * 2 >= n_tok
                         THEN 1 ELSE 0 END), 0) AS BIGINT)
               AS pass_repetition,
           CAST(COALESCE(SUM(CASE WHEN n_chars >= 100 AND n_tok >= 30
                         AND n_dist * 2 >= n_tok AND lang = 'en'
                         THEN 1 ELSE 0 END), 0) AS BIGINT) AS pass_lang
    FROM t
"""


def funnel_agg(docs: DataFrame) -> DataFrame:
    """The cumulative gate-survival aggregate over a documents-shaped
    DataFrame (batch or streaming — per-row gates are stateless and the
    only state is the single aggregate row)."""
    toks = _tokens(F.col("text"))
    t = docs.select(
        "n_chars",
        "lang",
        F.size(toks).alias("n_tok"),
        F.size(F.array_distinct(toks)).alias("n_dist"),
    )
    g1 = F.col("n_chars") >= 100
    g2 = g1 & (F.col("n_tok") >= 30)
    g3 = g2 & (F.col("n_dist") * 2 >= F.col("n_tok"))
    g4 = g3 & (F.col("lang") == "en")

    def _cnt(cond):
        # COALESCE so a zero-row day reports 0s, not NULLs (mirrored in
        # FUNNEL_ORACLE; caught by test_empty_inputs).
        return F.coalesce(
            F.sum(F.when(cond, 1).otherwise(0)), F.lit(0)
        ).cast("long")

    return t.agg(
        F.count(F.lit(1)).alias("n_docs"),
        _cnt(g1).alias("pass_len"),
        _cnt(g2).alias("pass_tokens"),
        _cnt(g3).alias("pass_repetition"),
        _cnt(g4).alias("pass_lang"),
    )


@register(
    "curation_quality_funnel",
    tags=("llm", "curation"),
    description=(
        "Curation funnel report: cumulative survival counts through "
        "length → token-count → repetition → language gates, one "
        "aggregate pass over the corpus (all thresholds integer-exact)."
    ),
    oracle=FUNNEL_ORACLE,
)
def curation_quality_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    return funnel_agg(load_table(spark, sf_dir, "documents"))


# PII patterns meaning the same thing in Java regex (Spark) and RE2
# (DuckDB): no backrefs, no lookaround, explicit classes only.
_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PHONE_RE = r"\d{3}-\d{3}-\d{4}"


@register(
    "curation_pii_scrub",
    tags=("llm", "curation"),
    description=(
        "PII detect + redact: the synthetic corpus carries no PII, so "
        "deterministic emails/phones are injected keyed on doc_id, then "
        "detected (counts), redacted (regexp_replace to placeholder "
        "tokens), and re-scanned (residual_pii — the invariant the "
        "pipeline actually cares about: 0 after scrub)."
    ),
    oracle=f"""
        WITH aug AS (
            SELECT doc_id,
                   text
                   || CASE WHEN doc_id % 3 = 0
                           THEN ' contact user' || CAST(doc_id AS VARCHAR)
                                || '@example.com'
                           ELSE '' END
                   || CASE WHEN doc_id % 4 = 1
                           THEN ' call 555-'
                                || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')
                                || '-0199'
                           ELSE '' END AS text
            FROM documents
        ), scrub AS (
            SELECT doc_id, text,
                   regexp_replace(
                       regexp_replace(text, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                       '{_PHONE_RE}', '<PHONE>', 'g') AS redacted
            FROM aug)
        SELECT doc_id,
               CAST(len(regexp_extract_all(text, '{_EMAIL_RE}')) AS BIGINT)
                   AS n_emails,
               CAST(len(regexp_extract_all(text, '{_PHONE_RE}')) AS BIGINT)
                   AS n_phones,
               CAST(length(redacted) AS BIGINT) AS redacted_len,
               CAST(len(regexp_extract_all(redacted, '{_EMAIL_RE}'))
                    + len(regexp_extract_all(redacted, '{_PHONE_RE}'))
                    AS BIGINT) AS residual_pii
        FROM scrub
    """,
)
def curation_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single projection pass, no shuffle; Spark's regexp_replace is
    replace-all by default (DuckDB needs the 'g' flag — dialect pin)."""
    docs = load_table(spark, sf_dir, "documents")
    aug = F.concat(
        F.col("text"),
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(
                F.lit(" contact user"),
                F.col("doc_id").cast("string"),
                F.lit("@example.com"),
            ),
        ).otherwise(""),
        F.when(
            F.col("doc_id") % 4 == 1,
            F.concat(
                F.lit(" call 555-"),
                F.lpad((F.col("doc_id") % 1000).cast("string"), 3, "0"),
                F.lit("-0199"),
            ),
        ).otherwise(""),
    )
    t = docs.select("doc_id", aug.alias("text"))
    redacted = F.regexp_replace(
        F.regexp_replace(F.col("text"), _EMAIL_RE, "<EMAIL>"),
        _PHONE_RE,
        "<PHONE>",
    )
    scrub = t.select("doc_id", "text", redacted.alias("redacted"))

    def _hits(col, pat):
        return F.size(F.regexp_extract_all(col, F.lit(pat), 0)).cast("long")

    return scrub.select(
        "doc_id",
        _hits(F.col("text"), _EMAIL_RE).alias("n_emails"),
        _hits(F.col("text"), _PHONE_RE).alias("n_phones"),
        F.length("redacted").cast("long").alias("redacted_len"),
        (
            _hits(F.col("redacted"), _EMAIL_RE)
            + _hits(F.col("redacted"), _PHONE_RE)
        ).alias("residual_pii"),
    )


# Sliding 8-token passages, mirrored between engines. Spark builds them
# with transform-over-sequence; DuckDB with a list comprehension. The
# tokenizer here is sanitize+tokenize (the \w/ASCII reference dialect,
# functions/text.py), NOT this module's [a-z0-9]+ curation tokenizer —
# passages must align with the dedup family's shingles.
_DUCK_TOKS = (
    "list_filter(string_split_regex(lower(regexp_replace(text, "
    r"'([^\s\w]|_)+', ' ', 'g')), '\s+'), t -> t <> '')"
)
_P = 8
_DUCK_PASSAGES = (
    "list_distinct(["
    + " || ' ' || ".join(f"t[i+{k}]" for k in range(_P))
    + f" for i in range(1, len(t) - {_P - 2})])"
)


@register(
    "curation_passage_dedup",
    tags=("llm", "curation", "dedup"),
    description=(
        "Shared-passage report: sliding 8-token passages appearing in "
        ">= 2 distinct docs, with doc counts — the exact-substring "
        "complement to the shingle-Jaccard near-dup family (finds "
        "copied boilerplate even when whole-doc similarity is low)."
    ),
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, {_DUCK_TOKS} AS t FROM documents
        ), sh AS (
            SELECT doc_id, {_DUCK_PASSAGES} AS s
            FROM toks WHERE len(t) >= {_P}
        ), u AS (
            SELECT doc_id, unnest(s) AS passage FROM sh
        )
        SELECT passage, CAST(COUNT(*) AS BIGINT) AS n_docs
        FROM u GROUP BY passage HAVING COUNT(*) >= 2
    """,
)
def curation_passage_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plan: tokenize → per-doc distinct passages (dedup before the
    shuffle: a passage repeated inside one doc ships once) → explode →
    one hash aggregation keyed by passage.

    At 100 TB the passage *string* would be replaced by xxhash64(passage)
    as the shuffle key (16-byte keys, collision-checked) — kept as text
    here because the report itself is the contract, and the oracle
    compares passage values.
    """
    from hadoop_map_reduce_spark.functions.text import sanitize, tokenize

    docs = load_table(spark, sf_dir, "documents")
    toks = tokenize(sanitize(F.col("text")))
    # Short docs yield [] inside the same projection (the bigram
    # operator's implicit-filter trick): a separate .filter(size>=P)
    # would be pushed below the projection and re-tokenize every row.
    passages = F.when(
        F.size("t") >= _P,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), F.size("t") - _P),
                lambda i: F.concat_ws(
                    " ", *[F.element_at("t", i + k + 1) for k in range(_P)]
                ),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        docs.select(toks.alias("t"))
        .select(F.explode(passages).alias("passage"))
        .groupBy("passage")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .filter(F.col("n_docs") >= 2)
    )


@register(
    "dedup_incremental",
    tags=("llm", "curation", "dedup"),
    description=(
        "Incremental corpus dedup: a new crawl batch (doc_id % 4 == 0) is "
        "deduped against the existing corpus store (the other 75%) AND "
        "against earlier docs of the same batch — near-dup = trigram "
        "Jaccard >= 0.5 via MinHash-LSH banding. Returns surviving batch "
        "doc ids: what an append-only ingestion pipeline would admit "
        "without ever re-deduplicating the store against itself."
    ),
    oracle=f"""
        WITH near AS ({_JACCARD_PAIRS_SQL}),
        dup AS (
            SELECT id_b AS b, id_a AS q FROM near
            UNION ALL
            SELECT id_a AS b, id_b AS q FROM near
        )
        SELECT d.doc_id FROM documents d
        WHERE d.doc_id % 4 = 0
          AND NOT EXISTS (
            SELECT 1 FROM dup
            WHERE dup.b = d.doc_id
              AND (dup.q % 4 <> 0 OR dup.q < d.doc_id))
    """,
)
def dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A batch doc is dropped iff it has a near-dup partner in the store
    (any id) or an earlier (lower-id) partner within its own batch — the
    greedy, non-recursive admission rule an append-only pipeline applies
    per increment.

    Plan shape: candidate pairs come from the same banded MinHash
    equi-join as ``dedup_minhash_lsh`` (no cartesian), the blocker set is
    a projection + distinct over those pairs, and admission is one
    left-anti equi-join on doc_id. At 100 TB the store side would be a
    persisted signature table (signatures are computed once per doc,
    ever); each increment hashes only the new batch and joins its bands
    against the store's — cost proportional to the batch, not the corpus.
    Here both sides' signatures come from one pass over `documents`
    because the registered query must be self-contained.
    """
    from hadoop_map_reduce_spark.operators.dedup import minhash_lsh_pairs

    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(
        docs, threshold=0.5, n=3, num_hashes=64, bands=32
    )
    partners = pairs.select(
        F.col("id_b").alias("b"), F.col("id_a").alias("q")
    ).unionAll(
        pairs.select(F.col("id_a").alias("b"), F.col("id_b").alias("q"))
    )
    blockers = (
        partners.filter(
            (F.col("q") % 4 != 0) | (F.col("q") < F.col("b"))
        )
        .select("b")
        .distinct()
    )
    batch = docs.filter(F.col("doc_id") % 4 == 0).select("doc_id")
    return batch.join(
        blockers, batch.doc_id == blockers.b, "left_anti"
    )


# Shared deterministic split bucket (llm_queries2's md5 trick).
from hadoop_map_reduce_spark.plans.llm_queries2 import (  # noqa: E402
    _md5_bucket_sql,
)

_mb_sql = _md5_bucket_sql("doc_id", 100)


@register(
    "pipeline_training_manifest",
    tags=("llm", "curation", "dedup"),
    description=(
        "End-to-end corpus -> training-set manifest in ONE query: "
        "quality gates (length / token count / repetition / language) -> "
        "exact dedup (min-id per md5 fingerprint) -> near-dup removal "
        "(trigram Jaccard >= 0.5 keep-lowest against gate+exact "
        "survivors) -> deterministic md5 train/val/test split. Returns "
        "the admitted manifest (doc_id, split, n_tok) a tokenizer job "
        "would consume — every stage an existing registered operator, "
        "composed without materialization barriers."
    ),
    oracle=f"""
        WITH g AS (
            SELECT doc_id, text,
                   len(regexp_extract_all(lower(text), '{_TOKEN_RE}'))
                       AS n_tok,
                   len(list_distinct(
                       regexp_extract_all(lower(text), '{_TOKEN_RE}')))
                       AS n_dist
            FROM documents
            WHERE n_chars >= 100 AND lang = 'en'),
        s1 AS (
            SELECT doc_id, text, n_tok FROM g
            WHERE n_tok >= 30 AND n_dist * 2 >= n_tok),
        s2 AS (
            SELECT doc_id, n_tok FROM (
                SELECT doc_id, n_tok,
                       ROW_NUMBER() OVER (PARTITION BY md5(text)
                                          ORDER BY doc_id) AS rn
                FROM s1)
            WHERE rn = 1),
        near AS ({_JACCARD_PAIRS_SQL}),
        s3 AS (
            SELECT d.doc_id, d.n_tok FROM s2 d
            WHERE NOT EXISTS (
                SELECT 1 FROM near n JOIN s2 q ON q.doc_id = n.id_a
                WHERE n.id_b = d.doc_id))
        SELECT doc_id,
               CASE WHEN {_mb_sql} < 80 THEN 'train'
                    WHEN {_mb_sql} < 90 THEN 'val'
                    ELSE 'test' END AS split,
               CAST(n_tok AS BIGINT) AS n_tok
        FROM s3
    """,
)
def pipeline_training_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stage plan: one corpus scan feeds the gate projection (pure
    Column ops), exact dedup is a window over slim (fp, doc_id, n_tok)
    rows (the text never shuffles — the 16-byte md5 is the key), the
    near-dup blocker set reuses the banded-MinHash equi-join, and
    admission + split assignment are an anti-join plus a scalar
    expression. Every shuffle key is a digest or an id; document text
    stays in the scan stage. At 100 TB each stage's intermediate is a
    manifest (ids + small ints), orders of magnitude smaller than the
    corpus."""
    from hadoop_map_reduce_spark.operators.dedup import minhash_lsh_pairs
    from hadoop_map_reduce_spark.plans.llm_queries2 import _md5_bucket_spark

    docs = load_table(spark, sf_dir, "documents")
    toks = _tokens(F.col("text"))
    gated = docs.filter(
        (F.col("n_chars") >= 100) & (F.col("lang") == "en")
    )
    s1 = gated.select(
        "doc_id",
        F.md5(F.col("text").cast("binary")).alias("fp"),
        F.size(toks).alias("n_tok"),
        F.size(F.array_distinct(toks)).alias("n_dist"),
    ).filter(
        (F.col("n_tok") >= 30)
        & (F.col("n_dist") * 2 >= F.col("n_tok"))
    )
    w = Window.partitionBy("fp").orderBy("doc_id")
    s2 = (
        s1.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "n_tok")
    )
    # Signatures only for gate survivors: both endpoints of a blocking
    # pair must lie in s2 ⊆ gated, so hashing rejected docs is pure
    # waste (and at 100 TB the rejected fraction dominates). `gated`
    # (the cheap-filter superset of s2) avoids recomputing the token
    # stats just to scope the hash.
    pairs = minhash_lsh_pairs(
        gated, threshold=0.5, n=3, num_hashes=64, bands=32
    )
    blockers = (
        pairs.join(
            s2.select(F.col("doc_id").alias("id_a")), "id_a", "left_semi"
        )
        .select(F.col("id_b").alias("doc_id"))
        .distinct()
    )
    s3 = s2.join(blockers, "doc_id", "left_anti")
    bucket = _md5_bucket_spark(F.col("doc_id"), 100)
    return s3.select(
        "doc_id",
        F.when(bucket < 80, "train")
        .when(bucket < 90, "val")
        .otherwise("test")
        .alias("split"),
        F.col("n_tok").cast("long").alias("n_tok"),
    )


_HEX = "0123456789abcdef"


def _md5_value16_spark(col):
    """Deterministic uniform value in [0, 65536) from the first FOUR hex
    chars of md5 (16 bits — llm_queries2's 2-char variant only spans
    0-255). Used RAW, never through a modulo: v % 10000 is non-uniform
    (residues 0-5535 occur 7/65536, 5536-9999 occur 6/65536), which
    would bias admission probabilities by up to ~6.8% and break the 1/p
    importance-weight claim. Pure string ops, identical in Spark and
    DuckDB."""
    digest = F.md5(col.cast("string").cast("binary"))
    v = F.lit(0)
    for i in range(1, 5):
        v = v * 16 + (F.instr(F.lit(_HEX), F.substring(digest, i, 1)) - 1)
    return v


def _md5_value16_sql(expr: str) -> str:
    d = f"md5(CAST({expr} AS VARCHAR))"
    v = "0"
    for i in range(1, 5):
        v = f"({v} * 16 + instr('{_HEX}', substr({d}, {i}, 1)) - 1)"
    return v


def _quality_sampling_oracle() -> str:
    from hadoop_map_reduce_spark.plans.llm_queries import (
        _TOKS,
        _sql_stop_hits,
    )

    v16 = _md5_value16_sql("doc_id")
    return f"""
        WITH toks AS (
            SELECT doc_id, text, source, {_TOKS} AS t FROM documents
        ), q AS (
            SELECT doc_id, source,
                   0.3 * LEAST(len(t) / 100.0, 1.0)
                     + 0.4 * ({_sql_stop_hits('en')} / len(t))
                     + 0.3 * (LENGTH(regexp_replace(text, '[^A-Za-z]+', '', 'g'))
                              / LENGTH(text)) AS quality
            FROM toks
        )
        SELECT doc_id, source, quality,
               65536.0 / FLOOR(quality * 65536) AS weight
        FROM q
        WHERE {v16} < FLOOR(quality * 65536)
    """


@register(
    "mix_quality_weighted",
    tags=("llm", "curation", "pipeline"),
    description=(
        "Quality-weighted importance sampling (DCLM/FineWeb-style data "
        "mixing): each doc's admission probability IS its quality score, "
        "decided by a deterministic md5 bucket — no RNG — with the "
        "1/p importance weight carried for loss reweighting."
    ),
    oracle=_quality_sampling_oracle(),
)
def mix_quality_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Admission is a pure per-row filter at the scan (no shuffle, no
    sample() RNG whose stream depends on partitioning): doc admitted iff
    the raw 16-bit md5 value < floor(quality * 65536) — the raw value is
    uniform on [0, 65536), so p = floor(quality*65536)/65536 EXACTLY (a
    modulo-folded bucket would be non-uniform and bias p upward by up to
    ~6.8%). The quality double is the bit-identical composite from
    text_quality, so the floor-of-scaled comparison agrees across
    engines exactly. The carried weight (1/p = 65536/floor(...)) is what
    makes the sample unbiased for loss averaging downstream."""
    from hadoop_map_reduce_spark.functions.text import sanitize, tokenize
    from hadoop_map_reduce_spark.functions.text_analysis import quality_score

    docs = load_table(spark, sf_dir, "documents")
    toks = tokenize(sanitize(F.col("text")))
    q = docs.select(
        "doc_id",
        "source",
        quality_score(F.col("text"), toks).alias("quality"),
    )
    p_e16 = F.floor(F.col("quality") * 65536)
    v16 = _md5_value16_spark(F.col("doc_id"))
    return q.filter(v16 < p_e16).select(
        "doc_id",
        "source",
        "quality",
        (F.lit(65536.0) / p_e16).alias("weight"),
    )


# Character width of the exact-substring grams. Any duplicated span of
# length >= _SSK contains only duplicated _SSK-grams, and every maximal
# duplicated span is recovered exactly by merging consecutive duplicated
# gram start positions (gaps-and-islands). 25 chars sits above the
# corpus's incidental-collision floor (15-gram English has huge
# accidental overlap) while still catching template boilerplate.
_SSK = 25


@register(
    "dedup_substring_spans",
    tags=("llm", "curation", "dedup"),
    description=(
        "Exact duplicated-substring spans (the suffix-array training-data "
        "dedup shape): per doc, the maximal character spans of length >= "
        f"{_SSK} whose every {_SSK}-gram occurs >= 2 times corpus-wide — "
        "the span-level exact complement to the doc-level MinHash family, "
        "locating WHERE the duplication lives so the span (not the doc) "
        "can be cut."
    ),
    oracle=f"""
        WITH grams AS (
            SELECT doc_id,
                   unnest(generate_series(1, length(text) - {_SSK} + 1))
                       AS pos,
                   text
            FROM documents
            WHERE length(text) >= {_SSK}
        ), digs AS (
            SELECT doc_id, pos, md5(substr(text, pos, {_SSK})) AS dig
            FROM grams
        ), hits AS (
            SELECT doc_id, pos,
                   pos - ROW_NUMBER() OVER (
                       PARTITION BY doc_id ORDER BY pos) AS grp
            FROM digs
            WHERE dig IN (SELECT dig FROM digs
                          GROUP BY dig HAVING COUNT(*) >= 2)
        )
        SELECT doc_id,
               CAST(MIN(pos) AS BIGINT) AS span_start,
               CAST(MAX(pos) - MIN(pos) + {_SSK} AS BIGINT) AS span_len
        FROM hits
        GROUP BY doc_id, grp
    """,
)
def dedup_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed reformulation of suffix-array exact-substring dedup
    (the "dedup training data" pipeline op): instead of one global
    suffix array, (1) explode every char position into a 16-byte
    md5 digest of its ``_SSK``-gram — explode is narrow, and the digest
    is computed in the same projection, so the text column never
    shuffles; (2) ONE shuffle keyed on the digest with a window count
    marks positions whose gram repeats corpus-wide — the distributed
    analogue of the suffix-array sort, on uniform 16-byte keys (no
    skew); (3) a per-doc gaps-and-islands window merges consecutive
    duplicated positions into maximal spans (doc-bounded partitions).

    The window-count form deliberately replaces groupBy-then-semi-join:
    that shape consumes the gram table twice (Catalyst re-inlines the
    substring/md5 pipeline per consumer — the round-3 one-slot-cache
    trap) and shuffles it twice; the window does it in one pass with no
    cache. Gram rows ~= corpus bytes, the same order as tokenization —
    the exact-verify twin of the MinHash/SimHash approximate family, to
    be run on the suspect slice LSH surfaces at 100 TB. Core plan in
    operators/dedup.duplicated_substring_spans (crafted-corpus tested).
    """
    from hadoop_map_reduce_spark.operators.dedup import (
        duplicated_substring_spans,
    )

    docs = load_table(spark, sf_dir, "documents")
    return duplicated_substring_spans(docs, k=_SSK)


@register(
    "dedup_span_coverage",
    tags=("llm", "curation", "dedup"),
    description=(
        "Per-document duplicated-character coverage: how many of each "
        f"doc's chars sit inside a corpus-wide duplicated {_SSK}-gram, "
        "as an exact count and parts-per-million of doc length — the "
        "scalar behind 'drop docs more than X% duplicated' curation "
        "gates (the per-doc rollup of dedup_substring_spans)."
    ),
    oracle=f"""
        WITH grams AS (
            SELECT doc_id,
                   unnest(generate_series(1, length(text) - {_SSK} + 1))
                       AS pos,
                   text
            FROM documents
            WHERE length(text) >= {_SSK}
        ), digs AS (
            SELECT doc_id, pos, md5(substr(text, pos, {_SSK})) AS dig
            FROM grams
        ), dup AS (
            SELECT doc_id, pos
            FROM digs
            WHERE dig IN (SELECT dig FROM digs
                          GROUP BY dig HAVING COUNT(*) >= 2)
        ), contrib AS (
            SELECT doc_id,
                   LEAST(COALESCE(pos - LAG(pos) OVER (
                             PARTITION BY doc_id ORDER BY pos),
                         {_SSK}), {_SSK}) AS new_chars
            FROM dup
        ), cov AS (
            SELECT doc_id, SUM(new_chars) AS dup_chars
            FROM contrib GROUP BY doc_id
        )
        SELECT d.doc_id,
               CAST(COALESCE(c.dup_chars, 0) AS BIGINT) AS dup_chars,
               CAST((1000000 * COALESCE(c.dup_chars, 0))
                    // length(d.text) AS BIGINT) AS dup_ppm
        FROM documents d LEFT JOIN cov c USING (doc_id)
        WHERE length(d.text) > 0
    """,
)
def dedup_span_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc duplicated-char count + exact integer ppm of doc length.

    Plan: operators/dedup.duplicated_char_coverage (ONE corpus-wide
    shuffle on uniform 16-byte gram digests, then one doc-bounded lag
    window summing min(gap, k) per duplicated gram start — the interval
    union length without an explicit merge; summing raw span lengths
    would double-count chars shared by spans whose gram starts sit
    closer than k), then a left join back onto documents so
    never-duplicated docs report 0. The ratio is integer
    DIV on 1e6-scaled counts — no float in either engine, so the hash
    compare is exact. At 100 TB the coverage join is id-keyed and the
    documents side prunes to (doc_id, length) at the scan.
    """
    from hadoop_map_reduce_spark.operators.dedup import (
        duplicated_char_coverage,
    )

    docs = load_table(spark, sf_dir, "documents").filter(
        F.length("text") > 0
    )
    cov = duplicated_char_coverage(docs, k=_SSK)
    return docs.select("doc_id", F.length("text").alias("_len")).join(
        cov, "doc_id", "left"
    ).select(
        "doc_id",
        F.coalesce("dup_chars", F.lit(0)).cast("long").alias("dup_chars"),
        F.expr("1000000 * coalesce(dup_chars, 0) DIV _len")
        .cast("long")
        .alias("dup_ppm"),
    )


@register(
    "pack_length_buckets",
    tags=("llm", "curation"),
    description=(
        "Length-bucketed batch sharding: assign each doc to the "
        "smallest power-of-two token-capacity bucket (floor 16) and "
        "report per-bucket doc count, real tokens, padded tokens, and "
        "exact integer padding-waste ppm — the bucketing that decides "
        "how much compute sequence-length-grouped training batches "
        "save over one global max-length pad."
    ),
    oracle=f"""
        WITH toks AS (
            SELECT len({_DUCK_TOKS}) AS n_tokens FROM documents
        ), b AS (
            SELECT GREATEST(CAST(16 AS BIGINT),
                            CAST(1 AS BIGINT)
                                << length(bin(n_tokens - 1))) AS bucket_cap,
                   n_tokens
            FROM toks WHERE n_tokens >= 1
        )
        SELECT CAST(bucket_cap AS BIGINT) AS bucket_cap,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
               CAST(bucket_cap * COUNT(*) AS BIGINT) AS padded_tokens,
               CAST(((bucket_cap * COUNT(*) - SUM(n_tokens)) * 1000000)
                    // (bucket_cap * COUNT(*)) AS BIGINT) AS waste_ppm
        FROM b GROUP BY bucket_cap
    """,
)
def pack_length_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per power-of-two length bucket: docs, real vs padded tokens, and
    padding waste in exact integer ppm.

    The bucket capacity is 2^ceil(log2(n_tokens)) floored at 16,
    computed WITHOUT float log: both engines take the binary-digit
    count of n_tokens - 1 (``length(bin(x))``) and shift — bit-exact,
    no libm rounding risk at exact powers of two. One token-count scan
    (the tokenizer pipeline shared with doc_token_stats /
    curation_passage_dedup) into a partial-aggregated groupBy on a
    ~log(max_len)-cardinality key — map-side combine collapses each
    partition to a handful of rows, so the shuffle is trivially small
    at any corpus size; the report itself is bounded by the number of
    buckets, not the corpus.
    """
    from hadoop_map_reduce_spark.functions.text import sanitize, tokenize

    docs = load_table(spark, sf_dir, "documents")
    n = F.size(tokenize(sanitize(F.col("text"))))
    cap = F.greatest(
        F.lit(16).cast("long"),
        F.expr("shiftleft(cast(1 as bigint), length(bin(n_tokens - 1)))"),
    )
    padded = F.col("bucket_cap") * F.col("n_docs")
    return (
        docs.select(n.alias("n_tokens"))
        .filter(F.col("n_tokens") >= 1)
        .select(cap.alias("bucket_cap"), "n_tokens")
        .groupBy("bucket_cap")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
        )
        .select(
            "bucket_cap",
            "n_docs",
            "total_tokens",
            padded.cast("long").alias("padded_tokens"),
        )
        .withColumn(
            "waste_ppm",
            F.expr(
                "(padded_tokens - total_tokens) * 1000000"
                " DIV padded_tokens"
            ).cast("long"),
        )
    )


@register(
    "curation_cut_dup_spans",
    tags=("llm", "curation", "dedup"),
    description=(
        "Exact-substring dedup CUT: each doc's text with every char "
        f"covered by a corpus-wide duplicated {_SSK}-gram removed — the "
        "transform step behind the span/coverage reports (cut the "
        "duplicated spans, keep the rest), emitted as cleaned length, "
        "cut chars, and an md5 fingerprint of the cleaned text."
    ),
    oracle=f"""
        WITH grams AS (
            SELECT doc_id,
                   unnest(generate_series(1, length(text) - {_SSK} + 1))
                       AS pos,
                   text
            FROM documents
            WHERE length(text) >= {_SSK}
        ), digs AS (
            SELECT doc_id, pos, md5(substr(text, pos, {_SSK})) AS dig
            FROM grams
        ), dup AS (
            SELECT doc_id, pos
            FROM digs
            WHERE dig IN (SELECT dig FROM digs
                          GROUP BY dig HAVING COUNT(*) >= 2)
        ), brks AS (
            SELECT doc_id, pos,
                   CASE WHEN pos - LAG(pos) OVER (
                            PARTITION BY doc_id ORDER BY pos) <= {_SSK}
                        THEN 0 ELSE 1 END AS brk
            FROM dup
        ), isl AS (
            SELECT doc_id, pos,
                   SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos
                                  ROWS UNBOUNDED PRECEDING) AS grp
            FROM brks
        ), iv AS (
            SELECT doc_id, MIN(pos) AS a, MAX(pos) + {_SSK} - 1 AS b
            FROM isl GROUP BY doc_id, grp
        ), segs AS (
            SELECT i.doc_id, i.a,
                   substr(d.text,
                          COALESCE(LAG(i.b) OVER (
                              PARTITION BY i.doc_id ORDER BY i.a), 0) + 1,
                          i.a - COALESCE(LAG(i.b) OVER (
                              PARTITION BY i.doc_id ORDER BY i.a), 0) - 1)
                       AS seg
            FROM iv i JOIN documents d USING (doc_id)
        ), heads AS (
            SELECT doc_id, string_agg(seg, '' ORDER BY a) AS head
            FROM segs GROUP BY doc_id
        ), tails AS (
            SELECT i.doc_id, substr(d.text, MAX(i.b) + 1) AS tail
            FROM iv i JOIN documents d USING (doc_id)
            GROUP BY i.doc_id, d.text
        ), cut AS (
            SELECT h.doc_id, h.head || t.tail AS cleaned
            FROM heads h JOIN tails t USING (doc_id)
        )
        SELECT d.doc_id,
               CAST(length(COALESCE(c.cleaned, d.text)) AS BIGINT)
                   AS cleaned_len,
               CAST(length(d.text) - length(COALESCE(c.cleaned, d.text))
                    AS BIGINT) AS cut_chars,
               md5(COALESCE(c.cleaned, d.text)) AS cleaned_fp
        FROM documents d LEFT JOIN cut c USING (doc_id)
    """,
)
def curation_cut_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Lee-et-al exact-substring dedup transform: remove every char
    covered by a corpus-wide duplicated k-gram, keep the rest in order.

    Plan: operators/dedup.cut_duplicated_spans — the family's ONE
    digest shuffle, doc-bounded interval-merge windows (break at gap >
    k, where covered char intervals stop touching), intervals packed
    into one sorted array row per doc so the text joins back exactly
    once (never duplicated per interval), and the kept text rebuilt by
    a single JVM-side ``aggregate`` lambda fold — no UDF, no Python.
    The comparison surface is (lengths, md5 fingerprint) rather than
    the raw cleaned text so the driver hashes bounded cells; the
    crafted tests compare the actual strings. Conservation law
    cut_chars = dedup_span_coverage.dup_chars is test-pinned.
    """
    from hadoop_map_reduce_spark.operators.dedup import cut_duplicated_spans

    docs = load_table(spark, sf_dir, "documents")
    cut = cut_duplicated_spans(docs, k=_SSK)
    return docs.select("doc_id", F.length("text").alias("_len")).join(
        cut, "doc_id"
    ).select(
        "doc_id",
        F.length("cleaned").cast("long").alias("cleaned_len"),
        (F.col("_len") - F.length("cleaned")).cast("long").alias("cut_chars"),
        F.md5(F.col("cleaned").cast("binary")).alias("cleaned_fp"),
    )


@register(
    "curation_decontaminate_cut",
    tags=("llm", "curation", "dedup"),
    description=(
        "Surgical benchmark decontamination: in every train doc "
        "(doc_id % 10 != 0), remove each char covered by a "
        f"{_SSK}-gram that also occurs in the held-out set "
        "(doc_id % 10 = 0) — the cut alternative to dropping whole "
        "contaminated docs, keeping the clean remainder in the mix."
    ),
    oracle=f"""
        WITH train AS (
            SELECT * FROM documents WHERE doc_id % 10 <> 0
        ), ref AS (
            SELECT * FROM documents WHERE doc_id % 10 = 0
        ), rd AS (
            SELECT DISTINCT md5(substr(text, pos, {_SSK})) AS dig
            FROM (
                SELECT text,
                       unnest(generate_series(1,
                           length(text) - {_SSK} + 1)) AS pos
                FROM ref WHERE length(text) >= {_SSK})
        ), tg AS (
            SELECT doc_id, pos, md5(substr(text, pos, {_SSK})) AS dig
            FROM (
                SELECT doc_id, text,
                       unnest(generate_series(1,
                           length(text) - {_SSK} + 1)) AS pos
                FROM train WHERE length(text) >= {_SSK})
        ), dup AS (
            SELECT doc_id, pos FROM tg
            WHERE dig IN (SELECT dig FROM rd)
        ), brks AS (
            SELECT doc_id, pos,
                   CASE WHEN pos - LAG(pos) OVER (
                            PARTITION BY doc_id ORDER BY pos) <= {_SSK}
                        THEN 0 ELSE 1 END AS brk
            FROM dup
        ), isl AS (
            SELECT doc_id, pos,
                   SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos
                                  ROWS UNBOUNDED PRECEDING) AS grp
            FROM brks
        ), iv AS (
            SELECT doc_id, MIN(pos) AS a, MAX(pos) + {_SSK} - 1 AS b
            FROM isl GROUP BY doc_id, grp
        ), segs AS (
            SELECT i.doc_id, i.a,
                   substr(d.text,
                          COALESCE(LAG(i.b) OVER (
                              PARTITION BY i.doc_id ORDER BY i.a), 0) + 1,
                          i.a - COALESCE(LAG(i.b) OVER (
                              PARTITION BY i.doc_id ORDER BY i.a), 0) - 1)
                       AS seg
            FROM iv i JOIN train d USING (doc_id)
        ), heads AS (
            SELECT doc_id, string_agg(seg, '' ORDER BY a) AS head
            FROM segs GROUP BY doc_id
        ), tails AS (
            SELECT i.doc_id, substr(d.text, MAX(i.b) + 1) AS tail
            FROM iv i JOIN train d USING (doc_id)
            GROUP BY i.doc_id, d.text
        ), cut AS (
            SELECT h.doc_id, h.head || t.tail AS cleaned
            FROM heads h JOIN tails t USING (doc_id)
        )
        SELECT d.doc_id,
               CAST(length(COALESCE(c.cleaned, d.text)) AS BIGINT)
                   AS cleaned_len,
               CAST(length(d.text) - length(COALESCE(c.cleaned, d.text))
                    AS BIGINT) AS cut_chars,
               md5(COALESCE(c.cleaned, d.text)) AS cleaned_fp
        FROM train d LEFT JOIN cut c USING (doc_id)
    """,
)
def curation_decontaminate_cut(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cut-don't-drop decontamination against a held-out split.

    Plan: operators/dedup.cut_matching_gram_spans — the held-out set's
    DISTINCT gram digests broadcast into a semi-join against the train
    gram table (benchmarks are tiny next to a 100-TB train corpus, so
    the train grams never shuffle on the match path), then the family's
    doc-bounded interval-merge + one-join aggregate-fold stitch. The
    13-gram REPORT twin is curation_decontaminate_13gram; this emits
    the surgically cleaned text surface (lengths + md5 fingerprint).
    """
    from hadoop_map_reduce_spark.operators.dedup import (
        cut_matching_gram_spans,
    )

    docs = load_table(spark, sf_dir, "documents")
    train = docs.filter(F.col("doc_id") % 10 != 0)
    ref = docs.filter(F.col("doc_id") % 10 == 0)
    cut = cut_matching_gram_spans(train, ref, k=_SSK)
    return train.select("doc_id", F.length("text").alias("_len")).join(
        cut, "doc_id"
    ).select(
        "doc_id",
        F.length("cleaned").cast("long").alias("cleaned_len"),
        (F.col("_len") - F.length("cleaned")).cast("long").alias("cut_chars"),
        F.md5(F.col("cleaned").cast("binary")).alias("cleaned_fp"),
    )


# Within-doc self-repetition gram width: 16 chars (~3 tokens) sits where
# genuine template/spam self-repetition shows up in this corpus while
# the corpus-wide 25-char family width finds none (measured: 0 docs at
# k=25, 60 at k=16 at sf0.01).
_SRK = 16


@register(
    "curation_selfrepeat_coverage",
    tags=("llm", "curation"),
    description=(
        "Within-document self-repetition coverage: chars covered by a "
        f"{_SRK}-gram occurring >= 2 times INSIDE the same doc, as an "
        "exact count and integer ppm of doc length — the char-level "
        "complement to the token distinct-ratio repetition signal "
        "(catches verbatim repeated passages that token ratios blur)."
    ),
    oracle=f"""
        WITH grams AS (
            SELECT doc_id,
                   unnest(generate_series(1, length(text) - {_SRK} + 1))
                       AS pos,
                   text
            FROM documents
            WHERE length(text) >= {_SRK}
        ), digs AS (
            SELECT doc_id, pos, md5(substr(text, pos, {_SRK})) AS dig
            FROM grams
        ), dup AS (
            SELECT doc_id, pos FROM (
                SELECT doc_id, pos,
                       COUNT(*) OVER (PARTITION BY doc_id, dig) AS c
                FROM digs)
            WHERE c >= 2
        ), contrib AS (
            SELECT doc_id,
                   LEAST(COALESCE(pos - LAG(pos) OVER (
                             PARTITION BY doc_id ORDER BY pos),
                         {_SRK}), {_SRK}) AS new_chars
            FROM dup
        ), cov AS (
            SELECT doc_id, SUM(new_chars) AS dup_chars
            FROM contrib GROUP BY doc_id
        )
        SELECT d.doc_id,
               CAST(COALESCE(c.dup_chars, 0) AS BIGINT) AS selfdup_chars,
               CAST((1000000 * COALESCE(c.dup_chars, 0))
                    // length(d.text) AS BIGINT) AS selfdup_ppm
        FROM documents d LEFT JOIN cov c USING (doc_id)
        WHERE length(d.text) > 0
    """,
)
def curation_selfrepeat_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc self-repetition coverage: the span family's coverage
    plan with the duplication count partitioned by (doc_id, digest)
    instead of digest alone — so even the count window is doc-bounded
    and the whole pipeline shuffles on keys that carry the doc id (no
    corpus-wide hot digest can exist by construction). Same sum-of-
    min(gap, k) interval-union arithmetic, exact integer ppm.
    """
    from hadoop_map_reduce_spark.operators.dedup import (
        duplicated_char_coverage,
    )

    docs = load_table(spark, sf_dir, "documents").filter(
        F.length("text") > 0
    )
    cov = duplicated_char_coverage(docs, k=_SRK, within_doc=True)
    return docs.select("doc_id", F.length("text").alias("_len")).join(
        cov, "doc_id", "left"
    ).select(
        "doc_id",
        F.coalesce("dup_chars", F.lit(0)).cast("long").alias(
            "selfdup_chars"
        ),
        F.expr("1000000 * coalesce(dup_chars, 0) DIV _len")
        .cast("long")
        .alias("selfdup_ppm"),
    )


# Winnowing parameters: 25-char grams (the span family's width), window
# 8 -> fingerprint density ~2/9 of the gram set; shared substrings of
# length >= 32 chars are guaranteed a shared fingerprint.
_WIN_W = 8


@register(
    "text_winnowing",
    tags=("llm", "curation"),
    description=(
        "Winnowing fingerprints (Schleimer/Wilkerson/Aiken 2003, the "
        f"MOSS algorithm): per doc, the minimal {_SSK}-gram digest of "
        f"every {_WIN_W}-gram window (leftmost tie-break), distinct — "
        "the position-robust document fingerprint set that guarantees "
        f"any shared substring of >= {_WIN_W + _SSK - 1} chars yields "
        "a shared fingerprint at ~2/(w+1) storage."
    ),
    oracle=f"""
        WITH grams AS (
            SELECT doc_id,
                   unnest(generate_series(1, length(text) - {_SSK} + 1))
                       AS pos,
                   text
            FROM documents
            WHERE length(text) >= {_SSK}
        ), digs AS (
            SELECT doc_id, pos, md5(substr(text, pos, {_SSK})) AS dig
            FROM grams
        ), sel AS (
            SELECT doc_id, pos,
                   min({{'d': dig, 'p': pos}}) OVER (
                       PARTITION BY doc_id ORDER BY pos
                       ROWS BETWEEN {_WIN_W - 1} PRECEDING
                                AND CURRENT ROW) AS s
            FROM digs
        )
        SELECT DISTINCT doc_id,
               CAST(s.p AS BIGINT) AS pos,
               s.d AS dig
        FROM sel WHERE pos >= {_WIN_W}
    """,
)
def text_winnowing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plan: operators/dedup.winnowing_fingerprints — gram fan-out
    projection (text never shuffles), ONE doc-bounded sliding window
    taking min(struct(digest, pos)) over the trailing w rows (struct
    comparison is lexicographic in both engines, so the leftmost-min
    tie-break is engine-identical), then distinct. Digests stay hex
    strings end-to-end: string ordering is the cross-engine contract.
    """
    from hadoop_map_reduce_spark.operators.dedup import (
        winnowing_fingerprints,
    )

    docs = load_table(spark, sf_dir, "documents")
    return winnowing_fingerprints(docs, k=_SSK, w=_WIN_W)


def _winnow_pairs_sql(min_shared: int) -> str:
    """DuckDB recomputation of :func:`operators.dedup.winnow_pairs` at a
    given ``min_shared`` — shared so the eval report below runs the
    candidate generator at density 1 against the same SQL body the
    registered query pins at 3."""
    return f"""
        WITH grams AS (
            SELECT doc_id,
                   unnest(generate_series(1, length(text) - {_SSK} + 1))
                       AS pos,
                   text
            FROM documents
            WHERE length(text) >= {_SSK}
        ), digs AS (
            SELECT doc_id, pos, md5(substr(text, pos, {_SSK})) AS dig
            FROM grams
        ), sel AS (
            SELECT doc_id, pos,
                   min({{'d': dig, 'p': pos}}) OVER (
                       PARTITION BY doc_id ORDER BY pos
                       ROWS BETWEEN {_WIN_W - 1} PRECEDING
                                AND CURRENT ROW) AS s
            FROM digs
        ), fp AS (
            SELECT DISTINCT doc_id, s.d AS dig
            FROM sel WHERE pos >= {_WIN_W}
        ), sizes AS (
            SELECT doc_id, COUNT(*) AS n FROM fp GROUP BY doc_id
        ), pairs AS (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   COUNT(*) AS n_shared
            FROM fp a JOIN fp b
              ON a.dig = b.dig AND a.doc_id < b.doc_id
            GROUP BY 1, 2
        )
        SELECT p.id_a, p.id_b,
               CAST(p.n_shared AS BIGINT) AS n_shared,
               CAST((p.n_shared * 1000000)
                    // LEAST(sa.n, sb.n) AS BIGINT) AS containment_ppm
        FROM pairs p
        JOIN sizes sa ON sa.doc_id = p.id_a
        JOIN sizes sb ON sb.doc_id = p.id_b
        WHERE p.n_shared >= {min_shared}
    """


@register(
    "dedup_winnow_pairs",
    tags=("llm", "curation", "dedup"),
    description=(
        "MOSS match step: doc pairs sharing >= 3 distinct winnowing "
        "fingerprints, with the shared count and exact integer "
        "containment ppm vs the smaller fingerprint set — near-dup "
        "candidate generation over the ~2/(w+1)-density fingerprint "
        "index instead of the full gram table."
    ),
    oracle=_winnow_pairs_sql(3),
)
def dedup_winnow_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plan: operators/dedup.winnow_pairs — inverted-index self-join
    over the winnowed fingerprint postings (one-slot-cached: the
    fingerprint pipeline feeds both join sides), co-occurrence count as
    the shared-fingerprint score, integer containment ppm against the
    smaller set. The Σ posting-list² candidate cost shrinks
    quadratically with winnowing density vs the raw gram index, while
    the w + k - 1 shared-substring guarantee bounds what can be missed.
    """
    from hadoop_map_reduce_spark.operators.dedup import winnow_pairs

    docs = load_table(spark, sf_dir, "documents")
    return winnow_pairs(docs, k=_SSK, w=_WIN_W, min_shared=3)


@register(
    "dedup_winnow_eval",
    tags=("llm", "curation", "dedup"),
    description=(
        "Fingerprint-index evaluation: confusion counts of the winnow "
        "candidate pairs (any shared fingerprint) against the exact "
        "trigram-shingle Jaccard >= 0.5 truth set, with integer "
        "precision/recall ppm — the measurement harness that justifies "
        "running the cheap MOSS index before the expensive verify."
    ),
    oracle=f"""
        WITH truth AS ({_JACCARD_PAIRS_SQL}),
        cand AS ({_winnow_pairs_sql(1)}),
        conf AS (
            SELECT CAST(COUNT(t.id_a) AS BIGINT) AS n_truth,
                   CAST(COUNT(c.id_a) AS BIGINT) AS n_cand,
                   CAST(COUNT(CASE WHEN t.id_a IS NOT NULL
                                    AND c.id_a IS NOT NULL
                              THEN 1 END) AS BIGINT) AS n_tp
            FROM truth t FULL OUTER JOIN cand c
              ON t.id_a = c.id_a AND t.id_b = c.id_b
        )
        SELECT n_truth, n_cand, n_tp,
               CASE WHEN n_cand > 0
                    THEN CAST(n_tp * 1000000 // n_cand AS BIGINT) END
                   AS precision_ppm,
               CASE WHEN n_truth > 0
                    THEN CAST(n_tp * 1000000 // n_truth AS BIGINT) END
                   AS recall_ppm
        FROM conf
    """,
)
def dedup_winnow_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plan: run both pair generators (each already bucketed/prefix-
    filtered — no cross join anywhere), full-outer equi-join the two
    pair tables on (id_a, id_b), one single-row aggregate. At 100 TB
    the truth side is the verified near-dup output you already
    materialize; the confusion join is pair-table-sized (<< corpus) and
    the report is 1 row. Integer ppm via DIV — no float division.
    """
    from hadoop_map_reduce_spark.operators.dedup import (
        ngram_jaccard_pairs_prefix,
        winnow_pairs,
    )

    docs = load_table(spark, sf_dir, "documents")
    truth = ngram_jaccard_pairs_prefix(docs, threshold=0.5, n=3).select(
        "id_a", "id_b", F.lit(1).alias("_t")
    )
    cand = winnow_pairs(docs, k=_SSK, w=_WIN_W, min_shared=1).select(
        "id_a", "id_b", F.lit(1).alias("_c")
    )
    conf = truth.join(cand, ["id_a", "id_b"], "full_outer").agg(
        F.count("_t").cast("long").alias("n_truth"),
        F.count("_c").cast("long").alias("n_cand"),
        F.count(
            F.when(F.col("_t").isNotNull() & F.col("_c").isNotNull(), 1)
        )
        .cast("long")
        .alias("n_tp"),
    )
    return conf.select(
        "n_truth",
        "n_cand",
        "n_tp",
        F.expr(
            "CASE WHEN n_cand > 0 THEN n_tp * 1000000 DIV n_cand END"
        ).alias("precision_ppm"),
        F.expr(
            "CASE WHEN n_truth > 0 THEN n_tp * 1000000 DIV n_truth END"
        ).alias("recall_ppm"),
    )


@register(
    "dedup_source_overlap",
    tags=("llm", "curation", "dedup", "aggregation"),
    description=(
        "Cross-source duplication matrix: exact near-dup pair counts "
        "per unordered source pair — the report that tells you which "
        "ingestion feeds are mirroring each other."
    ),
    oracle=f"""
        WITH truth AS ({_JACCARD_PAIRS_SQL}),
        j AS (
            SELECT LEAST(da.source, db.source) AS source_a,
                   GREATEST(da.source, db.source) AS source_b
            FROM truth p
            JOIN documents da ON da.doc_id = p.id_a
            JOIN documents db ON db.doc_id = p.id_b
        )
        SELECT source_a, source_b, CAST(COUNT(*) AS BIGINT) AS n_pairs
        FROM j GROUP BY 1, 2
    """,
)
def dedup_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plan: near-dup pairs (prefix-filtered exact Jaccard; at 100 TB
    you'd feed the LSH-verified pair table — same schema) joined twice
    to the (doc_id, source) projection, unordered-pair normalization
    via least/greatest, one small aggregate keyed by source pair. The
    pair table is tiny next to the corpus, so both meta joins shuffle
    only pair-sized data against a two-column projection of documents;
    output is #sources² at most.
    """
    from hadoop_map_reduce_spark.operators.dedup import (
        ngram_jaccard_pairs_prefix,
    )

    from hadoop_map_reduce_spark.operators.dedup import pair_attr_matrix

    docs = load_table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs_prefix(docs, threshold=0.5, n=3)
    return pair_attr_matrix(
        pairs, docs.select("doc_id", "source"), "source",
        "source_a", "source_b",
    )


@register(
    "dedup_source_rate",
    tags=("llm", "curation", "dedup", "aggregation"),
    description=(
        "Per-source duplication rate: docs participating in >= 1 exact "
        "near-dup pair, as count and integer ppm of the source's docs — "
        "the per-feed health metric a crawl pipeline tracks over time."
    ),
    oracle=f"""
        WITH truth AS ({_JACCARD_PAIRS_SQL}),
        dup_ids AS (
            SELECT DISTINCT doc_id FROM (
                SELECT id_a AS doc_id FROM truth
                UNION ALL SELECT id_b FROM truth
            )
        )
        SELECT d.source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(COUNT(x.doc_id) AS BIGINT) AS n_dup_docs,
               CAST(COUNT(x.doc_id) * 1000000 // COUNT(*) AS BIGINT)
                   AS dup_ppm
        FROM documents d LEFT JOIN dup_ids x ON x.doc_id = d.doc_id
        GROUP BY d.source
    """,
)
def dedup_source_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plan: pair table → explode both endpoints → distinct dup-doc
    ids (pair-sized, tiny) → LEFT join onto the (doc_id, source)
    projection → one aggregate keyed by source. The distinct dup-id
    set is far below any broadcast threshold in practice; integer ppm
    keeps the rate exact on both engines.
    """
    from hadoop_map_reduce_spark.operators.dedup import (
        ngram_jaccard_pairs_prefix,
    )

    docs = load_table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs_prefix(docs, threshold=0.5, n=3)
    dup_ids = (
        pairs.select(F.col("id_a").alias("doc_id"))
        .unionAll(pairs.select(F.col("id_b").alias("doc_id")))
        .distinct()
        .withColumn("_d", F.lit(1))
    )
    return (
        docs.select("doc_id", "source")
        .join(dup_ids, "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.count("_d").cast("long").alias("n_dup_docs"),
        )
        .select(
            "source",
            "n_docs",
            "n_dup_docs",
            F.expr("n_dup_docs * 1000000 DIV n_docs").alias("dup_ppm"),
        )
    )


# DSIR-style importance scoring (Xie et al. 2023, "Data Selection for
# Language Models via Importance Resampling"): hashed-bigram bucket
# distributions for a target domain vs the raw corpus, each doc scored
# by how much its gram mass sits in buckets over-represented in the
# target. The published method uses log-ratios; this engine keeps the
# score integer-exact cross-engine by scoring with ppm DIFFERENCES
# (target_ppm - raw_ppm per bucket, weighted by the doc's bucket
# counts) — same ordering intent (positive = target-like), no libm.
_DSIR_BUCKET = "substr(md5(g), 1, 2)"  # 256 buckets, md5 agrees engine-wise


@register(
    "curation_dsir_score",
    headline=True,
    tags=("llm", "curation", "stats"),
    description=(
        "DSIR-style domain-alignment score: hashed-bigram bucket "
        "distribution of the English-doc target vs the raw corpus "
        "(256 md5-prefix buckets, integer ppm), each doc scored by "
        "sum(count * (target_ppm - raw_ppm)) over its bigrams — the "
        "importance-resampling signal for domain-targeted data selection."
    ),
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, lang, {_DUCK_TOKS} AS t FROM documents
        ), bg AS (
            SELECT doc_id, lang,
                   unnest([t[i] || ' ' || t[i+1]
                           for i in range(1, len(t))]) AS g
            FROM toks WHERE len(t) >= 2
        ), dbc AS (
            SELECT doc_id, lang, {_DSIR_BUCKET} AS b, COUNT(*) AS cnt
            FROM bg GROUP BY 1, 2, 3
        ), rawp AS (
            SELECT b, CAST(SUM(cnt) * 1000000
                           // (SELECT SUM(cnt) FROM dbc) AS BIGINT)
                          AS raw_ppm
            FROM dbc GROUP BY b
        ), tgtp AS (
            SELECT b, CAST(SUM(cnt) * 1000000
                           // (SELECT SUM(cnt) FROM dbc
                               WHERE lang = 'en') AS BIGINT) AS tgt_ppm
            FROM dbc WHERE lang = 'en' GROUP BY b
        )
        SELECT d.doc_id,
               CAST(SUM(d.cnt) AS BIGINT) AS n_grams,
               CAST(SUM(d.cnt * (COALESCE(t.tgt_ppm, 0) - r.raw_ppm))
                    AS BIGINT) AS dsir_score
        FROM dbc d
        JOIN rawp r ON r.b = d.b
        LEFT JOIN tgtp t ON t.b = d.b
        GROUP BY d.doc_id
    """,
)
def curation_dsir_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plan: one gram fan-out projection (text never shuffles) → per-doc
    bucket counts (ONE corpus-keyed aggregation, one-slot-cached: it
    feeds the raw distribution, the target distribution, and the score
    join) → two 256-row distribution tables crossed with their one-row
    totals and BROADCAST into the scoring join → per-doc aggregate.
    Everything after the first aggregation is bucket-table-sized; at
    100 TB the only corpus-scale shuffle is the (doc_id, bucket) count.
    ppm numerators stay under 2^63 until corpus gram counts reach ~9e12
    per bucket; past that, widen to DECIMAL — noted, not hit here.
    """
    from hadoop_map_reduce_spark.functions.text import (
        ngrams,
        sanitize,
        tokenize,
    )
    from hadoop_map_reduce_spark.operators.caching import cache_one_slot

    docs = load_table(spark, sf_dir, "documents")
    toks = tokenize(sanitize(F.col("text")))
    g = docs.select(
        "doc_id", "lang", F.explode(ngrams(toks, 2, " ")).alias("g")
    )
    dbc = cache_one_slot(
        g.select(
            "doc_id", "lang", F.substring(F.md5("g"), 1, 2).alias("b")
        )
        .groupBy("doc_id", "lang", "b")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt")),
        "dsir-doc-bucket",
    )
    # Round-11 (optimization round, guide §2.3 "aggregate before you
    # shuffle" / §1.2): raw and target distributions come out of ONE
    # conditional aggregation over the cached bucket counts (sum +
    # sum-where-en per bucket) and ONE global-total aggregate, instead
    # of two bucket passes and two total passes; the scoring join then
    # broadcasts a single 256-row table carrying both ppm columns
    # (2 broadcast joins -> 1). Integer arithmetic is unchanged: a
    # bucket with no English grams has tc = NULL, so tgt_ppm is NULL
    # and the COALESCE(...,0) below reproduces the old LEFT JOIN.
    dist = dbc.groupBy("b").agg(
        F.sum("cnt").alias("rc"),
        F.sum(F.when(F.col("lang") == "en", F.col("cnt"))).alias("tc"),
    )
    totals = dist.agg(
        F.sum("rc").alias("rtot"), F.sum("tc").alias("ttot")
    )
    ppm = dist.crossJoin(F.broadcast(totals)).select(
        "b",
        F.expr("rc * 1000000 DIV rtot").alias("raw_ppm"),
        F.expr("tc * 1000000 DIV ttot").alias("tgt_ppm"),
    )
    return (
        dbc.join(F.broadcast(ppm), "b")
        .groupBy("doc_id")
        .agg(
            F.sum("cnt").cast("long").alias("n_grams"),
            F.sum(
                F.col("cnt")
                * (F.coalesce(F.col("tgt_ppm"), F.lit(0)) - F.col("raw_ppm"))
            )
            .cast("long")
            .alias("dsir_score"),
        )
    )


@register(
    "pack_global_shuffle",
    headline=True,
    tags=("llm", "curation", "window"),
    description=(
        "Deterministic global training-order shuffle: every doc's exact "
        "0-based position under the md5('s1:' || doc_id) pseudorandom "
        "total order, computed WITHOUT a global sort — two-level "
        "bucketed prefix scan (the scale-safe zipWithIndex shape)."
    ),
    oracle="""
        SELECT doc_id,
               CAST(ROW_NUMBER() OVER (
                   ORDER BY md5('s1:' || CAST(doc_id AS VARCHAR)), doc_id
               ) - 1 AS BIGINT) AS pos
        FROM documents
    """,
)
def pack_global_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plan: operators/relational.global_shuffle_positions — exact
    global positions with NO single-partition exchange: 65536-bucket
    partitioned ranks, within-super bucket offsets (partitioned window
    over the bucket-size table), 256x256 broadcast self-join super
    offsets, pos = super_offset + bucket_offset + in-bucket rank. The
    DuckDB oracle is the plain global ROW_NUMBER this replaces.
    """
    from hadoop_map_reduce_spark.operators.relational import (
        global_shuffle_positions,
    )

    docs = load_table(spark, sf_dir, "documents")
    return global_shuffle_positions(docs, id_col="doc_id", seed="s1:")


# Stopword-presence regex shared by the calibration and Gopher-rule
# gates below — ONE spelling for Spark (Java regex) and the oracles
# (RE2), so the stopword list cannot drift between engine and oracle.
_STOP_RE = r"\b(the|a|of|to|and)\b"


@register(
    "quality_score_calibration",
    tags=("llm", "curation", "window"),
    description=(
        "Per-source quality calibration: each doc's stopword-density "
        "score rank-normalized to a [0, 1e6] percentile WITHIN its "
        "source (FineWeb-style practice — a global quality threshold is "
        "biased by source register, so gates are applied on per-source "
        "percentiles). Integer rank arithmetic, deterministic tie-break."
    ),
    oracle=f"""
        WITH t AS (
            SELECT doc_id, source,
                   len(regexp_extract_all(lower(text), '{_TOKEN_RE}'))
                       AS n_tok,
                   len(regexp_extract_all(lower(text),
                       '{_STOP_RE}')) AS hits
            FROM documents
        ), scored AS (
            SELECT doc_id, source,
                   CAST(hits * 1000000 // n_tok AS BIGINT) AS dens_ppm
            FROM t WHERE n_tok > 0
        ), ranked AS (
            SELECT doc_id, source, dens_ppm,
                   ROW_NUMBER() OVER (
                       PARTITION BY source ORDER BY dens_ppm, doc_id
                   ) AS rk,
                   COUNT(*) OVER (PARTITION BY source) AS n
            FROM scored
        )
        SELECT doc_id, source, dens_ppm,
               CASE WHEN n > 1
                    THEN CAST((rk - 1) * 1000000 // (n - 1) AS BIGINT)
                    ELSE CAST(0 AS BIGINT) END AS pct_ppm
        FROM ranked
    """,
)
def quality_score_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plan: one projection computing the integer stopword-density
    score, ONE window shuffle keyed by source (rank + partition count
    in the same window spec — one exchange), integer percentile. At
    100 TB a skewed source partition splits under AQE; the score stays
    a per-row expression, so nothing else shuffles.
    """
    docs = load_table(spark, sf_dir, "documents")
    n_tok = F.size(_tokens(F.col("text")))
    hits = F.size(
        F.regexp_extract_all(F.lower("text"), F.lit(_STOP_RE), 0)
    )
    scored = docs.select(
        "doc_id",
        "source",
        n_tok.alias("n_tok"),
        hits.alias("hits"),
    ).filter(F.col("n_tok") > 0).select(
        "doc_id",
        "source",
        # hits is int32 from size(); widen before *1e6 — a >2147-hit
        # doc would trip ANSI overflow otherwise.
        F.expr("CAST(hits AS BIGINT) * 1000000 DIV n_tok").alias(
            "dens_ppm"
        ),
    )
    w = Window.partitionBy("source")
    ranked = scored.select(
        "doc_id",
        "source",
        "dens_ppm",
        F.row_number().over(w.orderBy("dens_ppm", "doc_id")).alias("rk"),
        F.count(F.lit(1)).over(w).alias("n"),
    )
    return ranked.select(
        "doc_id",
        "source",
        "dens_ppm",
        # rk is int32 from row_number — widen BEFORE the *1e6 (ANSI
        # overflow at ~2147 rows per source otherwise; caught by the
        # 10x audit, invisible at sf0.01).
        F.expr(
            "CASE WHEN n > 1 THEN CAST(rk - 1 AS BIGINT) * 1000000 "
            "DIV (n - 1) ELSE CAST(0 AS BIGINT) END"
        ).alias("pct_ppm"),
    )


# Exact integer sqrt: float sqrt + one-step correction (float rounding
# near perfect squares is the classic trap — 10^2 coming back 9.999...).
# Identical expression on both engines; exact for n < 2^52.
_ISQRT = (
    "CASE WHEN (_s0 + 1) * (_s0 + 1) <= {n} THEN _s0 + 1 "
    "WHEN _s0 * _s0 > {n} THEN _s0 - 1 ELSE _s0 END"
)


@register(
    "mix_temperature_quota",
    tags=("llm", "curation", "aggregation"),
    description=(
        "Temperature-0.5 mixture quotas: per-source sampling quota "
        "proportional to sqrt(n_docs) (the multilingual-LLM rebalance "
        "that upweights small sources), with an EXACT integer sqrt — "
        "float sqrt + one-step correction — and integer quota division; "
        "budget 200 docs."
    ),
    oracle=f"""
        WITH c AS (
            SELECT source, COUNT(*) AS n FROM documents GROUP BY source
        ), s AS (
            SELECT source, n,
                   CAST(FLOOR(SQRT(CAST(n AS DOUBLE))) AS BIGINT) AS _s0
            FROM c
        ), w AS (
            SELECT source, n,
                   CAST({_ISQRT.format(n='n')} AS BIGINT) AS weight
            FROM s
        )
        SELECT source,
               CAST(n AS BIGINT) AS n_docs,
               weight,
               CAST(200 * weight // (SELECT SUM(weight) FROM w)
                    AS BIGINT) AS quota
        FROM w
    """,
)
def mix_temperature_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plan: one count aggregation keyed by source, exact isqrt as a
    row expression, total weight as a one-row broadcast cross join.
    Output is #sources rows. Largest-remainder top-up is deliberately
    omitted — it needs a global rank over sources; the floor quota
    undershoots the budget by < #sources, which the caller absorbs.
    At temperature 1/2 the weight is exactly isqrt; other rational
    temperatures p/q would use the same correction pattern on the
    q-th root.
    """
    docs = load_table(spark, sf_dir, "documents")
    c = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    s = c.withColumn(
        "_s0", F.floor(F.sqrt(F.col("n").cast("double"))).cast("long")
    )
    w = s.select(
        "source",
        "n",
        F.expr(_ISQRT.format(n="n")).cast("long").alias("weight"),
    )
    tot = w.agg(F.sum("weight").alias("_tw"))
    return w.crossJoin(F.broadcast(tot)).select(
        "source",
        F.col("n").cast("long").alias("n_docs"),
        "weight",
        F.expr("200 * weight DIV _tw").alias("quota"),
    )


@register(
    "curation_gopher_rules",
    tags=("llm", "curation"),
    description=(
        "Gopher-style rule gate (Rae et al. 2021 adapted to integer "
        "arithmetic): word count in [40, 100000], mean word length in "
        "[3, 10] via cross-multiplication, non-alphanumeric character "
        "ratio < 10%, stopword presence — per-doc flags plus the "
        "conjunction, no float thresholds anywhere."
    ),
    oracle=f"""
        WITH t AS (
            SELECT doc_id,
                   regexp_extract_all(lower(text), '{_TOKEN_RE}') AS toks,
                   LENGTH(text) AS n_chars_raw,
                   LENGTH(regexp_replace(text, '[a-z0-9A-Z ]', '', 'g'))
                       AS n_sym,
                   len(regexp_extract_all(lower(text),
                       '{_STOP_RE}')) AS stop_hits
            FROM documents
        ), m AS (
            SELECT doc_id,
                   CAST(len(toks) AS BIGINT) AS n_words,
                   CAST(list_sum([CAST(LENGTH(x) AS BIGINT)
                                  for x in toks]) AS BIGINT) AS sum_len,
                   n_chars_raw, n_sym, stop_hits
            FROM t
        )
        SELECT doc_id,
               n_words,
               COALESCE(sum_len, 0) AS sum_wordlen,
               n_words BETWEEN 40 AND 100000 AS pass_wordcount,
               n_words > 0 AND COALESCE(sum_len, 0) >= 3 * n_words
                   AND COALESCE(sum_len, 0) <= 10 * n_words
                   AS pass_meanlen,
               n_sym * 10 < n_chars_raw AS pass_symbols,
               stop_hits >= 2 AS pass_stopwords,
               (n_words BETWEEN 40 AND 100000)
                   AND n_words > 0
                   AND COALESCE(sum_len, 0) >= 3 * n_words
                   AND COALESCE(sum_len, 0) <= 10 * n_words
                   AND n_sym * 10 < n_chars_raw
                   AND stop_hits >= 2 AS keep
        FROM m
    """,
)
def curation_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plan: pure per-row Column expressions (codegen, embarrassingly
    parallel — the 100-TB shape for a rule gate); the mean-word-length
    bound is the cross-multiplied 3*n <= sum_len <= 10*n so no division
    happens at all. aggregate(...) folds token lengths left-to-right in
    both engines (exact integer sum).
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = _tokens(F.col("text"))
    n_words = F.size(toks).cast("long")
    sum_len = F.coalesce(
        F.aggregate(
            toks,
            F.lit(0).cast("long"),
            lambda acc, x: acc + F.length(x).cast("long"),
        ),
        F.lit(0).cast("long"),
    )
    n_sym = F.length(
        F.regexp_replace(F.col("text"), "[a-z0-9A-Z ]", "")
    ).cast("long")
    n_chars_raw = F.length("text").cast("long")
    stop_hits = F.size(
        F.regexp_extract_all(F.lower("text"), F.lit(_STOP_RE), 0)
    ).cast("long")
    t = docs.select(
        "doc_id",
        n_words.alias("n_words"),
        sum_len.alias("sum_wordlen"),
        n_sym.alias("n_sym"),
        n_chars_raw.alias("n_chars_raw"),
        stop_hits.alias("stop_hits"),
    )
    pass_wordcount = F.col("n_words").between(40, 100000)
    pass_meanlen = (
        (F.col("n_words") > 0)
        & (F.col("sum_wordlen") >= 3 * F.col("n_words"))
        & (F.col("sum_wordlen") <= 10 * F.col("n_words"))
    )
    pass_symbols = F.col("n_sym") * 10 < F.col("n_chars_raw")
    pass_stopwords = F.col("stop_hits") >= 2
    return t.select(
        "doc_id",
        "n_words",
        "sum_wordlen",
        pass_wordcount.alias("pass_wordcount"),
        pass_meanlen.alias("pass_meanlen"),
        pass_symbols.alias("pass_symbols"),
        pass_stopwords.alias("pass_stopwords"),
        (
            pass_wordcount & pass_meanlen & pass_symbols & pass_stopwords
        ).alias("keep"),
    )


@register(
    "manifest_diff",
    tags=("llm", "pipeline", "setop"),
    description=(
        "Dataset-version diff: the doc-level delta between two gate "
        "configurations (min length 100 vs 120 chars AND repetition "
        "ratio gate tightened) — added/removed/kept counts plus the "
        "per-status doc lists' id-sum as a checksum; the release-notes "
        "report for a training-set version bump."
    ),
    oracle=f"""
        WITH t AS (
            SELECT doc_id, n_chars,
                   len(regexp_extract_all(lower(text), '{_TOKEN_RE}'))
                       AS n_tok,
                   len(list_distinct(
                       regexp_extract_all(lower(text), '{_TOKEN_RE}')))
                       AS n_dist
            FROM documents
        ), v1 AS (
            SELECT doc_id FROM t
            WHERE n_chars >= 100 AND n_dist * 2 >= n_tok
        ), v2 AS (
            SELECT doc_id FROM t
            WHERE n_chars >= 120 AND n_dist * 5 >= n_tok * 3
        ), d AS (
            SELECT COALESCE(v1.doc_id, v2.doc_id) AS doc_id,
                   CASE WHEN v1.doc_id IS NULL THEN 'added'
                        WHEN v2.doc_id IS NULL THEN 'removed'
                        ELSE 'kept' END AS status
            FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id
        )
        SELECT status,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(doc_id) AS BIGINT) AS id_checksum
        FROM d GROUP BY status
    """,
)
def manifest_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plan: both manifests from ONE scan projection (the gate columns
    are computed once; the two filters are pushed over the same cached
    narrow table), full-outer equi-join on doc_id, 3-row aggregate with
    an id-sum checksum so the diff is value-verifiable, not just
    count-verifiable. At 100 TB both manifests are id-projections —
    the join ships two long columns, nothing wider.
    """
    from hadoop_map_reduce_spark.operators.caching import cache_one_slot

    docs = load_table(spark, sf_dir, "documents")
    toks = _tokens(F.col("text"))
    t = cache_one_slot(
        docs.select(
            "doc_id",
            "n_chars",
            F.size(toks).alias("n_tok"),
            F.size(F.array_distinct(toks)).alias("n_dist"),
        ),
        "manifest-gates",
    )
    v1 = t.filter(
        (F.col("n_chars") >= 100) & (F.col("n_dist") * 2 >= F.col("n_tok"))
    ).select(F.col("doc_id").alias("_id1"))
    v2 = t.filter(
        (F.col("n_chars") >= 120)
        & (F.col("n_dist") * 5 >= F.col("n_tok") * 3)
    ).select(F.col("doc_id").alias("_id2"))
    d = v1.join(v2, v1["_id1"] == v2["_id2"], "full_outer").select(
        F.coalesce("_id1", "_id2").alias("doc_id"),
        F.when(F.col("_id1").isNull(), "added")
        .when(F.col("_id2").isNull(), "removed")
        .otherwise("kept")
        .alias("status"),
    )
    return d.groupBy("status").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("doc_id").cast("long").alias("id_checksum"),
    )


@register(
    "curation_passage_novelty",
    tags=("llm", "curation", "dedup"),
    description=(
        "Per-doc passage novelty: the fraction (integer ppm) of a "
        "doc's distinct 8-token passages that occur in NO other doc — "
        "high novelty = original text, low = boilerplate/memorized "
        "content; the per-document complement of the corpus-level "
        "shared-passage report."
    ),
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, {_DUCK_TOKS} AS t FROM documents
        ), sh AS (
            SELECT doc_id, {_DUCK_PASSAGES} AS s
            FROM toks WHERE len(t) >= {_P}
        ), u AS (
            SELECT doc_id, unnest(s) AS passage FROM sh
        ), df AS (
            SELECT passage, COUNT(*) AS n_docs
            FROM u GROUP BY passage
        )
        SELECT u.doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_passages,
               CAST(SUM(CASE WHEN df.n_docs = 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_unique,
               CAST(SUM(CASE WHEN df.n_docs = 1 THEN 1 ELSE 0 END)
                    * 1000000 // COUNT(*) AS BIGINT) AS novelty_ppm
        FROM u JOIN df ON df.passage = u.passage
        GROUP BY u.doc_id
    """,
)
def curation_passage_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plan: the per-doc distinct passage table is built ONCE
    (one-slot-cached — it feeds the document-frequency aggregate AND
    the join back), df computed by one passage-keyed aggregation, then
    an equi-join back and a doc-keyed aggregate. Like
    curation_passage_dedup, at 100 TB the passage string shuffle key
    becomes xxhash64(passage) (16-byte keys); the report's integer ppm
    is exact on both engines. Docs with < 8 tokens emit no passages
    and are absent — mirrored by the oracle's len(t) >= 8 gate.
    """
    from hadoop_map_reduce_spark.functions.text import sanitize, tokenize
    from hadoop_map_reduce_spark.operators.caching import cache_one_slot

    docs = load_table(spark, sf_dir, "documents")
    toks = tokenize(sanitize(F.col("text")))
    passages = F.when(
        F.size("t") >= _P,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), F.size("t") - _P),
                lambda i: F.concat_ws(
                    " ", *[F.element_at("t", i + k + 1) for k in range(_P)]
                ),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))
    u = cache_one_slot(
        docs.select("doc_id", toks.alias("t")).select(
            "doc_id", F.explode(passages).alias("passage")
        ),
        "passage-novelty-u",
    )
    df_tbl = u.groupBy("passage").agg(
        F.count(F.lit(1)).cast("long").alias("_df")
    )
    return (
        u.join(df_tbl, "passage")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_passages"),
            F.sum(F.when(F.col("_df") == 1, 1).otherwise(0))
            .cast("long")
            .alias("n_unique"),
        )
        .select(
            "doc_id",
            "n_passages",
            "n_unique",
            F.expr("n_unique * 1000000 DIV n_passages").alias(
                "novelty_ppm"
            ),
        )
    )


# ---------------------------------------------------------------------------
# curation_url_gate (round-7, VERDICT r6 #4): URL-level curation between
# crawl ingestion and the quality funnel
# ---------------------------------------------------------------------------
#
# The C4/CCNet-shaped gate a crawl corpus passes BEFORE text quality:
#   1. provenance parsing — host via parse_url (JVM codegen), registered
#      domain = last two host labels (public-suffix-list stand-in);
#   2. domain blocklist — broadcast anti-join against banned registered
#      domains (the adult/ads/spam list in production);
#   3. the C4 "at least 3 sentences" rule — the corpus is synthetic word
#      salad with no punctuation, so both engines first build the SAME
#      deterministic page text (plain non-regex replace of two delimiter
#      words with '. '), then count terminal periods; the RULE is real,
#      the sentence synthesizer is the documented stand-in (same stance
#      as the _html_wrap_col device);
#   4. per-registered-domain frequency cap — keep the 5 docs with the
#      lowest (md5(text), doc_id) per domain, one window shuffle.
# All three gates fire at every SF (measured r7: blocklist ~30 docs,
# sentence rule cuts ~42%, cap trims 21/31/2411 docs at
# sf0.001/0.01/0.1).

_URL_BLOCKLIST = ("src3.com", "src7.cn", "src12.com", "src5.de")

_URL_TLD_SQL = (
    "CASE lang WHEN 'en' THEN 'com' WHEN 'de' THEN 'de' "
    "WHEN 'fr' THEN 'fr' WHEN 'es' THEN 'es' ELSE 'cn' END"
)


def _url_gate_oracle() -> str:
    blocked = ", ".join(f"'{d}'" for d in _URL_BLOCKLIST)
    return f"""
        WITH u AS (
            SELECT doc_id, text,
                   'https://'
                       || CASE WHEN doc_id % 2 = 0 THEN 'www.' ELSE '' END
                       || source || '.' || {_URL_TLD_SQL}
                       || '/p/' || CAST(doc_id AS VARCHAR)
                       || '?ref=crawl' AS url
            FROM documents
        ), h AS (
            SELECT doc_id, text,
                   regexp_extract(url, '^https://([^/]+)', 1) AS host
            FROM u
        ), d AS (
            SELECT doc_id, text, host,
                   regexp_extract(host, '[^.]+\\.[^.]+$', 0)
                       AS registered_domain
            FROM h
            WHERE regexp_extract(host, '[^.]+\\.[^.]+$', 0)
                      NOT IN ({blocked})
        ), s AS (
            SELECT doc_id, text, host, registered_domain,
                   CAST(length(p) - length(replace(p, '.', ''))
                        AS BIGINT) AS n_sentences
            FROM (SELECT *,
                      replace(replace(text, ' table ', '. '),
                              ' value ', '. ') AS p
                  FROM d)
        ), ranked AS (
            SELECT doc_id, host, registered_domain, n_sentences,
                   CAST(ROW_NUMBER() OVER (
                       PARTITION BY registered_domain
                       ORDER BY md5(text), doc_id) AS BIGINT)
                       AS domain_rank
            FROM s
            WHERE n_sentences >= 3
        )
        SELECT doc_id, host, registered_domain, n_sentences, domain_rank
        FROM ranked WHERE domain_rank <= 5
    """


@register(
    "curation_url_gate",
    tags=("llm", "curation", "text"),
    description=(
        "URL-level curation gate (C4/CCNet shape): parse_url host "
        "extraction, registered-domain derivation, domain blocklist, "
        "the C4 3-sentence rule over a deterministic synthesized page, "
        "and a per-registered-domain frequency cap (keep 5 by "
        "(md5(text), doc_id)) — the crawl-side filters between WARC "
        "extraction (pipeline_crawl_extract) and the text quality "
        "funnel, hash-pinned end to end."
    ),
    oracle=_url_gate_oracle(),
)
def curation_url_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """100-TB shape: gates 1–3 are pure per-row codegen in the scan
    stage (parse_url is a JVM expression; the blocklist is a literal
    IN-filter here — a real list is a broadcast anti-join, same plan
    class); the only shuffle is the window on registered_domain, whose
    key count is the domain population (bounded, well-distributed after
    the upstream cuts). Filters run in C4 order: provenance, blocklist,
    sentence rule, THEN the cap — so the cap ranks only survivors."""
    docs = load_table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"),
        F.when(F.col("doc_id") % 2 == 0, F.lit("www.")).otherwise(F.lit("")),
        F.col("source"),
        F.lit("."),
        F.when(F.col("lang") == "en", F.lit("com"))
        .when(F.col("lang") == "de", F.lit("de"))
        .when(F.col("lang") == "fr", F.lit("fr"))
        .when(F.col("lang") == "es", F.lit("es"))
        .otherwise(F.lit("cn")),
        F.lit("/p/"),
        F.col("doc_id").cast("string"),
        F.lit("?ref=crawl"),
    )
    host = F.parse_url(url, F.lit("HOST"))
    registered = F.regexp_extract(host, r"[^.]+\.[^.]+$", 0)
    page = F.replace(
        F.replace(F.col("text"), F.lit(" table "), F.lit(". ")),
        F.lit(" value "),
        F.lit(". "),
    )
    n_sentences = (
        F.length(page) - F.length(F.replace(page, F.lit("."), F.lit("")))
    ).cast("long")
    gated = (
        docs.select(
            "doc_id",
            "text",
            host.alias("host"),
            registered.alias("registered_domain"),
            n_sentences.alias("n_sentences"),
        )
        .filter(~F.col("registered_domain").isin(*_URL_BLOCKLIST))
        .filter(F.col("n_sentences") >= 3)
    )
    w = Window.partitionBy("registered_domain").orderBy(
        F.md5(F.col("text").cast("binary")), F.col("doc_id")
    )
    return (
        gated.withColumn(
            "domain_rank", F.row_number().over(w).cast("long")
        )
        .filter(F.col("domain_rank") <= 5)
        .select(
            "doc_id",
            "host",
            "registered_domain",
            "n_sentences",
            "domain_rank",
        )
    )


# ---------------------------------------------------------------------------
# curation_url_normalize_dedup (round-7): URL canonicalization + exact
# URL dedup — the fetch-list dedup every crawler runs BEFORE fetching
# ---------------------------------------------------------------------------
#
# Synthetic raw URLs are built with the messiness the normalizer must
# erase (both engines build the IDENTICAL string): mixed-case hosts
# (doc_id%7), trailing slashes (doc_id%4), utm_* tracking params in
# first (doc_id%3=0) or last (doc_id%3=1) query position, fragments
# (doc_id%5). Normalization: host lowercased (host ONLY — path/query
# case is significant in general; these shapes keep them lowercase
# already), fragment dropped, utm_* params stripped (single-utm shapes;
# a repeated-utm production rule iterates the same patterns), bare '?'
# collapsed, trailing path slash trimmed. Mirror collisions are forced
# by pathing on doc_id % 50, so the dedup genuinely fires. Replacement
# backreference syntax differs per engine ($1 Java, \1 RE2) — the
# PATTERNS are shared, the hash compare pins the semantics.

_RAW_URL_SQL = """
    'https://' || CASE WHEN doc_id % 7 = 0 THEN upper(source)
                       ELSE source END || '.Example.COM/p/'
        || CAST(doc_id % 50 AS VARCHAR)
        || CASE WHEN doc_id % 4 = 0 THEN '/' ELSE '' END
        || CASE WHEN doc_id % 3 = 0 THEN '?utm_source=feed&id=7'
                WHEN doc_id % 3 = 1 THEN '?id=7&utm_campaign=x'
                ELSE '' END
        || CASE WHEN doc_id % 5 = 0 THEN '#sec' ELSE '' END
"""


@register(
    "curation_url_normalize_dedup",
    tags=("llm", "curation", "dedup"),
    description=(
        "URL canonicalization (lowercase host, drop fragment, strip "
        "utm_* tracking params, collapse bare '?', trim trailing path "
        "slash) followed by exact fetch-list dedup: one row per "
        "canonical URL with the duplicate count and the kept (minimum) "
        "doc_id — the dedup a crawler runs before spending fetch "
        "bandwidth, all scan-stage regex codegen plus one group-by."
    ),
    oracle=f"""
        WITH raw AS (
            SELECT doc_id, {_RAW_URL_SQL} AS u FROM documents
        ), parts AS (
            SELECT doc_id,
                   lower(regexp_extract(u, '^https://([^/]+)', 1))
                       AS host,
                   regexp_extract(u, '^https://[^/]+(.*)$', 1) AS rest
            FROM raw
        ), norm AS (
            SELECT doc_id, 'https://' || host ||
                regexp_replace(
                    regexp_replace(
                        regexp_replace(
                            regexp_replace(
                                regexp_replace(rest, '#.*$', '', 'g'),
                                '([?&])utm_[^&]*&', '\\1', 'g'),
                            '[?&]utm_[^&]*$', '', 'g'),
                        '\\?$', '', 'g'),
                    '/+(\\?|$)', '\\1', 'g') AS url
            FROM parts
        )
        SELECT url, CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(MIN(doc_id) AS BIGINT) AS kept_doc_id
        FROM norm GROUP BY url
    """,
)
def curation_url_normalize_dedup(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """All normalization is JVM regex codegen in the scan stage; the
    only shuffle is the canonical-URL group-by (partial-agg'd). At
    100 TB this is the frontier dedup: the URL never leaves the scan
    task un-normalized, and the shuffle carries one digest-sized key
    per URL."""
    docs = load_table(spark, sf_dir, "documents")
    raw = F.concat(
        F.lit("https://"),
        F.when(
            F.col("doc_id") % 7 == 0, F.upper(F.col("source"))
        ).otherwise(F.col("source")),
        F.lit(".Example.COM/p/"),
        (F.col("doc_id") % 50).cast("string"),
        F.when(F.col("doc_id") % 4 == 0, F.lit("/")).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 3 == 0, F.lit("?utm_source=feed&id=7")
        )
        .when(F.col("doc_id") % 3 == 1, F.lit("?id=7&utm_campaign=x"))
        .otherwise(F.lit("")),
        F.when(F.col("doc_id") % 5 == 0, F.lit("#sec")).otherwise(
            F.lit("")
        ),
    )
    host = F.lower(F.regexp_extract(raw, r"^https://([^/]+)", 1))
    rest = F.regexp_extract(raw, r"^https://[^/]+(.*)$", 1)
    rest = F.regexp_replace(rest, r"#.*$", "")
    rest = F.regexp_replace(rest, r"([?&])utm_[^&]*&", "$1")
    rest = F.regexp_replace(rest, r"[?&]utm_[^&]*$", "")
    rest = F.regexp_replace(rest, r"\?$", "")
    rest = F.regexp_replace(rest, r"/+(\?|$)", "$1")
    url = F.concat(F.lit("https://"), host, rest)
    return (
        docs.select("doc_id", url.alias("url"))
        .groupBy("url")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.min("doc_id").cast("long").alias("kept_doc_id"),
        )
    )


# ---------------------------------------------------------------------------
# Round-8: tokenizer vocabulary coverage (OOV census)
# ---------------------------------------------------------------------------


@register(
    "tokenizer_oov_census",
    tags=("llm", "curation", "text", "topk"),
    description=(
        "Out-of-vocabulary census: vocabulary = top-512 corpus tokens "
        "by (count DESC, token ASC); per language, total token "
        "instances, OOV instances, and integer-ppm OOV rate — the "
        "coverage report that decides whether a tokenizer's vocab "
        "budget fits a corpus before training starts."
    ),
    oracle=f"""
        WITH tok AS (
            SELECT lang,
                   unnest(regexp_extract_all(lower(text),
                                             '{_TOKEN_RE}')) AS t
            FROM documents),
        vocab AS (
            SELECT t FROM (
                SELECT t, COUNT(*) AS cnt FROM tok GROUP BY t)
            ORDER BY cnt DESC, t ASC LIMIT 512)
        SELECT lang,
               CAST(COUNT(*) AS BIGINT) AS n_tokens,
               CAST(SUM(CASE WHEN vocab.t IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_oov,
               CAST(SUM(CASE WHEN vocab.t IS NULL THEN 1 ELSE 0 END)
                    * 1000000 // COUNT(*) AS BIGINT) AS oov_ppm
        FROM tok LEFT JOIN vocab ON vocab.t = tok.t
        GROUP BY lang
    """,
)
def tokenizer_oov_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two corpus passes (vocabulary build, coverage scan) — the vocab
    is a TakeOrdered top-512 broadcast back as a membership flag, so
    the coverage pass is scan + broadcast-hash lookup + one lang-keyed
    aggregate. The top-k tie-break (count DESC, token ASC) is a total
    order: the vocabulary set is identical cross-engine, making the
    ppm census hash-exact."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "lang", F.explode(_tokens(F.col("text"))).alias("t")
    )
    vocab = (
        tok.groupBy("t")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("t").asc())
        .limit(512)
        .select("t", F.lit(True).alias("in_vocab"))
    )
    flagged = tok.join(F.broadcast(vocab), "t", "left")
    n_oov = F.sum(
        F.when(F.col("in_vocab").isNull(), 1).otherwise(0)
    ).cast("long")
    return flagged.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        n_oov.alias("n_oov"),
        F.floor(
            F.sum(F.when(F.col("in_vocab").isNull(), 1).otherwise(0))
            * 1_000_000
            / F.count(F.lit(1))
        )
        .cast("long")
        .alias("oov_ppm"),
    )
