"""Driver-checkable companion queries for the rows-only operator
families (round-5 VERDICT next-round #2).

The ANN ladder (LSH / IVF / PQ), DTW, and the ZIP source carry
rows-only or tests-only standing because their headline outputs are
float-ranked top-k lists (recall < 1 by construction) or need
filesystem fixtures. Each family's CORE ARITHMETIC, however, is
exactly pinnable: quantize the float inputs to integers with a
cross-engine-exact device (``round(x*1e6)`` micro-units, the proven
``embedding_random_projection`` pattern), drive the REAL operator code
path with them, and emit integer censuses a DuckDB oracle can
recompute bit-for-bit. The float recall itself stays pinned by the
brute-force-bound tests; these queries give every family a green
driver CORRECTNESS row for the deterministic machinery underneath.

Pattern precedent: ``embedding_quantize_int8`` and
``multimodal_resize_audit`` (round-4/5 greens).
"""

from __future__ import annotations

import hashlib
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_map_reduce_spark.plans.registry import register
from hadoop_map_reduce_spark.session import load_table

_E6_SQL = (
    "[CAST(ROUND(CAST(x AS DOUBLE) * 1000000) AS BIGINT) "
    "for x in embedding]"
)


def _e6_col(vec_col: str = "embedding"):
    """round(x*1e6) BIGINT micro-units — exact on both engines (one
    widen, one multiply, one round; IEEE ops agree bit-for-bit)."""
    return F.transform(
        F.col(vec_col).cast("array<double>"),
        lambda x: F.round(x * 1e6).cast("long"),
    )


# ---------------------------------------------------------------------------
# ann_lsh_bucket_census — pins lsh_bucket's sign/bit-packing arithmetic
# ---------------------------------------------------------------------------

_LSH_PLANES = 8
_LSH_DIM = 64


def _lsh_sign_planes() -> list[list[int]]:
    """±1 planes from the md5-derived Achlioptas matrix (the
    ``rp_sign_matrix`` source literals, transposed to plane-major)."""
    from hadoop_map_reduce_spark.operators.similarity import rp_sign_matrix

    signs = rp_sign_matrix(_LSH_DIM, _LSH_PLANES)
    return [
        [signs[i][j] for i in range(_LSH_DIM)] for j in range(_LSH_PLANES)
    ]


def _lsh_census_oracle() -> str:
    planes = _lsh_sign_planes()
    bits = " + ".join(
        "CASE WHEN list_sum([e6[i] * ([{lits}])[i] "
        "for i in generate_series(1, {dim})]) >= 0 "
        "THEN {weight} ELSE 0 END".format(
            lits=", ".join(str(x) for x in planes[j]),
            dim=_LSH_DIM,
            weight=1 << j,
        )
        for j in range(_LSH_PLANES)
    )
    return f"""
        WITH e AS (
            SELECT vec_id, label, {_E6_SQL} AS e6 FROM embeddings
        )
        SELECT CAST({bits} AS BIGINT) AS bucket,
               CAST(COUNT(*) AS BIGINT) AS n_vecs,
               CAST(COUNT(DISTINCT label) AS BIGINT) AS n_labels,
               CAST(MIN(vec_id) AS BIGINT) AS min_vec_id
        FROM e
        GROUP BY 1
    """


@register(
    "ann_lsh_bucket_census",
    tags=("llm", "similarity", "aggregation"),
    description=(
        "Driver-checkable companion of similarity_ann_lsh: run the REAL "
        "lsh_bucket operator (sign bits of plane dot products, packed "
        "little-endian) over 1e6-quantized integer coordinates with ±1 "
        "md5-derived planes, then census each bucket (size, distinct "
        "labels, min id) — the sign/packing arithmetic the rows-only "
        "top-k query rides on, hash-pinned cross-engine."
    ),
    oracle=_lsh_census_oracle(),
)
def ann_lsh_bucket_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer dot products (|Σ e6·±1| ≤ 64·6e5 ≪ 2^53) are exact in
    lsh_bucket's double fold, so the ``dot >= 0`` sign decisions — and
    therefore every packed bucket id — match DuckDB's BIGINT arithmetic
    bit-for-bit. One shuffle-free scan + one partial-agg'd groupBy;
    the 256-bucket census is the LSH load-balance audit you run before
    trusting the banded join at corpus scale."""
    from hadoop_map_reduce_spark.operators.similarity import lsh_bucket

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", _e6_col().cast("array<double>").alias("_e6d")
    )
    b = lsh_bucket(
        emb,
        dim=_LSH_DIM,
        n_planes=_LSH_PLANES,
        vec_col="_e6d",
        planes=[[float(x) for x in p] for p in _lsh_sign_planes()],
    )
    return b.groupBy(F.col("bucket").cast("long").alias("bucket")).agg(
        F.count(F.lit(1)).cast("long").alias("n_vecs"),
        F.countDistinct("label").cast("long").alias("n_labels"),
        F.min("vec_id").cast("long").alias("min_vec_id"),
    )


# ---------------------------------------------------------------------------
# pq_code_census — pins pq_encode's argmin + nibble packing
# ---------------------------------------------------------------------------

_PQ_M = 8
_PQ_KSUB = 16
_PQ_DSUB = 8


def _pq_census_books() -> list[list[list[float]]]:
    """Crafted integer codebooks spanning the e6 coordinate range
    (|x| ≤ ~6e5): cent(j,c,p) = (((c*37 + p*11 + j*5) % 21) - 10) * 5e4.
    Source literals — the identical constants are baked into the SQL."""
    return [
        [
            [
                float((((c * 37 + p * 11 + j * 5) % 21) - 10) * 50000)
                for p in range(_PQ_DSUB)
            ]
            for c in range(_PQ_KSUB)
        ]
        for j in range(_PQ_M)
    ]


def _pq_census_oracle() -> str:
    books = _pq_census_books()
    selects = []
    for j in range(_PQ_M):
        off = j * _PQ_DSUB
        cands = ", ".join(
            "[list_sum([(e6[{off} + i] - ([{lits}])[i]) * "
            "(e6[{off} + i] - ([{lits}])[i]) "
            "for i in generate_series(1, {dsub})]), {c}]".format(
                off=off,
                lits=", ".join(str(int(x)) for x in books[j][c]),
                dsub=_PQ_DSUB,
                c=c,
            )
            for c in range(_PQ_KSUB)
        )
        selects.append(
            f"SELECT vec_id, CAST({j} AS BIGINT) AS subspace, "
            f"CAST((list_sort([{cands}]))[1][2] AS BIGINT) AS code FROM e"
        )
    union = "\n            UNION ALL\n            ".join(selects)
    return f"""
        WITH e AS (
            SELECT vec_id, {_E6_SQL} AS e6 FROM embeddings
        ), u AS (
            {union}
        )
        SELECT subspace, code,
               CAST(COUNT(*) AS BIGINT) AS n_vecs,
               CAST(SUM(vec_id) AS BIGINT) AS sum_vec_ids
        FROM u
        GROUP BY 1, 2
    """


@register(
    "pq_code_census",
    tags=("llm", "similarity", "aggregation"),
    description=(
        "Driver-checkable companion of similarity_pq: run the REAL "
        "pq_encode operator (per-subspace squared-L2 argmin via the "
        "transform-argmin device, nibble packing) over 1e6-quantized "
        "integer coordinates against crafted integer codebooks, then "
        "census every (subspace, code) cell — the encode arithmetic "
        "the rows-only ADC query rides on, hash-pinned cross-engine. "
        "Codebook TRAINING stays pinned by the kmeans-parity tests."
    ),
    oracle=_pq_census_oracle(),
)
def pq_code_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Squared-L2 terms ((a-b)^2 ≤ 1.3e12, 8-term sums ≤ 1e13 ≪ 2^53)
    are exact in pq_encode's double fold, argmin ties break to the
    lower code on both engines (first-index argmin vs lexicographic
    list_sort), so every packed code matches DuckDB's BIGINT replay.
    One shuffle-free encode scan + one partial-agg'd groupBy; the
    census is the codebook-balance audit (dead codes, hot cells) a
    real PQ index build runs before committing the layout."""
    from hadoop_map_reduce_spark.operators.pq import _code_at, pq_encode

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", _e6_col().cast("array<double>").alias("_e6d")
    )
    codes = pq_encode(
        emb, _pq_census_books(), vec_col="_e6d", id_col="vec_id"
    )
    pairs = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(j).cast("long").alias("subspace"),
                    _code_at(F.col("pq_codes"), j)
                    .cast("long")
                    .alias("code"),
                )
                for j in range(_PQ_M)
            ]
        )
    )
    return (
        codes.select("pq_id", pairs.alias("_p"))
        .select("pq_id", "_p.subspace", "_p.code")
        .groupBy("subspace", "code")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_vecs"),
            F.sum("pq_id").cast("long").alias("sum_vec_ids"),
        )
    )


# ---------------------------------------------------------------------------
# ivf_cell_census — pins the IVF sample + argmin assignment
# ---------------------------------------------------------------------------

_IVF_CELLS = 16


def _ivf_census_oracle(assign_where: str = "") -> str:
    """Shared builder for the IVF cell-census oracle; ``assign_where``
    restricts the ASSIGNMENT side only (the filtered-ANN twin) while
    centroids always sample from the full corpus — parameterized so the
    exact-arithmetic devices (md5 ordering, d2 formula, rn tie rule)
    stay character-identical across both registrations. The base CTE
    always exposes ``label`` (unused when no WHERE — result-identical
    to the pre-parameterized oracle)."""
    return f"""
        WITH e AS (
            SELECT vec_id, label, {_E6_SQL} AS e6 FROM embeddings
        ), cent AS (
            SELECT vec_id AS cvid, e6 AS ce6,
                   CAST(ROW_NUMBER() OVER (
                       ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
                   ) - 1 AS BIGINT) AS crank
            FROM e
            ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
            LIMIT {_IVF_CELLS}
        ), d AS (
            SELECT e.vec_id, c.crank, c.cvid,
                   list_sum([(e.e6[i] - c.ce6[i]) * (e.e6[i] - c.ce6[i])
                             for i in generate_series(1, 64)]) AS d2
            FROM e, cent c
            {assign_where}
        ), b AS (
            SELECT vec_id, crank, cvid, d2,
                   ROW_NUMBER() OVER (
                       PARTITION BY vec_id ORDER BY d2, crank
                   ) AS rn
            FROM d
        )
        SELECT crank AS cell_rank,
               CAST(cvid AS BIGINT) AS centroid_vec_id,
               CAST(COUNT(*) AS BIGINT) AS n_assigned,
               CAST(SUM(d2) AS BIGINT) AS sum_min_d2
        FROM b WHERE rn = 1
        GROUP BY 1, 2
    """


@register(
    "ivf_cell_census",
    tags=("llm", "similarity", "aggregation"),
    description=(
        "Driver-checkable companion of similarity_ivf: md5-sampled "
        "bounded centroid list, argmin cell assignment over broadcast "
        "literal centroids (the struct-argsort device ivf_topk uses), "
        "per-cell census — all in exact 1e6-quantized integer "
        "arithmetic, hash-pinned cross-engine; ivf_topk's float-cosine "
        "recall stays pinned by the brute-force tests."
    ),
    oracle=_ivf_census_oracle(),
)
def ivf_cell_census_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plan: operators/similarity.ivf_cell_census — one bounded collect
    (16 centroid rows), one shuffle-free assignment scan, one
    partial-agg'd groupBy. The census is the cell-balance audit (empty
    cells, hot cells) an IVF index build runs before trusting n_probe."""
    from hadoop_map_reduce_spark.operators.similarity import (
        ivf_cell_census,
    )

    return ivf_cell_census(
        load_table(spark, sf_dir, "embeddings"), n_cells=_IVF_CELLS
    )


# ---------------------------------------------------------------------------
# timeseries_dtw_bounded — pins the banded-DTW dynamic program
# ---------------------------------------------------------------------------

_DTW_LEN = 12
_DTW_BAND = 3


def _dtw_oracle() -> str:
    """Unrolled banded-DTW DP over length-{_DTW_LEN} integer series as
    nested projections: cell c_i_j = |va[i]-vb[j]| + LEAST(generated
    predecessors), exactly ``dtw_banded``'s recurrence (out-of-band
    predecessors are INF there, absent here; (1,1) uses the virtual
    prev[0]=0). Machine-generated, integer-exact."""
    n, band = _DTW_LEN, _DTW_BAND
    cells: set[tuple[int, int]] = set()
    layers: list[str] = []
    for i in range(1, n + 1):
        exprs = []
        for j in range(max(1, i - band), min(n, i + band) + 1):
            preds = [
                f"c_{pi}_{pj}"
                for pi, pj in ((i - 1, j), (i, j - 1), (i - 1, j - 1))
                if (pi, pj) in cells
            ]
            cost = f"ABS(va[{i}] - vb[{j}])"
            if i == 1 and j == 1:
                exprs.append(f"{cost} AS c_1_1")
            else:
                assert preds, (i, j)
                prev = (
                    preds[0]
                    if len(preds) == 1
                    else f"LEAST({', '.join(preds)})"
                )
                exprs.append(f"{cost} + {prev} AS c_{i}_{j}")
            cells.add((i, j))
        layers.append(", ".join(exprs))
    inner = "SELECT id_a, id_b, va, vb FROM p"
    for layer in layers:
        inner = f"SELECT *, {layer} FROM ({inner})"
    return f"""
        WITH types AS (
            SELECT DISTINCT event_type FROM events
        ), grid AS (
            SELECT t.event_type, g.h
            FROM types t
            CROSS JOIN (SELECT unnest(generate_series(0, {n - 1})) AS h) g
        ), cnt AS (
            SELECT event_type,
                   CAST(EXTRACT(hour FROM ts) AS BIGINT) AS h,
                   CAST(COUNT(*) AS BIGINT) AS v
            FROM events WHERE EXTRACT(hour FROM ts) < {n}
            GROUP BY 1, 2
        ), s AS (
            SELECT g.event_type, g.h, CAST(COALESCE(c.v, 0) AS BIGINT) AS v
            FROM grid g LEFT JOIN cnt c USING (event_type, h)
        ), arr AS (
            SELECT event_type, list(v ORDER BY h) AS vals
            FROM s GROUP BY 1
        ), p AS (
            SELECT a.event_type AS id_a, a.vals AS va,
                   b.event_type AS id_b, b.vals AS vb
            FROM arr a JOIN arr b ON a.event_type < b.event_type
        )
        SELECT id_a, id_b, CAST(c_{n}_{n} AS BIGINT) AS dtw
        FROM ({inner})
    """


@register(
    "timeseries_dtw_bounded",
    tags=("timeseries",),
    description=(
        "Driver-checkable companion of timeseries_dtw: banded DTW "
        "(band=3) between the 5 event types' hour-0..11 count profiles "
        "— bounded equal-length integer series, so the per-pair dynamic "
        "program is exactly replayable as an unrolled SQL DP and the "
        "mapInPandas operator earns a hash-match, not just a rows-only "
        "row."
    ),
    oracle=_dtw_oracle(),
)
def timeseries_dtw_bounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plan: one partial-agg'd count shuffle builds the series (dense
    hour grid via a literal-bounded cross join), then
    operators/dtw.dtw_distance_pairs runs the real Arrow-batched DP on
    the 10 type pairs — per-pair work bounded by series length, never
    corpus size."""
    from hadoop_map_reduce_spark.operators.dtw import dtw_distance_pairs

    events = load_table(spark, sf_dir, "events")
    types = events.select(F.col("event_type").alias("t")).distinct()
    hours = spark.range(_DTW_LEN).select(F.col("id").cast("int").alias("h"))
    cnt = (
        events.filter(F.hour("ts") < _DTW_LEN)
        .groupBy(
            F.col("event_type").alias("t"), F.hour("ts").alias("h")
        )
        .agg(F.count(F.lit(1)).alias("v"))
    )
    series = (
        types.crossJoin(hours)
        .join(cnt, ["t", "h"], "left")
        .select(
            F.col("t").alias("event_type"),
            "h",
            F.coalesce("v", F.lit(0)).cast("long").alias("v"),
        )
    )
    return dtw_distance_pairs(
        series, band=_DTW_BAND, id_col="event_type", time_col="h",
        value_col="v",
    )


# ---------------------------------------------------------------------------
# zip_roundtrip_census — earns the O3 ZIP source a driver CORRECTNESS row
# ---------------------------------------------------------------------------


@register(
    "zip_roundtrip_census",
    tags=("reference", "source"),
    description=(
        "ZIP source/sink roundtrip census (SURVEY.md §2 O3): write the "
        "first 40 documents as ZIP entries via the zipentries writer, "
        "read them back through the PySpark-4 DataSource reader "
        "(central-directory planning, per-entry inflate), and emit "
        "(entry, byte length, md5 digest) — the DuckDB oracle computes "
        "the same digests from the documents table directly, so the "
        "whole compress/decompress path is hash-pinned."
    ),
    oracle="""
        SELECT 'doc_' || CAST(doc_id AS VARCHAR) || '.txt' AS entry,
               CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
               md5(text) AS digest
        FROM (SELECT doc_id, text FROM documents ORDER BY doc_id LIMIT 40)
    """,
)
def zip_roundtrip_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 40-doc fixture is built fresh per call in a pid-keyed temp
    dir (no cross-process races, no stale archives: the dir is removed
    first). The read side is the REAL O3 path — metadata-only split
    planning, per-entry decompress on executors — exercised end-to-end
    against content that never came from a checked-in fixture."""
    from hadoop_map_reduce_spark.sources.zip_datasource import (
        register_zip_datasource,
    )

    register_zip_datasource(spark)
    out_dir = os.path.join(
        tempfile.gettempdir(),
        "hmrs_zipround_{}_{}".format(
            os.getpid(), hashlib.md5(sf_dir.encode()).hexdigest()[:8]
        ),
    )
    shutil.rmtree(out_dir, ignore_errors=True)
    docs = load_table(spark, sf_dir, "documents").orderBy("doc_id").limit(40)
    entries = docs.select(
        F.concat(
            F.lit("doc_"), F.col("doc_id").cast("string"), F.lit(".txt")
        ).alias("entry"),
        F.col("text").cast("binary").alias("content"),
    )
    entries.repartition(4).write.format("zipentries").mode(
        "overwrite"
    ).save(out_dir)
    back = spark.read.format("zipentries").load(
        os.path.join(out_dir, "*.zip")
    )
    return back.select(
        "entry",
        F.col("size").cast("long").alias("n_bytes"),
        F.md5("content").alias("digest"),
    )


# ---------------------------------------------------------------------------
# join_bloom_semi — broadcast Bloom pre-filter, row-identical to semi join
# ---------------------------------------------------------------------------


@register(
    "join_bloom_semi",
    headline=True,
    tags=("relational", "join"),
    description=(
        "Exact semi-join behind a broadcast Bloom pre-filter "
        "(operators/bloom.bloom_semi_join): urgent-order lineitems by "
        "return flag. The bitmap drops non-matching probe rows BEFORE "
        "the shuffle (the 100-TB shuffle-volume lever when the build "
        "side exceeds the row-broadcast threshold but its key set fits "
        "a megabit); the exact join on the survivors removes false "
        "positives, so the result is row-identical to the plain semi "
        "join — which is the oracle."
    ),
    oracle="""
        SELECT l.l_returnflag AS return_flag,
               CAST(COUNT(*) AS BIGINT) AS n_items,
               CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT))
                    AS BIGINT) AS revenue_cents
        FROM lineitem l
        WHERE l.l_orderkey IN (
            SELECT o_orderkey FROM orders
            WHERE o_orderpriority = '1-URGENT'
        )
        GROUP BY 1
    """,
)
def join_bloom_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plan shape: bitmap build = one partial-agg'd bit_or shuffle over
    <= n_bits/64 word groups; probe = whole-stage-codegen membership
    arithmetic against ONE broadcast array row; only the pre-filter
    survivors reach the exact semi join's shuffle."""
    from hadoop_map_reduce_spark.operators.bloom import bloom_semi_join

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_returnflag", "l_extendedprice"
    )
    keys = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_orderkey").alias("l_orderkey"))
    )
    return (
        bloom_semi_join(li, keys, "l_orderkey", n_bits=1 << 18)
        .groupBy(F.col("l_returnflag").alias("return_flag"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_items"),
            F.sum(
                F.round(F.col("l_extendedprice") * 100).cast("long")
            ).cast("long").alias("revenue_cents"),
        )
    )


# ---------------------------------------------------------------------------
# interval_union_days — gaps-and-islands union-length aggregation
# ---------------------------------------------------------------------------


@register(
    "interval_union_days",
    headline=True,
    tags=("relational", "window"),
    description=(
        "Union-length of half-open day intervals per supplier "
        "(operators/relational.interval_union_length): each lineitem "
        "contributes [ship_day, ship_day + linenumber%7 + 1); "
        "overlapping/touching intervals merge into islands, and the "
        "query reports islands and total covered days — the classic "
        "billing/coverage aggregation, all windows key-partitioned."
    ),
    oracle="""
        WITH iv AS (
            SELECT DISTINCT l_suppkey AS k,
                   CAST(date_diff('day', DATE '1970-01-01',
                                  CAST(l_shipdate AS DATE)) AS BIGINT) AS s,
                   CAST(date_diff('day', DATE '1970-01-01',
                                  CAST(l_shipdate AS DATE))
                        + (l_linenumber % 7) + 1 AS BIGINT) AS e
            FROM lineitem
        ), f AS (
            SELECT k, s, e,
                   CASE WHEN MAX(e) OVER (
                            PARTITION BY k ORDER BY s, e
                            ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND 1 PRECEDING) IS NULL
                        OR s > MAX(e) OVER (
                            PARTITION BY k ORDER BY s, e
                            ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND 1 PRECEDING)
                        THEN 1 ELSE 0 END AS new_island
            FROM iv
        ), g AS (
            SELECT k, s, e,
                   SUM(new_island) OVER (
                       PARTITION BY k ORDER BY s, e
                       ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS island
            FROM f
        ), i AS (
            SELECT k, island, MAX(e) - MIN(s) AS len
            FROM g GROUP BY 1, 2
        )
        SELECT k AS l_suppkey,
               CAST(COUNT(*) AS BIGINT) AS n_islands,
               CAST(SUM(len) AS BIGINT) AS covered
        FROM i GROUP BY 1
    """,
)
def interval_union_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day arithmetic is calendar-pure (datediff from the epoch DATE, no
    timezone-dependent unix seconds), durations are small exact ints,
    and the operator dedups (k, s, e) first so the window order is a
    deterministic total order — every piece hash-matches cross-engine."""
    from hadoop_map_reduce_spark.operators.relational import (
        interval_union_length,
    )

    li = load_table(spark, sf_dir, "lineitem")
    day = F.datediff(
        F.to_date("l_shipdate"), F.to_date(F.lit("1970-01-01"))
    ).cast("long")
    iv = li.select(
        F.col("l_suppkey").alias("k"),
        day.alias("s"),
        (day + F.pmod(F.col("l_linenumber"), F.lit(7)) + 1).alias("e"),
    )
    return interval_union_length(
        iv, key_col="k", start_col="s", end_col="e"
    ).select(
        F.col("k").alias("l_suppkey"), "n_islands", "covered"
    )


# ---------------------------------------------------------------------------
# doc_byte_histogram — pins the BBPE byte-symbol layer
# ---------------------------------------------------------------------------


@register(
    "doc_byte_histogram",
    tags=("llm", "text", "aggregation"),
    description=(
        "UTF-8 byte histogram of the corpus through the BBPE base "
        "alphabet (operators/bpe.byte_symbols: encode -> hex -> pair "
        "split): per byte symbol, total occurrences and distinct "
        "documents — the alphabet-coverage audit a byte-level "
        "tokenizer build runs first, and the driver-checkable pin of "
        "the byte layer bbpe_train/bbpe_segment stand on."
    ),
    oracle="""
        SELECT b AS byte_sym,
               CAST(COUNT(*) AS BIGINT) AS n_total,
               CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
        FROM (
            SELECT doc_id,
                   unnest([lower(substring(hex(encode(text)), 2*i - 1, 2))
                           for i in generate_series(
                               1, octet_length(encode(text)))]) AS b
            FROM documents
        )
        GROUP BY 1
    """,
)
def doc_byte_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One shuffle-free explode scan + one partial-agg'd groupBy on a
    <=256-key space — no skew risk at any corpus size (hot bytes
    partial-aggregate on the map side)."""
    from hadoop_map_reduce_spark.operators.bpe import byte_symbols

    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(
            "doc_id", F.explode(byte_symbols(F.col("text"))).alias("byte_sym")
        )
        .groupBy("byte_sym")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_total"),
            F.countDistinct("doc_id").cast("long").alias("n_docs"),
        )
    )


# ---------------------------------------------------------------------------
# warc_roundtrip_census — WARC (ISO 28500) source/sink, Common Crawl layout
# ---------------------------------------------------------------------------


@register(
    "warc_roundtrip_census",
    tags=("reference", "source"),
    description=(
        "WARC source/sink roundtrip census (sources/warc.py — the "
        "Common Crawl ingestion format, record-per-gzip-member "
        ".warc.gz): write the first 40 documents as WARC response "
        "records, read them back through the warcrecords DataSource "
        "(per-archive split planning, multi-member gzip decode, header "
        "parse), and emit (target_uri, byte length, md5 digest) — the "
        "DuckDB oracle computes the same from the documents table, so "
        "the whole record framing + compression path is hash-pinned."
    ),
    oracle="""
        SELECT 'https://corpus.local/doc/' || CAST(doc_id AS VARCHAR)
                   AS target_uri,
               CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
               md5(text) AS digest
        FROM (SELECT doc_id, text FROM documents ORDER BY doc_id LIMIT 40)
    """,
)
def warc_roundtrip_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same fixture discipline as zip_roundtrip_census: built fresh per
    call in a pid-keyed temp dir (removed first), content derived from
    the corpus — the read side exercises the REAL parser on executors
    against archives it did not fabricate in-process."""
    from hadoop_map_reduce_spark.sources.warc import (
        register_warc_datasource,
    )

    register_warc_datasource(spark)
    out_dir = os.path.join(
        tempfile.gettempdir(),
        "hmrs_warcround_{}_{}".format(
            os.getpid(), hashlib.md5(sf_dir.encode()).hexdigest()[:8]
        ),
    )
    shutil.rmtree(out_dir, ignore_errors=True)
    docs = load_table(spark, sf_dir, "documents").orderBy("doc_id").limit(40)
    records = docs.select(
        F.concat(F.lit("urn:doc:"), F.col("doc_id").cast("string")).alias(
            "record_id"
        ),
        F.lit("response").alias("warc_type"),
        F.concat(
            F.lit("https://corpus.local/doc/"),
            F.col("doc_id").cast("string"),
        ).alias("target_uri"),
        F.lit("text/plain").alias("content_type"),
        F.col("text").cast("binary").alias("content"),
    )
    records.repartition(4).write.format("warcrecords").mode(
        "overwrite"
    ).save(out_dir)
    back = spark.read.format("warcrecords").load(
        os.path.join(out_dir, "*.warc.gz")
    )
    return back.select(
        "target_uri",
        F.col("size").cast("long").alias("n_bytes"),
        F.md5("content").alias("digest"),
    )


# ---------------------------------------------------------------------------
# curation_html_extract — the WARC -> text curation bridge
# ---------------------------------------------------------------------------


def _html_wrap_sql() -> str:
    return (
        "'<html><head><title>' || source || '</title>"
        "<script type=\"text/javascript\">var x = 1 &amp;&amp; 2;</script>"
        "<style>p { color: red; }</style></head><body>"
        "<!-- crawler boilerplate -->"
        "<h1>Doc ' || CAST(doc_id AS VARCHAR) || '</h1><p>' || text || "
        "'</p><ul><li>lang: ' || lang || '</li></ul>"
        "&quot;quoted&quot; &amp;amp; &lt;escaped&gt;</body></html>'"
    )


def _html_extract_oracle() -> str:
    from hadoop_map_reduce_spark.functions.html import html_to_text_sql

    extracted = html_to_text_sql(_html_wrap_sql())
    return f"""
        SELECT doc_id,
               CAST(length({extracted}) AS BIGINT) AS n_chars,
               md5({extracted}) AS digest
        FROM documents
    """


@register(
    "curation_html_extract",
    tags=("llm", "curation", "text"),
    description=(
        "HTML -> text extraction (functions/html.html_to_text): strip "
        "script/style/comment blocks, newline block closers, drop tags, "
        "decode the core entity set (&amp; last: one level), collapse "
        "whitespace — the regex-tier curation step between WARC "
        "ingestion and text quality/dedup, all JVM-codegen "
        "regexp_replace chains. Both engines build the IDENTICAL "
        "synthetic HTML wrapper around each document and run the "
        "IDENTICAL pattern sequence (Java∩RE2 dialect), so the whole "
        "extraction pipeline is hash-pinned."
    ),
    oracle=_html_extract_oracle(),
)
def curation_html_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One shuffle-free scan; at 100 TB this is the embarrassingly
    parallel first pass over raw crawl payloads."""
    from hadoop_map_reduce_spark.functions.html import html_to_text

    docs = load_table(spark, sf_dir, "documents")
    extracted = html_to_text(_html_wrap_col())
    return docs.select(
        "doc_id",
        F.length(extracted).cast("long").alias("n_chars"),
        F.md5(extracted).alias("digest"),
    )


# ---------------------------------------------------------------------------
# pipeline_crawl_extract — WARC ingest -> HTML extract, end to end
# ---------------------------------------------------------------------------


def _crawl_extract_oracle() -> str:
    from hadoop_map_reduce_spark.functions.html import html_to_text_sql

    extracted = html_to_text_sql(_html_wrap_sql())
    return f"""
        SELECT 'https://corpus.local/doc/' || CAST(doc_id AS VARCHAR)
                   AS target_uri,
               CAST(length({extracted}) AS BIGINT) AS n_chars,
               md5({extracted}) AS digest
        FROM (SELECT doc_id, text, lang, source FROM documents
              ORDER BY doc_id LIMIT 40)
    """


@register(
    "pipeline_crawl_extract",
    tags=("llm", "curation", "source"),
    description=(
        "End-to-end crawl pipeline: write documents as HTML response "
        "records in Common-Crawl-layout .warc.gz, read them back "
        "through the warcrecords DataSource, run html_to_text over the "
        "payloads, and census the extracted text (doc URI, chars, md5) "
        "— the WARC framing, gzip member decode, AND the extraction "
        "regex chain all inside one hash-pinned query, against a "
        "DuckDB oracle that derives the same census from the documents "
        "table directly."
    ),
    oracle=_crawl_extract_oracle(),
)
def pipeline_crawl_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The first two stages of a crawl-corpus build, composed: the
    payload bytes cross the WARC writer/reader boundary (per-record
    gzip members), then the extraction chain runs where it would at
    100 TB — a shuffle-free scan over the ingested records."""
    from hadoop_map_reduce_spark.functions.html import html_to_text
    from hadoop_map_reduce_spark.sources.warc import (
        register_warc_datasource,
    )

    register_warc_datasource(spark)
    out_dir = os.path.join(
        tempfile.gettempdir(),
        "hmrs_crawlpipe_{}_{}".format(
            os.getpid(), hashlib.md5(sf_dir.encode()).hexdigest()[:8]
        ),
    )
    shutil.rmtree(out_dir, ignore_errors=True)
    docs = load_table(spark, sf_dir, "documents").orderBy("doc_id").limit(40)
    records = docs.select(
        F.concat(F.lit("urn:doc:"), F.col("doc_id").cast("string")).alias(
            "record_id"
        ),
        F.lit("response").alias("warc_type"),
        F.concat(
            F.lit("https://corpus.local/doc/"),
            F.col("doc_id").cast("string"),
        ).alias("target_uri"),
        F.lit("text/html").alias("content_type"),
        _html_wrap_col().cast("binary").alias("content"),
    )
    records.repartition(4).write.format("warcrecords").mode(
        "overwrite"
    ).save(out_dir)
    back = spark.read.format("warcrecords").load(
        os.path.join(out_dir, "*.warc.gz")
    )
    extracted = html_to_text(F.col("content").cast("string"))
    return back.select(
        "target_uri",
        F.length(extracted).cast("long").alias("n_chars"),
        F.md5(extracted).alias("digest"),
    )


def _html_wrap_col():
    """The Spark twin of _html_wrap_sql (same wrapper both engines)."""
    return F.concat(
        F.lit("<html><head><title>"),
        F.col("source"),
        F.lit(
            '</title><script type="text/javascript">var x = 1 '
            "&amp;&amp; 2;</script><style>p { color: red; }</style>"
            "</head><body><!-- crawler boilerplate --><h1>Doc "
        ),
        F.col("doc_id").cast("string"),
        F.lit("</h1><p>"),
        F.col("text"),
        F.lit("</p><ul><li>lang: "),
        F.col("lang"),
        F.lit(
            "</li></ul>&quot;quoted&quot; &amp;amp; "
            "&lt;escaped&gt;</body></html>"
        ),
    )


# ---------------------------------------------------------------------------
# ANN recall bounds (round-7, VERDICT r6 #3): boolean-contract oracles
# ---------------------------------------------------------------------------
#
# The rows-only ANN queries (similarity_ann_lsh / _ivf / _pq) return
# float-ranked top-k with recall < 1 by construction, so they can never
# hash-match an oracle. Their integer-census companions (above) pin the
# quantizer/bucket arithmetic; these queries close the last gap the r6
# verdict named (#3): make the RECALL contract itself a driver-green row
# via the boolean-contract pattern proven by sketch_hll_rollup /
# sketch_quantile_check. Spark computes recall@5 of the real approximate
# operator against the real in-engine brute-force operator; the oracle
# pins (n_queries, k, recall_ok=TRUE). n_queries is an honest
# cross-engine value (COUNT of the query subset), and a recall collapse
# below the documented bound flips recall_ok and fails the round.
#
# Determinism: both sides rank ROUND(sim, 6) DESC with neighbor-id
# tie-break; planes/centroids/codebooks are md5/xxhash64-derived — the
# recall at a given SF is a pure function of the data. Measured r8
# across sf0.001/0.01/0.1: LSH .58/.48/.56, IVF .70/.62/.58,
# PQ .64/.70/.54. Bounds sit at ~80% of each family's measured floor
# (VERDICT r7 #4 — tight enough that a real recall regression flips
# the contract, with margin for data-dependent drift): LSH .40,
# IVF .46, PQ .43.

_RECALL_ORACLE = """
    SELECT CAST(COUNT(*) AS BIGINT) AS n_queries,
           CAST(5 AS BIGINT) AS k,
           TRUE AS recall_ok
    FROM embeddings WHERE vec_id < 10
"""


def _recall_bound(approx: DataFrame, exact: DataFrame,
                  queries: DataFrame, k: int, bound_ppm: int) -> DataFrame:
    """(n_queries, k, recall_ok) for approx vs exact top-k.

    recall = |approx-pairs ∩ exact-pairs| / |exact-pairs|; the exact
    side is k rows per query by construction. One broadcast-sized
    semi-join (10·k rows each side at any SF — the query subset is
    fixed) after the two operator pipelines; the heavy lifting is
    inside the operators under test, not the harness."""
    hits = exact.select("query_id", "neighbor_id").join(
        approx.select("query_id", "neighbor_id"),
        ["query_id", "neighbor_id"],
        "left_semi",
    )
    n_q = queries.select(
        F.count(F.lit(1)).cast("long").alias("n_queries")
    )
    recall_ppm = F.floor(
        F.lit(1_000_000) * F.col("_n_hits") / (F.col("n_queries") * k)
    )
    return (
        n_q.crossJoin(
            F.broadcast(
                hits.agg(F.count(F.lit(1)).alias("_n_hits"))
            )
        )
        .select(
            "n_queries",
            F.lit(k).cast("long").alias("k"),
            (recall_ppm >= bound_ppm).alias("recall_ok"),
        )
    )


def _ann_query_set(spark: SparkSession, sf_dir: str):
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return emb, queries


@register(
    "ann_lsh_recall_bound",
    tags=("llm", "similarity", "sketch"),
    description=(
        "Boolean recall contract for the sign-LSH ANN ladder rung: "
        "recall@5 of ann_topk_lsh (4 planes, 1-flip multiprobe) vs the "
        "in-engine brute-force top-5 must be >= 0.40 (measured floor "
        ".48 across SFs; bound = ~80% of floor); the oracle pins "
        "(n_queries, k, recall_ok=TRUE) — a recall collapse fails the "
        "driver round."
    ),
    oracle=_RECALL_ORACLE,
)
def ann_lsh_recall_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drives the REAL operators end-to-end (same parameters as the
    rows-only similarity_ann_lsh / similarity_topk registrations); the
    contract join is broadcast-bounded (50 pairs/side)."""
    from hadoop_map_reduce_spark.operators.similarity import (
        ann_topk_lsh,
        cosine_topk,
    )

    emb, queries = _ann_query_set(spark, sf_dir)
    exact = cosine_topk(emb, queries, k=5)
    approx = ann_topk_lsh(
        emb, queries, k=5, dim=64, n_planes=4, probe_flips=1
    )
    return _recall_bound(approx, exact, queries, k=5, bound_ppm=400_000)


@register(
    "ivf_recall_bound",
    tags=("llm", "similarity", "sketch"),
    description=(
        "Boolean recall contract for the IVF ANN rung: recall@5 of "
        "ivf_topk (16 sampled-centroid cells, 6 probes) vs in-engine "
        "brute force must be >= 0.46 (measured floor .58 across SFs; "
        "bound = ~80% of floor); oracle pins (n_queries, k, "
        "recall_ok=TRUE)."
    ),
    oracle=_RECALL_ORACLE,
)
def ivf_recall_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_map_reduce_spark.operators.similarity import (
        cosine_topk,
        ivf_topk,
    )

    emb, queries = _ann_query_set(spark, sf_dir)
    exact = cosine_topk(emb, queries, k=5)
    approx = ivf_topk(emb, queries, k=5, n_cells=16, n_probe=6)
    return _recall_bound(approx, exact, queries, k=5, bound_ppm=460_000)


@register(
    "pq_recall_bound",
    tags=("llm", "similarity", "sketch"),
    description=(
        "Boolean recall contract for the PQ-ADC ANN rung: recall@5 of "
        "pq_topk_adc (m=8 nibble codes, refine=8 exact re-rank) vs "
        "in-engine brute force must be >= 0.43 (measured floor .54 "
        "across SFs; bound = ~80% of floor); oracle pins (n_queries, "
        "k, recall_ok=TRUE)."
    ),
    oracle=_RECALL_ORACLE,
)
def pq_recall_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_map_reduce_spark.operators.pq import (
        pq_encode,
        pq_topk_adc,
        pq_train_codebooks,
    )
    from hadoop_map_reduce_spark.operators.similarity import cosine_topk

    emb, queries = _ann_query_set(spark, sf_dir)
    exact = cosine_topk(emb, queries, k=5)
    books = pq_train_codebooks(emb, m=8, ksub=16, n_iter=3)
    codes = pq_encode(emb, books)
    approx = pq_topk_adc(codes, emb, queries, books, k=5, refine=8)
    return _recall_bound(approx, exact, queries, k=5, bound_ppm=430_000)


# ---------------------------------------------------------------------------
# bpe_merge_table_census (round-7, VERDICT r6 #5): the BPE merge LOOP as
# a driver-green row
# ---------------------------------------------------------------------------
#
# doc_byte_histogram (r6) pins the byte-symbol layer; this pins MERGE
# SELECTION — the weighted adjacent-pair argmax with lexicographic
# tie-break and the greedy leftmost rewrite — by driving the REAL
# bpe_train_driver on a crafted corpus whose words are exactly 2 chars
# (the 2-char prefixes of the corpus tokens). Words are then at most
# 3 symbols ([c1, c2, '</w>']), so the greedy rewrite per merge round is
# a closed-form 2-branch CASE a DuckDB oracle can replay STAGE BY STAGE:
# count pairs -> pick (max n, lex-min (lhs, rhs)) -> rewrite -> repeat.
# Eight rounds of exact integer replay (enough to exercise BOTH rewrite
# branches: rounds 0-5 merge (char, suffix) pairs, round 6+ merges
# first-position pairs like (j, o</w>)), compared row-for-row.

_BPE_CENSUS_MERGES = 8


def _bpe_census_oracle() -> str:
    from hadoop_map_reduce_spark.plans.reference_queries import (
        _ORACLE_TOKENS,
    )

    stages = []
    for k in range(_BPE_CENSUS_MERGES):
        stages.append(f"""
        p{k} AS (
            SELECT syms[i] AS lhs, syms[i + 1] AS rhs, SUM(cnt) AS n
            FROM s{k}, UNNEST(range(1, len(syms))) AS r(i)
            GROUP BY 1, 2
        ), m{k} AS (
            SELECT lhs, rhs, n FROM p{k}
            ORDER BY n DESC, lhs ASC, rhs ASC LIMIT 1
        ), s{k + 1} AS (
            SELECT CASE
                WHEN len(syms) >= 2
                     AND syms[1] = m.lhs AND syms[2] = m.rhs
                    THEN list_concat([m.lhs || m.rhs], syms[3:])
                WHEN len(syms) >= 3
                     AND syms[2] = m.lhs AND syms[3] = m.rhs
                    THEN [syms[1], m.lhs || m.rhs]
                ELSE syms END AS syms,
                cnt
            FROM s{k}, m{k} m
        )""")
    ranks = "\n        UNION ALL ".join(
        f"SELECT CAST({k} AS BIGINT) AS rank, lhs, rhs, "
        f"CAST(n AS BIGINT) AS pair_count FROM m{k}"
        for k in range(_BPE_CENSUS_MERGES)
    )
    return f"""
        WITH toks AS (
            SELECT {_ORACLE_TOKENS} AS t FROM documents
        ), words AS (
            SELECT substr(u.word, 1, 2) AS w, COUNT(*) AS cnt
            FROM toks, UNNEST(t) AS u(word)
            WHERE length(u.word) >= 2
            GROUP BY 1
        ), s0 AS (
            SELECT [substr(w, 1, 1), substr(w, 2, 1), '</w>'] AS syms,
                   cnt
            FROM words
        ),{",".join(stages)}
        {ranks}
    """


@register(
    "bpe_merge_table_census",
    tags=("llm", "text", "aggregation"),
    description=(
        "BPE merge-selection pin: train 8 merges with the REAL "
        "bpe_train_driver (distributed word-count pass + bounded-"
        "collect merge loop) on the 2-char-prefix crafted vocabulary "
        "of the corpus tokens; the merge table (rank, lhs, rhs, "
        "pair_count) is hash-compared against a DuckDB oracle that "
        "replays all 8 rounds — weighted pair counts, (max n, lex-min "
        "pair) argmax, greedy leftmost rewrite — in staged CTEs."
    ),
    oracle=_bpe_census_oracle(),
)
def bpe_merge_table_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus-sized work (sanitize/tokenize/word-count) is one
    distributed pass; the merge loop is the documented bounded-collect
    driver path (operators/bpe.py bpe_train_driver) — the same split a
    50k-merge production vocabulary uses. min_pair_count=1 so the
    census never early-stops; the 2-char vocabulary is bounded by the
    alphabet (≤ ~1.3k distinct words at any corpus size)."""
    from hadoop_map_reduce_spark.functions.text import sanitize, tokenize
    from hadoop_map_reduce_spark.operators.bpe import bpe_train_driver

    docs = load_table(spark, sf_dir, "documents")
    crafted = (
        docs.select(
            F.explode(tokenize(sanitize(F.col("text")))).alias("tok")
        )
        .filter(F.length("tok") >= 2)
        .select(F.substring("tok", 1, 2).alias("text"))
    )
    merges = bpe_train_driver(
        crafted,
        n_merges=_BPE_CENSUS_MERGES,
        min_pair_count=1,
        max_distinct_words=10_000,
    )
    return spark.createDataFrame(
        [(int(r), lhs, rhs, int(n)) for r, lhs, rhs, n in merges],
        "rank long, lhs string, rhs string, pair_count long",
    )


@register(
    "mrl_prefix_recall_bound",
    tags=("llm", "similarity", "sketch"),
    description=(
        "Boolean recall contract for two-stage Matryoshka-style "
        "retrieval (operators/similarity.prefix_rerank_topk): coarse "
        "top-100 over the first 32 of 64 dims, exact full-dim re-rank "
        "to top-5; recall@5 vs brute force must be >= 0.62 (measured "
        ".92/.96/.78 at sf0.001/0.01/0.1; bound = ~80% of floor). The "
        "oracle pins (n_queries, k, recall_ok=TRUE)."
    ),
    oracle=_RECALL_ORACLE,
)
def mrl_prefix_recall_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same harness as the other three ANN rungs; the operator under
    test is the prefix-scan + re-rank pipeline itself (one
    fractional-read corpus pass, broadcast-bounded re-rank)."""
    from hadoop_map_reduce_spark.operators.similarity import (
        cosine_topk,
        prefix_rerank_topk,
    )

    emb, queries = _ann_query_set(spark, sf_dir)
    exact = cosine_topk(emb, queries, k=5)
    approx = prefix_rerank_topk(
        emb, queries, k=5, prefix_dims=32, shortlist=100
    )
    return _recall_bound(approx, exact, queries, k=5, bound_ppm=620_000)


# ---------------------------------------------------------------------------
# IVF-PQ composition (round-9, VERDICT r8 #5): the billion-vector
# production layout as a fifth ANN rung — coarse cells + shared PQ
# residual codebooks, probe + ADC + exact re-rank — with the same
# two-query pinning the other rungs carry: an integer code census
# (exact, driver-oracled) and a recall contract (bound at ~80% of the
# measured floor).
# ---------------------------------------------------------------------------

_IVFPQ_CELLS = 16
_IVFPQ_M = 8
_IVFPQ_KSUB = 16
_IVFPQ_DSUB = 8


def _ivfpq_census_books() -> list[list[list[float]]]:
    """Crafted integer RESIDUAL codebooks spanning the residual range
    (|e6 - ce6| ≤ ~1.2e6): cent(j,c,p) = (((c*29 + p*13 + j*7) % 23)
    - 11) * 6e4 — distinct constants from ``_pq_census_books`` so the
    two censuses cannot mask each other's regressions."""
    return [
        [
            [
                float((((c * 29 + p * 13 + j * 7) % 23) - 11) * 60000)
                for p in range(_IVFPQ_DSUB)
            ]
            for c in range(_IVFPQ_KSUB)
        ]
        for j in range(_IVFPQ_M)
    ]


def _ivfpq_census_oracle(census_where: str = "") -> str:
    """``census_where`` (round-11): SQL appended to the final census
    aggregation's FROM clause — the filtered-index census passes a join
    back to ``embeddings`` plus a label predicate, replaying a
    metadata-filtered read of the stored codes (the stored table is a
    pure function of the full corpus, so filtering the census equals
    filtering the stored rows)."""
    books = _ivfpq_census_books()
    selects = []
    for j in range(_IVFPQ_M):
        off = j * _IVFPQ_DSUB
        cands = ", ".join(
            "[list_sum([(r[{off} + i] - ([{lits}])[i]) * "
            "(r[{off} + i] - ([{lits}])[i]) "
            "for i in generate_series(1, {dsub})]), {c}]".format(
                off=off,
                lits=", ".join(str(int(x)) for x in books[j][c]),
                dsub=_IVFPQ_DSUB,
                c=c,
            )
            for c in range(_IVFPQ_KSUB)
        )
        selects.append(
            f"SELECT vec_id, cell, CAST({j} AS BIGINT) AS subspace, "
            f"CAST((list_sort([{cands}]))[1][2] AS BIGINT) AS code "
            "FROM a"
        )
    union = "\n            UNION ALL\n            ".join(selects)
    return f"""
        WITH e AS (
            SELECT vec_id, {_E6_SQL} AS e6 FROM embeddings
        ), cent AS (
            SELECT e6 AS ce6,
                   CAST(ROW_NUMBER() OVER (
                       ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
                   ) - 1 AS BIGINT) AS cell
            FROM e
            ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
            LIMIT {_IVFPQ_CELLS}
        ), d AS (
            SELECT e.vec_id, c.cell,
                   list_sum([(e.e6[i] - c.ce6[i]) * (e.e6[i] - c.ce6[i])
                             for i in generate_series(1, 64)]) AS d2,
                   [e.e6[i] - c.ce6[i]
                    for i in generate_series(1, 64)] AS r
            FROM e, cent c
        ), b AS (
            SELECT vec_id, cell, r,
                   ROW_NUMBER() OVER (
                       PARTITION BY vec_id ORDER BY d2, cell
                   ) AS rn
            FROM d
        ), a AS (
            SELECT vec_id, cell, r FROM b WHERE rn = 1
        ), u AS (
            {union}
        )
        SELECT cell, subspace, code,
               CAST(COUNT(*) AS BIGINT) AS n_vecs,
               CAST(SUM(u.vec_id) AS BIGINT) AS sum_vec_ids
        FROM u {census_where}
        GROUP BY 1, 2, 3
    """



def _md5_centroids_e6(emb, n_cells: int) -> list[list[float]]:
    """md5-smallest ``n_cells`` e6 vectors — the cross-engine centroid
    sampling device shared by the IVF-PQ census and the persisted-index
    census (one implementation for the block both oracles replay)."""
    rows = (
        emb.orderBy(
            F.md5(F.col("vec_id").cast("string")), F.col("vec_id")
        )
        .limit(n_cells)
        .collect()
    )
    return [list(r["_e6d"]) for r in rows]


def _ivfpq_census_frame(enc) -> DataFrame:
    """(cell, subspace, code, n_vecs, sum_vec_ids) census over an
    encoded (pq_id, cell, pq_codes) frame — the engine-side shape both
    ivfpq_code_census and ann_index_store_census pin against the SHARED
    _ivfpq_census_oracle; one implementation so the shape cannot
    drift."""
    from hadoop_map_reduce_spark.operators.pq import _code_at

    pairs = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(j).cast("long").alias("subspace"),
                    _code_at(F.col("pq_codes"), j)
                    .cast("long")
                    .alias("code"),
                )
                for j in range(_IVFPQ_M)
            ]
        )
    )
    return (
        enc.select(
            "pq_id",
            F.col("cell").cast("long").alias("cell"),
            pairs.alias("_p"),
        )
        .select("pq_id", "cell", "_p.subspace", "_p.code")
        .groupBy("cell", "subspace", "code")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_vecs"),
            F.sum("pq_id").cast("long").alias("sum_vec_ids"),
        )
    )


@register(
    "ivfpq_code_census",
    tags=("llm", "similarity", "aggregation"),
    description=(
        "Driver-checkable companion of the IVF-PQ rung: run the REAL "
        "ivfpq_encode operator (md5-sampled coarse cells, residual "
        "v - c_cell, per-subspace squared-L2 argmin against crafted "
        "integer codebooks, nibble packing) over 1e6-quantized "
        "coordinates, then census every (cell, subspace, code) — the "
        "full coarse-assign -> residual -> code pipeline hash-pinned "
        "cross-engine; codebook TRAINING stays pinned by the "
        "kmeans-parity tests."
    ),
    oracle=_ivfpq_census_oracle(),
)
def ivfpq_code_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All arithmetic exact in the double fold: cell d2 terms ≤
    (1.2e6)^2 * 64 ≈ 9e13 ≪ 2^53, code d2 terms ≤ (1.9e6)^2 * 8 ≈
    2.9e13 ≪ 2^53; ties break to the lower cell/code on both engines
    (first-index argmin vs ROW_NUMBER/list_sort). One bounded 16-row
    collect, one shuffle-free encode scan, one partial-agg'd groupBy —
    the code-balance audit (dead codes, hot cells) an IVF-PQ build
    runs before committing the layout."""
    from hadoop_map_reduce_spark.operators.pq import ivfpq_encode

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", _e6_col().cast("array<double>").alias("_e6d")
    )
    enc = ivfpq_encode(
        emb,
        _md5_centroids_e6(emb, _IVFPQ_CELLS),
        _ivfpq_census_books(),
        vec_col="_e6d",
        id_col="vec_id",
    )
    return _ivfpq_census_frame(enc)


@register(
    "ivfpq_recall_bound",
    tags=("llm", "similarity", "sketch"),
    description=(
        "Boolean recall contract for the composed IVF-PQ rung: "
        "recall@5 of ivfpq_topk_adc (16 sampled cells, shared m=8 "
        "residual codebooks, 6 probes, refine=8 exact re-rank) vs "
        "in-engine brute force must be >= 0.40 (measured floor "
        ".50/.52 at sf0.001/0.01; bound = ~80% of floor); oracle pins "
        "(n_queries, k, recall_ok=TRUE)."
    ),
    oracle=_RECALL_ORACLE,
)
def ivfpq_recall_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drives the REAL composed pipeline end-to-end: deterministic
    coarse sample, Spark-assigned bounded training sample, driver
    Lloyd on residual slices, distributed encode, probe + ADC + exact
    re-rank — the billion-vector layout exercised whole."""
    from hadoop_map_reduce_spark.operators.pq import (
        ivfpq_coarse_centroids,
        ivfpq_encode,
        ivfpq_topk_adc,
        ivfpq_train_codebooks,
    )
    from hadoop_map_reduce_spark.operators.similarity import cosine_topk

    emb, queries = _ann_query_set(spark, sf_dir)
    exact = cosine_topk(emb, queries, k=5)
    cents = ivfpq_coarse_centroids(emb, n_cells=_IVFPQ_CELLS)
    books = ivfpq_train_codebooks(
        emb, cents, m=_IVFPQ_M, ksub=_IVFPQ_KSUB, n_iter=3
    )
    enc = ivfpq_encode(emb, cents, books)
    approx = ivfpq_topk_adc(
        enc, emb, queries, cents, books, k=5, n_probe=6, refine=8
    )
    return _recall_bound(approx, exact, queries, k=5, bound_ppm=400_000)


# ---------------------------------------------------------------------------
# embedding_gram_census (round-9): exact distributed Gram-matrix
# accumulation — the inner loop of PCA / whitening / covariance-drift
# monitoring over an embedding column, pinned cross-engine in integer
# micro-units.
# ---------------------------------------------------------------------------

_GRAM_DIMS = 16  # upper triangle of the leading 16x16 block: 136 cells


def _gram_census_oracle() -> str:
    cells = ", ".join(
        f"({i}, {j})"
        for i in range(1, _GRAM_DIMS + 1)
        for j in range(i, _GRAM_DIMS + 1)
    )
    return f"""
        WITH e AS (
            SELECT vec_id, {_E6_SQL} AS e6 FROM embeddings
        ), cells(i, j) AS (VALUES {cells})
        SELECT CAST(c.i - 1 AS BIGINT) AS i,
               CAST(c.j - 1 AS BIGINT) AS j,
               CAST(SUM(e.e6[c.i] * e.e6[c.j]) AS BIGINT) AS gram_e12,
               CAST(COUNT(*) AS BIGINT) AS n_vecs
        FROM e, cells c
        GROUP BY 1, 2
    """


@register(
    "embedding_gram_census",
    tags=("llm", "similarity", "aggregation"),
    description=(
        "Exact Gram-matrix accumulation over the embedding corpus "
        "(upper triangle of the leading 16x16 block in 1e-12 "
        "micro-units^2): the one-scan distributed primitive under PCA "
        "whitening, covariance drift monitors, and Oja-style streaming "
        "eigenupdates — 136 long sums in a single partial-aggregated "
        "pass, hash-pinned cross-engine."
    ),
    oracle=_gram_census_oracle(),
)
def embedding_gram_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale shape: ONE corpus scan computing all 136 cell sums as
    columns of a single hash aggregate (map-side partial -> one 1-row
    exchange), then a literal-array explode unpivots the 1-row result
    into (i, j, gram_e12) rows — no per-row fan-out, no shuffle keyed
    by cell. Long arithmetic throughout: |e6| <= ~6e5, so a product is
    <= 3.6e11 and 2^63 holds ~2.5e7 corpus rows per cell before
    overflow; at larger scales the same plan shards the sum by a
    deterministic row bucket first (documented, not needed at any test
    SF)."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        _e6_col().alias("_e")
    )
    aggs = []
    names = []
    for i in range(_GRAM_DIMS):
        for j in range(i, _GRAM_DIMS):
            name = f"_g_{i}_{j}"
            names.append((i, j, name))
            aggs.append(
                F.sum(
                    F.element_at("_e", i + 1)
                    * F.element_at("_e", j + 1)
                ).alias(name)
            )
    row = emb.agg(*aggs, F.count(F.lit(1)).alias("_n"))
    cells = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(i).cast("long").alias("i"),
                    F.lit(j).cast("long").alias("j"),
                    F.col(name).alias("gram_e12"),
                )
                for i, j, name in names
            ]
        )
    )
    return row.select(cells.alias("_c"), F.col("_n")).select(
        "_c.i",
        "_c.j",
        "_c.gram_e12",
        F.col("_n").alias("n_vecs"),
    )


# ---------------------------------------------------------------------------
# Persisted ANN index (round-10, VERDICT r9 #3): build/serve/append as
# driver-green rows — the production gap in the otherwise-complete ANN
# ladder. Census = the full build -> append -> read-back-from-disk life
# cycle hash-pinned; recall contract = search served from the STORED
# index with no retraining.
# ---------------------------------------------------------------------------


def _index_work_dir(tag: str, sf_dir: str) -> str:
    """Deterministic per-(process, sf_dir) working dir, cleared at the
    start of each invocation and LEFT on disk after it — the returned
    DataFrame is lazy and reads the committed index when the driver
    collects (the pack_write_shards discipline)."""
    out = os.path.join(
        tempfile.gettempdir(),
        "hmrs_{}_{}_{}".format(
            tag, os.getpid(), hashlib.md5(sf_dir.encode()).hexdigest()[:8]
        ),
    )
    shutil.rmtree(out, ignore_errors=True)
    return out


@register(
    "ann_index_store_census",
    tags=("llm", "similarity", "sink", "aggregation"),
    description=(
        "Persisted-index life cycle hash-pinned: ann_index_build "
        "encodes the vec_id%4!=0 corpus against md5-sampled coarse "
        "cells + crafted integer residual codebooks and commits codes "
        "v=0 + meta.json; ann_index_append encodes the vec_id%4==0 "
        "remainder against the FROZEN quantizers and commits v=1; the "
        "census reads the committed pointer BACK FROM DISK — so "
        "build, append, version/pointer protocol, and the stored code "
        "bytes are all driver-checked against the whole-table oracle."
    ),
    oracle=_ivfpq_census_oracle(),
)
def ann_index_store_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build ∪ append covers every vector exactly once (disjoint id
    split), so the stored latest version must census identically to
    one-shot encoding of the full table (the ivfpq_code_census oracle,
    reused verbatim). Exactness argument as there: e6 micro-unit
    inputs keep every squared-L2 fold inside exact float64."""
    from hadoop_map_reduce_spark.operators.ann_index import (
        ann_index_build,
        ann_index_append,
        ann_index_codes,
    )

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", _e6_col().cast("array<double>").alias("_e6d")
    )
    index_dir = _index_work_dir("ann_index_census", sf_dir)
    ann_index_build(
        emb.filter(F.col("vec_id") % 4 != 0),
        index_dir,
        centroids=_md5_centroids_e6(emb, _IVFPQ_CELLS),
        codebooks=_ivfpq_census_books(),
        vec_col="_e6d",
        id_col="vec_id",
    )
    ann_index_append(
        spark,
        index_dir,
        emb.filter(F.col("vec_id") % 4 == 0),
        vec_col="_e6d",
        id_col="vec_id",
    )
    return _ivfpq_census_frame(ann_index_codes(spark, index_dir))


@register(
    "ann_index_recall_bound",
    tags=("llm", "similarity", "sketch", "sink"),
    description=(
        "Boolean recall contract for search SERVED FROM THE STORED "
        "index: ann_index_build trains and persists a real IVF-PQ "
        "index (16 sampled cells, shared m=8 residual codebooks), "
        "ann_index_search answers top-5 from the committed codes with "
        "no retraining, and recall@5 vs in-engine brute force must be "
        ">= 0.40 (same algorithm and parameters as ivfpq_recall_bound "
        "— measured floor .50/.52; bound = ~80% of floor); oracle "
        "pins (n_queries, k, recall_ok=TRUE)."
    ),
    oracle=_RECALL_ORACLE,
)
def ann_index_recall_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_map_reduce_spark.operators.ann_index import (
        ann_index_build,
        ann_index_search,
    )
    from hadoop_map_reduce_spark.operators.similarity import cosine_topk

    emb, queries = _ann_query_set(spark, sf_dir)
    exact = cosine_topk(emb, queries, k=5)
    index_dir = _index_work_dir("ann_index_recall", sf_dir)
    ann_index_build(
        emb,
        index_dir,
        n_cells=_IVFPQ_CELLS,
        m=_IVFPQ_M,
        ksub=_IVFPQ_KSUB,
        n_iter=3,
    )
    approx = ann_index_search(
        spark, index_dir, emb, queries, k=5, n_probe=6, refine=8
    )
    return _recall_bound(approx, exact, queries, k=5, bound_ppm=400_000)


# ---------------------------------------------------------------------------
# Metadata-filtered ANN (round-10, VERDICT r9 #4): predicate + probe,
# recall contracted against brute force ON THE FILTERED SUBSET, census
# pinned with the predicate pruning before the probe join.
# ---------------------------------------------------------------------------


@register(
    "ann_filtered_cell_census",
    tags=("llm", "similarity", "aggregation"),
    description=(
        "Filtered-search census: the ivf_cell_census integer pipeline "
        "with the label%2=0 predicate applied to the ASSIGNMENT scan "
        "only (centroids still md5-sampled from the full corpus) — "
        "pins ivf_topk_filtered's pre-filter semantics cross-engine; "
        "the plan test pins that the predicate reaches the parquet "
        "scan below the probe join."
    ),
    oracle=_ivf_census_oracle(assign_where="WHERE e.label % 2 = 0"),
)
def ann_filtered_cell_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_map_reduce_spark.operators.similarity import (
        ivf_cell_census,
    )

    return ivf_cell_census(
        load_table(spark, sf_dir, "embeddings"),
        n_cells=_IVF_CELLS,
        predicate=(F.col("label") % 2 == 0),
    )


@register(
    "ann_filtered_recall_bound",
    tags=("llm", "similarity", "sketch"),
    description=(
        "Boolean recall contract for metadata-filtered ANN: recall@5 "
        "of ivf_topk_filtered (label%2=0 predicate, pre-filter "
        "strategy, 16 cells, 6 probes) vs in-engine brute force ON THE "
        "FILTERED SUBSET must be >= 0.48 (measured floor .60/.62 at "
        "sf0.001/0.01/0.1; bound = ~80% of floor); oracle pins "
        "(n_queries, k, recall_ok=TRUE)."
    ),
    oracle=_RECALL_ORACLE,
)
def ann_filtered_recall_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact side = cosine_topk over corpus.filter(predicate) — the
    only honest denominator for filtered search (a full-corpus exact
    side would count unreachable neighbors against the filter). The
    pre-filter strategy keeps recall predicate-independent; the post
    strategy's selectivity degradation is pinned by tests."""
    from hadoop_map_reduce_spark.operators.similarity import (
        cosine_topk,
        ivf_topk_filtered,
    )

    emb, queries = _ann_query_set(spark, sf_dir)
    pred = F.col("label") % 2 == 0
    exact = cosine_topk(emb.filter(pred), queries, k=5)
    approx = ivf_topk_filtered(
        emb, queries, k=5, predicate=pred,
        n_cells=_IVF_CELLS, n_probe=6, strategy="pre",
    )
    return _recall_bound(approx, exact, queries, k=5, bound_ppm=480_000)


# ---------------------------------------------------------------------------
# Filtered search served FROM THE PERSISTED INDEX (round-11, VERDICT r10
# #1 — the production retrieval shape): the build stores filterable
# metadata beside the code rows, the search prunes by it at the stored
# codes scan, and both the stored bytes and the served recall are
# driver-pinned across a build/append cycle.
# ---------------------------------------------------------------------------


@register(
    "ann_index_filtered_census",
    tags=("llm", "similarity", "sink", "aggregation"),
    description=(
        "Filtered read of the PERSISTED index hash-pinned: "
        "ann_index_build stores the label column beside the code rows "
        "(metadata_cols passthrough on the encode scan), "
        "ann_index_append carries it through v=1, and the census reads "
        "the committed pointer back from disk RESTRICTED to "
        "label%2=0 — so the stored metadata bytes, their survival "
        "across an append, and the pre-filter read path are all "
        "driver-checked against the whole-table oracle filtered the "
        "same way."
    ),
    oracle=_ivfpq_census_oracle(
        census_where=(
            "JOIN embeddings em ON u.vec_id = em.vec_id "
            "WHERE em.label % 2 = 0"
        )
    ),
)
def ann_index_filtered_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same exactness argument as ann_index_store_census (e6 integer
    micro-units, crafted quantizers); the only new moving part is the
    metadata column riding build + append, which is exactly what the
    filtered census pins — a dropped/shifted label on any stored row
    changes the census."""
    from hadoop_map_reduce_spark.operators.ann_index import (
        ann_index_build,
        ann_index_append,
        ann_index_codes,
    )

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        "label",
        _e6_col().cast("array<double>").alias("_e6d"),
    )
    index_dir = _index_work_dir("ann_index_fcensus", sf_dir)
    ann_index_build(
        emb.filter(F.col("vec_id") % 4 != 0),
        index_dir,
        centroids=_md5_centroids_e6(emb, _IVFPQ_CELLS),
        codebooks=_ivfpq_census_books(),
        vec_col="_e6d",
        id_col="vec_id",
        metadata_cols=("label",),
    )
    ann_index_append(
        spark,
        index_dir,
        emb.filter(F.col("vec_id") % 4 == 0),
        vec_col="_e6d",
        id_col="vec_id",
    )
    stored = ann_index_codes(spark, index_dir).filter(
        F.col("label") % 2 == 0
    )
    return _ivfpq_census_frame(stored)


@register(
    "ann_index_filtered_recall_bound",
    tags=("llm", "similarity", "sketch", "sink"),
    description=(
        "Boolean recall contract for metadata-filtered search SERVED "
        "FROM THE STORED index: ann_index_build persists a real IVF-PQ "
        "index with the label column stored beside the codes, "
        "ann_index_append extends it, ann_index_search answers top-5 "
        "with predicate label%2=0 (pre strategy — the stored predicate "
        "prunes at the codes scan, below the ADC probe join, "
        "plan-pinned) and recall@5 vs in-engine brute force ON THE "
        "FILTERED SUBSET must be >= 0.33 (probe/refine doubled vs the "
        "unfiltered contract — 8 probes, refine=16 — because the "
        "predicate halves per-cell candidates; measured floor "
        ".66/.70/.42 at sf0.001/0.01/0.1 — the sf0.1 dip is the fixed "
        "16-cell oracle-determinism quantizer at 10x cell occupancy, "
        "which the cells-from-corpus-count deployment rule removes; "
        "bound = ~80% of the worst measured floor); oracle pins "
        "(n_queries, k, recall_ok=TRUE)."
    ),
    oracle=_RECALL_ORACLE,
)
def ann_index_filtered_recall_bound(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Composes the two round-10 halves VERDICT r10 #1 named: the
    persisted index (build/append/serve, no retraining) and the
    filtered-search semantics (recall contracted against brute force
    on the filtered subset — the only honest denominator). The index
    is built on vec_id%4!=0 and appended with the remainder, so the
    contract also covers metadata survival across the version cycle."""
    from hadoop_map_reduce_spark.operators.ann_index import (
        ann_index_append,
        ann_index_build,
        ann_index_search,
    )
    from hadoop_map_reduce_spark.operators.similarity import cosine_topk

    emb, queries = _ann_query_set(spark, sf_dir)
    pred = F.col("label") % 2 == 0
    exact = cosine_topk(emb.filter(pred), queries, k=5)
    index_dir = _index_work_dir("ann_index_frecall", sf_dir)
    ann_index_build(
        emb.filter(F.col("vec_id") % 4 != 0),
        index_dir,
        n_cells=_IVFPQ_CELLS,
        m=_IVFPQ_M,
        ksub=_IVFPQ_KSUB,
        n_iter=3,
        metadata_cols=("label",),
    )
    ann_index_append(
        spark, index_dir, emb.filter(F.col("vec_id") % 4 == 0)
    )
    approx = ann_index_search(
        spark,
        index_dir,
        emb,
        queries,
        k=5,
        n_probe=8,
        refine=16,
        predicate=pred,
        strategy="pre",
    )
    return _recall_bound(approx, exact, queries, k=5, bound_ppm=330_000)


@register(
    "ann_index_timetravel_census",
    tags=("llm", "similarity", "sink", "aggregation"),
    description=(
        "Version-store TIME TRAVEL hash-pinned: after a build (v=0, "
        "vec_id%4!=0 rows) and an append (v=1, the full corpus), the "
        "census reads the RETAINED HISTORICAL v=0 back from disk — so "
        "committed versions are immutable under later appends and the "
        "explicit-version read path (the as-of read every incremental "
        "pipeline audit needs) is driver-checked against the oracle "
        "restricted to the build subset."
    ),
    oracle=_ivfpq_census_oracle(census_where="WHERE u.vec_id % 4 != 0"),
)
def ann_index_timetravel_census(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The round-11 protocol companion to ann_index_store_census: same
    crafted quantizers and exact e6 arithmetic, but the read targets
    version 0 explicitly AFTER v=1 commits — a mutated or
    append-contaminated historical version changes the census. Also
    pins that ann_index_meta(version=0) pairs the historical codes
    with the quantizers that encoded them (the (meta, codes)
    per-version atomicity claim), since the census decodes through the
    stored cell/code assignment."""
    from hadoop_map_reduce_spark.operators.ann_index import (
        ann_index_append,
        ann_index_build,
        ann_index_codes,
    )

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", _e6_col().cast("array<double>").alias("_e6d")
    )
    index_dir = _index_work_dir("ann_index_tt", sf_dir)
    ann_index_build(
        emb.filter(F.col("vec_id") % 4 != 0),
        index_dir,
        centroids=_md5_centroids_e6(emb, _IVFPQ_CELLS),
        codebooks=_ivfpq_census_books(),
        vec_col="_e6d",
        id_col="vec_id",
    )
    ann_index_append(
        spark,
        index_dir,
        emb.filter(F.col("vec_id") % 4 == 0),
        vec_col="_e6d",
        id_col="vec_id",
    )
    return _ivfpq_census_frame(
        ann_index_codes(spark, index_dir, version=0)
    )


@register(
    "ann_index_served_search",
    headline=True,
    tags=("llm", "similarity", "sketch", "sink"),
    description=(
        "SERVE-path timing + recall contract for the persisted index "
        "(the round-11 bench representative of the ANN store): builds "
        "the IVF-PQ index WITH stored label metadata once per process "
        "(reused if already committed — so in the bench's "
        "warmup-then-3-timed-runs protocol the timed runs measure pure "
        "serve-from-disk cost, never training/encode: the build/serve "
        "independence VERDICT r10 measured), then answers the "
        "label%2=0 filtered top-5 from the stored codes and contracts "
        "recall >= 0.33 vs brute force on the filtered subset (same "
        "floors as ann_index_filtered_recall_bound); oracle pins "
        "(n_queries, k, recall_ok=TRUE)."
    ),
    oracle=_RECALL_ORACLE,
)
def ann_index_served_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unlike _index_work_dir (cleared per invocation — lifecycle
    queries MUST re-run build and append to be pinning them), this
    query's index directory is reused when a committed version exists:
    the quantities under test are the stored layout's SERVE cost and
    recall, which a production deployment pays per query batch while
    build amortizes to ~zero. Within one process the corpus table is
    immutable, so reuse can never serve stale data. The driver's
    fresh-process correctness run still exercises build + serve
    end-to-end."""
    from hadoop_map_reduce_spark.operators.ann_index import (
        ann_index_build,
        ann_index_search,
    )
    from hadoop_map_reduce_spark.operators.similarity import cosine_topk

    emb, queries = _ann_query_set(spark, sf_dir)
    pred = F.col("label") % 2 == 0
    index_dir = os.path.join(
        tempfile.gettempdir(),
        "hmrs_ann_serve_{}_{}".format(
            os.getpid(), hashlib.md5(sf_dir.encode()).hexdigest()[:8]
        ),
    )
    if not os.path.exists(
        os.path.join(index_dir, "codes", "_LATEST")
    ):
        ann_index_build(
            emb,
            index_dir,
            n_cells=_IVFPQ_CELLS,
            m=_IVFPQ_M,
            ksub=_IVFPQ_KSUB,
            n_iter=3,
            metadata_cols=("label",),
        )
    exact = cosine_topk(emb.filter(pred), queries, k=5)
    approx = ann_index_search(
        spark,
        index_dir,
        emb,
        queries,
        k=5,
        n_probe=8,
        refine=16,
        predicate=pred,
        strategy="pre",
    )
    return _recall_bound(approx, exact, queries, k=5, bound_ppm=330_000)
