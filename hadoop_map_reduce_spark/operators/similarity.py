"""Similarity search over embedding columns (``array<float>``).

Two tiers:

- brute-force cosine top-k: exact; broadcast the (small) query set against
  the full corpus, per-query heap via window row_number. The baseline and
  the verify stage.
- random-hyperplane LSH ANN: the scale path. Sign-bit bucketing over
  seeded hyperplanes turns candidate generation into an equi-join on the
  bucket key; exact cosine re-ranks within buckets. Probing multiple
  buckets (multi-probe) trades recall for cost without re-shuffling the
  corpus — the bucketed corpus table is reusable across query batches.

Vector math is pure Column expressions (zip_with/aggregate): stays in the
JVM, no Arrow round-trips in the hot path.
"""

from __future__ import annotations

import math
import random

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hadoop_map_reduce_spark.functions.vectors import (
    cosine_similarity,
    lit_doubles,
    lit_longs,
)


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Returns (query_id, neighbor_id, rank, sim). Self-matches (same id)
    are excluded. Similarity is rounded to 6 dp before ranking so the
    ordering is stable across engines; ties break on neighbor id.
    """
    q = queries.select(
        F.col(query_id_col).alias("_qid"), F.col(vec_col).alias("_qvec")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cvec")
    )
    sim = F.round(cosine_similarity(F.col("_qvec"), F.col("_cvec")), 6)
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("_qid"))
        .select(
            F.col("_qid").alias("query_id"),
            "neighbor_id",
            sim.alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


def rp_sign_matrix(dim: int, out_dims: int) -> list[list[int]]:
    """Deterministic ±1 (Achlioptas) JL sign matrix,
    ``signs[i][j] = 1 - 2*(md5(f"{i}:{j}")[0] & 1)``. md5 gives true
    equidistribution (measured on 64x16: column balance and Gram
    off-diagonals match i.i.d. ±1 — every multiplicative-hash variant
    tried produced near-duplicate columns); the matrix is a SOURCE
    LITERAL derivable in any language, so the SQL oracle bakes the
    identical constants (the Benford-constants precedent), not a
    reimplementation of md5."""
    import hashlib

    return [
        [
            1 - 2 * (hashlib.md5(f"{i}:{j}".encode()).digest()[0] & 1)
            for j in range(out_dims)
        ]
        for i in range(dim)
    ]


def random_projection_e6(
    df: DataFrame,
    out_dims: int = 16,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Johnson-Lindenstrauss random projection with a ±1 (Achlioptas)
    sign matrix, in EXACT integer arithmetic: each input coordinate is
    quantized to micro-units (``round(x*1e6)`` BIGINT, the
    search_hybrid_rrf device) and each output coordinate is the signed
    integer sum ``p_j = Σ_i e6(v_i) * s[i][j]`` — no float accumulates
    across an engine boundary, so the projection is bit-oracle-able.

    Plan shape: ONE shuffle-free projection per row — the per-j sums
    are a fold over the zipped (vector, sign-column) arrays, all JVM
    codegen against literal signs, no explode and no aggregation. At
    100 TB the output is ``out_dims/dim`` of the input width (64→16
    here: 4x narrower before any ANN/clustering stage consumes it). JL
    distance preservation is verified empirically by the correlation
    test, not assumed (this corpus is near-isotropic, so the
    correlation is modest by nature and NN-recall pins do not apply).
    """
    signs = rp_sign_matrix(dim, out_dims)
    vec = F.col(vec_col).cast("array<double>")
    e6 = F.transform(vec, lambda x: F.round(x * 1e6).cast("long"))
    cols = []
    for j in range(out_dims):
        s_col = lit_longs([signs[i][j] for i in range(dim)])
        cols.append(
            F.aggregate(
                F.zip_with(e6, s_col, lambda a, b: a * b),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ).alias(f"p{j}")
        )
    return df.select(F.col(id_col), *cols)


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    rng = random.Random(seed)
    planes = []
    for _ in range(n_planes):
        v = [rng.gauss(0.0, 1.0) for _ in range(dim)]
        norm = math.sqrt(sum(x * x for x in v)) or 1.0
        planes.append([x / norm for x in v])
    return planes


#: Hard cap on rows ``cosine_neardup_blas`` will materialize on the
#: driver (~1M x 256 float64 ≈ 2 GB broadcast).
BLAS_BROADCAST_MAX_ROWS = 1_000_000


def cosine_neardup_blas(
    df: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_rows: int = BLAS_BROADCAST_MAX_ROWS,
) -> DataFrame:
    """All near-dup pairs via Arrow-batched numpy matmul: each executor
    block multiplies against a broadcast normalized corpus matrix.

    The vectorized twin of :func:`cosine_neardup_pairs`: ~BLAS throughput
    instead of per-pair expression folds, at the cost of float summation
    order (results agree with the exact operator to ~1e-12, not
    bit-exactly — hence no SQL oracle; parity is test-pinned). The corpus
    matrix must fit in a broadcast (fine to ~1M x 256 float64); the
    ceiling is ENFORCED — a cheap count precedes the ``toPandas`` and an
    oversized corpus raises, directing callers to
    :func:`cosine_neardup_grid_blas` (exact, distributed) or
    :func:`lsh_bucket` blocking instead of silently OOM-ing the driver.
    """
    import numpy as np

    spark = df.sparkSession
    # Null vectors never match in the exact operator (null sim filtered),
    # so dropping them up front preserves parity and keeps matmul clean.
    clean = df.filter(F.col(vec_col).isNotNull()).select(id_col, vec_col)
    n = clean.count()
    if n > max_rows:
        raise ValueError(
            f"cosine_neardup_blas: corpus has {n} rows, over the "
            f"driver-materialization ceiling of {max_rows}; use "
            "cosine_neardup_grid_blas (distributed exact) or lsh_bucket "
            "blocking instead."
        )
    # Arrow columnar transfer (toPandas), not collect() of boxed Rows —
    # at the documented ceiling (~1M x 256 f64) collect would build tens
    # of GB of Python objects before the matrix copy.
    corpus_pdf = clean.toPandas()
    if len(corpus_pdf) == 0:
        return spark.createDataFrame([], "id_a long, id_b long, sim double")
    ids = corpus_pdf[id_col].to_numpy(dtype=np.int64)
    mat = np.array(list(corpus_pdf[vec_col]), dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = np.inf  # zero vectors never match (null-sim parity)
    normalized = mat / norms[:, None]
    bc = spark.sparkContext.broadcast((ids, normalized))

    def blocks(it):
        import pandas as pd

        corpus_ids, corpus = bc.value
        for pdf in it:
            if len(pdf) == 0:
                continue
            block_ids = pdf[id_col].to_numpy(dtype=np.int64)
            block = np.array(list(pdf[vec_col]), dtype=np.float64)
            bn = np.linalg.norm(block, axis=1)
            bn[bn == 0] = np.inf
            sims = (block / bn[:, None]) @ corpus.T
            bi, ci = np.where(sims >= threshold)
            keep = block_ids[bi] < corpus_ids[ci]
            yield pd.DataFrame(
                {
                    "id_a": block_ids[bi][keep],
                    "id_b": corpus_ids[ci][keep],
                    "sim": np.round(sims[bi, ci][keep], 6),
                }
            )

    schema = "id_a long, id_b long, sim double"
    return clean.mapInPandas(blocks, schema)


def lsh_bucket(
    df: DataFrame,
    dim: int,
    n_planes: int = 12,
    vec_col: str = "embedding",
    seed: int = 42,
    planes: list[list[float]] | None = None,
):
    """Add a ``bucket`` column: sign bits of dot products with seeded
    random hyperplanes. Deterministic across runs/sessions.

    ``planes`` overrides the seeded Gaussian hyperplanes (must be
    ``n_planes`` rows of ``dim`` values). ``ann_lsh_bucket_census``
    passes integer ±1 planes so the sign/bit-packing arithmetic this
    function owns is exactly driver-oracle-able; search uses the
    Gaussian default."""
    if planes is None:
        planes = _hyperplanes(dim, n_planes, seed)
    if len(planes) != n_planes or any(len(p) != dim for p in planes):
        raise ValueError("planes must be n_planes rows of dim values")
    bucket = F.lit(0).cast("long")
    vec = F.col(vec_col).cast("array<double>")
    for i, plane in enumerate(planes):
        p = lit_doubles(plane)
        dot = F.aggregate(
            F.zip_with(vec, p, lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(dot >= 0, F.lit(1 << i).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return df.withColumn("bucket", bucket)


def ann_topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    dim: int,
    n_planes: int = 6,
    probe_flips: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: candidates share one of the query's probe
    buckets, then exact cosine re-ranks.

    Multi-probe: each query probes its own bucket plus every bucket within
    ``probe_flips`` bit flips (1 + n_planes buckets for flips=1). Raising
    probes raises recall without touching the corpus-side bucketing — the
    corpus table shuffles once and is reusable across query batches.
    Recall < 1 by construction; the brute-force operator is the exact
    fallback/verify stage.
    """
    c = lsh_bucket(
        corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cvec")),
        dim, n_planes, "_cvec", seed,
    )
    q = lsh_bucket(
        queries.select(F.col(query_id_col).alias("_qid"), F.col(vec_col).alias("_qvec")),
        dim, n_planes, "_qvec", seed,
    )
    if probe_flips > 2:
        raise ValueError(
            "probe_flips supports 0, 1, or 2 (probe count grows "
            "combinatorially; beyond 2 flips use fewer planes instead)"
        )
    if probe_flips >= 1:
        flips = [
            F.col("bucket").bitwiseXOR(F.lit(1 << i).cast("long"))
            for i in range(n_planes)
        ]
        if probe_flips >= 2:
            flips += [
                F.col("bucket").bitwiseXOR(F.lit((1 << i) | (1 << j)).cast("long"))
                for i in range(n_planes)
                for j in range(i + 1, n_planes)
            ]
        q = q.withColumn("bucket", F.explode(F.array(F.col("bucket"), *flips)))
    sim = F.round(cosine_similarity(F.col("_qvec"), F.col("_cvec")), 6)
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("neighbor_id") != F.col("_qid"))
        .select(F.col("_qid").alias("query_id"), "neighbor_id", sim.alias("sim"))
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


def _assign_cells_blas(
    df: DataFrame,
    centroids: list[list[float]],
    id_alias: str,
    vec_alias: str,
) -> DataFrame:
    """Corpus-side IVF cell assignment as ONE vectorized Arrow scan:
    cosine argmax against the broadcast centroid matrix, first-index
    ties (= the struct-argsort's tie-to-lower-cell rule). The round-10
    sweep of the r9 argmin decision rule found this the remaining hot
    offender: the transform/zip_with Column form evaluates INTERPRETED
    per element (~2.7 ms/row at 16 cells x 64 dims — measured 5.5 s
    for a 2000-row corpus at sf0.1, SLOWER than brute force), while
    this dense (batch x cells) matmul assigns the same corpus in
    ~0.2 s. Query-side probe ranking stays a HOF Column — bounded
    query rows are exactly the rule's cold-path carve-out.

    Zero vectors: cosine is NaN on both paths (the HOF's null guard
    maps to NaN here); corpora are non-zero by contract. Output
    carries ``vec_alias`` as array<double> — ``cosine_similarity``
    casts to double anyway, so downstream sims are value-identical.
    """
    import numpy as np

    cents = np.asarray(centroids, dtype=np.float64)
    cnorm = np.sqrt((cents * cents).sum(1))

    def _assign(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            v = np.stack(pdf[vec_alias].to_numpy()).astype(np.float64)
            sims = (v @ cents.T) / (
                np.sqrt((v * v).sum(1))[:, None] * cnorm[None, :]
            )
            yield pdf.assign(cell=sims.argmax(1).astype(np.int32))

    id_type = df.schema[id_alias].dataType.simpleString()
    passthrough = [
        (f.name, f.dataType.simpleString())
        for f in df.schema.fields
        if f.name not in (id_alias, vec_alias)
    ]
    extra = "".join(f", {n} {t}" for n, t in passthrough)
    return df.select(
        F.col(id_alias),
        F.col(vec_alias).cast("array<double>").alias(vec_alias),
        *[F.col(n) for n, _t in passthrough],
    ).mapInPandas(
        _assign,
        schema=(
            f"{id_alias} {id_type}, {vec_alias} array<double>"
            f"{extra}, cell int"
        ),
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    n_cells: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Approximate top-k via an IVF (inverted-file) coarse quantizer.

    The other classic ANN scale path besides sign-bit LSH: partition the
    corpus into ``n_cells`` Voronoi cells around centroid vectors, then
    search only the ``n_probe`` cells nearest each query. Candidate
    generation is an equi-join on the cell id; exact cosine re-ranks.

    Centroids here are a deterministic pseudo-random sample of corpus
    vectors (the ``n_cells`` smallest ``xxhash64(id)`` values — stable
    across runs/partitionings) rather than trained k-means: sampled
    centroids are the standard cheap initialization and keep the
    operator fully deterministic for testing. The corpus side is
    assigned ONCE (one scan, one small broadcast of centroids) and is
    reusable across query batches; raising ``n_probe`` raises recall
    touching only the query side — same knob structure as multi-probe
    LSH. Recall < 1 by construction, so no SQL oracle; recall is pinned
    against brute force in tests.
    """
    return ivf_topk_filtered(
        corpus,
        queries,
        k,
        predicate=None,
        n_cells=n_cells,
        n_probe=n_probe,
        id_col=id_col,
        vec_col=vec_col,
        query_id_col=query_id_col,
    )


def ivf_topk_filtered(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    predicate: Column | None,
    n_cells: int = 16,
    n_probe: int = 4,
    strategy: str = "pre",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Metadata-filtered approximate top-k (round-10, VERDICT r9 #4):
    ``ivf_topk`` semantics restricted to the corpus rows satisfying
    ``predicate`` (a Column over the corpus's metadata columns — the
    "lang = 'en' AND split = 'train'" shape every real retrieval
    pipeline carries). ``predicate=None`` IS plain ``ivf_topk``
    (that function delegates here — one implementation, one place for
    tie-rule and plan fixes).

    Centroids are always sampled from the FULL corpus: the quantizer is
    a build-time artifact, predicates are query-time, and a per-predicate
    quantizer would make results depend on the filter in ways no stored
    index could serve.

    Two strategies, selectivity crossover documented:

    * ``"pre"`` (default) — apply the predicate BEFORE cell assignment:
      only surviving rows are assigned and probe-joined, so the
      predicate reaches the parquet scan (plan-pinned: PushedFilters on
      the corpus scan below the probe join) and each probed cell
      contributes candidates FROM THE FILTERED SUBSET. Recall against
      the filtered brute force is then predicate-independent — the
      right choice for selective predicates (the common case), and the
      one the recall contract pins.
    * ``"post"`` — assign/probe the full corpus, apply the predicate to
      the probe-join survivors. The predicate Column is still evaluated
      once per corpus row (it rides the assignment scan as a boolean),
      so "post" does NOT save predicate cost — what it models is a
      deployment whose INDEX cannot prune by the predicate (a stored
      code table with no metadata column: candidates come from
      unfiltered cells, then filter). With a selective predicate most
      of the ``n_probe`` candidate budget is spent on rows the filter
      then discards (surviving candidates scale with selectivity, so
      recall DEGRADES as the predicate narrows) — which is exactly the
      crossover to measure before choosing a layout; truly
      join-shaped predicates need a semi-join on the id before or
      after the probe instead of a Column.

    Both strategies are EXACT (equal to brute force on the filtered
    subset) when ``n_probe == n_cells`` — pinned by tests; recall at
    smaller probe budgets is pinned by the ``ann_filtered_recall_bound``
    contract.
    """
    if strategy not in ("pre", "post"):
        raise ValueError(f"unknown strategy: {strategy!r}")
    if predicate is None:
        predicate, strategy = F.lit(True), "pre"
    if n_probe > n_cells:
        raise ValueError("n_probe cannot exceed n_cells")
    cent_rows = (
        corpus.select(F.col(id_col), F.col(vec_col).cast("array<double>"))
        .orderBy(F.xxhash64(F.col(id_col).cast("string")), F.col(id_col))
        .limit(n_cells)
        .collect()
    )
    centroids = [list(r[1]) for r in cent_rows]
    cent_lit = lit_doubles(centroids)

    def cell_ranking(vec: Column) -> Column:
        return F.array_sort(
            F.transform(
                cent_lit,
                lambda cvec, i: F.struct(
                    (-cosine_similarity(vec, cvec)).alias("d"),
                    i.cast("int").alias("cell"),
                ),
            )
        )

    # Corpus-side assignment is the vectorized Arrow scan (the argmin
    # rule, see _assign_cells_blas); the "pre" predicate is applied to
    # the source BEFORE the scan, so it still reaches the parquet read
    # (PushedFilters below the probe join — plan-pinned). "post"
    # carries the predicate verdict through as a boolean column.
    corpus_side = corpus.filter(predicate) if strategy == "pre" else corpus
    c = _assign_cells_blas(
        corpus_side.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("_cvec"),
            *([] if strategy == "pre" else [predicate.alias("_keep")]),
        ),
        centroids,
        "neighbor_id",
        "_cvec",
    )
    q = queries.select(
        F.col(query_id_col).alias("_qid"), F.col(vec_col).alias("_qvec")
    ).withColumn(
        "cell",
        F.explode(
            F.slice(cell_ranking(F.col("_qvec")), 1, n_probe)["cell"]
        ),
    )
    sim = F.round(cosine_similarity(F.col("_qvec"), F.col("_cvec")), 6)
    scored = c.join(F.broadcast(q), "cell").filter(
        F.col("neighbor_id") != F.col("_qid")
    )
    if strategy == "post":
        scored = scored.filter(F.col("_keep"))
    scored = scored.select(
        F.col("_qid").alias("query_id"), "neighbor_id", sim.alias("sim")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


def ivf_cell_census(
    corpus: DataFrame,
    n_cells: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    predicate: Column | None = None,
) -> DataFrame:
    """Driver-checkable companion of :func:`ivf_topk` (round-5 VERDICT
    next-round #2): pins the IVF building blocks — the deterministic
    bounded centroid sample, the broadcast-literal argmin cell
    assignment with the struct-argsort device, and the per-cell
    aggregation — in EXACT integer arithmetic so the whole census is
    hash-oracle-able cross-engine, while ``ivf_topk``'s float-cosine
    recall stays pinned by the brute-force tests.

    Integer device: coordinates quantize to micro-units
    (``round(x*1e6)`` BIGINT, the ``random_projection_e6`` device);
    centroids are the e6 vectors of the ``n_cells`` corpus rows with
    the smallest ``(md5(id), id)`` — the cross-engine sampling device
    (``ivf_topk`` itself uses xxhash64, Spark-only, same bounded-sample
    discipline). Assignment = argmin squared-L2 over the broadcast
    literal centroids, ties to the lower centroid rank — exactly
    ``ivf_topk``'s struct-argsort argmin. One scan, one tiny collect
    (``n_cells`` rows), one partial-agg'd shuffle on the cell key.

    Returns one row per cell: (cell_rank, centroid_vec_id, n_assigned,
    sum_min_d2) — empty cells absent (the oracle says the same).

    ``predicate`` (round-10): census only the corpus rows satisfying it
    while still sampling centroids from the FULL corpus — the filtered
    twin ``ivf_topk_filtered``'s assignment semantics (the quantizer is
    a build-time artifact; the filter is query-time), so the filtered
    cell-balance audit is pinned by the same oracle shape with a WHERE
    on the assignment side only.
    """
    e6 = F.transform(
        F.col(vec_col).cast("array<double>"),
        lambda x: F.round(x * 1e6).cast("long"),
    )
    base = corpus.select(F.col(id_col).alias("_id"), e6.alias("_e6"))
    assign_src = (
        base
        if predicate is None
        else corpus.filter(predicate).select(
            F.col(id_col).alias("_id"), e6.alias("_e6")
        )
    )
    cent_rows = (
        base.orderBy(F.md5(F.col("_id").cast("string")), F.col("_id"))
        .limit(n_cells)
        .collect()
    )
    cents = [(int(r["_id"]), list(r["_e6"])) for r in cent_rows]
    if not cents:
        # An empty F.array() of score structs would fail ANALYSIS with
        # an opaque extract-field error — name the real cause instead.
        raise ValueError(
            "ivf_cell_census: corpus has no rows to sample centroids from"
        )

    # Transform-over-literal-array argmin (round-9 plan-size fix, see
    # pq._nearest_code): one lambda instead of n_cells unrolled
    # subtrees; first-index-of-min keeps the tie-to-lower-rank rule.
    cent_lit = F.array(
        *[
            F.array(*[F.lit(int(x)).cast("long") for x in cvec])
            for _cvid, cvec in cents
        ]
    )
    d2s = F.transform(
        cent_lit,
        lambda lit: F.aggregate(
            F.zip_with(F.col("_e6"), lit, lambda a, b: (a - b) * (a - b)),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ),
    )
    min_d2 = F.array_min(d2s)
    cvid_map = F.map_from_arrays(
        F.array(*[F.lit(i) for i in range(len(cents))]),
        F.array(*[F.lit(cv).cast("long") for cv, _ in cents]),
    )
    return (
        assign_src.select(
            (F.array_position(d2s, min_d2) - 1)
            .cast("long")
            .alias("cell_rank"),
            min_d2.alias("_d2"),
        )
        .withColumn(
            "centroid_vec_id", cvid_map[F.col("cell_rank").cast("int")]
        )
        .groupBy("cell_rank", "centroid_vec_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_assigned"),
            F.sum("_d2").cast("long").alias("sum_min_d2"),
        )
    )


def _with_self_dot(df: DataFrame, id_alias: str, vec_alias: str, n2_alias: str,
                   id_col: str, vec_col: str,
                   extra_cols: tuple[str, ...] = ()) -> DataFrame:
    """(id, vec_double, self-dot[, extras]) with the self-dot materialized
    ONCE per vector — inlining the norm into a pairwise expression would
    recompute it |pairs|/|vectors| times (measured 3x+ on the near-dup
    scan)."""
    v = F.col(vec_col).cast("array<double>")
    return df.select(
        F.col(id_col).alias(id_alias), v.alias(vec_alias), *extra_cols
    ).select(
        id_alias,
        vec_alias,
        F.aggregate(
            F.zip_with(F.col(vec_alias), F.col(vec_alias), lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias(n2_alias),
        *extra_cols,
    )


def cosine_neardup_pairs(
    df: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All unordered pairs with cosine >= threshold (exact, quadratic).

    The oracle-checkable reference semantics; at scale, run after
    :func:`lsh_bucket` blocking (join on bucket) instead of the raw
    self-join. Per-vector self-dots are precomputed, so each pair costs
    ONE fold (the cross dot) — numerically identical to the inline
    formula (same per-element fold order), just not recomputed.
    """
    a = _with_self_dot(df, "id_a", "_va", "_na2", id_col, vec_col)
    b = _with_self_dot(df, "id_b", "_vb", "_nb2", id_col, vec_col)
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", _pair_sim().alias("sim"))
        .filter(F.col("sim") >= threshold)
    )


def _pair_sim():
    """Rounded cosine over (_va,_na2)/(_vb,_nb2) pair columns. One fold per
    pair; bit-exact under operand swap (elementwise products commute, the
    fold order over elements is fixed), so callers may orient pairs freely."""
    denom = F.sqrt(F.col("_na2")) * F.sqrt(F.col("_nb2"))
    dot = F.aggregate(
        F.zip_with(F.col("_va"), F.col("_vb"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return F.round(F.when(denom != 0.0, dot / denom), 6)


def cosine_neardup_blocked(
    df: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_blocks: int = 16,
) -> DataFrame:
    """Exact all-pairs cosine >= threshold as a block-grid EQUI-join.

    Same answer as :func:`cosine_neardup_pairs` (identical fold shapes, so
    bit-exact), different physical plan. The naive ``id_a < id_b`` θ-join
    plans as BroadcastNestedLoopJoin — one whole side broadcast, compute
    skewed onto however many partitions the other side has. Here each
    vector hashes to one of B blocks, a tiny broadcast task list enumerates
    the B·(B+1)/2 unordered block pairs, and both replicated sides meet in
    a composite-key equi-join on (block_a, block_b): shuffle-partitioned
    work units of ~(n/B)² pairs each, B-fold replication instead of a
    full-table broadcast, AQE-splittable, no nested loop.

    Exact all-pairs at a low threshold is inherently Θ(n²) *compute* —
    measured on this corpus the similarity distribution is a continuum
    through any threshold (pairs at 0.4000x), so no LSH banding can block
    it with guaranteed recall. This operator distributes that compute
    evenly; for genuinely large corpora use :func:`lsh_bucket` /
    :func:`ann_topk_lsh` (approximate, high-threshold regimes) or the
    :func:`cosine_neardup_blas` throughput twin.
    """
    spark = df.sparkSession
    tasks = spark.createDataFrame(
        [(i, j) for i in range(num_blocks) for j in range(i, num_blocks)],
        "_ba int, _bb int",
    )
    # Hash the id into its block (rather than pmod on the raw id): works
    # for any id type, and id allocation patterns (strides, parity)
    # cannot collapse the corpus into few blocks and re-skew the grid.
    blk = lambda c: F.pmod(F.xxhash64(c), F.lit(num_blocks)).cast("int")  # noqa: E731
    a = _with_self_dot(df, "id_a", "_va", "_na2", id_col, vec_col).withColumn(
        "_blk_a", blk(F.col("id_a"))
    )
    b = _with_self_dot(df, "id_b", "_vb", "_nb2", id_col, vec_col).withColumn(
        "_blk_b", blk(F.col("id_b"))
    )
    exp_a = a.join(F.broadcast(tasks), F.col("_blk_a") == F.col("_ba"))
    exp_b = b.join(F.broadcast(tasks), F.col("_blk_b") == F.col("_bb"))
    pairs = exp_a.join(exp_b, ["_ba", "_bb"]).filter(
        (F.col("_ba") != F.col("_bb")) | (F.col("id_a") < F.col("id_b"))
    )
    return (
        pairs.select(
            F.least("id_a", "id_b").alias("id_a"),
            F.greatest("id_a", "id_b").alias("id_b"),
            _pair_sim().alias("sim"),
        )
        .filter(F.col("sim") >= threshold)
    )


#: Target mean cluster size when ``semantic_dedup_pairs`` auto-derives k.
#: SemDeDup's cost argument requires n/k held constant as the corpus
#: grows: per-cluster pair cost is (n/k)^2 and there are k clusters, so
#: total candidate work is n^2/k = n * TARGET — linear in n only when k
#: scales with n.
SEMANTIC_TARGET_CLUSTER_SIZE = 64


def semantic_dedup_pairs(
    df: DataFrame,
    threshold: float,
    k: int | None = None,
    n_iter: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup-style semantic dedup: cluster the corpus with the
    deterministic k-means (``operators.ml.kmeans_lloyd``), then report
    exact cosine pairs >= ``threshold`` WITHIN each cluster via a
    cluster-key equi-join. Returns (cluster, id_a, id_b, sim), id_a < id_b.

    The published SemDeDup recipe (Abbas et al., 2023, arXiv:2303.09540):
    duplicates in embedding space are near-identical points, so k-means
    blocking finds virtually all of them while cutting candidate
    generation from n² to Σ cluster_i² — with k sized so n/k stays
    constant, that is n²/k, linear in n per cluster count. When ``k`` is
    None (the registered default) it is DERIVED from a cheap corpus
    count as ``max(8, n // SEMANTIC_TARGET_CLUSTER_SIZE)``, enforcing
    that n/k invariant instead of merely documenting it: a fixed k goes
    quadratic at scale (the round-2 10x audit measured ratio 5.2 with
    k frozen at 8). The count is a single column-pruned scan — free
    relative to the n_iter k-means passes that follow, and deterministic,
    so the output remains a pure function of the input. Cross-cluster
    near-dups at the decision boundary are the (documented) recall loss
    that makes this approximate; the exact operators
    (:func:`cosine_neardup_blocked` / grid BLAS) remain the verify path.

    Plan shape: the per-iteration k-means passes are pure Column distance
    folds (no shuffle beyond the (cluster, dim) centroid agg); the pair
    stage shuffles each side once on the cluster key. Everything is
    deterministic — seeds, iteration count, fold order — so the output
    is a pure function of the input (pinned by the pure-Python
    recomputation test, same standing as ``kmeans_embeddings``).
    """
    from hadoop_map_reduce_spark.operators.ml import kmeans_lloyd

    if k is None:
        n = df.select(id_col).count()
        k = max(8, n // SEMANTIC_TARGET_CLUSTER_SIZE)
    assigned, _ = kmeans_lloyd(
        df, vec_col=vec_col, id_col=id_col, k=k, n_iter=n_iter
    )
    a = _with_self_dot(
        assigned, "id_a", "_va", "_na2", id_col, vec_col, extra_cols=("cluster",)
    )
    b = _with_self_dot(
        assigned, "id_b", "_vb", "_nb2", id_col, vec_col, extra_cols=("cluster",)
    )
    return (
        a.join(b, "cluster")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "cluster", "id_a", "id_b", _pair_sim().alias("sim")
        )
        .filter(F.col("sim") >= threshold)
    )


def cosine_neardup_grid_blas(
    df: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_blocks: int = 8,
    row_chunk: int = 2048,
) -> DataFrame:
    """Exact all-pairs cosine >= threshold: the block-grid distribution of
    :func:`cosine_neardup_blocked` with BLAS matmul inside each grid cell.

    Same logical plan as the blocked operator — replicate both sides into
    the B·(B+1)/2 unordered block-pair cells, meet in an equi-join-shaped
    cogroup on (block_a, block_b) — but each cell computes its ~(n/B)²
    sims as one numpy matmul over Arrow-transferred batches instead of
    per-pair Catalyst expression folds (measured ~8× on the 2k-vector
    corpus; the gap widens with pair count). dot/denom evaluation order
    mirrors the fold shape, and the margin from any round-6 boundary
    (≥1e-12 on this corpus, vs ~1e-16 summation-order noise) means the
    rounded sims are bit-identical to the fold's — parity is test-pinned
    against :func:`cosine_neardup_blocked`.

    At 100 TB: pick B so a block (~n/B vectors) fits an executor's Arrow
    batch; each cell is an independent work unit of bounded memory
    (``row_chunk`` bounds the per-matmul slab), the shuffle moves each
    vector B times (vs a full-table broadcast), and AQE can split hot
    cells. Exact quadratic compute is inherent at a low threshold; this
    distributes it at BLAS throughput.
    """
    import numpy as np
    import pandas as pd

    spark = df.sparkSession
    grid = [(i, j) for i in range(num_blocks) for j in range(i, num_blocks)]

    def side(id_alias: str, vec_alias: str, key_a: str, key_b: str, member):
        # Every name is per-side (including the task-list columns): both
        # lineages come from the same scan, and any shared column would
        # trip Spark's ambiguous-self-join analysis in the cogroup below.
        # Cogroup matches grouping keys positionally, so the differing
        # key names across sides are fine.
        tasks = spark.createDataFrame(grid, f"{key_a} int, {key_b} int")
        s = df.filter(F.col(vec_col).isNotNull()).select(
            F.col(id_col).alias(id_alias),
            F.col(vec_col).cast("array<double>").alias(vec_alias),
        )
        blk = F.pmod(F.xxhash64(F.col(id_alias)), F.lit(num_blocks)).cast(
            "int"
        )
        return s.join(F.broadcast(tasks), blk == F.col(member))

    rep_a = side("_ida", "_va", "_ka1", "_ka2", "_ka1")
    rep_b = side("_idb", "_vb", "_kb1", "_kb2", "_kb2")
    thr = float(threshold)

    def cell(key, left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "id_a": np.array([], dtype=np.int64),
                "id_b": np.array([], dtype=np.int64),
                "sim": np.array([], dtype=np.float64),
            }
        )
        if len(left) == 0 or len(right) == 0:
            return empty
        ids_a = left["_ida"].to_numpy(dtype=np.int64)
        ids_b = right["_idb"].to_numpy(dtype=np.int64)
        A = np.array(list(left["_va"]), dtype=np.float64)
        B = np.array(list(right["_vb"]), dtype=np.float64)
        na = np.sqrt((A * A).sum(axis=1))
        nb = np.sqrt((B * B).sum(axis=1))
        nb[nb == 0] = np.inf  # zero vectors: sim is NULL in the fold, drop
        na[na == 0] = np.inf
        same_block = key[0] == key[1]
        outs = []
        for lo in range(0, len(ids_a), row_chunk):
            hi = lo + row_chunk
            S = np.round(
                (A[lo:hi] @ B.T) / np.outer(na[lo:hi], nb), 6
            )
            mask = S >= thr
            if same_block:
                mask &= ids_a[lo:hi, None] < ids_b[None, :]
            ia, ib = np.nonzero(mask)
            if len(ia):
                outs.append(
                    pd.DataFrame(
                        {
                            "id_a": np.minimum(ids_a[lo:hi][ia], ids_b[ib]),
                            "id_b": np.maximum(ids_a[lo:hi][ia], ids_b[ib]),
                            "sim": S[ia, ib],
                        }
                    )
                )
        return pd.concat(outs) if outs else empty

    return (
        rep_a.groupBy("_ka1", "_ka2")
        .cogroup(rep_b.groupBy("_kb1", "_kb2"))
        .applyInPandas(cell, schema="id_a long, id_b long, sim double")
    )


def prefix_rerank_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    prefix_dims: int,
    shortlist: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Two-stage Matryoshka-style retrieval: coarse top-``shortlist``
    by cosine over the first ``prefix_dims`` dimensions, exact
    full-dimension re-rank of the shortlist to top-``k``.

    The MRL deployment pattern (Kusupati et al., "Matryoshka
    Representation Learning", NeurIPS'22): the coarse pass reads
    prefix_dims/dim of the vector bytes (at 100 TB the shortlist pass
    is the only corpus-wide scan and it touches a fraction of each
    vector; column pruning cannot help inside an array, so production
    stores the prefix as its own column — same plan shape), and the
    re-rank touches shortlist x n_queries full vectors, a
    broadcast-sized set. Same (query_id, neighbor_id, rank, sim)
    contract and determinism discipline (round-6 sim, neighbor-id tie
    break) as cosine_topk."""
    prefix = F.slice(F.col(vec_col), 1, prefix_dims)
    coarse = cosine_topk(
        corpus.withColumn(vec_col, prefix),
        queries.withColumn(vec_col, prefix),
        k=shortlist,
        id_col=id_col,
        vec_col=vec_col,
    ).select("query_id", "neighbor_id")
    cand = coarse.join(
        corpus.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("_cvec"),
        ),
        "neighbor_id",
    )
    qfull = queries.select(
        F.col("query_id"), F.col(vec_col).alias("_qvec")
    )
    sim = F.round(
        cosine_similarity(F.col("_qvec"), F.col("_cvec")), 6
    )
    scored = cand.join(F.broadcast(qfull), "query_id").select(
        "query_id", "neighbor_id", sim.alias("sim")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn(
        "rank", F.row_number().over(w).cast("long")
    ).filter(F.col("rank") <= k)
