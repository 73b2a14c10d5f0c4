"""Relational operators Spark lacks as single primitives, composed
scale-first from DataFrame ops (no Python UDFs, no driver-side loops).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    payload_cols: list[str],
    right_on: str | None = None,
    tolerance: str | None = None,
) -> DataFrame:
    """Backward as-of join: for each left row, the latest right row with
    ``right_time <= left_time`` for the same key.

    ``tolerance`` (an SQL interval literal, e.g. ``"INTERVAL 7 DAY"``)
    additionally requires ``right_time >= left_time - tolerance``: stale
    matches beyond the window come back as nulls, exactly like pandas
    ``merge_asof(tolerance=...)``. The bound is applied to the carried
    match AFTER the merge scan — interval arithmetic on the original
    timestamps, no epoch truncation — so the plan shape (one shuffle,
    linear) is unchanged.

    Scale-first design: instead of the naive inequality join (which
    explodes to |left| × |matching right| before aggregating), union the
    two streams tagged, sort within key by (time, tag), and carry the last
    seen payload forward with ``last(..., ignorenulls=True)`` — one shuffle
    on the key, linear work, no row explosion. This is the merge-join
    formulation of as-of.

    Ties: a right row at exactly ``left_time`` matches; among right rows
    with equal time the one with the greatest payload tuple (by the order
    of ``payload_cols``) wins, deterministically.

    Payload columns travel as ONE struct through a single
    ``last(ignorenulls=True)`` — carrying them independently would stitch
    fields from different right rows whenever the latest row holds a null
    in one payload column.
    """
    lcols = left.columns
    rtypes = dict(right.dtypes)
    # __rt (the matched right row's time) rides first in the payload
    # struct for the tolerance check; equal-time right rows have equal
    # __rt, so the struct sort still tie-breaks on the payload columns.
    payload_type = (
        "struct<"
        + ",".join(
            [f"__rt:{rtypes[right_time]}"]
            + [f"{c}:{rtypes[c]}" for c in payload_cols]
        )
        + ">"
    )
    tagged_r = right.select(
        F.col(right_on or on).alias("_k"),
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_tag"),
        F.struct(
            F.col(right_time).alias("__rt"),
            *[F.col(c) for c in payload_cols],
        ).alias("_p"),
        *[F.lit(None).alias(f"_l_{c}") for c in lcols],
    )
    tagged_l = left.select(
        F.col(on).alias("_k"),
        F.col(left_time).alias("_t"),
        F.lit(1).alias("_tag"),
        F.lit(None).cast(payload_type).alias("_p"),
        *[F.col(c).alias(f"_l_{c}") for c in lcols],
    )
    # Order right rows before left rows at the same instant (<= semantics);
    # among equal-time right rows the later payload overwrites the earlier,
    # so sort the payload struct ascending for a deterministic
    # "greatest wins".
    w = (
        Window.partitionBy("_k")
        .orderBy(
            F.col("_t").asc(), F.col("_tag").asc(), F.col("_p").asc_nulls_first()
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = tagged_r.unionByName(tagged_l).select(
        "*", F.last(F.col("_p"), ignorenulls=True).over(w).alias("_asof")
    )
    if tolerance is None:
        in_window = F.lit(True)
    else:
        in_window = F.col("_asof.__rt") >= F.col("_t") - F.expr(tolerance)
    out = merged.filter(F.col("_tag") == 1).select(
        *[F.col(f"_l_{c}").alias(c) for c in lcols],
        *[
            F.when(in_window, F.col(f"_asof.{c}")).alias(c)
            for c in payload_cols
        ],
    )
    return out


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    payload_cols: list[str],
    right_on: str | None = None,
    tolerance: str | None = None,
) -> DataFrame:
    """Forward as-of join: for each left row, the EARLIEST right row with
    ``right_time >= left_time`` for the same key (pandas ``merge_asof``
    ``direction='forward'``).

    Mirror of :func:`asof_join_backward`'s merge formulation — union the
    tagged streams, sort within key by time DESCENDING, and carry the
    last-seen right payload, which at any left row is the right row with
    the smallest time >= the left time. One shuffle, linear, no row
    explosion. ``tolerance`` bounds the match to
    ``right_time <= left_time + tolerance``.

    Ties: a right row at exactly ``left_time`` matches; among right rows
    with equal time the SMALLEST payload tuple wins (deterministic, the
    mirror of backward's greatest-wins).
    """
    lcols = left.columns
    rtypes = dict(right.dtypes)
    payload_type = (
        "struct<"
        + ",".join(
            [f"__rt:{rtypes[right_time]}"]
            + [f"{c}:{rtypes[c]}" for c in payload_cols]
        )
        + ">"
    )
    tagged_r = right.select(
        F.col(right_on or on).alias("_k"),
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_tag"),
        F.struct(
            F.col(right_time).alias("__rt"),
            *[F.col(c) for c in payload_cols],
        ).alias("_p"),
        *[F.lit(None).alias(f"_l_{c}") for c in lcols],
    )
    tagged_l = left.select(
        F.col(on).alias("_k"),
        F.col(left_time).alias("_t"),
        F.lit(1).alias("_tag"),
        F.lit(None).cast(payload_type).alias("_p"),
        *[F.col(c).alias(f"_l_{c}") for c in lcols],
    )
    # Scanning time-descending: right rows at the same instant must land
    # before left rows (>= matches), and among equal-time right rows the
    # payload sorts DESCENDING so the last one carried is the smallest.
    w = (
        Window.partitionBy("_k")
        .orderBy(
            F.col("_t").desc(), F.col("_tag").asc(), F.col("_p").desc_nulls_first()
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = tagged_r.unionByName(tagged_l).select(
        "*", F.last(F.col("_p"), ignorenulls=True).over(w).alias("_asof")
    )
    if tolerance is None:
        in_window = F.lit(True)
    else:
        in_window = F.col("_asof.__rt") <= F.col("_t") + F.expr(tolerance)
    return merged.filter(F.col("_tag") == 1).select(
        *[F.col(f"_l_{c}").alias(c) for c in lcols],
        *[
            F.when(in_window, F.col(f"_asof.{c}")).alias(c)
            for c in payload_cols
        ],
    )


def asof_join_nearest(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    payload_cols: list[str],
    right_on: str | None = None,
) -> DataFrame:
    """Nearest as-of join: for each left row, the right row whose time is
    closest in absolute distance (pandas ``merge_asof``
    ``direction='nearest'``); equidistant candidates resolve to the
    BACKWARD match, matching pandas.

    Both directional carries ride ONE hash exchange on the key: the two
    window passes share the same ``partitionBy``, so Spark plans a single
    shuffle with two in-partition sorts (ascending then descending) —
    still linear, no row explosion.
    """
    lcols = left.columns
    rtypes = dict(right.dtypes)
    payload_type = (
        "struct<"
        + ",".join(
            [f"__rt:{rtypes[right_time]}"]
            + [f"{c}:{rtypes[c]}" for c in payload_cols]
        )
        + ">"
    )
    tagged_r = right.select(
        F.col(right_on or on).alias("_k"),
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_tag"),
        F.struct(
            F.col(right_time).alias("__rt"),
            *[F.col(c) for c in payload_cols],
        ).alias("_p"),
        *[F.lit(None).alias(f"_l_{c}") for c in lcols],
    )
    tagged_l = left.select(
        F.col(on).alias("_k"),
        F.col(left_time).alias("_t"),
        F.lit(1).alias("_tag"),
        F.lit(None).cast(payload_type).alias("_p"),
        *[F.col(c).alias(f"_l_{c}") for c in lcols],
    )
    merged = tagged_r.unionByName(tagged_l)
    w_back = (
        Window.partitionBy("_k")
        .orderBy(
            F.col("_t").asc(), F.col("_tag").asc(), F.col("_p").asc_nulls_first()
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy("_k")
        .orderBy(
            F.col("_t").desc(), F.col("_tag").asc(), F.col("_p").desc_nulls_first()
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    both = merged.select(
        "*",
        F.last(F.col("_p"), ignorenulls=True).over(w_back).alias("_back"),
        F.last(F.col("_p"), ignorenulls=True).over(w_fwd).alias("_fwd"),
    )
    # Distances in exact microseconds (unix_micros; whole-second
    # unix_timestamp would truncate sub-second differences, flipping the
    # tie-break near the midpoint vs an exact-epoch oracle and vs pandas
    # merge_asof). Date-typed time columns cast losslessly to midnight
    # timestamps. NULL distance (no candidate on that side) loses to any
    # real one.
    d_back = F.unix_micros(F.col("_t").cast("timestamp")) - F.unix_micros(
        F.col("_back.__rt").cast("timestamp")
    )
    d_fwd = F.unix_micros(F.col("_fwd.__rt").cast("timestamp")) - F.unix_micros(
        F.col("_t").cast("timestamp")
    )
    use_back = F.when(F.col("_fwd").isNull(), F.lit(True)).otherwise(
        F.col("_back").isNotNull() & (d_back <= d_fwd)
    )
    chosen = F.when(use_back, F.col("_back")).otherwise(F.col("_fwd"))
    return both.filter(F.col("_tag") == 1).select(
        *[F.col(f"_l_{c}").alias(c) for c in lcols],
        *[chosen.getField(c).alias(c) for c in payload_cols],
    )


def sessionize(
    events: DataFrame,
    key: str,
    time_col: str,
    gap_seconds: int,
    order_tiebreak: str | None = None,
) -> DataFrame:
    """Assign session ids per key: a new session starts when the gap from
    the previous event exceeds ``gap_seconds``. Adds ``session_id``
    (0-based per key). Classic lag → gap flag → running sum; two window
    passes over one key-partitioned sort, no state loops.
    """
    order = [F.col(time_col).asc()]
    if order_tiebreak:
        order.append(F.col(order_tiebreak).asc())
    w = Window.partitionBy(key).orderBy(*order)
    prev_ts = F.lag(F.col(time_col)).over(w)
    is_new = F.when(
        prev_ts.isNull()
        | (F.unix_timestamp(F.col(time_col)) - F.unix_timestamp(prev_ts) > gap_seconds),
        F.lit(1),
    ).otherwise(F.lit(0))
    with_flag = events.withColumn("_new_session", is_new)
    running = (
        Window.partitionBy(key)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return with_flag.withColumn(
        "session_id", (F.sum("_new_session").over(running) - 1).cast("long")
    ).drop("_new_session")


def top_k(df: DataFrame, k: int, *order_cols: Column) -> DataFrame:
    """Global top-k with a total order (caller supplies tie-breaking
    columns). Spark plans this as TakeOrderedAndProject — per-partition
    heaps then a k-row merge, no full sort of the data."""
    return df.orderBy(*order_cols).limit(k)


def exact_ranks_for(
    scored: DataFrame,
    candidates: DataFrame,
    score_col: str,
    id_col: str,
    rank_col: str,
) -> DataFrame:
    """Exact global row_number rank under the total order
    ``(score_col DESC, id_col ASC)`` for a BOUNDED candidate id set,
    without a global sort of ``scored``.

    rank(c) = 1 + |{s : s.score > c.score OR (s.score = c.score AND
    s.id < c.id)}| — computed as one broadcast-nested-loop pass of the
    corpus-sized ``scored`` table against the (≤ a few hundred row)
    candidate set, then a count per candidate. Fully parallel: the big
    side streams, only candidate rows are broadcast. This is how a
    top-k-then-fuse plan recovers EXACT global ranks for the handful of
    winners that sit outside a side's pre-truncated top-k — the
    alternative (a row_number window with an empty partition spec) sorts
    the whole table on one task.

    Precondition: ``score_col`` must be non-null in ``scored``. The
    count-of-better join predicate null-filters every comparison, so a
    NULL-scored candidate would get rank 1 — silently diverging from
    the ``DESC NULLS LAST`` order of the row_number window this
    replicates. Current callers aggregate into the score (never null);
    new callers with nullable scores must pre-filter or pre-coalesce.

    Returns ``(id_col, rank_col)`` for candidates PRESENT in ``scored``
    only (absent candidates are the caller's "unranked" case).
    ``scored`` is scanned twice (candidate-row probe + count pass) —
    callers should persist it (``cache_one_slot``) when it is derived
    from an expensive pipeline.
    """
    cand_rows = scored.join(
        F.broadcast(candidates.select(id_col).distinct()), id_col
    ).select(
        F.col(id_col).alias("_c_id"), F.col(score_col).alias("_c_score")
    )
    s = scored.select(
        F.col(id_col).alias("_s_id"), F.col(score_col).alias("_s_score")
    )
    better = (
        s.join(
            F.broadcast(cand_rows),
            (F.col("_s_score") > F.col("_c_score"))
            | (
                (F.col("_s_score") == F.col("_c_score"))
                & (F.col("_s_id") < F.col("_c_id"))
            ),
        )
        .groupBy("_c_id")
        .agg(F.count(F.lit(1)).alias("_better"))
    )
    return cand_rows.join(better, "_c_id", "left").select(
        F.col("_c_id").alias(id_col),
        (F.coalesce(F.col("_better"), F.lit(0)) + F.lit(1))
        .cast("long")
        .alias(rank_col),
    )


def merge_upsert(
    target: DataFrame, source: DataFrame, on: list[str]
) -> DataFrame:
    """MERGE/upsert semantics (WHEN MATCHED THEN UPDATE SET * / WHEN NOT
    MATCHED THEN INSERT *): source rows win on key collision, target rows
    survive otherwise. The engine-level operator behind CDC apply — Spark
    SQL's MERGE INTO statement needs a v2 catalog table (Delta/Iceberg),
    so the engine provides the same semantics over any DataFrame.

    Plan shape: one LEFT ANTI equi-join (target minus source keys) + a
    union — cheaper than the naive full-outer-join-plus-per-column-
    coalesce, which shuffles both sides AND evaluates width(columns)
    conditionals. The anti join broadcasts when the CDC batch is small
    (the common case: daily updates ≪ accumulated table), making the
    merge a map-only pass over the big target.

    Requires identical schemas (positional `unionByName`); dedupe the
    source on `on` first if a CDC batch can carry multiple versions of
    one key.
    """
    cond = None
    for k in on:
        clause = target[k].eqNullSafe(source[k])
        cond = clause if cond is None else cond & clause
    survivors = target.join(source, cond, "left_anti")
    return source.unionByName(survivors)


def apply_cdc(
    target: DataFrame,
    source: DataFrame,
    on: list[str],
    op_col: str = "op",
    delete_op: str = "D",
) -> DataFrame:
    """Full CDC apply — :func:`merge_upsert` plus delete semantics.

    ``source`` carries an operation column (insert/update rows with any
    value, deletes marked ``delete_op``). Every target row whose key
    appears in the batch drops via one LEFT ANTI equi-join (only the
    batch's key columns are shipped — the broadcast stays slim no matter
    how wide the change rows are); non-delete batch rows are appended
    with ``op_col`` removed. Same map-only shape over the big target as
    merge_upsert; this is the GDPR-deletion / tombstone-apply path a
    long-lived 100-TB corpus store needs.

    Requires at most one source row per key (dedupe the batch to its
    latest version first, as any CDC consumer must). A NULL ``op_col``
    is applied as an upsert, never a delete — the null-safe filter below
    keeps malformed rows visible in the output instead of silently
    dropping the key (a plain ``!=`` would evaluate NULL and turn a
    missing op into a hard delete).
    """
    keys = source.select(*on).distinct()
    cond = None
    for k in on:
        clause = target[k].eqNullSafe(keys[k])
        cond = clause if cond is None else cond & clause
    survivors = target.join(keys, cond, "left_anti")
    upserts = source.filter(
        ~F.col(op_col).eqNullSafe(F.lit(delete_op))
    ).drop(op_col)
    return upserts.unionByName(survivors)


def salted_equi_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    salts: int = 8,
    salt_by: str | None = None,
) -> DataFrame:
    """Skew-safe inner equi-join: salt-and-replicate when one join key
    dominates the shuffle (the manual fallback for skew AQE cannot fix,
    e.g. a single key holding >1 task's worth of rows on BOTH stages of
    a sort-merge join).

    The big side gets a deterministic salt in [0, salts) derived from
    ``salt_by`` — REQUIRED, and it must vary WITHIN a join key (the
    table's PK, a row id): salting by the join key itself would give
    every row of a hot key the same salt, zero spread, silently
    defeating the operator in exactly the skew case it exists for
    (round-5 ADVICE) — so ``salt_by in (None, on)`` raises. The small
    side is replicated ``salts`` times via one ``explode(sequence)``.
    Joining on (key, salt) splits each hot key's rows into ``salts``
    independent tasks; the result is row-identical to the plain inner
    join because every (key, salt) pair exists exactly once on the
    replicated side.

    Cost model: small side ships ``salts`` copies — use for
    big-×-medium joins where the medium side is above the broadcast
    threshold but << big (broadcast would solve skew outright below
    it). ``salts`` should be ~ hot-key rows / healthy-task rows.
    """
    if salts < 1:
        raise ValueError("salts must be >= 1")
    if salt_by is None or salt_by == on:
        raise ValueError(
            "salt_by must name a column that varies within a join key "
            "(e.g. the big table's PK); salting by the join key itself "
            "gives every row of a hot key the same salt — zero spread"
        )
    src = F.col(salt_by)
    salted_big = big.withColumn(
        "_salt", F.pmod(F.xxhash64(src), F.lit(salts)).cast("int")
    )
    replicated = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salts - 1)))
    )
    return salted_big.join(replicated, [on, "_salt"]).drop("_salt")


def global_shuffle_positions(
    df: DataFrame,
    id_col: str = "doc_id",
    seed: str = "s1:",
    out_col: str = "pos",
) -> DataFrame:
    """Exact 0-based position of every row under the pseudorandom total
    order ``(md5(seed || id), id)`` — WITHOUT a global sort (the
    scale-safe zipWithIndex shape):

    - rank within each of 65536 md5-prefix buckets (window partitioned
      by the 4-hex-char prefix);
    - bucket offsets within each 256-way super-bucket (window over the
      65536-row bucket-size table, partitioned by super);
    - super-bucket offsets via a 256x256 broadcast self-join — no
      unpartitioned window anywhere.

    The md5 key is uniform so bucket skew is binomial-tight; the same
    seed reproduces the permutation bit-for-bit on any engine. Changing
    the seed reshuffles every epoch deterministically.
    """
    keyed = df.select(
        id_col,
        F.md5(F.concat(F.lit(seed), F.col(id_col).cast("string"))).alias(
            "_k"
        ),
    ).select(
        id_col,
        "_k",
        F.substring("_k", 1, 4).alias("_b"),
        F.substring("_k", 1, 2).alias("_s"),
    )
    in_bucket = F.row_number().over(
        Window.partitionBy("_b").orderBy("_k", id_col)
    ) - 1
    ranked = keyed.select(
        id_col, "_b", "_s", in_bucket.cast("long").alias("_r")
    )
    sizes = keyed.groupBy("_s", "_b").agg(
        F.count(F.lit(1)).cast("long").alias("_n")
    )
    bucket_off = sizes.select(
        "_b",
        "_s",
        (
            F.sum("_n").over(
                Window.partitionBy("_s")
                .orderBy("_b")
                .rowsBetween(Window.unboundedPreceding, Window.currentRow)
            )
            - F.col("_n")
        ).alias("_boff"),
    )
    sup = sizes.groupBy("_s").agg(F.sum("_n").alias("_sn"))
    sup_off = (
        sup.alias("a")
        .join(
            F.broadcast(sup.alias("b")),
            F.col("b._s") < F.col("a._s"),
            "left",
        )
        .groupBy(F.col("a._s").alias("_s"))
        .agg(F.coalesce(F.sum("b._sn"), F.lit(0)).alias("_soff"))
    )
    return (
        ranked.join(F.broadcast(bucket_off), ["_s", "_b"])
        .join(F.broadcast(sup_off), "_s")
        .select(
            id_col,
            (F.col("_soff") + F.col("_boff") + F.col("_r"))
            .cast("long")
            .alias(out_col),
        )
    )


def interval_union_length(
    intervals: DataFrame,
    key_col: str = "key",
    start_col: str = "s",
    end_col: str = "e",
) -> DataFrame:
    """Total length of the UNION of half-open integer intervals
    ``[s, e)`` per key — the classic gaps-and-islands merge (billing
    coverage, machine-busy time, transit days), fully distributed:
    every window partitions by the key, so the only shuffle is on the
    key and no Exchange SinglePartition can appear at any scale.

    Semantics: overlapping or touching intervals (``next.s <= running
    max e``) merge into one island; the result per key is
    ``(n_islands, covered)`` with ``covered = Σ island (max e - min s)``.
    Empty intervals (``s >= e`` — zero-length AND inverted rows, both
    the empty set under half-open semantics) are dropped FIRST: a
    ``[5, 5)`` row is not an island and an inverted row must not feed
    negative lengths into the arithmetic (round-6 review finding).
    Duplicate ``(key, s, e)`` rows are then unioned away — union is
    idempotent, and the dedup also makes the ``(s, e)`` window order a
    deterministic total order per key (ties in ``s`` alone would leave
    the running-max frame engine-dependent). A key with ONLY empty
    intervals is absent from the output (its union is the empty set).
    """
    # Round-11 (optimization round, guide §2.4): ONE exchange instead
    # of two. A bare .distinct() hash-partitions on (_k, _s, _e) and
    # the window then re-partitions on _k; repartitioning on _k FIRST
    # lets the same exchange satisfy both — HashPartitioning(_k) is a
    # subset of the dedup's required clustering (equal triples land
    # together when equal keys do) and exactly the window's
    # distribution, so Catalyst inserts no second shuffle (plan-pinned
    # in plans/r11/interval_union_days_after.txt: 2 Exchange -> 1).
    iv = (
        intervals.select(
            F.col(key_col).alias("_k"),
            F.col(start_col).cast("long").alias("_s"),
            F.col(end_col).cast("long").alias("_e"),
        )
        .filter(F.col("_s") < F.col("_e"))
        .repartition("_k")
        .dropDuplicates()
    )
    w = Window.partitionBy("_k").orderBy("_s", "_e")
    prev_max = F.max("_e").over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = iv.withColumn(
        "_new",
        F.when(
            prev_max.isNull() | (F.col("_s") > prev_max), F.lit(1)
        ).otherwise(F.lit(0)),
    ).withColumn(
        "_island",
        F.sum("_new").over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    islands = flagged.groupBy("_k", "_island").agg(
        (F.max("_e") - F.min("_s")).alias("_len")
    )
    return islands.groupBy(F.col("_k").alias(key_col)).agg(
        F.count(F.lit(1)).cast("long").alias("n_islands"),
        F.sum("_len").cast("long").alias("covered"),
    )
