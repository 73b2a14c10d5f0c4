"""Structured-Streaming queries registered against the batch oracle.

The reference is batch-only; SURVEY.md §2.2 requires the streaming
category regardless. These entries run a REAL streaming query — file
source, stateful operator, ``availableNow`` trigger — to completion and
return the materialized result, which must equal the batch semantics
DuckDB computes. That makes streaming correctness driver-checkable, not
just locally tested.

Scale honesty: the memory sink here is the bounded verify harness (the
results are small aggregates); production writes go to files/Kafka with
checkpointing. The stateful operators themselves — watermarked windowed
aggregation, keyed dropDuplicates — are the same ones a cluster
deployment would run, state-partitioned by key across executors.
"""

from __future__ import annotations

import atexit
import os
import threading
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_map_reduce_spark.plans.llm_queries import _JACCARD_PAIRS_SQL
from hadoop_map_reduce_spark.plans.reference_queries import (
    _ORACLE_TOKENS,
)
from hadoop_map_reduce_spark.plans.registry import register
from hadoop_map_reduce_spark.plans.llm_queries import _PHASH_H_SQL
from hadoop_map_reduce_spark.plans.curation_queries import (
    FUNNEL_ORACLE,
    funnel_agg,
)
from hadoop_map_reduce_spark.plans.relational_queries import _sql_sum, exact_sum
from hadoop_map_reduce_spark.plans.timeseries_queries import _EWMA_ORACLE
from hadoop_map_reduce_spark.session import load_table

# Streaming-admission one-slot state (stream_neardup_lsh and
# stream_phash_neardup): each query's manifest result is eagerly
# localCheckpointed before the invocation's working dir is deleted, so a
# held result DataFrame stays valid after cleanup; the per-query slot
# release frees that query's PREVIOUS invocation's checkpoint blocks.
# Lock serializes concurrent invocations (module-global slots).
_NEARDUP_LOCK = threading.Lock()
_NEARDUP_PREV_RELEASE: dict[str, Callable[[], None]] = {}


def _cleanup_neardup_slot() -> None:
    for release in _NEARDUP_PREV_RELEASE.values():
        release()
    _NEARDUP_PREV_RELEASE.clear()


atexit.register(_cleanup_neardup_slot)


def _read_stream(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """File-source streaming read of one synthetic table, with the same
    nanos-timestamp handling as the batch ``load_table``."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # Schema must be declared up front for streaming sources; reuse the
    # batch reader's (post-conf) raw schema.
    raw = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    # The streaming file source wants a directory or glob (a bare file
    # path is rejected as basePath); the trailing * matches exactly the
    # one table file while keeping sf_dir as the base directory.
    df = (
        spark.readStream.schema(raw.schema)
        .parquet(os.path.join(sf_dir, f"{name}.parquet*"))
    )
    ts_type = dict(df.dtypes).get("ts")
    if name == "events" and ts_type == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif name == "events" and ts_type == "timestamp_ntz":
        # Same LTZ normalization as load_table (UTC session pinned above).
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def _run_to_table(df: DataFrame, table: str, mode: str) -> DataFrame:
    """Execute the streaming plan to completion (availableNow) into a
    memory sink and return the materialized table."""
    q = (
        df.writeStream.format("memory")
        .queryName(table)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return df.sparkSession.table(table)


@register(
    "stream_events_hourly",
    tags=("streaming", "time", "aggregation"),
    description=(
        "Streaming twin of events_hourly: watermarked 1-hour tumbling "
        "windows over a file-source event stream, run to completion with "
        "availableNow; the final state must equal the batch rollup."
    ),
    oracle=f"""
        SELECT DATE_TRUNC('hour', ts) AS hour,
               COUNT(*) AS n_events,
               {_sql_sum('value', 'total_value')}
        FROM events GROUP BY 1
    """,
)
def stream_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _read_stream(spark, sf_dir, "events")
    agg = (
        events.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour").alias("_win"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            exact_sum(F.col("value"), "total_value"),
        )
        .select(F.col("_win.start").alias("hour"), "n_events", "total_value")
    )
    # Complete mode: every window is in the final result regardless of
    # where the watermark stops advancing when the source drains.
    return _run_to_table(agg, "_hmrs_stream_events_hourly", "complete")


@register(
    "stream_sessionize",
    tags=("streaming", "window", "state"),
    description=(
        "Streaming session windows: session_window(ts, 30 min) per user "
        "over the event stream, merged-on-arrival state, run to "
        "completion; final sessions must equal the batch gap-split. "
        "Boundary note: session_window merges on diff < gap (half-open "
        "[ts, ts+gap)), so the oracle splits on diff >= 1800 — the batch "
        "`sessionization` entry splits on diff > 1800 (both conventions "
        "are valid; each is pinned against its own oracle)."
    ),
    oracle="""
        WITH flagged AS (
            SELECT user_id, ts,
                   CASE WHEN LAG(ts) OVER w IS NULL
                             OR epoch(ts) - epoch(LAG(ts) OVER w) >= 1800
                        THEN 1 ELSE 0 END AS new_session
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
        ), sessions AS (
            SELECT user_id, ts,
                   SUM(new_session) OVER (
                       PARTITION BY user_id ORDER BY ts ASC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS session_id
            FROM flagged
        )
        SELECT user_id,
               MIN(ts) AS session_start,
               CAST(COUNT(*) AS BIGINT) AS n_events
        FROM sessions GROUP BY user_id, session_id
    """,
)
def stream_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The streaming-native form of `sessionization`: state is one
    (user, open-window) row merged as events arrive, partitioned by
    user_id across executors — no per-user sort, no lag window. At
    100 TB of events this is the formulation that holds: the batch
    twin's window functions need a full per-user ordered shuffle, while
    session_window state is O(open sessions) and merges map-side."""
    events = _read_stream(spark, sf_dir, "events")
    agg = (
        events.withWatermark("ts", "2 hours")
        .groupBy("user_id", F.session_window("ts", "30 minutes").alias("_w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("_w.start").alias("session_start"),
            "n_events",
        )
    )
    # Complete mode flushes every session when the availableNow source
    # drains, independent of where the watermark halts.
    return _run_to_table(agg, "_hmrs_stream_sessionize", "complete")


@register(
    "stream_distinct_docs",
    tags=("streaming", "dedup"),
    description=(
        "Streaming keyed dedup: dropDuplicates on (source, md5(text)) "
        "over a document stream (append mode), then a batch count per "
        "source over the materialized distinct set — single stateful "
        "operator in the stream, aggregation outside it."
    ),
    oracle="""
        SELECT source, COUNT(DISTINCT md5(text)) AS n_unique
        FROM documents GROUP BY source
    """,
)
def stream_distinct_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _read_stream(spark, sf_dir, "documents")
    # Null texts are excluded on the Spark side because the oracle's
    # COUNT(DISTINCT md5(text)) skips NULLs — dropDuplicates would keep
    # one (source, NULL) state row and over-count by exactly that row.
    distinct = (
        docs.filter(F.col("text").isNotNull())
        .select("source", F.md5(F.col("text").cast("binary")).alias("_fp"))
        .dropDuplicates(["source", "_fp"])
    )
    table = _run_to_table(distinct, "_hmrs_stream_distinct_docs", "append")
    return table.groupBy("source").agg(F.count(F.lit(1)).alias("n_unique"))


@register(
    "stream_stream_join",
    tags=("streaming", "join"),
    description=(
        "Stream-stream inner join: click events joined to view events of "
        "the same user within [click.ts, click.ts + 10 min], both sides "
        "watermarked (the event-time range bound is what lets Spark "
        "expire join state); run to completion, must equal the batch "
        "interval join."
    ),
    oracle="""
        SELECT a.user_id AS user_id,
               a.event_id AS click_id,
               b.event_id AS view_id
        FROM events a JOIN events b
          ON a.user_id = b.user_id
         AND a.event_type = 'click' AND b.event_type = 'view'
         AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 10 MINUTE
    """,
)
def stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """State stays bounded because the range condition plus watermarks
    give both sides an event-time expiry: a buffered click can stop
    waiting once the view watermark passes click.ts + 10 min, and a
    buffered view once the click watermark passes view.ts. State is
    hash-partitioned by user_id across executors — the same layout as
    any keyed aggregation, so the 100-TB story is the aggregation one.
    """
    clicks = (
        _read_stream(spark, sf_dir, "events")
        .filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", "1 hour")
    )
    views = (
        _read_stream(spark, sf_dir, "events")
        .filter(F.col("event_type") == "view")
        .select(
            F.col("user_id").alias("v_user"),
            F.col("event_id").alias("view_id"),
            F.col("ts").alias("v_ts"),
        )
        .withWatermark("v_ts", "1 hour")
    )
    joined = clicks.join(
        views,
        (F.col("c_user") == F.col("v_user"))
        & (F.col("v_ts") >= F.col("c_ts"))
        & (F.col("v_ts") <= F.col("c_ts") + F.expr("INTERVAL 10 MINUTES")),
    ).select(F.col("c_user").alias("user_id"), "click_id", "view_id")
    return _run_to_table(joined, "_hmrs_stream_stream_join", "append")


@register(
    "stream_dedup_watermarked",
    tags=("streaming", "dedup"),
    description=(
        "State-BOUNDED streaming dedup: dropDuplicatesWithinWatermark on "
        "(user_id, event_type) — unlike plain dropDuplicates, whose state "
        "grows with the distinct-key count forever, expired keys leave "
        "the state store once they age past the watermark, which is what "
        "makes streaming dedup viable on an unbounded 100-TB stream. The "
        "delay here (40 days) covers the synthetic data's whole span, so "
        "the availableNow run reduces exactly to batch DISTINCT and the "
        "oracle can hash-check it; a production deployment sets the "
        "delay to its real dedup horizon."
    ),
    oracle="""
        SELECT DISTINCT user_id, event_type FROM events
    """,
)
def stream_dedup_watermarked(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _read_stream(spark, sf_dir, "events")
    deduped = (
        events.select("user_id", "event_type", "ts")
        .withWatermark("ts", "40 days")
        .dropDuplicatesWithinWatermark(["user_id", "event_type"])
        .select("user_id", "event_type")
    )
    return _run_to_table(deduped, "_hmrs_stream_dedup_wm", "append")


@register(
    "stream_sliding_counts",
    tags=("streaming", "time", "aggregation"),
    description=(
        "Sliding (hopping) windows: 10-minute windows every 5 minutes "
        "per event type — each event lands in exactly two overlapping "
        "windows. Window starts are returned as epoch seconds so the "
        "comparison is timezone-representation-free; the oracle derives "
        "the same two grid starts per event with floor arithmetic."
    ),
    oracle="""
        SELECT window_start, event_type,
               CAST(COUNT(*) AS BIGINT) AS n_events
        FROM (
            SELECT event_type,
                   UNNEST([
                       CAST(FLOOR(epoch(ts) / 300) * 300 AS BIGINT),
                       CAST(FLOOR(epoch(ts) / 300) * 300 - 300 AS BIGINT)
                   ]) AS window_start
            FROM events
        )
        GROUP BY 1, 2
    """,
)
def stream_sliding_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F.window(ts, 10 min, 5 min) assigns each event to its two
    covering grid windows inside the stateful aggregation; the batch
    oracle reproduces the assignment by exploding the two grid starts.
    Spark's window grid is epoch-aligned, matching FLOOR(epoch/slide).
    State honesty: this verify harness runs COMPLETE mode, which keeps
    every window for the life of the (availableNow, finite) query — the
    watermark is inert here. A production deployment emits in append/
    update mode, where the same watermark is what expires closed windows
    and bounds state to the open ones."""
    events = _read_stream(spark, sf_dir, "events")
    agg = (
        events.withWatermark("ts", "2 hours")
        .groupBy(
            F.window("ts", "10 minutes", "5 minutes").alias("_w"),
            "event_type",
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("_w.start").cast("long").alias("window_start"),
            "event_type",
            "n_events",
        )
    )
    return _run_to_table(agg, "_hmrs_stream_sliding_counts", "complete")


@register(
    "stream_ewma",
    tags=("streaming", "timeseries", "pandas"),
    description=(
        "Streaming twin of timeseries_ewma: the per-user EWMA recurrence "
        "continued ACROSS micro-batches via applyInPandasWithState "
        "(state = last y + rows seen), same 0.5*y + 0.5*x float "
        "expression as batch — emitted doubles are bit-identical to the "
        "recursive-CTE oracle. Per-key time order within the "
        "availableNow file harness; production buffers by watermark."
    ),
    oracle=_EWMA_ORACLE,
)
def stream_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hadoop_map_reduce_spark.streaming.stateful import streaming_ewma

    events = _read_stream(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "ts",
        F.round(F.col("value") * 100).cast("long").alias("value_c"),
    )
    return _run_to_table(streaming_ewma(events), "_hmrs_stream_ewma", "update")


@register(
    "stream_neardup_lsh",
    tags=("streaming", "dedup"),
    description=(
        "Streaming near-dup admission (the streaming twin of "
        "dedup_incremental): two arrival micro-batches (doc_id%4==0, "
        "then ==1) are MinHash-LSH deduped in foreachBatch against an "
        "append-only signature STORE seeded with the rest of the corpus "
        "(%4 in (2,3)); each batch's admitted signatures append to the "
        "store before the next batch, so batch 1 is deduped against "
        "batch 0's admissions. The oracle replays the same greedy "
        "two-increment admission in SQL over exact trigram-Jaccard "
        "pairs."
    ),
    oracle=f"""
        WITH near AS ({_JACCARD_PAIRS_SQL}),
        dup AS (
            SELECT id_b AS b, id_a AS q FROM near
            UNION ALL
            SELECT id_a AS b, id_b AS q FROM near
        ),
        a AS (
            SELECT d.doc_id FROM documents d
            WHERE d.doc_id % 4 = 0
              AND NOT EXISTS (
                SELECT 1 FROM dup
                WHERE dup.b = d.doc_id
                  AND (dup.q % 4 IN (2, 3)
                       OR (dup.q % 4 = 0 AND dup.q < d.doc_id)))
        ),
        bb AS (
            SELECT d.doc_id FROM documents d
            WHERE d.doc_id % 4 = 1
              AND NOT EXISTS (
                SELECT 1 FROM dup
                WHERE dup.b = d.doc_id
                  AND (dup.q % 4 IN (2, 3)
                       OR dup.q IN (SELECT doc_id FROM a)
                       OR (dup.q % 4 = 1 AND dup.q < d.doc_id)))
        )
        SELECT doc_id, CAST(0 AS BIGINT) AS batch FROM a
        UNION ALL
        SELECT doc_id, CAST(1 AS BIGINT) AS batch FROM bb
    """,
)
def stream_neardup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine side: seed store = sigs of %4 in (2,3) docs; arrivals
    written as two single-file parquet increments with ascending mtimes
    so maxFilesPerTrigger=1 + availableNow processes them in order; the
    foreachBatch body (streaming/neardup.py) does batch-vs-store +
    batch-self LSH blocking, appends admitted signatures AND the
    admitted (doc_id, batch) manifest as per-batch parquet increments
    (nothing stream-sized on the driver), and the result reads the
    manifest back. Per-batch cost is proportional to the batch, never
    the corpus — the append-only property that makes near-dup viable on
    an unbounded ingest stream.

    Engine/oracle recall assumption: the engine blocks on banded
    MinHash candidates while the oracle blocks on exact trigram-Jaccard
    pairs, so agreement relies on banding recall = 1.0 over this
    corpus's >=0.5-similarity pairs (a near-threshold pair is missed
    with prob (1-s^b)^r ≈ (1-0.5^2)^32 ≈ 1e-4); the recall is pinned at
    the verified scales by test_streaming_neardup.py's exact-pair
    blocking assertion, the dedup_minhash_lsh precedent.

    The per-invocation working set (arrivals, store, manifest,
    checkpoint) lives in a mkdtemp base. The returned manifest is
    eagerly localCheckpointed (it is manifest-sized, not corpus-sized)
    so the base is deleted BEFORE returning — a held result DataFrame
    never dangles on removed parquet. The checkpoint blocks themselves
    are one-slot: each invocation releases the previous one's (tracked
    via checkpoint.local_checkpoint), the last at interpreter exit; a
    module lock serializes concurrent invocations over that slot."""
    from hadoop_map_reduce_spark.streaming.neardup import NearDupAdmitter

    return _run_admission_harness(
        spark,
        sf_dir,
        "neardup",
        lambda store: NearDupAdmitter(store, threshold=0.5),
    )


def _run_admission_harness(
    spark: SparkSession,
    sf_dir: str,
    slot: str,
    make_admitter,
    table: str = "documents",
    id_col: str = "doc_id",
    select_cols: tuple[str, ...] = ("doc_id", "text"),
) -> DataFrame:
    """Shared harness for the streaming-admission queries: write the two
    arrival increments (doc_id%4==0 then ==1, ascending mtimes so
    maxFilesPerTrigger=1 + availableNow processes them in order), seed
    the store with the rest of the corpus (%4 in (2,3)), drive the
    foreachBatch stream, and return the eagerly-localCheckpointed
    admitted manifest (the mkdtemp working set is deleted BEFORE
    returning — a held result never dangles on removed parquet; the
    per-``slot`` release frees the previous invocation's checkpoint
    blocks)."""
    import shutil
    import tempfile
    import time

    from hadoop_map_reduce_spark.checkpoint import local_checkpoint
    from hadoop_map_reduce_spark.streaming.neardup import run_neardup_stream

    docs = load_table(spark, sf_dir, table).select(*select_cols)
    with _NEARDUP_LOCK:
        base = tempfile.mkdtemp(prefix=f"hmrs_stream_{slot}_")
        try:
            arrivals = os.path.join(base, "arrivals")
            os.makedirs(arrivals)

            def write_increment(df, name: str, mtime: float) -> None:
                tmp = os.path.join(base, "tmp_" + name)
                df.coalesce(1).write.mode("overwrite").parquet(tmp)
                part = next(
                    f for f in os.listdir(tmp) if f.endswith(".parquet")
                )
                dst = os.path.join(arrivals, name + ".parquet")
                shutil.move(os.path.join(tmp, part), dst)
                os.utime(dst, (mtime, mtime))

            now = time.time()
            write_increment(
                docs.filter(F.col(id_col) % 4 == 0), "b0", now - 120
            )
            write_increment(
                docs.filter(F.col(id_col) % 4 == 1), "b1", now - 60
            )

            admitter = make_admitter(os.path.join(base, "store"))
            admitter.seed(docs.filter((F.col(id_col) % 4).isin(2, 3)))
            manifest = run_neardup_stream(
                arrivals,
                os.path.join(base, "ckpt"),
                admitter,
                spark,
                docs.schema,
            )
            result, release = local_checkpoint(manifest)
            prev = _NEARDUP_PREV_RELEASE.get(slot)
            if prev is not None:
                prev()
            _NEARDUP_PREV_RELEASE[slot] = release
            return result
        finally:
            shutil.rmtree(base, ignore_errors=True)


@register(
    "stream_phash_neardup",
    tags=("streaming", "dedup", "multimodal"),
    description=(
        "Streaming MEDIA near-dup admission: the perceptual-hash twin "
        "of stream_neardup_lsh — arriving micro-batches are admitted "
        "iff no payload within Hamming 2 of their 63-bit pHash exists "
        "in the append-only (id, phash) store or earlier in their own "
        "batch; pigeonhole banding is lossless for the threshold, so "
        "engine and exact-pair oracle agree with NO recall assumption. "
        "The oracle replays the same greedy two-increment admission in "
        "SQL over exact Hamming pairs."
    ),
    oracle=f"""
        WITH {_PHASH_H_SQL},
        near AS (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b
            FROM h a
            JOIN h b ON a.doc_id < b.doc_id
            WHERE bit_count(xor(a.phash, b.phash)) <= 2
        ),
        dup AS (
            SELECT id_b AS b, id_a AS q FROM near
            UNION ALL
            SELECT id_a AS b, id_b AS q FROM near
        ),
        a AS (
            SELECT d.doc_id FROM documents d
            WHERE d.doc_id % 4 = 0
              AND NOT EXISTS (
                SELECT 1 FROM dup
                WHERE dup.b = d.doc_id
                  AND (dup.q % 4 IN (2, 3)
                       OR (dup.q % 4 = 0 AND dup.q < d.doc_id)))
        ),
        bb AS (
            SELECT d.doc_id FROM documents d
            WHERE d.doc_id % 4 = 1
              AND NOT EXISTS (
                SELECT 1 FROM dup
                WHERE dup.b = d.doc_id
                  AND (dup.q % 4 IN (2, 3)
                       OR dup.q IN (SELECT doc_id FROM a)
                       OR (dup.q % 4 = 1 AND dup.q < d.doc_id)))
        )
        SELECT doc_id, CAST(0 AS BIGINT) AS batch FROM a
        UNION ALL
        SELECT doc_id, CAST(1 AS BIGINT) AS batch FROM bb
    """,
)
def stream_phash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same harness, working-set lifecycle, and AS-OF-batch replay
    safety as stream_neardup_lsh (shared _run_admission_harness);
    only the similarity family differs — the store holds 16-byte
    (id, phash) rows instead of 64-hash MinHash signatures, blocking
    is the lossless band join + bit_count(xor) verify
    (streaming/neardup.PhashAdmitter). Greedy rule is non-recursive:
    a batch doc is blocked by ANY lower-id batch partner within the
    threshold, admitted or not, matching the oracle's NOT EXISTS."""
    from hadoop_map_reduce_spark.streaming.neardup import PhashAdmitter

    return _run_admission_harness(
        spark,
        sf_dir,
        "phash",
        lambda store: PhashAdmitter(store, max_hamming=2),
    )


@register(
    "stream_bigram_counts",
    tags=("streaming", "text"),
    description=(
        "The reference's FLAGSHIP pipeline as an unbounded stream: "
        "sanitize → tokenize → filter → bigram explode → stateful "
        "keyed count (streaming/ops.streaming_bigram_counts), run to "
        "completion over the document stream — the final state must "
        "equal the batch bigram_count oracle exactly (same WordCountV2 "
        "semantics, WordCountV2.java:76-111, now with unbounded-input "
        "and incremental-update behavior the reference never had)."
    ),
    oracle=f"""
        WITH toks AS (
            SELECT {_ORACLE_TOKENS} AS t FROM documents
        )
        SELECT t[i] || '+' || t[i + 1] AS bigram,
               COUNT(*) AS cnt
        FROM toks, UNNEST(range(1, len(t))) AS u(i)
        WHERE len(t) >= 2
        GROUP BY 1
    """,
)
def stream_bigram_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same one-shuffle plan as the batch flagship; the final
    HashAggregate becomes a stateful streaming aggregation keyed by
    bigram, state hash-partitioned across executors — the 100-TB story
    is the keyed-aggregation one, with state size bounded by the
    distinct-bigram count, not the stream length."""
    from hadoop_map_reduce_spark.streaming.ops import (
        streaming_bigram_counts,
    )

    docs = _read_stream(spark, sf_dir, "documents").select(
        F.col("text").alias("value")
    )
    agg = streaming_bigram_counts(docs)
    return _run_to_table(agg, "_hmrs_stream_bigram_counts", "complete")


@register(
    "stream_quality_funnel",
    tags=("streaming", "llm", "curation"),
    description=(
        "Streaming twin of curation_quality_funnel: the cumulative "
        "survival report through length -> token-count -> repetition -> "
        "language gates computed incrementally over a document stream "
        "(per-row gates are stateless; the only state is one aggregate "
        "row), run to completion with availableNow."
    ),
    oracle=FUNNEL_ORACLE,
)
def stream_quality_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SAME gate chain as the batch twin — both the aggregate and the
    oracle are imported from curation_queries (one definition, so a
    threshold tweak can never desynchronize the pair). Over
    `readStream` the per-row gates evaluate map-side in each
    micro-batch and the stream's ONLY state is the single aggregate
    row, so corpus size never accumulates anywhere. Complete mode +
    availableNow drains the file source and must equal the batch
    oracle exactly.
    """
    docs = _read_stream(spark, sf_dir, "documents")
    return _run_to_table(
        funnel_agg(docs), "_hmrs_stream_quality_funnel", "complete"
    )


# ---------------------------------------------------------------------------
# stream_crawl_extract (round-8, VERDICT r7 #6): streaming crawl ingestion
# ---------------------------------------------------------------------------


def _crawl_stream_oracle() -> str:
    from hadoop_map_reduce_spark.functions.html import html_to_text_sql
    from hadoop_map_reduce_spark.plans.companion_queries import (
        _html_wrap_sql,
    )

    extracted = html_to_text_sql(_html_wrap_sql())
    return f"""
        SELECT 'https://corpus.local/doc/' || CAST(doc_id AS VARCHAR)
                   AS target_uri,
               CAST(length({extracted}) AS BIGINT) AS n_chars,
               md5({extracted}) AS digest,
               length({extracted}) >= 64 AS passes_minlen
        FROM (SELECT doc_id, text, lang, source FROM documents
              ORDER BY doc_id LIMIT 40)
    """


@register(
    "stream_crawl_extract",
    tags=("streaming", "llm", "curation", "source"),
    description=(
        "Streaming twin of pipeline_crawl_extract: micro-batch file "
        "discovery over arriving .warc.gz archives (the warcrecords "
        "DataSourceStreamReader — offset = admitted-archive set, one "
        "partition per new archive), html_to_text extraction and a "
        "min-length quality gate evaluated map-side per micro-batch, "
        "drained with availableNow; the final census must equal the "
        "batch-derived oracle exactly."
    ),
    oracle=_crawl_stream_oracle(),
)
def stream_crawl_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl ingestion as it actually runs in production: archives
    arrive over time, each micro-batch parses ONLY the newly admitted
    archives (checkpointed offsets make replay skip committed ones —
    pinned by the incremental test in tests/test_round8_queries.py),
    and extraction + gates are stateless per-record work that scales
    with the micro-batch, never the corpus. The batch twin proves the
    WARC framing and regex chain; this proves the same pipeline is
    incremental without semantic drift — both engines' censuses are
    hash-pinned to one oracle."""
    import hashlib
    import shutil
    import tempfile

    from hadoop_map_reduce_spark.functions.html import html_to_text
    from hadoop_map_reduce_spark.plans.companion_queries import (
        _html_wrap_col,
    )
    from hadoop_map_reduce_spark.sources.warc import (
        register_warc_datasource,
    )

    register_warc_datasource(spark)
    out_dir = os.path.join(
        tempfile.gettempdir(),
        "hmrs_crawlstream_{}_{}".format(
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
    stream = spark.readStream.format("warcrecords").load(
        os.path.join(out_dir, "*.warc.gz")
    )
    extracted = html_to_text(F.col("content").cast("string"))
    census = stream.filter(F.col("warc_type") == "response").select(
        "target_uri",
        F.length(extracted).cast("long").alias("n_chars"),
        F.md5(extracted).alias("digest"),
        (F.length(extracted) >= 64).alias("passes_minlen"),
    )
    return _run_to_table(census, "_hmrs_stream_crawl_extract", "append")


# ---------------------------------------------------------------------------
# stream_ann_index_admission (round-10, VERDICT r9 #7): streaming
# embedding admission probing the persisted IVF-PQ index layout.
# ---------------------------------------------------------------------------

_ANN_ADMIT_E6 = (
    "[CAST(ROUND(CAST(x AS DOUBLE) * 1000000) AS BIGINT) "
    "for x in embedding]"
)
_ANN_ADMIT_COS = (
    "ROUND(list_dot_product(b.v, q.v) / (SQRT(list_dot_product(b.v, b.v))"
    " * SQRT(list_dot_product(q.v, q.v))), 6)"
)


@register(
    "stream_ann_index_admission",
    tags=("streaming", "dedup", "llm", "similarity"),
    description=(
        "Streaming EMBEDDING near-dup admission probing the persisted "
        "IVF-PQ index (the composition of the index store with the "
        "foreachBatch admission harness): two arrival micro-batches "
        "(vec_id%4==0 then ==1) probe their 6 nearest cells — exact "
        "integer e6 squared-L2 against 16 md5-sampled SEED centroids "
        "frozen in meta.json — and are admitted iff no store/earlier "
        "row in a probed cell has round-6 cosine >= 0.4. UNLIKE the "
        "MinHash twin, no recall assumption: the oracle replays the "
        "probe rule itself (same integer cells, same probe ranking, "
        "same round-6 cosine), so the admitted set is bit-exact."
    ),
    oracle=f"""
        WITH e AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
                   {_ANN_ADMIT_E6} AS e6
            FROM embeddings
        ), cent AS (
            SELECT e6 AS ce6,
                   CAST(ROW_NUMBER() OVER (
                       ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
                   ) - 1 AS INT) AS cell
            FROM e WHERE vec_id % 4 IN (2, 3)
            ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
            LIMIT 16
        ), d AS (
            SELECT e.vec_id, c.cell,
                   list_sum([(e.e6[i] - c.ce6[i]) * (e.e6[i] - c.ce6[i])
                             for i in generate_series(1, 64)]) AS d2
            FROM e, cent c
        ), ranked AS (
            SELECT vec_id, cell,
                   ROW_NUMBER() OVER (
                       PARTITION BY vec_id ORDER BY d2, cell
                   ) AS rn
            FROM d
        ), cells AS (
            SELECT vec_id, cell FROM ranked WHERE rn = 1
        ), probes AS (
            SELECT vec_id, cell FROM ranked WHERE rn <= 6
        ), dup AS (
            SELECT b.vec_id AS b, q.vec_id AS q
            FROM e b
            JOIN probes pb ON pb.vec_id = b.vec_id
            JOIN cells cq ON cq.cell = pb.cell
            JOIN e q ON q.vec_id = cq.vec_id AND q.vec_id != b.vec_id
            WHERE {_ANN_ADMIT_COS} >= 0.4
        ), a AS (
            SELECT d.vec_id FROM e d
            WHERE d.vec_id % 4 = 0
              AND NOT EXISTS (
                SELECT 1 FROM dup
                WHERE dup.b = d.vec_id
                  AND (dup.q % 4 IN (2, 3)
                       OR (dup.q % 4 = 0 AND dup.q < d.vec_id)))
        ), bb AS (
            SELECT d.vec_id FROM e d
            WHERE d.vec_id % 4 = 1
              AND NOT EXISTS (
                SELECT 1 FROM dup
                WHERE dup.b = d.vec_id
                  AND (dup.q % 4 IN (2, 3)
                       OR dup.q IN (SELECT vec_id FROM a)
                       OR (dup.q % 4 = 1 AND dup.q < d.vec_id)))
        )
        SELECT vec_id, CAST(0 AS BIGINT) AS batch FROM a
        UNION ALL
        SELECT vec_id, CAST(1 AS BIGINT) AS batch FROM bb
    """,
)
def stream_ann_index_admission(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine side: seed = vec_id%4 in (2,3) — its md5-smallest 16 e6
    vectors freeze the coarse centroids and its bounded sample trains
    the residual codebooks, both persisted via the ann_index meta
    protocol; each arriving batch is IVF-PQ-encoded against the FROZEN
    quantizers, probes its 6 nearest cells, exact-verifies candidates,
    and appends its admitted code rows as a store increment (AS-OF-batch
    replay safety and compaction inherited from IncrementalAdmitter).
    Per-batch cost ~ n_probe/n_cells of the store — the IVF cut — and
    the stored rows are the ~20-byte persisted-index layout plus the
    float needed for the exact verify."""
    from hadoop_map_reduce_spark.streaming.neardup import AnnIndexAdmitter

    return _run_admission_harness(
        spark,
        sf_dir,
        "ann_index",
        lambda store: AnnIndexAdmitter(
            store, threshold=0.4, n_cells=16, n_probe=6
        ),
        table="embeddings",
        id_col="vec_id",
        select_cols=("vec_id", "embedding"),
    )
