"""Training-shard sink: size-bounded ``.txt.gz`` shards + manifest.

The last plumbing step of the corpus->trainer story (VERDICT r7 #2):
``pack_token_chunks`` / ``pack_length_buckets`` decide HOW the corpus
packs; this sink writes the artifact a trainer actually consumes —
token-budgeted shard files, a manifest with per-shard row/token/byte
counts and a content checksum, and a ``_SUCCESS`` marker (the same
committed-artifact discipline as the reference's ``bigram_custom8/
_SUCCESS`` + 32 parts, and as this repo's text/zip/WARC sinks).

Layout under ``out_dir``::

    shard-{source}-{shard_id:05d}.txt.gz   one gzip file per shard
    _manifest/                             parquet: one row per shard
    _SUCCESS                               commit marker (written last)

Shard contents: one ``doc_id<TAB>text<LF>`` line per document, sorted
by doc_id, gzip with mtime=0 — shard bytes are a pure function of the
corpus, so task retries and reruns are byte-identical (the WARC/zip
writers' determinism stance). ``content_md5`` in the manifest hashes
the UNCOMPRESSED shard text, which a SQL engine can replay with
``md5(string_agg(doc_id || chr(9) || text || chr(10), '' ORDER BY
doc_id))`` — the ``pack_write_shards`` oracle does exactly that.

Scale shape: shard assignment is the ``pack_token_chunks`` window (one
hash exchange keyed by source, frames never cross sources), then ONE
``applyInPandas`` group per (source, shard) writes its file on the
executor — no driver-side corpus materialization anywhere; the driver
only touches the manifest metadata and the ``_SUCCESS`` marker. Shard
groups are token-budget-bounded by construction, so no task ever
buffers more than ~``max_tokens_per_shard`` tokens of text.

Preconditions (shared with the text/zip/WARC sinks): one writer job
per target directory at a time, and a filesystem all executors can
reach (local-mode tests use /tmp; a cluster would mount shared/object
storage).
"""

from __future__ import annotations

import gzip
import hashlib
import os
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

MANIFEST_SCHEMA = StructType(
    [
        StructField("source", StringType(), nullable=False),
        StructField("shard_id", LongType(), nullable=False),
        StructField("file", StringType(), nullable=False),
        StructField("n_docs", LongType(), nullable=False),
        StructField("n_tokens", LongType(), nullable=False),
        StructField("n_bytes", LongType(), nullable=False),
        StructField("content_md5", StringType(), nullable=False),
    ]
)


def assign_shards(
    docs: DataFrame,
    max_tokens_per_shard: int,
    id_col: str = "doc_id",
    source_col: str = "source",
    tokens_col: str = "n_tokens",
) -> DataFrame:
    """Token-budgeted shard assignment: each doc lands in the shard
    where its per-source running token count STARTS — the
    ``pack_token_chunks`` formula, so a doc larger than the budget
    still gets exactly one shard and shard ids may skip (a shard never
    splits a document). Window is PARTITIONed BY source: packing
    within sources, never a global single-partition sort."""
    w = (
        Window.partitionBy(source_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = docs.withColumn("_cum_tokens", F.sum(tokens_col).over(w))
    shard = F.floor(
        (F.col("_cum_tokens") - F.col(tokens_col))
        / F.lit(float(max_tokens_per_shard))
    )
    return cum.withColumn("shard_id", shard.cast("long")).drop("_cum_tokens")


def write_training_shards(
    docs: DataFrame,
    out_dir: str,
    max_tokens_per_shard: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
    tokens_col: str = "n_tokens",
) -> DataFrame:
    """Write ``docs`` (id, text, source, token count) as training
    shards under ``out_dir``; returns the committed manifest.

    Raises ``ValueError`` from the writing task if any text contains
    TAB/CR/LF — the line framing would not round-trip (the WARC
    header guard's stance: refuse at write time, never emit a
    misframed artifact). Escape upstream if the corpus needs it.
    """
    # Invalidate-first (r8 review finding): shard names are
    # deterministic, so a rerun over a changed corpus overwrites
    # committed shard bytes IN PLACE. If the previous run's _SUCCESS
    # stayed live while that happened, a crash mid-run would leave a
    # _SUCCESS-marked directory whose manifest content_md5 entries no
    # longer match the files. Dropping the marker before the first
    # shard byte is written makes the directory visibly uncommitted
    # for the whole rewrite window; it is re-created only after the
    # new manifest is durable and the stale sweep completes.
    success_path = os.path.join(out_dir, "_SUCCESS")
    if os.path.exists(success_path):
        os.remove(success_path)

    assigned = assign_shards(
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.col(text_col).alias("text"),
            F.col(source_col).alias("source"),
            F.col(tokens_col).cast("long").alias("n_tokens"),
        ),
        max_tokens_per_shard,
    )

    def _write_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id")
        source = pdf["source"].iloc[0]
        shard_id = int(pdf["shard_id"].iloc[0])
        bad = pdf["text"].str.contains("[\t\r\n]", regex=True)
        if bad.any():
            raise ValueError(
                f"shard ({source}, {shard_id}): text of doc_id="
                f"{int(pdf.loc[bad, 'doc_id'].iloc[0])} contains "
                "TAB/CR/LF — the doc_id<TAB>text<LF> framing would "
                "not round-trip; escape or strip upstream"
            )
        content = "".join(
            f"{did}\t{txt}\n"
            for did, txt in zip(pdf["doc_id"], pdf["text"])
        ).encode("utf-8")
        fname = f"shard-{source}-{shard_id:05d}.txt.gz"
        os.makedirs(out_dir, exist_ok=True)
        # Deterministic name + deterministic bytes: a task retry or
        # speculative duplicate rewrites the identical file.
        with open(os.path.join(out_dir, fname), "wb") as fh:
            fh.write(gzip.compress(content, mtime=0))
        return pd.DataFrame(
            {
                "source": [source],
                "shard_id": [shard_id],
                "file": [fname],
                "n_docs": [len(pdf)],
                "n_tokens": [int(pdf["n_tokens"].sum())],
                "n_bytes": [len(content)],
                "content_md5": [hashlib.md5(content).hexdigest()],
            }
        )

    manifest = assigned.groupBy("source", "shard_id").applyInPandas(
        _write_group, schema=MANIFEST_SCHEMA
    )
    # Writing the manifest executes the shard tasks; _SUCCESS is
    # touched only after BOTH the shard files and the manifest are
    # durable (commit-last, the WARC writer's ordering).
    manifest.write.mode("overwrite").parquet(
        os.path.join(out_dir, "_manifest")
    )
    committed = docs.sparkSession.read.parquet(
        os.path.join(out_dir, "_manifest")
    )
    # Overwrite discipline (the WARC writer's rule, r8 review finding):
    # a previous run's shards not named in THIS manifest are stale —
    # without this sweep, a rerun over a smaller/renamed corpus would
    # commit a _SUCCESS over a directory whose glob returns phantom
    # docs from the earlier run. Deletion happens only after the new
    # manifest is durable, so a failed run never destroys the previous
    # committed artifact.
    keep = {r["file"] for r in committed.select("file").collect()}
    if os.path.isdir(out_dir):
        for name in os.listdir(out_dir):
            if (
                name.startswith("shard-")
                and name.endswith(".txt.gz")
                and name not in keep
            ):
                os.remove(os.path.join(out_dir, name))
    else:
        # The sweep is driver-side by design (module precondition:
        # driver and executors share the filesystem). If the driver
        # cannot list out_dir — e.g. executors wrote to an object
        # store the driver does not mount — the phantom-shard hazard
        # the sweep exists for silently returns, so refuse loudly
        # instead of committing an unswept directory.
        raise OSError(
            f"write_training_shards: {out_dir!r} is not listable from "
            "the driver, so the stale-shard sweep cannot run; this "
            "sink requires a filesystem shared between driver and "
            "executors (see module docstring preconditions)"
        )
    with open(success_path, "w"):
        pass
    return committed


def read_training_shards(spark, out_dir: str) -> DataFrame:
    """Read committed shards back as (source, shard_id, doc_id, text) —
    the roundtrip side of the sink, one input task per shard file via
    the binaryFile source (shard files are small by construction).

    Refuses an uncommitted directory (ADVICE r9 #1): the writer
    invalidates ``_SUCCESS`` before its first shard write and restores
    it last, so a missing marker means the directory is mid-rewrite or
    a failed write — globbing it would silently return a torn mix of
    old and new shard files."""
    if not os.path.exists(os.path.join(out_dir, "_SUCCESS")):
        raise FileNotFoundError(
            f"{out_dir}: no _SUCCESS marker — the shard directory is "
            "uncommitted (mid-rewrite or failed write); refusing to "
            "read a torn shard set"
        )
    files = (
        spark.read.format("binaryFile")
        .load(os.path.join(out_dir, "shard-*.txt.gz"))
        .select("path", "content")
    )

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "source": [],
                "shard_id": [],
                "doc_id": [],
                "text": [],
            }
            for path, blob in zip(pdf["path"], pdf["content"]):
                name = os.path.basename(path)
                stem = name[len("shard-") : -len(".txt.gz")]
                source, _, shard = stem.rpartition("-")
                for line in (
                    gzip.decompress(bytes(blob)).decode("utf-8").splitlines()
                ):
                    did, _, txt = line.partition("\t")
                    out["source"].append(source)
                    out["shard_id"].append(int(shard))
                    out["doc_id"].append(int(did))
                    out["text"].append(txt)
            yield pd.DataFrame(out)

    return files.mapInPandas(
        _parse,
        schema=(
            "source string, shard_id long, doc_id long, text string"
        ),
    )
