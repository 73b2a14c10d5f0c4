"""ZIP archives as a registered Spark data source (Python DataSource API).

This is the Spark-native equivalent of the reference's source-plugin
surface — a custom ``InputFormat`` + ``RecordReader`` pair
(NYUZInputFormat.java:22-81, NYUZRecordReader.java:23-101) — expressed
through the public PySpark 4 ``pyspark.sql.datasource`` API instead of an
RDD composition (:mod:`.zip_source` keeps the RDD path as the
no-registration alternative; both produce the same rows):

    spark.dataSource.register(ZipDataSource)
    df = spark.read.format("zipentries").load("/data/archives/*.zip")

Capability mapping to the reference:

- ``InputFormat.getSplits``  → :meth:`ZipEntryReader.partitions` — one
  input partition per archive, planned from file *metadata only* (the
  reference decompressed every entry on the client just to size splits;
  see SURVEY.md §2.1).
- ``RecordReader.nextKeyValue`` → :meth:`ZipEntryReader.read` — runs on
  the executor, streams one archive's entries.
- Beyond the reference: filter pushdown (``pushFilters``) prunes whole
  archives for ``archive =/IN`` predicates before any I/O, and skips
  decompression of non-matching entries for ``entry =/IN`` predicates
  (the ZIP central directory lists entry names without inflating data);
  plus a writer (``.write.format("zipentries")``) the reference never had.

At scale: one partition per archive is the natural granularity (a ZIP
entry is not splittable — the deflate stream has no sync points); for a
corpus of few huge archives, ``.repartition()`` after the scan spreads
entries, like the RDD path. Planning cost is one driver-side glob,
O(#archives) metadata, zero data bytes.
"""

from __future__ import annotations

import glob
import io
import os
import uuid
import zipfile
from collections.abc import Iterable, Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    EqualTo,
    Filter,
    In,
    InputPartition,
    WriterCommitMessage,
)
from pyspark.sql.types import Row, StructType

from hadoop_map_reduce_spark.sources.zip_source import ZIP_ENTRY_SCHEMA


class ZipArchivePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


def _accepted_values(
    filters: list[Filter], column: str
) -> tuple[set | None, list[Filter]]:
    """Fold EqualTo/In filters on ``column`` into an accept-set.

    Returns ``(accept_set, consumed)``; ``accept_set`` is None when no
    filter constrains the column (accept everything). AND semantics:
    multiple filters intersect.
    """
    accept: set | None = None
    consumed: list[Filter] = []
    for f in filters:
        if isinstance(f, EqualTo) and f.attribute == (column,):
            vals = {f.value}
        elif isinstance(f, In) and f.attribute == (column,):
            vals = set(f.value)
        else:
            continue
        accept = vals if accept is None else accept & vals
        consumed.append(f)
    return accept, consumed


class ZipEntryReader(DataSourceReader):
    def __init__(self, options: dict):
        path = options.get("path")
        if not path:
            raise ValueError("zipentries source requires a path, e.g. "
                             ".load('/data/archives/*.zip')")
        self.pattern = path
        self.skip_corrupt = str(
            options.get("skipcorrupt", "false")
        ).lower() in ("true", "1")
        self.archive_accept: set | None = None
        self.entry_accept: set | None = None

    def pushFilters(self, filters: list[Filter]) -> Iterable[Filter]:
        self.archive_accept, used_a = _accepted_values(filters, "archive")
        self.entry_accept, used_e = _accepted_values(filters, "entry")
        consumed = set(map(id, used_a + used_e))
        # Consumed filters are fully handled here (exact pruning, not
        # best-effort), so Spark need not re-evaluate them.
        return [f for f in filters if id(f) not in consumed]

    def partitions(self) -> Sequence[InputPartition]:
        paths = sorted(glob.glob(self.pattern))
        if not paths and not glob.has_magic(self.pattern):
            raise FileNotFoundError(self.pattern)
        if self.archive_accept is not None:
            paths = [p for p in paths if p in self.archive_accept]
        return [ZipArchivePartition(p) for p in paths]

    def read(self, partition: ZipArchivePartition) -> Iterator[tuple]:
        try:
            zf = zipfile.ZipFile(partition.path)
        except zipfile.BadZipFile:
            if self.skip_corrupt:
                return
            raise zipfile.BadZipFile(
                f"corrupt ZIP archive: {partition.path} "
                "(set .option('skipCorrupt', True) to drop bad archives)"
            ) from None
        with zf:
            for info in zf.infolist():
                if info.is_dir():
                    continue
                if (
                    self.entry_accept is not None
                    and info.filename not in self.entry_accept
                ):
                    continue  # name known from central directory: no inflate
                data = zf.read(info.filename)
                yield (partition.path, info.filename, len(data), data)


class ZipCommit(WriterCommitMessage):
    def __init__(self, path: str, entries: int):
        self.path = path
        self.entries = entries


class ZipEntryWriter(DataSourceWriter):
    """One ZIP archive per non-empty partition + `_SUCCESS` on commit —
    the sink-side contract mirrors the text sink's (SURVEY.md §2 O13)."""

    def __init__(self, options: dict, overwrite: bool):
        self.dir = options.get("path")
        if not self.dir:
            raise ValueError("zipentries writer requires a target directory")
        self.overwrite = overwrite

    def write(self, iterator: Iterator[Row]) -> ZipCommit:
        part = os.path.join(self.dir, f"part-{uuid.uuid4().hex}.zip")
        buf = io.BytesIO()
        n = 0
        with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
            for row in iterator:
                zf.writestr(row.entry, bytes(row.content))
                n += 1
        if n == 0:
            return ZipCommit("", 0)
        os.makedirs(self.dir, exist_ok=True)
        with open(part, "wb") as fh:
            fh.write(buf.getvalue())
        return ZipCommit(part, n)

    def commit(self, messages: list[ZipCommit | None]) -> None:
        with open(os.path.join(self.dir, "_SUCCESS"), "w"):
            pass

    def abort(self, messages: list[ZipCommit | None]) -> None:
        for m in messages:
            if m is not None and m.path and os.path.exists(m.path):
                os.remove(m.path)


def register_zip_datasource(spark) -> None:
    """Register the source AND enable Python-source filter pushdown.

    ``pushFilters`` on a Python data source is gated behind
    ``spark.sql.python.filterPushdown.enabled`` (default false in Spark
    4.1); reads fail fast if a reader implements it while the conf is
    off, so registration flips the runtime-settable conf first.
    """
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(ZipDataSource)


class ZipDataSource(DataSource):
    """``spark.read.format("zipentries")`` / ``df.write.format("zipentries")``.

    Rows: ``(archive string, entry string, size long, content binary)`` —
    the same contract as :func:`..zip_source.read_zip_entries`. The writer
    consumes ``(entry, content)`` and packs one archive per partition.
    """

    @classmethod
    def name(cls) -> str:
        return "zipentries"

    def schema(self) -> StructType:
        return ZIP_ENTRY_SCHEMA

    def reader(self, schema: StructType) -> ZipEntryReader:
        return ZipEntryReader(self.options)

    def writer(self, schema: StructType, overwrite: bool) -> ZipEntryWriter:
        return ZipEntryWriter(self.options, overwrite)
