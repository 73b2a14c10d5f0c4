"""Python DataSource API ZIP source/sink (`sources/zip_datasource.py`).

Parity target: the reference's custom InputFormat/RecordReader surface
(NYUZInputFormat.java:22-81) — here as a registered `spark.read.format`
source. Rows must match the RDD-path `read_zip_entries` exactly; the
writer must round-trip; pushed `archive`/`entry` filters must prune at
the planner/central-directory level (asserted on the reader object
directly, since pruning is invisible in the result set by design).
"""

from __future__ import annotations

import zipfile
from pathlib import Path

import pytest

from hadoop_map_reduce_spark.sources import read_zip_entries
from hadoop_map_reduce_spark.sources.zip_datasource import (
    ZipEntryReader,
    register_zip_datasource,
)
from pyspark.sql.datasource import EqualTo, In


@pytest.fixture(scope="module")
def archives(tmp_path_factory) -> Path:
    root = tmp_path_factory.mktemp("zips")
    for i in range(3):
        with zipfile.ZipFile(root / f"arch{i}.zip", "w") as zf:
            zf.writestr(f"a{i}.txt", f"alpha {i}\nbeta {i}")
            zf.writestr(f"b{i}.txt", f"gamma {i}")
            zf.writestr("dir/", "")  # directory entry: must be skipped
    return root


@pytest.fixture(scope="module")
def registered(spark):
    register_zip_datasource(spark)
    return spark


def test_matches_rdd_path(registered, archives):
    glob = str(archives / "*.zip")
    via_ds = registered.read.format("zipentries").load(glob)
    via_rdd = read_zip_entries(registered, glob)
    assert via_ds.schema == via_rdd.schema
    rows_ds = sorted(
        (r.archive, r.entry, r.size, bytes(r.content))
        for r in via_ds.collect()
    )
    # binaryFiles reports Hadoop URIs (file:/...); the datasource reports
    # plain local paths — normalize before comparing.
    rows_rdd = sorted(
        (r.archive.removeprefix("file:"), r.entry, r.size, bytes(r.content))
        for r in via_rdd.collect()
    )
    assert rows_ds == rows_rdd
    assert len(rows_ds) == 6  # 2 file entries × 3 archives, no dirs


def test_one_partition_per_archive(registered, archives):
    df = registered.read.format("zipentries").load(str(archives / "*.zip"))
    assert df.rdd.getNumPartitions() == 3


def test_filter_pushdown_result_and_pruning(registered, archives):
    glob = str(archives / "*.zip")
    target = str(archives / "arch1.zip")
    got = (
        registered.read.format("zipentries")
        .load(glob)
        .filter("archive = '%s' and entry = 'a1.txt'" % target)
        .collect()
    )
    assert [(r.archive, r.entry) for r in got] == [(target, "a1.txt")]

    # Pruning itself, on the reader object (what partitions()/read() see).
    reader = ZipEntryReader({"path": glob})
    f_arch = EqualTo(("archive",), target)
    f_entry = In(("entry",), ("a1.txt", "zzz.txt"))
    f_other = EqualTo(("size",), 7)
    remaining = list(reader.pushFilters([f_arch, f_entry, f_other]))
    assert remaining == [f_other]  # size: not prunable here, Spark's job
    parts = reader.partitions()
    assert [p.path for p in parts] == [target]
    rows = list(reader.read(parts[0]))
    assert [(r[1]) for r in rows] == ["a1.txt"]


def test_corrupt_archive_modes(registered, archives, tmp_path):
    bad_dir = tmp_path / "mixed"
    bad_dir.mkdir()
    (bad_dir / "bad.zip").write_bytes(b"this is not a zip")
    with zipfile.ZipFile(bad_dir / "ok.zip", "w") as zf:
        zf.writestr("x.txt", "payload")
    glob = str(bad_dir / "*.zip")
    with pytest.raises(Exception, match="corrupt ZIP archive"):
        registered.read.format("zipentries").load(glob).collect()
    ok = (
        registered.read.format("zipentries")
        .option("skipCorrupt", True)
        .load(glob)
        .collect()
    )
    assert [(r.entry, bytes(r.content)) for r in ok] == [("x.txt", b"payload")]


def test_writer_roundtrip(registered, archives, tmp_path):
    out = str(tmp_path / "packed")
    src = registered.read.format("zipentries").load(str(archives / "*.zip"))
    src.select("entry", "content").coalesce(1).write.format(
        "zipentries"
    ).mode("overwrite").save(out)
    assert (Path(out) / "_SUCCESS").exists()
    back = registered.read.format("zipentries").load(out + "/part-*.zip")
    orig = sorted((r.entry, bytes(r.content)) for r in src.collect())
    rt = sorted((r.entry, bytes(r.content)) for r in back.collect())
    assert rt == orig
