"""Hash functions for parity with the reference's shuffle layout.

The reference partitions reduce output with Hadoop's default
``HashPartitioner`` over ``Text.hashCode()`` — a byte-wise polynomial hash
(``h = 31*h + signed_byte``, seed 1) over the UTF-8 encoding, then
``(h & Integer.MAX_VALUE) % numPartitions`` (verified empirically on the
committed ``bigram_custom8/part-r-*`` artifacts; see SURVEY.md §2 O9).

Spark's own shuffle uses murmur3 — equally balanced but a different
assignment; these helpers exist solely to reproduce the reference's exact
file-level layout when a byte-identical sink is requested.
"""

from __future__ import annotations


def hadoop_text_hash(key: str) -> int:
    """Hadoop ``Text.hashCode()``: 31-polynomial over signed UTF-8 bytes."""
    h = 1
    for b in key.encode("utf-8"):
        if b > 127:
            b -= 256
        h = (31 * h + b) & 0xFFFFFFFF
    if h >= 1 << 31:
        h -= 1 << 32
    return h


def hadoop_partition(key: str, num_partitions: int) -> int:
    """Hadoop ``HashPartitioner.getPartition`` for Text keys."""
    return (hadoop_text_hash(key) & 0x7FFFFFFF) % num_partitions
