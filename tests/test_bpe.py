"""BPE training: pure-Python recomputation oracle (the merge table is a
deterministic function of the corpus), greedy-merge semantics pins, and
segmentation round-trip."""

from __future__ import annotations

import re
from collections import Counter

from hadoop_map_reduce_spark.operators.bpe import (
    END_OF_WORD,
    bpe_segment,
    bpe_train,
    bpe_train_driver,
)
from hadoop_map_reduce_spark.plans import REGISTRY
from hadoop_map_reduce_spark.session import load_table


def _py_tokens(text: str) -> list[str]:
    return re.sub(r"([^\s\w]|_)+", " ", text, flags=re.ASCII).lower().split()


def _py_bpe(word_counts: dict[str, int], n_merges: int, min_pair_count=2):
    """Reference BPE (Sennrich et al. 2016): pair stats over the word
    table, greedy leftmost merge, ties to the smallest pair."""
    vocab = {
        tuple(list(w) + [END_OF_WORD]): c for w, c in word_counts.items()
    }
    merges = []
    for rank in range(n_merges):
        stats: Counter = Counter()
        for syms, c in vocab.items():
            for a, b in zip(syms, syms[1:]):
                stats[(a, b)] += c
        if not stats:
            break
        best = min(stats.items(), key=lambda kv: (-kv[1], kv[0]))
        (lhs, rhs), n = best
        if n < min_pair_count:
            break
        merges.append((rank, lhs, rhs, n))
        new_vocab = {}
        for syms, c in vocab.items():
            out = []
            for x in syms:
                if out and out[-1] == lhs and x == rhs:
                    out[-1] = lhs + rhs
                else:
                    out.append(x)
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
        vocab = new_vocab
    return merges


def test_merge_table_matches_pure_python(spark, sf_dir):
    got = [
        (r.rank, r.lhs, r.rhs, r.pair_count)
        for r in REGISTRY["bpe_train_merges"].fn(spark, sf_dir).collect()
    ]
    docs = load_table(spark, sf_dir, "documents")
    counts: Counter = Counter()
    for row in docs.select("text").collect():
        counts.update(_py_tokens(row["text"]))
    want = _py_bpe(dict(counts), n_merges=24)
    assert got == want
    assert len(got) == 24  # corpus is rich enough to reach the cap


def test_driver_trainer_bit_parity_with_distributed(spark, sf_dir):
    """bpe_train_driver replays bpe_train's exact arithmetic on the
    collected word table — same merges, same pair counts, same ties —
    with zero Spark jobs per merge (the 50k-merge scale path; see the
    cost model in its docstring and BASELINE.md's trainer-choice rule)."""
    import pytest

    docs = load_table(spark, sf_dir, "documents")
    assert bpe_train_driver(docs, n_merges=12) == bpe_train(
        docs, n_merges=12
    )
    # The ceiling refuses loudly instead of collecting an unbounded table.
    with pytest.raises(ValueError, match="distinct-word"):
        bpe_train_driver(docs, n_merges=2, max_distinct_words=10)


def test_greedy_merge_is_leftmost_nonoverlapping(spark):
    """'aaa' under merge (a,a) must become (aa, a), not (a, aa)."""
    import pyspark.sql.functions as F

    df = spark.createDataFrame([(["a", "a", "a"],)], ["toks"])
    # one word "aaa": segment with the single merge (a, a)
    out = df.select(
        bpe_segment(
            F.array(F.concat_ws("", "toks")), [(0, "a", "a", 99)]
        ).alias("s")
    ).collect()
    assert out[0]["s"] == ["aa", "a", END_OF_WORD]


def test_segment_reconstructs_words(spark, sf_dir):
    """Concatenating a token's BPE symbols (minus the end marker) must
    reproduce the token, for every document."""
    import pyspark.sql.functions as F

    from hadoop_map_reduce_spark.functions.text import sanitize, tokenize

    docs = load_table(spark, sf_dir, "documents").limit(50)
    merges = bpe_train(docs, n_merges=8)
    toks = docs.select(tokenize(sanitize(F.col("text"))).alias("t"))
    check = toks.select(
        F.concat_ws("", F.col("t")).alias("joined"),
        F.concat_ws("", bpe_segment(F.col("t"), merges)).alias("seg"),
    ).collect()
    for r in check:
        assert r["seg"].replace(END_OF_WORD, "") == r["joined"]


def test_segment_counts_match_pure_python(spark, sf_dir):
    """bpe_segment_counts (train 24 merges -> segment corpus -> top-30
    symbol counts) recomputed bit-for-bit in pure Python: same merge
    table, same leftmost-nonoverlapping single-pass merge application,
    same (count DESC, symbol ASC) top-30."""
    got = [
        (r.symbol, r.n)
        for r in REGISTRY["bpe_segment_counts"].fn(spark, sf_dir).collect()
    ]

    docs = load_table(spark, sf_dir, "documents")
    counts = Counter()
    texts = [r.text for r in docs.select("text").collect()]
    for text in texts:
        counts.update(_py_tokens(text))
    merges = _py_bpe(dict(counts), n_merges=24)

    sym_counts: Counter = Counter()
    seg_cache: dict[str, list[str]] = {}
    for text in texts:
        toks = _py_tokens(text)
        if not toks:
            continue
        for tok in toks:
            syms = seg_cache.get(tok)
            if syms is None:
                syms = list(tok) + [END_OF_WORD]
                for _rank, lhs, rhs, _n in merges:
                    out: list[str] = []
                    for x in syms:
                        if out and out[-1] == lhs and x == rhs:
                            out[-1] = lhs + rhs
                        else:
                            out.append(x)
                    syms = out
                seg_cache[tok] = syms
            sym_counts.update(syms)
    want = sorted(sym_counts.items(), key=lambda kv: (-kv[1], kv[0]))[:30]
    assert got == want


def test_byte_symbols_unicode_and_roundtrip(spark):
    """BBPE base alphabet is UTF-8 bytes: 'ñ' is TWO symbols (c3, b1),
    and unhex-decoding the concatenated symbols reproduces the token
    for any unicode input."""
    import pyspark.sql.functions as F

    from hadoop_map_reduce_spark.operators.bpe import byte_symbols

    df = spark.createDataFrame(
        [("niño",), ("héllo",), ("plain",), ("日本",)], ["tok"]
    )
    rows = df.select(
        byte_symbols(F.col("tok")).alias("syms"),
        F.decode(
            F.unhex(F.concat_ws("", byte_symbols(F.col("tok")))), "UTF-8"
        ).alias("back"),
        "tok",
    ).collect()
    by_tok = {r["tok"]: r for r in rows}
    assert by_tok["niño"]["syms"] == ["6e", "69", "c3", "b1", "6f"]
    assert by_tok["日本"]["syms"] == ["e6", "97", "a5", "e6", "9c", "ac"]
    for r in rows:
        assert r["back"] == r["tok"]


def test_bbpe_segment_merges_multibyte_chars(spark):
    """A learned (c3, b1) merge reassembles 'ñ' from its two bytes; the
    segment output round-trips through unhex."""
    import pyspark.sql.functions as F

    from hadoop_map_reduce_spark.operators.bpe import (
        END_OF_WORD,
        bbpe_segment,
    )

    df = spark.createDataFrame([(["niño"],)], ["toks"])
    out = df.select(
        bbpe_segment(F.col("toks"), [(0, "c3", "b1", 99)]).alias("s")
    ).collect()
    assert out[0]["s"] == ["6e", "69", "c3b1", "6f", END_OF_WORD]


def test_bbpe_ascii_corpus_matches_char_bpe_hex_encoded(spark, sf_dir):
    """On the pure-ASCII corpus every char is one byte, so BBPE must
    learn the char-level merge table hex-encoded 1:1 (same ranks, same
    counts) — the cheap structural proof that the byte layer changes
    the alphabet and nothing else. (Tie-breaks compare hex strings,
    which on the tokenizer's [0-9_a-z] alphabet preserves char order.)"""
    from hadoop_map_reduce_spark.operators.bpe import (
        END_OF_WORD,
        bbpe_train_driver,
        bpe_train_driver,
    )

    docs = load_table(spark, sf_dir, "documents")
    char_merges = bpe_train_driver(docs, n_merges=12)
    byte_merges = bbpe_train_driver(docs, n_merges=12)

    def hexify(sym: str) -> str:
        return sym if sym == END_OF_WORD else sym.encode("utf-8").hex()

    assert byte_merges == [
        (r, hexify(l), hexify(h), n) for r, l, h, n in char_merges
    ]


def test_bbpe_unicode_words_learns_multibyte_merges(spark):
    """With unicode_words=True the trainer sees non-ASCII words (the
    default engine tokenizer deletes them — round-6 review finding), so
    multi-byte characters earn byte merges: 'ñ' appears in every word
    here, so (c3, b1) must be merged."""
    from hadoop_map_reduce_spark.operators.bpe import bbpe_train_driver

    docs = spark.createDataFrame(
        [("niño año señal",), ("baño niño piña",)], ["text"]
    )
    merges = bbpe_train_driver(docs, n_merges=3, unicode_words=True)
    assert ("c3", "b1") in {(l, r) for _, l, r, _ in merges}
    # The ASCII-sanitizing default path structurally cannot learn it.
    merges_ascii = bbpe_train_driver(docs, n_merges=3)
    assert ("c3", "b1") not in {(l, r) for _, l, r, _ in merges_ascii}


def test_bbpe_unicode_words_splits_unicode_whitespace(spark):
    """U+3000 (ideographic space) and U+00A0 (NBSP) are word breaks
    under unicode_words=True — plain Java \\s is ASCII-only and would
    agglutinate (round-6 second-review finding)."""
    from hadoop_map_reduce_spark.operators.bpe import bbpe_train_driver

    docs = spark.createDataFrame(
        [("ab　ab ab ab",)], ["text"]
    )
    merges = bbpe_train_driver(docs, n_merges=1, unicode_words=True)
    # four 'ab' words -> pair (61, 62) appears 4 times
    assert merges == [(0, "61", "62", 4)]
