"""Ordering of the registry for the external verification driver.

The driver oracle-checks only the FIRST 50 entries of ``queries()`` (in
dict insertion order) each round. To maximize hard verification signal,
queries that have never received a driver verdict — or whose plan changed
since their last green row — must register ahead of queries that are
already green (those stay pinned by the local oracle-differential tests
in ``tests/``).

``DRIVER_VERIFIED`` is the audit trail: names with a conclusive driver
verdict from previous rounds (green hash-match, or rows-only for
oracle-less operators whose verdict cannot improve). Maintained by hand
from ``CORRECTNESS_r{N}.json`` each round; anything NOT in this set sorts
first. A query whose semantics/plan change in a later round must be
removed from this set so it re-enters the verification window.
"""

from __future__ import annotations

# Green (rows+schema+hash match) in CORRECTNESS_r01.json, minus the
# three whose registered plans changed in round 2 and therefore re-enter
# the window: embedding_neardup (block-grid equi-join replaced the
# quadratic self-join), dedup_ngram_jaccard (prefix filtering replaced
# the plain inverted index), dedup_minhash_lsh (Arrow-batched signature
# stage).
_GREEN_R1 = frozenset(
    {
        "bigram_count",
        "wordcount",
        "trigram_count",
        "doc_token_stats",
        "q1_pricing_summary",
        "q3_shipping_priority",
        "q5_local_supplier",
        "q6_forecast_revenue",
        "join_semi",
        "join_anti",
        "join_full_outer",
        "join_cross",
        "join_range_bucket",
        "agg_distinct",
        "agg_rollup",
        "agg_cube",
        "agg_grouping_sets",
        "having_brand_counts",
        "distinct_rows",
        "window_rank",
        "window_running_total",
        "topk_lineitems",
        "topk_offset",
        "set_union",
        "set_intersect",
        "set_except",
        "set_union_all_counts",
        "scalar_string_funcs",
        "scalar_date_funcs",
        "scalar_math_funcs",
        "scalar_case_when",
        "scalar_null_funcs",
        "unpivot_metrics",
        "dedup_exact",
        "similarity_topk",
        "text_lang_id",
        "text_quality",
        "text_fingerprint",
    }
)

# Rows-only by design (no SQL oracle); the driver's verdict for these is
# already as strong as it can get, so they don't consume window slots.
_ROWS_ONLY_DONE_R1 = frozenset({"dedup_simhash", "similarity_ann_lsh"})

DRIVER_VERIFIED: frozenset[str] = _GREEN_R1 | _ROWS_ONLY_DONE_R1


def verification_order(names: list[str]) -> list[str]:
    """Stable partition: never-verified / changed names first (registry
    order preserved within each group).

    When pending exceeds the driver's 50-slot window (round 2 ends with
    ~146 pending of 186 registered), the overflow — by construction the
    most recently registered entries — waits for a later round; local
    oracle tests and tools/verify_contract.py cover every entry in the
    meantime.
    """
    pending = [n for n in names if n not in DRIVER_VERIFIED]
    done = [n for n in names if n in DRIVER_VERIFIED]
    return pending + done
