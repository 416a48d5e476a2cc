"""Query registry: name → batch callable + DuckDB oracle SQL.

Every operator claimed in SURVEY.md §2 has a named query here; the
driver runs the Spark callable and the oracle side-by-side at sf0.01
(row count + schema + order-insensitive value hash).  Specs with
``oracle=None`` are hash-function-dependent (MinHash/SimHash/LSH) and
get the weaker rows-only check.

Column-name discipline: every computed column is aliased identically
in the DataFrame code and the SQL (the driver sorts columns by name
before hashing).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None = None
    doc: str = ""


# The driver records CORRECTNESS entries for only the FIRST 50 registry
# queries, so insertion order decides which get hard driver verification.
# These flagship queries (reference-parity clickstream core, TPC-H
# shapes, LLM-data dedup/similarity anchors) are pinned to the front of
# the gate; the remainder follows oracle-backed-first in module order
# funnel -> extras -> llmdata -> tpch -> clickstream (never-driver-
# verified modules first).  Every oracle-backed query additionally gets
# the identical rows+schema+value check locally in
# tests/test_correctness.py, so the >50 tail is still covered — just
# not driver-recorded.
GATE_PRIORITY = [
    # reference-parity clickstream core
    "page_view_counts",
    "user_sessions",
    "purchase_stats",
    "hourly_event_stats",
    "session_stats",
    "user_journey_transitions",
    "sql_event_summary",
    # general-SQL flagships
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q10_returned_items",
    "q14_promo_revenue",
    # funnel + LLM-data anchors
    "conversion_funnel",
    "exact_dup_docs",
    "doc_prefix_dups",
    "ngram_jaccard_dups",
    "doc_dup_clusters",
    "embedding_dup_clusters",
    "embedding_topk_cosine",
    "doc_token_stats",
    "doc_train_test_split",
    "lang_stratified_sample",
    "doc_chunks",
    "doc_split_contamination",
]


def all_specs() -> dict[str, QuerySpec]:
    """Registry in driver-gate order (see GATE_PRIORITY)."""
    from . import clickstream, extras, funnel, llmdata, tpch

    specs: dict[str, QuerySpec] = {}
    for mod in (funnel, extras, llmdata, tpch, clickstream):
        for spec in mod.SPECS:
            if spec.name in specs:
                raise ValueError(f"duplicate query name: {spec.name}")
            specs[spec.name] = spec
    missing = [n for n in GATE_PRIORITY if n not in specs]
    if missing:
        raise ValueError(f"GATE_PRIORITY names unknown queries: {missing}")
    prio = {n: i for i, n in enumerate(GATE_PRIORITY)}
    # stable sort: priority block first, then oracle-backed in module
    # order, rows-only sink to the end
    ordered = sorted(
        specs.values(), key=lambda s: (prio.get(s.name, len(prio)), s.oracle is None)
    )
    return {s.name: s for s in ordered}


def queries() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in all_specs().items()}


def oracle_sql() -> dict[str, str]:
    return {name: spec.oracle for name, spec in all_specs().items() if spec.oracle}
