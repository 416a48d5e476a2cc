"""Physical-plan shape digests — a regression guard for execution tiers.

Round 8 proved that environment changes alone (a JDK patch bump) can
silently change HOW a query executes (expression HOFs fell out of the
JIT'd evaluator path) long before correctness notices.  Plan-shape
drift is the Spark-level analogue: a broadcast join silently flipping
to sort-merge, an extra Exchange appearing, a TakeOrdered degrading to
global Sort+Limit.  ``plan_digest`` compresses a DataFrame's physical
plan into the counts of the operators that matter for scale, so a test
can pin the expected shape per query and fail loudly on unexplained
drift (tests/test_plan_digests.py; update procedure in its docstring).

Only SHAPE-significant operators are counted.  Scan/Filter/Project and
codegen wrappers are excluded: they vary with column pruning details
and whole-stage fusion boundaries without changing the distributed
cost model, which is exactly the noise a useful guard must ignore.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

# operator families that decide distributed cost: join strategies,
# shuffles, aggregate tiers, top-k vs global sort, windows, explodes
SIGNIFICANT = (
    "BroadcastHashJoin",
    "SortMergeJoin",
    "ShuffledHashJoin",
    "BroadcastNestedLoopJoin",
    "CartesianProduct",
    "Exchange",
    "BroadcastExchange",
    "HashAggregate",
    "ObjectHashAggregate",
    "SortAggregate",
    "TakeOrderedAndProject",
    "Window",
    "WindowGroupLimit",
    "Expand",
    "Generate",
    "Union",
)

# formatted explain details section: "(12) BroadcastHashJoin [codegen id : 4]"
_NODE = re.compile(r"^\(\d+\)\s+([A-Za-z]+)", re.MULTILINE)


def plan_digest(df: DataFrame) -> dict[str, int]:
    """Counts of shape-significant physical operators in ``df``'s plan
    (the AQE initial plan for an unexecuted frame — deterministic for
    fixed input stats and session confs).  Formatted mode already
    names the two exchange kinds distinctly (``Exchange`` = shuffle,
    ``BroadcastExchange`` = broadcast), so node names are counted
    as-is — an r9 review caught an earlier version double-counting
    broadcasts via an Arguments-regex 'correction' that produced
    negative shuffle counts and digest collisions.
    """
    plan = df._sc._jvm.PythonSQLUtils.explainString(  # same source explain() prints
        df._jdf.queryExecution(), "formatted"
    )
    counts: dict[str, int] = {}
    for m in _NODE.finditer(plan):
        name = m.group(1)
        if name in SIGNIFICANT:
            counts[name] = counts.get(name, 0) + 1
    # queries that return an eagerly-materialized (localCheckpoint)
    # frame have an opaque plan — record the mechanism instead of a
    # meaningless empty digest, so a change of mechanism still trips
    counts["ExistingRDDScan"] = len(re.findall(r"Scan ExistingRDD", plan)) // 2 or 0
    if not counts["ExistingRDDScan"]:
        del counts["ExistingRDDScan"]
    return dict(sorted(counts.items()))


def pinned_query_names() -> "list[str]":
    """The queries whose plan shapes are pinned: every benched leg
    (registry.BENCH_HEADLINE + BENCH_EXTENDED — bench.py consumes the
    same lists) plus every driver-gated query (registry.GATE_PRIORITY),
    first-occurrence order.  The ONE copy of this set —
    scripts/plan_digests.py (regeneration) and
    tests/test_plan_digests.py (enforcement) both import it, so they
    cannot silently desync."""
    from .registry import BENCH_EXTENDED, BENCH_HEADLINE, GATE_PRIORITY

    seen: list[str] = []
    for name in list(BENCH_HEADLINE) + list(BENCH_EXTENDED) + list(GATE_PRIORITY):
        if name not in seen:
            seen.append(name)
    return seen
