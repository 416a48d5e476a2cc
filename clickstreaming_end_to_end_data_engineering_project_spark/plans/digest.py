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
    fixed input stats and session confs).  ``Exchange`` counts shuffle
    exchanges only; broadcast exchanges count as ``BroadcastExchange``.
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
    # broadcast vs shuffle exchange split: formatted details give
    # "Arguments: SinglePartition/hashpartitioning..." for shuffles and
    # "Arguments: HashedRelationBroadcastMode..." for broadcasts
    n_bcast = len(re.findall(r"Arguments: .*BroadcastMode", plan))
    if counts.get("Exchange"):
        counts["BroadcastExchange"] = counts.get("BroadcastExchange", 0) + n_bcast
        counts["Exchange"] -= n_bcast
        if counts["Exchange"] == 0:
            del counts["Exchange"]
        if counts["BroadcastExchange"] == 0:
            del counts["BroadcastExchange"]
    return dict(sorted(counts.items()))
