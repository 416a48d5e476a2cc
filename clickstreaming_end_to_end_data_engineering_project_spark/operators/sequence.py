"""Ordered sequence-pattern matching over event streams: the
funnel-with-timestamps verb (MATCH_RECOGNIZE's most-used subset) — per
entity, the greedy earliest completion of an ordered list of step
predicates, optionally inside a horizon measured from the first step.
Generalizes the reference's single hard-coded view→click→purchase
funnel (plans/funnel.conversion_funnel keeps the reference-parity
summary shape; this returns per-entity step timestamps for arbitrary
steps).

Semantics (the standard funnel contract): t₁ = the entity's earliest
step-1 event; tₖ = the earliest step-k event STRICTLY after tₖ₋₁ (and
within t₁ + horizon when given) — greedy earliest completion, which
for this nested-min structure also maximizes the number of completed
steps (taking any later qualifying event can only shrink the room for
later steps).  Same-instant events do not chain (ts is strictly
increasing across steps; ties inside one step resolve by min() being
instant-exact).

Scale shape: one filtered scan + key-partitioned min-aggregate per
step, joined back on the entity key — k small shuffles for a k-step
pattern, each predicate pushed to the scan; no window over the raw
stream and no per-entity event lists ever materialize.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def match_sequence(
    events: DataFrame,
    entity_col: str,
    ts_col: str,
    steps: "Sequence[tuple[str, Column]]",
    within: "str | None" = None,
) -> DataFrame:
    """One row per entity that matched step 1: (entity, t_<name> per
    step), NULL from the first unmatched step onward.  ``steps`` is an
    ordered list of (name, boolean-Column) stages; ``within`` is an
    interval literal ("2 hours") bounding EVERY later step relative to
    t₁ (the whole-pattern horizon — per-step gaps can be added by the
    caller as predicates over lag columns downstream)."""
    if len(steps) < 1:
        raise ValueError("match_sequence: need at least one step")
    names = [n for n, _ in steps]
    if len(set(names)) != len(names):
        raise ValueError(f"match_sequence: duplicate step names: {names}")
    first_name, first_pred = steps[0]
    result = (
        events.filter(first_pred)
        .groupBy(entity_col)
        .agg(F.min(ts_col).alias(f"t_{first_name}"))
    )
    horizon = (
        F.col(f"t_{first_name}") + F.expr(f"INTERVAL {within}")
        if within is not None
        else None
    )
    prev = f"t_{first_name}"
    for name, pred in steps[1:]:
        gate = F.col(ts_col) > F.col(prev)
        if horizon is not None:
            gate = gate & (F.col(ts_col) <= horizon)
        cols = [entity_col, prev] + ([f"t_{first_name}"] if prev != f"t_{first_name}" else [])
        nxt = (
            events.filter(pred)
            .join(result.select(*dict.fromkeys(cols)), entity_col)
            .filter(gate)
            .groupBy(entity_col)
            .agg(F.min(ts_col).alias(f"t_{name}"))
        )
        result = result.join(nxt, entity_col, "left")
        prev = f"t_{name}"
    return result
