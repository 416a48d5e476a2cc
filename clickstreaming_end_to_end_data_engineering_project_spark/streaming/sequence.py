"""Streaming sequence-pattern matching — the live half of
``operators/sequence.match_sequence``, completing the new family's
batch+streaming parity (the attribution-sink discipline).

State design: per entity, the matched step timestamps so far
(t_<step1> .. t_<stepk>, NULL tail) are sufficient statistics — the
greedy-earliest semantics fix each tⱼ permanently the first time a
qualifying event arrives (under per-entity event-time-ordered batch
delivery, an earlier qualifying event would have arrived in an
earlier batch), so a batch can only FILL NULL tail slots, never
revise filled ones.  Each micro-batch runs the step cascade gated on
coalesce(state tⱼ₋₁, batch-derived tⱼ₋₁): a batch may complete any
number of consecutive steps at once, including starting brand-new
entities.  The horizon gate re-derives from the (fixed) t_<step1> +
within, exactly the batch operator's whole-pattern bound.

Crash/replay safety: the state advances under the staged-swap
contract; replaying the most recent batch against an already-advanced
state is exact because a min-fixpoint is idempotent — re-offering the
same events can only re-derive the same minima.

Ordering contract (shared with LastTouchAttributionSink /
scd2_apply): batches arrive in nondecreasing event-time order per
entity; a stale event delivered after a later one was already folded
in could have claimed an earlier tⱼ, which the fixed state would
miss.  Route out-of-order replays to the batch operator."""

from __future__ import annotations

import os
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class SequenceMatchSink:
    """foreachBatch callable: micro-batch → per-entity step-timestamp
    state under ``store_dir/state/`` (staged swap).  Read the match
    table with ``matches_from_store`` — one row per entity that has
    matched step 1, NULL from the first unmatched step, exactly the
    batch operator's output contract."""

    def __init__(
        self,
        store_dir: str,
        entity_col: str,
        ts_col: str,
        steps: "Sequence[tuple[str, Column]]",
        within: "str | None" = None,
    ) -> None:
        if len(steps) < 1:
            raise ValueError("SequenceMatchSink: need at least one step")
        names = [n for n, _ in steps]
        if len(set(names)) != len(names):
            raise ValueError(f"SequenceMatchSink: duplicate step names: {names}")
        self.store_dir = store_dir
        self.entity_col = entity_col
        self.ts_col = ts_col
        self.steps = list(steps)
        self.within = within

    def __call__(self, batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        from ._state import read_state, write_state

        spark = batch.sparkSession
        state_dir = os.path.join(self.store_dir, "state")
        first = f"t_{self.steps[0][0]}"
        cols = [f"t_{n}" for n, _ in self.steps]
        ts_type = batch.schema[self.ts_col].dataType
        init = (
            batch.select(F.col(self.entity_col))
            .limit(0)
            .select(
                self.entity_col,
                *[F.lit(None).cast(ts_type).alias(c) for c in cols],
            )
        )
        # no hwm: the state is a pure min-fixpoint (coalesce keeps
        # filled slots), so replaying any batch against any later state
        # re-derives the identical state — idempotent by construction
        state, have_state, _ = read_state(spark, state_dir, init)
        # entities this batch touches, left-joined to their state rows
        # (new entities appear with an all-NULL state tail; untouched
        # entities stay OUT of cur and pass through via the anti-join
        # below — a full outer here would duplicate them)
        touched = batch.select(self.entity_col).distinct()
        cur = touched.join(state, self.entity_col, "left")
        prev: "str | None" = None
        for name, pred in self.steps:
            col = f"t_{name}"
            if prev is None:
                cand = (
                    batch.filter(pred)
                    .groupBy(self.entity_col)
                    .agg(F.min(self.ts_col).alias("_cand"))
                )
                cur = cur.join(cand, self.entity_col, "left").withColumn(
                    col, F.coalesce(F.col(col), F.col("_cand"))
                ).drop("_cand")
            else:
                # gate on the (possibly just-filled) previous step and
                # the fixed horizon from step 1; the min over
                # qualifying batch rows needs the per-entity gate, so
                # join the gate columns onto the batch rows first.
                # dict.fromkeys dedups prev == first at step 2 (the
                # batch operator's identical guard)
                gate_cols = cur.select(
                    *dict.fromkeys([self.entity_col, prev, first])
                )
                gated = batch.filter(pred).join(gate_cols, self.entity_col)
                cond = F.col(self.ts_col) > F.col(prev)
                if self.within is not None:
                    cond = cond & (
                        F.col(self.ts_col)
                        <= F.col(first) + F.expr(f"INTERVAL {self.within}")
                    )
                cand = (
                    gated.filter(cond)
                    .groupBy(self.entity_col)
                    .agg(F.min(self.ts_col).alias("_cand"))
                )
                cur = cur.join(cand, self.entity_col, "left").withColumn(
                    col, F.coalesce(F.col(col), F.col("_cand"))
                ).drop("_cand")
            prev = col
        new_state = cur.select(self.entity_col, *cols).filter(
            F.col(first).isNotNull()
        )
        # untouched entities pass through; touched rows were rebuilt
        merged = state.join(touched, self.entity_col, "left_anti").unionByName(
            new_state
        )
        write_state(spark, state_dir, merged, have_state)


def matches_from_store(spark, store_dir: str) -> DataFrame:
    """The per-entity match table streamed into the store — the batch
    operator's exact output contract."""
    return spark.read.parquet(os.path.join(store_dir, "state"))
