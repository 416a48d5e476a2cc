"""Streaming last-touch attribution — the live half of
``operators/attribution.last_touch_attribution``, extending the
batch+streaming parity the summary families (heavy hitters, sketches,
near-dedup, ANN segments) already have to the attribution family.

State design: per entity, the single LATEST qualifying touch row is
sufficient statistics for last-touch credit — every earlier touch is
unreachable by any future conversion.  Each micro-batch therefore:

1. seeds the batch with the stored per-entity last-touch rows (full
   batch schema, ``_is_seed`` marked) and runs the BATCH operator over
   the miniature seed ∪ batch log — ONE implementation, the
   ``scd2_apply`` discipline, so streaming-vs-batch bit-equality can
   never drift between two copies;
2. appends the batch's attributed conversions under
   ``store_dir/out/batch=<id>/`` (mode=overwrite — a replayed batch
   rewrites its own directory, the sink-family discipline);
3. advances the state to the per-entity latest touch of seed ∪ batch
   under the staged-swap crash contract (``fsutil.swap_with_staging``).

Crash/replay safety without a high-water mark: replaying the most
recent batch against an ALREADY-ADVANCED state is exact — the advanced
state differs from the old one only by touch rows that are ALSO in the
replayed batch, and duplicate (ts, tiebreak)-identical touch rows
cannot change a last-value window's answer — so every crash point
between steps 2 and 3 heals by rerunning the batch.

Ordering contract (the standard streaming-attribution caveat, shared
with ``scd2_apply``): batches must arrive in nondecreasing event-time
order per entity — the state keeps only each entity's latest touch, so
a conversion delivered in a later batch than a touch that FOLLOWED it
would see that touch as if it preceded it.  The pin test streams
chronological chunks; route out-of-order replays to the batch
operator."""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..operators.attribution import last_touch_attribution


class LastTouchAttributionSink:
    """foreachBatch callable: micro-batch → attributed conversions
    under ``store_dir/out/batch=<id>/`` + per-entity last-touch state
    under ``store_dir/state/`` (staged swap)."""

    def __init__(
        self,
        store_dir: str,
        entity_col: str,
        ts_col: str,
        touch_filter: Column,
        touch_col: str,
        conversion_filter: Column,
        lookback: "str | None" = None,
        tiebreak_cols: "list[str] | None" = None,
    ) -> None:
        self.store_dir = store_dir
        self.entity_col = entity_col
        self.ts_col = ts_col
        self.touch_filter = touch_filter
        self.touch_col = touch_col
        self.conversion_filter = conversion_filter
        self.lookback = lookback
        self.tiebreak_cols = list(tiebreak_cols or [])

    def __call__(self, batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        from ..fsutil import heal_swap_crash, swap_with_staging

        spark = batch.sparkSession
        state_dir = os.path.join(self.store_dir, "state")
        out_dir = os.path.join(self.store_dir, "out", f"batch={batch_id}")
        heal_swap_crash(spark, state_dir)
        try:
            state = spark.read.parquet(state_dir)
            have_state = True
        except Exception:
            state = batch.limit(0)
            have_state = False
        merged = state.withColumn("_is_seed", F.lit(True)).unionByName(
            batch.withColumn("_is_seed", F.lit(False))
        )
        conv = last_touch_attribution(
            merged,
            self.entity_col,
            self.ts_col,
            touch_filter=self.touch_filter,
            touch_col=self.touch_col,
            # seed rows are touches from PRIOR batches, never this
            # batch's conversions — without the mask a row that is both
            # touch and conversion would re-emit on every later batch
            conversion_filter=self.conversion_filter & ~F.col("_is_seed"),
            lookback=self.lookback,
            tiebreak_cols=self.tiebreak_cols,
        ).drop("_is_seed")
        conv.write.mode("overwrite").parquet(out_dir)
        order = [F.col(self.ts_col).desc()] + [
            F.col(c).desc() for c in self.tiebreak_cols
        ]
        w = Window.partitionBy(self.entity_col).orderBy(*order)
        new_state = (
            merged.filter(self.touch_filter)
            .drop("_is_seed")
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
        # materialize BEFORE the swap: the plan reads the live state
        # dir, and writing it lazily into staging while the rename
        # retargets the source would race the scan (the
        # scd2_apply_table discipline)
        frozen = new_state.localCheckpoint(eager=True)
        if have_state:
            swap_with_staging(
                spark, state_dir, lambda st: frozen.write.parquet(st), job="compact"
            )
        else:
            # first batch: nothing live to protect — write directly
            # (the swap contract requires an existing live dir)
            frozen.write.mode("overwrite").parquet(state_dir)


def attributed_conversions_from_store(spark, store_dir: str) -> DataFrame:
    """All attributed conversion rows streamed into the store (the
    ``batch`` partition column is an ingest artifact and is dropped)."""
    return spark.read.parquet(os.path.join(store_dir, "out")).drop("batch")
