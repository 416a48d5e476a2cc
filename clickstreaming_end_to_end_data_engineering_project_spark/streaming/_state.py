"""Shared per-sink state-store scaffolding (r17 review): ONE copy of
the heal → read-or-init → checkpoint → swap-or-first-write machinery
the stateful sinks (attribution / sequence / intervals) each need —
the fsutil r10 lesson ("the identical crash-window bug was fixed three
separate times in three hand-rolled copies") applied one level up,
where the first three hand-rolled copies had ALREADY diverged: only
one carried the replay high-water mark, and all three caught a broad
``Exception`` around the state read, turning any transient FS error
into a silent state reset.

Contracts:
- ``read_state`` heals a crashed swap first, then reads the live state
  dir.  ONLY a missing dataset (AnalysisException) means "no state
  yet"; any other read failure propagates so the streaming engine
  fails the batch and retries — a transient listing error must never
  reset state.
- The optional replay high-water mark travels INSIDE the swapped state
  as a constant ``_hwm`` column, so "state advanced" and "hwm
  advanced" are one atomic rename.  It is read via ``limit(1)`` (one
  row, never a full-table aggregate).  Sinks whose per-batch output
  write precedes the state swap can treat ``batch_id <= hwm`` as
  "fully applied, skip" — the swap happening last makes 'state
  advanced' imply 'output landed'.
- ``write_state`` materializes the new state eagerly BEFORE the swap
  (the plan reads the live dir; writing lazily into staging while the
  rename retargets the source would race the scan) and falls back to
  a direct write only when no live dir exists yet (the swap contract
  requires one).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def read_state(spark, state_dir: str, init_df: DataFrame):
    """-> (state_without_hwm, have_state, hwm).  ``init_df`` supplies
    the empty-state schema; hwm is -1 when absent."""
    from pyspark.errors import AnalysisException

    from ..fsutil import heal_swap_crash

    heal_swap_crash(spark, state_dir)
    try:
        raw = spark.read.parquet(state_dir)
    except AnalysisException:  # state dir does not exist yet
        return init_df, False, -1
    hwm = -1
    if "_hwm" in raw.columns:
        row = raw.select("_hwm").limit(1).first()
        if row is not None and row["_hwm"] is not None:
            hwm = int(row["_hwm"])
        raw = raw.drop("_hwm")
    return raw, True, hwm


def write_state(
    spark,
    state_dir: str,
    new_state: DataFrame,
    have_state: bool,
    batch_id: "int | None" = None,
) -> None:
    """Persist ``new_state`` under the staged-swap contract (direct
    write for the very first state).  Pass ``batch_id`` to stamp the
    replay high-water mark into the state."""
    from ..fsutil import swap_with_staging

    out = (
        new_state
        if batch_id is None
        else new_state.withColumn("_hwm", F.lit(int(batch_id)).cast("long"))
    )
    frozen = out.localCheckpoint(eager=True)
    if have_state:
        swap_with_staging(
            spark, state_dir, lambda st: frozen.write.parquet(st), job="compact"
        )
    else:
        # First-ever state gets the SAME crash atomicity as the swap
        # path (r17 ADVICE #2): a direct write that crashes mid-flight
        # would leave a partial live dir that every later read_state
        # fails on with a non-AnalysisException (heal_swap_crash cannot
        # help — no backup exists), permanently wedging the sink.  So
        # stage and rename: a crash mid-write strands only staging
        # debris, which the next attempt deletes here and which
        # swap_with_staging's cleanup also covers.
        from ..fsutil import fs_for

        staging = state_dir.rstrip("/") + ".compact_staging"
        jvm, fs, live = fs_for(spark, state_dir)
        spath = jvm.org.apache.hadoop.fs.Path(staging)
        if fs.exists(spath):
            fs.delete(spath, True)
        frozen.write.parquet(staging)
        if not fs.rename(spath, live):
            raise IOError(f"first state write: rename {staging} -> {state_dir} failed")
