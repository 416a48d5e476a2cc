"""Segment-count maintenance policy for the appendable written-index
layouts — the helper that ENFORCES the operating rule SCALING.md's r13
compaction measurements recorded ("append daily, compact on a cadence
that bounds segment count; at ~7 segments probes stay within ~25% of
the single-segment floor, and one compaction pays ~1 store rewrite to
restore it").  Until r14 that rule lived only in prose; every caller
had to remember which ``compact_*`` to run and when.

``maintain_index`` closes the loop: point it at any of the five
appendable layouts (BM25 / LSH / IVF / PQ / IVFPQ — self-identified by
their params sidecars, so there is no layout argument to get wrong),
and it compacts IFF the segment count exceeds ``max_segments``.  All
compactions go through the existing crash-safe ``fsutil.
swap_with_staging`` rename discipline, so the helper inherits its
terminal-runs-only rule: never run it while an ingest stream is
writing the index — and NOT from inside the stream's own foreachBatch
either, even though batches run serially.  The reason is replay
idempotence, not concurrency: the ingest sinks' exactly-once story is
"a replayed batch id overwrites its own segment", but compaction
FOLDS every segment into ``batch=0`` — if the stream crashes after an
in-batch compaction but before the checkpoint commits that batch, the
replay finds no segment under its own id, takes the append path, and
the overlap check sees its rows already folded into ``batch=0``: the
stream wedges permanently on the (correct!) duplicate-id error, and a
layout without overlap validation would double-count instead.  Safe
cadences: a scheduled job while the stream is stopped, or any moment
the checkpoint is known to be committed past the newest segment.

No reference counterpart: the reference
(salmansajidsattar/ClickStreaming_End_to_End_Data_Engineering_Project)
has no written-index surface; this module exists for the
LLM-data-pipeline extension mandate's 100 TB serving story.
"""

from __future__ import annotations

import os

# (params sidecar that identifies the layout,
#  segment root relative to the index root,
#  dotted compaction entrypoint within operators/)
_LAYOUTS = (
    ("_bm25_params", "", "retrieval", "compact_bm25_index"),
    ("_lsh_params", "", "similarity", "compact_lsh_index"),
    ("_ivf_params", "vectors", "similarity", "compact_ivf_index"),
    ("_ivfpq_params", "codes", "similarity", "compact_ivfpq_index"),
    ("_pq_params", "codes", "similarity", "compact_pq_index"),
)


def detect_index_kind(spark, root: str) -> "tuple[str, str, str] | None":
    """(kind, segment_root, compact_fn_name) for the layout at
    ``root``, identified by its params sidecar — None if ``root`` is
    not a recognized written index.  Sidecar order matters only for
    IVFPQ-vs-PQ, which share ``_pq_codebooks``: ``_ivfpq_params`` is
    checked first and is unique to the IVFPQ layout."""
    from ..fsutil import fs_for

    _, fs, _ = fs_for(spark, root)
    for sidecar, seg_rel, mod, fn in _LAYOUTS:
        _, _, hpath = fs_for(spark, os.path.join(root, sidecar))
        if fs.exists(hpath):
            return (sidecar.strip("_").replace("_params", ""), seg_rel, f"{mod}.{fn}")
    return None


def maintain_index(
    spark, root: str, max_segments: int = 7
) -> "dict[str, object]":
    """Apply the recorded compaction policy to the written index at
    ``root``: if its ``batch=<id>`` segment count exceeds
    ``max_segments`` (default 7 — the SCALING.md r13 operating point:
    probes within ~25% of the single-segment floor), compact it to one
    segment via the layout's own crash-safe compaction; otherwise do
    nothing.  Returns ``{"kind", "segments_before", "segments_after",
    "compacted"}``.  Raises on a path that is not a recognized index —
    a silent no-op on a typo'd path would read as "maintained".

    Idempotent and safe to call on every ingest cadence tick; the
    compaction itself is the existing swap-based job, so the
    terminal-runs-only rule applies (do not run concurrently with an
    ingest stream writing ``root``)."""
    if max_segments < 1:
        raise ValueError(f"max_segments must be >= 1, got {max_segments}")
    detected = detect_index_kind(spark, root)
    if detected is None:
        raise ValueError(
            f"maintain_index: no recognized written-index layout at {root} "
            "(expected a _bm25/_lsh/_ivf/_ivfpq/_pq params sidecar)"
        )
    kind, seg_rel, compact_ref = detected
    from ..fsutil import existing_batch_ids, heal_segment_debris

    seg_root = os.path.join(root, seg_rel) if seg_rel else root
    # a crashed segment-level job (a delete) leaves batch=<id>.erase_*
    # debris that would poison the compaction's partition-discovery
    # reads — heal every segmented dir of the layout first
    sidecars = {
        "bm25": ("", "_doclens", "_termstats", "_bm25_params"),
        "lsh": ("", "_id_map"),
        "ivf": ("vectors", "_id_map"),
        "ivfpq": ("codes",),
        "pq": ("codes",),
    }[kind]
    for sub in sidecars:
        heal_segment_debris(spark, os.path.join(root, sub) if sub else root)
    before = len(existing_batch_ids(spark, seg_root))
    if before <= max_segments:
        return {
            "kind": kind,
            "segments_before": before,
            "segments_after": before,
            "compacted": False,
        }
    mod_name, fn_name = compact_ref.split(".")
    import importlib

    mod = importlib.import_module(f".{mod_name}", package=__package__)
    getattr(mod, fn_name)(spark, root)
    after = len(existing_batch_ids(spark, seg_root))
    return {
        "kind": kind,
        "segments_before": before,
        "segments_after": after,
        "compacted": True,
    }


# kind (as detect_index_kind reports it) → the layout's delete verb.
# All five share the (spark, path, ids, id_col) signature and the
# O(touched-segment) staged-swap discipline.
_DELETE_VERBS = {
    "bm25": ("retrieval", "delete_from_bm25_index", "doc_id"),
    "lsh": ("similarity", "delete_from_lsh_index", "vec_id"),
    "ivf": ("similarity", "delete_from_ivf_index", "vec_id"),
    "ivfpq": ("similarity", "delete_from_ivfpq_index", "vec_id"),
    "pq": ("similarity", "delete_from_pq_index", "vec_id"),
}


def forget_ids(
    spark,
    ids: "list",
    index_roots: "tuple[str, ...] | list[str]" = (),
    datasets: "tuple[tuple[str, str], ...] | list[tuple[str, str]]" = (),
    id_col_overrides: "dict[str, str] | None" = None,
) -> "dict[str, dict]":
    """Right-to-be-forgotten CASCADE: erase ``ids`` from every given
    written index (layout auto-detected, dispatched to that layout's
    delete verb) and from every ``(parquet_path, id_col)`` dataset
    (staged-swap row rewrite via ``etl.delete_user_data``) — the
    capstone verb over the per-store deletes, for the erasure-request
    case where one id must vanish from the corpus AND every derived
    serving store in one operation.

    Crash/replay discipline: every step is individually crash-safe
    (staged swaps) and IDEMPOTENT (deleting absent ids is a no-op), so
    the cascade's contract is run-to-completion-or-re-run — keep the
    erasure request (the ids) until a full pass completes, exactly the
    GDPR request-log practice.  Derived stores are erased BEFORE the
    datasets: a crash mid-cascade then leaves the corpus row present
    as the discoverable record that the request is unfinished, rather
    than indexes silently serving ids whose source row is already
    gone.

    Returns {("index"|"dataset", target_path): report} with each delete
    verb's own counts plus {"rows_removed": n} per dataset — keys are
    ROLE-NAMESPACED tuples, not bare paths, so a path appearing both as
    an index root and a dataset (or listed twice) can never silently
    overwrite an earlier report entry and hide erasure evidence; a
    duplicate within the same role raises instead.  Raises on an index
    root with no recognized layout (a typo'd path must not read as
    "forgotten").

    Concurrency (r19 optimization round, guide §2.6 "overlap
    independent jobs"): the per-store deletes target DISJOINT roots —
    every staged-swap artifact is path-scoped
    (``<path>.<job>_staging`` / ``.<job>_old``), so two deletes can
    only ever race when aimed at the SAME root, which the duplicate
    validation above rejects.  Index deletes therefore run through a
    small driver thread pool (each delete's own swap sequence stays
    serial inside its thread, preserving the per-store terminal-
    runs-only rename discipline), and the dataset rewrites do the same
    AFTER all index deletes complete — the indexes-before-datasets
    crash ordering the docstring above promises is a barrier between
    the two pools, not a serialization within them.  Failures keep the
    run-to-completion-or-re-run contract: every submitted delete is
    awaited (no store is left mid-swap by an abandoned future — each
    either finished its swaps or never started them), then the first
    failure in input order is re-raised."""
    import importlib
    from concurrent.futures import ThreadPoolExecutor

    # validate BEFORE the first delete verb runs: a duplicate target
    # must fail with zero side effects, not after earlier stores were
    # already irreversibly erased (r16 review)
    seen_roots = set()
    for root in index_roots:
        if root in seen_roots:
            raise ValueError(f"forget_ids: index root listed twice: {root}")
        seen_roots.add(root)
    seen_ds = set()
    for path, _ in datasets:
        if path in seen_ds:
            raise ValueError(f"forget_ids: dataset listed twice: {path}")
        seen_ds.add(path)

    overrides = id_col_overrides or {}

    # resolve every index verb BEFORE any delete runs: an unrecognized
    # root must fail with zero side effects, same as the duplicate case
    index_jobs = []
    for root in index_roots:
        detected = detect_index_kind(spark, root)
        if detected is None:
            raise ValueError(
                f"forget_ids: no recognized written-index layout at {root}"
            )
        kind = detected[0]
        mod_name, fn_name, default_col = _DELETE_VERBS[kind]
        mod = importlib.import_module(f".{mod_name}", package=__package__)
        index_jobs.append((root, kind, getattr(mod, fn_name), default_col))

    def _run_index(job):
        root, kind, fn, default_col = job
        res = fn(spark, root, ids, id_col=overrides.get(root, default_col))
        return ("index", root), {"kind": kind, **res}

    def _run_dataset(ds):
        path, id_col = ds
        from ..etl import delete_user_data

        removed = delete_user_data(spark, path, ids, user_col=id_col)
        return ("dataset", path), {"kind": "dataset", "rows_removed": removed}

    def _drain(pool_jobs, runner) -> "list":
        """Run jobs through a bounded pool; await EVERY future, then
        re-raise the first failure in input order."""
        if not pool_jobs:
            return []
        workers = min(3, len(pool_jobs))
        with ThreadPoolExecutor(max_workers=workers) as pool:
            futures = [pool.submit(runner, j) for j in pool_jobs]
            results, first_err = [], None
            for fut in futures:  # input order; await all before raising
                try:
                    results.append(fut.result())
                except BaseException as exc:  # noqa: BLE001
                    if first_err is None:
                        first_err = exc
            if first_err is not None:
                raise first_err
            return results

    report: "dict[tuple[str, str], dict]" = {}
    report.update(_drain(index_jobs, _run_index))
    # barrier: datasets start only after every index delete finished
    report.update(_drain(list(datasets), _run_dataset))
    return report
