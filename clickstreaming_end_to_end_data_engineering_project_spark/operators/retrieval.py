"""Lexical retrieval: BM25 scoring and reciprocal-rank fusion — the
keyword half of a retrieval stack whose vector half is
operators/similarity.py.  Together they give hybrid search: BM25 for
exact-term recall, ANN for semantic recall, RRF to fuse without score
calibration (Robertson et al. TREC-3 BM25; Cormack et al. 2009 RRF).

Scale shape: one corpus tokenize computes document lengths; the term
match is a FILTERED explode (only query terms survive the flatMap, so
the shuffled frame is |matching (doc, term)| rows, never the full
token stream); df/idf live on a |query|-sized frame broadcast back.
Top-k is TakeOrderedAndProject.  Nothing here depends on a corpus-wide
index — but the (doc, term, tf) frame IS the posting-list fragment a
persisted inverted index would serve, so the operator drops onto one
directly.

Cross-engine determinism (BM25 is float-heavy; the discipline is the
repo's standard): idf is dround(12) right after ln() (ln is NOT
correctly rounded across libms — the bigram_collocations lesson);
every literal enters SQL as CAST(... AS DOUBLE) (DuckDB parses bare
numerics as exact DECIMALs — the daily_revenue_ewma lesson); the
per-doc sum over matched terms is dround(6); ranking ties break on
doc_id so equal scores order identically in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import tokens


def _qtf_col(query_terms: list[str]):
    """Query-term-frequency as a LITERAL ``CASE _t`` expression — a
    |distinct query terms|-branch conditional, not a broadcast join
    (the joined 4-row frame measured a steady +0.25 s per execution:
    one extra stage + driver round-trip for driver-sized data that
    belongs in the plan as literals).  Counts are exact-integer-valued
    doubles (multiplication by them is deterministic, and by
    exactly-1.0 is bit-neutral).  No ``otherwise``: callers filter to
    the query terms first, so a non-matching row is a bug and surfaces
    as a NULL score rather than a silently wrong one."""
    from collections import Counter

    col = None
    for t, n in Counter(query_terms).items():
        cond = F.col("_t") == t
        col = F.when(cond, float(n)) if col is None else col.when(cond, float(n))
    return col.alias("_qtf")


def _empty_bm25_result(ids: DataFrame, id_col: str) -> DataFrame:
    """Zero-row frame with the (id, n_matched_terms, bm25_score) result
    schema — what an empty query scores (the pre-r12 contract, restored
    per the r13 advisory: ``_qtf_col([])`` cannot build a CASE)."""
    return ids.select(
        F.col(id_col),
        F.lit(0).cast("long").alias("n_matched_terms"),
        F.lit(0.0).alias("bm25_score"),
    ).limit(0)


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
    eligible=None,
) -> DataFrame:
    """Top-``k`` documents for a bag-of-terms query by BM25
    (Lucene-style non-negative idf: ln(1 + (N − df + 0.5)/(df + 0.5))).
    Bag semantics are real (r12 advisory): a term repeated in
    ``query_terms`` multiplies its per-term contribution by its query
    frequency, the standard BM25 query weighting — not collapsed to set
    semantics.  ``n_matched_terms`` counts DISTINCT matched terms
    (Lucene's coordination count).  Output: (doc_id, n_matched_terms,
    bm25_score), ordered by (score desc, doc_id).  An EMPTY query
    returns an empty frame with the same schema (nothing can match
    nothing) — short-circuited up front because ``_qtf_col`` has no
    CASE branches to build for zero terms (r13 advisory).

    ``eligible`` (r15, the r16 queue): an optional predicate (Column or
    SQL string) restricting which docs may be RANKED — Lucene's
    filtered-query semantics: corpus statistics (N, avgdl, df) stay
    COLLECTION-WIDE, so an eligible doc's score is identical with and
    without the filter (pinned by test), and only the ranking pool
    shrinks.  Filtering before the rank (not after the top-k) keeps
    the k-rows contract; filtering the stats too would silently change
    every score and make filtered results incomparable across
    filters."""
    if not query_terms:
        return _empty_bm25_result(docs.select(F.col(id_col)), id_col)
    # (doc_id, doc_len) and (doc_id, term, tf) are each consumed by TWO
    # derivations (corpus stats + the score join; df + the score join),
    # so both are MATERIALIZED — unmaterialized, the digest showed the
    # corpus tokenization executing once per reference (the
    # source_unigram_kl lesson).  dl is (id, int) per doc — orders of
    # magnitude under the token stream it replaces; matched is the
    # posting-list fragment for |query| terms.
    dl = (
        docs.select(F.col(id_col), F.size(tokens(text_col)).alias("_dl"))
        .filter(F.col("_dl") > 0)
        .localCheckpoint()
    )
    # N and avgdl: one tiny agg broadcast back (exact-int division)
    corpus = dl.agg(
        F.count(F.lit(1)).alias("_N"),
        (F.sum("_dl").cast("double") / F.count(F.lit(1))).alias("_avgdl"),
    )
    terms = list(dict.fromkeys(query_terms))
    matched = (
        docs.select(F.col(id_col), F.explode(tokens(text_col)).alias("_t"))
        .filter(F.col("_t").isin(terms))
        .groupBy(id_col, "_t")
        .agg(F.count(F.lit(1)).alias("_tf"))
        .localCheckpoint()
    )
    # df is computed from the UNFILTERED posting fragment — the
    # collection-wide statistic the eligibility filter must not touch
    df_ = matched.groupBy("_t").agg(F.count(F.lit(1)).alias("_df"))
    if eligible is not None:
        pred = F.expr(eligible) if isinstance(eligible, str) else eligible
        matched = matched.join(
            docs.filter(pred).select(F.col(id_col)), id_col, "left_semi"
        )
    scored = (
        matched.join(F.broadcast(df_), "_t")
        .withColumn("_qtf", _qtf_col(query_terms))
        .join(dl, id_col)
        .crossJoin(F.broadcast(corpus))
    )
    return _score_and_rank(scored, id_col, k, k1, b)


def _score_and_rank(scored: DataFrame, id_col: str, k: int, k1: float, b: float) -> DataFrame:
    """Shared scoring tail over (_tf, _df, _qtf, _N, _avgdl, _dl) — ONE
    copy of the BM25 expression tree, so the in-memory operator and the
    written-index probe are bit-equal by construction.  ``_qtf`` scales
    each term's contribution by its query-term frequency (1.0 for
    every term of a duplicate-free query — multiplication by exactly
    1.0 is an IEEE no-op, so set-style queries are bit-unchanged)."""
    from ..functions import dround

    idf = dround(
        F.log(
            F.lit(1.0)
            + (F.col("_N") - F.col("_df") + F.lit(0.5))
            / (F.col("_df") + F.lit(0.5))
        ),
        12,
    )
    part = F.col("_qtf") * (
        idf
        * (F.col("_tf") * F.lit(k1 + 1.0))
        / (
            F.col("_tf")
            + F.lit(k1)
            * (F.lit(1.0 - b) + F.lit(b) * F.col("_dl") / F.col("_avgdl"))
        )
    )
    return (
        scored.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_matched_terms"),
            dround(F.sum(part), 6).alias("bm25_score"),
        )
        .orderBy(F.col("bm25_score").desc(), F.col(id_col))
        .limit(k)
    )


# fixed sidecar schemas: probes read them with explicit schemas so no
# footer-inference job runs per query (the probe-latency term that
# would otherwise grow with segment count)
_PARAMS_SCHEMA = "n_docs long, sum_dl long, n_buckets int"
_TERMSTATS_SCHEMA = "_t string, _df long"


def _term_bucket(term: str, n_buckets: int) -> int:
    """crc32(term) % n_buckets — computable identically driver-side
    (zlib.crc32) and engine-side (F.crc32), so a probe can name its
    partitions without touching the cluster."""
    import zlib

    return zlib.crc32(term.encode("utf-8")) % n_buckets


def write_bm25_index(
    docs: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 64,
) -> None:
    """Materialize the inverted index ``bm25_topk`` builds on the fly —
    the written-retrieval layout completing the written-ANN family's
    pattern (LSH/IVF/PQ/IVFPQ → +BM25).  The layout is SEGMENTED
    (Lucene's increment model, r12 verdict #4): every build/append is
    one ``batch=<id>`` increment, and corpus statistics are stored as
    mergeable per-batch sums, so appending a day's documents writes
    one new segment instead of rebuilding the corpus index:

    - ``batch=<id>/bucket=<b>/``: posting rows (doc_id, term, tf, dl)
      with ``bucket = crc32(term) % n_buckets`` — a probe statically
      prunes to the query terms' buckets (the second-level partition
      column prunes regardless of how many batches exist) and reads
      |query|/n_buckets of the postings, never the corpus.  The
      document length rides IN every posting row (Lucene's
      norms-in-postings, +8 bytes/posting): the probe scores from the
      pruned partitions ALONE, no corpus-sized sidecar join.
    - ``_termstats/batch=<id>/``: (_t, _df) per segment.  Document
      frequencies over disjoint doc sets ADD, so the probe sums the
      query terms' rows across segments — exact-integer merge, no
      postings aggregation at probe time.
    - ``_doclens/batch=<id>/``: (doc_id, _dl) — the membership table
      appends validate against (and the length audit).
    - ``_bm25_params/batch=<id>/``: 1 row (n_docs, sum_dl, n_buckets)
      per segment; the probe derives N = Σ n_docs and avgdl =
      Σ sum_dl / Σ n_docs — integer sums, so the double division is
      bit-identical to a single-build index.

    This ``write`` is just the first segment (``batch=0``).
    Rebuilding over an EXISTING index goes through the crash-safe
    staging swap (r15, the write_pq_index discipline extended to the
    whole write_* family): the old index stays probe-able until the
    new build fully lands.  All filesystem work goes through the
    Hadoop FileSystem API, so the same code maintains a local, HDFS,
    or s3a layout (the fsutil rule).
    """
    from ..fsutil import fs_for, heal_swap_crash, swap_with_staging

    spark = docs.sparkSession
    heal_swap_crash(spark, path)
    _, fs, hpath = fs_for(spark, path)
    if fs.exists(hpath):
        swap_with_staging(
            spark, path,
            lambda staging: _write_bm25_segment(
                docs, staging, 0, id_col, text_col, n_buckets
            ),
            job="compact",
        )
    else:
        _write_bm25_segment(docs, path, 0, id_col, text_col, n_buckets)


def _existing_bm25_batches(spark, path: str) -> "list[int]":
    from ..fsutil import existing_batch_ids

    return existing_batch_ids(spark, path)


def _write_bm25_segment(
    docs: DataFrame,
    path: str,
    batch_id: int,
    id_col: str,
    text_col: str,
    n_buckets: int,
) -> "dict[str, int]":
    """One segment's four directory writes, each ``batch=<id>``-scoped
    with mode=overwrite: re-running the SAME batch id rewrites its own
    directories (the near_dedup survivor discipline), so a crash
    mid-append heals by replaying the append — no partial segment can
    double-count.

    Write ORDER matters for crash recovery (r13 advisory + r15
    symmetry audit): ``_bm25_params`` lands FIRST (a bootstrap that
    crashes after the postings write replays down the APPEND path,
    which reads params for n_buckets — params-last wedged that replay
    on PATH_NOT_FOUND), then ``_doclens`` — the slice append OVERLAP
    VALIDATION reads — and only then the postings dir that
    ``existing_batch_ids`` lists, then ``_termstats``.  Doclens before
    postings is the ``append_ivf_index`` id_map-first rule: a crash
    between them leaves the batch UNDISCOVERABLE, so a default-id
    retry replays the SAME id and overwrites everything; the pre-r15
    postings-first order let a crash window strand a listed segment
    invisible to the overlap check — the retry took max+1 and
    double-counted every id's stats.  A crash AFTER postings leaves
    the batch discoverable AND validated: a default-id retry raises
    the (correct) duplicate error, and the healing replay is an
    explicit same-batch-id append — which is exactly what the
    streaming ingest sink does on every restart."""
    import os

    seg = f"batch={batch_id}"
    spark = docs.sparkSession
    # ONE tokenize pass (r18 optimization round): tf rows are the
    # segment's ground truth, and the document length is their per-doc
    # tf sum (size(tokens) ≡ Σ tf — counts, not distincts), so dl no
    # longer pays a second full tokenize of the corpus.  The
    # checkpointed tf frame also feeds _termstats directly, replacing
    # the former re-read of the just-written postings partitions (same
    # rows by construction — the write is derived from this frame).
    tf_rows = (
        docs.select(F.col(id_col), F.explode(tokens(text_col)).alias("_t"))
        .groupBy(id_col, "_t")
        .agg(F.count(F.lit(1)).alias("_tf"))
        .localCheckpoint()
    )
    # cast keeps _dl INT exactly as F.size() produced it — appended
    # segments must stay schema-identical to pre-existing ones
    dl = (
        tf_rows.groupBy(id_col)
        .agg(F.sum("_tf").cast("int").alias("_dl"))
        .localCheckpoint()
    )
    # one action for both corpus statistics (was two: count + sum)
    totals = dl.agg(
        F.count(F.lit(1)).alias("_n"), F.sum("_dl").alias("_s")
    ).first()
    n_docs = int(totals["_n"])
    if n_docs == 0:
        # nothing tokenizable: write NOTHING rather than a data-less
        # segment — an empty batch=<id> dir breaks schema inference for
        # every later probe (caught by the r13 empty-segment check);
        # replays of the same all-empty batch are likewise no-ops
        return {"batch_id": batch_id, "n_docs": 0}
    sum_dl = int(totals["_s"])
    # params as a JVM-literal frame: a 1-row createDataFrame goes
    # through the pickled-RDD path — a Python-worker job (and the
    # session's pool FORK, ~5 s, when it is the first such job)
    (
        spark.range(1)
        .select(
            F.lit(n_docs).cast("long").alias("n_docs"),
            F.lit(sum_dl).cast("long").alias("sum_dl"),
            F.lit(n_buckets).cast("int").alias("n_buckets"),
        )
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(os.path.join(path, "_bm25_params", seg))
    )
    dl.write.mode("overwrite").parquet(os.path.join(path, "_doclens", seg))
    postings = tf_rows.join(dl, id_col).withColumn(
        "bucket",
        F.pmod(F.crc32(F.col("_t").cast("binary")), F.lit(n_buckets)),
    )
    postings.write.mode("overwrite").partitionBy("bucket").parquet(
        os.path.join(path, seg)
    )
    tf_rows.groupBy("_t").agg(F.count(F.lit(1)).alias("_df")).write.mode(
        "overwrite"
    ).parquet(os.path.join(path, "_termstats", seg))
    return {"batch_id": batch_id, "n_docs": n_docs}


def append_bm25_index(
    new_docs: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    batch_id: "int | None" = None,
) -> "dict[str, int]":
    """Append ``new_docs`` to an existing ``write_bm25_index`` layout
    as one new segment — the incremental-maintenance path (r12 verdict
    #4): cost is proportional to the APPENDED documents, not the
    corpus, and a probe of the appended index is bit-equal to a probe
    of a full rebuild over the union (pinned by test — df/N/avgdl all
    merge as exact integer sums).

    ``batch_id`` defaults to max(existing)+1.  Passing an explicit id
    makes the append REPLAYABLE: re-running a batch id overwrites that
    segment's four directories (streaming/bm25_ingest.py relies on
    this for foreachBatch exactly-once).  New doc ids must not already
    exist in OTHER segments (raises — BM25 stats would double-count;
    route updates through a rebuild or a delete-then-append cycle).

    The increment is MATERIALIZED before any directory is overwritten
    (r15): a replay's input may lawfully derive from the index's own
    sidecars (e.g. "re-deliver the docs _doclens says batch N holds"),
    and the doclens-first write order would otherwise invalidate that
    lazy input's file listing mid-append.  Increments are
    increment-sized by definition, so the checkpoint is bounded — the
    whole-corpus initial build keeps the lazy path (its crash healing
    is the staged-swap rebuild, never an in-place replay).
    """
    spark = new_docs.sparkSession
    import os

    new_docs = new_docs.localCheckpoint(eager=True)
    existing = _existing_bm25_batches(spark, path)
    if not existing:
        raise ValueError(
            f"append_bm25_index: no index at {path} — build one with "
            "write_bm25_index first"
        )
    if batch_id is None:
        batch_id = existing[-1] + 1
    params = spark.read.schema(_PARAMS_SCHEMA).parquet(
        os.path.join(path, "_bm25_params")
    )
    n_buckets = params.select("n_buckets").first()[0]
    other = [b for b in existing if b != batch_id]
    if other:
        prior = spark.read.parquet(os.path.join(path, "_doclens")).filter(
            F.col("batch").isin(other)
        )
        dup = (
            new_docs.select(F.col(id_col))
            .join(prior, new_docs[id_col] == prior[id_col], "left_semi")
            .limit(1)
            .count()
        )
        if dup:
            raise ValueError(
                "append_bm25_index: some new doc ids already exist in the "
                "index — appending them would double-count df/N/avgdl; "
                "rebuild instead"
            )
    return _write_bm25_segment(
        new_docs, path, batch_id, id_col, text_col, n_buckets
    )


def bm25_topk_indexed(
    spark,
    path: str,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    eligible_ids: "DataFrame | None" = None,
) -> DataFrame:
    """Probe a ``write_bm25_index`` layout: read ONLY the query terms'
    bucket directories (static partition pruning via the driver-side
    crc32 twin — ``bucket`` is the second-level partition column, so
    the pruning holds across every ``batch=<id>`` segment), merge the
    |query|-sized per-segment _termstats rows (df over disjoint doc
    sets ADDS — exact integers), derive N/avgdl from the per-segment
    sums, and run the IDENTICAL scoring tail as ``bm25_topk`` —
    row-for-row equality is pinned by test, not hoped for (including
    bag-of-terms queries and appended indexes: a probe after
    ``append_bm25_index`` is bit-equal to a full rebuild's probe).
    The probe never tokenizes anything: the corpus pass was paid at
    write/append time.  An empty query returns an empty result frame
    (same schema), mirroring ``bm25_topk``.

    ``eligible_ids`` (r15, the r16 queue): an optional one-column id
    frame restricting which docs may be ranked — the written-layout
    twin of ``bm25_topk``'s ``eligible`` predicate (postings carry no
    metadata, so eligibility arrives as an id set, Lucene's filter
    bitset re-expressed as a semi-join).  Statistics stay
    collection-wide (the sidecars are untouched); the semi-join lands
    on the already-pruned posting fragment, BEFORE ranking.  Pinned
    equal to the in-memory operator under the same filter."""
    import os

    if not query_terms:
        # infer the id column from the thin two-column _doclens sidecar
        # — the postings root would cost a full file listing per empty
        # query and mis-parse stranded batch=<id>.erase_* debris (r15
        # advisory); _doclens is segment-count-sized and healed first
        from ..fsutil import heal_segment_debris

        doclens_root = os.path.join(path, "_doclens")
        heal_segment_debris(spark, doclens_root)
        dl = spark.read.parquet(doclens_root)
        id_col = [c for c in dl.columns if c not in ("_dl", "batch")][0]
        return _empty_bm25_result(dl.select(F.col(id_col)), id_col)

    totals = (
        spark.read.schema(_PARAMS_SCHEMA)
        .parquet(os.path.join(path, "_bm25_params"))
        .agg(
            F.sum("n_docs").alias("n_docs"),
            F.sum("sum_dl").alias("sum_dl"),
            F.max("n_buckets").alias("n_buckets"),
            F.min("n_buckets").alias("n_buckets_min"),
        )
        .first()
    )
    if totals["n_buckets"] != totals["n_buckets_min"]:
        raise ValueError(
            f"bm25 index at {path} has segments with differing n_buckets"
        )
    n_buckets = totals["n_buckets"]
    # avgdl from the merged integer sums — the same CAST-then-divide as
    # the in-memory operator, so the double is bit-identical no matter
    # how many segments the corpus arrived in
    avgdl = float(totals["sum_dl"]) / float(totals["n_docs"])
    terms = list(dict.fromkeys(query_terms))
    buckets = sorted({_term_bucket(t, n_buckets) for t in terms})
    raw = spark.read.parquet(path)
    id_col = [
        c for c in raw.columns if c not in ("_t", "_tf", "_dl", "bucket", "batch")
    ][0]
    postings = raw.filter(F.col("bucket").isin(buckets)).filter(
        F.col("_t").isin(terms)
    )
    if eligible_ids is not None:
        postings = postings.join(
            eligible_ids.select(F.col(id_col)), id_col, "left_semi"
        )
    termstats = (
        spark.read.schema(_TERMSTATS_SCHEMA)
        .parquet(os.path.join(path, "_termstats"))
        .filter(F.col("_t").isin(terms))
        .groupBy("_t")
        .agg(F.sum("_df").alias("_df"))
    )
    # _dl rides in the posting rows — no sidecar join, the probe's
    # only scan is the pruned posting partitions
    scored = (
        postings.join(F.broadcast(termstats), "_t")
        .withColumn("_N", F.lit(totals["n_docs"]))
        .withColumn("_avgdl", F.lit(avgdl))
        .withColumn("_qtf", _qtf_col(query_terms))
    )
    return _score_and_rank(scored, id_col, k, k1, b)


def delete_from_bm25_index(
    spark, path: str, doc_ids: "list", id_col: str = "doc_id"
) -> "dict[str, int]":
    """Delete documents from a ``write_bm25_index`` layout — the
    missing third verb of the index CRUD story (build/append/DELETE/
    compact), and what makes "update = delete + append" real for the
    right-to-be-forgotten and re-crawl cases.  Cost is O(touched
    segments): ``_doclens`` (thin, two columns) names which
    ``batch=<id>`` segments contain the ids, and ONLY those segments
    are rewritten minus the deleted docs — per-segment stats (df,
    n_docs, sum_dl) are recomputed EXACTLY from the survivors, so a
    probe after deletion is BIT-EQUAL to a fresh rebuild over the
    surviving corpus (pinned by test; no Lucene-style stale-stats
    tombstone window).  A segment whose docs are all deleted is
    removed whole (the empty-segment rule).

    Crash discipline: postings are rewritten FIRST (a crash after that
    leaves the deleted docs out of results immediately, with stats
    momentarily stale-high), then termstats/params, and ``_doclens``
    strictly LAST — ``_doclens`` is the DISCOVERY table this very
    function uses to find touched segments, so as long as it still
    lists the deleted ids, a re-run re-finds the batch and re-heals
    every other directory; rewriting it before the stats (the pre-r15
    order) left a crash window where termstats/params stayed
    permanently stale because the re-run no longer saw the segment as
    touched (r15 advisory).  Every rewrite is idempotent filtering, so
    a crashed delete heals by RE-RUNNING it — the same survivor
    discipline as appends.  Each directory rewrite goes through the
    crash-safe staging swap, so no partial write can lose surviving
    rows.  Terminal-runs-only, like
    every swap-based job.  Returns {"segments_rewritten",
    "segments_removed", "docs_deleted"}.  Unknown ids are a no-op."""
    import os

    from ..fsutil import fs_for, heal_segment_debris, swap_with_staging

    if not doc_ids:
        return {"segments_rewritten": 0, "segments_removed": 0, "docs_deleted": 0}
    # a crashed per-segment swap leaves batch=<id>.erase_* debris that
    # poisons partition discovery — heal all four roots BEFORE any
    # listing or read (a stranded live segment must be restored before
    # _existing_bm25_batches counts segments)
    for sub in ("", "_doclens", "_termstats", "_bm25_params"):
        heal_segment_debris(spark, os.path.join(path, sub) if sub else path)
    existing = _existing_bm25_batches(spark, path)
    if not existing:
        raise ValueError(f"delete_from_bm25_index: no index at {path}")
    ids = list(doc_ids)
    doclens = spark.read.parquet(os.path.join(path, "_doclens"))
    hit = (
        doclens.filter(F.col(id_col).isin(ids))
        .groupBy("batch")
        .agg(F.count(F.lit(1)).alias("_n"))
        .collect()
    )
    touched = sorted(int(r["batch"]) for r in hit)
    n_deleted = int(sum(r["_n"] for r in hit))
    if not touched:
        return {"segments_rewritten": 0, "segments_removed": 0, "docs_deleted": 0}
    jvm, fs, _ = fs_for(spark, path)
    rewritten = removed = 0
    for b in touched:
        seg = f"batch={b}"
        seg_path = os.path.join(path, seg)
        if not fs.exists(jvm.org.apache.hadoop.fs.Path(seg_path)):
            # a previous whole-segment removal crashed between dir
            # deletes: finish removing the sidecar slices (idempotent;
            # _doclens LAST — it is the discovery table that got us
            # here, so it must outlive the stats slices)
            for d in (os.path.join(path, "_termstats", seg),
                      os.path.join(path, "_bm25_params", seg),
                      os.path.join(path, "_doclens", seg)):
                fs.delete(jvm.org.apache.hadoop.fs.Path(d), True)
            removed += 1
            continue
        survivors = spark.read.parquet(seg_path).filter(
            ~F.col(id_col).isin(ids)
        )
        if survivors.limit(1).count() == 0:
            # whole segment deleted: drop its four directories,
            # _doclens last (discovery table — see docstring)
            for d in (seg_path, os.path.join(path, "_termstats", seg),
                      os.path.join(path, "_bm25_params", seg),
                      os.path.join(path, "_doclens", seg)):
                fs.delete(jvm.org.apache.hadoop.fs.Path(d), True)
            removed += 1
            continue

        def _postings(staging: str) -> None:
            survivors.write.partitionBy("bucket").parquet(staging)

        swap_with_staging(spark, seg_path, _postings, job="erase")
        kept = spark.read.parquet(seg_path)

        def _termstats_w(staging: str) -> None:
            kept.groupBy("_t").agg(F.count(F.lit(1)).alias("_df")).write.parquet(
                staging
            )

        swap_with_staging(
            spark, os.path.join(path, "_termstats", seg), _termstats_w, job="erase"
        )
        stats = kept.select(id_col, "_dl").distinct().agg(
            F.count(F.lit(1)).alias("n"), F.sum("_dl").alias("s")
        ).first()
        n_buckets = (
            spark.read.schema(_PARAMS_SCHEMA)
            .parquet(os.path.join(path, "_bm25_params", seg))
            .first()["n_buckets"]
        )

        def _params_w(staging: str) -> None:
            # JVM-literal frame (r18): the pickled-RDD createDataFrame
            # here measured 7.4 s of the 9.5 s single-segment delete —
            # the Python-worker pool fork landing on a 1-row frame
            (
                spark.range(1)
                .select(
                    F.lit(int(stats["n"])).cast("long").alias("n_docs"),
                    F.lit(int(stats["s"])).cast("long").alias("sum_dl"),
                    F.lit(int(n_buckets)).cast("int").alias("n_buckets"),
                )
                .coalesce(1)
                .write.parquet(staging)
            )

        swap_with_staging(
            spark, os.path.join(path, "_bm25_params", seg), _params_w, job="erase"
        )

        def _doclens_w(staging: str) -> None:
            kept.select(id_col, "_dl").distinct().write.parquet(staging)

        # _doclens LAST: every earlier crash point leaves the deleted
        # ids listed here, so a re-run still discovers this segment as
        # touched and re-heals the stats (r15 advisory)
        swap_with_staging(
            spark, os.path.join(path, "_doclens", seg), _doclens_w, job="erase"
        )
        rewritten += 1
    return {
        "segments_rewritten": rewritten,
        "segments_removed": removed,
        "docs_deleted": n_deleted,
    }


def compact_bm25_index(spark, path: str) -> None:
    """Collapse a segmented BM25 index to ONE segment (``batch=0``) —
    the maintenance job that bounds probe listing cost after many
    appends, exactly as ``sketch_ingest.compact_sketch_store`` bounds
    the sketch store.  Every statistic merges losslessly (postings are
    disjoint rows; df/n_docs/sum_dl are integer sums), so probes are
    bit-identical before and after — pinned by test.  The whole index
    root goes through one crash-safe ``fsutil.swap_with_staging``;
    like every swap-based job, run it only while no ingest stream is
    writing the index."""
    import os

    from ..fsutil import swap_with_staging

    def _write(staging: str) -> None:
        raw = spark.read.parquet(path)
        id_col = [
            c for c in raw.columns if c not in ("_t", "_tf", "_dl", "bucket", "batch")
        ][0]
        seg = "batch=0"
        raw.select(id_col, "_t", "_tf", "_dl", "bucket").write.partitionBy(
            "bucket"
        ).parquet(os.path.join(staging, seg))
        (
            spark.read.schema(_TERMSTATS_SCHEMA)
            .parquet(os.path.join(path, "_termstats"))
            .groupBy("_t")
            .agg(F.sum("_df").alias("_df"))
            .write.parquet(os.path.join(staging, "_termstats", seg))
        )
        spark.read.parquet(os.path.join(path, "_doclens")).drop("batch").write.parquet(
            os.path.join(staging, "_doclens", seg)
        )
        (
            spark.read.schema(_PARAMS_SCHEMA)
            .parquet(os.path.join(path, "_bm25_params"))
            .agg(
                F.sum("n_docs").alias("n_docs"),
                F.sum("sum_dl").alias("sum_dl"),
                F.max("n_buckets").alias("n_buckets"),
            )
            .coalesce(1)
            .write.parquet(os.path.join(staging, "_bm25_params", seg))
        )

    swap_with_staging(spark, path, _write, job="compact")


def rrf_fuse(
    rankings: list[DataFrame],
    id_col: str = "doc_id",
    k: int = 10,
    c: int = 60,
) -> DataFrame:
    """Reciprocal-rank fusion over already-ranked lists: each input
    must carry (id_col, rank) with rank starting at 1; fused score =
    Σ 1/(c + rank) over the lists that ranked the doc.  All arithmetic
    is single divisions of exact integers summed over ≤ len(rankings)
    terms — deterministic without rounding games.  Ties break on id.
    """
    from functools import reduce

    tagged = [r.select(F.col(id_col), F.col("rank")) for r in rankings]
    allr = reduce(lambda a, b: a.unionByName(b), tagged)
    return (
        allr.select(
            id_col, (F.lit(1.0) / (F.lit(c) + F.col("rank")).cast("double")).alias("_s")
        )
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_lists"), F.sum("_s").alias("rrf_score"))
        .orderBy(F.col("rrf_score").desc(), F.col(id_col))
        .limit(k)
    )


def hybrid_topk_indexed(
    spark,
    bm25_path: str,
    ivf_path: str,
    query_terms: list[str],
    query_vec: "list[float]",
    k: int = 10,
    breadth: int = 20,
    nprobe: int = 4,
    exclude_vec_id: "int | None" = None,
    k1: float = 1.2,
    b: float = 0.75,
    c: int = 60,
    eligible_ids: "DataFrame | None" = None,
) -> DataFrame:
    """The SERVING shape of hybrid retrieval: both legs probe WRITTEN
    indexes (BM25 bucket-pruned postings + IVF cluster-pruned
    vectors), so a query touches |query-term buckets| + nprobe
    cluster dirs and never the corpus.  At nprobe = n_clusters the
    semantic leg is exhaustive and the fused output is pinned equal to
    the in-memory ``hybrid_search_rrf`` composition (tests); at the
    serving nprobe it trades the written-ANN family's measured recall
    for the same I/O bound as every other indexed probe.

    ``eligible_ids`` (r15, the r16 queue): an optional one-column
    (doc-id-named) frame restricting BOTH legs before their per-leg
    ranking — the filtered-search form (BM25 stats stay
    collection-wide; the IVF leg semi-joins the pruned cluster scan).
    The id column must carry the BM25 layout's doc-id name; the
    semantic leg renames it to ``vec_id`` internally."""
    from pyspark.sql import Window

    from .similarity import ivf_topk_indexed, ivf_topk_indexed_filtered

    lex = bm25_topk_indexed(
        spark, bm25_path, query_terms, k=breadth, k1=k1, b=b,
        eligible_ids=eligible_ids,
    )
    id_col = [c_ for c_ in lex.columns if c_ not in ("n_matched_terms", "bm25_score")][0]
    lex_r = lex.select(
        id_col,
        F.row_number()
        .over(Window.orderBy(F.col("bm25_score").desc(), F.col(id_col)))
        .alias("rank"),
    )
    if eligible_ids is not None:
        sem = ivf_topk_indexed_filtered(
            spark, ivf_path, query_vec,
            eligible_ids.select(F.col(id_col).alias("vec_id")),
            k=breadth, nprobe=nprobe, exclude_vec_id=exclude_vec_id,
        )
    else:
        sem = ivf_topk_indexed(
            spark, ivf_path, query_vec, k=breadth, nprobe=nprobe,
            exclude_vec_id=exclude_vec_id,
        )
    sem_r = sem.select(
        F.col("vec_id").alias(id_col),
        F.row_number()
        .over(Window.orderBy(F.col("cos_sim").desc(), F.col("vec_id")))
        .alias("rank"),
    )
    return rrf_fuse([lex_r, sem_r], id_col=id_col, k=k, c=c)
