"""Deduplication: exact, n-gram Jaccard, MinHash+LSH, SimHash.

Scale design (100 TB corpus):
- exact: one shuffle on the content hash; group sizes are tiny
  (duplicate cliques), no skew concern.
- n-gram Jaccard: exact pairwise similarity *restricted to candidate
  pairs that share a shingle*.  The explode→self-join is the textbook
  inverted-index join; hot shingles are the skew risk, so very frequent
  shingles (doc-frequency above a cap) are dropped before the join —
  standard practice and what AQE skew-split can't fix alone.
- MinHash+LSH: the sub-quadratic path.  K independent min-hashes from
  seeded xxhash64 (no UDF), banded into B buckets; candidate pairs only
  within a bucket → shuffle on (band, bucket-hash) instead of shingle.
- SimHash: 64-bit signature per doc via bit-voting over token hashes;
  near-dups = identical signature (or banded Hamming pieces).

MinHash/SimHash use Spark's xxhash64/hash and are checked rows-only
(DuckDB's hash() is a different function); Jaccard is oracle-checkable.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import tokens

# Max hot-shingle drop-list size applied as a literal-array
# array_except in the doc projection (8-byte longs, one expression
# node per entry).  Above this the cap falls back to a distributed
# broadcast anti-join instead.
_HOT_LIST_EXPR_CAP = 1_000

# Dense-verification gate for the cosine prefix joins (r18 optimization
# round): when the collapsed representatives' tf matrix fits a
# broadcastable dense block (n_reps · n_terms cells, 8 bytes each —
# 2^23 cells = 64 MB), candidate verification computes the exact-long
# dot as a vectorized numpy gather+einsum inside an Arrow-batched
# pandas UDF instead of the per-pair interpreted map_zip_with HOF.
# The cap also bounds the driver collect that builds the matrix
# (posting rows <= cells).  Above the cap — the Zipf/large-vocabulary
# regime, where the prefix filter leaves FEW candidates — verification
# falls back to the self-balancing forward-index map join unchanged.
_DENSE_VERIFY_CELLS_CAP = 1 << 23

# Dense ALL-PAIRS gate (r19 optimization round, the r18 verdict-#3
# completion): when the rep matrix passes the dense-verify gate AND
# the full Gram product is cheap (n_reps² · n_terms multiply-adds
# under this cap ≈ one-to-two seconds of BLAS across the executor
# cores), the prefix/candidate machinery is SKIPPED OUTRIGHT — every
# qualifying rep pair comes straight out of block-wise exact Gram
# products against the broadcast matrix.  This is the regime where
# the r18 profile showed the bounds were nearly vacuous anyway (flat
# vocabulary → candidates ≈ all pairs: 38.7 M prefix⋈prefix rows into
# an 11.9 M-group aggregate at sf0.1, a 10.2 % prune), so enumerating
# match rows per shared term only to re-derive the same pair set is
# pure overhead.  Above either cap the published prefix-join path
# runs unchanged — exactly the regime (Zipf/large vocabulary, big
# corpora) where its bounds actually prune.
_DENSE_GRAM_FLOPS_CAP = 1 << 33


def _dense_all_pairs_gram(
    tf: DataFrame,
    threshold: float,
    a_col: str,
    b_col: str,
    bc_sink: "list | None" = None,
    rep_meta: "DataFrame | None" = None,
) -> "DataFrame | None":
    """Every qualifying rep pair straight from the dense tf matrix:
    block-wise exact Gram products distributed over the executors via
    ``mapInPandas`` against the same broadcast (ids, int64 matrix) the
    dense VERIFY arm uses — no prefix build, no candidate join, no
    per-pair aggregate.

    Exactness: each Gram block runs in float64 BLAS, and every value
    it accumulates is an integer bounded by max(‖tf‖²) — the helper
    returns None (caller falls back to the prefix machinery) unless
    max(‖tf‖²) < 2⁵³, so every partial sum is an exactly-representable
    integer and the block product equals the exact long dot.  The
    epilogue dot/(√nsq_a·√nsq_b) and the ≥-threshold filter are the
    same IEEE float64 ops the prefix path's verification performs, so
    the emitted cosines are bit-identical (pinned by the standing
    dense-vs-map differential and the brute-force threshold sweeps).

    ``rep_meta`` (incremental form): optional (id → side, fingerprint)
    rows for every rep; when given, only pairs involving a side-1
    (batch) rep and with UNEQUAL fingerprints are emitted — the same
    pair set the side-aware candidate join produces (same-fp pairs
    belong to the intra path) — and each pair is emitted with the
    batch rep in ``a_col``, matching the expansion join's contract.
    Without it, pairs are emitted once per unordered pair in matrix
    order; rep-level column order is irrelevant downstream because
    the expansion join covers every rep on both sides and normalizes
    MEMBER ids with least/greatest."""
    import numpy as np
    from pyspark.sql.types import DoubleType, StructField, StructType

    spark = tf.sparkSession
    pdf = tf.select("_id", "term", "_tf").toPandas()
    ids = pd.Index(pdf["_id"].unique())
    term_codes, term_uniques = pd.factorize(pdf["term"])
    n = len(ids)
    if n < 2:
        # zero or one rep: no pairs by construction
        return tf.sparkSession.createDataFrame(
            [], StructType(
                [
                    StructField(a_col, tf.schema["_id"].dataType),
                    StructField(b_col, tf.schema["_id"].dataType),
                    StructField("cosine", DoubleType()),
                ]
            )
        )
    mat = np.zeros((n, len(term_uniques)), dtype=np.int64)
    mat[ids.get_indexer(pdf["_id"]), term_codes] = pdf["_tf"].to_numpy(np.int64)
    nsq = np.einsum("ij,ij->i", mat, mat)
    if int(nsq.max()) >= (1 << 53):
        # float64 accumulation could round — fall back to the exact
        # long prefix machinery (pathological ‖tf‖² ≥ 2⁵³ corpora)
        return None
    side = fpc = None
    if rep_meta is not None:
        meta = rep_meta.toPandas().set_index("_id").reindex(ids)
        if meta["_side"].isna().any():
            raise RuntimeError(
                "dense gram pairs: rep metadata must cover every tf id"
            )
        side = meta["_side"].to_numpy(np.int64)
        fpc = pd.factorize(meta["_fp"])[0]
    bc = spark.sparkContext.broadcast((ids, mat, nsq, side, fpc))
    if bc_sink is not None:
        bc_sink.append(bc)
    t = float(threshold)
    block = max(64, (1 << 23) // n)  # bounds each block's Gram slab
    n_blocks = (n + block - 1) // block
    id_t = tf.schema["_id"].dataType
    schema = StructType(
        [
            StructField(a_col, id_t),
            StructField(b_col, id_t),
            StructField("cosine", DoubleType()),
        ]
    )

    def _gram(batches):
        b_ids, b_mat, b_nsq, b_side, b_fpc = bc.value
        matf = b_mat.astype(np.float64)
        sq = np.sqrt(b_nsq.astype(np.float64))
        nn = len(b_ids)
        for pdf_blk in batches:
            for blk in pdf_blk["id"].to_numpy():
                lo = int(blk) * block
                hi = min(nn, lo + block)
                if lo >= hi:
                    continue
                dots = matf[lo:hi] @ matf.T  # exact ints (gated < 2^53)
                cos = dots / (sq[lo:hi, None] * sq[None, :])
                keep = cos >= t
                # strict upper triangle in matrix order: each
                # unordered pair once, no self pairs
                cols = np.arange(nn)[None, :]
                rows = np.arange(lo, hi)[:, None]
                keep &= cols > rows
                if b_side is not None:
                    keep &= (b_side[lo:hi, None] == 1) | (b_side[None, :] == 1)
                    keep &= b_fpc[lo:hi, None] != b_fpc[None, :]
                ii, jj = np.nonzero(keep)
                if not len(ii):
                    continue
                ga = ids_a = b_ids.take(ii + lo)
                gb = b_ids.take(jj)
                if b_side is not None:
                    # batch rep first (the expansion join's contract)
                    swap = b_side[ii + lo] != 1
                    ga = np.where(swap, gb, ids_a)
                    gb = np.where(swap, ids_a, gb)
                yield pd.DataFrame(
                    {
                        a_col: ga,
                        b_col: gb,
                        "cosine": cos[ii, jj],
                    }
                )

    width = max(1, spark.sparkContext.defaultParallelism)
    blocks = spark.range(0, n_blocks, 1, min(n_blocks, width))
    return blocks.mapInPandas(_gram, schema)


def _verify_cosine_candidates(
    need: DataFrame,
    tf: DataFrame,
    threshold: float,
    a_col: str,
    b_col: str,
    cells_cap: "int | None" = None,
    bc_sink: "list | None" = None,
) -> DataFrame:
    """Exact verification for cosine prefix-join candidates — the ONE
    copy shared by ``cosine_prefix_pairs`` and
    ``cosine_prefix_new_pairs`` (their verify stages were identical
    modulo column names).

    ``need``: (a_col, b_col, _nsqa, _nsqb) candidate pairs still
    requiring the full dot.  ``tf``: (_id, term, _tf) exact term
    frequencies covering every id that can appear in ``need``.
    Output: (a_col, b_col, cosine) with cosine >= threshold.

    Two regimes, bit-identical results (pinned by test):

    - DENSE (guide §4.2 — vectorized native code per Arrow batch; §8 —
      ship ids, not payloads): when n_reps · n_terms <= ``cells_cap``
      the rep postings are collected once, laid out as a dense int64
      (rep × term) matrix, broadcast, and each Arrow batch of candidate
      id pairs is verified as two numpy row gathers + an int64
      einsum dot.  Integer adds are order-independent, so the dot is
      the SAME exact long the map path accumulates; the epilogue
      dot/(sqrt(nsqa)·sqrt(nsqb)) runs in numpy float64 — the same
      correctly-rounded IEEE ops the JVM expression performs, so the
      cosine is bit-identical.  No join, no shuffle: the UDF projects
      the persisted candidate partitions in place.  Profiled at sf0.1
      / t=0.9 (the flat-vocabulary worst case, 10.57 M candidates):
      19.8 s map path → ~2 s dense.
    - MAP (the r18 forward-index form, unchanged): per-doc term maps
      semi-joined to candidate docs, ``map_zip_with`` union dot —
      self-balancing for the Zipf/large-vocabulary regime where
      candidates are few and reps are many.

    The gate costs one tiny aggregate over the persisted ``tf``
    (countDistinct id/term + posting count + total term bytes); the
    collect that builds the matrix is bounded by the same cap
    (posting rows <= cells) AND — r19, the r18 advisory — by an
    estimate of the collected pandas payload in BYTES
    (Σ length(term) + 16 B/posting id+tf ≤ 8·cap, the same 64 MB
    budget the int64 matrix gets at the default cap): a small-doc
    huge-vocabulary corpus with long terms replicates each term
    string across its posting rows and could otherwise pull hundreds
    of MB into the driver despite a within-cap matrix.

    ``bc_sink``: optional list the dense arm appends its (ids, matrix)
    broadcast to, so the CALLER can destroy it once the result is
    eagerly materialized — without this every dedup call leaked one
    driver+executor broadcast for the life of the session (r18
    advisory, medium).
    """
    t = float(threshold)
    epilogue = lambda dot: dot / (F.sqrt("_nsqa") * F.sqrt("_nsqb"))  # noqa: E731
    cap = _DENSE_VERIFY_CELLS_CAP if cells_cap is None else int(cells_cap)
    if cap > 0:
        dims = tf.agg(
            F.countDistinct("_id").alias("_nd"),
            F.countDistinct("term").alias("_nt"),
            F.count(F.lit(1)).alias("_np"),
            F.sum(F.length("term")).alias("_tl"),
        ).first()
        n_docs, n_terms = int(dims["_nd"] or 0), int(dims["_nt"] or 0)
        est_bytes = int(dims["_tl"] or 0) + 16 * int(dims["_np"] or 0)
        if n_docs * n_terms <= cap and est_bytes <= 8 * cap:
            return _verify_cosine_dense(need, tf, t, a_col, b_col, bc_sink)
    tmap = tf.groupBy("_id").agg(
        F.map_from_entries(F.collect_list(F.struct("term", "_tf"))).alias("_m")
    )
    ma_ = tmap.select(F.col("_id").alias(a_col), F.col("_m").alias("_ma")).join(
        need.select(a_col), a_col, "left_semi"
    )
    mb_ = tmap.select(F.col("_id").alias(b_col), F.col("_m").alias("_mb")).join(
        need.select(b_col), b_col, "left_semi"
    )
    dot = F.aggregate(
        F.map_values(
            F.map_zip_with(
                "_ma",
                "_mb",
                lambda k, x, y: F.when(x.isNotNull() & y.isNotNull(), x * y),
            )
        ),
        F.lit(0).cast("long"),
        lambda acc, v: acc + F.coalesce(v, F.lit(0)),
    )
    return (
        need.select(a_col, b_col, "_nsqa", "_nsqb")
        .join(ma_, a_col)
        .join(mb_, b_col)
        .withColumn("cosine", epilogue(dot))
        .filter(F.col("cosine") >= t)
        .select(a_col, b_col, "cosine")
    )


def _verify_cosine_dense(
    need: DataFrame,
    tf: DataFrame,
    t: float,
    a_col: str,
    b_col: str,
    bc_sink: "list | None" = None,
) -> DataFrame:
    """Dense-matrix verification arm of ``_verify_cosine_candidates``
    (see there for the exactness argument and the ``bc_sink``
    lifetime contract)."""
    import numpy as np

    spark = tf.sparkSession
    pdf = tf.select("_id", "term", "_tf").toPandas()
    ids = pd.Index(pdf["_id"].unique())
    term_codes, term_uniques = pd.factorize(pdf["term"])
    mat = np.zeros((len(ids), len(term_uniques)), dtype=np.int64)
    mat[ids.get_indexer(pdf["_id"]), term_codes] = pdf["_tf"].to_numpy(np.int64)
    bc = spark.sparkContext.broadcast((ids, mat))
    if bc_sink is not None:
        bc_sink.append(bc)

    @F.pandas_udf("double")
    def _dense_cos(
        it: Iterator[Tuple[pd.Series, pd.Series, pd.Series, pd.Series]],
    ) -> Iterator[pd.Series]:
        b_ids, b_mat = bc.value  # once per task; batches share the lookup
        for a, b, nsqa, nsqb in it:
            ia = b_ids.get_indexer(a)
            ib = b_ids.get_indexer(b)
            if (ia < 0).any() or (ib < 0).any():
                raise RuntimeError(
                    "dense cosine verify: candidate id missing from the "
                    "tf matrix — the tf frame must cover every need id"
                )
            # exact int64 dot (order-independent), then the SAME IEEE
            # epilogue as the JVM expression: dot / (sqrt(na)·sqrt(nb))
            dots = np.einsum("ij,ij->i", b_mat[ia], b_mat[ib])
            cos = dots.astype(np.float64) / (
                np.sqrt(nsqa.to_numpy(np.float64))
                * np.sqrt(nsqb.to_numpy(np.float64))
            )
            yield pd.Series(cos)

    return (
        need.select(a_col, b_col, "_nsqa", "_nsqb")
        .withColumn("cosine", _dense_cos(a_col, b_col, "_nsqa", "_nsqb"))
        .filter(F.col("cosine") >= t)
        .select(a_col, b_col, "cosine")
    )


def exact_dup_groups(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Groups of byte-identical documents: fingerprint, dup_count, first id."""
    return (
        df.select(F.md5(F.col(text_col).cast("binary")).alias("fingerprint"), F.col(id_col))
        .groupBy("fingerprint")
        .agg(F.count(F.lit(1)).alias("dup_count"), F.min(id_col).alias("first_doc"))
        .filter(F.col("dup_count") > 1)
    )


def prefix_dup_groups(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", k: int = 5
) -> DataFrame:
    """Docs sharing their first ``k`` tokens — boilerplate-opening
    dedup (prefix fingerprint), the cheap screen for template/header
    duplicates that whole-document hashing misses when tails differ.
    One shuffle on the prefix; group sizes bounded by template reuse."""
    prefix = F.concat_ws(" ", F.slice(tokens(text_col), 1, k))
    return (
        df.select(prefix.alias("prefix"), F.col(id_col))
        .groupBy("prefix")
        .agg(F.count(F.lit(1)).alias("dup_count"), F.min(id_col).alias("first_doc"))
        .filter(F.col("dup_count") > 1)
    )


def _shingle_array(text_col: str, n: int):
    """Distinct word-``n``-gram shingle hashes of a document as an
    ``array<bigint>`` column expression.

    Shingle identity is a chained xxhash64 over the n TOKEN hashes:
    each token string is hashed once, then shingle keys combine those
    longs pairwise — no per-shingle string concatenation (measured
    ~20% faster index build than hash-of-joined-string at sf0.1) and
    the shuffle moves fixed-width longs instead of ~20-byte strings.
    Set semantics are preserved (64-bit collisions are negligible).

    Built from n shifted slices zipped together, NOT per-position
    element_at inside a transform lambda: Spark does no common-
    subexpression elimination inside lambda bodies, so the element_at
    form re-derives the token array for every shingle position
    (measured ~6x slower at 5k docs).  The slice form evaluates the
    token array O(n) times per document, independent of length."""
    toks = tokens(text_col)
    th = F.transform(toks, lambda t: F.xxhash64(t))
    m = F.size(th) - (n - 1)  # shingle count when size >= n
    parts = [F.slice(th, j + 1, m) for j in range(n)]
    acc = parts[0]
    for part in parts[1:]:
        acc = F.zip_with(acc, part, lambda a, b: F.xxhash64(a, b))
    sh = F.when(F.size(toks) >= n, acc).otherwise(
        F.array(F.xxhash64(F.concat_ws(" ", toks)))
    )
    return F.array_distinct(sh)


def _doc_shingles(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    """(id, shingle-hash) pairs, distinct within a doc (see
    ``_shingle_array`` for the shingle construction)."""
    return df.select(
        F.col(id_col).alias("_id"), F.explode(_shingle_array(text_col, n)).alias("shingle")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.2,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """Exact Jaccard over word n-gram shingle sets for all candidate
    pairs sharing ≥1 shingle.  Output: (doc_a, doc_b, jaccard) with
    doc_a < doc_b and jaccard ≥ threshold.

    Shape (round-4 rework, ~35% faster than the exploded-index
    persist + post-join size-joins shape at sf0.1):
    - persist the DOC-LEVEL frame (id, distinct-shingle array) — one
      row per doc, so the cache is set-size-bounded and every later
      step re-derives what it needs from it without re-tokenizing;
    - per-doc set size is ``size(array)`` — a projection, replacing
      the groupBy-on-id shuffle over the full index;
    - sizes ride THROUGH the self-join and come out of the pair
      aggregation (min(a._n)), replacing two post-join size joins;
    - the doc-freq cap list is aggregated once from the cached docs
      and collected: empty → no-op, small → ``array_except`` with a
      literal array in the same projection, giant (pathological
      boilerplate corpus) → distributed broadcast anti-join fallback.
    Remaining shuffles: hot-list agg, self-join on shingle (one
    exchange, reused for both sides), pair agg on (doc_a, doc_b) —
    the minimum for an inverted-index join.

    The pair list (output) is tiny relative to the index, so it is
    materialized eagerly (localCheckpoint truncates lineage off the
    cache) and the doc frame unpersisted before returning — no
    SQL-cache-manager entries outlive the call.  Note localCheckpoint's
    own caveats: (a) this builder eagerly runs Spark jobs at
    construction time, and (b) the checkpoint's RDD blocks live in
    executor storage until the result is GC'd and are non-recomputable
    on executor loss — fine at fixture scale; at corpus scale write
    the pair list to parquet instead (same pattern as the signature
    table note in ``minhash_lsh_candidates``)."""
    doc_cached = df.select(
        F.col(id_col).alias("_id"), _shingle_array(text_col, n).alias("_sh")
    ).persist()
    # NB: later steps derive new frames from doc_cached; unpersist must
    # target the ORIGINAL persisted frame (unpersisting a withColumn
    # derivative silently leaves the cache entry behind — the leak
    # test_dedup_operators_leave_no_cached_dataframes pins with a
    # capped corpus)
    try:
        ds = _capped_index(doc_cached, max_doc_freq)
        return _pairs_from_index(ds, threshold).localCheckpoint(eager=True)
    finally:
        doc_cached.unpersist()


def _capped_index(doc: DataFrame, max_doc_freq: int | None) -> DataFrame:
    """Exploded (_id, _n, shingle) candidate index from a (persisted)
    doc-level (_id, _sh) frame, with the hot-shingle doc-frequency cap
    applied — the ONE copy of this machinery, shared by
    ``ngram_jaccard_pairs`` and ``ngram_jaccard_histogram`` so the
    cap/fallback behavior cannot drift between them (r10 review).
    Small hot list → ``array_except`` with a literal array in the same
    projection; giant list (pathological boilerplate corpus) →
    distributed broadcast anti-join with sizes re-aggregated
    post-filter."""
    if max_doc_freq is not None:
        hot_rows = (
            doc.select(F.explode("_sh").alias("shingle"))
            .groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("_df"))
            .filter(F.col("_df") > max_doc_freq)
            .select("shingle")
            .limit(_HOT_LIST_EXPR_CAP + 1)
            .collect()
        )
        if len(hot_rows) > _HOT_LIST_EXPR_CAP:
            raw = doc.select("_id", F.explode("_sh").alias("shingle"))
            hot = (
                raw.groupBy("shingle")
                .agg(F.count(F.lit(1)).alias("_df"))
                .filter(F.col("_df") > max_doc_freq)
                .select("shingle")
            )
            capped = raw.join(F.broadcast(hot), "shingle", "left_anti")
            sizes = capped.groupBy("_id").agg(F.count(F.lit(1)).alias("_n"))
            return capped.join(sizes, "_id").select("_id", "_n", "shingle")
        if hot_rows:
            hot_lit = F.array(*[F.lit(int(r[0])) for r in hot_rows])
            doc = doc.withColumn("_sh", F.array_except("_sh", hot_lit))
    return doc.select(
        "_id", F.size("_sh").alias("_n"), F.explode("_sh").alias("shingle")
    )


def _pair_counts_from_index(ds: DataFrame) -> DataFrame:
    """(doc_a, doc_b, _inter, _na, _nb) from an exploded
    (_id, _n, shingle) index: inverted-index self-join, sizes carried
    through the pair aggregation (min is exact — every row of a pair
    sees the same per-doc sizes)."""
    a = ds.alias("a")
    b = ds.alias("b")
    return (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a._id") < F.col("b._id")))
        .groupBy(F.col("a._id").alias("doc_a"), F.col("b._id").alias("doc_b"))
        .agg(
            F.count(F.lit(1)).alias("_inter"),
            F.min("a._n").alias("_na"),
            F.min("b._n").alias("_nb"),
        )
    )


def _pairs_from_index(ds: DataFrame, threshold: float) -> DataFrame:
    """(doc_a, doc_b, jaccard) pairs at or above ``threshold``."""
    return (
        _pair_counts_from_index(ds)
        .withColumn("jaccard", F.col("_inter") / (F.col("_na") + F.col("_nb") - F.col("_inter")))
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def ngram_jaccard_histogram(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    max_doc_freq: int | None = None,
    bins: int = 10,
) -> DataFrame:
    """Jaccard distribution over ALL candidate pairs (≥1 shared
    shingle) — the calibration table consulted BEFORE choosing
    ``ngram_jaccard_pairs``' threshold: a bimodal histogram separates
    near-dups from incidental overlap; a fat middle says the
    threshold will be lossy either way.  Output: (bin, n_pairs) with
    ``bin = least(floor(bins·inter/union), bins−1)`` — the division's
    operands are exact integers, and a correctly-rounded double
    quotient with denominator ≤ set size cannot straddle an integer,
    so the bin (and hence the whole table) is engine-exact, unlike
    the raw jaccard doubles.  Shares ``_capped_index`` +
    ``_pair_counts_from_index`` with ``ngram_jaccard_pairs`` — same
    machinery, cost shape, AND giant-hot-list anti-join fallback."""
    doc_cached = df.select(
        F.col(id_col).alias("_id"), _shingle_array(text_col, n).alias("_sh")
    ).persist()
    try:
        pair = _pair_counts_from_index(_capped_index(doc_cached, max_doc_freq))
        union = F.col("_na") + F.col("_nb") - F.col("_inter")
        bin_col = F.least(
            F.floor(F.lit(bins) * F.col("_inter") / union), F.lit(bins - 1)
        ).cast("long")
        return (
            pair.select(bin_col.alias("bin"))
            .groupBy("bin")
            .agg(F.count(F.lit(1)).cast("long").alias("n_pairs"))
            .localCheckpoint(eager=True)
        )
    finally:
        doc_cached.unpersist()


def ngram_containment_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.9,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """Exact CONTAINMENT near-dup pairs: containment = |A∩B| /
    min(|A|,|B|) — the asymmetric metric that catches a small document
    embedded inside a large one (quotes, excerpts, chunk-of-page),
    which Jaccard structurally misses: a 100-shingle doc fully
    contained in a 10000-shingle doc has containment 1.0 but Jaccard
    ≈ 0.01 (Broder 1997 distinguishes resemblance from containment;
    this is the containment side).  Same inverted-index machinery,
    doc-frequency cap, and cost shape as ``ngram_jaccard_pairs``
    (shared ``_capped_index`` / ``_pair_counts_from_index``); output
    (doc_a, doc_b, containment) with doc_a < doc_b — int/int double
    division, oracle-exact."""
    doc_cached = df.select(
        F.col(id_col).alias("_id"), _shingle_array(text_col, n).alias("_sh")
    ).persist()
    try:
        pair = _pair_counts_from_index(_capped_index(doc_cached, max_doc_freq))
        out = (
            pair.withColumn(
                "containment", F.col("_inter") / F.least("_na", "_nb")
            )
            .filter(F.col("containment") >= threshold)
            .select("doc_a", "doc_b", "containment")
        )
        return out.localCheckpoint(eager=True)
    finally:
        doc_cached.unpersist()


def prefix_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """EXACT Jaccard-threshold set-similarity self-join via prefix
    filtering — same output contract as ``ngram_jaccard_pairs`` with
    NO doc-frequency cap: correct on boilerplate-heavy corpora where
    the cap changes semantics, at a cost that stays sub-quadratic
    because candidates come only from the globally RAREST slice of
    each document's shingle set.

    Published design (no reference-repo counterpart — the reference
    has no dedup at all): prefix filtering per Chaudhuri, Ganti,
    Kaushik (ICDE 2006) with the PPJoin length + positional filters
    (Xiao, Wang, Lin, Yu, WWW 2008) in the MapReduce layout of
    Vernica, Carey, Li (SIGMOD 2010) — token ordering by ascending
    global document frequency, so the inverted index is built over
    LOW-df shingles only and the hot-shingle skew that forces
    ``ngram_jaccard_pairs``' cap never reaches the join.

    Filter soundness with a float threshold: every bound below is
    rounded in the SAFE direction (floor where the exact bound is a
    ceiling), so prefixes are never too short and candidate filters
    never reject a qualifying pair — at worst one extra prefix token /
    a few extra candidates, all removed by exact verification.
      - prefix length  p = s − floor(t·s) + 1  ≥  s − ceil(t·s) + 1
        (the exact bound: a partner has ≥ ceil(t·s) shingles in
        common, all partners share a token inside p);
      - length filter  floor(t·max(sa,sb)) ≤ min(sa,sb)
        (exact: t·max ≤ min, since J ≤ min/max);
      - positional filter  1 + min(sa−pa, sb−pb) ≥ floor(α) with
        α = t/(1+t)·(sa+sb)  (exact overlap requirement: ceil(α);
        pa/pb are 1-based positions in the df-sorted full set, so
        everything after position p contributes at most s−p overlap).

    Cost shape at corpus scale: one vocabulary-sized doc-frequency
    aggregation, one (index ⋈ df) shuffle to rank shingles, one
    per-doc re-group (collect_list is doc-sized, bounded), a self-join
    over the PREFIX index (rare tokens only — the skew-proof join),
    then two pair-sized joins for exact ``array_intersect``
    verification.  More shuffles than the capped path, but every one
    is either vocabulary-bounded or candidate-bounded; this is the
    price of exactness without semantic caps.  Pinned equal to
    ``ngram_jaccard_pairs(max_doc_freq=None)`` and to a brute-force
    reference in tests."""
    doc_cached = df.select(
        F.col(id_col).alias("_id"), _shingle_array(text_col, n).alias("_sh")
    ).persist()
    try:
        exploded = doc_cached.select("_id", F.explode("_sh").alias("shingle"))
        dfreq = exploded.groupBy("shingle").agg(F.count(F.lit(1)).alias("_df"))
        # rank each doc's shingles rarest-first by (global df, hash) —
        # any consistent global order is correct; ascending df keeps
        # hot shingles OUT of prefixes (the skew-proofing).  Persisted:
        # pref self-joins as a/b, and without the cache the df-join +
        # per-doc sort lineage re-derives once per alias (r16 review;
        # the SCALING.md join-alias lesson) — unpersisted in the
        # nested finally, result is checkpointed before it runs
        ranked = (
            exploded.join(dfreq, "shingle")
            .groupBy("_id")
            .agg(
                F.count(F.lit(1)).alias("_s"),
                F.sort_array(
                    F.collect_list(F.struct(F.col("_df"), F.col("shingle")))
                ).alias("_ord"),
            )
            .persist()
        )
        t = float(threshold)
        plen = F.greatest(
            F.lit(1), F.col("_s") - F.floor(F.lit(t) * F.col("_s")).cast("int") + 1
        )
        pref = ranked.select(
            "_id",
            "_s",
            F.posexplode(F.slice(F.transform("_ord", lambda x: x["shingle"]), 1, plen)).alias(
                "_pos0", "shingle"
            ),
        ).select("_id", "_s", (F.col("_pos0") + 1).alias("_p"), "shingle")
        a, b = pref.alias("a"), pref.alias("b")
        alpha = F.lit(t / (1.0 + t)) * (F.col("a._s") + F.col("b._s"))
        cand = (
            a.join(
                b,
                (F.col("a.shingle") == F.col("b.shingle"))
                & (F.col("a._id") < F.col("b._id")),
            )
            .filter(
                (
                    F.floor(F.lit(t) * F.greatest("a._s", "b._s"))
                    <= F.least("a._s", "b._s")
                )
                & (
                    1
                    + F.least(
                        F.col("a._s") - F.col("a._p"), F.col("b._s") - F.col("b._p")
                    )
                    >= F.floor(alpha)
                )
            )
            .select(F.col("a._id").alias("doc_a"), F.col("b._id").alias("doc_b"))
            .distinct()
        )
        sa = doc_cached.select(F.col("_id").alias("doc_a"), F.col("_sh").alias("_sha"))
        sb = doc_cached.select(F.col("_id").alias("doc_b"), F.col("_sh").alias("_shb"))
        inter = F.size(F.array_intersect("_sha", "_shb"))
        out = (
            cand.join(sa, "doc_a")
            .join(sb, "doc_b")
            .select(
                "doc_a",
                "doc_b",
                (
                    inter
                    / (F.size("_sha") + F.size("_shb") - inter)
                ).alias("jaccard"),
            )
            .filter(F.col("jaccard") >= threshold)
        )
        try:
            return out.localCheckpoint(eager=True)
        finally:
            ranked.unpersist()
    finally:
        doc_cached.unpersist()


def tf_cosine_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """Exact WEIGHTED cosine-threshold all-pairs similarity join over
    term-frequency vectors — the frequency-aware member of the
    near-dup family (Bayardo, Ma, Srikant, "Scaling Up All Pairs
    Similarity Search", WWW 2007 is the published all-pairs shape;
    this is its inverted-index candidate layout on Spark).  Set-based
    Jaccard treats a term used once and fifty times identically;
    cosine over tf vectors catches rewrites that keep the WORD
    DISTRIBUTION (template fills, reorderings, paraphrase with shared
    vocabulary) and distinguishes docs that merely share vocabulary.

    Oracle-exactness with FLOAT output — why this is bit-exact when
    naive float similarity joins are not: every accumulation is
    INTEGER (dot = Σ tf_a·tf_b and the squared norms Σ tf² are exact
    longs in any summation order on both engines); the only float ops
    are two correctly-rounded sqrt's, one multiply, one divide — a
    fixed IEEE expression tree evaluated identically by Spark and
    DuckDB.  No dround anywhere.

    ``max_doc_freq`` is the same semantic cap as
    ``ngram_jaccard_pairs``: terms in more than the cap's docs are
    dropped from the VOCABULARY (norms and dots consistently — the
    metric becomes "cosine over non-boilerplate terms", which is also
    what you want: corpus-wide stopwords otherwise dominate tf mass
    and saturate similarities), and hot-term join skew never reaches
    the candidate join.  Output (doc_a, doc_b, cosine) with
    doc_a < doc_b and cosine ≥ threshold.

    ``threshold`` must be > 0: candidates are generated only from
    pairs SHARING a surviving term, so zero-cosine pairs (no common
    vocabulary, or docs emptied by the ``max_doc_freq`` cap) are
    structurally unreachable — a threshold ≤ 0 would silently drop
    qualifying pairs instead of returning them (r16 ADVICE), so it
    raises, mirroring the k ≥ 1 / max_dist ≥ 0 guards elsewhere in
    this module."""
    if not float(threshold) > 0.0:
        raise ValueError(
            "tf_cosine_pairs: threshold must be > 0 — zero-cosine pairs "
            "share no term and can never be generated by the term join"
        )
    tf_all = (
        df.select(F.col(id_col).alias("_id"), F.explode(tokens(text_col)).alias("term"))
        .groupBy("_id", "term")
        .agg(F.count(F.lit(1)).alias("_tf"))
        .persist()
    )
    try:
        if max_doc_freq is not None:
            hot = (
                tf_all.groupBy("term")
                .agg(F.count(F.lit(1)).alias("_df"))
                .filter(F.col("_df") > max_doc_freq)
                .select("term")
            )
            tf = tf_all.join(F.broadcast(hot), "term", "left_anti")
        else:
            tf = tf_all
        norms = tf.groupBy("_id").agg(
            F.sum(F.col("_tf") * F.col("_tf")).alias("_nsq")
        )
        withn = tf.join(norms, "_id")
        a, b = withn.alias("a"), withn.alias("b")
        dots = (
            a.join(
                b,
                (F.col("a.term") == F.col("b.term"))
                & (F.col("a._id") < F.col("b._id")),
            )
            .groupBy(
                F.col("a._id").alias("doc_a"), F.col("b._id").alias("doc_b")
            )
            .agg(
                F.sum(F.col("a._tf") * F.col("b._tf")).alias("_dot"),
                F.min("a._nsq").alias("_nsqa"),
                F.min("b._nsq").alias("_nsqb"),
            )
        )
        cos = F.col("_dot") / (F.sqrt("_nsqa") * F.sqrt("_nsqb"))
        out = (
            dots.withColumn("cosine", cos)
            .filter(F.col("cosine") >= threshold)
            .select("doc_a", "doc_b", "cosine")
        )
        return out.localCheckpoint(eager=True)
    finally:
        tf_all.unpersist()


def prefix_containment_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.9,
) -> DataFrame:
    """EXACT containment-threshold set-similarity self-join via prefix
    filtering — same output contract as ``ngram_containment_pairs``
    with NO doc-frequency cap: exact excerpt/quote detection on
    boilerplate-heavy corpora where the cap changes semantics (a
    template shingle above the cap can BE the excerpt's evidence).

    Published design: the prefix filter of Chaudhuri, Ganti, Kaushik
    (ICDE 2006) adapted to the OVERLAP-threshold form of Vernica,
    Carey, Li (SIGMOD 2010 §3.4's generalization), with tokens ranked
    by ascending global document frequency.  Containment
    |A∩B|/min(|A|,|B|) ≥ t fixes the required overlap from the SMALLER
    set alone: o = ceil(t·s_small).  That asymmetry shapes the join:

      - SMALL role (the indexed side): every doc emits its prefix of
        length s − floor(t·s) + 1 over its df-sorted shingles — the
        prefix lemma (the globally rarest element of A∩B lies within
        it when |A∩B| ≥ ceil(t·s_small), since all of A∩B sits at or
        after its position).
      - LARGE role (the probe side): every doc emits its FULL
        df-ranked postings.  No shorter probe side is sound: a
        1-shingle doc contained in a huge one can match on ANY of the
        huge doc's shingles, so the large side has no prefix bound —
        this is containment's structural extra cost over Jaccard.
      - Role assignment (a.s, a.id) < (b.s, b.id) lexicographically:
        each unordered pair is generated exactly once, with the
        smaller set always on the prefix side (equal sizes: either
        role is sound, the id picks one).

    Skew safety WITHOUT the cap: a hot (high-df) shingle sorts LAST,
    so it enters small-side prefixes only for docs that consist almost
    entirely of hot shingles; the per-shingle candidate count is
    (prefix postings) × (full postings), and the first factor stays
    tiny exactly where the second explodes.

    Positional filter (pair-wise sound, applied per matching row then
    OR-ed by the candidate ``distinct``): a match at 1-based df-rank
    positions (pa, pb) caps the remaining overlap at
    1 + min(s_a − pa, s_b − pb), which must reach the requirement.
    Float bounds round LOSSLESS-ward per the repo convention: the
    exact requirement ceil(t·s_small) is relaxed to floor(t·s_small)
    (never the reverse), and the prefix uses s − floor(t·s) + 1 ≥ the
    exact s − ceil(t·s) + 1 — filters may pass a few extra candidates,
    all removed by exact ``array_intersect`` verification, and can
    never drop a qualifying pair at a 1-ulp boundary.

    Output (doc_a, doc_b, containment) with doc_a < doc_b by id —
    int/int double division, oracle-exact.  Pinned equal to
    ``ngram_containment_pairs(max_doc_freq=None)``, to brute force
    across a threshold sweep, and shown to DIFFER from the capped path
    on a boilerplate corpus in tests."""
    doc_cached = df.select(
        F.col(id_col).alias("_id"), _shingle_array(text_col, n).alias("_sh")
    ).persist()
    try:
        exploded = doc_cached.select("_id", F.explode("_sh").alias("shingle"))
        dfreq = exploded.groupBy("shingle").agg(F.count(F.lit(1)).alias("_df"))
        # ranked (the expensive df-join + per-doc sort) feeds BOTH join
        # roles (pref and full) — persist so the ranking runs once, not
        # once per alias (the SCALING.md join-alias lesson)
        ranked = (
            exploded.join(dfreq, "shingle")
            .groupBy("_id")
            .agg(
                F.count(F.lit(1)).alias("_s"),
                F.sort_array(
                    F.collect_list(F.struct(F.col("_df"), F.col("shingle")))
                ).alias("_ord"),
            )
            .persist()
        )
        try:
            t = float(threshold)
            # small-role prefix: s - floor(t*s) + 1 (>= the exact
            # s - ceil(t*s) + 1 — at worst one token too long, never short)
            plen = F.greatest(
                F.lit(1), F.col("_s") - F.floor(F.lit(t) * F.col("_s")).cast("int") + 1
            )
            shingles_ranked = F.transform("_ord", lambda x: x["shingle"])
            pref = ranked.select(
                "_id",
                "_s",
                F.posexplode(F.slice(shingles_ranked, 1, plen)).alias("_pos0", "shingle"),
            ).select("_id", "_s", (F.col("_pos0") + 1).alias("_p"), "shingle")
            full = ranked.select(
                "_id",
                "_s",
                F.posexplode(shingles_ranked).alias("_pos0", "shingle"),
            ).select("_id", "_s", (F.col("_pos0") + 1).alias("_p"), "shingle")
            a, b = pref.alias("a"), full.alias("b")
            # required overlap comes from the SMALL side (a) alone,
            # floor-relaxed losslessly
            required = F.floor(F.lit(t) * F.col("a._s"))
            cand = (
                a.join(
                    b,
                    (F.col("a.shingle") == F.col("b.shingle"))
                    & (
                        (F.col("a._s") < F.col("b._s"))
                        | (
                            (F.col("a._s") == F.col("b._s"))
                            & (F.col("a._id") < F.col("b._id"))
                        )
                    ),
                )
                .filter(
                    1
                    + F.least(
                        F.col("a._s") - F.col("a._p"), F.col("b._s") - F.col("b._p")
                    )
                    >= required
                )
                .select(F.col("a._id").alias("_id_sm"), F.col("b._id").alias("_id_lg"))
                .distinct()
            )
            sa = doc_cached.select(F.col("_id").alias("_id_sm"), F.col("_sh").alias("_sha"))
            sb = doc_cached.select(F.col("_id").alias("_id_lg"), F.col("_sh").alias("_shb"))
            inter = F.size(F.array_intersect("_sha", "_shb"))
            out = (
                cand.join(sa, "_id_sm")
                .join(sb, "_id_lg")
                .select(
                    F.least("_id_sm", "_id_lg").alias("doc_a"),
                    F.greatest("_id_sm", "_id_lg").alias("doc_b"),
                    (inter / F.least(F.size("_sha"), F.size("_shb"))).alias(
                        "containment"
                    ),
                )
                .filter(F.col("containment") >= threshold)
            )
            return out.localCheckpoint(eager=True)
        finally:
            ranked.unpersist()
    finally:
        doc_cached.unpersist()


def _ranked_by_df(docs: DataFrame, dfreq: DataFrame) -> DataFrame:
    """Per-doc shingle list ranked by a GIVEN global document-frequency
    order (ascending df, ties by shingle; shingles absent from
    ``dfreq`` rank rarest at df 0) — the shared scaffolding of the
    incremental prefix-filtered joins, where the order must come from
    the CORPUS so the persisted corpus-side index stays valid for any
    future batch.  Output: (_id, _s, _ord) with _ord the df-sorted
    shingle structs.  Soundness does not depend on WHICH consistent
    global order is used (the prefix lemma only needs one shared
    order), so corpus-df ranking is exactly as correct as
    union-df ranking — pinned by the differential tests."""
    exploded = docs.select("_id", F.explode("_sh").alias("shingle"))
    return (
        exploded.join(dfreq, "shingle", "left")
        .select(
            "_id", "shingle", F.coalesce(F.col("_df"), F.lit(0)).alias("_df")
        )
        .groupBy("_id")
        .agg(
            F.count(F.lit(1)).alias("_s"),
            F.sort_array(
                F.collect_list(F.struct(F.col("_df"), F.col("shingle")))
            ).alias("_ord"),
        )
    )


def _positions(ranked: DataFrame, prefix_expr=None) -> DataFrame:
    """Posexplode a ranked doc's shingles (full list, or its prefix
    when ``prefix_expr`` gives the per-doc prefix length) into
    (_id, _s, _p, shingle) with 1-based df-rank positions."""
    shingles = F.transform("_ord", lambda x: x["shingle"])
    arr = F.slice(shingles, 1, prefix_expr) if prefix_expr is not None else shingles
    return ranked.select(
        "_id", "_s", F.posexplode(arr).alias("_pos0", "shingle")
    ).select("_id", "_s", (F.col("_pos0") + 1).alias("_p"), "shingle")


def prefix_jaccard_new_pairs(
    corpus: DataFrame,
    new_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Incremental EXACT Jaccard join (r16 verdict directive #8): all
    pairs at Jaccard ≥ ``threshold`` that INVOLVE a new-batch doc —
    (new × corpus) ∪ (new × new) — without recomputing the corpus
    self-join.  The shape a growing corpus actually needs: the
    corpus-side prefix index is derived once (at 100 TB, persist it
    per corpus version like ``dedup_new_against_corpus``'s artifacts)
    and each batch probes it with the batch's own prefixes.

    Same filters and verification as ``prefix_jaccard_pairs`` (prefix
    lemma + PPJoin length/positional filters, lossless-ward float
    bounds, exact ``array_intersect`` verification); the ONE
    difference is the global shingle order, which ranks by CORPUS
    document frequency (absent shingles rank rarest at df 0) so the
    corpus index never needs re-ranking when a batch arrives.  The
    prefix lemma is sound under ANY one consistent order, so the
    output is bit-equal to running the full self-join over
    corpus ∪ batch and keeping pairs with a batch id — pinned in
    tests.  Corpus-corpus pairs are structurally absent (no
    corpus × corpus join exists in the plan).  Ids must be disjoint
    across the two frames (raises otherwise — an id on both sides
    would make pair identity ambiguous).  ``threshold`` must be > 0:
    candidates come only from pairs sharing a shingle, so
    zero-overlap pairs are structurally unreachable and a threshold
    ≤ 0 would silently drop them (the tf_cosine_pairs guard's
    reason, applied family-wide — r17 review)."""
    if not float(threshold) > 0.0:
        raise ValueError(
            "prefix_jaccard_new_pairs: threshold must be > 0 — "
            "zero-overlap pairs share no shingle and can never be "
            "generated by the prefix join"
        )
    overlap = corpus.select(F.col(id_col)).join(
        new_docs.select(F.col(id_col)), id_col, "left_semi"
    )
    if overlap.limit(1).count():
        raise ValueError(
            "prefix_jaccard_new_pairs: corpus and new_docs share ids — "
            "pair identity would be ambiguous; re-id the batch"
        )
    t = float(threshold)
    doc_c = corpus.select(
        F.col(id_col).alias("_id"), _shingle_array(text_col, n).alias("_sh")
    ).persist()
    doc_n = new_docs.select(
        F.col(id_col).alias("_id"), _shingle_array(text_col, n).alias("_sh")
    ).persist()
    try:
        dfreq = (
            doc_c.select(F.explode("_sh").alias("shingle"))
            .groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("_df"))
        )
        ranked_c = _ranked_by_df(doc_c, dfreq).persist()
        ranked_n = _ranked_by_df(doc_n, dfreq).persist()
        try:
            plen = F.greatest(
                F.lit(1),
                F.col("_s") - F.floor(F.lit(t) * F.col("_s")).cast("int") + 1,
            )
            pref_c = _positions(ranked_c, plen)
            pref_n = _positions(ranked_n, plen)
            alpha = F.lit(t / (1.0 + t)) * (F.col("a._s") + F.col("b._s"))
            filters = (
                (
                    F.floor(F.lit(t) * F.greatest("a._s", "b._s"))
                    <= F.least("a._s", "b._s")
                )
                & (
                    1
                    + F.least(
                        F.col("a._s") - F.col("a._p"), F.col("b._s") - F.col("b._p")
                    )
                    >= F.floor(alpha)
                )
            )
            nc = (
                pref_n.alias("a")
                .join(pref_c.alias("b"), F.col("a.shingle") == F.col("b.shingle"))
                .filter(filters)
                .select(F.col("a._id").alias("_ida"), F.col("b._id").alias("_idb"))
            )
            nn = (
                pref_n.alias("a")
                .join(
                    pref_n.alias("b"),
                    (F.col("a.shingle") == F.col("b.shingle"))
                    & (F.col("a._id") < F.col("b._id")),
                )
                .filter(filters)
                .select(F.col("a._id").alias("_ida"), F.col("b._id").alias("_idb"))
            )
            cand = nc.unionByName(nn).distinct()
            both = doc_c.unionByName(doc_n)
            sa = both.select(F.col("_id").alias("_ida"), F.col("_sh").alias("_sha"))
            sb = both.select(F.col("_id").alias("_idb"), F.col("_sh").alias("_shb"))
            inter = F.size(F.array_intersect("_sha", "_shb"))
            out = (
                cand.join(sa, "_ida")
                .join(sb, "_idb")
                .select(
                    F.least("_ida", "_idb").alias("doc_a"),
                    F.greatest("_ida", "_idb").alias("doc_b"),
                    (
                        inter / (F.size("_sha") + F.size("_shb") - inter)
                    ).alias("jaccard"),
                )
                .filter(F.col("jaccard") >= threshold)
            )
            return out.localCheckpoint(eager=True)
        finally:
            ranked_c.unpersist()
            ranked_n.unpersist()
    finally:
        doc_c.unpersist()
        doc_n.unpersist()


def prefix_containment_new_pairs(
    corpus: DataFrame,
    new_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.9,
) -> DataFrame:
    """Incremental EXACT containment join (r16 verdict directive #8):
    all pairs at containment ≥ ``threshold`` that involve a new-batch
    doc, without the corpus self-join.  The asymmetric roles of
    ``prefix_containment_pairs`` (the pair's SMALLER set is the
    indexed-prefix side, the larger probes with full postings) cross
    the batch boundary freely — a new excerpt can sit inside an old
    page and vice versa — so candidates come from THREE joins:
    new-prefix × corpus-full, corpus-prefix × new-full, and
    new-prefix × new-full, each under the lexicographic (size, id)
    role condition that generates every unordered pair exactly once.
    Corpus-corpus pairs are structurally absent.  Shingles rank by
    CORPUS document frequency (the persistable index order — see
    ``prefix_jaccard_new_pairs``); exactness is order-invariant,
    pinned equal to the full ``prefix_containment_pairs`` over
    corpus ∪ batch restricted to batch-involving pairs.
    ``threshold`` must be > 0 (zero-overlap pairs are structurally
    unreachable — the family guard)."""
    if not float(threshold) > 0.0:
        raise ValueError(
            "prefix_containment_new_pairs: threshold must be > 0 — "
            "zero-overlap pairs share no shingle and can never be "
            "generated by the prefix join"
        )
    overlap = corpus.select(F.col(id_col)).join(
        new_docs.select(F.col(id_col)), id_col, "left_semi"
    )
    if overlap.limit(1).count():
        raise ValueError(
            "prefix_containment_new_pairs: corpus and new_docs share ids — "
            "pair identity would be ambiguous; re-id the batch"
        )
    t = float(threshold)
    doc_c = corpus.select(
        F.col(id_col).alias("_id"), _shingle_array(text_col, n).alias("_sh")
    ).persist()
    doc_n = new_docs.select(
        F.col(id_col).alias("_id"), _shingle_array(text_col, n).alias("_sh")
    ).persist()
    try:
        dfreq = (
            doc_c.select(F.explode("_sh").alias("shingle"))
            .groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("_df"))
        )
        ranked_c = _ranked_by_df(doc_c, dfreq).persist()
        ranked_n = _ranked_by_df(doc_n, dfreq).persist()
        try:
            plen = F.greatest(
                F.lit(1),
                F.col("_s") - F.floor(F.lit(t) * F.col("_s")).cast("int") + 1,
            )
            pref_c, pref_n = _positions(ranked_c, plen), _positions(ranked_n, plen)
            full_c, full_n = _positions(ranked_c), _positions(ranked_n)
            role = (F.col("a._s") < F.col("b._s")) | (
                (F.col("a._s") == F.col("b._s")) & (F.col("a._id") < F.col("b._id"))
            )
            required = F.floor(F.lit(t) * F.col("a._s"))
            posf = (
                1
                + F.least(
                    F.col("a._s") - F.col("a._p"), F.col("b._s") - F.col("b._p")
                )
                >= required
            )

            def cands(pref, full):
                return (
                    pref.alias("a")
                    .join(
                        full.alias("b"),
                        (F.col("a.shingle") == F.col("b.shingle")) & role,
                    )
                    .filter(posf)
                    .select(
                        F.col("a._id").alias("_id_sm"), F.col("b._id").alias("_id_lg")
                    )
                )

            cand = (
                cands(pref_n, full_c)
                .unionByName(cands(pref_c, full_n))
                .unionByName(cands(pref_n, full_n))
                .distinct()
            )
            both = doc_c.unionByName(doc_n)
            sa = both.select(F.col("_id").alias("_id_sm"), F.col("_sh").alias("_sha"))
            sb = both.select(F.col("_id").alias("_id_lg"), F.col("_sh").alias("_shb"))
            inter = F.size(F.array_intersect("_sha", "_shb"))
            out = (
                cand.join(sa, "_id_sm")
                .join(sb, "_id_lg")
                .select(
                    F.least("_id_sm", "_id_lg").alias("doc_a"),
                    F.greatest("_id_sm", "_id_lg").alias("doc_b"),
                    (inter / F.least(F.size("_sha"), F.size("_shb"))).alias(
                        "containment"
                    ),
                )
                .filter(F.col("containment") >= threshold)
            )
            return out.localCheckpoint(eager=True)
        finally:
            ranked_c.unpersist()
            ranked_n.unpersist()
    finally:
        doc_c.unpersist()
        doc_n.unpersist()


def cosine_prefix_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
    dense_verify_cells_cap: "int | None" = None,
) -> DataFrame:
    """EXACT weighted-cosine all-pairs similarity join with NO
    vocabulary cap (r16 verdict directive #2) — same output contract
    as ``tf_cosine_pairs(max_doc_freq=None)`` at a cost that stays
    candidate-bounded, because candidates come only from each vector's
    PREFIX under the Bayardo bound instead of every shared term.
    ``tf_cosine_pairs`` uncapped self-joins every corpus-wide
    stopword's full posting list (the quadratic the Jaccard and
    containment family members already solved with prefix filters);
    this is the published answer for the weighted metric: Bayardo, Ma,
    Srikant, "Scaling Up All Pairs Similarity Search", WWW 2007 —
    index each vector's minimal prefix such that the SUFFIX's maximum
    possible contribution to any cosine stays below the threshold.

    Soundness (symmetric prefix form): terms are ranked by one global
    order (ascending document frequency, ties by term — rarest first,
    the family convention).  For the normalized vector x̂ = tf/‖tf‖
    and a suffix S (everything after the prefix), TWO sound upper
    bounds on S's possible contribution to any cos(x, y):

      - Cauchy–Schwarz:  Σ_{i∈S} x̂_i·ŷ_i ≤ ‖x̂_S‖·‖ŷ‖ = ‖x̂_S‖
        = sqrt(tail_sq / nsq)  with integer tail_sq = Σ_{i∈S} tf_i²;
      - Bayardo's b(x):  Σ_{i∈S} x̂_i·ŷ_i ≤ Σ_{i∈S} x̂_i·maxw(i)
        where maxw(i) = max over the corpus of ŷ_i (one
        vocabulary-sized aggregate).

    If EITHER bound is < t, no qualifying pair can meet only in S.
    Both bounds decrease along the order, so the kept positions are a
    contiguous head (a true prefix).  Let i* be the globally-first
    SHARED term of a qualifying pair (x, y): if i* were outside x's
    prefix, every shared term would sit in x's suffix and cos(x, y)
    would be under a failing bound — contradiction; symmetrically for
    y.  So every qualifying pair collides inside prefix ⋈ prefix.

    Positional filter (pair-wise sound, OR-ed by the candidate
    ``distinct``): at the first shared term's 1-based positions
    (pa, pb), all shared terms lie in both tails, so
    cos ≤ sqrt(tail_a/nsq_a)·sqrt(tail_b/nsq_b), i.e. candidates need
    tail_a·tail_b ≥ t²·nsq_a·nsq_b.

    Float-bound convention (the lossless-ward rounding rule, adapted):
    the integer-vs-float comparisons here multiply two longs whose
    product can pass 2⁵³, where the repo's floor() trick loses integer
    precision — so instead every exclusion threshold is relaxed
    multiplicatively: a position/candidate is dropped only when its
    bound < t·(1 − 1e-9) (respectively t²·(1 − 1e-9)).  Double
    arithmetic is correct to ~2⁻⁵³ ≈ 1e-16 relative, so a true
    ≥-threshold value can never appear below the relaxed cutoff; at
    worst a few extra candidates survive to exact verification.

    Verification is the family's integer path: Σ tf_a·tf_b and the
    squared norms are exact longs, the only float ops are two
    correctly-rounded sqrts, one multiply, one divide — bit-exact vs
    the oracle, no rounding.  Output (doc_a, doc_b, cosine) with
    doc_a < doc_b and cosine ≥ threshold.  Pinned equal to
    ``tf_cosine_pairs(max_doc_freq=None)`` and brute force across a
    threshold sweep, and shown to differ from the capped path on a
    stopword-heavy corpus, in tests.

    Verification (r17 verdict #2 — the stage that dominated at 28.3 s
    per the r17 bench decomposition, ~199 M shared-term join rows on
    the sf0.1 fixture's 31-term vocabulary): three L2AP-derived pieces
    (Anastasiu & Karypis, "L2AP: fast cosine similarity search with
    prefix L-2 norm bounds", ICDE 2014 — the candidate-time
    partial-dot + suffix-norm machinery, restated for a declarative
    engine where per-pair early termination can't exist but per-pair
    BOUNDS can):

    1. Candidate generation GROUP-BYs the prefix⋈prefix matches
       (replacing a distinct), accumulating per pair the exact-long
       partial dot ``pdot`` over shared prefix terms plus the tails
       strictly after the LAST shared prefix term.  Every shared term
       not in ``pdot`` has global rank > min(prefix boundaries) ≥ the
       last match's rank, so it lives in both tails-after and
       Cauchy–Schwarz caps its total contribution by
       sqrt(ta_after·tb_after); a pair with pdot +
       sqrt(ta_after·tb_after) < t·(1−1e-9)·‖a‖·‖b‖ can never qualify.
       All statistics are SEPARABLE scalar aggregates (tails decrease
       along the order on both sides, so first-match products are
       max() and last-match tails are per-side min()s that co-occur).
    2. Exact-complete split: both tails-after ZERO (integer compare)
       means no uncounted term exists — pdot IS the dot and the pair
       skips verification (fires for short docs whose prefix is the
       whole vector).
    3. Survivors verify against per-doc term MAPS zipped in-row
       (L2AP's forward file restated: ``map_zip_with`` unions keys
       hash-based, O(|a|+|b|) per pair) — same exact-long dot, no
       199 M-row explode.  The map table is semi-joined to candidate
       docs first, which keeps the join self-balancing: flat
       vocabulary → many candidates but vocabulary-bounded maps and a
       tiny doc table (2.5 MB at sf0.1 — AQE broadcasts it, no
       shuffle ever carries a map); Zipf vocabulary → few candidates
       shrink the map table to the docs they touch.

    Measured on the sf0.1 fixture (SCALING.md r18 entry): the corpus
    is adversarial for EVERY published candidate bound — 31 distinct
    terms make candidates ≈ all pairs (11.89 M of 12.46 M possible;
    the positional filter passes 11.77 M, +L2AP passes 10.57 M — a
    10.2% prune where the L2AP paper's Zipfian corpora see orders of
    magnitude) — so the win here came from the verification rewrite:
    33.1 s → 21.8 s warm same-box (0.66×; identical 1777 output rows
    — the full stash-A/B is recorded in the SCALING.md r18 entry).
    On Zipfian vocabularies the same bounds prune sharply (the
    threshold-sweep tests include a Zipf corpus).

    Identity collapse (the r17 10× sweep's catch — clone-heavy corpora
    OOM'd the candidate join the same way the edit join's hot-gram
    postings did in r16): docs with IDENTICAL tf vectors (exact dups
    and count-preserving reorderings — exactly what near-dup corpora
    are full of) are collapsed to one representative per vector
    fingerprint before the join, and pairs are expanded afterward.
    Exact by construction: equal vectors share every dot/norm, so
    every expanded pair's cosine is the SAME IEEE expression the
    direct join would produce — intra-group pairs get
    nsq/(sqrt(nsq)·sqrt(nsq)) (NOT a literal 1.0: at t = 1.0 that
    expression can round a hair below one, and the oracle computes the
    identical expression, so both engines keep or drop the pair
    together), cross pairs reuse the representative pair's value
    verbatim.  A g-clone group costs g² expansion rows instead of
    inflating every posting list and verification join by g."""
    if not 0.0 < float(threshold) <= 1.0:
        raise ValueError(
            "cosine_prefix_pairs: threshold must be in (0, 1] — the "
            "prefix bound is vacuous at t <= 0 and cosine never exceeds 1"
        )
    from pyspark.sql import Window

    t = float(threshold)
    t_relaxed = t * (1.0 - 1e-9)
    tsq_relaxed = t * t * (1.0 - 1e-9)
    tf_all = (
        df.select(F.col(id_col).alias("_id"), F.explode(tokens(text_col)).alias("term"))
        .groupBy("_id", "term")
        .agg(F.count(F.lit(1)).alias("_tf"))
        .persist()
    )
    # identity collapse: one representative per exact tf-vector
    # fingerprint (md5 over the sorted (term, tf) structs — 128-bit,
    # JSON-encoded so no delimiter can collide)
    vecfp = tf_all.groupBy("_id").agg(
        F.md5(
            F.to_json(F.sort_array(F.collect_list(F.struct("term", "_tf"))))
        ).alias("_fp"),
        F.sum(F.col("_tf") * F.col("_tf")).alias("_vnsq"),
    )
    groups = vecfp.groupBy("_fp").agg(
        F.min("_id").alias("_rep"),
        F.count(F.lit(1)).alias("_g"),
        F.min("_vnsq").alias("_gnsq"),
    )
    members = (
        vecfp.join(groups.select("_fp", "_rep"), "_fp")
        .select("_id", "_rep")
        .persist()
    )
    tf = tf_all.join(
        members.filter(F.col("_id") == F.col("_rep")).select("_id"),
        "_id",
        "left_semi",
    ).persist()
    try:
        bc_sink: list = []

        def _expand(rep_pairs: DataFrame) -> DataFrame:
            # expansion: every member pair across two matched rep
            # groups carries the representatives' cosine verbatim...
            ma = members.select(
                F.col("_rep").alias("doc_a"), F.col("_id").alias("_ida")
            )
            mb = members.select(
                F.col("_rep").alias("doc_b"), F.col("_id").alias("_idb")
            )
            cross = (
                rep_pairs.join(ma, "doc_a")
                .join(mb, "doc_b")
                .select(
                    F.least("_ida", "_idb").alias("doc_a"),
                    F.greatest("_ida", "_idb").alias("doc_b"),
                    "cosine",
                )
            )
            # ...and intra-group pairs get the identical-vector
            # expression nsq/(sqrt(nsq)·sqrt(nsq)) under the same
            # threshold filter the oracle applies
            g2 = groups.filter(F.col("_g") >= 2).select("_rep", "_gnsq")
            i1 = members.join(g2, "_rep").select(
                "_rep", F.col("_id").alias("_ida"), "_gnsq"
            )
            i2 = members.select("_rep", F.col("_id").alias("_idb"))
            intra = (
                i1.join(i2, "_rep")
                .filter(F.col("_ida") < F.col("_idb"))
                .withColumn(
                    "cosine",
                    F.col("_gnsq") / (F.sqrt("_gnsq") * F.sqrt("_gnsq")),
                )
                .filter(F.col("cosine") >= threshold)
                .select(
                    F.col("_ida").alias("doc_a"),
                    F.col("_idb").alias("doc_b"),
                    "cosine",
                )
            )
            # localCheckpoint is EAGER, so every cache/broadcast the
            # lineage needed is safe to drop once this returns
            return cross.unionByName(intra).localCheckpoint(eager=True)

        # Dense ALL-PAIRS regime (r19 — see _DENSE_GRAM_FLOPS_CAP):
        # when the collapsed reps' tf matrix passes the dense gate AND
        # the full Gram product is cheap, every qualifying rep pair
        # comes straight from block-wise exact Gram products and the
        # prefix/candidate machinery below never runs.  Same gate
        # aggregate the dense VERIFY arm costs; one extra integer
        # comparison buys skipping the 38.7 M-row candidate join in
        # the flat-vocabulary regime where its bounds prune ~10%.
        cap = (
            _DENSE_VERIFY_CELLS_CAP
            if dense_verify_cells_cap is None
            else int(dense_verify_cells_cap)
        )
        if cap > 0:
            dims = tf.agg(
                F.countDistinct("_id").alias("_nd"),
                F.countDistinct("term").alias("_nt"),
                F.count(F.lit(1)).alias("_np"),
                F.sum(F.length("term")).alias("_tl"),
            ).first()
            n_docs, n_terms = int(dims["_nd"] or 0), int(dims["_nt"] or 0)
            est_bytes = int(dims["_tl"] or 0) + 16 * int(dims["_np"] or 0)
            if (
                n_docs * n_terms <= cap
                and est_bytes <= 8 * cap
                and n_docs * n_docs * n_terms <= _DENSE_GRAM_FLOPS_CAP
            ):
                gram = _dense_all_pairs_gram(
                    tf, threshold, "doc_a", "doc_b", bc_sink
                )
                if gram is not None:
                    try:
                        return _expand(gram)
                    finally:
                        for _bc in bc_sink:
                            _bc.destroy()
        norms = tf.groupBy("_id").agg(F.sum(F.col("_tf") * F.col("_tf")).alias("_nsq"))
        withn = tf.join(norms, "_id")
        # vocabulary-sized aggregates: document frequency (the global
        # rank) and Bayardo's maxweight maxw(i) = max_y ŷ_i
        stats = withn.groupBy("term").agg(
            F.count(F.lit(1)).alias("_df"),
            F.max(F.col("_tf") / F.sqrt("_nsq")).alias("_maxw"),
        )
        ranked = (
            withn.join(stats, "term")
            .groupBy("_id")
            .agg(
                F.min("_nsq").alias("_nsq"),
                F.sort_array(
                    F.collect_list(F.struct("_df", "term", "_tf", "_maxw"))
                ).alias("_ord"),
            )
        )
        pos = ranked.select(
            "_id",
            "_nsq",
            F.posexplode("_ord").alias("_pos0", "_e"),
        )
        # suffix-inclusive running sums along the global order: the
        # window partitions on _id, which the groupBy above already
        # hash-distributed — no extra exchange
        w = (
            Window.partitionBy("_id")
            .orderBy("_pos0")
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        scanned = pos.select(
            "_id",
            "_nsq",
            F.col("_e.term").alias("term"),
            F.col("_e._df").alias("_df"),
            F.col("_e._tf").alias("_tf"),
            F.sum(F.col("_e._tf") * F.col("_e._tf")).over(w).alias("_tail"),
            F.sum(
                (F.col("_e._tf") / F.sqrt("_nsq")) * F.col("_e._maxw")
            ).over(w).alias("_bsum"),
        )
        # prefix = positions where NEITHER bound certifies the suffix
        # skippable (both decrease along the order → contiguous head).
        # Persisted: it self-joins as a/b, and without the cache the
        # stats-join + window lineage re-derives once per alias (the
        # SCALING.md join-alias lesson)
        pref = (
            scanned.filter(
                (F.col("_tail") >= F.lit(tsq_relaxed) * F.col("_nsq"))
                & (F.col("_bsum") >= F.lit(t_relaxed))
            )
            .select("_id", "_nsq", "term", "_df", "_tf", "_tail")
            .persist()
        )
        cand_cache = None
        try:
            a, b = pref.alias("a"), pref.alias("b")
            # Candidate generation is a GROUP-BY over the prefix⋈prefix
            # matches (replacing the former distinct), accumulating the
            # L2AP-style sufficient statistics per pair (r17 verdict
            # #2; Anastasiu & Karypis, "L2AP: fast cosine similarity
            # search with prefix L-2 norm bounds", ICDE 2014 — the
            # candidate-time partial-dot + suffix-norm machinery,
            # restated for a declarative engine where per-pair early
            # termination can't exist but per-pair BOUNDS can):
            #   - _pdot  = Σ tf_a·tf_b over the shared PREFIX terms
            #     (exact long — the accumulated dot L2AP carries);
            #   - first (min-rank) match → the positional-filter tails
            #     (tails decrease along the order, so filtering the
            #     first match ≡ the former OR-over-matches semantics);
            #   - last (max-rank) match → the suffix tails STRICTLY
            #     AFTER it (tail − tf² on each side).
            # Every shared term NOT counted in _pdot has global rank
            # > min(prefix boundaries) ≥ the last match's rank, hence
            # lives in BOTH tails-after, and Cauchy–Schwarz caps its
            # total contribution by sqrt(ta_after·tb_after).  A
            # candidate with _pdot + sqrt(ta_after·tb_after)
            # < t·(1−1e-9)·‖a‖·‖b‖ can never qualify — the bound that
            # prunes DURING verification instead of only at prefix
            # build.  (min/max structs order by (_df, term) = the
            # global rank; the payload fields ride along and are never
            # consulted because the rank is unique within a pair.)
            # Every per-pair statistic reduces to SEPARABLE scalar
            # min/max/sum aggregates — no struct ordering needed:
            # tails decrease along the global order on BOTH sides, so
            # the first match carries max(tail_a·tail_b) and the last
            # match carries min(tail_after) on each side SIMULTANEOUSLY
            # (the per-side minima co-occur at the last match).  Scalar
            # rows keep the 38.7 M-row (sf0.1) pre-agg shuffle thin.
            matched = a.join(
                b,
                (F.col("a.term") == F.col("b.term"))
                & (F.col("a._id") < F.col("b._id")),
            ).select(
                F.col("a._id").alias("doc_a"),
                F.col("b._id").alias("doc_b"),
                F.col("a._nsq").alias("_nsqa"),
                F.col("b._nsq").alias("_nsqb"),
                (F.col("a._tf") * F.col("b._tf")).alias("_pp"),
                # double on BOTH sides: long*long would evaluate in
                # int64 and wrap negative once tail_a*tail_b passes
                # 2^63 (nsq ~3e9 each — a stopword-saturated doc),
                # silently dropping a qualifying pair (r17 review);
                # double rounding is covered by the (1-1e-9) slack
                (F.col("a._tail").cast("double") * F.col("b._tail")).alias(
                    "_fprod"
                ),
                (F.col("a._tail") - F.col("a._tf") * F.col("a._tf")).alias(
                    "_taa"
                ),
                (F.col("b._tail") - F.col("b._tf") * F.col("b._tf")).alias(
                    "_tab"
                ),
            )
            g = matched.groupBy("doc_a", "doc_b").agg(
                F.min("_nsqa").alias("_nsqa"),
                F.min("_nsqb").alias("_nsqb"),
                F.sum("_pp").alias("_pdot"),
                F.max("_fprod").alias("_fprod"),
                F.min("_taa").alias("_lta"),
                F.min("_tab").alias("_ltb"),
            )
            cand = g.filter(
                # positional filter at the first shared term
                (
                    F.col("_fprod")
                    >= F.lit(tsq_relaxed) * F.col("_nsqa") * F.col("_nsqb")
                )
                # L2AP partial-dot bound at the last shared prefix term
                & (
                    F.col("_pdot").cast("double")
                    + F.sqrt(F.col("_lta").cast("double") * F.col("_ltb"))
                    >= F.lit(t_relaxed)
                    * F.sqrt(F.col("_nsqa").cast("double") * F.col("_nsqb"))
                )
            )
            # Exact-complete split: when BOTH tails-after are zero
            # (integer compare — exact) the uncounted-term set is
            # empty, _pdot IS the full dot, and the pair needs no
            # verification at all.
            done = (F.col("_lta") == 0) & (F.col("_ltb") == 0)
            epilogue = lambda dot: (  # noqa: E731 — ONE IEEE epilogue
                dot / (F.sqrt("_nsqa") * F.sqrt("_nsqb"))
            )
            exact_done = (
                cand.filter(done)
                .withColumn("cosine", epilogue(F.col("_pdot")))
                .filter(F.col("cosine") >= threshold)
                .select("doc_a", "doc_b", "cosine")
            )
            # Survivors verify through _verify_cosine_candidates (the
            # shared helper, r18 optimization round): a dense numpy
            # gather+einsum per Arrow batch when the collapsed reps'
            # tf matrix fits the broadcast cap — profiled 19.8 s → ~2 s
            # on the sf0.1 flat-vocabulary fixture's 10.57 M candidates
            # — with L2AP's forward-index map_zip_with join as the
            # self-balancing fallback for the Zipf/large-vocabulary
            # regime (few candidates, many reps).  Both arms produce
            # the identical exact-long dot and the identical IEEE
            # epilogue (pinned by test).
            cand = cand_cache = cand.persist()
            need = cand.filter(~done)
            verified = _verify_cosine_candidates(
                need, tf, threshold, "doc_a", "doc_b",
                cells_cap=dense_verify_cells_cap, bc_sink=bc_sink,
            )
            return _expand(exact_done.unionByName(verified))
        finally:
            pref.unpersist()
            if cand_cache is not None:
                cand_cache.unpersist()
            # the eager checkpoint above already materialized every
            # row that needed the dense matrix — destroying the
            # broadcast here stops it leaking for the session's life
            # (r18 advisory)
            for _bc in bc_sink:
                _bc.destroy()
    finally:
        tf.unpersist()
        members.unpersist()
        tf_all.unpersist()


def cosine_prefix_new_pairs(
    corpus: DataFrame,
    new_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
    dense_verify_cells_cap: "int | None" = None,
) -> DataFrame:
    """Incremental EXACT tf-cosine join (r17 verdict #3): all pairs at
    cosine ≥ ``threshold`` that INVOLVE a new-batch doc — (new ×
    corpus) ∪ (new × new) — without the corpus self-join, completing
    the incremental family Jaccard/containment opened (dedup.py
    prefix_*_new_pairs).  Output (doc_a, doc_b, cosine), bit-exact vs
    the full ``cosine_prefix_pairs`` over corpus ∪ batch restricted to
    batch-involving pairs (pinned in tests).

    The design decision the weighted metric forces (and the set-based
    twins never faced): Bayardo's maxweight bound b(x) quantifies over
    the PARTNER's weights (Σ_suffix x̂ᵢ·maxw(i), maxw(i) = max_y ŷᵢ),
    so a corpus-side prefix built with corpus-only maxw is UNSOUND the
    moment a new batch carries a heavier ŷᵢ — the bound could certify
    a suffix skippable that a batch doc then reaches into.  The split
    that keeps the index persistable:

    - CORPUS-side prefixes use the Cauchy–Schwarz ℓ²-tail bound ONLY
      (sqrt(tail/nsq) < t ⇒ suffix unreachable) — partner-FREE, hence
      valid against every future batch forever: (term order = corpus
      df, per-term df + maxw, per-doc CS prefixes) is the frozen,
      persistable index artifact, slightly longer prefixes being the
      price of immortality;
    - BATCH-side prefixes, recomputed per probe anyway, tighten with
      the maxweight bound over maxw_union(i) = max(frozen corpus
      maxw(i), batch maxw(i)) — sound against corpus AND batch
      partners, and the batch-side statistics cost one pass over the
      (small) batch.

    Soundness of prefix ⋈ prefix under per-side rules: each side's
    prefix is individually sound against every possible partner, so a
    qualifying pair's globally-first shared term lies in BOTH prefixes
    (the usual contradiction argument per side).  Global term order =
    (corpus df asc, term), corpus-absent terms df 0 — any ONE
    consistent order works (the ``_ranked_by_df`` lemma), and tails
    decrease along it on both sides, so the positional filter and the
    L2AP partial-dot bound (see ``cosine_prefix_pairs``) apply
    unchanged — both are tail-based, partner-free.  Candidates come
    from new-pref × corpus-pref and new-pref × new-pref; corpus ×
    corpus is structurally absent.  Verification is the same
    forward-index map path, maps semi-joined to candidate docs.

    Identity collapse, SIDE-AWARE (the r18 10× sweep's catch): the
    first cut skipped the collapse "by design", arguing candidate
    volume is batch-bounded — the sweep falsified that argument with
    exponent 1.55 (18.5 → 663 s at 10× clones), because clone
    inflation multiplies BOTH sides: ×g batch probes each hitting ×g
    corpus postings is ×g² candidate rows, the exact square the full
    join's collapse exists to prevent.  So both frames collapse to
    one representative per tf-vector fingerprint PER SIDE (reps stay
    side-pure — the corpus index artifact remains corpus-only rows,
    preserving persistability), the candidate/verify machinery runs
    at rep level with same-fingerprint rep pairs EXCLUDED from the
    join (fp-inequality on the n×c arm, strict fp-order on the n×n
    arm), and pairs expand afterward: cross-fingerprint pairs carry
    the rep pair's cosine verbatim (equal vectors share every
    dot/norm — the same IEEE value the direct join would produce);
    same-fingerprint pairs (batch×batch within a fp, and batch×corpus
    across the frames — the clone-of-a-corpus-doc arrival) get the
    identical-vector expression nsq/(sqrt(nsq)·sqrt(nsq)) under the
    same threshold filter, exactly as the full join's intra path
    states it (NOT a literal 1.0 — at t = 1.0 it can round a hair
    below one, on both engines together).  Ids must be disjoint
    across the frames (raises otherwise); ``threshold`` must be in
    (0, 1] (the family guard).

    Single tagged-union pass (r19 optimization round — the r18 close
    profiled this operator at ~15 jobs / 22 s with NO dominator:
    tf builds 2.3 s, per-side collapses 3.6 s, prefix builds 5.4 s,
    candidate agg 4.8 s, dense verify 4.1 s): every per-side pass now
    runs ONCE over ``union(corpus, batch)`` with a ``_side`` tag
    (0 = corpus, 1 = batch; ids are disjoint by the guard, so the tag
    is a function of the id and never mixes rows).  Side semantics are
    preserved exactly where they are load-bearing:

    - the identity collapse keys on (side, fingerprint), so reps stay
      SIDE-PURE and the corpus index artifact remains corpus-only rows
      (the persistability contract);
    - the term statistics are side-CONDITIONAL aggregates of one
      groupBy("term"): ``_df`` counts corpus reps only (the frozen
      corpus order; batch-only terms get df 0 exactly as the former
      full-outer coalesce produced), ``maxw`` is the greatest of the
      per-side conditional maxima (= the former maxw_union);
    - one prefix scan/window pass computes BOTH bounds for every doc
      and the per-side prefix rules become a conditional filter:
      corpus rows keep the partner-free Cauchy–Schwarz bound only,
      batch rows additionally require the maxweight bound;
    - the two candidate arms (new×corpus, new×new) merge into ONE
      prefix join whose condition is side-aware: the probe side is
      always a batch rep, the indexed side takes corpus partners at
      fp-inequality and batch partners at strict fp order — the same
      pair set the former unionByName of two joins produced.

    Every downstream value (sufficient statistics, bounds, exact-long
    dots, the IEEE epilogue) is computed by the identical expressions,
    so the output stays bit-equal to the full join restricted to
    batch-involving pairs (the standing differential battery pins
    this, fixture + maxweight-attack + clone-stress corpora)."""
    if not 0.0 < float(threshold) <= 1.0:
        raise ValueError(
            "cosine_prefix_new_pairs: threshold must be in (0, 1] — the "
            "prefix bound is vacuous at t <= 0 and cosine never exceeds 1"
        )
    overlap = corpus.select(F.col(id_col)).join(
        new_docs.select(F.col(id_col)), id_col, "left_semi"
    )
    if overlap.limit(1).count():
        raise ValueError(
            "cosine_prefix_new_pairs: corpus and new_docs share ids — "
            "pair identity would be ambiguous; re-id the batch"
        )
    from pyspark.sql import Window

    t = float(threshold)
    t_relaxed = t * (1.0 - 1e-9)
    tsq_relaxed = t * t * (1.0 - 1e-9)

    def _tagged_tf(frame: DataFrame, side: int) -> DataFrame:
        return frame.select(
            F.col(id_col).alias("_id"),
            F.lit(side).alias("_side"),
            F.explode(tokens(text_col)).alias("term"),
        )

    # ONE tf pass over the tagged union (ids are disjoint by the guard,
    # so _side rides the id through every aggregate)
    tf_all = (
        _tagged_tf(corpus, 0)
        .unionByName(_tagged_tf(new_docs, 1))
        .groupBy("_id", "_side", "term")
        .agg(F.count(F.lit(1)).alias("_tf"))
        .persist()
    )
    # identity collapse keyed on (side, fingerprint): reps stay
    # side-pure — the corpus index artifact remains corpus-only rows
    vecfp = tf_all.groupBy("_id").agg(
        F.min("_side").alias("_side"),
        F.md5(
            F.to_json(F.sort_array(F.collect_list(F.struct("term", "_tf"))))
        ).alias("_fp"),
        F.sum(F.col("_tf") * F.col("_tf")).alias("_vnsq"),
    )
    groups = vecfp.groupBy("_side", "_fp").agg(
        F.min("_id").alias("_rep"),
        F.count(F.lit(1)).alias("_g"),
        F.min("_vnsq").alias("_gnsq"),
    )
    members = (
        vecfp.join(groups.select("_side", "_fp", "_rep"), ["_side", "_fp"])
        .select("_side", "_fp", "_id", "_rep")
        .persist()
    )
    tf = tf_all.join(
        members.filter(F.col("_id") == F.col("_rep")).select("_id"),
        "_id",
        "left_semi",
    ).persist()
    try:
        bc_sink: list = []

        def _expand(rep_pairs: DataFrame) -> DataFrame:
            # expansion: _ida is always a batch rep; _idb is a corpus
            # rep or a batch rep — ids are globally unique across the
            # frames (the guard above), so keying by rep id is
            # unambiguous
            expand_a = members.filter(F.col("_side") == 1).select(
                F.col("_rep").alias("_ida"), F.col("_id").alias("_xa")
            )
            expand_b = members.select(
                F.col("_rep").alias("_idb"), F.col("_id").alias("_xb")
            )
            cross = (
                rep_pairs.join(expand_a, "_ida")
                .join(expand_b, "_idb")
                .select(
                    F.least("_xa", "_xb").alias("doc_a"),
                    F.greatest("_xa", "_xb").alias("doc_b"),
                    "cosine",
                )
            )
            # intra: same-fingerprint pairs involving a batch member —
            # batch×batch within a fp (strict id order) plus
            # batch×corpus across the sides; the identical-vector
            # cosine expression under the same threshold filter
            mem_n = members.filter(F.col("_side") == 1)
            mem_c = members.filter(F.col("_side") == 0)
            bm = mem_n.select("_fp", F.col("_id").alias("_xa")).join(
                groups.filter(F.col("_side") == 1).select("_fp", "_gnsq"),
                "_fp",
            )
            intra_pairs = bm.join(
                mem_n.select("_fp", F.col("_id").alias("_xb")), "_fp"
            ).filter(F.col("_xa") < F.col("_xb")).unionByName(
                bm.join(
                    mem_c.select("_fp", F.col("_id").alias("_xb")), "_fp"
                )
            )
            intra = (
                intra_pairs.withColumn(
                    "cosine",
                    F.col("_gnsq") / (F.sqrt("_gnsq") * F.sqrt("_gnsq")),
                )
                .filter(F.col("cosine") >= threshold)
                .select(
                    F.least("_xa", "_xb").alias("doc_a"),
                    F.greatest("_xa", "_xb").alias("doc_b"),
                    "cosine",
                )
            )
            return cross.unionByName(intra).localCheckpoint(eager=True)

        # Dense ALL-PAIRS regime (r19 — see cosine_prefix_pairs and
        # _DENSE_GRAM_FLOPS_CAP): under the dense gate the qualifying
        # batch-involving rep pairs come straight from block-wise
        # exact Gram products; rep_meta carries (side, fingerprint)
        # so the kernel keeps exactly the side-aware candidate join's
        # pair set (batch-involving, fingerprint-unequal) with the
        # batch rep first, matching the expansion contract.
        cap = (
            _DENSE_VERIFY_CELLS_CAP
            if dense_verify_cells_cap is None
            else int(dense_verify_cells_cap)
        )
        if cap > 0:
            dims = tf.agg(
                F.countDistinct("_id").alias("_nd"),
                F.countDistinct("term").alias("_nt"),
                F.count(F.lit(1)).alias("_np"),
                F.sum(F.length("term")).alias("_tl"),
            ).first()
            n_docs, n_terms = int(dims["_nd"] or 0), int(dims["_nt"] or 0)
            est_bytes = int(dims["_tl"] or 0) + 16 * int(dims["_np"] or 0)
            if (
                n_docs * n_terms <= cap
                and est_bytes <= 8 * cap
                and n_docs * n_docs * n_terms <= _DENSE_GRAM_FLOPS_CAP
            ):
                gram = _dense_all_pairs_gram(
                    tf.select("_id", "term", "_tf"),
                    threshold,
                    "_ida",
                    "_idb",
                    bc_sink,
                    rep_meta=groups.select(
                        F.col("_rep").alias("_id"), "_side", "_fp"
                    ),
                )
                if gram is not None:
                    try:
                        return _expand(gram)
                    finally:
                        for _bc in bc_sink:
                            _bc.destroy()
        # ---- the persistable corpus index statistics over corpus
        # REPS (clone weights are identical to their rep's, so maxw
        # and the df-derived order are collapse-invariant in meaning):
        # term order (corpus df), corpus maxw, per-rep norms — all
        # side-CONDITIONAL aggregates of ONE pass over the union ----
        norms = tf.groupBy("_id").agg(
            F.sum(F.col("_tf") * F.col("_tf")).alias("_nsq")
        )
        is_c = F.col("_side") == 0
        # _df counts corpus reps only (the frozen corpus order;
        # batch-only terms get 0 exactly as the former full-outer
        # coalesce produced); maxw_union is the greatest of the
        # per-side conditional maxima — sound for every partner in
        # corpus ∪ batch
        stats = (
            tf.join(norms, "_id")
            .groupBy("term")
            .agg(
                F.count(F.when(is_c, F.lit(1))).alias("_df"),
                F.max(
                    F.when(is_c, F.col("_tf") / F.sqrt("_nsq"))
                ).alias("_maxw_c"),
                F.max(
                    F.when(~is_c, F.col("_tf") / F.sqrt("_nsq"))
                ).alias("_maxw_n"),
            )
            .select(
                "term",
                "_df",
                F.greatest(
                    F.coalesce(F.col("_maxw_c"), F.lit(0.0)),
                    F.coalesce(F.col("_maxw_n"), F.lit(0.0)),
                ).alias("_maxw"),
            )
        )
        # ONE prefix scan/window pass over both sides
        ranked = (
            tf.join(norms, "_id")
            .join(stats, "term")
            .groupBy("_id")
            .agg(
                F.min("_side").alias("_side"),
                F.min("_nsq").alias("_nsq"),
                F.sort_array(
                    F.collect_list(F.struct("_df", "term", "_tf", "_maxw"))
                ).alias("_ord"),
            )
        )
        pos = ranked.select(
            "_id", "_side", "_nsq", F.posexplode("_ord").alias("_pos0", "_e")
        )
        w = (
            Window.partitionBy("_id")
            .orderBy("_pos0")
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        scanned = pos.select(
            "_id",
            "_side",
            "_nsq",
            F.col("_e.term").alias("term"),
            F.col("_e._tf").alias("_tf"),
            F.sum(F.col("_e._tf") * F.col("_e._tf")).over(w).alias("_tail"),
            F.sum(
                (F.col("_e._tf") / F.sqrt("_nsq")) * F.col("_e._maxw")
            ).over(w).alias("_bsum"),
        )
        cs_ok = F.col("_tail") >= F.lit(tsq_relaxed) * F.col("_nsq")
        # per-side prefix rules as a conditional filter: corpus rows
        # keep the partner-free CS bound ONLY (-> persistable); batch
        # rows additionally require the maxw_union Bayardo bound.
        # rep -> fingerprint join keeps same-vector rep pairs OUT of
        # the candidate join (they belong to the intra path)
        repfp = groups.select(F.col("_rep").alias("_id"), "_fp")
        pref = (
            scanned.filter(
                cs_ok
                & (
                    (F.col("_side") == 0)
                    | (F.col("_bsum") >= F.lit(t_relaxed))
                )
            )
            .join(repfp, "_id")
            .select("_id", "_side", "_fp", "_nsq", "term", "_tf", "_tail")
            .persist()
        )
        cand_cache = None
        try:
            # ONE side-aware candidate join replacing the former
            # unionByName of the new×corpus and new×new arms: the
            # probe side is always a batch rep; corpus partners join
            # at fp-inequality, batch partners at strict fp order —
            # the identical pair set
            a = pref.filter(F.col("_side") == 1).alias("a")
            b = pref.alias("b")
            matched = a.join(
                b,
                (F.col("a.term") == F.col("b.term"))
                & (
                    (
                        (F.col("b._side") == 0)
                        & (F.col("a._fp") != F.col("b._fp"))
                    )
                    | (
                        (F.col("b._side") == 1)
                        & (F.col("a._fp") < F.col("b._fp"))
                    )
                ),
            ).select(
                F.col("a._id").alias("_ida"),
                F.col("b._id").alias("_idb"),
                F.col("a._nsq").alias("_nsqa"),
                F.col("b._nsq").alias("_nsqb"),
                (F.col("a._tf") * F.col("b._tf")).alias("_pp"),
                (
                    F.col("a._tail").cast("double") * F.col("b._tail")
                ).alias("_fprod"),
                (F.col("a._tail") - F.col("a._tf") * F.col("a._tf")).alias(
                    "_taa"
                ),
                (F.col("b._tail") - F.col("b._tf") * F.col("b._tf")).alias(
                    "_tab"
                ),
            )
            g = matched.groupBy("_ida", "_idb").agg(
                F.min("_nsqa").alias("_nsqa"),
                F.min("_nsqb").alias("_nsqb"),
                F.sum("_pp").alias("_pdot"),
                F.max("_fprod").alias("_fprod"),
                F.min("_taa").alias("_lta"),
                F.min("_tab").alias("_ltb"),
            )
            cand = cand_cache = g.filter(
                (
                    F.col("_fprod")
                    >= F.lit(tsq_relaxed) * F.col("_nsqa") * F.col("_nsqb")
                )
                & (
                    F.col("_pdot").cast("double")
                    + F.sqrt(F.col("_lta").cast("double") * F.col("_ltb"))
                    >= F.lit(t_relaxed)
                    * F.sqrt(F.col("_nsqa").cast("double") * F.col("_nsqb"))
                )
            ).persist()
            done = (F.col("_lta") == 0) & (F.col("_ltb") == 0)
            epilogue = lambda dot: (  # noqa: E731 — ONE IEEE epilogue
                dot / (F.sqrt("_nsqa") * F.sqrt("_nsqb"))
            )
            exact_done = (
                cand.filter(done)
                .withColumn("cosine", epilogue(F.col("_pdot")))
                .filter(F.col("cosine") >= threshold)
                .select("_ida", "_idb", "cosine")
            )
            # shared verification helper (r18 optimization round):
            # dense numpy path under the cells cap, map_zip_with
            # forward-index join above it — see cosine_prefix_pairs
            need = cand.filter(~done)
            verified = _verify_cosine_candidates(
                need, tf.select("_id", "term", "_tf"), threshold,
                "_ida", "_idb", cells_cap=dense_verify_cells_cap,
                bc_sink=bc_sink,
            )
            return _expand(exact_done.unionByName(verified))
        finally:
            pref.unpersist()
            if cand_cache is not None:
                cand_cache.unpersist()
            # eager checkpoint done — release the dense-verify
            # broadcast instead of leaking it (r18 advisory)
            for _bc in bc_sink:
                _bc.destroy()
    finally:
        tf_all.unpersist()
        members.unpersist()
        tf.unpersist()


def edit_distance_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    str_col: str = "text",
    max_dist: int = 2,
    q: int = 3,
) -> DataFrame:
    """EXACT approximate-string self-join: pairs whose ``str_col``
    values are within Levenshtein distance ``max_dist`` — the fuzzy
    twin of exact-prefix dedup (catches the typo'd header / OCR slip /
    near-identical title that byte equality misses).  NEW family:
    edit-distance join; no reference-repo counterpart.

    Published design: q-gram filtering per Gravano et al., "Approximate
    String Joins in a Database (Almost) for Free" (VLDB 2001), with
    candidate generation upgraded to the Ed-Join PREFIX index (Xiao,
    Wang, Lin, "Ed-Join: an efficient algorithm for similarity joins
    with edit distance constraints", VLDB 2008):
      - LENGTH filter: ed(a,b) ≤ d ⇒ |len(a) − len(b)| ≤ d (applied
        inside the candidate join);
      - PREFIX index: d edits destroy at most q·d q-gram OCCURRENCES,
        so |multiset ∩| ≥ max(|Ga|,|Gb|) − q·d — the overlap-threshold
        prefix lemma then says each string need index only its
        q·d + 1 RAREST gram occurrences (ranked by global occurrence
        frequency, ties by gram value): the rarest common occurrence of
        any qualifying pair lies in BOTH prefixes.  Hot q-grams (the
        skew that makes a full posting join quadratic — the r16 10×
        sweep OOM'd on exactly that shape at 500k strings) sort to the
        df-ranked tail and never reach the candidate join at all.
      - SHORT-STRING bucket: when max(len) < q·(d+1) the mismatch
        bound is vacuous and a qualifying pair can share NO q-gram at
        all (a string shorter than q has no q-grams) — every such pair
        has BOTH members short (ed ≤ d bounds the partner's length),
        so strings below that bound are compared all-pairs among
        themselves, a domain-bounded bucket.
    Survivors of either path are verified with the exact built-in
    ``levenshtein`` — integer output, engine-exact vs the NOT-EXISTS-
    free quadratic oracle.

    Cost shape: the candidate join touches only (q·d + 1) occurrences
    per string, all drawn from the globally RAREST grams, so postings
    lists stay short by construction; the short bucket is |shorts|²,
    bounded by the domain of sub-q·(d+1)-char strings.  Output
    (id_a, id_b, edit_distance) with id_a < id_b, distance ≤ d; NULL
    strings excluded."""
    d = int(max_dist)
    if d < 0:
        raise ValueError("max_dist must be >= 0")
    qq = int(q)
    if qq < 1:
        raise ValueError("q must be >= 1")
    # the base frame feeds five subtrees (shorts x2, grams, va, vb) and
    # the gram index self-joins — persist both so the scan + substring
    # explode run once each, not once per alias (file convention; the
    # SCALING.md join-alias re-derivation lesson)
    s = (
        df.filter(F.col(str_col).isNotNull())
        .select(F.col(id_col).alias("_id"), F.col(str_col).alias("_s"))
        .withColumn("_len", F.length("_s"))
        .persist()
    )
    try:
        short_bound = qq * (d + 1)
        shorts = s.filter(F.col("_len") < short_bound)
        grams = s.filter(F.col("_len") >= qq).select(
            "_id",
            "_len",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.col("_len") - qq + 1),
                    lambda i: F.col("_s").substr(i, F.lit(qq)),
                )
            ).alias("_g"),
        )
        # Ed-Join prefix: rank every gram OCCURRENCE by (global
        # occurrence count, gram), keep the q*d + 1 rarest per string —
        # persisted because the prefix index self-joins as a/b
        dfreq = grams.groupBy("_g").agg(F.count(F.lit(1)).alias("_df"))
        pidx = (
            grams.join(dfreq, "_g")
            .groupBy("_id", "_len")
            .agg(
                F.slice(
                    F.sort_array(
                        F.collect_list(F.struct(F.col("_df"), F.col("_g")))
                    ),
                    1,
                    qq * d + 1,
                ).alias("_pref")
            )
            .select(
                "_id",
                "_len",
                F.explode(F.transform("_pref", lambda x: x["_g"])).alias("_g"),
            )
            .persist()
        )
        try:
            a, b = pidx.alias("a"), pidx.alias("b")
            cand = (
                a.join(
                    b,
                    (F.col("a._g") == F.col("b._g"))
                    & (F.col("a._id") < F.col("b._id"))
                    & (
                        F.abs(F.col("a._len") - F.col("b._len")) <= d
                    ),
                )
                .select(
                    F.col("a._id").alias("id_a"),
                    F.col("b._id").alias("id_b"),
                )
            )
            sa = shorts.select(F.col("_id").alias("id_a"), F.col("_len").alias("_la"))
            sb = shorts.select(F.col("_id").alias("id_b"), F.col("_len").alias("_lb"))
            short_pairs = sa.join(
                sb,
                (F.col("id_a") < F.col("id_b"))
                & (F.abs(F.col("_la") - F.col("_lb")) <= d),
            ).select("id_a", "id_b")
            allcand = cand.unionByName(short_pairs).distinct()
            va = s.select(F.col("_id").alias("id_a"), F.col("_s").alias("_sa"))
            vb = s.select(F.col("_id").alias("id_b"), F.col("_s").alias("_sb"))
            out = (
                allcand.join(va, "id_a")
                .join(vb, "id_b")
                .withColumn("edit_distance", F.levenshtein("_sa", "_sb"))
                .filter(F.col("edit_distance") <= d)
                .select("id_a", "id_b", "edit_distance")
            )
            return out.localCheckpoint(eager=True)
        finally:
            pidx.unpersist()
    finally:
        s.unpersist()


def keep_first_per_fingerprint(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Exact dedup: keep the smallest id per byte-identical text (md5
    of the bytes) via groupBy+semi-join — map-side partial agg on the
    16-byte fingerprint, no window over the corpus.  NULL texts are
    never duplicates of anything (SQL equality semantics: md5(NULL) is
    NULL, and NULL ≠ NULL), so they all pass through.  Shared by
    ``curation.drop_exact_dups`` and ``dedup_new_against_corpus``."""
    fp = df.select(F.col(id_col), F.md5(F.col(text_col).cast("binary")).alias("_fp"))
    keep = (
        fp.filter(F.col("_fp").isNotNull())
        .groupBy("_fp")
        .agg(F.min(id_col).alias(id_col))
        .select(id_col)
        .unionByName(fp.filter(F.col("_fp").isNull()).select(id_col))
    )
    return df.join(keep, id_col, "left_semi")


def dedup_new_against_corpus(
    new_docs: DataFrame,
    corpus: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.2,
    max_doc_freq: int | None = 50,
) -> DataFrame:
    """Incremental-ingestion dedup: the production path for appending a
    crawl increment to an existing corpus.  Returns the rows of
    ``new_docs`` that survive BOTH gates:

    1. exact — drop docs byte-identical to any corpus doc (md5
       anti-join against the corpus fingerprint set) or to an earlier
       doc in the same batch (keep min id per fingerprint);
    2. near — drop docs whose word-``n``-gram Jaccard vs ANY corpus
       doc ≥ ``threshold``, via an ASYMMETRIC inverted-index join
       (new-batch index ⋈ corpus index on the shingle hash) — never a
       corpus self-join, so the cost is |batch index| ⋈ |corpus
       index|, linear in the corpus for a bounded batch.

    ``max_doc_freq`` caps hot shingles by their CORPUS doc-frequency
    (boilerplate lives in the corpus): shingles above the cap are
    anti-joined out of both sides before the candidate join, same
    skew-safety story as ``ngram_jaccard_pairs``.  Near-dups WITHIN
    the new batch are out of scope here — run the batch through
    ``ngram_jaccard_pairs``/clustering first if that matters; at
    ingestion scale the corpus side dominates and this operator keeps
    its plan to the asymmetric join only.

    At 100 TB the corpus fingerprint set and shingle index are the
    reusable artifacts: persist both as parquet once per corpus
    version and hand them in here instead of ``corpus`` (the operator
    only derives them when given raw text).  Within one call the two
    capped indexes are cached — the corpus index feeds the hot-shingle
    agg, the sizes agg and the candidate join, and re-deriving it per
    consumer would re-tokenize the corpus three times (the same rule
    ``ngram_jaccard_pairs`` documents); the loser id set is
    materialized eagerly so no cache entry outlives the call."""
    fp = F.md5(F.col(text_col).cast("binary"))
    corpus_fps = corpus.select(fp.alias("_fp")).distinct()
    batch_fp = new_docs.select(F.col(id_col), fp.alias("_fp"))
    # vs-corpus: NULL fingerprints never equi-join, so NULL-text docs
    # survive this anti-join; keep_first_per_fingerprint applies the
    # matching NULL-is-never-a-dup rule within the batch
    not_in_corpus = (
        batch_fp.join(corpus_fps, "_fp", "left_anti").select(id_col)
    )
    exact_ok = keep_first_per_fingerprint(
        new_docs.join(not_in_corpus, id_col, "left_semi"), id_col, text_col
    )

    # NULL texts are never near-dups of anything (matching the exact
    # gate's NULL rule): excluded from BOTH indexes — otherwise the
    # short-doc fallback shingle of a NULL (hash of '') would collide
    # with empty/whitespace corpus docs and silently drop the batch doc
    new_idx = _doc_shingles(
        exact_ok.filter(F.col(text_col).isNotNull()), id_col, text_col, n
    )
    corp_idx = _doc_shingles(
        corpus.filter(F.col(text_col).isNotNull()), id_col, text_col, n
    )
    if max_doc_freq is not None:
        hot = (
            corp_idx.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("_df"))
            .filter(F.col("_df") > max_doc_freq)
            .select("shingle")
        )
        new_idx = new_idx.join(F.broadcast(hot), "shingle", "left_anti")
        corp_idx = corp_idx.join(F.broadcast(hot), "shingle", "left_anti")
    new_idx = new_idx.persist()
    corp_idx = corp_idx.persist()
    try:
        new_sizes = new_idx.groupBy("_id").agg(F.count(F.lit(1)).alias("_n_new"))
        corp_sizes = corp_idx.groupBy("_id").agg(F.count(F.lit(1)).alias("_n_corp"))
        inter = (
            new_idx.alias("a")
            .join(corp_idx.alias("b"), F.col("a.shingle") == F.col("b.shingle"))
            .groupBy(F.col("a._id").alias("_new_id"), F.col("b._id").alias("_corp_id"))
            .agg(F.count(F.lit(1)).alias("_inter"))
        )
        near_losers = (
            inter.join(new_sizes.withColumnRenamed("_id", "_new_id"), "_new_id")
            .join(corp_sizes.withColumnRenamed("_id", "_corp_id"), "_corp_id")
            .withColumn(
                "_jaccard",
                F.col("_inter") / (F.col("_n_new") + F.col("_n_corp") - F.col("_inter")),
            )
            .filter(F.col("_jaccard") >= threshold)
            .select(F.col("_new_id").alias(id_col))
            .distinct()
            .localCheckpoint(eager=True)
        )
    finally:
        new_idx.unpersist()
        corp_idx.unpersist()
    return exact_ok.join(near_losers, id_col, "left_anti")


def ngram_contamination(
    train: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """Test-set decontamination signal: for each eval document, how many
    of its distinct word n-grams also appear anywhere in the training
    corpus.  Output (doc_id, shared_shingles, total_shingles,
    contamination) for eval docs with ≥1 shared shingle.

    Shape: the train shingle VOCABULARY (distinct shingles — far
    smaller than the (doc, shingle) index) joins the eval index on the
    hashed shingle; one shuffle each side, partial-agg friendly.  At
    corpus scale, persist the train vocabulary once and reuse it across
    eval sets."""
    tr_vocab = _doc_shingles(train, id_col, text_col, n).select("shingle").distinct()
    ev = _doc_shingles(eval_df, id_col, text_col, n)
    sizes = ev.groupBy("_id").agg(F.count(F.lit(1)).alias("total_shingles"))
    shared = ev.join(tr_vocab, "shingle").groupBy("_id").agg(
        F.count(F.lit(1)).alias("shared_shingles")
    )
    return (
        shared.join(sizes, "_id")
        .select(
            F.col("_id").alias(id_col),
            "shared_shingles",
            "total_shingles",
            (F.col("shared_shingles") / F.col("total_shingles")).alias("contamination"),
        )
    )


def minhash_signatures(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3, k: int = 32
) -> DataFrame:
    """K min-hashes per doc: explode shingles once, hash each (shingle,
    seed) pair exactly once, min-aggregate per doc.

    Deliberately NOT k array_min(transform(...)) expressions over the
    shingle array — projection collapse would inline (and recompute)
    the shingle derivation k times, which measured ~20x slower.  The
    explode shape costs one shuffle on the doc id but hashes each
    shingle k times total and keeps every operator in codegen."""
    ds = _doc_shingles(df, id_col, text_col, n)
    hashed = ds.select(
        "_id", *[F.xxhash64(F.lit(seed), F.col("shingle")).alias(f"_h{seed}") for seed in range(k)]
    )
    agg = hashed.groupBy("_id").agg(*[F.min(f"_h{seed}").alias(f"_m{seed}") for seed in range(k)])
    return agg.select("_id", F.array(*[F.col(f"_m{seed}") for seed in range(k)]).alias("signature"))


def minhash_bands(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    k: int = 32,
    bands: int = 8,
) -> DataFrame:
    """LSH band keys per doc — (_id, signature, band, bucket), one row
    per (doc, band), bucket = hash of the band's signature rows.  The
    ONE copy of the banding expression, shared by the batch candidate
    join (``minhash_lsh_candidates``) and the streaming near-dedup
    stage (streaming/near_dedup.py), so band keys computed at ingest
    time match keys computed in a batch sweep bit-for-bit."""
    rows = k // bands
    sigs = minhash_signatures(df, id_col, text_col, n, k)
    return sigs.select(
        "_id",
        "signature",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band"),
                        F.xxhash64(F.concat_ws(",", *[F.col("signature")[bi * rows + r] for r in range(rows)])).alias("bucket"),
                    )
                    for bi in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("_id", "signature", "bb.band", "bb.bucket")


def minhash_lsh_candidates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    k: int = 32,
    bands: int = 8,
) -> DataFrame:
    """LSH-banded candidate pairs: docs agreeing on all rows of ≥1 band.
    Output (doc_a, doc_b, est_jaccard) where est_jaccard = fraction of
    the K min-hashes that agree (unbiased Jaccard estimate)."""
    banded = minhash_bands(df, id_col, text_col, n, k, bands)
    # deliberately NOT persisted: the banded signatures are wide rows
    # (k-long arrays) whose cache write costs more than recomputing the
    # codegen hash pipeline for the join's second side (measured ~25%
    # slower persisted at sf0.1); at corpus scale, materialize the
    # signature table to parquet once and join from that instead.
    a = banded.alias("a")
    b = banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(
            F.col("a._id").alias("doc_a"),
            F.col("b._id").alias("doc_b"),
            F.col("a.signature").alias("sa"),
            F.col("b.signature").alias("sb"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    est = F.round(
        F.size(F.filter(F.zip_with("sa", "sb", lambda x, y: x == y), lambda m: m))
        / F.lit(float(k)),
        4,
    )
    return pairs.select("doc_a", "doc_b", est.alias("est_jaccard"))


def simhash_signatures(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """64-bit SimHash per document: each token votes ±1 on every bit of
    its xxhash64; signature bit i is 1 iff the vote sum is positive.
    Entirely array expressions — one projection, no shuffle.  (The
    per-bit shift counts are Python ints because Spark's shiftleft/
    shiftright wrappers take literal bit counts.)"""
    from functools import reduce

    toks = tokens(text_col)
    hashes = F.transform(toks, lambda t: F.xxhash64(t))
    votes = F.aggregate(
        hashes,
        F.array_repeat(F.lit(0), 64),
        lambda acc, h: F.zip_with(
            acc,
            F.array(*[F.shiftright(h, i).bitwiseAND(F.lit(1)).cast("int") for i in range(64)]),
            lambda a, bit: a + F.when(bit == F.lit(1), F.lit(1)).otherwise(F.lit(-1)),
        ),
    )
    with_votes = df.select(F.col(id_col), votes.alias("_votes"))
    bit_terms = [
        F.when(F.element_at(F.col("_votes"), i + 1) > 0, F.shiftleft(F.lit(1).cast("long"), i))
        .otherwise(F.lit(0).cast("long"))
        for i in range(64)
    ]
    sig = reduce(lambda a, b: a.bitwiseOR(b), bit_terms)
    return with_votes.select(F.col(id_col), sig.alias("simhash"))


def simhash_dup_groups(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Docs sharing an identical SimHash (near-dup at Hamming 0)."""
    return (
        simhash_signatures(df, id_col, text_col)
        .groupBy("simhash")
        .agg(F.count(F.lit(1)).alias("dup_count"), F.min(id_col).alias("first_doc"))
        .filter(F.col("dup_count") > 1)
    )
