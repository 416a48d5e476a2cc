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


def _qtf_frame(spark, query_terms: list[str]) -> DataFrame:
    """(term, query-term-frequency) for a bag-of-terms query — a
    |distinct query terms|-sized driver frame, broadcast by callers.
    Counts are exact-integer-valued doubles (multiplication by them is
    deterministic, and by exactly-1.0 is bit-neutral)."""
    from collections import Counter

    return spark.createDataFrame(
        [(t, float(n)) for t, n in Counter(query_terms).items()],
        "_t string, _qtf double",
    )


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-``k`` documents for a bag-of-terms query by BM25
    (Lucene-style non-negative idf: ln(1 + (N − df + 0.5)/(df + 0.5))).
    Bag semantics are real (r12 advisory): a term repeated in
    ``query_terms`` multiplies its per-term contribution by its query
    frequency, the standard BM25 query weighting — not collapsed to set
    semantics.  ``n_matched_terms`` counts DISTINCT matched terms
    (Lucene's coordination count).  Output: (doc_id, n_matched_terms,
    bm25_score), ordered by (score desc, doc_id)."""
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
    qtf = _qtf_frame(docs.sparkSession, query_terms)
    terms = list(dict.fromkeys(query_terms))
    matched = (
        docs.select(F.col(id_col), F.explode(tokens(text_col)).alias("_t"))
        .filter(F.col("_t").isin(terms))
        .groupBy(id_col, "_t")
        .agg(F.count(F.lit(1)).alias("_tf"))
        .localCheckpoint()
    )
    df_ = matched.groupBy("_t").agg(F.count(F.lit(1)).alias("_df"))
    scored = (
        matched.join(F.broadcast(df_), "_t")
        .join(F.broadcast(qtf), "_t")
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
    pattern (LSH/IVF/PQ/IVFPQ → +BM25): posting lists
    (term, doc_id, tf) partitioned by ``bucket = crc32(term) %
    n_buckets``, so a probe statically prunes to the query terms'
    buckets and reads |query|/n_buckets of the postings, never the
    corpus.

    Sidecars (underscore-prefixed, Spark-written — the
    write_lsh_index discipline, so the layout works on s3a/hdfs):
    - ``_doclens/``: (doc_id, _dl) — the length-normalization table;
    - ``_termstats/``: (_t, _df) — document frequencies, so idf needs
      no postings aggregation at probe time;
    - ``_bm25_params/``: 1 row (n_docs, avgdl, n_buckets) — probe
      geometry validated + the corpus constants the scorer needs.
    """
    import os

    # the document length rides IN every posting row (the Lucene
    # norms-in-postings design, +8 bytes/posting): a probe then scores
    # from the pruned posting partitions ALONE — without this it would
    # join the corpus-row-sized _doclens table on every query, a full
    # sidecar scan per probe
    dl = docs.select(
        F.col(id_col), F.size(tokens(text_col)).alias("_dl")
    ).filter(F.col("_dl") > 0)
    toks = docs.select(F.col(id_col), F.explode(tokens(text_col)).alias("_t"))
    postings = (
        toks.groupBy(id_col, "_t")
        .agg(F.count(F.lit(1)).alias("_tf"))
        .join(dl, id_col)
        .withColumn(
            "bucket",
            F.pmod(F.crc32(F.col("_t").cast("binary")), F.lit(n_buckets)),
        )
    )
    postings.write.mode("overwrite").partitionBy("bucket").parquet(path)
    dl.write.mode("overwrite").parquet(os.path.join(path, "_doclens"))
    spark = docs.sparkSession
    spark.read.parquet(path).groupBy("_t").agg(
        F.count(F.lit(1)).alias("_df")
    ).write.mode("overwrite").parquet(os.path.join(path, "_termstats"))
    (
        spark.read.parquet(os.path.join(path, "_doclens"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            (F.sum("_dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
        )
        .withColumn("n_buckets", F.lit(n_buckets))
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(os.path.join(path, "_bm25_params"))
    )


def bm25_topk_indexed(
    spark,
    path: str,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Probe a ``write_bm25_index`` layout: read ONLY the query terms'
    bucket directories (static partition pruning via the driver-side
    crc32 twin), join the |query|-sized _termstats and the _doclens
    table, and run the IDENTICAL scoring tail as ``bm25_topk`` —
    row-for-row equality is pinned by test, not hoped for (including
    bag-of-terms queries: duplicate terms weight by query frequency in
    both probes).  The probe never tokenizes anything: the corpus pass
    was paid at write time.
    """
    import os

    params = spark.read.parquet(os.path.join(path, "_bm25_params")).first()
    n_buckets = params["n_buckets"]
    qtf = _qtf_frame(spark, query_terms)
    terms = list(dict.fromkeys(query_terms))
    buckets = sorted({_term_bucket(t, n_buckets) for t in terms})
    raw = spark.read.parquet(path)
    id_col = [c for c in raw.columns if c not in ("_t", "_tf", "_dl", "bucket")][0]
    postings = raw.filter(F.col("bucket").isin(buckets)).filter(
        F.col("_t").isin(terms)
    )
    termstats = spark.read.parquet(os.path.join(path, "_termstats")).filter(
        F.col("_t").isin(terms)
    )
    # _dl rides in the posting rows — no sidecar join, the probe's
    # only scan is the pruned posting partitions
    scored = (
        postings.join(F.broadcast(termstats), "_t")
        .join(F.broadcast(qtf), "_t")
        .withColumn("_N", F.lit(params["n_docs"]))
        .withColumn("_avgdl", F.lit(params["avgdl"]))
    )
    return _score_and_rank(scored, id_col, k, k1, b)


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
) -> DataFrame:
    """The SERVING shape of hybrid retrieval: both legs probe WRITTEN
    indexes (BM25 bucket-pruned postings + IVF cluster-pruned
    vectors), so a query touches |query-term buckets| + nprobe
    cluster dirs and never the corpus.  At nprobe = n_clusters the
    semantic leg is exhaustive and the fused output is pinned equal to
    the in-memory ``hybrid_search_rrf`` composition (tests); at the
    serving nprobe it trades the written-ANN family's measured recall
    for the same I/O bound as every other indexed probe."""
    from pyspark.sql import Window

    from .similarity import ivf_topk_indexed

    lex = bm25_topk_indexed(spark, bm25_path, query_terms, k=breadth, k1=k1, b=b)
    id_col = [c_ for c_ in lex.columns if c_ not in ("n_matched_terms", "bm25_score")][0]
    lex_r = lex.select(
        id_col,
        F.row_number()
        .over(Window.orderBy(F.col("bm25_score").desc(), F.col(id_col)))
        .alias("rank"),
    )
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
