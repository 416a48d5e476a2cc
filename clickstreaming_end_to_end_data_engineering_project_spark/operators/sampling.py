"""Deterministic sampling / splitting for training-data pipelines.

All splits here are CONTENT-deterministic (derived from md5 of a key),
not RNG-deterministic: the same row lands in the same split on any
engine, any partitioning, any run — which is what makes dataset
versioning and the DuckDB oracle both work.  (Spark's sample()/
sampleBy() are seed-deterministic but partitioning-dependent, so they
are offered only as the approximate path.)

md5-hex string comparison gives uniform splits: the hex digest of a
key is uniform in [0x00.., 0xff..]; comparing it to a hex threshold
string selects that fraction.  'cc' ≈ 0.8 * 256.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _key_digest(key_col: str) -> F.Column:
    return F.md5(F.col(key_col).cast("string").cast("binary"))


def train_test_split(df: DataFrame, key_col: str, train_frac: float = 0.8) -> DataFrame:
    """Adds a ``split`` column ('train'/'test') determined solely by the
    key's md5 — stable across engines, runs, and repartitions."""
    if not 0.0 < train_frac < 1.0:
        raise ValueError(f"train_frac must be in (0, 1), got {train_frac}")
    # NB: a 3-hex-digit threshold ('100') would compare lexicographically
    # against the 32-char digest and no longer mean a prefix fraction
    threshold = format(min(255, int(train_frac * 256)), "02x")
    return df.withColumn(
        "split",
        F.when(_key_digest(key_col) < F.lit(threshold), F.lit("train")).otherwise(F.lit("test")),
    )


def deterministic_sample(df: DataFrame, key_col: str, frac: float) -> DataFrame:
    """Content-hash Bernoulli sample of ~frac rows."""
    if frac >= 1.0:
        return df
    if frac <= 0.0:
        return df.limit(0)
    threshold = format(max(1, min(65535, int(frac * 65536))), "04x")
    return df.filter(_key_digest(key_col) < F.lit(threshold))


def stratified_sample_exact(
    df: DataFrame, stratum_col: str, key_col: str, k_per_stratum: int
) -> DataFrame:
    """Exactly k rows per stratum, chosen by hash order (deterministic
    'random' order) — row_number over (stratum, digest)."""
    w = Window.partitionBy(stratum_col).orderBy(_key_digest(key_col), F.col(key_col))
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k_per_stratum)
        .drop("_rn")
    )


def balance_labels(df: DataFrame, label_col: str, key_col: str) -> DataFrame:
    """Class-balanced downsample: every label keeps exactly the size of
    the SMALLEST class, rows chosen by hash order (deterministic across
    engines/partitionings).  One shuffle for the per-class window plus
    a broadcast one-row minimum — the standard label-balancing step
    before training.  Skew-safe: the window partitions on the label,
    whose per-partition size is the class size (bounded by the corpus's
    class distribution, not by a hot join key)."""
    min_cnt = df.groupBy(label_col).agg(F.count(F.lit(1)).alias("_c")).agg(
        F.min("_c").alias("_min_c")
    )
    w = Window.partitionBy(label_col).orderBy(_key_digest(key_col), F.col(key_col))
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .crossJoin(F.broadcast(min_cnt))
        .filter(F.col("_rn") <= F.col("_min_c"))
        .drop("_rn", "_min_c")
    )


def winsorize(
    df: DataFrame, value_col: str, group_col: str | None = None, lo: float = 0.05, hi: float = 0.95
) -> DataFrame:
    """Percentile winsorization (clamp to the [lo, hi] exact-percentile
    fences, optionally per group) — the outlier-taming twin of the
    IQR filter: instead of DROPPING extreme rows it clips them, keeping
    row counts stable for downstream joins.  Adds ``{value_col}_w``.
    Fences are a tiny aggregate (one row per group) broadcast back.

    Fences are rounded to 6dp (the repo's ``dround`` discipline, same
    as bigram PMI): Spark ``percentile`` and an external engine's
    ``quantile_cont`` both interpolate in double and are not guaranteed
    bit-identical, so a 1-ulp fence difference would otherwise leak
    into the clipped values on unfriendly inputs."""
    from ..functions import dround

    keys = [group_col] if group_col else []
    fences = df.groupBy(*keys).agg(
        dround(F.percentile(value_col, lo), 6).alias("_lo"),
        dround(F.percentile(value_col, hi), 6).alias("_hi"),
    )
    joined = (
        df.join(F.broadcast(fences), keys) if keys else df.crossJoin(F.broadcast(fences))
    )
    clipped = F.least(F.greatest(F.col(value_col), F.col("_lo")), F.col("_hi"))
    return joined.withColumn(f"{value_col}_w", clipped).drop("_lo", "_hi")


def length_histogram(df: DataFrame, value_col: str, bucket_width: int) -> DataFrame:
    """Fixed-width histogram of a numeric column."""
    bucket = (F.floor(F.col(value_col) / bucket_width) * bucket_width).cast("long")
    return (
        df.groupBy(bucket.alias("bucket_lo"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cluster_aware_split(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    train_frac: float = 0.8,
    id_a: str = "doc_a",
    id_b: str = "doc_b",
) -> DataFrame:
    """Near-dup-aware train/test split: every member of a duplicate
    cluster inherits the split of its CLUSTER REPRESENTATIVE (the
    cluster-minimum id), so near-duplicates can never straddle the
    split boundary — the leakage mode a plain id-hash split permits
    (a test doc nearly identical to a train doc silently inflates
    eval metrics; the standard fix in dedup-aware corpus pipelines).
    Docs in no cluster split by their own id, so for a dup-free corpus
    the result is byte-identical to ``train_test_split``.

    Shape: ``components.dup_clusters`` over the pair list (O(log d)
    label-propagation rounds), then a left join of the cluster map
    back onto the corpus — the cluster map is |clustered docs| rows,
    tiny relative to the corpus, so AQE broadcasts it.  Determinism is
    inherited: the split key is a cluster-min id hashed with the same
    md5 rule, stable across engines/partitionings."""
    if not 0.0 < train_frac < 1.0:
        raise ValueError(f"train_frac must be in (0, 1), got {train_frac}")
    from .components import dup_clusters

    clusters = dup_clusters(pairs, id_a, id_b).select(
        F.col("doc_id").alias(id_col), "cluster_id"
    )
    keyed = docs.join(clusters, id_col, "left").withColumn(
        "_split_key", F.coalesce(F.col("cluster_id"), F.col(id_col))
    )
    threshold = format(min(255, int(train_frac * 256)), "02x")
    return (
        keyed.withColumn(
            "split",
            F.when(_key_digest("_split_key") < F.lit(threshold), F.lit("train")).otherwise(
                F.lit("test")
            ),
        )
        .drop("_split_key")
    )


def sample_to_token_budget(
    df: DataFrame, key_col: str, weight_col: str, budget: int
) -> DataFrame:
    """Greedy deterministic budget fill: rows in content-hash order are
    kept while the running weight total is under ``budget`` (the row
    that crosses the budget is included, standard greedy fill) — the
    "give me N training tokens" sampler.  Adds ``cum_weight``.

    Scale shape: a single global ordered cumsum would be a one-task
    window.  Instead the digest's first byte buckets rows into ≤256
    groups whose (bucket, digest) order EQUALS global digest order (the
    bucket is a digest prefix): per-bucket windows run in parallel, and
    the cross-bucket offsets come from a ≤256-row aggregate broadcast
    back — two narrow shuffles bounded by the bucket count, never a
    global sort.  Weights are summed as integers, so the cumsum is
    exact and engine-identical."""
    if budget <= 0:
        return df.withColumn("cum_weight", F.lit(0).cast("bigint")).limit(0)
    return _digest_order_cumsum(df, key_col, weight_col).filter(
        F.col("cum_weight") - F.col(weight_col) < F.lit(budget)
    )


def _digest_order_cumsum(df: DataFrame, key_col: str, weight_col: str) -> DataFrame:
    """The shared bucketed-cumsum scaffolding of the budget sampler and
    the shard packer: exact running weight totals in global
    content-digest order, parallel by the digest's first byte (≤256
    buckets whose (bucket, digest) order equals global digest order;
    per-bucket windows + a broadcast ≤256-row offset join — never a
    global sort).  Adds ``cum_weight``; ONE implementation, so the two
    consumers' orders can never drift apart."""
    d = df.withColumn("_dig", _key_digest(key_col)).withColumn(
        "_bkt", F.substring("_dig", 1, 2)
    )
    totals = d.groupBy("_bkt").agg(F.sum(weight_col).alias("_btot"))
    w_off = Window.orderBy("_bkt").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.withColumn(
        "_off", F.coalesce(F.sum("_btot").over(w_off), F.lit(0))
    ).select("_bkt", "_off")
    w_in = (
        Window.partitionBy("_bkt")
        .orderBy("_dig", key_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        d.join(F.broadcast(offsets), "_bkt")
        .withColumn("cum_weight", F.col("_off") + F.sum(weight_col).over(w_in))
        .drop("_dig", "_bkt", "_off")
    )


def pack_to_shards(
    df: DataFrame, key_col: str, weight_col: str, shard_weight: int
) -> DataFrame:
    """Greedy sequential sharding for training-data packing: rows in
    content-hash order are assigned to fixed ``shard_weight``-wide
    spans of the running total — shard s owns the rows whose cumsum
    STARTS in [s·W, (s+1)·W), so the crossing row stays in the shard
    it started (the same keep-the-crossing-row convention as
    ``sample_to_token_budget``).  Every shard except the last totals
    within one row's weight of W on either side (it inherits the
    previous shard's overhang and donates its own): total ∈
    (W − w_max, W + w_max), pinned numerically in tests.  Adds
    ``shard_id`` and ``cum_weight``.
    Deterministic on any engine/partitioning (content-digest order),
    exact integer arithmetic: shard_id = (cum_weight − weight) DIV
    shard_weight.

    This is the sharding discipline, not per-sequence packing: it cuts
    a corpus into ≥shard_weight-token training shards in one pass.
    Scale shape is the shared bucketed cumsum (see
    ``_digest_order_cumsum``) plus one integer division — no global
    sort, no sequential state."""
    if shard_weight <= 0:
        raise ValueError(f"shard_weight must be > 0, got {shard_weight}")
    # integer `div`, not float `/`+cast: cum_weight is an exact long
    # and must stay exact past 2^53 (corpus-scale token totals);
    # backticks keep non-bare column names working (r17 review)
    return _digest_order_cumsum(df, key_col, weight_col).withColumn(
        "shard_id",
        F.expr(f"(cum_weight - `{weight_col}`) div {int(shard_weight)}"),
    )


def mixture_weights(df: DataFrame, group_col: str, weight_col: str) -> DataFrame:
    """Temperature-smoothed source-mixture weights (count^0.5, i.e.
    T=2 smoothing à la multilingual-LM sampling): per group, the doc
    count, exact token total, natural share, and the smoothed weight
    RELATIVE to the largest group.  The exponent is fixed at 0.5
    because sqrt is IEEE-correctly-rounded in every engine (a general
    pow(x, α) differs by ulps across libm implementations and would
    break oracle bit-equality).

    One shuffle on the group key; the totals are a 1-row broadcast."""
    per = df.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum(weight_col).alias("n_tokens")
    )
    tot = per.agg(F.sum("n_tokens").alias("_tot"), F.max("n_tokens").alias("_mx"))
    return per.crossJoin(F.broadcast(tot)).select(
        group_col,
        "n_docs",
        "n_tokens",
        # try_divide: an all-zero-weight corpus has _tot=_mx=0; the
        # weights are NULL for that degenerate case instead of NaN.
        # Normal path divides identically, so oracle equality holds.
        F.try_divide(
            F.col("n_tokens").cast("double"), F.col("_tot").cast("double")
        ).alias("natural_share"),
        F.sqrt(
            F.try_divide(F.col("n_tokens").cast("double"), F.col("_mx").cast("double"))
        ).alias("smoothed_rel_weight"),
    )


def weighted_sample(df: DataFrame, key_col: str, prob_col) -> DataFrame:
    """Deterministic weighted Bernoulli sample: keep a row iff the
    uniform-in-[0,1) fraction derived from the key's md5 is below the
    row's keep-probability — importance resampling (e.g. keep docs
    with probability = quality score) that is content-deterministic
    like every sampler here: same row, same verdict, on any engine,
    partitioning, or run.

    The uniform variate is the first 8 hex digits of the digest scaled
    by 2^-32 — exactly representable arithmetic, so the comparison is
    engine-identical.  Pure filter, no shuffle."""
    prob = F.col(prob_col) if isinstance(prob_col, str) else prob_col
    u = F.conv(F.substring(_key_digest(key_col), 1, 8), 16, 10).cast("double") / F.lit(
        4294967296.0
    )
    return df.filter(u < prob)


def weighted_reservoir(
    df: DataFrame,
    group_cols: "list[str]",
    k: int,
    weight_col: str,
    id_col: str = "doc_id",
    round_dp: int = 12,
) -> DataFrame:
    """Deterministic fixed-size weighted sample per group —
    Efraimidis–Spirakis A-Res (2006): each row draws key = u^(1/w)
    with u uniform in (0, 1]; the k largest keys per group are the
    sample, and inclusion probabilities are exactly proportional-to-
    weight without replacement.  The verb ``weighted_sample``
    (Bernoulli, variable output size) cannot provide: "give me
    EXACTLY k eval docs per language, long docs favored".

    Deterministic, not pseudo-random: u derives from the Knuth
    multiplicative hash of the id (operators/similarity.knuth_key —
    the PQ anchor discipline, cross-engine-pinned over all int64
    ids), so the sample is reproducible from content alone and an
    oracle can replay it.  pow() differs by ≤1 ulp across libms, so
    the key is dround(round_dp)-ed and ties break on the id — the
    ln()/idf discipline applied to sampling.

    One window per group partition — no global sort, no collect;
    rows with non-positive or NULL weight are excluded (u^(1/w) is
    undefined there), mirrored in the oracle.
    """
    from .similarity import knuth_key

    w = F.col(weight_col).cast("double")
    u = (knuth_key(F.col(id_col)).cast("double") + F.lit(1.0)) / F.lit(4294967296.0)
    key = F.floor(F.pow(u, F.lit(1.0) / w) * F.lit(float(10**round_dp)) + F.lit(0.5)) / F.lit(
        float(10**round_dp)
    )
    win = Window.partitionBy(*group_cols).orderBy(
        F.col("_res_key").desc(), F.col(id_col)
    )
    return (
        df.filter(F.col(weight_col).isNotNull() & (F.col(weight_col) > 0))
        .withColumn("_res_key", key)
        .withColumn("_rn", F.row_number().over(win))
        .filter(F.col("_rn") <= k)
        .select(*group_cols, id_col, weight_col, F.col("_res_key").alias("sample_key"))
    )
