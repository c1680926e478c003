"""Deterministic sampling / dataset splitting for training pipelines.

Random seeds don't survive engine changes, retries, or re-partitioning —
a training split must be a pure function of the record key so that every
engine, every rerun, and every incremental refresh lands each record on
the same side. The standard trick: hash the key, threshold the hash.

Hash = md5 (engine-independent, already the fingerprint primitive used
by the dedup operators); the first 4 hex chars give 65536 buckets, and
the split threshold is expressed AS a hex string so both Spark and the
DuckDB oracle compare strings — no numeric hex conversion needed on
either side. Row-local, zero shuffle; the test fraction granularity is
1/65536.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _require_free_columns(df: DataFrame, names: list[str], op: str) -> None:
    """Output/internal column collisions must fail loudly: silently
    overwriting a caller's column (or dropping it with the internal
    scratch) corrupts data in a way no test downstream would attribute
    to the sampler."""
    clash = [n for n in names if n in df.columns]
    if clash:
        raise ValueError(
            f"{op}: input already has column(s) {clash}; rename them — "
            f"these names are reserved for the operator's output/scratch"
        )


def split_threshold_hex(test_frac: float) -> str:
    """The 4-hex-char cutoff under which a key lands in the test split."""
    if not 0.0 <= test_frac <= 1.0:
        raise ValueError("test_frac must be in [0, 1]")
    if test_frac >= 1.0:
        # 'zzzz' compares above every 4-hex-char bucket; the numeric
        # threshold 0x10000 would render as 5 chars and string-compare
        # BELOW 4-char buckets ('ffff' > '10000' lexicographically).
        return "zzzz"
    return format(int(round(test_frac * 0x10000)), "04x")


def split_col(key: Column | str, test_frac: float) -> Column:
    """'test' / 'train' label column, deterministic in the key."""
    key = F.col(key) if isinstance(key, str) else key
    bucket = F.substring(F.md5(key.cast("string")), 1, 4)
    return F.when(bucket < split_threshold_hex(test_frac), F.lit("test")).otherwise(
        F.lit("train")
    )


def deterministic_split(
    df: DataFrame, key_col: str, test_frac: float = 0.1
) -> DataFrame:
    """Tag every row with its split; filter on ``split`` downstream.

    Key-hashed (not row-hashed): all rows of one key land on one side,
    which is what prevents train/test leakage of near-identical records
    sharing a key (the same reason dedup precedes splitting in a real
    pipeline)."""
    _require_free_columns(df, ["split"], "deterministic_split")
    return df.withColumn("split", split_col(key_col, test_frac))


def stratified_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
) -> DataFrame:
    """Deterministic per-stratum downsampling — the domain-mixing
    primitive of training-data curation (keep 100% of books, 30% of
    common-crawl, ...). Each stratum gets its own md5-prefix threshold,
    so the sample is a pure function of (key, stratum): rerun-stable,
    engine-independent, and refreshable incrementally (new rows join the
    sample or not without disturbing prior rows — a seeded
    ``df.sampleBy`` re-draws everything on every re-partitioning).

    Adds ``weight`` = 1/rate (Horvitz-Thompson inverse-probability
    weight) so downstream aggregates stay unbiased after sampling.

    Row-local: the threshold lookup is a broadcast-free CASE chain over
    the (tiny, driver-known) rates map; no shuffle, fully pushdown-safe.
    """
    _require_free_columns(df, ["weight"], "stratified_sample")
    key = F.col(key_col)
    bucket = F.substring(F.md5(key.cast("string")), 1, 4)
    thr = F.lit(split_threshold_hex(default_rate))
    rate = F.lit(round(default_rate, 6))
    for stratum, r in sorted(rates.items()):
        cond = F.col(strata_col) == stratum
        thr = F.when(cond, F.lit(split_threshold_hex(r))).otherwise(thr)
        rate = F.when(cond, F.lit(round(r, 6))).otherwise(rate)
    return df.filter(bucket < thr).withColumn("weight", F.round(F.lit(1.0) / rate, 4))


def priority_sample(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    k: int = 100,
) -> DataFrame:
    """Weighted top-k sampling without replacement via *priority
    sampling* (Duffield–Lund–Thorup): each row gets priority = w / u
    with u uniform in (0, 1], and the k largest priorities form the
    sample — inclusion probability is proportional to weight, and the
    scheme is the order-statistic dual of Efraimidis–Spirakis u^(1/w)
    (same sample, monotone transform) while using ONE division instead
    of a transcendental pow/log, so the arithmetic is correctly-rounded
    IEEE and bit-identical across engines.

    u is derived from md5(key): the first 6 hex chars as an integer v in
    [0, 16^6), u = (v+1)/16^6 — deterministic in the key like every
    sampler in this module (rerun-stable, engine-independent, no seed).
    priority = w * 16^6 / (v+1) keeps it to one multiply + one divide.

    Shape: row-local projection + global top-k. Spark compiles
    orderBy().limit(k) to TakeOrderedAndProject — per-partition heaps of
    k rows, only k rows per partition reach the driver-side merge; no
    full sort, no shuffle of the data. The 100 TB cost is exactly one
    scan.

    ``priority`` is a documented output column (downstream HT-style
    reweighting wants it); an input already carrying that name raises
    rather than being silently overwritten."""
    _require_free_columns(df, ["priority"], "priority_sample")
    key = F.col(key_col)
    v = F.conv(F.substring(F.md5(key.cast("string")), 1, 6), 16, 10).cast("bigint")
    priority = F.col(weight_col).cast("double") * F.lit(16777216.0) / (v + F.lit(1)).cast(
        "double"
    )
    return (
        df.withColumn("priority", F.round(priority, 4))
        .orderBy(F.col("priority").desc(), key.asc())
        .limit(k)
    )


def priority_sample_per_stratum(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    strata_col: str,
    k: int = 20,
) -> DataFrame:
    """Weighted top-k WITHIN each stratum (the per-domain form of
    :func:`priority_sample`): same md5-derived priority = w·16^6/(v+1),
    ranked by a window partitioned on the stratum — every domain
    contributes exactly min(k, n_domain) rows, weight-proportionally.
    One shuffle on the stratum key; the per-partition sort is bounded by
    the largest stratum (at 100 TB pre-filter each stratum with a
    row-local priority threshold ≈ k-th expected priority, then rank
    only the survivors — same two-phase refinement as sqrt_cap_sample).

    ``priority`` is a documented output column; the rank scratch is the
    collision-safe ``__rk`` and is dropped. Inputs already carrying
    either name raise rather than being silently clobbered."""
    _require_free_columns(df, ["priority", "__rk"], "priority_sample_per_stratum")
    key = F.col(key_col)
    v = F.conv(F.substring(F.md5(key.cast("string")), 1, 6), 16, 10).cast("bigint")
    priority = F.col(weight_col).cast("double") * F.lit(16777216.0) / (
        v + F.lit(1)
    ).cast("double")
    w = Window.partitionBy(strata_col).orderBy(
        F.col("priority").desc(), key.asc()
    )
    return (
        df.withColumn("priority", F.round(priority, 4))
        .withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= k)
        .drop("__rk")
    )


def sqrt_cap_sample(
    df: DataFrame,
    key_col: str,
    domain_col: str,
    scale: float = 10.0,
) -> DataFrame:
    """Temperature-flattening domain sampler: each domain keeps at most
    ``ceil(scale * sqrt(n_domain))`` rows — big domains are downsampled
    toward the square root of their size, small domains pass through
    whole. This is the mixture-flattening move of multi-source training
    corpora (common-crawl must not drown the long tail) expressed with
    NO cross-domain normalization: the quota is a pure per-domain
    function, so it avoids global-sum floating-point that could differ
    between engines (sqrt and ceil are exact; pow(n, alpha) is not
    correctly-rounded and round-trips differently across libm builds).

    Which rows survive is deterministic in (key, domain): rows are
    ranked within their domain by (md5(key), key) and the smallest-hash
    ``quota`` rows win — rerun-stable and engine-independent, like every
    sampler in this module.

    Shape: one tiny per-domain count aggregate (broadcast back) + one
    rank window partitioned by domain. At 100 TB the window's
    per-domain sort is the cost; the scale refinement is a two-phase
    pick — row-local hash-threshold prefilter at quota/n with slack,
    exact rank only over the survivors — which trades a second tiny
    aggregate for sorting ~quota rows instead of n. The single-window
    form here is the exactly-oracle-mirrorable one.
    """
    _require_free_columns(df, ["_dom", "_n", "_quota", "_rk"], "sqrt_cap_sample")
    key, dom = F.col(key_col), F.col(domain_col)
    counts = df.groupBy(dom.alias("_dom")).agg(F.count(F.lit(1)).alias("_n"))
    quota = counts.select(
        "_dom", F.ceil(F.lit(float(scale)) * F.sqrt(F.col("_n"))).alias("_quota")
    )
    w = Window.partitionBy(dom).orderBy(F.md5(key.cast("string")).asc(), key.asc())
    return (
        df.join(F.broadcast(quota), dom == F.col("_dom"))
        .withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= F.col("_quota"))
        .drop("_dom", "_quota", "_rk")
    )


def shard_assignment(
    key: Column | str, n_shards: int
) -> tuple[Column, Column]:
    """Deterministic training-shard assignment: returns the (shard,
    sort_key) column pair of the global pseudo-shuffle a training-data
    export needs. shard = md5(key) mod n_shards; sort_key = the md5
    digest itself, so ordering within a shard is a stable pseudo-random
    permutation of the corpus — decorrelated from ingest order, which
    is what shuffled training shards exist for.

    Like every sampler in this module: hash-derived, no RNG state — a
    rerun, a retry, or a different input partitioning produces the
    SAME shard layout, and appending new documents never moves an
    existing one (per-key assignment). The writer shape at 100 TB is
    ``df.repartitionByRange(n_shards, shard, sort_key)`` +
    ``sortWithinPartitions(sort_key)`` + a partitioned write: exactly
    one shuffle, and range partitioning on the uniform md5 key gives
    even shard sizes without a skew pass."""
    key = F.col(key) if isinstance(key, str) else key
    sort_key = F.md5(key.cast("string"))
    shard = F.conv(F.substring(sort_key, 1, 6), 16, 10).cast("int") % n_shards
    return shard, sort_key
