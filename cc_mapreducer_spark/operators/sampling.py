"""Deterministic sampling & dataset-split operators for training-data
pipelines.

Everything here is HASH-derived, never ``rand()``: a training pipeline
needs splits and samples that are (a) reproducible across reruns and
engines, (b) stable under task retries and repartitioning, and (c)
consistent when the corpus grows (a document keeps its split forever —
md5 of its key, not its position). Each operator is a pure DataFrame
expression (JVM built-ins, no UDFs) and is DuckDB-expressible, so the
local oracle gate (tests/test_sampling.py) hash-verifies every one.

Scale notes (100 TB):
  * split / bernoulli sampling are per-row map stages — zero shuffle,
    fully pushed into the scan's whole-stage codegen span.
  * stratified sampling shuffles once on the strata key (window
    row_number); skewed strata are the known pathology — the window is
    rank-only (no full sort of values, just the hash order within each
    stratum) and AQE skew-split applies. Fraction-based selection needs
    every row ranked, so sharding buys nothing there.
  * domain_quota (fixed k per group) is skew-IMMUNE: it runs as
    grouped_topk's two bounded window passes — top-k per (group, shard)
    then top-k of <= shards*k survivors — so a dominant domain never
    single-partitions.
  * uniform_topk is a distributed TakeOrdered: per-partition top-k then
    a k-row driver merge — never a global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

# md5 -> first 8 hex chars -> u32 -> [0, 1). Cross-engine: DuckDB
# ('0x' || substr(md5(x),1,8))::BIGINT / 4294967296.0 is bit-identical
# (exact integer numerator over a power-of-two denominator).
_U32 = 4294967296.0


def _unit_hash(key: F.Column, salt: str) -> F.Column:
    """Deterministic uniform [0,1) from a key column + salt literal."""
    return (
        F.conv(F.substring(F.md5(F.concat(F.lit(salt + ":"), key.cast("string"))), 1, 8), 16, 10)
        .cast("bigint")
        / F.lit(_U32)
    )


def deterministic_split(
    df: DataFrame, key: str, weights: dict[str, float], salt: str = "split-v1"
) -> DataFrame:
    """Assign every row to a named split (train/val/test/...) by hashing
    its key into [0,1) and cutting at the cumulative weights. Adds a
    ``split`` string column; weights must sum to ~1.

    The salt versions the assignment: changing it reshuffles every row's
    split, keeping it re-derives the identical split years later."""
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1, got {total}")
    u = _unit_hash(F.col(key), salt)
    expr = None
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name]
        branch = F.when(u < F.lit(acc), F.lit(name))
        expr = branch if expr is None else expr.when(u < F.lit(acc), F.lit(name))
    expr = F.lit(names[0]) if expr is None else expr.otherwise(F.lit(names[-1]))
    return df.withColumn("split", expr)


def bernoulli_sample(
    df: DataFrame, key: str, fraction: float, salt: str = "sample-v1"
) -> DataFrame:
    """Keep ~fraction of rows, chosen by key hash — the deterministic,
    retry-stable replacement for ``df.sample()``. Zero shuffle."""
    return df.filter(_unit_hash(F.col(key), salt) < F.lit(fraction))


def stratified_exact_sample(
    df: DataFrame, strata: str, key: str, fraction: float, salt: str = "strata-v1"
) -> DataFrame:
    """EXACTLY ceil(fraction * n) rows per stratum (vs sampleBy's
    binomial noise): rank rows within each stratum by key hash and keep
    the first ceil(fraction * n). One shuffle on the strata column.

    The target is ceil(round(n*f, 9)): raw IEEE n*f can land a hair
    ABOVE the exact product (100 * 0.07 = 7.000000000000001), and a bare
    ceil would then overshoot the contract by one row; a 1e-9 snap
    restores real-number ceil for every representable fraction while
    still rounding genuine fractional products up."""
    w = Window.partitionBy(strata).orderBy(_unit_hash(F.col(key), salt), key)
    n = Window.partitionBy(strata)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .withColumn("__n", F.count("*").over(n))
        .filter(F.col("__rn") <= F.ceil(F.round(F.col("__n") * F.lit(fraction), 9)))
        .drop("__rn", "__n")
    )


def grouped_topk(
    df: DataFrame,
    group: str,
    order_cols: list,
    k: int,
    shard_key: str,
    shards: int = 32,
) -> DataFrame:
    """EXACT per-group top-k that never funnels a hot group through one
    task. A plain ``Window.partitionBy(group)`` sorts each group's
    entire row set in a single partition — at 100 TB one dominant
    domain (a crawl's top site, the majority language) is billions of
    rows through one sorter. Two bounded passes instead:

      1. shard every group ``shards`` ways by hashing ``shard_key``
         (placement only — never semantics) and take the top-k of each
         (group, shard) slice; every slice is ~1/shards of its group;
      2. re-rank the <= shards*k survivors per group and keep k.

    Exactness: any row in a group's true top-k is also in the top-k of
    whichever shard holds it (a shard is a subset), so pass 1 never
    discards a winner. ``order_cols`` must be a total order within each
    group (tie-break on a unique key) or ranks are nondeterministic.
    Pass 2's window sees at most shards*k rows per group — bounded by
    construction, skew-immune."""
    shard = F.pmod(F.xxhash64(F.col(shard_key)), F.lit(shards))
    w1 = Window.partitionBy(group, "__shard").orderBy(*order_cols)
    w2 = Window.partitionBy(group).orderBy(*order_cols)
    return (
        df.withColumn("__shard", shard)
        .withColumn("__rn", F.row_number().over(w1))
        .filter(F.col("__rn") <= k)
        .drop("__rn", "__shard")
        .withColumn("__rn", F.row_number().over(w2))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def domain_quota(
    df: DataFrame,
    domain: str,
    key: str,
    quota: int,
    salt: str = "quota-v1",
    shards: int = 32,
) -> DataFrame:
    """Cap every domain at ``quota`` rows (anti-boilerplate / source-mix
    control): hash-rank within domain, keep the first ``quota``. The
    kept subset is a uniform without-replacement sample of each
    over-quota domain.

    Executes via :func:`grouped_topk` (two bounded window passes), so a
    single over-represented domain never single-partitions — the r3
    "skewed strata" pathology noted in the module docstring is closed.
    Output is row-identical to the one-window formulation (and to the
    DuckDB oracle): sharding affects placement, never the rank order."""
    return grouped_topk(
        df,
        domain,
        [_unit_hash(F.col(key), salt), F.col(key)],
        quota,
        shard_key=key,
        shards=shards,
    )


def uniform_topk(df: DataFrame, key: str, k: int, salt: str = "topk-v1") -> DataFrame:
    """A uniform without-replacement sample of EXACTLY k rows (the
    deterministic reservoir): global top-k by key hash. Executes as
    TakeOrderedAndProject — per-partition heaps, k-row merge, no global
    sort."""
    return df.orderBy(_unit_hash(F.col(key), salt), key).limit(k)


def temperature_mixture_sample(
    df: DataFrame, domain: str, key: str, alpha: float, salt: str = "mix-v1"
) -> DataFrame:
    """Temperature-based source mixing (the alpha-sampling rule used to
    rebalance pretraining mixtures across domains/languages): keep each
    domain at rate r_d proportional to n_d^(alpha-1), normalized so the
    largest weight keeps rate 1.0.

      * alpha = 1  -> natural mix (keep everything)
      * alpha = 0  -> equalized mix (every domain's EXPECTED kept count
                      equals the smallest domain's size)
      * 0 < alpha < 1 -> dominant domains damped, tails up-weighted
                         relative to them

    Acceptance is the deterministic per-row key hash (retry/rerun/growth
    stable, like everything in this module). Cost at 100 TB: one tiny
    aggregate (n_domains rows, map-side combined) broadcast back onto
    the scan — the data itself never shuffles. The rate is rounded to
    1e-9 before the hash comparison so the DuckDB oracle's pow() agrees
    bit-for-bit (cross-engine libm drift is below the rounding grid)."""
    counts = df.groupBy(domain).agg(F.count("*").alias("__n"))
    w = counts.select(
        domain, F.pow(F.col("__n").cast("double"), F.lit(alpha - 1.0)).alias("__w")
    )
    wm = w.agg(F.max("__w").alias("__wm"))
    rates = w.crossJoin(F.broadcast(wm)).select(
        domain, F.round(F.col("__w") / F.col("__wm"), 9).alias("__rate")
    )
    return (
        df.join(F.broadcast(rates), domain)
        .filter(_unit_hash(F.col(key), salt) < F.col("__rate"))
        .drop("__rate")
    )


def weighted_topk(
    df: DataFrame,
    key: str,
    weight: str,
    k: int,
    salt: str = "wtopk-v1",
) -> DataFrame:
    """Weighted without-replacement sample of EXACTLY k rows
    (Efraimidis–Spirakis A-Res, 2006 — public method): each row draws
    u = unit_hash(key) and ranks by u^(1/w); the top-k by that score is
    distributed as weighted sampling without replacement. Same
    determinism contract as uniform_topk (u is hash-derived, so retries
    and repartitioning reproduce the identical sample; the WEIGHT
    column must itself be deterministic), same TakeOrdered plan shape
    (per-partition top-k then merge — never a global sort).

    Rows with weight <= 0 are excluded (they cannot be sampled).
    Score ties (measure-zero for distinct keys) break on the key."""
    u = _unit_hash(F.col(key), salt)
    score = F.pow(u, F.lit(1.0) / F.col(weight))
    return (
        df.filter(F.col(weight) > 0)
        .withColumn("__s", score)
        .orderBy(F.desc("__s"), key)
        .limit(k)
        .drop("__s")
    )
