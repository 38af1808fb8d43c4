"""HyperLogLog distinct-count sketches as deterministic column algebra.

At 100 TB "how many distinct users/URLs/documents per key" is a constant
need (per-tile uniques, per-source dedup rates, per-day reach) and an exact
``count(distinct ...)`` is one of the most expensive shapes Spark can run:
the shuffle carries every distinct value.  HyperLogLog (Flajolet et al.
2007) replaces it with a fixed ``m = 2**p`` register array per group —
the shuffle carries AT MOST ``m`` rows per group no matter how many
billions of values feed it, registers merge with ``max`` (so partial
sketches combine map-side, roll up across time/space hierarchies, and
re-aggregate without touching raw data), and the standard-error is
``1.04/sqrt(m)``.

Spark's built-in ``approx_count_distinct`` is the same algorithm, but its
hash is engine-private: no ANSI-SQL oracle can replay it, and a sketch
persisted by one engine is garbage to another.  This implementation uses
the repo-wide md5→60-bit-bigint hash and integer bit algebra only, so

- the register table is BIT-EXACT reproducible by DuckDB (the driver's
  correctness oracle replays sketch + merge + estimate),
- persisted register tables are a portable interchange format,
- every arithmetic step is deterministic at any partitioning: the only
  float work is the final harmonic mean, folded over ``array_sort``-ed
  exact powers of two (each ``2**-rho`` is exactly representable, IEEE
  addition in fixed order is engine-independent).

Register derivation for value ``v`` (word width ``W = 60 - p``):

- ``h  = 60-bit md5 bigint of "salt:v"``
- ``j  = h & (m-1)``                       (register index, low p bits)
- ``r  = h >> p``                          (W-bit suffix)
- ``rho = W - bit_length(r) + 1``          (leading-zero run + 1; W+1 at 0)

``bit_length`` is ``length(bin(r))`` — both engines print minimal binary.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, functions as F

HASH_BITS = 60


def _alpha(m: int) -> float:
    """Flajolet et al. 2007 bias-correction constant (same table DuckDB,
    Redis, and Spark's own HLL++ use for the raw estimator)."""
    if m <= 16:
        return 0.673
    if m <= 32:
        return 0.697
    if m <= 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def _hash60(value, salt: str):
    col = value if isinstance(value, Column) else F.col(value)
    tagged = F.concat(F.lit(salt + ":"), col.cast("string"))
    return F.conv(F.substring(F.md5(tagged), 1, 15), 16, 10).cast("bigint")


def hll_sketch(df: DataFrame, group_cols: Sequence[str], value_col: str, *,
               p: int = 10, salt: str = "hll") -> DataFrame:
    """Build per-group HLL register tables: ``(group…, j, rho)``.

    One hash + two bit ops per row, then a single ``groupBy`` whose
    ``max`` partially aggregates map-side — the shuffle carries at most
    ``m`` rows per group regardless of input cardinality (THE property
    that makes distinct-counting tractable at 100 TB).  Registers that no
    value hit are implicit (absent row == 0); ``hll_estimate`` accounts
    for them, keeping the table sparse for low-cardinality groups.

    ``p`` in [4, 16]: m = 2**p registers, relative error ~1.04/sqrt(m)
    (p=10 → ±3.2%).  NULL values are ignored (SQL ``count(distinct)``
    semantics).
    """
    out = hll_register_rows(df, group_cols, value_col, p=p, salt=salt)
    return out.groupBy(*group_cols, "j").agg(F.max("rho").alias("rho"))


def hll_register_rows(df: DataFrame, group_cols: Sequence[str],
                      value_col: str, *, p: int = 10,
                      salt: str = "hll") -> DataFrame:
    """Pre-aggregation register rows ``(group…, j, rho)`` — the map-side
    half of ``hll_sketch``, shared with the streaming face (which must
    hand the final ``max`` to Structured Streaming's windowed agg)."""
    if not 4 <= p <= 16:
        raise ValueError(f"p must be in [4, 16], got {p}")
    m = 1 << p
    w = HASH_BITS - p
    h = _hash60(value_col, salt)
    return df.where(F.col(value_col).isNotNull()).select(
        *[F.col(g) for g in group_cols],
        h.alias("_h"),
    ).select(
        *group_cols,
        F.col("_h").bitwiseAND(F.lit(m - 1)).cast("int").alias("j"),
        F.expr("shiftright(_h, {p})".format(p=p)).alias("_r"),
    ).select(
        *group_cols,
        "j",
        F.when(F.col("_r") == 0, F.lit(w + 1))
         .otherwise(F.lit(w + 1) - F.length(F.expr("bin(_r)")))
         .cast("int").alias("rho"),
    )


def hll_merge(registers: DataFrame,
              group_cols: Sequence[str]) -> DataFrame:
    """Merge sketches by register-wise ``max`` under a coarser grouping.

    ``max`` is associative/commutative/idempotent, so merged registers are
    IDENTICAL to the sketch built directly from the union of the inputs —
    no approximation is added by merging.  This is the rollup primitive:
    child tiles → parent tile, daily → monthly, per-partition partials →
    global, all without rescanning raw data.
    """
    return registers.groupBy(*group_cols, "j").agg(F.max("rho").alias("rho"))


def hll_estimate(registers: DataFrame, group_cols: Sequence[str], *,
                 p: int) -> DataFrame:
    """Estimate per-group distinct counts from a register table.

    Output: ``(group…, n_registers_used, sum_rho, distinct_est)`` —
    the two integer columns are exact digests of the register state (for
    cross-engine comparison and drift checks), ``distinct_est`` is the
    HLL estimate rounded to 4 dp.

    Determinism: each ``2**-rho`` term is ``1.0 / (1 << rho)`` — an exact
    power of two — and the harmonic sum folds the ``array_sort``-ed term
    list, so the double is bit-identical at any partitioning and in any
    IEEE-754 engine.  Small-range (linear counting) correction applies
    below ``2.5*m`` with empty registers present, per the paper.
    """
    m = 1 << p
    alpha = _alpha(m)
    terms = F.array_sort(F.collect_list(F.expr(
        "1.0 / cast(shiftleft(cast(1 as bigint), rho) as double)")))
    agg = registers.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("int").alias("n_registers_used"),
        F.sum("rho").cast("bigint").alias("sum_rho"),
        F.aggregate(terms, F.lit(0.0),
                    lambda acc, x: acc + x).alias("_sum_present"),
    )
    zeros = F.lit(m) - F.col("n_registers_used")
    sum_inv = F.col("_sum_present") + zeros.cast("double")
    raw = F.lit(alpha * m * m) / sum_inv
    est = F.when((raw <= F.lit(2.5 * m)) & (zeros > 0),
                 F.lit(float(m)) * F.log(F.lit(float(m)) / zeros))\
           .otherwise(raw)
    return agg.select(
        *group_cols,
        "n_registers_used",
        "sum_rho",
        F.round(est, 4).alias("distinct_est"),
    )


# ---------------------------------------------------------------------------
# Count-min sketch (Cormode & Muthukrishnan 2005) — frequency companion
# ---------------------------------------------------------------------------


def cms_sketch(df: DataFrame, group_cols: Sequence[str], value_col: str, *,
               width_bits: int = 10, depth: int = 4,
               weight_col: str | None = None,
               salt: str = "cms") -> DataFrame:
    """Build per-group count-min register tables: ``(group…, d, j, cnt)``.

    The frequency twin of ``hll_sketch``: "how often does each value
    occur per key" without carrying per-value rows.  Each input row adds
    its weight (default 1) to one counter per hash row ``d`` — a single
    ``groupBy … sum`` whose partials combine map-side, so the shuffle
    carries at most ``depth * 2**width_bits`` rows per group no matter
    how many billions of values feed it.  Point-query error is one-sided
    (over-count only), bounded by ``e/width * N`` with probability
    ``1 - e**-depth`` (Cormode & Muthukrishnan 2005).

    Counters are exact integers from the repo-wide md5→60-bit hash —
    bit-identical at any partitioning and in any engine, so a DuckDB
    oracle rebuilds the register table exactly and persisted sketches are
    a portable interchange format (same contract as the HLL registers).
    Registers no value hit are implicit zeros (absent row == 0).
    """
    if not 4 <= width_bits <= 20:
        raise ValueError(f"width_bits must be in [4, 20], got {width_bits}")
    if not 1 <= depth <= 8:
        raise ValueError(f"depth must be in [1, 8], got {depth}")
    w = 1 << width_bits
    weight = (F.col(weight_col) if weight_col is not None
              else F.lit(1)).cast("bigint")
    rows = df.where(F.col(value_col).isNotNull()).select(
        *group_cols,
        weight.alias("_w"),
        F.posexplode(F.array(*[
            _hash60(value_col, f"{salt}{d}")
            .bitwiseAND(F.lit(w - 1)).cast("int")
            for d in range(depth)
        ])).alias("d", "j"),
    )
    return rows.groupBy(*group_cols, "d", "j").agg(
        F.sum("_w").alias("cnt"))


def cms_merge(registers: DataFrame, group_cols: Sequence[str]) -> DataFrame:
    """Merge sketches by counter-wise ``sum`` under a coarser grouping.

    Counters are linear, so the merged sketch is IDENTICAL to the sketch
    built directly from the union of the inputs — the same exact-rollup
    property as ``hll_merge`` (child tiles → parent, daily → monthly,
    partition partials → global) without rescanning raw data.
    """
    return registers.groupBy(*group_cols, "d", "j").agg(
        F.sum("cnt").alias("cnt"))


def cms_query(registers: DataFrame, probes: DataFrame,
              group_cols: Sequence[str], value_col: str, *,
              width_bits: int = 10, depth: int = 4,
              salt: str = "cms") -> DataFrame:
    """Point-query a register table: ``(group…, value, est)``.

    ``probes`` carries ``group_cols + value_col`` (cross small panels
    against the group list caller-side).  Each probe explodes to its
    ``depth`` register coordinates, left-joins the register table on
    ``(group…, d, j)`` (absent counter == 0), and takes the row-wise
    ``min`` — never an over-count below the true frequency.  The probe
    side is the small one; at 100 TB the register table is the
    pre-aggregated standing index and each query panel is a bounded
    broadcast-shaped join.
    """
    w = 1 << width_bits
    probe = probes.select(
        *group_cols,
        F.col(value_col).alias("_v"),
        F.posexplode(F.array(*[
            _hash60(value_col, f"{salt}{d}")
            .bitwiseAND(F.lit(w - 1)).cast("int")
            for d in range(depth)
        ])).alias("d", "j"),
    )
    est = probe.join(registers, [*group_cols, "d", "j"], "left")
    return (
        est.groupBy(*group_cols, "_v")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).cast("bigint")
             .alias("est"))
        .withColumnRenamed("_v", value_col)
    )


# ---------------------------------------------------------------------------
# Fixed-grid histogram sketch — mergeable quantiles
# ---------------------------------------------------------------------------


def hist_sketch(df: DataFrame, group_cols: Sequence[str], value_col: str, *,
                lo: float, hi: float, bins: int = 256) -> DataFrame:
    """Build per-group fixed-grid histograms: ``(group…, bin, cnt)``.

    The quantile member of the sketch family (HLL = distinct, CMS =
    frequency, this = distribution).  Spark's ``approx_percentile`` is a
    per-engine KLL variant no oracle can replay and no other system can
    merge; a fixed ``[lo, hi) / bins`` grid gives up adaptivity for the
    two properties that matter in a multi-engine 100 TB pipeline:
    registers are EXACT integers any engine rebuilds bit-for-bit, and
    sketches merge by plain counter addition (identical to sketching the
    union — the rollup property).  Quantile error is bounded by one bin
    width, chosen by the caller who knows the value domain (doc lengths,
    prices, latencies...).

    One partial+final ``groupBy … count``: the shuffle carries at most
    ``bins`` rows per group at any input size.  Values outside
    ``[lo, hi)`` clamp into the edge bins (they count, with saturated
    position); NULLs are ignored.
    """
    if bins < 2 or not hi > lo:
        raise ValueError("need bins >= 2 and hi > lo")
    v = F.col(value_col).cast("double")
    idx = F.floor((v - F.lit(lo)) / F.lit(hi - lo) * F.lit(bins)).cast("long")
    b = F.greatest(F.lit(0), F.least(F.lit(bins - 1), idx))
    return (
        df.where(v.isNotNull())
        .select(*group_cols, b.cast("int").alias("bin"))
        .groupBy(*group_cols, "bin")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )


def hist_merge(registers: DataFrame, group_cols: Sequence[str]) -> DataFrame:
    """Merge histograms by bin-wise ``sum`` under a coarser grouping —
    exact, like ``cms_merge`` (counters are linear)."""
    return registers.groupBy(*group_cols, "bin").agg(
        F.sum("cnt").alias("cnt"))


def hist_quantiles(registers: DataFrame, group_cols: Sequence[str],
                   qs: Sequence[float], *, lo: float, hi: float,
                   bins: int = 256) -> DataFrame:
    """Estimate per-group quantiles from a histogram register table.

    Output ``(group…, q, n, est)``: for each requested quantile ``q``,
    the rank target is ``r = max(1, ceil(q * n))`` and ``est``
    interpolates linearly inside the bin containing rank ``r`` —
    deterministic rational arithmetic both engines replay exactly,
    rounded to 9 dp.  Runs entirely on the register table: a cumulative
    window over AT MOST ``bins`` rows per group (never over raw data),
    one tiny per-group total joined back, and a ``min(struct)`` pick.
    """
    from pyspark.sql import Window

    width = (hi - lo) / bins
    totals = registers.groupBy(*group_cols).agg(
        F.sum("cnt").alias("_n"))
    w = Window.partitionBy(*group_cols).orderBy("bin") \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = registers.withColumn("_cum", F.sum("cnt").over(w)) \
        .join(F.broadcast(totals), list(group_cols))
    qlit = F.explode(F.array(*[F.lit(float(q)) for q in qs])).alias("q")
    cand = cum.select(*group_cols, "bin", "cnt", "_cum", "_n", qlit)
    r = F.greatest(F.lit(1), F.ceil(F.col("q") * F.col("_n")))
    hit = cand.filter(F.col("_cum") >= r).groupBy(*group_cols, "q").agg(
        F.min(F.struct("bin", "_cum", "cnt", "_n")).alias("_b"))
    bin_, cum_, cnt_, n_ = (F.col("_b.bin"), F.col("_b._cum"),
                            F.col("_b.cnt"), F.col("_b._n"))
    rr = F.greatest(F.lit(1), F.ceil(F.col("q") * n_))
    frac = (rr - (cum_ - cnt_)).cast("double") / cnt_.cast("double")
    est = F.lit(lo) + (bin_.cast("double") + frac) * F.lit(width)
    return hit.select(
        *group_cols, "q",
        n_.cast("bigint").alias("n"),
        F.round(est, 9).alias("est"),
    )


def ks_drift(reg_a: DataFrame, reg_b: DataFrame,
             group_cols: Sequence[str]) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov drift statistic between two
    histogram register tables (both built by :func:`hist_sketch` on the
    SAME grid) — the distribution-shift monitor a training pipeline runs
    between corpus snapshots, mixture revisions, or source partitions
    before a new dump is admitted.

    ``KS = max over bins of |CDF_a - CDF_b|``, computed on the binned
    CDFs (exact for the chosen grid; resolution = one bin).  Output one
    row per group: ``(group…, n_a, n_b, ks)``.  A group with an empty or
    missing side reports ``ks = 1.0`` (total drift) by convention.

    Scale + determinism shape: the raw corpora were already reduced to
    ≤ ``bins`` exact-integer rows per group by ``hist_sketch``, so the
    full-outer bin align, the cumulative window (≤ ``bins`` rows per
    group — the `hist_quantiles` bounded-window contract), and the
    per-bin divides all run on register tables.  The final reduce is
    ``max`` of per-bin doubles — order-independent, unlike a float sum —
    so the statistic is byte-identical at any partitioning.  The CDF
    between occupied bins is constant, so taking the max over
    union-occupied bins only is exact.
    """
    g = list(group_cols)
    a = reg_a.select(*g, "bin", F.col("cnt").alias("_ca"))
    b = reg_b.select(*g, "bin", F.col("cnt").alias("_cb"))
    merged = (a.join(b, g + ["bin"], "full_outer")
              .select(*g, "bin",
                      F.coalesce("_ca", F.lit(0)).alias("_ca"),
                      F.coalesce("_cb", F.lit(0)).alias("_cb")))
    from pyspark.sql import Window
    w = Window.partitionBy(*g).orderBy("bin") \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = merged.select(
        *g,
        F.sum("_ca").over(w).alias("_cuma"),
        F.sum("_cb").over(w).alias("_cumb"))
    totals = merged.groupBy(*g).agg(F.sum("_ca").alias("n_a"),
                                    F.sum("_cb").alias("n_b"))
    # try_divide: an empty side yields NULL per-bin diffs (dropped by the
    # max) and the final when() reports the ks = 1.0 convention instead
    d = F.abs(F.try_divide(F.col("_cuma").cast("double"),
                           F.col("n_a").cast("double"))
              - F.try_divide(F.col("_cumb").cast("double"),
                             F.col("n_b").cast("double")))
    return (
        cum.join(F.broadcast(totals), g)
        .groupBy(*g)
        .agg(F.max("n_a").alias("n_a"), F.max("n_b").alias("n_b"),
             F.max(d).alias("_ks"))
        .select(*g, F.col("n_a").cast("bigint").alias("n_a"),
                F.col("n_b").cast("bigint").alias("n_b"),
                F.when((F.col("n_a") == 0) | (F.col("n_b") == 0),
                       F.lit(1.0)).otherwise(F.col("_ks")).alias("ks"))
    )


# ---------------------------------------------------------------------------
# k-mins distinct sketch with set algebra (Flajolet & Martin 1985;
# Bar-Yossef et al. STOC 2002; Broder 1997 resemblance) — the SET-OPERATION
# member of the sketch family: HLL answers "how many distinct", k-mins
# additionally answers "how much do two sets OVERLAP" (union / intersection
# / Jaccard between corpus snapshots, crawl batches, source partitions) —
# the question a dedup-planning pass asks before paying for the real join.
# HLL registers cannot intersect; k independent minima can.
# ---------------------------------------------------------------------------


def kmv_sketch(df: DataFrame, group_cols: Sequence[str], value_col: str, *,
               k: int = 64, salt: str = "kmv") -> DataFrame:
    """Build per-group k-mins registers: ``(group…, i, mn)`` for i in
    [0, k) where ``mn`` is the group-wide minimum of the i-th salted
    60-bit hash of the values.

    Scale shape: the ONLY aggregate is ``min`` — associative, commutative,
    idempotent — so the groupBy partially combines map-side and the
    shuffle carries AT MOST ``k`` rows per group no matter how many
    billions of values feed it; there is no candidate funnel at any
    parallelism (the reason this is k-mins and not bottom-k: Spark SQL
    has no partially-aggregable bottom-k, and a bottom-k built from
    windows or collects funnels hot groups).  Cost knob: ``k`` md5
    evaluations per input row (the `minhash_signatures` trade).

    Every nonempty group emits exactly ``k`` rows (the seed explode is
    unconditional), NULL values are ignored.  Relative standard error of
    the distinct estimate is ``~1/sqrt(k - 2)``; Jaccard standard error
    is ``~sqrt(J(1-J)/k)``.
    """
    rows = kmv_register_rows(df, group_cols, value_col, k=k, salt=salt)
    return rows.groupBy(*group_cols, "i").agg(F.min("mn").alias("mn"))


def kmv_register_rows(df: DataFrame, group_cols: Sequence[str],
                      value_col: str, *, k: int = 64,
                      salt: str = "kmv") -> DataFrame:
    """Pre-aggregation register rows ``(group…, i, mn)`` — the map-side
    half of ``kmv_sketch``, shared with the streaming face (which must
    hand the final ``min`` to Structured Streaming's windowed agg)."""
    if not 4 <= k <= 512:
        raise ValueError(f"k must be in [4, 512], got {k}")
    rows = df.where(F.col(value_col).isNotNull()).select(
        *[F.col(g) for g in group_cols],
        F.col(value_col).cast("string").alias("_v"),
        F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("i"),
    )
    h = F.conv(F.substring(F.md5(F.concat(
        F.lit(salt), F.col("i").cast("string"), F.lit(":"), F.col("_v"))),
        1, 15), 16, 10).cast("bigint")
    return rows.select(*group_cols, "i", h.alias("mn"))


def kmv_merge(registers: DataFrame,
              group_cols: Sequence[str]) -> DataFrame:
    """Merge sketches by register-wise ``min`` under a coarser grouping.

    ``min`` is associative/commutative/idempotent, so the merged sketch
    is IDENTICAL to the sketch built directly from the union of the
    inputs — merging adds no approximation.  Same rollup contract as
    ``hll_merge``: partials → global, daily → monthly, child → parent,
    without rescanning raw data.
    """
    return registers.groupBy(*group_cols, "i").agg(F.min("mn").alias("mn"))


def _fold_u(terms_col):
    """Deterministic IEEE sum of ``mn / 2**60`` over a sorted register
    list: int→double conversion is IEEE round-to-nearest (identical in
    every engine), division by a power of two is exact scaling, and the
    fold order is fixed by the sort — so the double is bit-identical at
    any partitioning and in any IEEE-754 engine (the ``hll_estimate``
    determinism contract)."""
    return F.aggregate(
        F.array_sort(terms_col), F.lit(0.0),
        lambda acc, mn: acc + mn.cast("double") / F.lit(float(1 << 60)))


def kmv_estimate(registers: DataFrame, group_cols: Sequence[str], *,
                 k: int) -> DataFrame:
    """Estimate per-group distinct counts from a k-mins register table.

    Output: ``(group…, n_mins, mn_min, distinct_est)`` — ``n_mins``
    (== k for any nonempty group) and ``mn_min`` (the global minimum,
    an exact integer digest of the register state) plus the
    ``(k-1) / sum_i(mn_i / 2**60)`` estimator (each minimum of n uniform
    draws is ~Exp(n)/2**60, so the sum is ~Gamma(k, 1/n) and (k-1)/sum
    is its unbiased inverse-mean), rounded to 4 dp.  The only float work
    is the fixed-order fold in ``_fold_u`` — deterministic cross-engine.
    """
    agg = registers.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("int").alias("n_mins"),
        F.min("mn").alias("mn_min"),
        _fold_u(F.collect_list("mn")).alias("_sum_u"),
    )
    return agg.select(
        *group_cols, "n_mins", "mn_min",
        F.round(F.lit(float(k - 1)) / F.col("_sum_u"), 4)
         .alias("distinct_est"),
    )


def kmv_set_ops(reg_a: DataFrame, reg_b: DataFrame,
                group_cols: Sequence[str], *, k: int) -> DataFrame:
    """Set algebra between two sketch tables sharing ``group_cols``:
    per group, estimates of |A ∪ B|, Jaccard(A, B), and |A ∩ B|.

    - ``least(mn_a, mn_b)`` is register-wise the EXACT sketch of A ∪ B
      (the ``kmv_merge`` identity), so ``union_est`` is the plain k-mins
      estimator on it;
    - ``P[min_i(A) == min_i(B)] = J`` exactly (the MinHash collision
      identity, Broder 1997), so ``jaccard_est = n_match / k``;
    - ``inter_est = jaccard_est × union_est`` (|A∩B| = J·|A∪B|).

    One ``(group…, i)`` equi-join of two ≤k-rows-per-group tables — at
    any corpus scale both sides are already sketches, so this is the
    cheap pass that decides whether the expensive cross-snapshot dedup
    join is worth running.  Groups present in only one input are dropped
    (inner join): overlap with an absent side is undefined, not zero.
    Output floats are the two estimator divides plus their product —
    fixed IEEE sequence, deterministic cross-engine.
    """
    g = list(group_cols)
    a = reg_a.select(*g, "i", F.col("mn").alias("_ma"))
    b = reg_b.select(*g, "i", F.col("mn").alias("_mb"))
    j = a.join(b, g + ["i"], "inner")
    agg = j.groupBy(*g).agg(
        F.count(F.lit(1)).cast("int").alias("n_mins"),
        F.sum(F.when(F.col("_ma") == F.col("_mb"), 1).otherwise(0))
         .cast("int").alias("n_match"),
        _fold_u(F.collect_list(F.least("_ma", "_mb"))).alias("_sum_u"),
    )
    union_est = F.lit(float(k - 1)) / F.col("_sum_u")
    jaccard = F.col("n_match").cast("double") / F.lit(float(k))
    return agg.select(
        *g, "n_mins", "n_match",
        F.round(jaccard, 4).alias("jaccard_est"),
        F.round(union_est, 4).alias("union_est"),
        F.round(jaccard * union_est, 4).alias("inter_est"),
    )
