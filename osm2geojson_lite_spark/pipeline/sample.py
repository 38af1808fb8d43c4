"""Deterministic corpus sampling / quota operators.

Training-data curation needs samples that are *reproducible across cluster
sizes and reruns* — ``df.sample()`` is seed-stable only per partition
layout, so repartitioning changes the sample.  These operators key every
decision on a hash of the row's own key instead:

- :func:`deterministic_sample` — keep a row iff
  ``xxhash64(key, salt) mod D < rate*D``.  The same row set survives any
  partitioning, any cluster size, any execution order; rates compose
  (a 0.5 sample of a 0.5 sample with different salts is an exact 0.25
  sample in expectation, and repeating a salt is idempotent).
- :func:`quota_cap` — cap rows per group (per-domain / per-source caps,
  the Common-Crawl-style curation primitive): rank rows within each group
  by the same key hash (deterministic, uniform — no bias toward any
  natural ordering) and keep the first ``quota``.  One window shuffle on
  the group key; skew in group sizes is bounded because output per group
  is capped at ``quota``.
- :func:`mixture_sample` — target-mixture selection (the training-mix
  primitive): per-group quotas derived from domain weights, selected by
  the same hash rank, with a hash-threshold prefilter so a billion-row
  domain never funnels through one window partition.
- :func:`mixture_sample_tokens` — the token-denominated form (training
  mixes are budgeted in tokens): per-group token budgets filled in hash-
  rank order via an exclusive cumulative sum, same prefilter shape.
- :func:`mixture_epochs` — oversampling: budgets above a domain's supply
  repeat the whole domain for ``budget div supply`` epochs plus a
  hash-rank remainder fill, with an explicit ``epoch`` column.

Both are pure column expressions (JVM-side, codegen) — no UDFs.  The hash
is the repo's shared md5-derived bigint (`text.token_hash_col` rationale)
rather than ``xxhash64`` so the identical decision is computable in ANSI
SQL and every sample stays fully oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

_DENOM = 1 << 32


def sample_hash_col(key, salt: int = 0):
    """Uniform bucket in [0, 2^32) from the row key — the shared primitive.

    ``bigint(substr(md5(salt ':' key),1,8))``: 32 hex-derived bits, exactly
    reproducible in DuckDB as ``('0x'||substr(md5(...),1,8))::bigint``.
    """
    tagged = F.concat(F.lit(f"{salt}:"), key.cast("string"))
    return F.conv(F.substring(F.md5(tagged), 1, 8), 16, 10).cast("bigint")


def deterministic_sample(df: DataFrame, rate: float, *, key: str = "doc_id",
                         salt: int = 0) -> DataFrame:
    """Keep ~``rate`` of rows, decided per row key — reproducible at any
    parallelism, stable under repartitioning, idempotent per salt."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0,1], got {rate}")
    threshold = int(rate * _DENOM)
    return df.filter(sample_hash_col(F.col(key), salt) < F.lit(threshold))


def stratified_split(df: DataFrame, fractions: dict[str, float], *,
                     key: str = "doc_id", salt: int = 0) -> DataFrame:
    """Deterministic train/val/test split: adds a ``split`` column.

    ``fractions`` maps split name -> fraction (must sum to 1 within 1e-9);
    a row lands in the first split whose cumulative integer threshold
    exceeds its 32-bit key hash, so the assignment is a pure map-side
    projection — disjoint, exhaustive, identical at any parallelism or
    cluster size, and stable across reruns (the property ``df.randomSplit``
    cannot give you: its assignment changes with partitioning).  Each
    stratum of any upstream grouping receives each split at the same rate
    in expectation because the hash is uniform and key-only.

    The last split absorbs the integer-floor remainder so every row is
    assigned.  Re-salting produces an independent fold (k-fold CV =
    ``salt=0..k-1``).
    """
    names = list(fractions)
    if not names:
        raise ValueError("fractions must be non-empty")
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    if any(f < 0 for f in fractions.values()):
        raise ValueError("fractions must be >= 0")
    h = sample_hash_col(F.col(key), salt)
    cum = 0.0
    expr = None
    for name in names[:-1]:
        cum += fractions[name]
        cond = h < F.lit(int(cum * _DENOM))
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = F.lit(names[-1])
    split = last if expr is None else expr.otherwise(last)
    return df.withColumn("split", split)


def quota_cap(df: DataFrame, group_col: str, quota: int, *,
              key: str = "doc_id", salt: int = 0,
              prefilter_slack: int = 64) -> DataFrame:
    """Keep at most ``quota`` rows per group, selected by deterministic
    hash rank (ties broken by the key itself, so output is total-ordered
    and byte-stable).

    Scale shape: the rank window's input is bounded by the same
    hash-threshold prefilter as :func:`mixture_sample` — per group, only
    rows with ``hash < 2^32 · min(1, (2·quota + prefilter_slack) / n_g)``
    (``n_g`` from a map-side-combined count broadcast back) reach the
    window, so a billion-row domain contributes ~``2·quota + slack`` window
    rows instead of funneling every row through one window partition.  The
    quota lowest-hash rows all survive the prefilter whenever at least
    ``quota`` rows do, so the output is identical to the unfiltered rank;
    with 2x + slack headroom the shortfall probability is
    Chernoff-negligible (< 1e-20 even at quota 1).
    """
    if quota < 0:
        raise ValueError(f"quota must be >= 0, got {quota}")
    out_cols = list(df.columns)
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("_n"))
    h = sample_hash_col(F.col(key), salt)
    threshold = F.least(
        F.lit(float(_DENOM)),
        F.lit(float(_DENOM)) * (2.0 * quota + prefilter_slack)
        / F.col("_n"),
    )
    survivors = df.join(F.broadcast(counts), group_col).filter(h < threshold)
    w = Window.partitionBy(group_col).orderBy(h.asc(), F.col(key).asc())
    return (
        survivors.withColumn("_qrank", F.row_number().over(w))
        .filter(F.col("_qrank") <= quota)
        .select(*out_cols)
    )


def mixture_sample(df: DataFrame, weights: dict[str, float], total: int, *,
                   group_col: str = "source", key: str = "doc_id",
                   salt: int = 0, prefilter_slack: int = 64) -> DataFrame:
    """Target-mixture sampling — the training-mix primitive: keep
    ``floor(total * w_g / Σw)`` rows from each group ``g`` in ``weights``
    (capped at the group's population; groups absent from ``weights`` are
    dropped), selected by the same deterministic hash rank as
    :func:`quota_cap` so the exact row set is reproducible at any
    parallelism and replayable in ANSI SQL.

    Scale shape — the naive form (window-rank every row of every group) has
    a skew problem :func:`quota_cap` merely caps: ranking a group still
    funnels ALL its rows through one window partition, so at 100 TB one
    billion-row domain = one task.  This operator bounds the window input
    with a **hash-threshold prefilter**: per group, keep rows with
    ``hash < 2^32 · min(1, (2·quota_g + prefilter_slack) / n_g)`` (``n_g``
    from a map-side-combined count, broadcast back), THEN rank only the
    survivors.  The true quota_g lowest-hash rows all survive the prefilter
    whenever at least quota_g rows do, so the result is *identical* to the
    full rank; with 2× + ``prefilter_slack`` headroom the shortfall
    probability is Chernoff-negligible (< 1e-20 even at quota 1).  Window
    input per group is ~2·quota + slack regardless of group size.

    Note on verification: the DuckDB oracle replays the SAME prefilter, so
    oracle equality validates the rank-and-select but not the prefilter's
    no-shortfall property; that is pinned separately by the pytest that
    compares against the naive full-group rank
    (``tests/test_sampling.py``).

    Undersupplied groups (population < quota) keep every row — the caller
    sees the achieved mix via a ``groupBy(group_col).count()`` on the
    output; this operator never upsamples (epoch repetition is a separate
    concern from selection).
    """
    if total < 0:
        raise ValueError(f"total must be >= 0, got {total}")
    wsum = float(sum(weights.values()))
    if wsum <= 0:
        raise ValueError("weights must sum to a positive value")
    quotas = {g: int(total * w / wsum) for g, w in weights.items()}
    quota_col = F.create_map(
        *[F.lit(x) for g, q in quotas.items() for x in (g, q)]
    )[F.col(group_col)]
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("_n"))
    h = sample_hash_col(F.col(key), salt)
    threshold = F.least(
        F.lit(float(_DENOM)),
        F.lit(float(_DENOM)) * (2.0 * quota_col + prefilter_slack)
        / F.col("_n"),
    )
    survivors = (
        df.withColumn("_quota", quota_col)
        .filter(F.col("_quota") > 0)
        .join(F.broadcast(counts), group_col)
        .filter(h < threshold)
    )
    w = Window.partitionBy(group_col).orderBy(h.asc(), F.col(key).asc())
    return (
        survivors.withColumn("_qrank", F.row_number().over(w))
        .filter(F.col("_qrank") <= F.col("_quota"))
        .drop("_qrank", "_quota", "_n")
    )


def mixture_sample_tokens(df: DataFrame, weights: dict[str, float],
                          total_tokens: int, *, group_col: str = "source",
                          key: str = "doc_id",
                          token_count: str | Column | None = None,
                          salt: int = 0,
                          prefilter_slack: int = 64) -> DataFrame:
    """Token-denominated target-mixture sampling — training mixes are
    budgeted in TOKENS, not documents: fill each group's budget
    ``floor(total_tokens · w_g / Σw)`` by walking the group in
    deterministic hash-rank order and keeping every document whose
    *predecessors* sum below the budget (so the budget-crossing document
    is included, GPT-fill style; the output overshoots by at most one
    document per group).  Groups absent from ``weights`` are dropped;
    a group whose total supply is under budget keeps every row.

    ``token_count`` is a column name or Column with the per-row token
    count; default = whitespace token count of ``text`` (the repo's
    ``tokens_col``).

    Scale shape mirrors :func:`mixture_sample`: per-group ``(n, Σtokens)``
    from one map-side-combined agg broadcast back, a hash-threshold
    prefilter at rate ``min(1, 2·budget_g/T_g + slack/n_g)``, then the
    ordered cumulative-sum window only over survivors.  The kept set is a
    hash-rank prefix, so it is *identical* to the full-group walk whenever
    the survivors' token total reaches the budget (or the whole group
    survives) — with 2× + ``prefilter_slack``-rows headroom the shortfall
    probability is negligible for token counts independent of the key
    hash (which they are: the hash sees only the key).
    """
    if total_tokens < 0:
        raise ValueError(f"total_tokens must be >= 0, got {total_tokens}")
    wsum = float(sum(weights.values()))
    if wsum <= 0:
        raise ValueError("weights must sum to a positive value")
    budgets = {g: int(total_tokens * w / wsum) for g, w in weights.items()}
    budget_col = F.create_map(
        *[F.lit(x) for g, b in budgets.items() for x in (g, b)]
    )[F.col(group_col)]
    if token_count is None:
        from .text import tokens_col

        ntok = F.size(tokens_col(F.col("text")))
    elif isinstance(token_count, str):
        ntok = F.col(token_count)
    else:
        ntok = token_count
    base = df.withColumn("_ntok", ntok.cast("bigint"))
    stats = base.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("_n"), F.sum("_ntok").alias("_t")
    )
    h = sample_hash_col(F.col(key), salt)
    rate = F.least(
        F.lit(1.0),
        2.0 * budget_col / F.col("_t")
        + float(prefilter_slack) / F.col("_n"),
    )
    survivors = (
        base.withColumn("_budget", budget_col)
        .filter(F.col("_budget") > 0)
        .join(F.broadcast(stats), group_col)
        .filter(h < F.lit(float(_DENOM)) * rate)
    )
    w = (
        Window.partitionBy(group_col).orderBy(h.asc(), F.col(key).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        survivors.withColumn(
            "_cum_before", F.coalesce(F.sum("_ntok").over(w), F.lit(0))
        )
        .filter(F.col("_cum_before") < F.col("_budget"))
        .drop("_cum_before", "_budget", "_ntok", "_n", "_t")
    )


def mixture_epochs(df: DataFrame, weights: dict[str, float],
                   total_tokens: int, *, group_col: str = "source",
                   key: str = "doc_id",
                   token_count: str | Column | None = None,
                   salt: int = 0,
                   prefilter_slack: int = 64) -> DataFrame:
    """Token-budget mixture WITH oversampling (the Dolma/Pile-style epoch
    semantics): when a domain's budget exceeds its supply, the whole
    domain is repeated ``budget_g div T_g`` times (epochs ``0..fe-1``) and
    the remainder ``budget_g mod T_g`` is filled by the deterministic
    hash-rank token walk of :func:`mixture_sample_tokens` at epoch ``fe``.
    Output = input columns + an ``epoch`` int column; rows are exact
    duplicates apart from ``epoch``, so downstream shuffles see distinct
    keys only with ``(key, epoch)``.

    Undersupplied domains therefore hit their token budget exactly (to
    within one document); the doc-denominated operators never upsample.
    Integer arithmetic only (``div``/``mod`` on bigint supply), so the
    epoch split is bit-identical across engines.

    Scale shape: the full-epoch part is a map-side ``explode(sequence)``
    over the corpus — zero shuffle; the remainder part reuses the
    prefiltered cumulative walk (window input ~2·remainder/avg_tokens +
    slack rows per group).  Groups with zero total tokens are dropped
    (nothing to repeat, nothing to fill).
    """
    if total_tokens < 0:
        raise ValueError(f"total_tokens must be >= 0, got {total_tokens}")
    wsum = float(sum(weights.values()))
    if wsum <= 0:
        raise ValueError("weights must sum to a positive value")
    budgets = {g: int(total_tokens * w / wsum) for g, w in weights.items()}
    budget_col = F.create_map(
        *[F.lit(x) for g, b in budgets.items() for x in (g, b)]
    )[F.col(group_col)]
    if token_count is None:
        from .text import tokens_col

        ntok = F.size(tokens_col(F.col("text")))
    elif isinstance(token_count, str):
        ntok = F.col(token_count)
    else:
        ntok = token_count
    base = df.withColumn("_ntok", ntok.cast("bigint"))
    stats = base.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("_n"), F.sum("_ntok").alias("_t")
    )
    j = (
        base.withColumn("_budget", budget_col.cast("bigint"))
        .filter(F.col("_budget") > 0)
        .join(F.broadcast(stats), group_col)
        .filter(F.col("_t") > 0)
        .withColumn("_fe", F.expr("_budget div _t"))
        .withColumn("_rem", F.col("_budget") % F.col("_t"))
    )
    out_cols = [c for c in df.columns]
    full = j.select(
        *out_cols,
        F.explode(
            F.when(F.col("_fe") > 0,
                   F.sequence(F.lit(0), (F.col("_fe") - 1).cast("int")))
            .otherwise(F.array().cast("array<int>"))
        ).alias("epoch"),
    )
    h = sample_hash_col(F.col(key), salt)
    rate = F.least(
        F.lit(1.0),
        2.0 * F.col("_rem") / F.col("_t")
        + float(prefilter_slack) / F.col("_n"),
    )
    w = (
        Window.partitionBy(group_col).orderBy(h.asc(), F.col(key).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    rem = (
        j.filter(h < F.lit(float(_DENOM)) * rate)
        .withColumn(
            "_cum_before", F.coalesce(F.sum("_ntok").over(w), F.lit(0))
        )
        .filter(F.col("_cum_before") < F.col("_rem"))
        .select(*out_cols, F.col("_fe").cast("int").alias("epoch"))
    )
    return full.unionByName(rem)
