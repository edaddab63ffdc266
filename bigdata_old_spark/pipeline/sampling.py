"""Deterministic sampling / splitting for training-data curation.

Beyond-reference pipeline operators (driver north star): corpus
sampling at 100 TB must be (a) deterministic — re-running the pipeline
yields the same corpus, (b) leakage-safe — one document always lands on
the same side of a split, and (c) shuffle-light.  Random() fails (a)
and (b); these operators key every decision on a cryptographic hash of
the document id (md5 — identical builtin in Spark and DuckDB, so the
driver's oracle can replay the exact selection).

Scale shapes:
* ``hash_sample`` / ``hash_split`` are pure row-local filters — no
  shuffle at all, any scale;
* ``stratified_sample`` shuffles once on the strata key and takes a
  deterministic per-stratum top-``cap`` (window row_number) — bounded
  output, no global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

HEX = "0123456789abcdef"


def _bucket16(id_col) -> F.Column:
    """Deterministic 16-way bucket: first hex digit of md5(id)."""
    return F.substring(F.md5(F.col(id_col).cast("string")), 1, 1)


def hash_sample(df: DataFrame, id_col: str = "doc_id", sixteenths: int = 2) -> DataFrame:
    """Keep a deterministic ~sixteenths/16 fraction of rows, keyed on
    the id hash (row-local filter — no shuffle, no RNG state).  NULL
    ids are never selected (the same rows a SQL ``WHERE hash IN (…)``
    oracle keeps)."""
    if not 0 < sixteenths <= 16:
        raise ValueError("sixteenths must be in 1..16")
    keep = list(HEX[:sixteenths])
    return df.where(_bucket16(id_col).isin(keep))


def hash_split(
    df: DataFrame, id_col: str = "doc_id", test_sixteenths: int = 2
) -> tuple[DataFrame, DataFrame]:
    """Deterministic, leakage-safe train/test split: a given id always
    lands on the same side, across runs and machines.  NULL ids hash to
    NULL; they deterministically land on the TRAIN side (the same
    routing a SQL ``CASE WHEN hash IN (…) THEN test ELSE train`` gives)
    rather than silently vanishing from both."""
    if not 0 < test_sixteenths < 16:
        raise ValueError("test_sixteenths must be in 1..15")
    test_digits = list(HEX[:test_sixteenths])
    in_test = F.coalesce(_bucket16(id_col).isin(test_digits), F.lit(False))
    return df.where(~in_test), df.where(in_test)


def group_hash_split(
    df: DataFrame, group_col: str, test_sixteenths: int = 2
) -> tuple[DataFrame, DataFrame]:
    """Group-aware leakage-safe split: the hash is keyed on
    ``group_col`` (a near-dup cluster id, domain, author, …) instead of
    the row id, so an ENTIRE group always lands on one side — the split
    a pipeline needs after dedup clustering, where row-level splits
    leak near-duplicates across train/test.  Still a pure row-local
    filter: no shuffle, no RNG state.  Rows with a NULL group all land
    on the TRAIN side (one deterministic side, no data loss — and the
    side a SQL ``CASE`` oracle picks for a NULL hash)."""
    if not 0 < test_sixteenths < 16:
        raise ValueError("test_sixteenths must be in 1..15")
    test_digits = list(HEX[:test_sixteenths])
    in_test = F.coalesce(_bucket16(group_col).isin(test_digits), F.lit(False))
    return df.where(~in_test), df.where(in_test)


def seeded_shuffle(
    df: DataFrame, seed: int = 0, id_col: str = "doc_id", order_col: str = "shuffle_rank"
) -> DataFrame:
    """Deterministic global shuffle order for training: rank every row
    by md5(seed || id) — reproducible across runs, machines, and the
    DuckDB oracle; changing ``seed`` gives an independent permutation.

    Scale shape: the rank is a row-local expression; materializing the
    DENSE global ordinal would need a global sort, so this returns the
    sortable KEY (hex string) plus a 64-bit integer rank prefix —
    downstream writers ``repartitionByRange(order_col)`` + sort within
    partitions, the standard distributed total-order recipe (one range
    shuffle, no single-node sort)."""
    key = F.md5(F.concat(F.lit(str(seed)), F.lit(":"), F.col(id_col).cast("string")))
    return df.withColumn(order_col, key).withColumn(
        order_col + "_64",
        F.conv(F.substring(F.col(order_col), 1, 15), 16, 10).cast("long"),
    )


def stratified_sample(
    df: DataFrame,
    strata_cols: list[str],
    cap: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic per-stratum cap: for each combination of
    ``strata_cols``, keep the ``cap`` rows with the smallest
    (md5(id), id) — a stable pseudo-random choice that every rerun (and
    the DuckDB oracle) reproduces exactly.  One shuffle on the strata
    key; per-stratum windows, never a global sort."""
    w = Window.partitionBy(*strata_cols).orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col)
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= cap)
        .drop("__rn")
    )


def token_budget_mix(
    df: DataFrame,
    weights: dict[str, float],
    total_tokens: int,
    source_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Deterministic training-data mixing: sample each source down to
    its share of a token budget.  Source ``s`` gets a target of
    ``total_tokens * weights[s] / sum(weights)``; within a source, docs
    are taken in (md5(id), id) order — a stable pseudo-random order
    every rerun and the SQL oracle reproduce — while the running token
    count BEFORE the doc is under the target (so each source overshoots
    by at most one document; sources absent from ``weights`` are
    dropped).  Whitespace tokens (pipeline.text.tokens) are the budget
    currency.

    Returns the kept rows plus ``n_tokens``.

    Scale shape: one shuffle on the source key; per-source window
    cumsum, never a global sort; the weights ride as a broadcast
    literal map."""
    from bigdata_old_spark.pipeline.text import token_count

    total_w = sum(weights.values())
    targets = F.create_map(
        *[x for s, w in sorted(weights.items())
          for x in (F.lit(s), F.lit(total_tokens * w / total_w))]
    )
    w = Window.partitionBy(source_col).orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col)
    )
    out = (
        df.withColumn("n_tokens", token_count(F.col(text_col)).cast("long"))
        .withColumn("__target", targets[F.col(source_col)])
        .where(F.col("__target").isNotNull())
        .withColumn(
            "__cum_before",
            F.coalesce(
                F.sum("n_tokens").over(w.rowsBetween(Window.unboundedPreceding, -1)),
                F.lit(0),
            ),
        )
        .where(F.col("__cum_before") < F.col("__target"))
    )
    return out.drop("__target", "__cum_before")


def temperature_resample(
    df: DataFrame,
    alpha: float = 0.5,
    total: int | None = None,
    source_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Temperature-flattened source mixing (the multilingual/multi-
    corpus ``p_s ∝ n_s^alpha`` recipe): source ``s`` with ``n_s`` docs
    gets a target of ``round(total * n_s^alpha / Σ n^alpha)`` docs
    (capped at ``n_s`` — sampling is without replacement), rows chosen
    per source in the stable (md5(id), id) order every rerun and the
    SQL oracle reproduce.  ``alpha=1`` is natural proportions,
    ``alpha=0`` uniform across sources.  ``total`` defaults to the
    corpus size (pure re-balancing).

    Scale shape: one tiny counts aggregation (#sources rows) drives the
    targets, which ride as a broadcast literal map; selection is one
    shuffle on the source key + per-source window, never a global sort.
    """
    counts = {
        r[0]: r[1] for r in df.groupBy(source_col).count().collect()
    }
    n_total = total if total is not None else sum(counts.values())
    wsum = sum(n ** alpha for s, n in sorted(counts.items()))
    targets = {
        s: min(n, int(n_total * (n ** alpha) / wsum + 0.5))
        for s, n in counts.items()
    }
    tmap = F.create_map(
        *[x for s, t in sorted(targets.items()) for x in (F.lit(s), F.lit(t))]
    )
    w = Window.partitionBy(source_col).orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col)
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= tmap[F.col(source_col)])
        .drop("__rn")
    )


# ---------------------------------------------------------------------------
# DSIR: data selection with importance resampling (Xie et al. 2023,
# "Data Selection for Language Models via Importance Resampling",
# arXiv:2302.03169) — hashed n-gram bag-of-words importance weights
# ---------------------------------------------------------------------------

def _dsir_feats(text_col: str) -> F.Column:
    """Hashed unigram features: each whitespace token maps to one of
    256 buckets by its 2-hex-char md5 prefix.  md5 is the portable hash
    (identical builtin in Spark and DuckDB) so the driver oracle can
    replay the bucketing; a production run at a larger feature space
    just widens the prefix."""
    toks = F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != "")
    return F.transform(toks, lambda t: F.substring(F.md5(t), 1, 2))


def _dsir_logprob_table(
    df: DataFrame, text_col: str, alpha: float = 1.0
) -> tuple[DataFrame, float]:
    """((feat, logp) table, smoothing denominator) with Laplace
    smoothing over the 256-bucket space."""
    feats = df.select(F.explode(_dsir_feats(text_col)).alias("feat"))
    counts = feats.groupBy("feat").agg(F.count("*").alias("cnt"))
    total = feats.count()
    denom = float(total) + alpha * 256.0
    return counts.select(
        "feat", F.log((F.col("cnt") + F.lit(alpha)) / F.lit(denom)).alias("logp")
    ), denom


def dsir_logratio(
    df: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    target_text_col: str | None = None,
    alpha: float = 1.0,
) -> DataFrame:
    """Per-document DSIR importance weight: sum over the document's
    hashed unigram features of ``log p_target(feat) - log p_raw(feat)``
    — a bag-of-hashed-ngrams likelihood ratio between the TARGET
    distribution (the high-quality / in-domain sample you want more of)
    and the RAW corpus distribution.  High scores = raw documents that
    look like the target.

    Returns ``id_col | dsir_logratio``.

    Scale shape: both feature tables are tiny (<= 256 rows) model-state
    aggregates; the per-document score is an explode + BROADCAST join
    against the 256-row weight table + one groupBy(id) re-aggregation —
    the only full-width shuffle is on the document id, carrying a
    single double.  The raw model uses ``df`` itself (the paper fits it
    on a corpus sample; pass a sampled ``df`` to reproduce that).
    """
    tgt, t_denom = _dsir_logprob_table(target, target_text_col or text_col, alpha)
    raw, r_denom = _dsir_logprob_table(df, text_col, alpha)
    import math

    # full outer: a feature absent from one side keeps its smoothed floor
    w = (
        tgt.withColumnRenamed("logp", "lt")
        .join(raw.withColumnRenamed("logp", "lr"), "feat", "full_outer")
        .select(
            "feat",
            (
                F.coalesce(F.col("lt"), F.lit(math.log(alpha / t_denom)))
                - F.coalesce(F.col("lr"), F.lit(math.log(alpha / r_denom)))
            ).alias("lw"),
        )
    )
    exploded = df.select(F.col(id_col), F.explode(_dsir_feats(text_col)).alias("feat"))
    default_lw = math.log(alpha / t_denom) - math.log(alpha / r_denom)
    scored = exploded.join(F.broadcast(w), "feat", "left").select(
        id_col, F.coalesce(F.col("lw"), F.lit(default_lw)).alias("lw")
    )
    out = scored.groupBy(id_col).agg(F.sum("lw").alias("dsir_logratio"))
    # empty documents (no tokens) score 0
    return df.select(id_col).join(out, id_col, "left").select(
        id_col, F.coalesce(F.col("dsir_logratio"), F.lit(0.0)).alias("dsir_logratio")
    )


def dsir_select(
    df: DataFrame,
    target: DataFrame,
    n: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    **kw,
) -> DataFrame:
    """Top-``n`` raw documents by DSIR importance weight (deterministic
    tie-break on id — the paper resamples with Gumbel noise; a seeded
    rank keeps reruns and the oracle identical).

    The top-``n`` is ``orderBy().limit()`` — Spark plans it as
    TakeOrderedAndProject (per-partition heaps, no global sort, no
    single-task window), so selection stays distributed at corpus
    scale."""
    scores = dsir_logratio(df, target, id_col, text_col, **kw)
    picked = (
        scores.orderBy(F.desc("dsir_logratio"), F.asc(id_col))
        .limit(n)
        .select(id_col)
    )
    return df.join(picked, id_col)


def unimax_mix(
    df: DataFrame,
    total_tokens: int,
    max_epochs: int = 4,
    source_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """UniMax source mixing (Chung et al. 2023, "UniMax: Fairer and
    More Effective Language Sampling for Large-Scale Multilingual
    Pretraining"): distribute a token budget as UNIFORMLY as possible
    across sources while capping any source at ``max_epochs`` passes
    over its data — the repetition-bounded alternative to temperature
    sampling.

    Water-filling allocation: visit sources in ascending token-count
    order; each gets ``min(n_s * max_epochs, remaining_budget /
    remaining_sources)`` tokens.  A source's allocation turns into
    ``floor(alloc/n_s)`` full epochs plus a partial epoch of documents
    taken in the stable (md5(id), id) order while the running token
    count BEFORE the doc is under the partial target (the
    :func:`token_budget_mix` convention — overshoot ≤ 1 doc/source).

    Returns the per-source-kept rows with ``n_tokens`` and
    ``n_epochs`` (how many times the doc repeats in the mixed corpus;
    only rows with n_epochs >= 1 appear).

    Scale shape: per-source totals are one tiny aggregate collected to
    drive the water-filling (#sources numbers — model state, like the
    IVF centroids); the selection itself is one shuffle on the source
    key and a per-source window cumsum, never a global sort.
    """
    from bigdata_old_spark.pipeline.text import token_count

    sized = df.withColumn("n_tokens", token_count(F.col(text_col)).cast("long"))
    counts = sorted(
        (
            (r[source_col], r["ns"])
            for r in sized.groupBy(source_col).agg(F.sum("n_tokens").alias("ns")).collect()
        ),
        key=lambda t: (t[1], t[0]),
    )
    remaining = float(total_tokens)
    plans: list[tuple[str, int, float]] = []  # (source, full_epochs, partial_tokens)
    for i, (src, ns) in enumerate(counts):
        quota = remaining / (len(counts) - i)
        alloc = min(float(ns) * max_epochs, quota)
        remaining -= alloc
        full = int(alloc // ns) if ns else 0
        plans.append((src, full, alloc - full * ns))
    full_map = F.create_map(
        *[x for s, fe, _ in sorted(plans) for x in (F.lit(s), F.lit(fe))]
    )
    part_map = F.create_map(
        *[x for s, _, pt in sorted(plans) for x in (F.lit(s), F.lit(pt))]
    )
    w = Window.partitionBy(source_col).orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col)
    )
    out = (
        sized.withColumn(
            "__cum_before",
            F.coalesce(
                F.sum("n_tokens").over(w.rowsBetween(Window.unboundedPreceding, -1)),
                F.lit(0),
            ),
        )
        .withColumn(
            "n_epochs",
            (
                full_map[F.col(source_col)]
                + F.when(F.col("__cum_before") < part_map[F.col(source_col)], 1).otherwise(0)
            ).cast("int"),
        )
        .where(F.col("n_epochs") >= 1)
    )
    return out.drop("__cum_before")
