"""Eval-set decontamination: flag training documents that overlap an
evaluation/benchmark set by shared word n-grams — the standard
"contamination check" a large-scale training-data pipeline runs before
training (e.g. the n-gram overlap methodology of the GPT-3/PaLM data
cards).

Scale shape: both sides explode to (ngram_hash) rows; the eval-side
distinct hash set is orders of magnitude smaller than the training
corpus and joins broadcast when it fits (Catalyst/AQE decide); the
per-document overlap is a map-side-combinable groupBy on doc_id.  No
Python UDFs — tokenization and hashing are Catalyst expressions
(xxhash64), so the whole plan stays in whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from bigdata_old_spark.pipeline.text import tokens


def _word_ngrams(col: Column, n: int) -> Column:
    """Array of space-joined word n-grams (empty when < n tokens)."""
    toks = tokens(col)
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.array_join(F.slice(toks, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def ngram_contamination(
    train: DataFrame,
    eval_df: DataFrame,
    n: int = 3,
    min_frac: float = 0.2,
    id_col: str = "doc_id",
    text_col: str = "text",
    eval_id_col: str = "doc_id",
    eval_text_col: str = "text",
) -> DataFrame:
    """Per-training-document n-gram overlap against the union of all
    eval documents' n-grams.

    Returns: doc_id | n_ngrams | n_contaminated | contamination_frac |
    is_contaminated — one row per training doc (docs with fewer than n
    tokens have 0 n-grams and frac 0.0).  ``n_contaminated`` counts
    DISTINCT training n-grams also present anywhere in the eval set;
    the fraction is over the doc's distinct n-grams, so repeated
    boilerplate does not dilute or inflate the signal.
    """
    t = train.select(
        F.col(id_col).alias("doc_id"),
        F.explode_outer(F.array_distinct(_word_ngrams(F.col(text_col), n))).alias("gram"),
    )
    e = (
        eval_df.select(
            F.explode(F.array_distinct(_word_ngrams(F.col(eval_text_col), n))).alias("gram")
        )
        .dropDuplicates(["gram"])
        .withColumn("__hit", F.lit(1))
    )
    joined = t.join(e, "gram", "left")
    return (
        joined.groupBy("doc_id")
        .agg(
            F.count("gram").alias("n_ngrams"),
            F.coalesce(F.sum("__hit"), F.lit(0)).cast("long").alias("n_contaminated"),
        )
        .select(
            "doc_id",
            "n_ngrams",
            "n_contaminated",
            F.when(
                F.col("n_ngrams") > 0,
                F.round(F.col("n_contaminated") / F.col("n_ngrams"), 9),
            )
            .otherwise(F.lit(0.0))
            .alias("contamination_frac"),
        )
        .withColumn("is_contaminated", F.col("contamination_frac") >= min_frac)
    )


def decontaminate(
    train: DataFrame,
    eval_df: DataFrame,
    n: int = 3,
    min_frac: float = 0.2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Training corpus minus contaminated docs (left_anti on the
    flagged id set — the filter a pipeline applies before training)."""
    flagged = ngram_contamination(
        train, eval_df, n=n, min_frac=min_frac, id_col=id_col, text_col=text_col
    ).where(F.col("is_contaminated"))
    return train.join(
        flagged.select(F.col("doc_id").alias(id_col)), id_col, "left_anti"
    )


# ---------------------------------------------------------------------------
# Fuzzy decontamination: near-duplicate (not just shared-n-gram)
# overlap with the eval set, via the MinHash-LSH machinery — catches
# paraphrased / lightly-edited benchmark leakage that exact n-gram
# overlap under-scores.
# ---------------------------------------------------------------------------


def fuzzy_contamination_pairs(
    train: DataFrame,
    eval_df: DataFrame,
    min_jaccard: float = 0.7,
    k: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    eval_id_col: str = "doc_id",
    eval_text_col: str = "text",
) -> DataFrame:
    """(train_id, eval_id, jaccard) pairs whose shingle Jaccard clears
    the threshold — candidates from banded MinHash buckets (the eval
    side is small and broadcasts into the probe join; the training
    corpus is never self-joined), verified with true shingle Jaccard.

    Returns: id_train | id_eval | jaccard."""
    from bigdata_old_spark.pipeline.dedup import (
        _band_buckets,
        jaccard,
        shingles,
    )

    tb = train.select(F.col(id_col).alias("id"), shingles(F.col(text_col), k).alias("sh"))
    eb = eval_df.select(
        F.col(eval_id_col).alias("id"), shingles(F.col(eval_text_col), k).alias("sh")
    )
    t_buckets = _band_buckets(tb, num_hashes, bands)
    e_buckets = _band_buckets(eb, num_hashes, bands).select(
        F.col("id").alias("eid"), "b", "h"
    )
    cand = (
        t_buckets.join(F.broadcast(e_buckets), ["b", "h"])
        .select(F.col("id").alias("id_train"), F.col("eid").alias("id_eval"))
        .dropDuplicates()
    )
    sh_t = tb.select(F.col("id").alias("id_train"), F.col("sh").alias("sh_t"))
    sh_e = eb.select(F.col("id").alias("id_eval"), F.col("sh").alias("sh_e"))
    return (
        cand.join(sh_t, "id_train")
        .join(F.broadcast(sh_e), "id_eval")
        .select(
            "id_train", "id_eval",
            jaccard(F.col("sh_t"), F.col("sh_e")).alias("jaccard"),
        )
        .where(F.col("jaccard") >= min_jaccard)
    )


def fuzzy_decontaminate(
    train: DataFrame,
    eval_df: DataFrame,
    min_jaccard: float = 0.7,
    id_col: str = "doc_id",
    **kw,
) -> DataFrame:
    """Drop training documents that near-duplicate any eval document."""
    pairs = fuzzy_contamination_pairs(
        train, eval_df, min_jaccard=min_jaccard, id_col=id_col, **kw
    )
    bad = pairs.select(F.col("id_train").alias(id_col)).dropDuplicates()
    return train.join(bad, id_col, "left_anti")
