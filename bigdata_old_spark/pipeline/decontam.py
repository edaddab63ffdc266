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
