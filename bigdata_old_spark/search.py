"""Full-text search — tokenized inverted index + tf·idf relevance.

Re-expresses the reference's FullTextIndex (bigdata/.../search/
FullTextIndex.java:240 — (token, docId) keys; DefaultAnalyzerFactory
tokenization; Hit.java cosine/tf relevance) as a DataFrame inverted
index over literal objects, and the bds: magic-predicate surface
(store/BDS.java:94-431, rewritten by ASTSearchOptimizer.java:83) as a
search() table function the compiler can join like any other unit.

text_index schema:  token | s | p | o_lex | tf
(token → the matched literal and its subject/predicate context)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from bigdata_old_spark.model import KIND_LITERAL


def tokenize(col):
    """lower + split on non-alphanumerics, drop empties (the analog of
    the reference's DefaultAnalyzerFactory analyzer)."""
    return F.filter(F.split(F.lower(col), r"[^\p{L}\p{N}]+"), lambda t: t != "")


def build_text_index(statements: DataFrame) -> DataFrame:
    """Inverted index over string-literal objects."""
    lits = statements.where(
        (F.col("o_kind") == KIND_LITERAL)
        & (F.col("o_dt").isin(
            "http://www.w3.org/2001/XMLSchema#string",
            "http://www.w3.org/1999/02/22-rdf-syntax-ns#langString",
        ) | F.col("o_dt").isNull())
    ).select("s", "p", "o_lex", "o_dt", "o_lang")
    tok = lits.select(
        "s", "p", "o_lex", "o_dt", "o_lang",
        F.explode(tokenize(F.col("o_lex"))).alias("token"),
    )
    # term frequency per (literal occurrence, token)
    return tok.groupBy("token", "s", "p", "o_lex", "o_dt", "o_lang").agg(
        F.count(F.lit(1)).alias("tf")
    )


def search(
    text_index: DataFrame,
    query: str,
    match_all_terms: bool = False,
    min_relevance: float | None = None,
    max_rank: int | None = None,
    prefix_match: bool = False,
) -> DataFrame:
    """bds:search semantics: OR-match query tokens against the index,
    score by normalized tf·idf cosine, rank by descending relevance.

    Returns: s | p | o_lex | o_dt | o_lang | relevance | rank
    (reference BDS.SEARCH/RELEVANCE/RANK/MATCH_ALL_TERMS/MIN_RELEVANCE/
    MAX_RANK/PREFIX_MATCH — BDS.java:94-431).
    """
    q_tokens = [t for t in __import__("re").split(r"[^\w]+", query.lower()) if t]
    if not q_tokens:
        raise ValueError("empty search query")

    n_docs = text_index.select("s", "p", "o_lex").dropDuplicates().count() or 1

    if prefix_match:
        cond = None
        for t in q_tokens:
            c = F.col("token").startswith(t)
            cond = c if cond is None else (cond | c)
        hits = text_index.where(cond)
    else:
        hits = text_index.where(F.col("token").isin(q_tokens))

    # idf per token over the matched corpus
    docfreq = hits.groupBy("token").agg(F.count_distinct("s", "p", "o_lex").alias("df"))
    hits = hits.join(F.broadcast(docfreq), "token")
    hits = hits.withColumn("w", F.col("tf") * F.log2(F.lit(n_docs) / F.col("df")))

    doc = hits.groupBy("s", "p", "o_lex", "o_dt", "o_lang").agg(
        F.sum("w").alias("score"),
        F.count_distinct("token").alias("nmatched"),
    )
    if match_all_terms and not prefix_match:
        doc = doc.where(F.col("nmatched") >= len(set(q_tokens)))
    # normalize to (0,1] like the reference's cosine: score / max score
    mx = doc.agg(F.max("score")).collect()[0][0] or 1.0
    doc = doc.withColumn("relevance", F.col("score") / F.lit(float(mx)))
    doc = doc.withColumn(
        "rank", F.row_number().over(Window.orderBy(F.desc("relevance"), F.asc("o_lex")))
    )
    if min_relevance is not None:
        doc = doc.where(F.col("relevance") >= min_relevance)
    if max_rank is not None:
        doc = doc.where(F.col("rank") <= max_rank)
    return doc.select("s", "p", "o_lex", "o_dt", "o_lang", "relevance", "rank")
