"""Full-text search — tokenized inverted index + tf·idf relevance.

Re-expresses the reference's FullTextIndex (bigdata/.../search/
FullTextIndex.java:240 — (token, docId) keys; DefaultAnalyzerFactory
tokenization; Hit.java cosine/tf relevance) as a DataFrame inverted
index over literal objects, and the bds: magic-predicate surface
(store/BDS.java:94-431, rewritten by ASTSearchOptimizer.java:83) as a
search() table function the compiler can join like any other unit.

text_index schema:  token | s | p | o_lex | tf
(token → the matched literal and its subject/predicate context)

Scale notes (100 TB corpus):
  * corpus statistics (n_docs) are computed ONCE when the index is
    built and stored on the TextIndex — a query never runs a count().
  * relevance normalization uses a broadcast one-row aggregate, never
    a driver collect().
  * rank is never a global un-partitioned window: with a maxRank
    cutoff it is orderBy+limit (TakeOrderedAndProject — distributed
    top-k), and a full rank output uses a two-pass banded rank
    (per-band row_number + broadcast band offsets).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from bigdata_old_spark.model import KIND_LITERAL


def tokenize(col):
    """lower + split on non-alphanumerics, drop empties (the analog of
    the reference's DefaultAnalyzerFactory analyzer)."""
    return F.filter(F.split(F.lower(col), r"[^\p{L}\p{N}]+"), lambda t: t != "")


@dataclass
class TextIndex:
    """Inverted index + corpus statistics, computed once at build time
    (the reference persists docId counts inside FullTextIndex; keeping
    n_docs here means bds:search never runs a pre-query count job).
    n_subjects backs the subject-centric search (bds:subjectSearch,
    reference AbstractTripleStore.Options.SUBJECT_CENTRIC_TEXT_INDEX)."""

    df: DataFrame
    n_docs: int
    n_subjects: int = 1


def lucene_norm(w: Column) -> Column:
    """Lucene's 8-bit norm round-trip (Similarity.encodeNorm/decodeNorm,
    SmallFloat byte315: 3-bit mantissa floor, 5-bit exponent) — the
    reference stores each normalized term weight through this encoding
    (FullTextIndexTupleSerializer.java:134), so relevance parity
    requires quantizing the same way: w = m·2^e (1 ≤ m < 2) →
    floor(4m)/4 · 2^e (the byte315 encoding keeps the top TWO explicit
    mantissa bits: float bits >> 21 drops 21 of 23).  Proven by the
    child-proofing worked example (search/TestSearch.java:167:
    1/√2 → 0.625, 1/√3 → 0.5)."""
    e = F.floor(F.log2(w))
    p2 = F.pow(F.lit(2.0), e)
    return F.when(w <= 0, F.lit(0.0)).otherwise(F.floor(w / p2 * 4) / 4 * p2)


def build_text_index(statements: DataFrame, persist: bool = False) -> TextIndex:
    """Inverted index over string-literal objects."""
    df = _tokenized_literals(statements)
    if persist:
        df = df.persist()
    stats = df.agg(
        F.count_distinct("s", "p", "o_lex").alias("nd"),
        F.count_distinct("s").alias("ns"),
    ).collect()[0]
    return TextIndex(df, stats["nd"] or 1, stats["ns"] or 1)


def ranked(
    df: DataFrame,
    order: list[Column],
    max_rank: int | None = None,
    bands: int = 1024,
    band_col: str = "relevance",
) -> DataFrame:
    """Attach a dense 1-based ``rank`` column ordered by ``order``
    without a global single-partition window.

    With ``max_rank``: distributed top-k (orderBy+limit compiles to
    TakeOrderedAndProject) then a window over the ≤ max_rank survivors
    — bounded, so the single partition is fine.

    Without: two-pass banded rank.  ``band_col`` must be in [0, 1] and
    descending in rank order (ties in ``order`` imply equal band, so no
    tie ever spans a band boundary): per-band row_number + broadcast
    cumulative band offsets.
    """
    if max_rank is not None:
        top = df.orderBy(*order).limit(max_rank)
        return top.withColumn("rank", F.row_number().over(Window.orderBy(*order)))
    band = F.least(F.lit(bands - 1), F.floor(F.col(band_col) * bands)).cast("int")
    df = df.withColumn("__band", band)
    counts = df.groupBy("__band").count()
    w = Window.orderBy(F.desc("__band")).rowsBetween(Window.unboundedPreceding, -1)
    offs = counts.withColumn("__off", F.coalesce(F.sum("count").over(w), F.lit(0))).drop("count")
    df = df.join(F.broadcast(offs), "__band")
    rn = F.row_number().over(Window.partitionBy("__band").orderBy(*order))
    return df.withColumn("rank", (F.col("__off") + rn).cast("int")).drop("__band", "__off")


def _match_hits(ti, query: str, prefix_match: bool):
    q_tokens = [t for t in re.split(r"[^\w]+", query.lower()) if t]
    # a trailing wildcard invokes prefix matching (reference BDS.java:324
    # "prefix matching is now indicated using a wildcard")
    if query.rstrip().endswith("*"):
        prefix_match = True
    if not q_tokens:
        raise ValueError("empty search query")
    if prefix_match:
        cond = None
        for t in q_tokens:
            c = F.col("token").startswith(t)
            cond = c if cond is None else (cond | c)
        hits = ti.df.where(cond)
    else:
        hits = ti.df.where(F.col("token").isin(q_tokens))
    return hits, q_tokens, prefix_match


def _query_weights(spark, q_tokens: list[str]) -> DataFrame:
    """Query term-frequency vector, L2-normalized — the reference
    normalizes the query exactly like a document
    (FullTextIndex.tokenize → qdata.normalize()).  → (qterm, qw)."""
    from collections import Counter
    import math

    cnt = Counter(q_tokens)
    qmag = math.sqrt(sum(v * v for v in cnt.values()))
    return spark.createDataFrame(
        [(t, v / qmag) for t, v in cnt.items()], "qterm string, qw double"
    )


def _scored_hits(hits: DataFrame, q_tokens: list[str], prefix_match: bool) -> DataFrame:
    """Join hits with the query vector: each matched (query term, index
    entry) pair contributes qw·w to the document's cosine
    (Hit.add(termNdx, queryTermWeight * termWeight) —
    ReadIndexTask.java:188)."""
    qdf = _query_weights(hits.sparkSession, q_tokens)
    cond = (
        hits["token"].startswith(qdf["qterm"])
        if prefix_match
        else hits["token"] == qdf["qterm"]
    )
    return hits.join(F.broadcast(qdf), cond)


def search(
    index: TextIndex | DataFrame,
    query: str,
    match_all_terms: bool = False,
    min_relevance: float | None = None,
    max_relevance: float | None = None,
    min_rank: int | None = None,
    max_rank: int | None = None,
    match_exact: bool = False,
    match_regex: str | None = None,
    prefix_match: bool = False,
    with_rank: bool = True,
) -> DataFrame:
    """bds:search semantics: OR-match query tokens against the index,
    score by normalized tf·idf cosine, rank by descending relevance.

    Returns: s | p | o_lex | o_dt | o_lang | relevance [| rank]
    (reference BDS.SEARCH/RELEVANCE/RANK/MATCH_ALL_TERMS/MIN_RELEVANCE/
    MAX_RELEVANCE/MIN_RANK/MAX_RANK/MATCH_EXACT/MATCH_REGEX/PREFIX_MATCH
    — BDS.java:94-431).  ``rank`` is attached only when requested
    (with_rank or a rank slice) — computing it is an extra pass the
    relational compiler usually doesn't need.  matchExact requires the
    literal to contain the query string verbatim; matchRegex applies a
    regex to the literal — both filter before ranking, as the reference
    filters hits at materialization.  minRank/maxRank page through the
    ranked results."""
    ti = index if isinstance(index, TextIndex) else build_text_index_from_df(index)
    hits, q_tokens, prefix_match = _match_hits(ti, query, prefix_match)

    # cosine = Σ_matched qw·w over the two unit-normalized tf vectors
    # (no idf — the reference's relevance is the plain local-weight
    # cosine, FullTextIndex.java:892 "The basic algorithm computes
    # cosine between the term-frequency vector of the query and the
    # indexed documents")
    scored = _scored_hits(hits, q_tokens, prefix_match)
    doc_keys = [c for c in ("g", "s", "p", "o_lex", "o_dt", "o_lang") if c in ti.df.columns]
    doc = scored.groupBy(*doc_keys).agg(
        F.sum(F.col("qw") * F.col("w")).alias("relevance"),
        F.count_distinct("qterm").alias("nmatched"),
    )
    if match_all_terms:
        doc = doc.where(F.col("nmatched") >= len(set(q_tokens)))
    if match_exact:
        doc = doc.where(F.col("o_lex").contains(query))
    if match_regex is not None:
        doc = doc.where(F.col("o_lex").rlike(match_regex))
    if min_relevance is not None:
        doc = doc.where(F.col("relevance") >= min_relevance)
    if max_relevance is not None:
        doc = doc.where(F.col("relevance") <= max_relevance)

    want_rank = with_rank or max_rank is not None or min_rank is not None
    if want_rank:
        # quantize relevance in the rank ORDER (not the output): equal-
        # score docs can differ by ulps from distributed float summation
        # order; un-quantized, the rank order is nondeterministic
        order = [F.desc(F.round(F.col("relevance"), 12)), F.asc("o_lex"), F.asc("s"), F.asc("p")]
        doc = ranked(doc, order, max_rank=max_rank)
        if min_rank is not None:
            doc = doc.where(F.col("rank") >= min_rank)
    cols = doc_keys + ["relevance"]
    if want_rank:
        cols.append("rank")
    return doc.select(*cols)


def subject_search(
    index: TextIndex | DataFrame,
    query: str,
    match_all_terms: bool = False,
    min_relevance: float | None = None,
    max_relevance: float | None = None,
    min_rank: int | None = None,
    max_rank: int | None = None,
    prefix_match: bool = False,
    with_rank: bool = True,
) -> DataFrame:
    """Subject-centric search (bds:subjectSearch — the reference's
    SUBJECT_CENTRIC_TEXT_INDEX, BDS.java:383): the scored document is
    the SUBJECT, all its literals' token frequencies pooled, so hits
    bind resources directly.  Returns: s | relevance [| rank]."""
    ti = index if isinstance(index, TextIndex) else build_text_index_from_df(index)
    hits, q_tokens, prefix_match = _match_hits(ti, query, prefix_match)

    # subject-centric document = the subject with all its literals'
    # token frequencies pooled; its weight vector is normalized over the
    # subject's FULL token space (computed only for matched subjects —
    # a left-semi join confines the aggregation)
    hit_subjects = hits.select("s").dropDuplicates()
    base = ti.df
    if "g" in base.columns:
        # graph duplicates must not double-count token frequencies
        base = base.drop("g").dropDuplicates()
    subj = (
        base.join(hit_subjects, "s", "left_semi")
        .groupBy("s", "token")
        .agg(F.sum("tf").alias("tf"))
    )
    smag = Window.partitionBy("s")
    subj = subj.withColumn(
        "w", lucene_norm(F.col("tf") / F.sqrt(F.sum(F.col("tf") * F.col("tf")).over(smag)))
    )
    scored = _scored_hits(subj, q_tokens, prefix_match)
    doc = scored.groupBy("s").agg(
        F.sum(F.col("qw") * F.col("w")).alias("relevance"),
        F.count_distinct("qterm").alias("nmatched"),
    )
    if match_all_terms:
        doc = doc.where(F.col("nmatched") >= len(set(q_tokens)))
    if min_relevance is not None:
        doc = doc.where(F.col("relevance") >= min_relevance)
    if max_relevance is not None:
        doc = doc.where(F.col("relevance") <= max_relevance)
    want_rank = with_rank or max_rank is not None or min_rank is not None
    if want_rank:
        doc = ranked(doc, [F.desc(F.round(F.col("relevance"), 12)), F.asc("s")], max_rank=max_rank)
        if min_rank is not None:
            doc = doc.where(F.col("rank") >= min_rank)
    return doc.select(*(["s", "relevance"] + (["rank"] if want_rank else [])))


def matching_subjects(index: TextIndex | DataFrame, query: str, prefix_match: bool = False) -> DataFrame:
    """Subjects linking to at least one literal matched by the search —
    the "search in search" filter set (reference
    SearchInSearchServiceFactory.java:89: restrict ?s bindings to
    subjects that link to a matched literal).  Returns: s (distinct)."""
    ti = index if isinstance(index, TextIndex) else build_text_index_from_df(index)
    hits, _, _ = _match_hits(ti, query, prefix_match)
    return hits.select("s").dropDuplicates()


def build_text_index_from_df(df: DataFrame) -> TextIndex:
    """Wrap a bare inverted-index DataFrame (counts the corpus — prefer
    passing the TextIndex built by build_text_index).  A pre-weights
    index (no ``w`` column) gets its quantized weights computed here."""
    if "w" not in df.columns:
        df = _with_weights(df)
    stats = df.agg(
        F.count_distinct("s", "p", "o_lex").alias("nd"),
        F.count_distinct("s").alias("ns"),
    ).collect()[0]
    return TextIndex(df, stats["nd"] or 1, stats["ns"] or 1)


def _tokenized_literals(statements: DataFrame) -> DataFrame:
    """statements → (token, s, p, o_lex, o_dt, o_lang, tf) rows — the
    index-build tokenization pipeline, shared by full build and delta
    maintenance."""
    lits = statements.where(
        (F.col("o_kind") == KIND_LITERAL)
        & (F.col("o_dt").isin(
            "http://www.w3.org/2001/XMLSchema#string",
            "http://www.w3.org/1999/02/22-rdf-syntax-ns#langString",
        ) | F.col("o_dt").isNull())
    ).select("g", "s", "p", "o_lex", "o_dt", "o_lang")
    tok = lits.select(
        "g", "s", "p", "o_lex", "o_dt", "o_lang",
        F.explode(tokenize(F.col("o_lex"))).alias("token"),
    )
    tf = tok.groupBy("token", "g", "s", "p", "o_lex", "o_dt", "o_lang").agg(
        F.count(F.lit(1)).alias("tf")
    )
    return _with_weights(tf)


def _with_weights(tf: DataFrame) -> DataFrame:
    """Index-time local term weight: the literal's token-frequency
    vector L2-normalized (TermFrequencyData.normalize — tf/√Σtf²),
    stored through the Lucene 8-bit norm quantization exactly like the
    reference's index tuples.  g rides along so dataset/GRAPH scoping
    can filter and bind the containing graph (quads-mode search —
    TestSearch named-graphs fixtures); it never affects the weight."""
    keys = [c for c in ("g", "s", "p", "o_lex", "o_dt", "o_lang") if c in tf.columns]
    mag = Window.partitionBy(*keys)
    return tf.withColumn(
        "w", lucene_norm(F.col("tf") / F.sqrt(F.sum(F.col("tf") * F.col("tf")).over(mag)))
    )


_LIT_KEY = ["g", "s", "p", "o_lex", "o_dt", "o_lang"]


def update_text_index(
    ti: TextIndex,
    new_statements: DataFrame,
    added: DataFrame | None = None,
    removed: DataFrame | None = None,
) -> TextIndex:
    """Delta-maintain an inverted index after a mutation (the
    incremental analog of the reference's FullTextIndex updates on
    load, FullTextIndex.java index(…) — VERDICT r02 item 7).

    Only the literal keys touched by ``added``/``removed`` are
    re-tokenized (from ``new_statements``, the post-mutation truth, so
    multi-graph duplicates keep correct term frequencies); everything
    else is carried over untouched.  Corpus stats are recomputed with
    one aggregate over the updated index — no full re-tokenize job.
    """
    spark_keys = None
    for delta in (added, removed):
        if delta is None:
            continue
        k = delta.select(*_LIT_KEY).dropDuplicates()
        spark_keys = k if spark_keys is None else spark_keys.unionByName(k).dropDuplicates()
    if spark_keys is None:
        return ti
    spark_keys = spark_keys.select(
        *[F.col(c).alias(f"__k_{c}") for c in _LIT_KEY]
    ).localCheckpoint(eager=True)

    def key_cond(left: DataFrame):
        # o_dt/o_lang are nullable: equi-joins would drop NULL keys
        cond = None
        for c in _LIT_KEY:
            e = left[c].eqNullSafe(spark_keys[f"__k_{c}"])
            cond = e if cond is None else cond & e
        return cond

    kept = ti.df.join(spark_keys, key_cond(ti.df), "left_anti")
    touched = new_statements.join(spark_keys, key_cond(new_statements), "left_semi")
    rebuilt = _tokenized_literals(touched)
    df = kept.unionByName(rebuilt).persist()
    stats = df.agg(
        F.count_distinct("s", "p", "o_lex").alias("nd"),
        F.count_distinct("s").alias("ns"),
    ).collect()[0]
    # the stats collect() above materialized the new generation; the
    # superseded one would otherwise pin executor storage for every
    # mutation in a long UPDATE sequence
    ti.df.unpersist()
    return TextIndex(df, stats["nd"] or 1, stats["ns"] or 1)
