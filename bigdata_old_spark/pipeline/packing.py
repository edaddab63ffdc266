"""Sequence packing for LM-training pipelines: concat-then-chunk.

The standard pretraining data layout concatenates documents (within a
shard) and slices the token stream into fixed-size training sequences;
a document is described by the sequence it starts in, its offset there,
and the last sequence it spills into.  This is the deterministic,
window-expressible form of packing (greedy bin-packing variants need
per-partition sequential state; chunked concatenation is what large LM
pipelines actually run, and it wastes zero tokens by construction).

100 TB shape: documents are sharded into ``n_buckets`` independent
streams and every window is PARTITIONED by bucket — no global window,
no single-partition sort.  Each bucket's pack layout depends only on
its own members (deterministic given the corpus), so the operator is
embarrassingly parallel and re-runnable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from bigdata_old_spark.pipeline.text import tokens


def concat_chunk_packing(
    docs: DataFrame,
    budget: int,
    n_buckets: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
    tokens_col: str | None = None,
) -> DataFrame:
    """Assign each document its place in the chunked token stream.

    Returns: id_col | bucket | n_tokens | seq_id | seq_offset | end_seq_id
      * bucket      — shard (id mod n_buckets; deterministic, join-free)
      * seq_id      — index of the training sequence the doc starts in
                      (per bucket, 0-based)
      * seq_offset  — token offset of the doc inside that sequence
      * end_seq_id  — last sequence the doc reaches (== seq_id when it
                      fits; docs longer than the remaining space span
                      multiple sequences, exactly like chunked
                      concatenation slices them)
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    n_tok = (
        F.col(tokens_col)
        if tokens_col is not None
        else F.size(tokens(F.col(text_col)))
    ).cast("long")
    df = docs.select(
        F.col(id_col),
        (F.col(id_col) % n_buckets).cast("long").alias("bucket"),
        n_tok.alias("n_tokens"),
    )
    w = (
        Window.partitionBy("bucket")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cb = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return df.select(
        id_col,
        "bucket",
        "n_tokens",
        F.floor(cb / budget).alias("seq_id"),
        (cb % budget).alias("seq_offset"),
        F.greatest(
            F.floor(cb / budget),
            F.floor((cb + F.col("n_tokens") - 1) / budget),
        ).alias("end_seq_id"),
    )


def pack_budget_stats(packed: DataFrame, budget: int) -> DataFrame:
    """Per-bucket packing summary: sequences used, token utilization of
    the final (ragged) sequence — the sanity dashboard for a packing
    run.  One small aggregation."""
    return packed.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        (F.floor((F.sum("n_tokens") - 1) / budget) + 1).alias("n_sequences"),
    )


def chunk_documents(
    df: DataFrame,
    max_tokens: int = 512,
    overlap: int = 0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Split each document into context-window chunks of at most
    ``max_tokens`` whitespace tokens, consecutive chunks sharing
    ``overlap`` tokens (the standard long-document → training-window
    splitter; packing's concat-then-chunk is the complementary
    short-document path).  Empty documents yield no chunks; the final
    chunk may be short.

    Returns: doc_id | chunk_id | n_tokens | chunk_text.

    Pure per-row Catalyst array expressions (transform over the chunk
    starts + posexplode) — zero shuffle, runs in whole-stage codegen at
    any scale."""
    if not 0 <= overlap < max_tokens:
        raise ValueError("need 0 <= overlap < max_tokens")
    from bigdata_old_spark.pipeline.text import tokens

    toks = tokens(F.col(text_col))
    step = max_tokens - overlap
    starts = F.sequence(
        F.lit(1), F.greatest(F.size(toks) - overlap, F.lit(1)), F.lit(step)
    )
    chunks = F.transform(starts, lambda s: F.slice(toks, s, max_tokens))
    return (
        df.select(F.col(id_col), F.posexplode(chunks).alias("chunk_id", "__c"))
        .where(F.size(F.col("__c")) > 0)
        .select(
            id_col,
            F.col("chunk_id").cast("long").alias("chunk_id"),
            F.size("__c").cast("long").alias("n_tokens"),
            F.array_join("__c", " ").alias("chunk_text"),
        )
    )
