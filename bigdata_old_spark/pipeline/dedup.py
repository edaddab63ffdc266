"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Scale shapes (the whole point of each design):
  * exact: one hash-shuffle groupBy — linear.
  * MinHash-LSH: signatures are per-row map work; candidate generation
    is a self-join on (band, band_hash) buckets, so the quadratic blowup
    is confined to same-bucket collisions instead of all pairs.
  * SimHash: per-row 64-bit signature; near-dup candidates via exact
    bucket match on rotated signature halves (Hamming ≤ radius).
  * verification joins recompute true Jaccard only on candidates.

All signature math is Catalyst array expressions — no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from bigdata_old_spark.pipeline.text import tokens


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------

def exact_duplicates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    normalize: bool = True,
    max_ids: int | None = 1000,
) -> DataFrame:
    """Groups of documents with identical (normalized) content.
    Returns: content_hash | keep_id (min) | n_dups | doc_ids.

    ``max_ids`` caps the materialized doc_ids array (VERDICT r6 #8: a
    degenerate corpus — billions of empty/boilerplate docs sharing one
    hash — must not OOM a single task collecting every member id);
    ``max_ids=None`` skips the collect entirely (keep_id/n_dups alone
    drive exact_dedup, and they aggregate without any array state)."""
    from pyspark.sql import Window

    c = F.col(text_col)
    if normalize:
        c = F.lower(F.trim(F.regexp_replace(c, r"\s+", " ")))
    h = F.md5(c)
    sel = df.select(F.col(id_col), h.alias("content_hash"))
    aggs = [
        F.min(id_col).alias("keep_id"),
        F.count(F.lit(1)).alias("n_dups"),
    ]
    if max_ids is None:
        return sel.groupBy("content_hash").agg(*aggs)
    # bound the aggregation STATE, not just the output row: rank within
    # the group first (window on the same hash key — the groupBy reuses
    # that partitioning, no second exchange) and collect only rank ≤
    # max_ids; collect_list skips NULLs, so a degenerate group holds at
    # most max_ids ids in its buffer instead of every member
    w = Window.partitionBy("content_hash").orderBy(id_col)
    ranked = sel.withColumn("__rn", F.row_number().over(w))
    aggs.append(
        F.sort_array(
            F.collect_list(F.when(F.col("__rn") <= max_ids, F.col(id_col)))
        ).alias("doc_ids")
    )
    return ranked.groupBy("content_hash").agg(*aggs)


def exact_dedup(df: DataFrame, id_col: str = "doc_id", text_col: str = "text", normalize: bool = True) -> DataFrame:
    """Keep one representative (min id) per identical content."""
    groups = exact_duplicates(df, id_col, text_col, normalize)
    keep = groups.select(F.col("keep_id").alias(id_col))
    return df.join(keep, id_col, "left_semi")


# ---------------------------------------------------------------------------
# Shingles + MinHash + LSH
# ---------------------------------------------------------------------------

def shingles(col: Column, k: int = 3) -> Column:
    """k-token shingle strings (distinct)."""
    toks = tokens(F.lower(col))
    n = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    sh = F.when(n >= k, F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k)))) \
          .otherwise(F.array(F.concat_ws(" ", toks)))
    return F.array_distinct(sh)


def minhash_signature(sh: Column, num_hashes: int = 32) -> list[Column]:
    """num_hashes independent min-hashes; independence via salting the
    64-bit hash with the permutation index."""
    return [
        F.array_min(F.transform(sh, lambda s: F.xxhash64(s, F.lit(i)))).alias(f"mh{i}")
        for i in range(num_hashes)
    ]


def jaccard(a: Column, b: Column) -> Column:
    inter = F.size(F.array_intersect(a, b))
    union = F.size(F.array_union(a, b))
    return F.when(union > 0, inter / union).otherwise(F.lit(1.0))


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    min_jaccard: float | None = 0.7,
) -> DataFrame:
    """Near-duplicate candidate pairs via banded MinHash-LSH, verified
    with true shingle Jaccard.  Returns: id_a | id_b | jaccard (a<b)."""
    assert num_hashes % bands == 0
    base = df.select(F.col(id_col).alias("id"), shingles(F.col(text_col), k).alias("sh"))
    # candidate pairs: same hash in ANY band → explode to (band_idx, key).
    # Only (id, band, hash) rides the explode and the self-join — the
    # shingle arrays would amplify shuffle bytes ∝ bands; candidates are
    # joined back to the one-row-per-doc shingle table for verification.
    # ONE band-keying implementation (_band_buckets) serves this, the
    # persisted index, and the fuzzy-decontam path — the
    # batch-vs-index ≡ full-corpus contract depends on them agreeing.
    buckets = _band_buckets(base, num_hashes, bands)
    l = buckets.alias("l")
    r = buckets.select(F.col("id").alias("rid"), "b", "h").alias("r")
    cand = (
        l.join(r, ["b", "h"])
        .where(F.col("l.id") < F.col("rid"))
        .select(F.col("l.id").alias("id_a"), F.col("rid").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    # verify candidates with true shingle Jaccard (two slim joins)
    sh_a = base.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"))
    sh_b = base.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"))
    pairs = (
        cand.join(sh_a, "id_a")
        .join(sh_b, "id_b")
        .select("id_a", "id_b", jaccard(F.col("sh_a"), F.col("sh_b")).alias("jaccard"))
    )
    if min_jaccard is not None:
        pairs = pairs.where(F.col("jaccard") >= min_jaccard)
    return pairs


def minhash_dedup(df: DataFrame, id_col: str = "doc_id", text_col: str = "text", **kw) -> DataFrame:
    """Drop near-duplicates: greedy keep-lowest-id via connected pairs.
    (One union-find round — sufficient when duplicate clusters are
    shallow; run to fixpoint for deep chains.)"""
    pairs = minhash_lsh_pairs(df, id_col, text_col, **kw)
    drop = pairs.select(F.col("id_b").alias(id_col)).dropDuplicates()
    return df.join(drop, id_col, "left_anti")


# ---------------------------------------------------------------------------
# Incremental corpus-scale dedup: persisted signature index + batch join
# ---------------------------------------------------------------------------

def _band_buckets(base: DataFrame, num_hashes: int, bands: int) -> DataFrame:
    """(id, sh) → exploded (id, b, h) band-bucket keys."""
    rows_per_band = num_hashes // bands
    sig = base.select("id", *minhash_signature(F.col("sh"), num_hashes))
    band_cols = [
        F.xxhash64(*[F.col(f"mh{b * rows_per_band + r}") for r in range(rows_per_band)]).alias(f"band{b}")
        for b in range(bands)
    ]
    sig = sig.select("id", *band_cols)
    return sig.select(
        "id",
        F.explode(
            F.arrays_zip(
                F.array(*[F.lit(b) for b in range(bands)]).alias("b"),
                F.array(*[F.col(f"band{b}") for b in range(bands)]).alias("h"),
            )
        ).alias("bk"),
    ).select("id", F.col("bk.b").alias("b"), F.col("bk.h").alias("h"))


class DedupIndex:
    """Persisted MinHash-LSH state of an already-ingested corpus:
    the slim ``buckets`` table (id, band, band_hash) for candidate
    generation and the ``shingles`` table (id, shingle set) for exact
    verification.  New batches dedup AGAINST this index — the corpus is
    never re-read or re-self-joined (the ingest-time workflow a 100 TB
    pipeline needs: signatures are computed once per document,
    candidate generation is the batch's bucket keys probing the stored
    bucket table)."""

    def __init__(self, buckets: DataFrame, shingles: DataFrame,
                 k: int, num_hashes: int, bands: int) -> None:
        self.buckets = buckets
        self.shingles = shingles
        self.k, self.num_hashes, self.bands = k, num_hashes, bands

    def save(self, path: str) -> "DedupIndex":
        """Write the index tables as parquet (buckets partitioned by
        band — a batch probe prunes to its band directories)."""
        self.buckets.write.mode("overwrite").partitionBy("b").parquet(path + "/buckets")
        self.shingles.write.mode("overwrite").parquet(path + "/shingles")
        spark = self.buckets.sparkSession
        return DedupIndex(
            spark.read.parquet(path + "/buckets").select("id", "b", "h"),
            spark.read.parquet(path + "/shingles"),
            self.k, self.num_hashes, self.bands,
        )


def build_dedup_index(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    path: str | None = None,
) -> DedupIndex:
    """Compute the corpus's MinHash-LSH signature index (one linear
    pass).  With ``path``, persist it and return the disk-backed index
    (survives restarts; later batches touch only these tables)."""
    assert num_hashes % bands == 0
    base = df.select(F.col(id_col).alias("id"), shingles(F.col(text_col), k).alias("sh"))
    idx = DedupIndex(_band_buckets(base, num_hashes, bands), base, k, num_hashes, bands)
    return idx.save(path) if path else idx


def load_dedup_index(spark, path: str, k: int = 3, num_hashes: int = 32, bands: int = 8) -> DedupIndex:
    return DedupIndex(
        spark.read.parquet(path + "/buckets").select("id", "b", "h"),
        spark.read.parquet(path + "/shingles"),
        k, num_hashes, bands,
    )


def dedup_index_exists(spark, path: str) -> bool:
    # Hadoop-FS check, not os.path — the index may live on hdfs://,
    # s3a://, …, where a driver-local isdir is always False and every
    # ingest batch would re-bootstrap (overwriting the index)
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path + "/buckets")
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return bool(fs.exists(hpath))


def append_to_dedup_index(
    index: DedupIndex,
    path: str,
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """Append new documents' signatures to a persisted index (the
    ingest-time index maintenance step: one linear pass over the new
    docs; the existing index files are untouched)."""
    base = docs.select(F.col(id_col).alias("id"), shingles(F.col(text_col), index.k).alias("sh"))
    _band_buckets(base, index.num_hashes, index.bands).write.mode("append").partitionBy(
        "b"
    ).parquet(path + "/buckets")
    base.write.mode("append").parquet(path + "/shingles")


def dedup_against(
    index: DedupIndex,
    batch: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_jaccard: float | None = 0.7,
) -> DataFrame:
    """Near-duplicate pairs TOUCHING the new batch — batch-vs-corpus
    plus batch-internal — verified with true shingle Jaccard; id_a <
    id_b.  Equals ``minhash_lsh_pairs(corpus ∪ batch)`` restricted to
    pairs with ≥1 batch member, without re-reading the corpus: the
    corpus contributes only its stored bucket + shingle tables, and the
    batch's (small) bucket keys broadcast into the probe join."""
    base_b = batch.select(F.col(id_col).alias("id"), shingles(F.col(text_col), index.k).alias("sh"))
    bb = _band_buckets(base_b, index.num_hashes, index.bands)
    # batch ⋈ corpus: the stored bucket table is probed by the batch's
    # broadcast bucket keys — no corpus shuffle, band partitions prune
    probe = F.broadcast(bb.select(F.col("id").alias("bid"), "b", "h"))
    cand_x = (
        index.buckets.join(probe, ["b", "h"])
        .where(F.col("id") != F.col("bid"))
        .select(
            F.least("id", "bid").alias("id_a"),
            F.greatest("id", "bid").alias("id_b"),
        )
    )
    # batch-internal candidates (small self-join)
    l = bb.alias("l")
    r = bb.select(F.col("id").alias("rid"), "b", "h").alias("r")
    cand_i = (
        l.join(r, ["b", "h"])
        .where(F.col("l.id") < F.col("rid"))
        .select(F.col("l.id").alias("id_a"), F.col("rid").alias("id_b"))
    )
    cand = cand_x.unionByName(cand_i).dropDuplicates(["id_a", "id_b"])
    sh_all = index.shingles.unionByName(base_b)
    sh_a = sh_all.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"))
    sh_b = sh_all.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"))
    pairs = (
        cand.join(sh_a, "id_a")
        .join(sh_b, "id_b")
        .select("id_a", "id_b", jaccard(F.col("sh_a"), F.col("sh_b")).alias("jaccard"))
    )
    if min_jaccard is not None:
        pairs = pairs.where(F.col("jaccard") >= min_jaccard)
    return pairs


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash(col: Column, bits: int = 64, token_hash: str = "xxhash64") -> Column:
    """SimHash over tokens: per-bit signed vote weighted by token
    occurrences, sign → bit.  Pure array-expression implementation; the
    bit loop unrolls into a static Catalyst expression (shift amounts
    must be Python ints).

    token_hash: "xxhash64" (default, fastest, 64-bit) or "md5" — the
    top 60 bits of md5, which an external SQL engine can reproduce
    (DuckDB ``('0x'||substr(md5(t),1,15))::BIGINT``), making signatures
    oracle-checkable.  Use bits=60 with "md5"."""
    toks = tokens(F.lower(col))
    if token_hash == "md5":
        if bits > 60:
            raise ValueError("md5 token_hash provides 60 usable bits")
        hashes = F.transform(
            toks, lambda t: F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("long")
        )
    else:
        hashes = F.transform(toks, lambda t: F.xxhash64(t))

    def vote_at(i: int) -> Column:
        def merge(acc, h):
            return acc + F.when(F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)

        return F.aggregate(hashes, F.lit(0).cast("long"), merge)

    sig = F.lit(0).cast("long")
    for i in range(bits):
        bit_val = F.lit(1 << i if i < 63 else -(1 << 63)).cast("long")
        sig = sig + F.when(vote_at(i) > 0, bit_val).otherwise(F.lit(0).cast("long"))
    return sig


def hamming64(a: Column, b: Column) -> Column:
    return F.bit_count(a.bitwiseXOR(b))


def simhash_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    blocks: int = 4,
    bits: int = 64,
    token_hash: str = "xxhash64",
) -> DataFrame:
    """Near-dup pairs by SimHash: pigeonhole the ``bits`` bits into
    ``blocks`` segments — any pair within Hamming ≤ blocks-1 shares ≥1
    exact segment, so candidates come from equality joins on segments.
    Returns: id_a | id_b | hamming.

    Pigeonhole blocking guarantees full recall only for
    max_hamming ≤ blocks-1; beyond that the output set depends on
    which bits happen to differ, i.e. it is not a well-defined function
    of the inputs' neighborhood structure — so it is rejected."""
    if bits % blocks:
        raise ValueError(f"blocks={blocks} must divide bits={bits}")
    if max_hamming > blocks - 1:
        raise ValueError(
            f"max_hamming={max_hamming} exceeds the pigeonhole recall "
            f"guarantee (blocks-1={blocks - 1}); raise blocks"
        )
    width = bits // blocks
    base = df.select(
        F.col(id_col).alias("id"),
        simhash(F.col(text_col), bits=bits, token_hash=token_hash).alias("sig"),
    )
    seg = base.select(
        "id", "sig",
        F.explode(
            F.arrays_zip(
                F.array(*[F.lit(b) for b in range(blocks)]).alias("b"),
                F.array(*[
                    F.shiftrightunsigned(F.col("sig"), b * width).bitwiseAND(F.lit((1 << width) - 1)).alias(f"s{b}")
                    for b in range(blocks)
                ]).alias("k"),
            )
        ).alias("bk"),
    ).select("id", "sig", F.col("bk.b").alias("b"), F.col("bk.k").alias("k"))
    l = seg.alias("l")
    r = seg.select(F.col("id").alias("rid"), F.col("sig").alias("rsig"), "b", "k").alias("r")
    return (
        l.join(r, ["b", "k"])
        .where(F.col("l.id") < F.col("rid"))
        .select(F.col("l.id").alias("id_a"), F.col("rid").alias("id_b"),
                hamming64(F.col("l.sig"), F.col("rsig")).alias("hamming"))
        .dropDuplicates(["id_a", "id_b"])
        .where(F.col("hamming") <= max_hamming)
    )


# ---------------------------------------------------------------------------
# Near-duplicate clustering (pairs → components → canonical doc)
# ---------------------------------------------------------------------------

def dedup_clusters(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    pairs: DataFrame | None = None,
    keep_score=None,
    **lsh_kw,
) -> DataFrame:
    """Near-duplicate clusters with a canonical representative per
    cluster — the standard "collapse LSH pairs into groups, keep one"
    step of a training-data dedup pipeline.

    Connected components over the verified near-dup pair graph (pairs
    default to :func:`minhash_lsh_pairs`); cluster id = min member id;
    ``is_keep`` marks the canonical doc.  Docs in no pair are singleton
    clusters of themselves.

    ``keep_score`` (optional Column over ``df``, e.g.
    ``token_count(F.col("text"))`` or a quality-classifier output):
    when given, the canonical member is the HIGHEST-scoring one (ties →
    min id) instead of the min-id one — "keep the best copy", the
    quality-aware variant of the standard pipeline step.  Cluster ids
    stay min-member for stability.

    Returns: doc_id | cluster_id | is_keep.

    Scale shape: the pair graph comes from banded LSH (never all
    pairs), and CC is min-label propagation — rounds ∝ cluster
    diameter, and near-dup clusters are shallow (copies of one
    original), so it converges in 2-3 rounds of slim (id, id) shuffles.
    The final assignment is one left join keyed on the doc id.
    """
    from bigdata_old_spark.analytics import connected_components

    if pairs is None:
        pairs = minhash_lsh_pairs(df, id_col, text_col, **lsh_kw)
    edges = pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    comp = connected_components(edges)  # v | component (pair members only)
    assigned = (
        df.select(F.col(id_col).alias("doc_id"),
                  *([] if keep_score is None else [keep_score.alias("__score")]))
        .join(comp.select(F.col("v").alias("doc_id"), "component"), "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("component"), F.col("doc_id")).alias("cluster_id"),
            *([] if keep_score is None else [F.col("__score")]),
        )
    )
    if keep_score is None:
        return assigned.withColumn("is_keep", F.col("doc_id") == F.col("cluster_id"))
    from pyspark.sql import Window

    # per-CLUSTER window (never global): best score, then min id
    w = Window.partitionBy("cluster_id").orderBy(
        F.desc("__score"), F.asc("doc_id"))
    return (
        assigned.withColumn("__rn", F.row_number().over(w))
        .select("doc_id", "cluster_id", (F.col("__rn") == 1).alias("is_keep"))
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard (direct, for verification / small candidate sets)
# ---------------------------------------------------------------------------

def ngram_jaccard_pairs(df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
                        k: int = 3, min_jaccard: float = 0.5) -> DataFrame:
    """All-pairs n-gram Jaccard ≥ threshold.  O(n²) — the exactness
    baseline the LSH variants are verified against; at scale use
    minhash_lsh_pairs."""
    base = df.select(F.col(id_col).alias("id"), shingles(F.col(text_col), k).alias("sh"))
    l, r = base.alias("l"), base.select(F.col("id").alias("rid"), F.col("sh").alias("rsh")).alias("r")
    return (
        l.crossJoin(r)
        .where(F.col("id") < F.col("rid"))
        .select(F.col("id").alias("id_a"), F.col("rid").alias("id_b"),
                jaccard(F.col("sh"), F.col("rsh")).alias("jaccard"))
        .where(F.col("jaccard") >= min_jaccard)
    )


# ---------------------------------------------------------------------------
# Line-level corpus dedup (boilerplate removal)
# ---------------------------------------------------------------------------

def line_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_docs: int = 2,
    sep: str = "\n",
) -> DataFrame:
    """CCNet-style line-level dedup across the corpus: drop every line
    whose exact text occurs in >= ``min_docs`` DISTINCT documents
    (boilerplate — nav bars, cookie banners, license footers), keeping
    the remaining lines in their original order.

    Returns: id_col | text_dedup | n_lines | n_removed.  A document all
    of whose lines are boilerplate survives with empty text (the caller
    decides whether to drop empties — a quality filter's job, not this
    op's).

    Scale shape: posexplode is map-side; the boilerplate-line set is
    one groupBy with a partial count-distinct (map-side combine on
    (line, doc) pairs), and is tiny relative to the corpus — AQE turns
    the left_anti join into a broadcast.  Reconstruction groups by the
    doc id only.  At 100 TB, shuffling raw line text can be slimmed to
    xxhash64(line) keys at a 2^-64 collision risk; this implementation
    keys on the exact line so results are exact (and oracle-checkable).
    """
    import re as _re

    sep_rx = _re.escape(sep)  # split() is regex; join is literal — keep them agreeing
    lines = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), sep_rx, -1)).alias("pos", "line"),
    )
    boiler = (
        lines.groupBy("line")
        .agg(F.count_distinct(F.col(id_col)).alias("ndocs"))
        .where(F.col("ndocs") >= min_docs)
        .select("line")
    )
    kept = lines.join(boiler, "line", "left_anti")
    rebuilt = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda s: s["line"],
            ),
            sep,
        ).alias("text_dedup"),
        F.count(F.lit(1)).alias("__n_kept"),
    )
    base = df.select(
        F.col(id_col),
        F.size(F.split(F.col(text_col), sep_rx, -1)).cast("long").alias("n_lines"),
    )
    return base.join(rebuilt, id_col, "left").select(
        id_col,
        F.coalesce(F.col("text_dedup"), F.lit("")).alias("text_dedup"),
        F.col("n_lines"),
        (F.col("n_lines") - F.coalesce(F.col("__n_kept"), F.lit(0))).cast("long").alias("n_removed"),
    )


# ---------------------------------------------------------------------------
# Exact duplicate-SPAN detection (substring-level dedup — Lee et al.
# 2021, "Deduplicating Training Data Makes Language Models Better":
# repeated ≥k-token substrings, not just whole-document duplicates)
# ---------------------------------------------------------------------------

def _dup_window_keys(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int,
    min_count: int,
    window_hash: str,
) -> tuple[DataFrame, DataFrame]:
    """Shared windows→duplicated-starts pipeline for the span ops:
    returns (base (id, toks), dup window starts (id, i) — 1-based
    starts of windows whose text occurs >= min_count times)."""
    toks = tokens(F.lower(F.col(text_col)))
    base = df.select(F.col(id_col).alias("id"), toks.alias("toks"))
    n = F.size("toks")
    # window start positions 1..n-k+1 (1-based to match SQL slicing)
    wins = base.where(n >= k).select(
        "id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(1), F.size("toks") - k + 1),
                lambda i: F.concat_ws(" ", F.slice("toks", i, k)),
            )
        ).alias("pos0", "wtext"),
    )
    keyed = wins.select(
        "id",
        (F.col("pos0") + 1).alias("i"),  # 1-based window start
        (F.md5("wtext") if window_hash == "md5" else F.xxhash64("wtext").cast("string")).alias("wkey"),
    )
    dup_keys = (
        keyed.groupBy("wkey")
        .agg(F.count(F.lit(1)).alias("occ"))
        .where(F.col("occ") >= min_count)
        .select("wkey")
    )
    return base, keyed.join(dup_keys, "wkey", "left_semi").select("id", "i")


def duplicate_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 10,
    min_count: int = 2,
    window_hash: str = "xxhash64",
) -> DataFrame:
    """Per-document duplicated-token statistics from EXACT repeated
    spans: a token position is "duplicated" iff it lies inside some
    k-token window whose exact text occurs >= ``min_count`` times in
    the corpus (counting every occurrence, including repeats within one
    document — the suffix-array dedup criterion of Lee et al. 2021
    re-expressed as rolling-window hashing: a repeated substring of
    length >= k is exactly a run of repeated k-windows, so the covered
    positions coincide with the suffix-array answer for spans >= k).

    Returns: id_col | n_tokens | n_dup_tokens | dup_frac.

    Scale shape (the reason this is windows, not suffix arrays): a
    distributed suffix array needs a global sort of every suffix;
    rolling windows need (1) a map-side posexplode to slim
    (id, pos, window_hash) rows, (2) ONE count shuffle on the window
    hash (map-side combine collapses per-partition repeats first), and
    (3) one groupBy(id) to merge covered positions per document —
    all linear, no global order.  ``window_hash='md5'`` keeps the key
    replayable by an external SQL oracle; 'xxhash64' is the cheaper
    8-byte production key (2^-64 collisions mark a span duplicated
    spuriously; acceptable for corpus hygiene, not for the gate).
    Documents shorter than k tokens have no windows and report 0.
    """
    base, dup_wins = _dup_window_keys(df, id_col, text_col, k, min_count, window_hash)
    covered = (
        dup_wins
        .select("id", F.explode(F.sequence(F.col("i"), F.col("i") + k - 1)).alias("p"))
        .dropDuplicates(["id", "p"])
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_dup_tokens"))
    )
    return (
        base.select("id", F.size("toks").cast("long").alias("n_tokens"))
        .join(covered, "id", "left")
        .select(
            F.col("id").alias(id_col),
            "n_tokens",
            F.coalesce(F.col("n_dup_tokens"), F.lit(0)).cast("long").alias("n_dup_tokens"),
            (
                F.coalesce(F.col("n_dup_tokens"), F.lit(0))
                / F.greatest(F.col("n_tokens"), F.lit(1))
            ).alias("dup_frac"),
        )
    )


def strip_duplicate_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 10,
    min_count: int = 2,
    window_hash: str = "xxhash64",
) -> DataFrame:
    """Rebuild each document keeping only tokens OUTSIDE duplicated
    spans (the destructive half of Lee et al.'s ExactSubstr dedup).
    Lowercased tokens — span identity is case-folded, and the rebuilt
    text is the case-folded token stream (byte-exact reconstruction
    would carry the original offsets; the training-data consumer
    tokenizes anyway).  Shares :func:`_dup_window_keys` with
    :func:`duplicate_spans` so the stats pass and the destructive pass
    can never disagree on what counts as a duplicated span.  Returns:
    id_col | text_stripped | n_tokens | n_dup_tokens."""
    base, dup_wins = _dup_window_keys(df, id_col, text_col, k, min_count, window_hash)
    covered = (
        dup_wins
        .select("id", F.explode(F.sequence(F.col("i"), F.col("i") + k - 1)).alias("p"))
        .groupBy("id")
        .agg(F.collect_set("p").alias("dup_pos"))
    )
    joined = base.join(covered, "id", "left")
    dup_pos = F.coalesce(F.col("dup_pos"), F.array().cast("array<int>"))
    kept = F.filter(
        F.transform(F.col("toks"), lambda t, i: F.struct((i + 1).alias("p"), t.alias("t"))),
        lambda s: ~F.array_contains(dup_pos, s["p"]),
    )
    return joined.select(
        F.col("id").alias(id_col),
        F.concat_ws(" ", F.transform(kept, lambda s: s["t"])).alias("text_stripped"),
        F.size("toks").cast("long").alias("n_tokens"),
        F.size(dup_pos).cast("long").alias("n_dup_tokens"),
    )


# ---------------------------------------------------------------------------
# Containment detection (asymmetric near-dup: one document included in
# another — Broder 1997's containment measure |A∩B| / |A|)
# ---------------------------------------------------------------------------

def containment_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    min_containment: float = 0.8,
    min_shingles: int = 1,
) -> DataFrame:
    """Directed containment pairs: (id_a, id_b) where at least
    ``min_containment`` of A's distinct k-shingles also occur in B —
    the signal Jaccard misses when a short document (a quote, an
    excerpt, a syndicated snippet) is embedded inside a much longer
    one, since the union in Jaccard's denominator drowns it.

    Scale shape: NO all-pairs join — documents explode to DISTINCT
    (shingle, id) rows, candidate pairs materialize only where a
    shingle is actually shared (an equi-join on the shingle), and the
    per-pair intersection count is one groupBy.  Comparison volume is
    sum over shingles of doc-frequency², the same bound as the
    boilerplate-aware inverted-index joins in IR engines; drop
    ultra-common shingles (a ``line_dedup``-style boilerplate pass)
    before calling at corpus scale if a crawl has mega-frequency
    shingles.  ``min_shingles`` filters trivially short documents whose
    containment is noise.

    Returns: id_a | id_b | containment (round to taste downstream);
    both directions are reported independently (A-in-B and B-in-A are
    different facts).
    """
    base = df.select(
        F.col(id_col).alias("id"),
        F.array_distinct(shingles(F.col(text_col), k)).alias("sh"),
    ).where(F.size("sh") >= min_shingles)
    sizes = base.select("id", F.size("sh").alias("n"))
    toks = base.select("id", F.explode("sh").alias("s"))
    pair_counts = (
        toks.alias("a")
        .join(toks.alias("b"), "s")
        .where(F.col("a.id") != F.col("b.id"))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count("*").alias("shared"))
    )
    return (
        pair_counts.join(sizes.withColumnRenamed("id", "id_a"), "id_a")
        .select(
            "id_a", "id_b",
            (F.col("shared") / F.col("n")).alias("containment"),
        )
        .where(F.col("containment") >= min_containment)
    )


# ---------------------------------------------------------------------------
# Edit-distance verified near-dup (the exact-verification tier UNDER
# the shingle/signature family: catches small in-place edits —
# typo-level plagiarism, templated spam variants — where Jaccard over
# shingles is blunt)
# ---------------------------------------------------------------------------

def edit_distance_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_distance: int = 60,
    pairs: DataFrame | None = None,
    **lsh_kw,
) -> DataFrame:
    """Document pairs within ``max_distance`` EXACT Levenshtein edits.

    Candidate pairs default to banded MinHash-LSH blocking
    (:func:`minhash_lsh_pairs` with the Jaccard gate disabled — LSH
    recalls shingle-similar pairs, and any pair within d edits shares
    all but O(d·k) of its k-shingles, so small-edit pairs collide in
    the bands); pass ``pairs`` (id_a | id_b) to verify an explicit
    candidate set (e.g. the all-pairs exactness baseline).

    Returns: id_a | id_b | edit_distance (a < b).

    Scale shape: verification is two slim id-keyed joins to fetch the
    texts, a ROW-LOCAL length prefilter (|len_a − len_b| > d can never
    pass — no DP runs for grossly mismatched pairs), and Spark's
    thresholded ``levenshtein(l, r, d)`` which abandons the DP early
    and returns −1 above the threshold — cost is O(d·min(m,n)) per
    surviving candidate, never O(m·n) on the corpus.
    """
    if pairs is None:
        pairs = minhash_lsh_pairs(
            df, id_col, text_col, min_jaccard=None, **lsh_kw
        ).select("id_a", "id_b")
    t_a = df.select(F.col(id_col).alias("id_a"), F.col(text_col).alias("__ta"))
    t_b = df.select(F.col(id_col).alias("id_b"), F.col(text_col).alias("__tb"))
    return (
        pairs.join(t_a, "id_a")
        .join(t_b, "id_b")
        .where(
            F.abs(F.length("__ta") - F.length("__tb")) <= max_distance
        )
        .select(
            "id_a", "id_b",
            F.levenshtein(F.col("__ta"), F.col("__tb"), max_distance).alias("edit_distance"),
        )
        .where(F.col("edit_distance") >= 0)
    )


def url_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    url_col: str = "url",
    keep_query: bool = False,
) -> DataFrame:
    """URL-level dedup — the FIRST pass of every crawl pipeline (one
    page crawled under many URL spellings keeps one copy, min id wins):
    key = :func:`bigdata_old_spark.pipeline.text.canonical_url`, then
    one hash groupBy on the canonical key + a semi join back.  Scale
    shape is identical to exact_dedup: the only shuffle is the slim
    (key, min id) aggregate; the corpus itself never reshuffles."""
    from bigdata_old_spark.pipeline.text import canonical_url

    keyed = df.select(
        F.col(id_col).alias("__id"),
        canonical_url(F.col(url_col), keep_query=keep_query).alias("__k"),
    )
    keep = (keyed.groupBy("__k").agg(F.min("__id").alias(id_col))
            .select(id_col))
    return df.join(keep, id_col, "left_semi")
