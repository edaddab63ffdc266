"""Similarity search over embedding columns (array<float>).

Two tiers, same answer shape:
  * brute_force_topk — exact cosine top-k; the correctness baseline.
    One scan + per-row array math (zip_with/aggregate, JVM-side) and a
    window top-k.  Fine up to ~10⁶ candidates per query batch.
  * lsh_topk — random-hyperplane LSH: 'probe only matching buckets'.
    Signatures are deterministic (seeded hyperplanes); candidate set =
    bucket collisions within Hamming ≤ r on the sign bits, then exact
    re-rank.  This is the 100-TB path: the self-join is confined to
    buckets instead of all pairs.

Embedding cosine near-dup detection reuses the same machinery with a
threshold instead of top-k.
"""

from __future__ import annotations

import math
import random

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a: Column, b: Column) -> Column:
    d = norm(a) * norm(b)
    return F.when(d > 0, dot(a, b) / d).otherwise(F.lit(0.0))


def brute_force_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id_col: str = "q_id",
    q_vec_col: str = "q_vec",
) -> DataFrame:
    """Exact cosine top-k for each query vector.
    Returns: q_id | vec_id | sim | rnk (1-based)."""
    e = embeddings.select(F.col(id_col).alias("vec_id"), F.col(vec_col).cast("array<double>").alias("v"))
    q = queries.select(F.col(q_id_col).alias("q_id"), F.col(q_vec_col).cast("array<double>").alias("qv"))
    scored = q.crossJoin(e).select(
        "q_id", "vec_id", F.col("qv"), cosine(F.col("qv"), F.col("v")).alias("sim")
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select("q_id", "vec_id", "sim", "rnk")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    rnd = random.Random(seed)
    return [[rnd.gauss(0, 1) for _ in range(dim)] for _ in range(n_planes)]


def lsh_signature(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-bit signature under fixed random hyperplanes → long.
    Zero planes → constant 0 signature (the degenerate exhaustive-
    blocking mode: every vector shares one bucket)."""
    if not planes:
        return F.lit(0).cast("long")
    bits = []
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(x) for x in p])
        bits.append(F.when(dot(vec, plane) >= 0, F.shiftleft(F.lit(1).cast("long"), i)).otherwise(F.lit(0).cast("long")))
    sig = bits[0]
    for b in bits[1:]:
        sig = sig + b
    return sig


def _band_keys(sig: Column, n_planes: int, bands: int) -> Column:
    """Array of (band_idx, band_bits) bucket keys for banded LSH."""
    width = n_planes // bands
    mask = (1 << width) - 1
    return F.array(*[
        F.concat(F.lit(f"{b}:"), F.shiftrightunsigned(sig, b * width).bitwiseAND(F.lit(mask)).cast("string"))
        for b in range(bands)
    ])


def lsh_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_planes: int = 16,
    bands: int = 4,
    dim: int = 64,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id_col: str = "q_id",
    q_vec_col: str = "q_vec",
) -> DataFrame:
    """Approximate cosine top-k: banded random-hyperplane LSH.

    A vector is a candidate if ANY of the ``bands`` signature bands
    matches the query's band exactly (equality join on exploded bucket
    keys — never an all-pairs scan); exact cosine re-ranks candidates.
    Recall rises with more/narrower bands, cost with bucket collision
    rate — the classic b×r dial (same theory as MinHash banding).

    ``n_planes=0, bands=1`` is the PROVABLY EXHAUSTIVE parameterization
    (zero-width bands put every vector in one bucket, so the candidate
    set is the full corpus and the output equals brute_force_topk) —
    the p09 full-probe trick: it lets a SQL all-pairs oracle value-
    check the whole banding/bucket-join/re-rank machinery.
    """
    planes = _hyperplanes(dim, n_planes, seed)
    e = embeddings.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    ).withColumn("sig", lsh_signature(F.col("v"), planes))
    q = queries.select(
        F.col(q_id_col).alias("q_id"),
        F.col(q_vec_col).cast("array<double>").alias("qv"),
    ).withColumn("qsig", lsh_signature(F.col("qv"), planes))
    eb = e.select("vec_id", "v", F.explode(_band_keys(F.col("sig"), n_planes, bands)).alias("bucket"))
    qb = q.select("q_id", "qv", F.explode(_band_keys(F.col("qsig"), n_planes, bands)).alias("bucket"))
    cand = qb.join(eb, "bucket").dropDuplicates(["q_id", "vec_id"])
    scored = cand.select("q_id", "vec_id", cosine(F.col("qv"), F.col("v")).alias("sim"))
    w = Window.partitionBy("q_id").orderBy(F.desc("sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select("q_id", "vec_id", "sim", "rnk")
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN: k-means coarse quantizer + probed lists
# ---------------------------------------------------------------------------

def _centroid_sims(vec: Column, centroids: list[list[float]]) -> list[Column]:
    return [cosine(vec, F.array(*[F.lit(x) for x in c])) for c in centroids]


def _nearest_centroid(vec: Column, centroids: list[list[float]]) -> Column:
    """Arg-max centroid id by cosine (ties → higher id, deterministic).
    Pure Catalyst expression — centroids ride the plan as literals, the
    per-row work is a map, no join and no shuffle."""
    sims = _centroid_sims(vec, centroids)
    return F.array_max(
        F.array(*[F.struct(s.alias("s"), F.lit(i).alias("cid")) for i, s in enumerate(sims)])
    ).getField("cid")


def _probe_set(vec: Column, centroids: list[list[float]], nprobe: int) -> Column:
    """Array of the nprobe nearest centroid ids (desc similarity)."""
    sims = _centroid_sims(vec, centroids)
    ranked = F.reverse(F.array_sort(
        F.array(*[F.struct(s.alias("s"), F.lit(i).alias("cid")) for i, s in enumerate(sims)])
    ))
    return F.transform(F.slice(ranked, 1, nprobe), lambda x: x.getField("cid"))


def train_centroids(
    embeddings: DataFrame,
    n_centroids: int = 16,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Deterministic k-means coarse quantizer.

    Init = the ``n_centroids`` vectors with the smallest
    ``xxhash64(id)`` (a deterministic uniform sample — no RNG state, so
    reruns and the test oracle agree).  Each Lloyd iteration is one
    distributed pass: arg-max assignment is a Catalyst expression, the
    new centroid is a per-dimension mean via posexplode + groupBy.
    Only the (n_centroids × dim) centroid table ever reaches the
    driver — the model state, not data."""
    e = embeddings.select(
        F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("v")
    )
    init = (
        e.withColumn("__h", F.xxhash64(F.col("id")))
        .orderBy("__h", "id").limit(n_centroids)
        .select("v").collect()
    )
    centroids = [list(r["v"]) for r in init]
    for _ in range(iters):
        assigned = e.withColumn("cid", _nearest_centroid(F.col("v"), centroids))
        means = (
            assigned.select("cid", F.posexplode("v").alias("pos", "x"))
            .groupBy("cid", "pos").agg(F.avg("x").alias("m"))
            .groupBy("cid")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
            .select("cid", F.transform(F.col("pm"), lambda s: s.getField("m")).alias("c"))
            .collect()
        )
        new = dict((r["cid"], list(r["c"])) for r in means)
        # empty clusters keep their previous centroid
        centroids = [new.get(i, c) for i, c in enumerate(centroids)]
    return centroids


def ivf_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    kmeans_iters: int = 2,
    centroids: list[list[float]] | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id_col: str = "q_id",
    q_vec_col: str = "q_vec",
) -> DataFrame:
    """IVF approximate top-k: k-means coarse quantizer → inverted lists
    keyed by centroid id → each query probes its ``nprobe`` nearest
    lists → exact cosine re-rank of probed candidates.

    Returns: q_id | vec_id | sim | rnk — same shape as
    :func:`brute_force_topk`; with ``nprobe == n_centroids`` the probe
    covers every list, so the output equals the exact baseline.

    Scale shape: candidate generation is an equi-join on ``cid`` — the
    scan is confined to the probed fraction (~nprobe/n_centroids) of
    the corpus instead of all of it, and the join shuffles slim
    (cid, vector) rows.  Pre-train centroids once with
    :func:`train_centroids` and pass them in to amortize across query
    batches (the index-build/query split of a real IVF index).
    Centroids are plan literals (a broadcast of model state); at
    thousands of centroids move the arg-max into a pandas UDF."""
    if centroids is None:
        centroids = train_centroids(embeddings, n_centroids, kmeans_iters, id_col, vec_col)
    e = embeddings.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).cast("array<double>").alias("v")
    ).withColumn("cid", _nearest_centroid(F.col("v"), centroids))
    q = queries.select(
        F.col(q_id_col).alias("q_id"), F.col(q_vec_col).cast("array<double>").alias("qv")
    ).withColumn("cid", F.explode(_probe_set(F.col("qv"), centroids, nprobe)))
    cand = q.join(e, "cid")
    scored = cand.select("q_id", "vec_id", cosine(F.col("qv"), F.col("v")).alias("sim"))
    w = Window.partitionBy("q_id").orderBy(F.desc("sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select("q_id", "vec_id", "sim", "rnk")
    )


class IVFIndex:
    """Persisted IVF state of an already-embedded corpus: the
    (n_centroids × dim) coarse quantizer (driver-side model state) and
    the inverted lists — (cid, vec_id, v) assignments PARTITIONED BY
    cid, so a query batch's probe join prunes to its nprobe list
    directories (the inverted-list read).  New query batches search
    AGAINST this index without re-assigning or re-reading the corpus —
    the ingest/serve split of a real 100 TB vector index (cf. the
    dedup index in pipeline/dedup.py)."""

    def __init__(self, centroids: list[list[float]], assignments: DataFrame) -> None:
        self.centroids = centroids
        self.assignments = assignments  # cid | vec_id | v

    @property
    def n_centroids(self) -> int:
        return len(self.centroids)

    def save(self, path: str) -> "IVFIndex":
        import json

        from bigdata_old_spark.fsio import write_text_dir

        spark = self.assignments.sparkSession
        # write the (tiny) model state FIRST, with overwrite semantics —
        # a failed rebuild at the same path must not leave new lists
        # paired with old centroids.  Direct FS write, not a 1-row
        # Spark text job (fsio rationale).
        write_text_dir(spark, path + "/centroids", json.dumps(self.centroids))
        self.assignments.write.mode("overwrite").partitionBy("cid").parquet(
            path + "/lists"
        )
        return load_ivf_index(spark, path)


def load_ivf_index(spark, path: str) -> IVFIndex:
    import json

    from bigdata_old_spark.fsio import read_text_dir

    centroids = json.loads(read_text_dir(spark, path + "/centroids"))
    lists = spark.read.parquet(path + "/lists").select(
        F.col("cid").cast("int").alias("cid"), "vec_id", "v"
    )
    return IVFIndex(centroids, lists)


def build_ivf_index(
    embeddings: DataFrame,
    n_centroids: int = 16,
    kmeans_iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    path: str | None = None,
) -> IVFIndex:
    """Train the coarse quantizer and materialize the inverted lists
    (one linear assignment pass).  With ``path``, persist and return
    the disk-backed index."""
    centroids = train_centroids(embeddings, n_centroids, kmeans_iters, id_col, vec_col)
    assignments = (
        embeddings.select(
            F.col(id_col).alias("vec_id"),
            F.col(vec_col).cast("array<double>").alias("v"),
        )
        .withColumn("cid", _nearest_centroid(F.col("v"), centroids))
        .select("cid", "vec_id", "v")
    )
    idx = IVFIndex(centroids, assignments)
    return idx.save(path) if path else idx


def ivf_search(
    index: IVFIndex,
    queries: DataFrame,
    k: int = 10,
    nprobe: int = 4,
    q_id_col: str = "q_id",
    q_vec_col: str = "q_vec",
) -> DataFrame:
    """Top-k against a prebuilt :class:`IVFIndex`: each query probes
    its ``nprobe`` nearest inverted lists (an equi-join on cid that
    prunes the persisted list partitions), exact cosine re-rank of the
    probed candidates.  ``nprobe == index.n_centroids`` probes every
    list ⇒ output ≡ brute force."""
    q = queries.select(
        F.col(q_id_col).alias("q_id"), F.col(q_vec_col).cast("array<double>").alias("qv")
    ).withColumn("cid", F.explode(_probe_set(F.col("qv"), index.centroids, nprobe)))
    cand = q.join(index.assignments, "cid")
    scored = cand.select("q_id", "vec_id", cosine(F.col("qv"), F.col("v")).alias("sim"))
    w = Window.partitionBy("q_id").orderBy(F.desc("sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select("q_id", "vec_id", "sim", "rnk")
    )


def cosine_near_dup_pairs(
    embeddings: DataFrame,
    min_sim: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 48,
    hamming_radius: int = 2,
    bands: int | None = None,
    dim: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b) via banded
    random-hyperplane LSH blocking + exact cosine verification.

    Contract: returns exactly the pairs with ``sim >= min_sim`` AND
    signature Hamming distance ``<= hamming_radius``.  Blocking recall
    for that contract is GUARANTEED by pigeonhole: the signature is cut
    into ``bands`` equal bands (default ``hamming_radius + 1``), so a
    pair within the radius has at least one band with zero differing
    bits and collides on that band's bucket (same b-band machinery as
    :func:`lsh_topk` / MinHash banding — VERDICT r4 item 3 replaced the
    old fixed 2-half split, whose guarantee stopped at radius 1).

    Scale shape: candidate generation is an equi-join on
    (band, band_bits) bucket keys — 2^(n_planes/bands) buckets per band
    (2^16 at the defaults 48/3), so bucket occupancy stays ~n/2^16 per
    band and the within-bucket self-join never goes quadratic in the
    corpus.  Scale ``n_planes`` up with corpus size (and ``bands`` with
    the radius) to keep occupancy bounded.
    """
    if bands is None:
        bands = hamming_radius + 1
    if bands < hamming_radius + 1:
        raise ValueError(
            f"bands={bands} < hamming_radius+1={hamming_radius + 1}: "
            "pigeonhole recall guarantee would not hold"
        )
    if n_planes // bands < 1:
        raise ValueError(f"n_planes={n_planes} too small for {bands} bands")
    planes = _hyperplanes(dim, n_planes, seed)
    e = embeddings.select(
        F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("v")
    ).withColumn("sig", lsh_signature(F.col("v"), planes))
    keyed = e.select(
        "id", "v", "sig",
        F.explode(_band_keys(F.col("sig"), n_planes, bands)).alias("bucket"),
    )
    l = keyed.alias("l")
    r = keyed.select(F.col("id").alias("rid"), F.col("v").alias("rv"), F.col("sig").alias("rsig"), "bucket").alias("r")
    return (
        l.join(r, "bucket")
        .where(F.col("id") < F.col("rid"))
        .where(F.bit_count(F.col("sig").bitwiseXOR(F.col("rsig"))) <= hamming_radius)
        .select(F.col("id").alias("id_a"), F.col("rid").alias("id_b"),
                cosine(F.col("v"), F.col("rv")).alias("sim"))
        .dropDuplicates(["id_a", "id_b"])
        .where(F.col("sim") >= min_sim)
    )


# ---------------------------------------------------------------------------
# int8 scalar quantization (memory-bandwidth path)
# ---------------------------------------------------------------------------

def quantize_embeddings(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_abs: float | None = None,
    scale: float | None = None,
) -> tuple[DataFrame, float]:
    """Symmetric int8 scalar quantization: q[i] = clamp(round(x[i] *
    127/max_abs), -127, 127) with one corpus-wide max_abs (computed in
    a single aggregation job when not supplied).  Pass the corpus's
    ``scale`` verbatim when quantizing queries so both sides share the
    exact grid (re-deriving it from max_abs can drift an ulp).

    Returns (df with ``qvec``, scale).  qvec values are integral but
    carried as array<double>: the dot products downstream stay exact in
    double up to dim * 127^2 << 2^53, and stay inside Catalyst codegen.
    At 100 TB the win is physical — an int8 corpus is 4x smaller on
    disk/shuffle/scan than float32, and distance math is
    integer-SIMD-friendly; the ranking quality loss is the standard
    SQ8 trade (re-rank survivors against float vectors if needed).
    """
    vd = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    if scale is None:
        if max_abs is None:
            max_abs = df.select(
                F.max(F.array_max(F.transform(vd, F.abs))).alias("m")
            ).first()["m"]
        scale = (127.0 / max_abs) if max_abs else 1.0
    q = F.transform(
        vd,
        lambda x: F.least(
            F.greatest(F.floor(x * F.lit(scale) + F.lit(0.5)).cast("double"),
                       F.lit(-127.0)),
            F.lit(127.0),
        ),
    )
    return df.select(F.col(id_col), q.alias("qvec")), scale


def quantized_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id_col: str = "q_id",
    q_vec_col: str = "q_vec",
) -> DataFrame:
    """Brute-force top-k by int8-quantized dot product — the SQ8
    baseline (compose with ivf_search/lsh_topk for sublinear probing).
    Both sides quantize on the CORPUS's grid.  Returns: q_id | vec_id |
    qdot (long) | rnk."""
    e, scale = quantize_embeddings(embeddings, id_col, vec_col)
    qdf, _ = quantize_embeddings(queries, q_id_col, q_vec_col, scale=scale)
    q = qdf.select(F.col(q_id_col).alias("q_id"), F.col("qvec").alias("qv"))
    e = e.select(F.col(id_col).alias("vec_id"), F.col("qvec").alias("v"))
    scored = q.crossJoin(e).select(
        "q_id", "vec_id", dot(F.col("qv"), F.col("v")).cast("long").alias("qdot")
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("qdot"), F.asc("vec_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select("q_id", "vec_id", "qdot", "rnk")
    )


# ---------------------------------------------------------------------------
# SemDeDup: semantic deduplication via k-means clusters (Abbas et al.
# 2023, "SemDeDup: Data-efficient learning at web-scale through
# semantic deduplication", arXiv:2303.09540)
# ---------------------------------------------------------------------------

def semantic_pairs(
    embeddings: DataFrame,
    n_clusters: int = 8,
    threshold: float = 0.98,
    kmeans_iters: int = 2,
    centroids: list[list[float]] | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Within-cluster near-duplicate pairs by embedding cosine.

    SemDeDup's trick: instead of an all-pairs O(n^2) cosine join, first
    coarse-cluster with k-means, then compare ONLY within a cluster —
    candidate generation becomes an equi-join on ``cid`` so the
    comparison volume drops to sum(|cluster|^2), and each cluster's
    pairs are an independent, shuffle-partitioned unit of work.  With
    ``n_clusters=1`` the cluster join degenerates to all-pairs, which
    is the exactness contract the driver oracle checks; production runs
    use n_clusters ~ sqrt(n).

    Returns: id_a | id_b | sim (id_a < id_b, sim >= threshold).
    """
    if centroids is None:
        centroids = train_centroids(embeddings, n_clusters, kmeans_iters, id_col, vec_col)
    e = embeddings.select(
        F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("v")
    ).withColumn("cid", _nearest_centroid(F.col("v"), centroids))
    a = e.select(F.col("cid"), F.col("id").alias("id_a"), F.col("v").alias("va"))
    b = e.select(F.col("cid"), F.col("id").alias("id_b"), F.col("v").alias("vb"))
    return (
        a.join(b, "cid")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", cosine(F.col("va"), F.col("vb")).alias("sim"))
        .where(F.col("sim") >= threshold)
    )


def semantic_dedup(
    embeddings: DataFrame,
    n_clusters: int = 8,
    threshold: float = 0.98,
    kmeans_iters: int = 2,
    centroids: list[list[float]] | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup keep-set: drop every embedding that has a semantic
    near-duplicate (cosine >= threshold, same cluster) with a SMALLER
    id; the min-id member of each duplicate group survives.  Keeping
    by deterministic min-id (the paper keeps a random member, or the
    lowest-quality one under a scorer) makes reruns and the oracle
    agree.  The drop set is a left_anti join against the pair table —
    no row ever widens past (id, vector)."""
    pairs = semantic_pairs(
        embeddings, n_clusters, threshold, kmeans_iters, centroids, id_col, vec_col
    )
    losers = pairs.select(F.col("id_b").alias("__loser")).distinct()
    return embeddings.join(
        losers, on=F.col(id_col) == F.col("__loser"), how="left_anti"
    )


def append_to_ivf_index(
    spark,
    path: str,
    new_embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> IVFIndex:
    """Incremental IVF ingest: assign a NEW batch against the index's
    FROZEN coarse quantizer and append the assignments to the persisted
    inverted lists — the corpus is never re-read and never re-assigned
    (the standard ingest path of a serving vector index; re-training
    the quantizer is a separate offline rebuild via
    :func:`build_ivf_index`).

    Scale shape: one linear Catalyst pass over the batch (centroids are
    plan literals), then an append-mode partitionBy(cid) write that
    only touches the lists the batch lands in.  Mirrors
    :func:`dedup.append_to_dedup_index`."""
    import json

    from bigdata_old_spark.fsio import read_text_dir

    centroids = json.loads(read_text_dir(spark, path + "/centroids"))
    assignments = (
        new_embeddings.select(
            F.col(id_col).alias("vec_id"),
            F.col(vec_col).cast("array<double>").alias("v"),
        )
        .withColumn("cid", _nearest_centroid(F.col("v"), centroids))
        .select("cid", "vec_id", "v")
    )
    assignments.write.mode("append").partitionBy("cid").parquet(path + "/lists")
    return load_ivf_index(spark, path)


# ---------------------------------------------------------------------------
# Reciprocal-rank fusion (Cormack, Clarke & Büttcher 2009) — the
# standard hybrid-retrieval combiner: fuse a lexical ranking (BM25)
# with a vector ranking (ANN cosine) without score calibration
# ---------------------------------------------------------------------------

def rrf_fuse(
    rankings: list[DataFrame],
    id_col: str = "doc_id",
    rank_col: str = "rank",
    k: int = 60,
    top: int | None = 20,
) -> DataFrame:
    """Reciprocal Rank Fusion: fused score = Σ over input rankings of
    1/(k + rank), documents absent from a ranking contribute 0 for it
    — scores from different retrievers never need calibrating, only
    their RANKS matter (the reason RRF is the default hybrid-search
    combiner in RAG stacks).  Ties break by id.

    Returns: id_col | rrf_score | rank.

    Scale shape: each input ranking is already top-N-sized (the
    retrievers did the heavy lifting); fusion is a unionByName of slim
    (id, rank) rows + one groupBy(id) + TakeOrderedAndProject — cost
    is O(Σ |ranking|), independent of corpus size.
    """
    if not rankings:
        raise ValueError("rrf_fuse needs at least one ranking")
    parts = [
        r.select(
            F.col(id_col).alias("id"),
            (F.lit(1.0) / (F.lit(float(k)) + F.col(rank_col).cast("double"))).alias("c"),
        )
        for r in rankings
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    fused = u.groupBy("id").agg(F.sum("c").alias("rrf_score"))
    if top is not None:
        fused = fused.orderBy(F.desc("rrf_score"), F.col("id")).limit(top)
    return fused.withColumn(
        "rank", F.row_number().over(Window.orderBy(F.desc("rrf_score"), F.col("id")))
    ).select(F.col("id").alias(id_col), "rrf_score", "rank")
