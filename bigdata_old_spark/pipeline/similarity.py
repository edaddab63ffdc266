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
    """Sign-bit signature under fixed random hyperplanes → long."""
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


def cosine_near_dup_pairs(
    embeddings: DataFrame,
    min_sim: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 16,
    hamming_radius: int = 2,
    dim: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b) via LSH
    blocking + exact verification."""
    planes = _hyperplanes(dim, n_planes, seed)
    e = embeddings.select(
        F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("v")
    ).withColumn("sig", lsh_signature(F.col("v"), planes))
    half = n_planes // 2
    lo_mask = (1 << half) - 1
    hi_mask = ((1 << n_planes) - 1) ^ lo_mask
    keyed = e.select(
        "id", "v", "sig",
        F.explode(F.array(
            F.concat(F.lit("h"), F.col("sig").bitwiseAND(F.lit(hi_mask)).cast("string")),
            F.concat(F.lit("l"), F.col("sig").bitwiseAND(F.lit(lo_mask)).cast("string")),
        )).alias("bucket"),
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
