"""Dedup / similarity / text-analysis / multimodal pipeline operators."""

import pytest
from pyspark.sql import functions as F

from bigdata_old_spark.pipeline.dedup import (
    exact_dedup,
    exact_duplicates,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)
from bigdata_old_spark.pipeline.multimodal import extract_image_features, frame_sample_plan, synth_media
from bigdata_old_spark.pipeline.similarity import brute_force_topk, cosine_near_dup_pairs, lsh_topk
from bigdata_old_spark.pipeline.text import analyze


BASE = "the quick brown fox jumps over the lazy dog and runs far away into the woods tonight"
NEAR = BASE.replace("lazy", "sleepy")  # one-token edit → high jaccard
OTHER = "completely different content about spark dataframes shuffles partitions and catalyst optimizer internals"


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, BASE), (2, BASE), (3, NEAR), (4, OTHER),
        (5, "short text"), (6, "  THE   quick brown fox jumps over the lazy dog and runs far away into the woods tonight "),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup(docs):
    groups = exact_duplicates(docs).where(F.col("n_dups") > 1).collect()
    assert len(groups) == 1
    assert sorted(groups[0]["doc_ids"]) == [1, 2, 6]  # 6 = same after normalization
    assert exact_dedup(docs).count() == 4


def test_minhash_lsh(docs):
    pairs = {(r["id_a"], r["id_b"]): r["jaccard"] for r in minhash_lsh_pairs(docs, min_jaccard=0.5).collect()}
    assert (1, 2) in pairs and pairs[(1, 2)] == 1.0
    assert (1, 3) in pairs and 0.5 < pairs[(1, 3)] < 1.0
    assert not any(4 in p for p in pairs)


def test_ngram_jaccard_matches_lsh(docs):
    exact = {(r["id_a"], r["id_b"]) for r in ngram_jaccard_pairs(docs, min_jaccard=0.5).collect()}
    lsh = {(r["id_a"], r["id_b"]) for r in minhash_lsh_pairs(docs, min_jaccard=0.5).collect()}
    assert lsh <= exact  # LSH never invents pairs (it verifies)
    assert (1, 3) in lsh  # and catches the near-dup


def test_simhash(docs):
    # blocks=16 → pigeonhole recall guaranteed up to Hamming 15 ≥ 8
    pairs = {(r["id_a"], r["id_b"]): r["hamming"] for r in simhash_pairs(docs, max_hamming=8, blocks=16).collect()}
    assert pairs.get((1, 2)) == 0
    assert (1, 3) in pairs
    assert (1, 4) not in pairs


def test_simhash_rejects_unsound_params(docs):
    import pytest

    with pytest.raises(ValueError):  # recall not guaranteed beyond blocks-1
        simhash_pairs(docs, max_hamming=8, blocks=4)
    with pytest.raises(ValueError):  # blocks must divide bits
        simhash_pairs(docs, max_hamming=3, blocks=7)


def test_simhash_md5_matches_bruteforce(docs):
    """The md5/60-bit variant's blocked pair set equals brute-force
    Hamming ≤ 3 over the same signatures (full pigeonhole recall)."""
    from bigdata_old_spark.pipeline.dedup import hamming64, simhash

    blocked = {(r["id_a"], r["id_b"]): r["hamming"]
               for r in simhash_pairs(docs, max_hamming=3, blocks=4, bits=60, token_hash="md5").collect()}
    sigs = docs.select(F.col("doc_id").alias("id"), simhash(F.col("text"), bits=60, token_hash="md5").alias("sig"))
    l, r = sigs.alias("l"), sigs.select(F.col("id").alias("rid"), F.col("sig").alias("rsig")).alias("r")
    brute = {(x["id_a"], x["id_b"]): x["hamming"] for x in (
        l.crossJoin(r).where(F.col("id") < F.col("rid"))
        .select(F.col("id").alias("id_a"), F.col("rid").alias("id_b"),
                hamming64(F.col("sig"), F.col("rsig")).alias("hamming"))
        .where(F.col("hamming") <= 3)
    ).collect()}
    assert blocked == brute


def test_text_analyze(spark):
    rows = [
        (1, "The cat and the dog played in the garden with a ball of yarn."),
        (2, "el perro y el gato en la casa de los abuelos por una tarde"),
        (3, "le chat et le chien dans les jardins de la maison est une"),
        (4, "der Hund und die Katze ist ein nicht mit den kindern von"),
        (5, "你好世界这是中文文本内容测试"),
        (6, "!!! ??? ### $$$ %%%"),
    ]
    df = analyze(spark.createDataFrame(rows, "doc_id long, text string"))
    out = {r["doc_id"]: r for r in df.collect()}
    assert out[1]["lang_pred"] == "en"
    assert out[2]["lang_pred"] == "es"
    assert out[3]["lang_pred"] == "fr"
    assert out[4]["lang_pred"] == "de"
    assert out[5]["lang_pred"] == "zh"
    assert out[1]["quality"] > 0.6 > out[6]["quality"]
    assert out[1]["n_tokens"] == 14
    # fingerprint is whitespace/case-normalizing
    variant = analyze(
        spark.createDataFrame(
            [(9, "  The CAT and the dog  played in the garden with a ball of yarn.  ")],
            "doc_id long, text string",
        )
    ).collect()[0]["fingerprint"]
    assert variant == out[1]["fingerprint"]


def test_similarity_topk(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    queries = emb.limit(3).select(F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec"))
    exact = brute_force_topk(emb, queries, k=5)
    rows = exact.collect()
    assert len(rows) == 15
    by_q = {}
    for r in rows:
        by_q.setdefault(r["q_id"], []).append(r)
    for qid, rs in by_q.items():
        best = min(rs, key=lambda r: r["rnk"])
        assert best["vec_id"] == qid and best["sim"] > 0.999  # self is nearest
    # LSH recall: top-1 (self) always found; most of top-5 recovered
    approx = lsh_topk(emb, queries, k=5)
    a_ids = {(r["q_id"], r["vec_id"]) for r in approx.collect()}
    e_ids = {(r["q_id"], r["vec_id"]) for r in rows}
    assert all((q, q) in a_ids for q in by_q)
    assert len(a_ids & e_ids) >= len(e_ids) * 0.5


def test_cosine_near_dup(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    twin = emb.limit(1).select((F.col("vec_id") + 100000).alias("vec_id"), "embedding", "label")
    df = emb.unionByName(twin)
    pairs = cosine_near_dup_pairs(df, min_sim=0.99).collect()
    assert any(r["id_a"] == 0 and r["id_b"] == 100000 for r in pairs)


def test_cosine_near_dup_banded_recall_exact(spark):
    """Pigeonhole guarantee (VERDICT r4 item 3): at bands = radius+1
    the banded blocking finds EVERY pair within the Hamming radius —
    the output equals a driver-side brute force of the full contract
    (sim >= min_sim AND sig distance <= radius), recall 1.0 by
    construction, not probabilistically."""
    import math as _math

    from bigdata_old_spark.pipeline.similarity import _hyperplanes

    n_planes, radius, bands, min_sim = 40, 4, 5, 0.90
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    # plant near-dup variants at several perturbation strengths so true
    # pairs land at a spread of signature distances (0..radius-ish)
    base = emb.select(F.col("vec_id").alias("id"), F.col("embedding").cast("array<double>").alias("v"))
    nxt = base.select((F.col("id") - 1).alias("id"), F.col("v").alias("nv"))
    variants = []
    for j, alpha in enumerate((0.02, 0.08, 0.15)):
        variants.append(
            base.where(F.col("id") % 7 == j).join(nxt, "id").select(
                (F.col("id") + 100000 * (j + 1)).alias("id"),
                F.zip_with("v", "nv", lambda x, y: x * F.lit(1.0 - alpha) + y * F.lit(alpha)).alias("v"),
            )
        )
    aug = base
    for vdf in variants:
        aug = aug.unionByName(vdf)

    got = {
        (r["id_a"], r["id_b"])
        for r in cosine_near_dup_pairs(
            aug, min_sim=min_sim, id_col="id", vec_col="v",
            n_planes=n_planes, hamming_radius=radius, bands=bands,
        ).collect()
    }

    # driver-side brute force of the same contract
    rows = aug.collect()
    planes = _hyperplanes(64, n_planes)
    sigs, vecs = {}, {}
    for r in rows:
        v = list(r["v"])
        vecs[r["id"]] = v
        sigs[r["id"]] = tuple(sum(a * b for a, b in zip(v, p)) >= 0 for p in planes)
    ids = sorted(vecs)
    want = set()
    n_dist_pos = 0
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            d = sum(x != y for x, y in zip(sigs[a], sigs[b]))
            if d > radius:
                continue
            va, vb = vecs[a], vecs[b]
            sim = sum(x * y for x, y in zip(va, vb)) / (
                _math.sqrt(sum(x * x for x in va)) * _math.sqrt(sum(x * x for x in vb))
            )
            if sim >= min_sim:
                want.add((a, b))
                if d > 0:
                    n_dist_pos += 1
    assert want, "test must plant at least one qualifying pair"
    assert n_dist_pos > 0, "need pairs at signature distance >= 1 for a non-vacuous check"
    assert got == want  # recall 1.0 AND no extras — the exact contract


def test_cosine_near_dup_banding_validation():
    from bigdata_old_spark.pipeline.similarity import cosine_near_dup_pairs as f

    # bands below radius+1 would break the pigeonhole guarantee
    with pytest.raises(ValueError):
        f(None, hamming_radius=3, bands=3)
    # defaults keep the per-band bucket space >= 2^16 (scale shape:
    # bucket occupancy ~ n / 2^16 per band, never quadratic blowup)
    import inspect

    sig = inspect.signature(f)
    n_planes = sig.parameters["n_planes"].default
    radius = sig.parameters["hamming_radius"].default
    assert 2 ** (n_planes // (radius + 1)) >= 2 ** 16


def test_multimodal_stub(spark):
    media = synth_media(spark, 12)
    feats = extract_image_features(media).collect()
    assert len(feats) == 12
    for r in feats:
        assert len(r["feature"]) == 16 and r["n_bytes"] == 64
    # deterministic: same content → same sha/feature
    again = {r["media_id"]: r["sha256"] for r in extract_image_features(media).collect()}
    assert all(again[r["media_id"]] == r["sha256"] for r in feats)
    plan = frame_sample_plan(media, every_ms=1000)
    assert plan.where(F.col("media_id") == 2).count() == 5  # 5s video @1fps


def test_dedup_clusters(docs):
    from bigdata_old_spark.pipeline.dedup import dedup_clusters

    out = {r["doc_id"]: (r["cluster_id"], r["is_keep"]) for r in dedup_clusters(docs, min_jaccard=0.5).collect()}
    # 1, 2, 3, 6 are one near-dup component → min id 1 is canonical
    assert out[1] == (1, True)
    assert out[2] == (1, False)
    assert out[3] == (1, False)
    assert out[6] == (1, False)
    # 4 and 5 are singletons of themselves
    assert out[4] == (4, True)
    assert out[5] == (5, True)


def test_ivf_full_probe_equals_bruteforce(spark):
    from bigdata_old_spark.pipeline.similarity import ivf_topk, train_centroids

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").limit(200).cache()
    queries = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    cents = train_centroids(emb, n_centroids=8, iters=1)
    exact = brute_force_topk(emb, queries, k=5)
    full = ivf_topk(emb, queries, k=5, nprobe=8, centroids=cents)
    want = {(r["q_id"], r["vec_id"], r["rnk"]) for r in exact.collect()}
    got = {(r["q_id"], r["vec_id"], r["rnk"]) for r in full.collect()}
    assert got == want  # probing every list IS the exhaustive scan


def test_ivf_recall(spark):
    from bigdata_old_spark.pipeline.similarity import ivf_topk, train_centroids

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").cache()
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    cents = train_centroids(emb, n_centroids=16, iters=2)
    exact = brute_force_topk(emb, queries, k=10)
    approx = ivf_topk(emb, queries, k=10, nprobe=4, centroids=cents)
    want = {(r["q_id"], r["vec_id"]) for r in exact.collect()}
    got = {(r["q_id"], r["vec_id"]) for r in approx.collect()}
    recall = len(want & got) / len(want)
    assert recall >= 0.5, f"IVF recall@10 too low: {recall}"
    # the query vector itself (sim=1.0) must always be found: its own
    # list is always the nearest probe
    for q in range(5):
        assert (q, q) in got


def test_hash_sample_deterministic_and_disjoint_split(spark):
    from bigdata_old_spark.mapping import read_table
    from bigdata_old_spark.pipeline.sampling import hash_sample, hash_split, stratified_sample

    docs = read_table(spark, "/root/testdata/sf0.001/documents.parquet")
    s1 = {r["doc_id"] for r in hash_sample(docs, sixteenths=4).select("doc_id").collect()}
    s2 = {r["doc_id"] for r in hash_sample(docs, sixteenths=4).select("doc_id").collect()}
    assert s1 == s2 and 0 < len(s1) < docs.count()

    train, test = hash_split(docs, test_sixteenths=4)
    tr = {r["doc_id"] for r in train.select("doc_id").collect()}
    te = {r["doc_id"] for r in test.select("doc_id").collect()}
    assert tr.isdisjoint(te)
    assert len(tr) + len(te) == docs.count()
    # the smaller hash-sample is nested in the larger (prefix property)
    s_small = {r["doc_id"] for r in hash_sample(docs, sixteenths=2).select("doc_id").collect()}
    assert s_small <= s1

    strat = stratified_sample(docs, ["lang"], cap=5)
    per = {r["lang"]: r["n"] for r in strat.groupBy("lang").count().withColumnRenamed("count", "n").collect()}
    assert all(n <= 5 for n in per.values())


def test_concat_chunk_packing(spark):
    """Sequence packing: chunked-concatenation layout per bucket —
    offsets are cumulative, a long doc spans sequences, buckets are
    independent."""
    from bigdata_old_spark.pipeline.packing import concat_chunk_packing, pack_budget_stats

    rows = [
        # bucket 0 (ids 0,2,4): 3 + 5 + 9 tokens
        (0, "a b c"),
        (2, "a b c d e"),
        (4, "one two three four five six seven eight nine"),
        # bucket 1 (ids 1,3): 8 + 2 tokens
        (1, "t1 t2 t3 t4 t5 t6 t7 t8"),
        (3, "x y"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in concat_chunk_packing(docs, budget=8, n_buckets=2).collect()
    }
    # bucket 0: doc0 starts seq0@0; doc2 seq0@3; doc4 starts seq1@0
    # (cum_before=8) and spans through token 16 → end_seq 2
    assert (out[0]["seq_id"], out[0]["seq_offset"]) == (0, 0)
    assert (out[2]["seq_id"], out[2]["seq_offset"]) == (0, 3)
    assert (out[4]["seq_id"], out[4]["seq_offset"], out[4]["end_seq_id"]) == (1, 0, 2)
    # bucket 1 independent: doc1 seq0@0 (exactly fills), doc3 seq1@0
    assert (out[1]["seq_id"], out[1]["end_seq_id"]) == (0, 0)
    assert (out[3]["seq_id"], out[3]["seq_offset"]) == (1, 0)

    stats = {r["bucket"]: r for r in pack_budget_stats(
        concat_chunk_packing(docs, budget=8, n_buckets=2), budget=8).collect()}
    assert stats[0]["total_tokens"] == 17 and stats[0]["n_sequences"] == 3
    assert stats[1]["total_tokens"] == 10 and stats[1]["n_sequences"] == 2


def test_repetition_signals(spark):
    from bigdata_old_spark.pipeline.text import repetition_signals

    rows = [
        (1, "buy now\nbuy now\nbuy now\nlimited offer"),       # 3/4 dup lines
        (2, "spam spam spam spam spam"),                       # one bigram loops
        (3, "a perfectly normal sentence with varied words"),
        (4, ""),                                               # empty doc
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in repetition_signals(docs).collect()}
    assert out[1]["n_lines"] == 4 and abs(out[1]["dup_line_frac"] - 0.5) < 1e-9
    # "spam spam" is all 4 bigrams
    assert out[2]["top_bigram_frac"] == 1.0
    assert out[3]["dup_line_frac"] == 0.0 and out[3]["top_bigram_frac"] < 0.5
    assert out[4]["n_lines"] == 0 and out[4]["top_bigram_frac"] == 0.0


def test_group_hash_split_no_leakage(spark):
    from bigdata_old_spark.pipeline.sampling import group_hash_split

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    train, test = group_hash_split(docs, "lang", test_sixteenths=4)
    tr = {r["lang"] for r in train.select("lang").distinct().collect()}
    te = {r["lang"] for r in test.select("lang").distinct().collect()}
    assert tr and te and not (tr & te)  # a group never straddles the split
    assert train.count() + test.count() == docs.count()
    # deterministic across invocations
    train2, _ = group_hash_split(docs, "lang", test_sixteenths=4)
    assert train2.count() == train.count()


def test_split_null_keys_land_in_train(spark):
    """NULL ids / group keys must not vanish from both split sides —
    they deterministically land on TRAIN (the side a SQL CASE oracle
    routes a NULL hash to)."""
    from bigdata_old_spark.pipeline.sampling import group_hash_split, hash_split

    docs = spark.createDataFrame(
        [(1, "en"), (2, None), (3, "fr"), (None, "de")],
        "doc_id long, lang string",
    )
    train, test = hash_split(docs, id_col="doc_id", test_sixteenths=4)
    assert train.count() + test.count() == 4
    assert train.where("doc_id IS NULL").count() == 1

    gtrain, gtest = group_hash_split(docs, "lang", test_sixteenths=4)
    assert gtrain.count() + gtest.count() == 4
    assert gtrain.where("lang IS NULL").count() == 1


def test_seeded_shuffle_deterministic_and_seed_sensitive(spark):
    from bigdata_old_spark.pipeline.sampling import seeded_shuffle

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = seeded_shuffle(docs, seed=1).select("doc_id", "shuffle_rank").collect()
    b = seeded_shuffle(docs, seed=1).select("doc_id", "shuffle_rank").collect()
    assert sorted(a) == sorted(b)  # reproducible
    c = {r["doc_id"]: r["shuffle_rank"] for r in seeded_shuffle(docs, seed=2).collect()}
    amap = {r["doc_id"]: r["shuffle_rank"] for r in a}
    assert any(amap[k] != c[k] for k in amap)  # seed changes the permutation
    # the 64-bit prefix preserves the hex-key order
    rows = seeded_shuffle(docs, seed=1).collect()
    by_hex = sorted(rows, key=lambda r: r["shuffle_rank"])
    by_int = sorted(rows, key=lambda r: r["shuffle_rank_64"])
    assert [r["doc_id"] for r in by_hex] == [r["doc_id"] for r in by_int]


def test_end_to_end_curation_pipeline(spark):
    """The north-star composition: near-dup clustering → canonical
    selection → eval-set decontamination → cluster-aware leakage-safe
    split → PII redaction → sequence packing, in one flow.  Asserts
    each stage's invariant AND run-to-run determinism (same output
    hash twice)."""
    import hashlib

    from pyspark.sql import functions as F

    from bigdata_old_spark.pipeline.decontam import ngram_contamination
    from bigdata_old_spark.pipeline.dedup import dedup_clusters
    from bigdata_old_spark.pipeline.packing import concat_chunk_packing
    from bigdata_old_spark.pipeline.redact import redact_pii
    from bigdata_old_spark.pipeline.sampling import group_hash_split

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    eval_df = docs.where(F.col("doc_id") % 20 == 0)

    def run():
        # 1. near-dup clusters; keep only canonical docs, carry cluster id
        clusters = dedup_clusters(docs, min_jaccard=0.4)
        kept = docs.join(clusters, "doc_id").where("is_keep")
        # 2. decontaminate against the eval slice
        contam = ngram_contamination(kept, eval_df, n=3, min_frac=0.2)
        clean = kept.join(contam.select("doc_id", "is_contaminated"), "doc_id").where(
            ~F.col("is_contaminated")
        )
        # 3. cluster-aware split (no near-dup leaks across sides)
        train, test = group_hash_split(clean, "cluster_id", test_sixteenths=2)
        # 4. redact + 5. pack the train side
        red = redact_pii(train)
        packed = concat_chunk_packing(red, budget=256, n_buckets=4)
        return clusters, contam, train, test, red, packed

    clusters, contam, train, test, red, packed = run()

    # stage invariants
    assert clusters.where("is_keep").count() == clusters.select("cluster_id").distinct().count()
    # planted eval docs are 100% contaminated → filtered out
    eval_kept = {r["doc_id"] for r in eval_df.join(clusters, "doc_id").where("is_keep").collect()}
    contam_ids = {r["doc_id"] for r in contam.where("is_contaminated").collect()}
    assert eval_kept <= contam_ids
    tr_cl = {r["cluster_id"] for r in train.select("cluster_id").distinct().collect()}
    te_cl = {r["cluster_id"] for r in test.select("cluster_id").distinct().collect()}
    assert not (tr_cl & te_cl) and train.count() > 0 and test.count() > 0
    # packing covers every train doc exactly once
    assert packed.count() == train.count()

    def fingerprint(df, cols):
        rows = sorted(tuple(r) for r in df.select(*cols).collect())
        return hashlib.md5(str(rows).encode()).hexdigest()

    h1 = fingerprint(packed, ["doc_id", "bucket", "seq_id", "seq_offset", "end_seq_id"])
    rh1 = fingerprint(red, ["doc_id", "text"])
    # run the whole pipeline again: byte-identical
    _, _, _, _, red2, packed2 = run()
    assert fingerprint(packed2, ["doc_id", "bucket", "seq_id", "seq_offset", "end_seq_id"]) == h1
    assert fingerprint(red2, ["doc_id", "text"]) == rh1


# ---------------------------------------------------------------------------
# Incremental corpus-scale dedup (VERDICT r6 #5): persisted signature
# index + batch-vs-corpus join — no corpus re-self-join
# ---------------------------------------------------------------------------


def test_dedup_against_equals_full_restricted_to_batch(spark, tmp_path):
    from bigdata_old_spark.pipeline.dedup import (
        build_dedup_index,
        dedup_against,
        load_dedup_index,
        minhash_lsh_pairs,
    )

    corpus = spark.createDataFrame(
        [(1, BASE), (3, NEAR), (4, OTHER), (5, "short text")],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [(10, BASE), (11, BASE.replace("quick", "swift")), (12, "unrelated fresh content")],
        "doc_id long, text string",
    )
    # ground truth: full-corpus pairs on corpus ∪ batch, restricted to
    # pairs with at least one batch member
    full = {
        (r["id_a"], r["id_b"]): round(r["jaccard"], 6)
        for r in minhash_lsh_pairs(corpus.unionByName(batch), min_jaccard=0.4).collect()
        if r["id_a"] >= 10 or r["id_b"] >= 10
    }
    assert full  # the scenario has cross and internal batch pairs

    idx = build_dedup_index(corpus, path=str(tmp_path / "dedup_idx"))
    got = {
        (r["id_a"], r["id_b"]): round(r["jaccard"], 6)
        for r in dedup_against(idx, batch, min_jaccard=0.4).collect()
    }
    assert got == full

    # reload from disk: the corpus side is ONLY the persisted signature
    # tables — the corpus DataFrame is not in the lineage at all
    idx2 = load_dedup_index(spark, str(tmp_path / "dedup_idx"))
    pairs2 = dedup_against(idx2, batch, min_jaccard=0.4)
    got2 = {(r["id_a"], r["id_b"]): round(r["jaccard"], 6) for r in pairs2.collect()}
    assert got2 == full
    plan = pairs2._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FileScan parquet") >= 2  # buckets + shingles
    # corpus-only pairs are excluded by construction
    assert all(a >= 10 or b >= 10 for (a, b) in got2)


def test_exact_duplicates_caps_ids(spark):
    from bigdata_old_spark.pipeline.dedup import exact_duplicates

    df = spark.createDataFrame(
        [(i, "same boilerplate") for i in range(20)], "doc_id long, text string"
    )
    row = exact_duplicates(df, max_ids=5).collect()[0]
    assert row["n_dups"] == 20 and len(row["doc_ids"]) == 5
    assert row["keep_id"] == 0
    row2 = exact_duplicates(df, max_ids=None).collect()[0]
    assert "doc_ids" not in row2.asDict() and row2["n_dups"] == 20


def test_ivf_index_build_save_search(spark, tmp_path):
    """Persisted IVF index: disk round-trip, partition-pruned probe,
    and full-probe equality with brute force."""
    import random

    from bigdata_old_spark.pipeline.similarity import (
        brute_force_topk,
        build_ivf_index,
        ivf_search,
        load_ivf_index,
    )

    random.seed(7)
    rows = [(i, [random.gauss(0, 1) for _ in range(8)]) for i in range(60)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    exact = {(r["q_id"], r["rnk"]): r["vec_id"]
             for r in brute_force_topk(emb, queries, k=5).collect()}

    idx = build_ivf_index(emb, n_centroids=4, path=str(tmp_path / "ivf"))
    got = {(r["q_id"], r["rnk"]): r["vec_id"]
           for r in ivf_search(idx, queries, k=5, nprobe=4).collect()}
    assert got == exact  # full probe ≡ exact

    # reload from disk — corpus DataFrame not in lineage
    idx2 = load_ivf_index(spark, str(tmp_path / "ivf"))
    assert idx2.n_centroids == 4
    out2 = ivf_search(idx2, queries, k=5, nprobe=4)
    assert {(r["q_id"], r["rnk"]): r["vec_id"] for r in out2.collect()} == exact
    plan = out2._jdf.queryExecution().executedPlan().toString()
    assert "FileScan parquet" in plan

    # restricted probe reads fewer lists and still returns k rows/query
    part = ivf_search(idx2, queries, k=5, nprobe=1)
    assert part.groupBy("q_id").count().where("count <> 5").isEmpty()


def test_lm_perplexity_filter(spark):
    """Bigram-LM cross-entropy: repeated fluent text scores lower than
    a jumbled outlier; lm_filter drops the high-perplexity tail; a
    model trained on one corpus scores unseen text via smoothing."""
    from bigdata_old_spark.pipeline.text import (
        lm_cross_entropy,
        lm_filter,
        train_bigram_lm,
    )

    fluent = "the cat sat on the mat and the dog sat on the rug"
    corpus = [(i, fluent) for i in range(8)] + [
        (100, "zq xv qj kw pz vx jq wk zp xq vz qx")
    ]
    df = spark.createDataFrame(corpus, "doc_id long, text string")
    ce = {r["doc_id"]: r["cross_entropy"] for r in lm_cross_entropy(df).collect()}
    assert ce[0] < ce[100]  # the outlier is high-perplexity
    kept = lm_filter(df, max_cross_entropy=(ce[0] + ce[100]) / 2)
    assert {r["doc_id"] for r in kept.collect()} == set(range(8))

    # cross-corpus scoring: unseen bigrams smooth, don't error
    lm = train_bigram_lm(df)
    new = spark.createDataFrame(
        [(200, "the cat sat quietly"), (201, "entirely novel words herein")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["cross_entropy"] for r in lm_cross_entropy(new, lm).collect()}
    assert out[200] < out[201]  # partially-seen text beats fully-unseen


def test_token_budget_mix(spark):
    """Per-source token-budget sampling: each source's kept set hits
    its target share with at most one doc of overshoot, deterministic
    across reruns; unlisted sources drop."""
    from bigdata_old_spark.pipeline.sampling import token_budget_mix

    rows = []
    for i in range(60):
        src = ["a", "b", "junk"][i % 3]
        rows.append((i, src, "tok " * 10))  # 10 tokens each
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = token_budget_mix(df, {"a": 0.5, "b": 0.5}, total_tokens=100)
    got = [(r["doc_id"], r["source"], r["n_tokens"]) for r in out.collect()]
    by_src = {}
    for _, s, n in got:
        by_src[s] = by_src.get(s, 0) + n
    assert set(by_src) == {"a", "b"}  # junk dropped
    # target 50 tokens/source; 10-token docs → exactly 5 docs each
    assert by_src == {"a": 50, "b": 50}
    # deterministic
    again = [(r["doc_id"], r["source"], r["n_tokens"]) for r in
             token_budget_mix(df, {"a": 0.5, "b": 0.5}, total_tokens=100).collect()]
    assert sorted(again) == sorted(got)
    # overshoot by at most one doc: budget 45 → cum_before<22.5 → 3 docs (30 tokens)
    out2 = token_budget_mix(df, {"a": 1.0}, total_tokens=25)
    assert sum(r["n_tokens"] for r in out2.collect()) == 30


def test_chunk_documents(spark):
    from bigdata_old_spark.pipeline.packing import chunk_documents

    df = spark.createDataFrame(
        [
            (1, " ".join(f"t{i}" for i in range(11))),  # 11 tokens
            (2, "a b"),                                  # fits in one chunk
            (3, ""),                                     # no chunks
        ],
        "doc_id long, text string",
    )
    out = chunk_documents(df, max_tokens=10, overlap=2)
    rows = {(r["doc_id"], r["chunk_id"]): (r["n_tokens"], r["chunk_text"])
            for r in out.collect()}
    # doc 1: starts 1 and 9 → chunks of 10 and 3 tokens, overlap t8 t9
    assert rows[(1, 0)][0] == 10 and rows[(1, 0)][1].startswith("t0 ")
    assert rows[(1, 1)] == (3, "t8 t9 t10")
    assert rows[(2, 0)] == (2, "a b")
    assert not any(d == 3 for (d, _) in rows)
    assert len(rows) == 3
    # stitched coverage: every token appears in some chunk
    import itertools
    toks = set(itertools.chain.from_iterable(
        v[1].split() for (d, _), v in rows.items() if d == 1))
    assert toks == {f"t{i}" for i in range(11)}
    with pytest.raises(ValueError):
        chunk_documents(df, max_tokens=4, overlap=4)


def test_line_dedup(spark):
    from bigdata_old_spark.pipeline.dedup import line_dedup

    df = spark.createDataFrame(
        [
            (1, "keep one\ncookie banner\nkeep two"),
            (2, "cookie banner\nunique line\ncookie banner"),  # within-doc repeat
            (3, "cookie banner"),                               # all boilerplate
            (4, "solo\nsolo"),                                  # repeat in ONE doc only
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in line_dedup(df, min_docs=2).collect()}
    assert len(out) == 4
    # boilerplate ('cookie banner', in 3 distinct docs) dropped everywhere,
    # order of survivors preserved
    assert out[1]["text_dedup"] == "keep one\nkeep two"
    assert (out[1]["n_lines"], out[1]["n_removed"]) == (3, 1)
    assert out[2]["text_dedup"] == "unique line"
    assert out[2]["n_removed"] == 2  # both within-doc copies removed
    # a fully-boilerplate doc survives with empty text
    assert out[3]["text_dedup"] == "" and out[3]["n_removed"] == 1
    # within-ONE-doc repetition is not corpus boilerplate (distinct docs < 2)
    assert out[4]["text_dedup"] == "solo\nsolo" and out[4]["n_removed"] == 0


def test_line_dedup_custom_sep_and_threshold(spark):
    from bigdata_old_spark.pipeline.dedup import line_dedup

    df = spark.createDataFrame(
        [(1, "a|b|c"), (2, "b|x"), (3, "b|y")],
        "doc_id long, text string",
    )
    # '|' is a regex metacharacter — must be escaped internally
    out = {r["doc_id"]: r["text_dedup"]
           for r in line_dedup(df, min_docs=3, sep="|").collect()}
    assert out == {1: "a|c", 2: "x", 3: "y"}


def test_quantized_topk_grid_and_ranking(spark):
    from bigdata_old_spark.pipeline.similarity import (
        quantize_embeddings,
        quantized_topk,
    )

    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0, 0.0]),
            (1, [0.9, 0.1, 0.0]),
            (2, [0.0, 2.0, 0.0]),   # max_abs = 2 → scale 63.5
            (3, [-1.0, 0.0, 0.5]),
        ],
        "vec_id long, embedding array<float>",
    )
    q8, scale = quantize_embeddings(emb)
    assert scale == 127.0 / 2.0
    vals = [v for r in q8.collect() for v in r["qvec"]]
    assert all(-127.0 <= v <= 127.0 and v == int(v) for v in vals)
    # max element: floor(2.0*63.5 + 0.5) = 127; floor(-1.0*63.5 + 0.5) = -63
    assert 127.0 in vals and -63.0 in vals
    queries = emb.where("vec_id = 0").selectExpr(
        "vec_id as q_id", "embedding as q_vec"
    )
    out = quantized_topk(emb, queries, k=2).collect()
    got = [(r["q_id"], r["vec_id"], r["rnk"]) for r in out]
    # nearest to e0 by dot product: itself, then e1
    assert got == [(0, 0, 1), (0, 1, 2)]


def test_gopher_quality_rules(spark):
    from bigdata_old_spark.pipeline.text import gopher_quality

    good = "the quick brown fox " * 15 + "that have with of and be to"  # 67 words
    df = spark.createDataFrame(
        [
            (1, good),
            (2, "short of the"),                       # too few words
            (3, ("#### " * 60) + "the of"),            # symbol ratio + no alpha
            (4, "\n".join("• item the of be to and have with that ok" for _ in range(10))),
            (5, "it ends...\nreally...\nso it goes on and on...\nyes the end of that"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in gopher_quality(df, min_words=10).collect()}
    assert out[1]["passes"] and out[1]["alpha_frac"] == 1.0 and out[1]["n_stopwords"] >= 2
    assert not out[2]["passes"] and out[2]["n_words"] == 3
    assert not out[3]["passes"] and out[3]["symbol_ratio"] > 0.1 and out[3]["alpha_frac"] < 0.8
    # every line bullet-initial → bullet_frac 1.0 > 0.9
    assert not out[4]["passes"] and out[4]["bullet_frac"] == 1.0
    # 3 of 4 lines end with ellipsis → frac 0.75 > 0.3
    assert not out[5]["passes"] and out[5]["ellipsis_frac"] == 0.75


def test_temperature_resample(spark):
    from bigdata_old_spark.pipeline.sampling import temperature_resample

    rows = [(i, "big" if i < 90 else "small") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    # alpha=0.5: w_big=sqrt(90)=9.49, w_small=sqrt(10)=3.16 → shares
    # .75/.25 of 100 → targets 75 and 25→capped at 10
    out = temperature_resample(df, alpha=0.5)
    by_src = {r["source"]: r["cnt"] for r in
              out.groupBy("source").agg(F.count("*").alias("cnt")).collect()}
    assert by_src == {"big": 75, "small": 10}
    # deterministic across reruns
    ids1 = sorted(r["doc_id"] for r in out.collect())
    ids2 = sorted(r["doc_id"] for r in temperature_resample(df, alpha=0.5).collect())
    assert ids1 == ids2
    # alpha=1 → natural proportions (identity when total = corpus size)
    assert temperature_resample(df, alpha=1.0).count() == 100


def test_semantic_dedup_single_cluster_is_exact(spark):
    """n_clusters=1 degenerates to the all-pairs cosine join — the
    exactness contract the p31 oracle checks."""
    from bigdata_old_spark.pipeline.similarity import cosine, semantic_dedup, semantic_pairs

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").limit(120).cache()
    # plant an exact duplicate pair and a near-duplicate
    dup = emb.where(F.col("vec_id") == 7).select(
        F.lit(9007).alias("vec_id"), "embedding", "label"
    )
    corpus = emb.unionByName(dup)
    pairs = semantic_pairs(corpus, n_clusters=1, threshold=0.999).collect()
    assert (7, 9007) in {(r["id_a"], r["id_b"]) for r in pairs}
    kept = semantic_dedup(corpus, n_clusters=1, threshold=0.999)
    ids = {r["vec_id"] for r in kept.select("vec_id").collect()}
    assert 7 in ids and 9007 not in ids  # min-id member survives
    assert len(ids) == corpus.count() - len(pairs)


def test_semantic_dedup_clustered_recall(spark):
    """Clustered run must still catch planted exact duplicates (an
    identical vector always lands in the same cluster) and never drop
    more than the exact all-pairs pass."""
    from bigdata_old_spark.pipeline.similarity import semantic_dedup

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").limit(150).cache()
    dups = emb.where(F.col("vec_id") < 5).select(
        (F.col("vec_id") + 9000).alias("vec_id"), "embedding", "label"
    )
    corpus = emb.unionByName(dups)
    exact_kept = {r["vec_id"] for r in semantic_dedup(corpus, n_clusters=1, threshold=0.999).collect()}
    clus_kept = {r["vec_id"] for r in semantic_dedup(corpus, n_clusters=6, threshold=0.999).collect()}
    for i in range(5):
        assert 9000 + i not in clus_kept  # planted dup caught despite clustering
        assert i in clus_kept
    # clustering can only MISS pairs, never invent them
    assert clus_kept >= exact_kept


def test_c4_clean_rules(spark):
    from bigdata_old_spark.pipeline.text import c4_clean

    rows = [
        # survives: 3 good sentences
        (1, "the quick brown fox jumps over the dog.\nanother long sentence follows right here.\na third sentence closes the document now."),
        # line rules: short line + no terminal punct + javascript dropped,
        # leaving < 3 sentences -> doc dropped
        (2, "too short.\nthis line has no terminal punctuation at all\nplease enable javascript to view this page.\none good sentence survives here today."),
        # lorem ipsum -> dropped even though lines pass
        (3, "lorem ipsum dolor sit amet consectetur adipiscing.\nanother fine sentence lives right here today.\na third sentence closes the document now."),
        # curly brace -> dropped
        (4, "function f() { return 1; } is not prose text.\nanother fine sentence lives right here today.\na third sentence closes the document now."),
        (5, ""),  # empty -> dropped
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in c4_clean(df, min_line_words=5, min_sentences=3).collect()}
    assert out[1]["keep"] and out[1]["n_lines_kept"] == 3 and out[1]["n_sentences"] == 3
    assert not out[2]["keep"] and out[2]["n_lines_kept"] == 1  # short+nopunct+js gone
    assert "javascript" not in out[2]["clean_text"]
    assert not out[3]["keep"]  # lorem ipsum
    assert not out[4]["keep"]  # curly brace
    assert not out[5]["keep"] and out[5]["n_lines_kept"] == 0
    # reconstruction keeps original line order
    assert out[1]["clean_text"].split("\n")[0].startswith("the quick brown fox")


def test_dsir_ranks_target_like_docs_higher(spark):
    from bigdata_old_spark.pipeline.sampling import dsir_logratio, dsir_select

    raw = spark.createDataFrame(
        [
            (1, "physics energy quantum field theory experiment"),
            (2, "physics quantum particle energy measurement"),
            (3, "recipe butter sugar flour oven bake"),
            (4, "recipe oven flour sugar taste bake"),
            (5, ""),
        ],
        ["doc_id", "text"],
    )
    target = spark.createDataFrame(
        [(100, "quantum physics energy field experiment particle")],
        ["doc_id", "text"],
    )
    scored = {r["doc_id"]: r["dsir_logratio"] for r in dsir_logratio(raw, target).collect()}
    assert len(scored) == 5 and scored[5] == 0.0  # empty doc scores 0
    assert min(scored[1], scored[2]) > max(scored[3], scored[4])
    # (with heavy Laplace smoothing over a tiny corpus every real doc can
    # score slightly negative, so select among the non-empty docs)
    picked = {r["doc_id"] for r in dsir_select(raw.where("text != ''"), target, n=2).collect()}
    assert picked == {1, 2}
    # deterministic across reruns
    again = {r["doc_id"]: r["dsir_logratio"] for r in dsir_logratio(raw, target).collect()}
    assert again == scored


def test_ivf_index_append_equals_full_rebuild_search(spark, tmp_path):
    """Appending a batch against the frozen quantizer must make the
    index searchable over corpus ∪ batch; full-probe search equals the
    brute-force baseline over the union (exactness contract), and the
    corpus is never re-assigned (old list rows survive byte-identical)."""
    from bigdata_old_spark.pipeline.similarity import (
        append_to_ivf_index,
        build_ivf_index,
        ivf_search,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").limit(200).cache()
    first = emb.where(F.col("vec_id") < 150)
    batch = emb.where(F.col("vec_id") >= 150)
    path = str(tmp_path / "ivf")
    idx = build_ivf_index(first, n_centroids=8, path=path)
    n_before = idx.assignments.count()
    idx2 = append_to_ivf_index(spark, path, batch)
    assert idx2.assignments.count() == emb.count()
    # appended rows join the EXISTING quantizer's lists
    assert idx2.n_centroids == 8
    queries = emb.where(F.col("vec_id") % 37 == 0).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    exact = brute_force_topk(emb, queries, k=5)
    got = ivf_search(idx2, queries, k=5, nprobe=8)
    want = {(r["q_id"], r["vec_id"], r["rnk"]) for r in exact.collect()}
    have = {(r["q_id"], r["vec_id"], r["rnk"]) for r in got.collect()}
    assert have == want
    # append preserved the original corpus assignment rows
    old_ids = {r["vec_id"] for r in idx2.assignments.collect()}
    assert old_ids >= {r["vec_id"] for r in first.select("vec_id").collect()}
    assert n_before == 150


def test_dsir_self_target_scores_zero(spark):
    """Identity property: when the target IS the raw corpus, every
    per-feature log-ratio is exactly 0, so every document scores 0."""
    from bigdata_old_spark.pipeline.sampling import dsir_logratio

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(50)
    out = dsir_logratio(docs, docs).collect()
    assert len(out) == 50 and all(r["dsir_logratio"] == 0.0 for r in out)


def test_c4_clean_reconstruction_is_line_subset(spark):
    """Invariant: clean_text's lines are a subsequence of the input's
    lines, and every kept line satisfies the line rules."""
    from bigdata_old_spark.pipeline.text import c4_clean

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(40)
    lined = docs.select(
        "doc_id",
        F.regexp_replace(F.col("text"), r"((\S+\s+){7}\S+) ", "$1\n").alias("text"),
    )
    inp = {r["doc_id"]: r["text"] for r in lined.collect()}
    out = c4_clean(lined, require_terminal_punct=False, min_line_words=5,
                   min_sentences=1)
    for r in out.collect():
        orig = inp[r["doc_id"]].split("\n")
        kept = r["clean_text"].split("\n") if r["clean_text"] else []
        it = iter(orig)
        assert all(any(k == o for o in it) for k in kept), "not a subsequence"
        for k in kept:
            assert len(k.split()) >= 5 and "javascript" not in k.lower()
        assert r["n_lines_kept"] == len(kept)


def test_containment_pairs_detects_embedded_docs(spark):
    """Containment (Broder's |A∩B|/|A|) catches a short doc embedded in
    a long one where Jaccard stays far below any dedup threshold."""
    from bigdata_old_spark.pipeline.dedup import containment_pairs, ngram_jaccard_pairs

    short = "the quick brown fox jumps over the lazy dog tonight"
    filler = ("many unrelated words about query engines partitions shuffles "
              "caches joins aggregates windows sorts spills metrics plans "
              "buckets statistics estimates broadcasts exchanges")
    rows = [
        (1, short),
        (2, filler + " " + short + " " + filler),  # 1 embedded in 2
        (3, "completely different content having nothing shared at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r["id_a"], r["id_b"]): r["containment"]
           for r in containment_pairs(df, min_containment=0.9).collect()}
    assert got.get((1, 2)) == 1.0          # every shingle of 1 occurs in 2
    assert (2, 1) not in got               # asymmetric: 2 is NOT inside 1
    assert not any(3 in p for p in got)
    # Jaccard misses it entirely at any usable threshold
    j = ngram_jaccard_pairs(df, min_jaccard=0.3).collect()
    assert not any({r["id_a"], r["id_b"]} == {1, 2} for r in j)


# ---------------------------------------------------------------------------
# Exact duplicate-span detection (Lee et al. 2021 ExactSubstr dedup)
# ---------------------------------------------------------------------------

def test_duplicate_spans_marks_repeated_window(spark):
    from bigdata_old_spark.pipeline.dedup import duplicate_spans

    span = "alpha bravo charlie delta echo"  # 5 tokens, shared verbatim
    rows = [
        (1, f"{span} unique tail one two"),            # tokens 1-5 duplicated
        (2, f"prefix words here {span} and more"),     # tokens 4-8 duplicated
        (3, "completely different text with no repeats at all"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r.asDict() for r in duplicate_spans(df, k=5).collect()}
    assert out[1]["n_dup_tokens"] == 5 and out[1]["n_tokens"] == 9
    assert out[2]["n_dup_tokens"] == 5 and out[2]["n_tokens"] == 10
    assert out[3]["n_dup_tokens"] == 0
    assert abs(out[1]["dup_frac"] - 5 / 9) < 1e-9


def test_duplicate_spans_within_one_document(spark):
    # Lee et al. count within-document repetition too: the same window
    # twice in ONE doc is a duplicate span
    from bigdata_old_spark.pipeline.dedup import duplicate_spans

    text = "x y z w v " * 2 + "ending tokens differ"
    df = spark.createDataFrame([(1, text.strip())], ["doc_id", "text"])
    out = duplicate_spans(df, k=5).collect()[0]
    assert out["n_dup_tokens"] == 10  # both copies of the 5-token run


def test_duplicate_spans_short_doc_has_no_windows(spark):
    from bigdata_old_spark.pipeline.dedup import duplicate_spans

    df = spark.createDataFrame([(1, "too short"), (2, "too short")], ["doc_id", "text"])
    for r in duplicate_spans(df, k=5).collect():
        assert r["n_dup_tokens"] == 0 and r["n_tokens"] == 2


def test_strip_duplicate_spans_removes_only_covered_tokens(spark):
    from bigdata_old_spark.pipeline.dedup import strip_duplicate_spans

    span = "alpha bravo charlie delta echo"
    rows = [(1, f"{span} keep these words"), (2, f"start {span} end")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in strip_duplicate_spans(df, k=5).collect()}
    assert out[1]["text_stripped"] == "keep these words"
    assert out[2]["text_stripped"] == "start end"
    assert out[1]["n_dup_tokens"] == 5


# ---------------------------------------------------------------------------
# Hashed-n-gram logistic quality classifier
# ---------------------------------------------------------------------------

def test_classifier_separates_vocabularies(spark):
    from bigdata_old_spark.pipeline.text import (
        classifier_filter, classifier_score, train_ngram_classifier)

    pos_rows = [(i, "excellent prose coherent paragraphs thoughtful analysis") for i in range(8)]
    neg_rows = [(100 + i, "buy cheap viagra click here spam casino") for i in range(8)]
    pos = spark.createDataFrame(pos_rows, ["doc_id", "text"])
    neg = spark.createDataFrame(neg_rows, ["doc_id", "text"])
    model = train_ngram_classifier(pos, neg, iters=12, lr=2.0)
    test = spark.createDataFrame(
        [(1, "thoughtful coherent analysis of excellent prose"),
         (2, "click here cheap casino spam")],
        ["doc_id", "text"],
    )
    scores = {r["doc_id"]: r["quality_prob"] for r in classifier_score(test, model).collect()}
    assert scores[1] > scores[2]
    assert scores[1] > 0.5 > scores[2]
    kept = classifier_filter(test, model, threshold=0.5)
    assert [r["doc_id"] for r in kept.collect()] == [1]


def test_classifier_zero_token_doc_scores_at_bias(spark):
    import math

    from bigdata_old_spark.pipeline.text import classifier_score, train_ngram_classifier

    pos = spark.createDataFrame([(1, "good text here")], ["doc_id", "text"])
    neg = spark.createDataFrame([(2, "bad junk words")], ["doc_id", "text"])
    model = train_ngram_classifier(pos, neg, iters=3)
    empty = spark.createDataFrame([(9, "")], ["doc_id", "text"])
    got = classifier_score(empty, model).collect()[0]["quality_prob"]
    assert abs(got - 1 / (1 + math.exp(-model.bias))) < 1e-12


# ---------------------------------------------------------------------------
# BM25
# ---------------------------------------------------------------------------

def test_bm25_prefers_matching_and_rare_terms(spark):
    from bigdata_old_spark.pipeline.text import bm25_rank

    rows = [
        (1, "spark runs distributed joins on clusters"),
        (2, "spark spark spark spark spark spark spark spark"),
        (3, "databases use indexes and transactions"),
        (4, "gardening tips for spring flowers"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = bm25_rank(df, ["spark", "joins"], top=10).collect()
    ids = [r["doc_id"] for r in sorted(out, key=lambda r: r["rank"])]
    # doc 1 matches both terms (and 'joins' is rarer) → ranked first;
    # non-matching docs 3,4 are absent
    assert ids[0] == 1
    assert set(ids) == {1, 2}
    # tf saturation: eight 'spark's must not dwarf the two-term match
    scores = {r["doc_id"]: r["score"] for r in out}
    assert scores[1] > scores[2]


def test_bm25_no_top_returns_all_matches_ranked(spark):
    from bigdata_old_spark.pipeline.text import bm25_rank

    rows = [(i, "common token text") for i in range(5)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = bm25_rank(df, ["token"], top=None).collect()
    assert sorted(r["rank"] for r in out) == [1, 2, 3, 4, 5]


def test_bm25_no_top_banded_rank_equals_global_order(spark):
    """top=None rides the banded two-pass rank (r8 VERDICT nit) — the
    ranking must be bit-identical to the global (score desc, id) order,
    including ties, and the plan must carry no partitionless window
    over the unbounded input (no ntile; every row_number window is
    band-partitioned)."""
    from bigdata_old_spark.pipeline.text import bm25_rank

    rows = [(i, "token " * (1 + i % 7) + "filler " * (i % 3)) for i in range(200)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = bm25_rank(df, ["token"], top=None)
    got = [(r["doc_id"]) for r in out.orderBy("rank").collect()]
    want = [r["doc_id"] for r in
            out.orderBy(F.desc("score"), F.col("doc_id")).collect()]
    assert got == want
    assert [r["rank"] for r in out.orderBy("rank").collect()] == list(range(1, 201))
    plan = out._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert "ntile" not in plan
    # the corpus-ranking window must be partitioned by the band key
    assert "windowspecdefinition(__band" in plan, plan


# ---------------------------------------------------------------------------
# Event funnel
# ---------------------------------------------------------------------------

def test_funnel_strict_ordering_and_stages(spark):
    import datetime as dt

    from bigdata_old_spark.streaming import funnel_stages

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    s = lambda sec: t0 + dt.timedelta(seconds=sec)
    rows = [
        # u1 completes the funnel in order
        (1, s(0), "view"), (1, s(10), "click"), (1, s(20), "purchase"),
        # u2: purchase BEFORE click → stage 2 only
        (2, s(0), "view"), (2, s(5), "purchase"), (2, s(10), "click"),
        # u3: click at the SAME timestamp as view → strictly-after fails
        (3, s(0), "view"), (3, s(0), "click"),
        # u4: no view at all → omitted
        (4, s(0), "click"), (4, s(1), "purchase"),
    ]
    ev = spark.createDataFrame(rows, ["user_id", "ts", "event_type"])
    out = {r["user_id"]: r for r in funnel_stages(ev, ["view", "click", "purchase"]).collect()}
    assert out[1]["stage"] == 3 and out[1]["stage_ts"] == s(20)
    assert out[2]["stage"] == 2 and out[2]["stage_ts"] == s(10)
    assert out[3]["stage"] == 1
    assert 4 not in out


def test_funnel_greedy_earliest_is_optimal(spark):
    import datetime as dt

    from bigdata_old_spark.streaming import funnel_stages

    t0 = dt.datetime(2024, 1, 1)
    s = lambda sec: t0 + dt.timedelta(seconds=sec)
    # a LATER view also precedes the click; greedy earliest view must
    # not block the click from counting
    rows = [(1, s(0), "view"), (1, s(50), "view"), (1, s(60), "click")]
    ev = spark.createDataFrame(rows, ["user_id", "ts", "event_type"])
    out = funnel_stages(ev, ["view", "click"]).collect()[0]
    assert out["stage"] == 2


# ---------------------------------------------------------------------------
# UniMax mixing
# ---------------------------------------------------------------------------

def test_unimax_caps_small_source_epochs(spark):
    from pyspark.sql import functions as F

    from bigdata_old_spark.pipeline.sampling import unimax_mix

    rows = (
        # tiny source: 2 docs x 5 tokens = 10 tokens
        [(i, "tok " * 5, "tiny") for i in range(2)]
        # big source: 50 docs x 10 tokens = 500 tokens
        + [(100 + i, "word " * 10, "big") for i in range(50)]
    )
    df = spark.createDataFrame(
        [(i, t.strip(), s) for i, t, s in rows], ["doc_id", "text", "source"]
    )
    out = unimax_mix(df, total_tokens=200, max_epochs=3)
    rows_out = out.collect()
    by_src = {}
    for r in rows_out:
        by_src.setdefault(r["source"], []).append(r)
    # tiny source saturates its epoch cap (3 passes x 10 tokens = 30),
    # never its uniform share (100)
    assert all(r["n_epochs"] == 3 for r in by_src["tiny"])
    tiny_tokens = sum(r["n_tokens"] * r["n_epochs"] for r in by_src["tiny"])
    assert tiny_tokens == 30
    # big source gets the remaining 170 tokens (one partial epoch),
    # overshoot bounded by one document
    big_tokens = sum(r["n_tokens"] * r["n_epochs"] for r in by_src["big"])
    assert 170 <= big_tokens < 170 + 10
    assert all(r["n_epochs"] == 1 for r in by_src["big"])


def test_unimax_is_deterministic(spark):
    from bigdata_old_spark.pipeline.sampling import unimax_mix

    rows = [(i, "alpha beta gamma delta", ["a", "b"][i % 2]) for i in range(40)]
    df = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    a = sorted((r["doc_id"], r["n_epochs"]) for r in unimax_mix(df, 100, 2).collect())
    b = sorted((r["doc_id"], r["n_epochs"]) for r in unimax_mix(df, 100, 2).collect())
    assert a == b and len(a) > 0


def test_corpus_profile(spark):
    from bigdata_old_spark.pipeline.text import corpus_profile

    rows = [
        (1, "the cat sat on the mat", "web"),
        (2, "the cat sat on the mat", "web"),   # exact dup of 1
        (3, "el perro que la casa de los", "web"),
        (4, "one two", "books"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    out = {r["group"]: r for r in corpus_profile(df).collect()}
    web = out["web"]
    assert web["n_docs"] == 3 and web["n_exact_dups"] == 1
    assert web["n_tokens"] == 6 + 6 + 7
    assert web["n_langs"] == 2  # en + es heuristics
    assert out["books"]["n_docs"] == 1 and out["books"]["n_exact_dups"] == 0
    assert out["books"]["min_chars"] == out["books"]["max_chars"] == 7


def test_edit_distance_pairs_lsh_blocking_finds_typo_variant(spark):
    from bigdata_old_spark.pipeline.dedup import edit_distance_pairs

    base = ("the quick brown fox jumps over the lazy dog and keeps on "
            "running through the quiet forest until dawn arrives")
    rows = [
        (1, base),
        (2, base.replace("quick", "qwick").replace("dawn", "down")),  # 2 small edits
        (3, "an entirely different document about database query engines"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = edit_distance_pairs(df, max_distance=10)
    got = {(r["id_a"], r["id_b"]): r["edit_distance"] for r in out.collect()}
    assert (1, 2) in got and got[(1, 2)] <= 4
    assert all(3 not in pair for pair in got)


def test_edit_distance_length_prefilter_blocks_mismatched(spark):
    from pyspark.sql import functions as F

    from bigdata_old_spark.pipeline.dedup import edit_distance_pairs

    rows = [(1, "tiny"), (2, "x" * 500)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    allp = spark.createDataFrame([(1, 2)], ["id_a", "id_b"])
    assert edit_distance_pairs(df, pairs=allp, max_distance=20).count() == 0


# ---------------------------------------------------------------------------
# Winnowing (MOSS) fingerprints
# ---------------------------------------------------------------------------

def test_winnowing_guarantee_shared_substring(spark):
    from bigdata_old_spark.pipeline.text import winnowing_pairs

    # winnowing guarantee: a shared substring of length >= w+k-1
    # (= 11 chars at k=8, w=4) shares >= 1 selected fingerprint
    shared = "identical stretch of text goes right here"
    rows = [
        (1, f"prefix one {shared} suffix alpha"),
        (2, f"other beginning {shared} different ending"),
        (3, "no overlap with anything else at all zzz qqq"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {(r["id_a"], r["id_b"]) for r in winnowing_pairs(df, min_shared=1).collect()}
    assert (1, 2) in got
    assert all(3 not in p for p in got)


def test_winnowing_fingerprints_short_doc_and_docfreq_guard(spark):
    from bigdata_old_spark.pipeline.text import winnowing_fingerprints, winnowing_pairs

    df = spark.createDataFrame([(1, "tiny"), (2, "tiny")], ["doc_id", "text"])
    fps = {r["doc_id"]: r["fps"] for r in winnowing_fingerprints(df).collect()}
    # shorter than k: one fingerprint of the whole normalized text
    assert len(fps[1]) == 1 and fps[1] == fps[2]
    # docfreq guard drops the shared (now-boilerplate) fingerprint
    assert winnowing_pairs(df, min_shared=1, max_docfreq=1).count() == 0
    assert winnowing_pairs(df, min_shared=1).count() == 1


def test_rrf_fusion_math_and_missing_docs(spark):
    from bigdata_old_spark.pipeline.similarity import rrf_fuse

    r1 = spark.createDataFrame([(1, 1), (2, 2), (3, 3)], ["doc_id", "rank"])
    r2 = spark.createDataFrame([(3, 1), (4, 2)], ["doc_id", "rank"])
    out = {r["doc_id"]: r for r in rrf_fuse([r1, r2], k=60, top=None).collect()}
    # doc 3 appears in both rankings
    assert abs(out[3]["rrf_score"] - (1 / 63 + 1 / 61)) < 1e-12
    # docs absent from one ranking contribute only their own term
    assert abs(out[1]["rrf_score"] - 1 / 61) < 1e-12
    assert abs(out[4]["rrf_score"] - 1 / 62) < 1e-12
    # doc 3 (two contributions) outranks every single-list doc
    assert out[3]["rank"] == 1


def test_rrf_requires_input(spark):
    from bigdata_old_spark.pipeline.similarity import rrf_fuse

    with pytest.raises(ValueError):
        rrf_fuse([])


# ---------------------------------------------------------------------------
# BPE tokenizer (train on corpus, encode distributed)
# ---------------------------------------------------------------------------

def test_bpe_textbook_example(spark):
    from bigdata_old_spark.pipeline.bpe import train_bpe

    # the Sennrich et al. worked example family: 'est</w>' should
    # emerge as a merged unit from {lowest, widest} style corpora
    rows = [
        (1, "low low low low low"),
        (2, "lower lower"),
        (3, "newest newest newest newest newest newest"),
        (4, "widest widest widest"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    merges = train_bpe(df, n_merges=10)
    merged_units = {a + b for a, b in merges}
    assert "es" in merged_units or "est" in merged_units
    # determinism
    assert merges == train_bpe(df, n_merges=10)


def test_bpe_encode_matches_driver_and_counts(spark):
    from bigdata_old_spark.pipeline.bpe import _encode_word, bpe_encode, train_bpe

    rows = [(i, "the newest lowest widest tokens appear here " * 3) for i in range(4)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    merges = train_bpe(df, n_merges=30)
    out = {r["doc_id"]: r for r in bpe_encode(df, merges).collect()}
    ranks = {tuple(m): i for i, m in enumerate(merges)}
    expect = []
    for w in rows[0][1].lower().split():
        expect.extend(_encode_word(w, ranks))
    assert out[0]["bpe_tokens"] == expect
    assert out[0]["n_bpe_tokens"] == len(expect)
    # every piece ends a word iff it carries the marker; rejoining
    # pieces reconstructs the original token stream
    rejoined = "".join(out[0]["bpe_tokens"]).replace("</w>", " ").strip()
    assert rejoined == " ".join(rows[0][1].lower().split())


def test_bpe_merge_floor_stops_at_singletons(spark):
    from bigdata_old_spark.pipeline.bpe import train_bpe

    # every word unique and short: after exhausting repeated pairs the
    # trainer must STOP, not memorize singletons
    df = spark.createDataFrame([(1, "ab cd ef")], ["doc_id", "text"])
    merges = train_bpe(df, n_merges=50)
    assert len(merges) < 10


def test_end_to_end_curation_pipeline_v2(spark):
    """Late-round-7 composition over the NEW operators: line-level
    boilerplate dedup → C4 cleaning → Gopher + classifier quality
    filtering → exact duplicate-span stripping → winnowing near-dup
    drop → UniMax mixing → BPE tokenization.  Asserts each stage's
    invariant and run-to-run determinism."""
    import hashlib

    from pyspark.sql import functions as F

    from bigdata_old_spark.pipeline.bpe import bpe_encode, train_bpe
    from bigdata_old_spark.pipeline.dedup import line_dedup, strip_duplicate_spans
    from bigdata_old_spark.pipeline.sampling import unimax_mix
    from bigdata_old_spark.pipeline.text import (
        c4_clean, classifier_filter, gopher_quality,
        train_ngram_classifier, winnowing_pairs)

    base_text = (
        "Genuine long-form prose with coherent sentences goes here. "
        "It continues with several informative statements about data. "
        "Each line carries enough words to pass every quality filter."
    )
    boiler = "Cookie consent banner appears on every single page here."
    docs = [
        (i, f"{boiler}\n{base_text} Unique marker number {i} appears.",
         ["web", "books"][i % 2])
        for i in range(12)
    ]
    # a near-duplicate pair (13 ≈ 3) and a junk doc
    docs.append((13, f"{boiler}\n{base_text} Unique marker number 3 appears?!",
                 "web"))
    docs.append((14, "buy spam casino {{{ }}} javascript click", "web"))
    df = spark.createDataFrame(docs, ["doc_id", "text", "source"])

    def run():
        # 1. corpus-wide boilerplate line removal
        lined = line_dedup(df, min_docs=3).select(
            "doc_id", F.col("text_dedup").alias("text"))
        assert lined.where(F.col("text").contains("Cookie consent")).count() == 0
        lined = lined.join(df.select("doc_id", "source"), "doc_id")
        # 2. C4 line/doc rules (keeps reconstruction)
        cleaned = c4_clean(lined).where(F.col("keep")).select(
            "doc_id", F.col("clean_text").alias("text"))
        assert cleaned.where(F.col("doc_id") == 14).count() == 0
        # 3. Gopher doc-quality flags compose as a filter
        good = gopher_quality(cleaned, min_words=10).where(F.col("passes"))
        keep_ids = good.select("doc_id")
        survivors = cleaned.join(keep_ids, "doc_id", "left_semi")
        # 4. classifier filter (train on the cleaned corpus itself:
        #    positives = the prose docs, negatives = raw junk)
        neg = spark.createDataFrame(
            [(100 + i, "spam casino click here cheap pills") for i in range(4)],
            ["doc_id", "text"])
        model = train_ngram_classifier(survivors, neg, iters=6, lr=2.0)
        survivors = classifier_filter(survivors, model, threshold=0.4)
        assert survivors.count() >= 10
        # 5. strip exact duplicated spans (the shared base prose is
        #    corpus-boilerplate at k=6)
        stripped = strip_duplicate_spans(survivors, k=6).select(
            "doc_id", F.col("text_stripped").alias("text"))
        # the SHARED prose is gone everywhere; each doc's unique
        # number token survives (its windows are unique to the doc)
        leftover = {r["doc_id"]: r["text"] for r in stripped.collect()}
        assert all("coherent" not in t for t in leftover.values())
        surviving_ids = {r["doc_id"] for r in survivors.collect()}
        # doc 3 excluded: its planted near-duplicate (doc 13) shares
        # the marker-3 span, so that span is legitimately duplicated
        for i in surviving_ids & (set(range(12)) - {3}):
            assert f" {i} " in f" {leftover[i]} " or str(i) in leftover[i]
        # 6. winnowing near-dup drop on the ORIGINAL cleaned text
        pairs = winnowing_pairs(survivors, min_shared=4, max_docfreq=6)
        drop = pairs.select(F.col("id_b").alias("doc_id")).dropDuplicates()
        deduped = survivors.join(drop, "doc_id", "left_anti")
        # 7. UniMax mixing across sources
        mixed = unimax_mix(
            deduped.join(df.select("doc_id", "source"), "doc_id"),
            total_tokens=400, max_epochs=2)
        assert mixed.count() >= 1
        # 8. BPE tokenize the final mix
        merges = train_bpe(mixed, n_merges=40)
        enc = bpe_encode(mixed, merges)
        rows = sorted(
            (r["doc_id"], r["n_bpe_tokens"], tuple(r["bpe_tokens"][:5]))
            for r in enc.collect()
        )
        return hashlib.md5(repr(rows).encode()).hexdigest()

    assert run() == run()  # stage invariants + determinism


def test_bm25_case_dedup_and_empty_query(spark):
    from bigdata_old_spark.pipeline.text import bm25_rank

    df = spark.createDataFrame(
        [(1, "spark spark engine"), (2, "join processing")], ["doc_id", "text"])
    # 'Spark' and 'spark' are ONE term — identical to the single-token query
    a = {r["doc_id"]: r["score"] for r in bm25_rank(df, ["Spark", "spark"]).collect()}
    b = {r["doc_id"]: r["score"] for r in bm25_rank(df, ["spark"]).collect()}
    assert a == b
    with pytest.raises(ValueError):
        bm25_rank(df, [])


def test_bpe_encode_ascii_whitespace_parity(spark):
    from bigdata_old_spark.pipeline.bpe import bpe_encode

    # NBSP is NOT a separator for Java \s+ (the training side and
    # the SQL oracle); the encode path must agree: 'foo\u00a0ba' stays
    # ONE word, so the NBSP character appears INSIDE the piece stream
    # (a Unicode-whitespace split would swallow it as a separator)
    df = spark.createDataFrame([(1, "foo\u00a0ba z")], ["doc_id", "text"])
    out = bpe_encode(df, merges=[]).collect()[0]
    stream = "".join(out["bpe_tokens"])
    assert "\u00a0" in stream
    assert stream == "foo\u00a0ba</w>z</w>"


def test_lm_bucket_equal_sizes_and_fluency_order(spark):
    from bigdata_old_spark.pipeline.text import lm_bucket

    fluent = "the cat sat on the mat and the dog sat on the rug"
    rows = (
        [(i, fluent) for i in range(4)]                      # repeated → low ce
        + [(10 + i, f"zq{i} xv{i} wk{i} jj{i} qq{i} pp{i}") for i in range(4)]
        + [(20 + i, "the cat ran off the mat quickly today friends") for i in range(4)]
    )
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = lm_bucket(df)
    got = {r["doc_id"]: r for r in out.collect()}
    sizes = {}
    for r in got.values():
        sizes[r["bucket"]] = sizes.get(r["bucket"], 0) + 1
    assert sizes == {"head": 4, "middle": 4, "tail": 4}
    # the repeated fluent docs rank lowest-entropy → head; the
    # gibberish unique-bigram docs land in the tail
    assert all(got[i]["bucket"] == "head" for i in range(4))
    assert all(got[10 + i]["bucket"] == "tail" for i in range(4))
    # determinism across reruns (quantized rank ordering)
    again = {r["doc_id"]: r["bucket"] for r in lm_bucket(df).collect()}
    assert again == {d: r["bucket"] for d, r in got.items()}


def test_winnowing_hash_modes_agree(spark):
    """xxhash64 (production default, 8-byte shuffle keys) and md5
    (oracle-replayable) fingerprint modes select the same PAIRS — the
    winnowing guarantee is hash-agnostic (only which window element is
    the minimum varies, and any shared >= w+k-1 substring still shares
    a fingerprint in both modes)."""
    from bigdata_old_spark.pipeline.text import winnowing_pairs

    df = spark.createDataFrame(
        [("a", "the quick brown fox jumps over the lazy dog tonight"),
         ("b", "the quick brown fox jumps over another dog entirely"),
         ("c", "completely unrelated text with zero overlap present here")],
        ["doc_id", "text"],
    )
    xx = {(r["id_a"], r["id_b"]) for r in
          winnowing_pairs(df, min_shared=1).collect()}
    md = {(r["id_a"], r["id_b"]) for r in
          winnowing_pairs(df, min_shared=1, fp_hash="md5").collect()}
    assert ("a", "b") in xx and ("a", "b") in md
    assert all("c" not in p for p in xx | md)


def test_duplicate_spans_hash_modes_agree(spark):
    """window_hash='xxhash64' (default) and 'md5' (oracle) give the
    same duplicated-token statistics — the key only names the window."""
    from bigdata_old_spark.pipeline.dedup import duplicate_spans

    df = spark.createDataFrame(
        [("a", "one two three four five alpha beta gamma"),
         ("b", "one two three four five delta epsilon zeta"),
         ("c", "nothing shared here at all whatsoever today")],
        ["doc_id", "text"],
    )
    xx = {r["doc_id"]: (r["n_dup_tokens"]) for r in duplicate_spans(df, k=5).collect()}
    md = {r["doc_id"]: (r["n_dup_tokens"]) for r in
          duplicate_spans(df, k=5, window_hash="md5").collect()}
    assert xx == md
    assert xx["a"] == 5 and xx["c"] == 0


def test_tfidf_keywords(spark):
    """Smoothed TF-IDF top-k: corpus-wide terms score low, distinctive
    terms rank first, ties break on the term, ranks are dense per doc."""
    from bigdata_old_spark.pipeline.text import tfidf_keywords

    df = spark.createDataFrame(
        [(1, "apple banana apple common common"),
         (2, "cherry common common banana cherry cherry"),
         (3, "common common common durian")],
        ["doc_id", "text"],
    )
    out = tfidf_keywords(df, k=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append((r["rank"], r["term"], r["score"]))
    for v in by_doc.values():
        v.sort()
    # the distinctive term wins in every document
    assert by_doc[1][0][1] == "apple"
    assert by_doc[2][0][1] == "cherry"
    # doc 3: tf dominance — common (tf 3/4, idf 1.0) legitimately beats
    # durian (tf 1/4, idf ln(2)+1); the distinctive term still ranks
    assert [t for _, t, _ in by_doc[3]] == ["common", "durian"]
    # k bound respected, ranks dense from 1
    assert all(len(v) == 2 and [r for r, _, _ in v] == [1, 2] for v in by_doc.values())
    # smoothed idf: the everywhere-term scores ln(1)+1 = 1.0 exactly,
    # so in docs 1-2 the distinctive term outranks it
    assert by_doc[1][1][1] == "common" and by_doc[2][1][1] == "common"


def test_dedup_clusters_quality_keep(spark):
    """keep_score flips the canonical to the best-scoring member (ties
    -> min id); cluster ids stay min-member."""
    from bigdata_old_spark.pipeline.dedup import dedup_clusters
    from bigdata_old_spark.pipeline.text import token_count

    df = spark.createDataFrame(
        [(1, BASE), (2, BASE + " with extra trailing tokens appended here"),
         (3, OTHER)],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in dedup_clusters(
        df, min_jaccard=0.4, keep_score=token_count(F.col("text"))).collect()}
    # 1 and 2 cluster together (cluster id = min member = 1), but the
    # LONGER doc 2 is the keeper
    assert out[1]["cluster_id"] == 1 and out[2]["cluster_id"] == 1
    assert out[2]["is_keep"] and not out[1]["is_keep"]
    assert out[3]["is_keep"]  # singleton keeps itself


def test_top_ngrams(spark):
    from bigdata_old_spark.pipeline.text import top_ngrams

    df = spark.createDataFrame(
        [(1, "visit our site today for more info"),
         (2, "visit our site today please"),
         (3, "totally unrelated words here now"),
         (4, "visit our site now now now visit our site")],
        ["doc_id", "text"],
    )
    out = top_ngrams(df, n=3, k=3).collect()
    # doc frequency: "visit our site" occurs in 3 docs (doc 4 counted
    # ONCE despite two occurrences)
    assert out[0]["gram"] == "visit our site" and out[0]["cnt"] == 3
    # raw-occurrence mode counts doc 4 twice
    raw = top_ngrams(df, n=3, k=1, doc_freq=False).collect()[0]
    assert raw["gram"] == "visit our site" and raw["cnt"] == 4
    # short docs (< n tokens) contribute nothing / no crash
    assert top_ngrams(spark.createDataFrame([(9, "one two")], ["doc_id", "text"]),
                      n=3, k=5).count() == 0


def test_canonical_url_normalization(spark):
    from bigdata_old_spark.pipeline.text import canonical_url

    cases = [
        ("HTTPS://WWW.Example.com:443/a/b/?utm=x#f", "example.com/a/b"),
        ("http://example.com:80/a/b", "example.com/a/b"),
        ("example.com/a/b/", "example.com/a/b"),          # scheme-less
        ("https://example.com", "example.com"),
        ("https://example.com/#top", "example.com"),
        ("ftp://Files.example.com/x", "files.example.com/x"),
        ("https://example.com:8080/x", "example.com:8080/x"),  # non-default port kept
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], ["url"])
    got = [r["c"] for r in df.select(canonical_url(F.col("url")).alias("c")).collect()]
    assert got == [want for _, want in cases]
    # keep_query retains the query but still strips fragment + slash
    df2 = spark.createDataFrame([("https://a.com/p/?q=1#f",)], ["url"])
    got2 = df2.select(canonical_url(F.col("url"), keep_query=True).alias("c")).collect()
    assert got2[0]["c"] == "a.com/p?q=1"


def test_url_dedup_keeps_min_id_per_page(spark):
    from bigdata_old_spark.pipeline.dedup import url_dedup

    rows = [
        (1, "https://www.site.com/page/7/"),
        (2, "HTTP://site.com:80/page/7?utm=x"),   # same page, worse spelling
        (3, "https://site.com/page/8"),
        (4, "https://site.com/page/8#frag"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "url"])
    kept = sorted(r["doc_id"] for r in url_dedup(df).collect())
    assert kept == [1, 3]
