"""Eval-set decontamination + PII redaction (beyond-parity pipeline)."""

from pyspark.sql import functions as F

from bigdata_old_spark.pipeline.decontam import decontaminate, ngram_contamination
from bigdata_old_spark.pipeline.redact import pii_signals, redact_pii


def test_ngram_contamination(spark):
    train = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),   # = eval 100
            (2, "the quick brown fox sleeps all day long today"), # partial
            (3, "completely different words about spark shuffles here"),
            (4, "too short"),                                     # < 3 tokens
        ],
        "doc_id long, text string",
    )
    eval_df = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in ngram_contamination(train, eval_df, n=3).collect()}
    assert len(out) == 4  # every training doc keeps a row
    assert out[1]["contamination_frac"] == 1.0 and out[1]["is_contaminated"]
    # doc 2 shares exactly "the quick brown" + "quick brown fox" = 2 of 7
    assert out[2]["n_ngrams"] == 7 and out[2]["n_contaminated"] == 2
    assert out[2]["is_contaminated"]  # 2/7 ≈ 0.286 >= default 0.2
    assert out[3]["n_contaminated"] == 0 and not out[3]["is_contaminated"]
    assert out[4]["n_ngrams"] == 0 and out[4]["contamination_frac"] == 0.0


def test_ngram_contamination_threshold_and_filter(spark):
    train = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (3, "completely different words about spark shuffles here"),
        ],
        "doc_id long, text string",
    )
    eval_df = train.where(F.col("doc_id") == 1)
    kept = decontaminate(train, eval_df, n=3, min_frac=0.5)
    assert [r["doc_id"] for r in kept.collect()] == [3]


def test_ngram_contamination_distinct_grams(spark):
    # repeated boilerplate counts once (distinct n-grams on both sides)
    train = spark.createDataFrame(
        [(1, "a b c a b c a b c")], "doc_id long, text string"
    )
    eval_df = spark.createDataFrame([(9, "a b c")], "doc_id long, text string")
    r = ngram_contamination(train, eval_df, n=3).collect()[0]
    # distinct 3-grams of train: "a b c", "b c a", "c a b" → 3; hit: 1
    assert r["n_ngrams"] == 3 and r["n_contaminated"] == 1


def test_pii_signals_and_redact(spark):
    docs = spark.createDataFrame(
        [
            (1, "mail me at jo.doe+x@sub.example.co or call +1 555-123-4567"),
            (2, "server at 192.168.1.254 and 10.0.0.1 no mail"),
            (3, "clean text with no personal data at all"),
            (4, "version 1.2.3.4.5 is not an ip... or is it"),
        ],
        "doc_id long, text string",
    )
    sig = {r["doc_id"]: r for r in pii_signals(docs).collect()}
    assert sig[1]["n_email"] == 1 and sig[1]["n_phone"] == 1 and sig[1]["n_ipv4"] == 0
    assert sig[2]["n_ipv4"] == 2 and sig[2]["n_pii"] == 2
    assert sig[3]["n_pii"] == 0
    red = {r["doc_id"]: r["text"] for r in redact_pii(docs).collect()}
    assert "<EMAIL>" in red[1] and "<PHONE>" in red[1]
    assert "jo.doe" not in red[1] and "555-123" not in red[1]
    assert red[2].count("<IP>") == 2
    assert red[3] == "clean text with no personal data at all"


def test_contamination_plan_no_cartesian(spark):
    """The gram join must be an equi-join (broadcast or shuffled hash),
    never a nested-loop cartesian."""
    train = spark.createDataFrame([(1, "a b c d e")], "doc_id long, text string")
    plan = ngram_contamination(train, train, n=3)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_fuzzy_decontaminate(spark):
    """Near-dup eval leakage: a lightly-edited eval doc in the training
    set is caught (exact n-gram overlap would score it lower) and
    dropped; unrelated docs survive."""
    from bigdata_old_spark.pipeline.decontam import (
        fuzzy_contamination_pairs,
        fuzzy_decontaminate,
    )

    ev_text = ("what is the capital of france the capital of france "
               "is paris a city on the seine")
    train = spark.createDataFrame(
        [
            (1, ev_text.replace("seine", "river")),  # paraphrased leak
            (2, "completely unrelated training document about gradient "
                "descent optimizers and learning rate schedules"),
        ],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame([(100, ev_text)], "doc_id long, text string")
    pairs = fuzzy_contamination_pairs(train, ev, min_jaccard=0.5).collect()
    assert {(r["id_train"], r["id_eval"]) for r in pairs} == {(1, 100)}
    kept = fuzzy_decontaminate(train, ev, min_jaccard=0.5)
    assert [r["doc_id"] for r in kept.collect()] == [2]
