"""Property-based checks (hypothesis) for the round-7 pipeline ops:
line_dedup and temperature_resample invariants hold on random inputs —
the whole-contract assertions a single fixture can't cover."""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from bigdata_old_spark.pipeline.dedup import line_dedup
from bigdata_old_spark.pipeline.sampling import temperature_resample

WORDS = ["alpha", "beta", "gamma", "delta"]
line_st = st.lists(st.sampled_from(WORDS), min_size=1, max_size=3).map(" ".join)
doc_st = st.lists(line_st, min_size=1, max_size=4).map("\n".join)


@settings(
    max_examples=8, deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(texts=st.lists(doc_st, min_size=1, max_size=5))
def test_line_dedup_matches_model(spark, texts):
    """line_dedup ≡ the obvious driver-side model: drop every line
    occurring in >= 2 distinct docs, preserve order, count removals."""
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    got = {r["doc_id"]: (r["text_dedup"], r["n_lines"], r["n_removed"])
           for r in line_dedup(df, min_docs=2).collect()}

    docs = {i: t.split("\n") for i, t in enumerate(texts)}
    boiler = {l for l in {x for ls in docs.values() for x in ls}
              if sum(1 for ls in docs.values() if l in ls) >= 2}
    for i, lines in docs.items():
        kept = [l for l in lines if l not in boiler]
        assert got[i] == ("\n".join(kept), len(lines), len(lines) - len(kept))


@settings(
    max_examples=8, deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(
    sizes=st.lists(st.integers(min_value=1, max_value=12), min_size=1, max_size=4),
    alpha=st.sampled_from([0.0, 0.3, 0.5, 0.7, 1.0]),
)
def test_temperature_resample_targets(spark, sizes, alpha):
    """Per-source kept counts equal min(n_s, round(N * n^a / Σ n^a));
    alpha=1 is the identity; output is always a subset of the input."""
    rows = [(sum(sizes[:j]) + i, f"s{j}")
            for j, n in enumerate(sizes) for i in range(n)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = temperature_resample(df, alpha=alpha)
    by_src = {r["source"]: r["cnt"] for r in
              out.groupBy("source").count().withColumnRenamed("count", "cnt").collect()}

    total = sum(sizes)
    wsum = sum(n ** alpha for n in sizes)
    for j, n in enumerate(sizes):
        want = min(n, int(total * (n ** alpha) / wsum + 0.5))
        assert by_src.get(f"s{j}", 0) == want
    if alpha == 1.0:
        assert out.count() == total
    got_ids = {r["doc_id"] for r in out.collect()}
    assert got_ids <= {r[0] for r in rows}


@settings(
    max_examples=8, deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(
    texts=st.lists(
        st.lists(st.sampled_from(["a", "b", "c"]), min_size=0, max_size=12).map(" ".join),
        min_size=1, max_size=5,
    ),
    k=st.integers(min_value=2, max_value=4),
)
def test_duplicate_spans_matches_model(spark, texts, k):
    """duplicate_spans ≡ the driver-side model: a token position is
    duplicated iff covered by a k-window whose text occurs >= 2 times
    corpus-wide (within- and cross-document occurrences both count);
    strip_duplicate_spans keeps exactly the uncovered tokens in order."""
    from collections import Counter

    from bigdata_old_spark.pipeline.dedup import duplicate_spans, strip_duplicate_spans

    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    got = {r["doc_id"]: r for r in duplicate_spans(df, k=k).collect()}
    got_strip = {r["doc_id"]: r for r in strip_duplicate_spans(df, k=k).collect()}

    toks = {i: [t for t in t_.split(" ") if t] for i, t_ in enumerate(texts)}
    wins: Counter = Counter()
    for ts in toks.values():
        for i in range(len(ts) - k + 1):
            wins[" ".join(ts[i:i + k])] += 1
    for d, ts in toks.items():
        covered = set()
        for i in range(len(ts) - k + 1):
            if wins[" ".join(ts[i:i + k])] >= 2:
                covered.update(range(i, i + k))
        assert got[d]["n_tokens"] == len(ts)
        assert got[d]["n_dup_tokens"] == len(covered)
        expect_kept = " ".join(t for i, t in enumerate(ts) if i not in covered)
        assert got_strip[d]["text_stripped"] == expect_kept


_scheme_st = st.sampled_from(["", "http://", "HTTPS://", "https://", "ftp://"])
_host_st = st.sampled_from(["Example.com", "www.example.com", "a.b.org", "WWW.A.B.ORG"])
_port_st = st.sampled_from(["", ":80", ":443", ":8080"])
_path_st = st.sampled_from(["", "/", "/x", "/x/", "/x/Y", "/x/Y/"])
_tail_st = st.sampled_from(["", "?q=1", "#f", "?q=1#f"])


@settings(
    max_examples=6, deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(urls=st.lists(
    st.tuples(_scheme_st, _host_st, _port_st, _path_st, _tail_st)
    .map(lambda t: "".join(t)), min_size=1, max_size=8))
def test_canonical_url_idempotent_and_tail_free(spark, urls):
    """canonical_url is IDEMPOTENT (canonicalizing a canonical URL is a
    no-op — the key is a fixpoint, so re-keying an already-deduped
    corpus never reshuffles groups) and its output carries no scheme,
    leading www, default port, query, fragment, or trailing slash."""
    from pyspark.sql import functions as F

    from bigdata_old_spark.pipeline.text import canonical_url

    df = spark.createDataFrame([(u,) for u in urls], ["url"])
    once = df.select(canonical_url(F.col("url")).alias("url"))
    twice = once.select(canonical_url(F.col("url")).alias("c"))
    a = [r["url"] for r in once.collect()]
    b = [r["c"] for r in twice.collect()]
    assert a == b
    for c in a:
        assert "://" not in c and "?" not in c and "#" not in c
        assert not c.startswith("www.")
        assert not c.endswith("/")
        host = c.split("/", 1)[0]
        assert not host.endswith(":80") and not host.endswith(":443")
