"""Structured Streaming ingest + windowed aggregation (additive surface)."""

import os

from pyspark.sql import functions as F

from bigdata_old_spark.mapping import read_table
from bigdata_old_spark.model import STATEMENTS_SCHEMA
from bigdata_old_spark.store import TripleStore
from bigdata_old_spark.streaming import ingest_ntriples_once, windowed_event_counts

NT = """<http://example.org/a> <http://example.org/p> "hello" .
<http://example.org/a> <http://example.org/p> "42"^^<http://www.w3.org/2001/XMLSchema#integer> .
<http://example.org/b> <http://example.org/knows> <http://example.org/a> .
"""


def test_streaming_ntriples_ingest(spark, tmp_path):
    src = tmp_path / "incoming"
    store_dir = tmp_path / "store"
    ckpt = tmp_path / "ckpt"
    os.makedirs(src)
    (src / "batch1.nt").write_text(NT)
    ingest_ntriples_once(spark, str(src), str(store_dir), str(ckpt))
    st = TripleStore(spark, spark.read.schema(STATEMENTS_SCHEMA).parquet(str(store_dir)))
    assert st.statements.count() == 3
    df = st.query("SELECT ?o WHERE { <http://example.org/a> <http://example.org/p> ?o }")
    assert sorted(r["o"]["lex"] for r in df.collect()) == ["42", "hello"]
    # a second file appears → incremental pickup, no reprocessing
    (src / "batch2.nt").write_text('<http://example.org/c> <http://example.org/p> "later" .\n')
    ingest_ntriples_once(spark, str(src), str(store_dir), str(ckpt))
    assert spark.read.schema(STATEMENTS_SCHEMA).parquet(str(store_dir)).count() == 4


def test_windowed_event_counts_batch_parity(spark):
    events = read_table(spark, "/root/testdata/sf0.001/events.parquet")
    out = windowed_event_counts(events, window="1 day")
    total = out.agg(F.sum("n")).collect()[0][0]
    assert total == events.count()
    one = out.limit(1).collect()[0]
    assert one["window_end"] > one["window_start"]


def test_windowed_event_counts_streaming(spark, tmp_path):
    events = read_table(spark, "/root/testdata/sf0.001/events.parquet").limit(200)
    src = tmp_path / "ev"
    events.write.parquet(str(src))
    stream = spark.readStream.schema(events.schema).parquet(str(src))
    agg = windowed_event_counts(stream, window="1 day", watermark="2 days")
    q = (
        agg.writeStream.format("memory")
        .queryName("wincounts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.sql("select sum(n) from wincounts").collect()[0][0]
    assert got == 200


def test_sessionize_batch(spark):
    from bigdata_old_spark.streaming import sessionize_batch, sessionized_event_counts

    events = read_table(spark, "/root/testdata/sf0.001/events.parquet")
    out = sessionize_batch(events, gap_seconds=21600).cache()
    # every event lands in exactly one session
    assert out.agg(F.sum("n_events")).collect()[0][0] == events.count()
    # sessions of one user never overlap and respect the gap
    rows = sorted(
        ((r["session_start"], r["session_end"]) for r in out.where(F.col("user_id") == out.select("user_id").first()[0]).collect()),
    )
    for (s1, e1), (s2, _) in zip(rows, rows[1:]):
        assert (s2 - e1).total_seconds() > 21600
    # built-in session_window agrees on session starts and sizes
    # (its end = last event + gap; starts and membership are identical)
    sw = sessionized_event_counts(events, gap="6 hours")
    a = {(r["user_id"], r["session_start"], r["n"]) for r in sw.collect()}
    b = {(r["user_id"], r["session_start"], r["n_events"]) for r in out.collect()}
    assert a == b


def test_sessionize_stateful_stream(spark, tmp_path):
    import time

    from bigdata_old_spark.streaming import sessionize_batch, sessionize_stateful

    events = read_table(spark, "/root/testdata/sf0.001/events.parquet").where(F.col("user_id") < 10)
    src = tmp_path / "sess_src"
    events.write.parquet(str(src))
    stream = spark.readStream.schema(events.schema).parquet(str(src))
    sess = sessionize_stateful(stream, gap_seconds=21600, timeout_ms=1500)
    q = (
        sess.writeStream.format("memory")
        .queryName("sessions")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        expect = {
            (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
            for r in sessionize_batch(events, gap_seconds=21600).collect()
        }
        got: set = set()
        deadline = time.time() + 60
        while time.time() < deadline and got != expect:
            time.sleep(2)
            got = {
                (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
                for r in spark.sql("select * from sessions").collect()
            }
        assert got == expect
    finally:
        q.stop()


def test_continuous_sparql_query(spark, tmp_path):
    """continuous_query: SPARQL pattern+filter over a live N-Triples
    stream; matches stream out as term-struct bindings."""
    import pytest as _pytest

    from bigdata_old_spark.streaming import continuous_query

    src = tmp_path / "cq"
    os.makedirs(src)
    (src / "b1.nt").write_text(
        '<http://ex/a> <http://ex/score> "7"^^<http://www.w3.org/2001/XMLSchema#integer> .\n'
        '<http://ex/b> <http://ex/score> "2"^^<http://www.w3.org/2001/XMLSchema#integer> .\n'
        '<http://ex/c> <http://ex/other> "9"^^<http://www.w3.org/2001/XMLSchema#integer> .\n'
    )
    out = continuous_query(
        spark, str(src),
        """SELECT ?s ?v WHERE { ?s <http://ex/score> ?v . FILTER(?v > 5) }""",
    )
    assert out.isStreaming
    q = (
        out.writeStream.format("memory").queryName("cq_hits")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    rows = spark.sql("select * from cq_hits").collect()
    assert [(r["s"]["lex"], r["v"]["lex"]) for r in rows] == [("http://ex/a", "7")]

    # the stateless contract is enforced eagerly
    with _pytest.raises(ValueError):
        continuous_query(spark, str(src), "SELECT ?s WHERE { ?s ?p ?o } ORDER BY ?s")
    with _pytest.raises(ValueError):
        continuous_query(spark, str(src),
                         "SELECT * WHERE { ?s <http://ex/p> ?x . ?x <http://ex/q> ?y }")


def test_streaming_dedup_ingest(spark, tmp_path):
    """Continuous curation ingest: each micro-batch dedups against the
    persisted signature index (exact + near dups dropped, corpus wins,
    batch-internal keeps min id), survivors extend the index for later
    batches."""
    import json as _json

    from bigdata_old_spark.streaming import dedup_ingest_once

    src = tmp_path / "incoming"
    src.mkdir()
    index_path = str(tmp_path / "sigidx")
    out_dir = str(tmp_path / "curated")
    ckpt = str(tmp_path / "ckpt")

    base = ("the quick brown fox jumps over the lazy dog and runs far "
            "away into the woods tonight")
    other = ("completely different content about spark dataframes "
            "shuffles partitions and catalyst optimizer internals")

    def write_batch(name, rows):
        with open(src / name, "w") as fh:
            for doc_id, text in rows:
                fh.write(_json.dumps({"doc_id": doc_id, "text": text}) + "\n")

    # batch 1: one internal near-dup pair (1,2) + one distinct
    write_batch("b1.json", [(1, base), (2, base.replace("lazy", "sleepy")), (3, other)])
    dedup_ingest_once(spark, str(src), index_path, out_dir, ckpt, min_jaccard=0.5)
    got1 = {r["doc_id"] for r in spark.read.parquet(out_dir).collect()}
    assert got1 == {1, 3}  # 2 deduped against 1 (min id kept)

    # batch 2: near-dup of ingested doc 1, internal dup pair (11,12), fresh 13
    write_batch("b2.json", [
        (10, base.replace("quick", "swift")),       # ~ doc 1 → dropped (corpus wins)
        (11, "storage engines compact sorted runs into leveled trees "
             "while write amplification grows with fanout"),  # ~12, keep 11
        (12, "storage engines compact sorted runs into leveled trees "
             "while write amplification grows with fanout quickly"),
        (13, "a genuinely novel document with nothing in common at all "
             "regarding topics previously seen here"),
    ])
    dedup_ingest_once(spark, str(src), index_path, out_dir, ckpt, min_jaccard=0.5)
    got2 = {r["doc_id"] for r in spark.read.parquet(out_dir).collect()}
    assert got2 == {1, 3, 11, 13}


def test_streaming_dedup_ingest_replay_is_idempotent(spark, tmp_path):
    """A replayed micro-batch (crash-and-retry: same files, fresh
    checkpoint) must neither duplicate output rows (batch-keyed dynamic
    partition overwrite) nor drop its own documents as corpus
    duplicates (identity pairs ignored even though the first attempt
    already appended the batch's signatures to the index)."""
    import json as _json

    from bigdata_old_spark.streaming import dedup_ingest_once

    src = tmp_path / "incoming"
    src.mkdir()
    index_path = str(tmp_path / "sigidx")
    out_dir = str(tmp_path / "curated")

    base = ("the quick brown fox jumps over the lazy dog and runs far "
            "away into the woods tonight")
    with open(src / "b1.json", "w") as fh:
        for doc_id, text in [(1, base), (2, base.replace("lazy", "sleepy")),
                             (3, "something else entirely about databases and engines")]:
            fh.write(_json.dumps({"doc_id": doc_id, "text": text}) + "\n")

    dedup_ingest_once(spark, str(src), index_path, out_dir,
                      str(tmp_path / "ckpt1"), min_jaccard=0.5)
    first = sorted(r["doc_id"] for r in spark.read.parquet(out_dir).collect())
    assert first == [1, 3]
    # replay: fresh checkpoint reprocesses the same file as batch 0
    dedup_ingest_once(spark, str(src), index_path, out_dir,
                      str(tmp_path / "ckpt2"), min_jaccard=0.5)
    replayed = sorted(r["doc_id"] for r in spark.read.parquet(out_dir).collect())
    assert replayed == [1, 3]  # no duplicates, nothing self-deduped away
