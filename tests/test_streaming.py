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
