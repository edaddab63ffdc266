"""Structured Streaming surface (additive — the reference has NO
streaming subsystem, SURVEY §2.9; its changesets API is a commit hook,
not event streaming.  Kept out of the correctness gate).

Two entry points:
  * stream_ntriples — continuous triple ingest: text-file stream →
    line-parsed statements (mapInPandas keeps the pure-Python N-Triples
    parser Arrow-batched) → append sink on the statements Parquet dir.
    This turns the store into an incrementally-growing dataset; batch
    queries see new triples on the next read.
  * windowed_event_counts — event-time tumbling-window aggregation with
    watermarked late-data handling over an events-shaped stream (the
    canonical readStream → window agg → writeStream shape).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata_old_spark.model import STATEMENTS_SCHEMA, STYPE_EXPLICIT


def parse_lines_to_statements(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: N-Triples lines → statements rows."""
    from bigdata_old_spark.rio import parse_ntriples_line

    cols = [f.name for f in STATEMENTS_SCHEMA.fields]
    for pdf in batches:
        rows = []
        for line in pdf["value"]:
            parsed = parse_ntriples_line(line)
            if parsed is None:
                continue
            s, p, o = parsed
            kind, lex, dt, lang, num, dbl, dtm, b = o.as_row()
            rows.append((None, s, p, kind, lex, dt, lang,
                         float(num) if num is not None else None, dbl, dtm, b, STYPE_EXPLICIT))
        yield pd.DataFrame(rows, columns=cols)


def stream_ntriples(spark: SparkSession, source_dir: str) -> DataFrame:
    """Streaming DataFrame of statements from N-Triples files appearing
    under source_dir.  Attach any sink: .writeStream.format('parquet')
    .option('path', store_dir).option('checkpointLocation', …).start()."""
    lines = spark.readStream.text(source_dir)
    return lines.mapInPandas(parse_lines_to_statements, STATEMENTS_SCHEMA)


def ingest_ntriples_once(spark: SparkSession, source_dir: str, store_dir: str, checkpoint_dir: str) -> None:
    """One availableNow pass: parse every pending file, append to the
    statements Parquet dir, exit.  Rerunnable (checkpoint tracks files)."""
    q = (
        stream_ntriples(spark, source_dir)
        .writeStream.format("parquet")
        .option("path", store_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    key_col: str = "event_type",
) -> DataFrame:
    """Tumbling-window counts+sums with late-data watermark.  Works on a
    streaming OR batch events DataFrame (same code path — Spark's
    unified semantics; batch mode simply ignores the watermark)."""
    df = events
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.window(F.col(ts_col), window).alias("w"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("value_sum"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            key_col, "n", "value_sum",
        )
    )
