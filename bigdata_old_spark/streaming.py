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


def _with_event_time(df: DataFrame, ts_col: str) -> DataFrame:
    """Watermarks/session windows need TIMESTAMP (LTZ); parquet written
    without UTC adjustment reads back as TIMESTAMP_NTZ in Spark 4 —
    reinterpret it in the session zone (semantics unchanged for the
    UTC sessions this engine uses)."""
    from pyspark.sql.types import TimestampNTZType

    if isinstance(df.schema[ts_col].dataType, TimestampNTZType):
        df = df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return df


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


def sessionized_event_counts(
    events: DataFrame,
    gap: str = "6 hours",
    watermark: str = "12 hours",
    ts_col: str = "ts",
    key_col: str = "user_id",
) -> DataFrame:
    """Session-window aggregation via the built-in ``session_window``
    (dynamic gap-merged windows; batch or streaming — on a stream the
    watermark closes sessions whose gap has definitively elapsed).
    Window end = last event + gap, per Spark session semantics.
    Returns: user_id-ish key | session_start | session_end | n | value_sum."""
    df = _with_event_time(events, ts_col)
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.session_window(F.col(ts_col), gap).alias("w"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("value_sum"))
        .select(
            F.col(key_col), F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"), "n", "value_sum",
        )
    )


def sessionize_batch(
    events: DataFrame,
    gap_seconds: int = 21600,
    ts_col: str = "ts",
    key_col: str = "user_id",
) -> DataFrame:
    """Batch sessionization with closed-form session bounds: a new
    session starts where the gap to the previous event (per key) exceeds
    ``gap_seconds``; session bounds are the member min/max event times
    (no +gap extension — the oracle-friendly convention).

    Returns: key | session_start | session_end | n_events | value_sum.

    Scale shape: one window partitioned BY KEY (never global) to flag
    session breaks + one hash aggregation on (key, session index) —
    both shuffle on the key, skew-bounded by the hottest single user.
    """
    from pyspark.sql import Window

    events = _with_event_time(events, ts_col)
    w = Window.partitionBy(key_col).orderBy(ts_col)
    ts = F.col(ts_col)
    brk = F.when(
        F.lag(ts).over(w).isNull()
        | (ts.cast("double") - F.lag(ts).over(w).cast("double") > gap_seconds),
        1,
    ).otherwise(0)
    sess = (
        events.withColumn("__sidx", F.sum(brk).over(w.rowsBetween(Window.unboundedPreceding, 0)))
    )
    return (
        sess.groupBy(key_col, "__sidx")
        .agg(
            F.min(ts).alias("session_start"),
            F.max(ts).alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("value_sum"),
        )
        .drop("__sidx")
    )


def sessionize_stateful(
    events: DataFrame,
    gap_seconds: int = 21600,
    ts_col: str = "ts",
    key_col: str = "user_id",
    timeout_ms: int = 30000,
    flush_on_idle: bool = True,
    watermark: str | None = None,
) -> DataFrame:
    """Custom stateful session operator over a STREAM:
    ``applyInPandasWithState`` keeps (start, end, n, sum) per key and
    closes a session when an event arrives past the gap.

    Idle keys (``flush_on_idle``, the default): after ``timeout_ms`` of
    processing-time inactivity for a key, its open session is CLOSED
    AND EMITTED regardless of the event-time gap — flush-on-idle
    semantics.  On a drained stream this converges to
    :func:`sessionize_batch` (which also closes every open session at
    end of input); on a live stream, a key idle longer than
    ``timeout_ms`` of wall-clock (lag, bursty sources) has its session
    split even though the event-time gap has not elapsed.

    ``flush_on_idle=False`` gives strict event-time semantics instead:
    pass a ``watermark`` delay, and a timed-out session is only emitted
    once the tracked watermark has passed ``session_end + gap`` —
    otherwise the timeout re-arms.  Sessions then never split early,
    but the last session per key stays open until the watermark
    advances past its gap (it never does on a frozen stream — standard
    watermark behavior, same as ``session_window`` + append mode).

    This is the template for stateful operators the built-in
    ``session_window`` cannot express (e.g. emitting MID-session
    updates or custom eviction); prefer
    :func:`sessionized_event_counts` when it can.

    State is per-key and O(1) — the canonical keyed-state scale shape.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = (
        f"{key_col} long, session_start timestamp, session_end timestamp, "
        "n_events long, value_sum double"
    )
    state_schema = (
        "session_start timestamp, session_end timestamp, n_events long, value_sum double"
    )
    gap_ms = gap_seconds * 1000

    def _epoch_ms(ts) -> int:
        from datetime import timezone

        return int(ts.replace(tzinfo=timezone.utc).timestamp() * 1000)

    def fn(key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        (user,) = key
        cols = ["session_start", "session_end", "n_events", "value_sum"]
        closed: list[tuple] = []
        if state.hasTimedOut:
            if state.exists:
                s, e, n, v = state.get
                if flush_on_idle:
                    close = True
                else:
                    # getCurrentWatermarkMs raises without a watermark —
                    # only consulted in strict event-time mode
                    wm = state.getCurrentWatermarkMs()
                    close = wm > 0 and wm - _epoch_ms(e) > gap_ms
                if close:
                    closed.append((s, e, n, v))
                    state.remove()
                else:
                    # gap not definitively elapsed in event time — re-arm
                    state.setTimeoutDuration(timeout_ms)
        else:
            rows = pd.concat(list(pdfs)).sort_values(ts_col)
            cur = list(state.get) if state.exists else None
            for ts, val in zip(rows[ts_col], rows["value"]):
                ts = ts.to_pydatetime()
                if cur is None:
                    cur = [ts, ts, 0, 0.0]
                elif (ts - cur[1]).total_seconds() > gap_seconds:
                    closed.append(tuple(cur))
                    cur = [ts, ts, 0, 0.0]
                cur[1] = max(cur[1], ts)
                cur[2] += 1
                cur[3] += float(val) if val is not None else 0.0
            if cur is not None:
                state.update(tuple(cur))
                state.setTimeoutDuration(timeout_ms)
        if closed:
            out = pd.DataFrame(closed, columns=cols)
            out.insert(0, key_col, user)
            yield out

    events = _with_event_time(events, ts_col)
    if watermark is not None and events.isStreaming:
        events = events.withWatermark(ts_col, watermark)
    return events.groupBy(key_col).applyInPandasWithState(
        fn, out_schema, state_schema, "append", GroupStateTimeout.ProcessingTimeTimeout
    )


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
    df = _with_event_time(events, ts_col)
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


def continuous_query(spark: SparkSession, source_dir: str, sparql: str) -> DataFrame:
    """Continuous SPARQL over a live N-Triples stream: every arriving
    statement flows through the compiled pattern and matching bindings
    stream out (readStream → the same QueryCompiler → writeStream-able
    DataFrame of term-struct columns).

    Stateless subset: ONE triple pattern plus FILTER / BIND /
    projection.  Multi-pattern BGPs would be stream-stream self-joins,
    which Spark only supports with event-time watermarks RDF statements
    don't carry — batch the store for those (or window-aggregate the
    stream with :func:`windowed_event_counts`).  The restriction is
    enforced here so the error is immediate, not a mid-stream analysis
    exception.
    """
    from bigdata_old_spark import algebra as A
    from bigdata_old_spark.parser import parse_query
    from bigdata_old_spark.store import TripleStore

    q = parse_query(sparql)
    if not isinstance(q, A.SelectQuery):
        raise ValueError("continuous_query supports SELECT queries")
    if q.group_by or q.order_by or q.having or q.distinct or q.reduced or q.limit is not None:
        raise ValueError(
            "continuous_query is stateless: no GROUP BY/ORDER BY/"
            "DISTINCT/LIMIT (use windowed_event_counts for windowed "
            "streaming aggregation)"
        )

    def triple_count(node) -> int:
        if isinstance(node, A.BGP):
            return len(node.triples)
        if isinstance(node, (A.FilterPat,)):
            return triple_count(node.child)
        if isinstance(node, A.Extend):
            return triple_count(node.child)
        if isinstance(node, A.Join):
            return triple_count(node.left) + triple_count(node.right)
        raise ValueError(f"continuous_query: unsupported pattern {type(node).__name__}")

    if triple_count(q.pattern) != 1:
        raise ValueError(
            "continuous_query matches exactly one triple pattern "
            "(multi-pattern BGPs need stream-stream joins)"
        )

    stream = stream_ntriples(spark, source_dir)
    st = TripleStore(spark, stream, union_default_graph=False, has_named_graphs=False)
    return st.query(sparql)


def dedup_ingest_once(
    spark: SparkSession,
    source_dir: str,
    index_path: str,
    out_dir: str,
    checkpoint_dir: str,
    min_jaccard: float = 0.7,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
) -> None:
    """Continuous curation ingest: document batches (JSON-lines files
    appearing under ``source_dir``) dedup against the PERSISTED MinHash
    signature index (pipeline.dedup) — a batch doc near-duplicating any
    already-ingested doc is dropped, batch-internal near-dup groups
    keep the min id, survivors are appended to ``out_dir`` AND their
    signatures are appended to the index, so every later batch dedups
    against everything ingested so far.

    The streaming composition of the round-7 incremental dedup index:
    each micro-batch's (small, broadcast) bucket keys probe the stored
    bucket table — the ingested corpus is never re-read or re-shingled.
    availableNow trigger = process pending files, then exit
    (rerunnable; the checkpoint tracks consumed files).  At 100 TB the
    same foreachBatch body runs unmodified under a continuous trigger.

    Exactly-once output despite the two non-transactional writes:
    survivors land in a ``__ingest_batch=<batch_id>`` partition written
    with DYNAMIC partition overwrite, so a crash-and-retry of the same
    micro-batch REPLACES its own partition instead of appending a
    duplicate copy; and the survivor derivation ignores identity pairs
    (id_a == id_b), so a retried batch whose signatures already reached
    the index does not drop its own documents as "duplicates of the
    corpus".  Duplicate signature rows in the index from a replayed
    append are harmless — they can only re-produce the same candidate
    pairs, which dedupe before use.
    """
    from bigdata_old_spark.pipeline.dedup import (
        append_to_dedup_index,
        build_dedup_index,
        dedup_against,
        dedup_index_exists,
        load_dedup_index,
        minhash_lsh_pairs,
    )

    def write_out(survivors: DataFrame, batch_id: int) -> None:
        (
            survivors.withColumn("__ingest_batch", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("__ingest_batch")
            .parquet(out_dir)
        )

    def process(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        sp = batch.sparkSession
        if not dedup_index_exists(sp, index_path):
            # bootstrap: first batch self-dedups, then seeds the index
            pairs = minhash_lsh_pairs(
                batch, id_col, text_col, k=k, num_hashes=num_hashes,
                bands=bands, min_jaccard=min_jaccard,
            )
            drop = pairs.select(F.col("id_b").alias(id_col)).dropDuplicates()
            survivors = batch.join(drop, id_col, "left_anti").localCheckpoint(eager=True)
            build_dedup_index(
                survivors, id_col, text_col, k=k, num_hashes=num_hashes,
                bands=bands, path=index_path,
            )
            write_out(survivors, batch_id)
            return
        idx = load_dedup_index(sp, index_path, k=k, num_hashes=num_hashes, bands=bands)
        pairs = dedup_against(
            idx, batch, id_col, text_col, min_jaccard=min_jaccard
        ).where(F.col("id_a") != F.col("id_b"))  # retry-safety: a doc
        # whose own signatures already reached the index (replayed
        # batch) is not a duplicate of itself
        bids = batch.select(F.col(id_col).alias("__bid"))
        # drop a batch doc when it pairs with an already-ingested doc
        # (corpus wins) or with a smaller-id batch doc (greedy keep-min,
        # the minhash_dedup convention)
        pa = pairs.join(bids, pairs["id_a"] == bids["__bid"], "left_semi")
        pb = pairs.join(bids, pairs["id_b"] == bids["__bid"], "left_semi")
        both = pa.join(
            bids.select(F.col("__bid").alias("__bid2")),
            pa["id_b"] == F.col("__bid2"), "left_semi",
        )
        drop = (
            both.select(F.col("id_b").alias(id_col))          # batch-batch: greater id
            .unionByName(
                pa.join(both, ["id_a", "id_b"], "left_anti")  # batch(a) vs corpus(b)
                .select(F.col("id_a").alias(id_col))
            )
            .unionByName(
                pb.join(both, ["id_a", "id_b"], "left_anti")  # corpus(a) vs batch(b)
                .select(F.col("id_b").alias(id_col))
            )
            .dropDuplicates()
        )
        survivors = batch.join(drop, id_col, "left_anti").localCheckpoint(eager=True)
        append_to_dedup_index(idx, index_path, survivors, id_col, text_col)
        write_out(survivors, batch_id)

    q = (
        spark.readStream.schema(f"{id_col} long, {text_col} string")
        .json(source_dir)
        .writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def funnel_stages(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered-funnel analysis: for each user, how far through the
    ``steps`` sequence they progressed, where step i+1 must occur
    STRICTLY after the (earliest possible) completion of step i.  The
    greedy earliest-completion walk is optimal for reachability, so
    "stage" is a well-defined function of the event set.

    Returns: user_col | stage (1..len(steps)) | stage_ts (event time of
    the furthest step reached) — users who never performed step 1 are
    omitted (stage 0 carries no timestamp and bloats the output at
    corpus scale).

    Scale shape: events filter to the step types at the scan (predicate
    pushdown), ONE shuffle on the user key, and the walk itself is a
    row-local fold over each user's time-sorted event array — no
    window-function global sort, no UDF.  Skew bound = the hottest
    single user's event count.
    """
    if not steps:
        raise ValueError("funnel needs at least one step")
    evs = (
        events.where(F.col(type_col).isin(list(steps)))
        .select(
            F.col(user_col),
            F.struct(F.col(ts_col).alias("ts"), F.col(type_col).alias("et")).alias("e"),
        )
    )
    per_user = evs.groupBy(user_col).agg(F.array_sort(F.collect_list("e")).alias("evs"))
    step_arr = F.array(*[F.lit(s) for s in steps])
    n_steps = len(steps)
    init = F.struct(
        F.lit(0).alias("stage"), F.lit(None).cast("timestamp").alias("last_ts")
    )

    def advance(acc, e):
        eligible = (
            (acc["stage"] < n_steps)
            & (e["et"] == F.element_at(step_arr, acc["stage"] + 1))
            & ((acc["stage"] == 0) | (e["ts"] > acc["last_ts"]))
        )
        return F.when(
            eligible,
            F.struct((acc["stage"] + 1).alias("stage"), e["ts"].alias("last_ts")),
        ).otherwise(acc)

    res = per_user.select(
        F.col(user_col), F.aggregate("evs", init, advance).alias("r")
    )
    return res.where(F.col("r.stage") >= 1).select(
        user_col,
        F.col("r.stage").alias("stage"),
        F.col("r.last_ts").alias("stage_ts"),
    )
