"""W3C-direct-mapping triplifier for the driver's TPC-H-ish tables.

Turns each relational row into RDF triples (FIXTURES.md §6):

  subject    <urn:tpch:{table}:{pk}>           (composite keys joined by ':')
  predicate  <urn:tpch:{table}#{column}>
  object     typed literal from the column value; FK columns additionally
             emit  <urn:tpch:{table}#{fk}_ref> → <urn:tpch:{ref}:{v}> .

This is the bridge that lets the RDF/SPARQL engine be validated against
a SQL oracle on the same data: any SQL join/filter/group-by over the
relational form has an equivalent SPARQL query over the triplified form.

Scale note: the triplify is a single narrow scan per table — each row
emits an array of statement structs that is exploded JVM-side (no
Python in the loop).  At 100 TB you would write the triplified form
once, partitioned by ``p`` (predicate), and query that; predicate
partitioning is the Parquet analog of the reference's POS index
(SPOKeyOrder.java:89).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from bigdata_old_spark.model import (
    DECIMAL_T,
    KIND_IRI,
    KIND_LITERAL,
    STATEMENTS_SCHEMA,
    STYPE_EXPLICIT,
    XSD_DATETIME,
    XSD_DOUBLE,
    XSD_INTEGER,
    XSD_STRING,
)

# table → (primary key columns, {fk column → referenced table})
TPCH_KEYS: dict[str, tuple[list[str], dict[str, str]]] = {
    "region": (["r_regionkey"], {}),
    "nation": (["n_nationkey"], {"n_regionkey": "region"}),
    "customer": (["c_custkey"], {"c_nationkey": "nation"}),
    "supplier": (["s_suppkey"], {"s_nationkey": "nation"}),
    "part": (["p_partkey"], {}),
    "orders": (["o_orderkey"], {"o_custkey": "customer"}),
    # NB: the synthetic data's (l_orderkey, l_linenumber) is NOT unique
    # (TPC-H-*ish*); [] means "content-hash of the full row" so each row
    # gets a distinct, deterministic subject IRI.
    "lineitem": (
        [],
        {"l_orderkey": "orders", "l_partkey": "part", "l_suppkey": "supplier"},
    ),
    "events": (["event_id"], {}),
    "documents": (["doc_id"], {}),
}


def _subject_expr(table: str, pk_cols: list[str], all_cols: list[str]) -> F.Column:
    if not pk_cols:  # no unique key → deterministic full-row content hash
        return F.concat(
            F.lit(f"urn:tpch:{table}:"),
            F.md5(F.concat_ws("|", *[F.col(c).cast("string") for c in all_cols])),
        )
    parts = [F.lit(f"urn:tpch:{table}:")]
    for i, c in enumerate(pk_cols):
        if i:
            parts.append(F.lit(":"))
        parts.append(F.col(c).cast("string"))
    return F.concat(*parts)


def _stmt_struct(p: str, kind, lex, dt=None, num=None, dbl=None, dtm=None) -> F.Column:
    null = F.lit(None)
    return F.struct(
        F.lit(p).alias("p"),
        F.lit(kind).cast(T.ByteType()).alias("o_kind"),
        lex.cast("string").alias("o_lex"),
        (F.lit(dt) if dt else null).cast("string").alias("o_dt"),
        null.cast("string").alias("o_lang"),
        (num if num is not None else null).cast(DECIMAL_T).alias("o_num"),
        (dbl if dbl is not None else null).cast("double").alias("o_dbl"),
        (dtm if dtm is not None else null).cast("timestamp").alias("o_dtm"),
        null.cast("boolean").alias("o_bool"),
    )


def triplify_table(df: DataFrame, table: str) -> DataFrame:
    """One relational table → statements DataFrame (default graph)."""
    from bigdata_old_spark.model import RDF_TYPE

    pk_cols, fks = TPCH_KEYS[table]
    stmts: list[F.Column] = []
    # W3C direct mapping emits a class triple per row:
    #   <row> rdf:type <urn:tpch:class:{table}>
    stmts.append(_stmt_struct(RDF_TYPE, KIND_IRI, F.lit(f"urn:tpch:class:{table}")))
    for field in df.schema.fields:
        c = F.col(field.name)
        pred = f"urn:tpch:{table}#{field.name}"
        dtype = field.dataType
        if isinstance(dtype, (T.IntegerType, T.LongType, T.ShortType, T.ByteType)):
            stmts.append(_stmt_struct(pred, KIND_LITERAL, c, XSD_INTEGER,
                                      num=c, dbl=c))
        elif isinstance(dtype, (T.DoubleType, T.FloatType)):
            stmts.append(_stmt_struct(pred, KIND_LITERAL, c, XSD_DOUBLE, dbl=c))
        elif isinstance(dtype, (T.TimestampType, T.TimestampNTZType, T.DateType)):
            c = c.cast("timestamp")
            lex = F.date_format(c, "yyyy-MM-dd'T'HH:mm:ss")
            stmts.append(_stmt_struct(pred, KIND_LITERAL, lex, XSD_DATETIME, dtm=c))
        elif isinstance(dtype, T.StringType):
            stmts.append(_stmt_struct(pred, KIND_LITERAL, c, XSD_STRING))
        else:
            continue  # arrays/binaries are not triplified (stay relational)
        if field.name in fks:
            ref = fks[field.name]
            ref_iri = F.concat(F.lit(f"urn:tpch:{ref}:"), c.cast("string"))
            stmts.append(_stmt_struct(pred + "_ref", KIND_IRI, ref_iri))
    out = (
        df.select(
            _subject_expr(table, pk_cols, [f.name for f in df.schema.fields]).alias("s"),
            F.explode(F.array(*stmts)).alias("t"),
        )
        .select(
            F.lit(None).cast("string").alias("g"),
            "s",
            F.col("t.p").alias("p"),
            F.col("t.o_kind").alias("o_kind"),
            F.col("t.o_lex").alias("o_lex"),
            F.col("t.o_dt").alias("o_dt"),
            F.col("t.o_lang").alias("o_lang"),
            F.col("t.o_num").alias("o_num"),
            F.col("t.o_dbl").alias("o_dbl"),
            F.col("t.o_dtm").alias("o_dtm"),
            F.col("t.o_bool").alias("o_bool"),
            F.lit(STYPE_EXPLICIT).cast(T.ByteType()).alias("stype"),
        )
        .where(F.col("o_lex").isNotNull())
    )
    return out


def read_table(spark: SparkSession, path: str) -> DataFrame:
    """Parquet read robust to TIMESTAMP(NANOS) columns (Spark refuses
    them natively): detect ns columns from the footer via pyarrow, read
    them as long, convert to micros-precision timestamps (= DuckDB's
    TIMESTAMP precision, so oracle comparisons line up)."""
    import pyarrow.parquet as pq

    ns_cols = [f.name for f in pq.read_schema(path) if str(f.type) == "timestamp[ns]"]
    if not ns_cols:
        return spark.read.parquet(path)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    for c in ns_cols:
        df = df.withColumn(c, F.timestamp_micros((F.col(c) / 1000).cast("long")))
    return df


#: explode target: one triplify task per ~this many OUTPUT statements.
#: The explode multiplies rows by ~(columns + 1), so Spark's input-split
#: sizing (bytes of the narrow relational parquet) under-provisions the
#: scan by that factor — at sf0.1 the whole 12M-statement explode ran in
#: 3 tasks, one 37 s lineitem straggler holding 29 idle cores (r10 stage
#: profile).  Scale-adaptive: derived from the parquet footer row count,
#: capped at 2x the session parallelism; a no-op once the source is
#: already split finer (the 100 TB case).
TRIPLIFY_ROWS_PER_TASK = 250_000


def triplify_dir(spark: SparkSession, sf_dir: str, tables: list[str] | None = None) -> DataFrame:
    """Triplify every mapped table under a testdata scale-factor dir."""
    tables = tables or list(TPCH_KEYS)
    par = spark.sparkContext.defaultParallelism
    dfs = []
    for t in tables:
        path = f"{sf_dir}/{t}.parquet"
        df = read_table(spark, path)
        try:
            import math
            import os

            import pyarrow.parquet as pq

            est_out = pq.read_metadata(path).num_rows * (len(df.columns) + 1)
            want = min(max(est_out // TRIPLIFY_ROWS_PER_TASK, 1), 2 * par)
            if want > 1:
                # driver-side estimate of the scan's split count (file
                # bytes / maxPartitionBytes) — df.rdd.getNumPartitions()
                # forced a full DataFrame→RDD conversion per table at
                # plan-build time.  Still a no-op when the source is
                # already split finer (the 100 TB case).
                mpb = spark._jvm.org.apache.spark.network.util.JavaUtils.\
                    byteStringAsBytes(spark.conf.get(
                        "spark.sql.files.maxPartitionBytes", "128m"))
                splits = max(1, math.ceil(os.path.getsize(path) / max(mpb, 1)))
                if want > splits:
                    df = df.repartition(int(want))
        except Exception:
            pass  # directory inputs / missing footer: keep the scan split
        dfs.append(triplify_table(df, t))
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d)
    return out
