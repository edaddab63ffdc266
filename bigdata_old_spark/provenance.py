"""Statement identifiers (SIDs) — the reference's provenance mode.

Reference: ``AbstractTripleStore.Options.STATEMENT_IDENTIFIERS``
(AbstractTripleStore.java:743-787) and VTE ``STATEMENT``
(VTE.java:42-54): every explicit triple gets a canonical identifier
usable as a term in other statements, so applications make statements
about statements without RDF reification bloat.  The reference's
interchange extension unifies reification bundles (a blank node with
rdf:subject/rdf:predicate/rdf:object) into the SID of the reified
statement (RDFXMLParser/StatementBuffer SIDs processing).

Spark-first shape:

* a SID is the deterministic 64-bit hash of the statement's flat key
  (``xxhash64`` over the s/p/o flat encodings), rendered as a
  ``sid:<hex>`` resource — it joins and serializes exactly like an IRI,
  so the whole relational engine works on SIDs unchanged;
* ``to_sids`` rewrites reification bundles distributively: one scan
  finds the bundles, one join replaces every other occurrence of the
  reifying bnode with the SID, and the bundle triples are dropped
  (exactly what the reference's StatementBuffer does at load);
* the (sid → s,p,o) map is KEPT as a DataFrame and triple patterns over
  rdf:subject/rdf:predicate/rdf:object answer from it (the compiler's
  virtual-reification hook), which is strictly more than the reference
  offers — it documents "you CAN NOT translate from a statement
  identifier back to the original statement"
  (AbstractTripleStore.java:757); here the reverse map is one slim
  DataFrame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"


def _okey() -> F.Column:
    """Statements-table object columns → flat resource/literal key
    (mirrors compiler._key_from_obj, duplicated here to avoid a
    circular import; the encodings must stay identical)."""
    from bigdata_old_spark.compiler import _key_from_obj

    return _key_from_obj()


def sid_col(s: F.Column, p: F.Column, okey: F.Column) -> F.Column:
    """Deterministic SID for a triple: sid:<xxhash64 of the flat key>."""
    return F.concat(
        F.lit("sid:"),
        F.conv(F.xxhash64(s, p, okey).cast("string"), 10, 16),
    )


def to_sids(store):
    """Rewrite RDF-reification bundles into statement identifiers.

    Returns ``(new_store, sid_map)`` where ``sid_map`` has columns
    (sid, ts, tp, to_kind, to_lex, to_dt, to_lang) — the reverse map
    the compiler uses for virtual reification patterns.  The new store
    carries it as ``store.sid_map`` so queries pick it up.
    """
    df = store.statements
    okey = _okey()

    # 1. reification bundles: bnode B with rdf:subject/predicate/object
    subj = df.where((F.col("p") == RDF_NS + "subject") & F.col("s").startswith("_:")).select(
        F.col("s").alias("b"), okey.alias("ts"))
    pred = df.where((F.col("p") == RDF_NS + "predicate") & (F.col("o_kind") == 0)).select(
        F.col("s").alias("b"), F.col("o_lex").alias("tp"))
    obj = df.where(F.col("p") == RDF_NS + "object").select(
        F.col("s").alias("b"),
        *[F.col(c).alias("t" + c) for c in ("o_kind", "o_lex", "o_dt", "o_lang", "o_num", "o_dbl", "o_dtm", "o_bool")],
    )
    bundles = subj.join(pred, "b").join(obj, "b")
    t_okey = (
        F.when(F.col("to_kind") == 1, F.concat(F.lit("_:"), F.col("to_lex")))
        .when(
            F.col("to_kind") == 2,
            F.concat(
                F.lit("\x1f"),
                F.concat_ws(
                    "\x1f",
                    F.coalesce(F.col("to_dt"), F.lit("")),
                    F.coalesce(F.col("to_lang"), F.lit("")),
                    F.coalesce(F.col("to_dtm").cast("string"), F.lit("")),
                    F.col("to_lex"),
                ),
            ),
        )
        .otherwise(F.col("to_lex"))
    )
    sid_map = bundles.withColumn("sid", sid_col(F.col("ts"), F.col("tp"), t_okey)).persist()

    repl = sid_map.select("b", "sid").dropDuplicates(["b"])

    # 2. drop the bundle triples (subject/predicate/object/type-Statement
    #    rows whose subject is a reifying bnode)
    bundle_preds = [RDF_NS + p_ for p_ in ("subject", "predicate", "object")]
    is_bundle_row = F.col("p").isin(bundle_preds) | (
        (F.col("p") == RDF_NS + "type")
        & (F.col("o_kind") == 0)
        & (F.col("o_lex") == RDF_NS + "Statement")
    )
    bundle_subjects = repl.select(F.col("b").alias("s"))
    keep = df.join(bundle_subjects.withColumn("__isb", F.lit(True)), "s", "left")
    keep = keep.where(~(F.coalesce(F.col("__isb"), F.lit(False)) & is_bundle_row)).drop("__isb")

    # 3. replace remaining occurrences of the bnode with the SID, in the
    #    subject and object positions
    rs = repl.select(F.col("b").alias("s"), F.col("sid").alias("__sid_s"))
    keep = keep.join(rs, "s", "left").withColumn(
        "s", F.coalesce(F.col("__sid_s"), F.col("s"))
    ).drop("__sid_s")
    ro = repl.select(F.col("b").alias("__ob"), F.col("sid").alias("__sid_o"))
    keep = keep.join(
        ro,
        (F.col("o_kind") == 1) & (F.concat(F.lit("_:"), F.col("o_lex")) == F.col("__ob")),
        "left",
    )
    keep = (
        keep.withColumn("o_lex", F.coalesce(F.col("__sid_o"), F.col("o_lex")))
        .withColumn("o_kind", F.when(F.col("__sid_o").isNotNull(), F.lit(0).cast("byte")).otherwise(F.col("o_kind")))
        .drop("__ob", "__sid_o")
    )

    # 4. NOTE: interchanged reification does NOT assert the reified
    #    statement itself — a bundle whose triple is never explicitly
    #    asserted mints a SID (metadata stays queryable) but the triple
    #    does not match statement patterns.  Reference semantics proven
    #    by reif/rdr-03a.{ttl,srx}: <<:a3 :b :c>> has a bundle but no
    #    assertion, and the expected result excludes a3.
    out = keep.dropDuplicates(
        ["g", "s", "p", "o_kind", "o_lex", "o_dt", "o_lang"]
    )

    new_store = store.with_statements(out)
    new_store.sid_map = sid_map.select(
        "sid", "ts", "tp", "to_kind", "to_lex", "to_dt", "to_lang",
        "to_num", "to_dbl", "to_dtm", "to_bool",
    )
    return new_store, new_store.sid_map
