"""RDFS forward-chaining inference — semi-naive DataFrame fixpoint.

The reference computes the RDFS+ closure as rule programs over its
join machinery (InferenceEngine.java:69, FastClosure.java:28, rule
classes rules/RuleRdfs02…13, truth maintenance in
inf/TruthMaintenance.java:110).  Here every rule is a DataFrame join
producing candidate triples; the closure loop unions fresh inferences
(anti-joined against what exists), marks them stype=INFERRED, and
repeats to fixpoint.  Retraction re-runs closure (batch re-derivation
instead of OLTP truth maintenance — SURVEY §2.12).

Scale: each round is shuffle-joins on the (tiny) schema triples
broadcast against the instance triples, so rounds parallelize fully;
localCheckpoint truncates lineage between rounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bigdata_old_spark.model import (
    KIND_IRI,
    RDF_TYPE,
    RDFS,
    STYPE_INFERRED,
)

RDFS_SUBCLASS = RDFS + "subClassOf"
RDFS_SUBPROP = RDFS + "subPropertyOf"
RDFS_DOMAIN = RDFS + "domain"
RDFS_RANGE = RDFS + "range"

from bigdata_old_spark.model import OWL  # noqa: E402

OWL_INVERSE = OWL + "inverseOf"
OWL_TRANSITIVE = OWL + "TransitiveProperty"
OWL_SYMMETRIC = OWL + "SymmetricProperty"
OWL_SAMEAS = OWL + "sameAs"


def _iri_obj_triples(df: DataFrame, p: str) -> DataFrame:
    """Schema triples (s, o_lex) for a predicate with IRI objects."""
    return (
        df.where((F.col("p") == p) & (F.col("o_kind") == KIND_IRI))
        .select(F.col("s"), F.col("o_lex").alias("o"))
        .dropDuplicates()
    )


def _mk_triples(df: DataFrame, s="s", p=None, o=None) -> DataFrame:
    """Build inferred statements rows: object is always an IRI here
    (the closure rules only derive IRI-object triples).  ``p`` may be a
    literal IRI string or a Column."""
    return df.select(
        F.lit(None).cast("string").alias("g"),
        F.col(s).alias("s"),
        (F.lit(p) if isinstance(p, str) else p).cast("string").alias("p"),
        F.lit(KIND_IRI).cast("tinyint").alias("o_kind"),
        F.col(o).alias("o_lex"),
        F.lit(None).cast("string").alias("o_dt"),
        F.lit(None).cast("string").alias("o_lang"),
        F.lit(None).cast("decimal(38,18)").alias("o_num"),
        F.lit(None).cast("double").alias("o_dbl"),
        F.lit(None).cast("timestamp").alias("o_dtm"),
        F.lit(None).cast("boolean").alias("o_bool"),
        F.lit(STYPE_INFERRED).cast("tinyint").alias("stype"),
    )


def _resource_obj_triples(df: DataFrame, p: str) -> DataFrame:
    """Schema triples (s, o) for a predicate whose object is a resource
    (IRI or bnode); bnode objects are normalized to the ``_:label`` form
    used in the subject position."""
    return (
        df.where((F.col("p") == p) & (F.col("o_kind") != 2))
        .select(
            F.col("s"),
            F.when(F.col("o_kind") == 1, F.concat(F.lit("_:"), F.col("o_lex")))
            .otherwise(F.col("o_lex"))
            .alias("o"),
        )
        .dropDuplicates()
    )


def _equiv_pairs(rel: DataFrame) -> DataFrame:
    """Symmetric-transitive closure of a relation → all distinct pairs
    (a,b), a ≠ b, in the same equivalence class (owl:sameAs1/1b —
    rules/RuleOwlSameAs.java, RuleOwlSameAs1b.java).  Pair count is
    O(Σ clique²); sameAs cliques are small in practice — a canonical-
    representative rewrite would replace this at pathological scale."""
    sym = rel.unionByName(
        rel.select(F.col("o").alias("s"), F.col("s").alias("o"))
    ).dropDuplicates()
    return _transitive_closure(sym).where(F.col("s") != F.col("o"))


def _transitive_closure(rel: DataFrame) -> DataFrame:
    """Closure of a small schema relation (s,o) — driver-side loop."""
    result = rel
    while True:
        step = (
            result.alias("a")
            .join(rel.alias("b"), F.col("a.o") == F.col("b.s"))
            .select(F.col("a.s").alias("s"), F.col("b.o").alias("o"))
            .dropDuplicates()
        )
        new = step.join(result, ["s", "o"], "left_anti")
        if new.isEmpty():
            return result
        result = result.unionByName(new).localCheckpoint(eager=True)


def rdfs_closure(statements: DataFrame, max_rounds: int = 50, with_owl: bool = True) -> DataFrame:
    """Compute the RDFS closure; returns statements ∪ inferred.

    Rules (reference rule classes in bigdata-rdf/.../rules/):
      rdfs5   (subPropertyOf transitivity)   RuleRdfs05.java
      rdfs7   (property inheritance)         RuleRdfs07.java
      rdfs11  (subClassOf transitivity)      RuleRdfs11.java
      rdfs9   (type inheritance)             RuleRdfs09.java
      rdfs2   (domain typing)                RuleRdfs02.java
      rdfs3   (range typing)                 RuleRdfs03.java
    OWL subset (with_owl=True): inverseOf, SymmetricProperty,
    TransitiveProperty, sameAs1/1b/2/3     RuleOwl*.java

    FastClosure's insight (FastClosure.java:28): compute the schema
    closures (sub-class/property hierarchies) FIRST and once — they are
    tiny — then apply the instance-level rules in one or two passes
    instead of naive whole-DB iteration.
    """
    df = statements

    # 1. schema closures (tiny; broadcast below)
    subc = _transitive_closure(_iri_obj_triples(df, RDFS_SUBCLASS))
    subp = _transitive_closure(_iri_obj_triples(df, RDFS_SUBPROP))
    dom = _iri_obj_triples(df, RDFS_DOMAIN)
    rng = _iri_obj_triples(df, RDFS_RANGE)
    # OWL-subset schema (RuleOwlInverseOf / SymmetricProperty /
    # TransitiveProperty — bigdata-rdf/.../rules/RuleOwl*.java)
    inv = _iri_obj_triples(df, OWL_INVERSE)

    def _typed_props(cls: str) -> DataFrame:
        return (
            df.where((F.col("p") == RDF_TYPE) & (F.col("o_kind") == KIND_IRI) & (F.col("o_lex") == cls))
            .select("s")
            .dropDuplicates()
        )

    sym = _typed_props(OWL_SYMMETRIC)
    trans = _typed_props(OWL_TRANSITIVE)

    out = df
    # schema-closure triples themselves (rdfs5 / rdfs11 results)
    out = _append_new(out, _mk_triples(subc, s="s", p=RDFS_SUBCLASS, o="o"))
    out = _append_new(out, _mk_triples(subp, s="s", p=RDFS_SUBPROP, o="o"))

    for _ in range(max_rounds):
        cur = out
        fresh = []

        # rdfs7: (x P y), (P subPropertyOf Q) → (x Q y)
        j = cur.join(F.broadcast(subp.withColumnRenamed("s", "p")), "p")
        fresh.append(
            j.select(
                F.col("g"), F.col("s"), F.col("o").alias("p"),
                *[F.col(c) for c in cur.columns if c.startswith("o_")],
                F.lit(STYPE_INFERRED).cast("tinyint").alias("stype"),
            ).select(*cur.columns)
        )

        # rdfs9: (x type C), (C subClassOf D) → (x type D)
        types = cur.where((F.col("p") == RDF_TYPE) & (F.col("o_kind") == KIND_IRI))
        j = types.join(F.broadcast(subc.withColumnRenamed("s", "o_lex")), "o_lex")
        fresh.append(_mk_triples(j, s="s", p=RDF_TYPE, o="o"))

        # rdfs2: (x P y), (P domain C) → (x type C)
        j = cur.join(F.broadcast(dom.withColumnRenamed("s", "p")), "p")
        fresh.append(_mk_triples(j, s="s", p=RDF_TYPE, o="o"))

        # owl:inverseOf (RuleOwlInverseOf): (x P y), (P inverseOf Q),
        # y resource → (y Q x); plus symmetric properties (RuleOwl
        # SymmetricProperty) as self-inverse
        if with_owl:
            inv2 = inv.unionByName(inv.select(F.col("o").alias("s"), F.col("s").alias("o")))
            sym2 = sym.select(F.col("s"), F.col("s").alias("o"))
            inv_all = inv2.unionByName(sym2).dropDuplicates()
            j = (
                cur.where(F.col("o_kind") != 2)
                .join(F.broadcast(inv_all.withColumnRenamed("s", "p")), "p")
                .select(
                    F.when(F.col("o_kind") == 1, F.concat(F.lit("_:"), F.col("o_lex")))
                    .otherwise(F.col("o_lex")).alias("ns"),
                    F.col("o").alias("np"),
                    F.col("s").alias("no"),
                )
            )
            fresh.append(_mk_triples(j, s="ns", p=F.col("np"), o="no"))

            # owl:TransitiveProperty (RuleOwlTransitiveProperty):
            # (x P y), (y P z), P transitive → (x P z)
            tp = cur.join(F.broadcast(trans.withColumnRenamed("s", "p")), "p").where(F.col("o_kind") != 2)
            l = tp.select(
                F.col("s").alias("x"), F.col("p"),
                F.when(F.col("o_kind") == 1, F.concat(F.lit("_:"), F.col("o_lex"))).otherwise(F.col("o_lex")).alias("y"),
            )
            r = tp.select(
                F.col("s").alias("y"), F.col("p").alias("p2"),
                F.col("o_lex").alias("z"),
            )
            step = l.join(r, (l["y"] == r["y"]) & (l["p"] == r["p2"])).select("x", "p", "z")
            fresh.append(_mk_triples(step, s="x", p=F.col("p"), o="z"))

            # owl:sameAs (RuleOwlSameAs1/1b/2/3).  The reference
            # backchains sameAs (inf/BackchainAccessPath.java); its
            # FullClosure forward-chains it — we forward-chain, which
            # is the batch-friendly choice.
            sa = _resource_obj_triples(cur, OWL_SAMEAS)
            if not sa.isEmpty():
                eq = _equiv_pairs(sa)
                # sameAs1: the closed sameAs triples themselves
                fresh.append(_mk_triples(eq, s="s", p=OWL_SAMEAS, o="o"))
                # rename to break self-join lineage ambiguity with cur
                eqr = F.broadcast(
                    eq.select(F.col("s").alias("__eq_s"), F.col("o").alias("__eq_o"))
                )
                not_sa = cur.where(F.col("p") != OWL_SAMEAS)
                # sameAs2: (x P z), (x sameAs y) → (y P z) — object
                # struct carried through unchanged
                j2 = not_sa.join(eqr, not_sa["s"] == eqr["__eq_s"])
                fresh.append(
                    j2.select(
                        F.col("g"), F.col("__eq_o").alias("s"), F.col("p"),
                        *[F.col(c) for c in cur.columns if c.startswith("o_")],
                        F.lit(STYPE_INFERRED).cast("tinyint").alias("stype"),
                    ).select(*cur.columns)
                )
                # sameAs3: (x P y), (y sameAs z) → (x P z) for resource
                # objects; replacement may itself be a bnode (_:label)
                res = not_sa.where(F.col("o_kind") != 2).select(
                    "s", "p",
                    F.when(F.col("o_kind") == 1, F.concat(F.lit("_:"), F.col("o_lex")))
                    .otherwise(F.col("o_lex"))
                    .alias("oy"),
                )
                j3 = res.join(eqr, res["oy"] == eqr["__eq_s"]).select(
                    F.col("s"), F.col("p"), F.col("__eq_o").alias("oz")
                )
                fresh.append(
                    j3.select(
                        F.lit(None).cast("string").alias("g"),
                        F.col("s"), F.col("p"),
                        F.when(F.col("oz").startswith("_:"), F.lit(1))
                        .otherwise(F.lit(0)).cast("tinyint").alias("o_kind"),
                        F.when(F.col("oz").startswith("_:"), F.expr("substring(oz, 3)"))
                        .otherwise(F.col("oz")).alias("o_lex"),
                        F.lit(None).cast("string").alias("o_dt"),
                        F.lit(None).cast("string").alias("o_lang"),
                        F.lit(None).cast("decimal(38,18)").alias("o_num"),
                        F.lit(None).cast("double").alias("o_dbl"),
                        F.lit(None).cast("timestamp").alias("o_dtm"),
                        F.lit(None).cast("boolean").alias("o_bool"),
                        F.lit(STYPE_INFERRED).cast("tinyint").alias("stype"),
                    ).select(*cur.columns)
                )

        # rdfs3: (x P y), (P range C), y is IRI/bnode → (y type C)
        j = (
            cur.where(F.col("o_kind") != 2)
            .join(F.broadcast(rng.withColumnRenamed("s", "p")), "p")
            .select(
                # bnode objects carry a bare label; subjects use "_:label"
                F.when(F.col("o_kind") == 1, F.concat(F.lit("_:"), F.col("o_lex")))
                .otherwise(F.col("o_lex")).alias("y"),
                F.col("o").alias("cls"),
            )
        )
        fresh.append(_mk_triples(j, s="y", p=RDF_TYPE, o="cls"))

        cand = fresh[0]
        for d in fresh[1:]:
            cand = cand.unionByName(d)
        new = _anti_new(cand, out)
        if new.isEmpty():
            break
        out = out.unionByName(new).localCheckpoint(eager=True)
    return out


_STMT_KEYS = ["g", "s", "p", "o_kind", "o_lex", "o_dt", "o_lang"]


def _anti_new(cand: DataFrame, base: DataFrame) -> DataFrame:
    """Candidate statements not already in base — null-safe on the
    nullable key columns (g / o_dt / o_lang)."""
    cand = cand.dropDuplicates(_STMT_KEYS)
    b = base.select(*[F.col(k).alias(f"__b_{k}") for k in _STMT_KEYS]).dropDuplicates()
    cond = None
    for k in _STMT_KEYS:
        c = cand[k].eqNullSafe(b[f"__b_{k}"])
        cond = c if cond is None else (cond & c)
    return cand.join(b, cond, "left_anti")


def _append_new(base: DataFrame, cand: DataFrame) -> DataFrame:
    return base.unionByName(_anti_new(cand, base))
