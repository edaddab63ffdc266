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
    Term,
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
OWL_EQ_CLASS = OWL + "equivalentClass"
OWL_EQ_PROP = OWL + "equivalentProperty"
OWL_FUNCTIONAL = OWL + "FunctionalProperty"
OWL_INV_FUNCTIONAL = OWL + "InverseFunctionalProperty"
OWL_RESTRICTION = OWL + "Restriction"
OWL_ONPROP = OWL + "onProperty"
OWL_HASVALUE = OWL + "hasValue"

_RDF_NS = RDF_TYPE[: -len("type")]
RDF_PROPERTY = _RDF_NS + "Property"
RDFS_CLASS = RDFS + "Class"
RDFS_RESOURCE = RDFS + "Resource"
RDFS_LITERAL = RDFS + "Literal"
RDFS_MEMBER = RDFS + "member"
RDFS_CMP = RDFS + "ContainerMembershipProperty"
RDFS_DATATYPE = RDFS + "Datatype"


def _iri_obj_triples(df: DataFrame, p: str) -> DataFrame:
    """Schema triples (s, o_lex) for a predicate with IRI objects."""
    return (
        df.where((F.col("p") == p) & (F.col("o_kind") == KIND_IRI))
        .select(F.col("s"), F.col("o_lex").alias("o"))
        .dropDuplicates()
    )


def _null_cols() -> list:
    """Cached constant columns shared by every inferred-triple builder
    (each rule plan is rebuilt every round — ~20 builders × rounds —
    so the constant fragments dominate py4j traffic without this)."""
    from bigdata_old_spark.model import cached_col

    mk = lambda name, typ: cached_col(  # noqa: E731
        ("inf_null", name), lambda: F.lit(None).cast(typ).alias(name)
    )
    return [
        mk("o_dt", "string"), mk("o_lang", "string"),
        mk("o_num", "decimal(38,18)"), mk("o_dbl", "double"),
        mk("o_dtm", "timestamp"), mk("o_bool", "boolean"),
    ]


def _g_stype_cols() -> tuple:
    from bigdata_old_spark.model import cached_col

    g = cached_col(("inf_null", "g"), lambda: F.lit(None).cast("string").alias("g"))
    st = cached_col(("inf_const", "stype"), lambda: F.lit(STYPE_INFERRED).cast("tinyint").alias("stype"))
    return g, st


def _mk_triples(df: DataFrame, s="s", p=None, o=None) -> DataFrame:
    """Build inferred statements rows: object is always an IRI here
    (the closure rules only derive IRI-object triples).  ``p`` and ``o``
    may be column names or Columns."""
    from bigdata_old_spark.model import cached_col

    g, stype = _g_stype_cols()
    okind = cached_col(("inf_const", "o_kind_iri"), lambda: F.lit(KIND_IRI).cast("tinyint").alias("o_kind"))
    return df.select(
        g,
        F.col(s).alias("s"),
        (F.lit(p) if isinstance(p, str) else p).cast("string").alias("p"),
        okind,
        (F.col(o) if isinstance(o, str) else o).alias("o_lex"),
        *_null_cols(),
        stype,
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
        # checkpoint the delta BEFORE the emptiness probe so the join is
        # evaluated once per round, not once for the probe and again for
        # the union
        new = step.join(result, ["s", "o"], "left_anti").localCheckpoint(eager=True)
        if new.isEmpty():
            return result
        result = result.unionByName(new).localCheckpoint(eager=True)


def _flip(rel: DataFrame) -> DataFrame:
    return rel.select(F.col("o").alias("s"), F.col("s").alias("o"))


def _mk_triples_flat_obj(df: DataFrame, s="s", p=None, o="o",
                         g: str | None = None) -> DataFrame:
    """Inferred statements whose object arrives as a flat resource
    string ("_:label" or IRI) — splits the bnode prefix back out.
    ``g`` names a column to carry the source row's graph (sameAs
    replication is graph-local — see the sameAs3 rule); default NULL
    (inferences live in the default graph)."""
    oc = F.col(o)
    gc, stype = _g_stype_cols()
    if g is not None:
        gc = F.col(g).alias("g")
    return df.select(
        gc,
        F.col(s).alias("s"),
        (F.lit(p) if isinstance(p, str) else p).cast("string").alias("p"),
        F.when(oc.startswith("_:"), F.lit(1)).otherwise(F.lit(KIND_IRI)).cast("tinyint").alias("o_kind"),
        F.when(oc.startswith("_:"), F.expr(f"substring({o}, 3)")).otherwise(oc).alias("o_lex"),
        *_null_cols(),
        stype,
    )


def _obj_flat() -> F.Column:
    return (
        F.when(F.col("o_kind") == 1, F.concat(F.lit("_:"), F.col("o_lex")))
        .otherwise(F.col("o_lex"))
    )


def rdfs_closure(
    statements: DataFrame,
    max_rounds: int = 50,
    with_owl: bool = True,
    forward_chain_rdfs4: bool = False,
    sameas: str = "materialize",
    sameas_pair_limit: int | None = 10_000_000,
) -> DataFrame:
    """Compute the RDFS(+OWL subset) closure; returns statements ∪ inferred.

    Rules (reference rule classes in bigdata-rdf/.../rules/, run as the
    FullClosure.java:17 program):
      rdf1    (P used as predicate → P a rdf:Property)  RuleRdf01.java
      rdfs2   (domain typing)                RuleRdfs02.java
      rdfs3   (range typing)                 RuleRdfs03.java
      rdfs4a/4b (everything a rdfs:Resource) RuleRdfs04a/b.java — OFF by
              default, matching the reference's
              InferenceEngine.Options.FORWARD_CHAIN_RDF_TYPE_RDFS_RESOURCE
              default "false" (those entailments are backchained there);
              enable with forward_chain_rdfs4=True
      rdfs5   (subPropertyOf transitivity)   RuleRdfs05.java
      rdfs6   (Property → reflexive subPropertyOf)  RuleRdfs06.java
      rdfs7   (property inheritance)         RuleRdfs07.java
      rdfs8   (Class ⊑ rdfs:Resource)        RuleRdfs08.java
      rdfs9   (type inheritance)             RuleRdfs09.java
      rdfs10  (Class → reflexive subClassOf) RuleRdfs10.java
      rdfs11  (subClassOf transitivity)      RuleRdfs11.java
      rdfs12  (ContainerMembershipProperty ⊑ rdfs:member)  RuleRdfs12.java
      rdfs13  (Datatype ⊑ rdfs:Literal)      RuleRdfs13.java
    OWL subset (with_owl=True): inverseOf, SymmetricProperty,
    TransitiveProperty, sameAs1/1b/2/3, equivalentClass,
    equivalentProperty, FunctionalProperty, InverseFunctionalProperty
    (RuleOwl*.java).

    FastClosure's insight (FastClosure.java:28) is kept: the schema
    closures (sub-class/property hierarchies) are tiny — they are
    recomputed at the top of each round (new schema triples from
    rdfs6/8/10/12/13 and the equivalence rules must feed the instance
    rules) and broadcast into the instance-level joins.

    ``sameas`` selects the owl:sameAs strategy:
      * "materialize" (default) — forward-chain the full pair closure
        and replicate statements across equivalents (RuleOwlSameAs1/1b/
        2/3 exactly).  O(Σ clique²) output — correct and convenient at
        moderate clique sizes.
      * "canonical" — the scale-safe shape: per-clique canonical ids
        (CC over the sameAs graph), statements rewritten to canonicals,
        the mapping stored as linear member↔canonical sameAs triples;
        :func:`expand_sameas` recovers the materialized form for FINAL
        answers.  The reference backchains sameAs at access-path time
        for the same reason (inf/BackchainAccessPath.java).
      * "off" — skip the sameAs rules entirely (internal: the canonical
        driver loop runs the rule program in this mode).

    ``sameas_pair_limit`` guards the materialize default against the
    crawl-scale blow-up it cannot survive: when the INPUT's sameAs
    cliques would materialize more than this many pairs (Σ clique² from
    the CC sizes — one cheap agg, probed only when sameAs triples
    exist), the call raises with a pointer to sameas="canonical"
    instead of silently launching an O(10¹⁰)-row job.  None disables
    the guard.  Cliques minted MID-closure by the Functional/
    InverseFunctionalProperty rules are not re-checked — the guard is
    an input-size gate, not a running invariant.
    """
    if sameas == "canonical":
        out, _ = canonical_closure_with_map(
            statements, max_rounds=max_rounds, with_owl=with_owl,
            forward_chain_rdfs4=forward_chain_rdfs4,
        )
        return out
    if sameas not in ("materialize", "off"):
        raise ValueError(f"unknown sameas mode: {sameas!r}")
    global FULL_CLOSURE_RUNS
    FULL_CLOSURE_RUNS += 1
    out = statements

    if with_owl:
        # One cheap probe: if no OWL-namespace term occurs anywhere (as
        # predicate or IRI object), the OWL rules can never fire — and
        # the RDFS rules cannot introduce owl:* terms that are not
        # already present — so the whole OWL branch set (~15 rule plans
        # per round) is skipped.  The reference sizes its rule program
        # the same way (BaseClosure assembles only the enabled rules).
        with_owl = (
            statements.where(
                F.col("p").startswith(OWL)
                | ((F.col("o_kind") == KIND_IRI) & F.col("o_lex").startswith(OWL))
            )
            .limit(1)
            .count()
            > 0
        )

    if sameas == "materialize" and with_owl and sameas_pair_limit is not None:
        has_sameas = (
            statements.where(
                (F.col("p") == OWL_SAMEAS) & (F.col("o_kind") != 2)
            ).limit(1).count() > 0
        )
        if has_sameas:
            mass = (
                _sameas_cliques(statements)
                .groupBy("cls").count()
                .agg(F.sum(F.col("count") * F.col("count")).alias("m"))
                .collect()[0]["m"]
            )
            if mass is not None and mass > sameas_pair_limit:
                raise ValueError(
                    f"owl:sameAs cliques would materialize ~{mass:,} "
                    f"replicated pairs (> sameas_pair_limit="
                    f"{sameas_pair_limit:,}); use sameas='canonical' "
                    "(linear member↔canonical mapping, query-"
                    "transparent via the access-path backchain) or "
                    "raise/disable sameas_pair_limit"
                )

    for _ in range(max_rounds):
        cur = out
        fresh = []

        # -- schema closures (tiny; broadcast below) ----------------------
        subc_in = _iri_obj_triples(cur, RDFS_SUBCLASS)
        subp_in = _iri_obj_triples(cur, RDFS_SUBPROP)
        if with_owl:
            # owl:equivalentClass/equivalentProperty ⇒ mutual sub-
            # sumption (RuleOwlEquivalentClass/Property.java); the
            # flipped equivalence triples are also entailed
            eqc = _iri_obj_triples(cur, OWL_EQ_CLASS)
            eqp = _iri_obj_triples(cur, OWL_EQ_PROP)
            subc_in = subc_in.unionByName(eqc).unionByName(_flip(eqc)).dropDuplicates()
            subp_in = subp_in.unionByName(eqp).unionByName(_flip(eqp)).dropDuplicates()
            fresh.append(_mk_triples(_flip(eqc), s="s", p=OWL_EQ_CLASS, o="o"))
            fresh.append(_mk_triples(_flip(eqp), s="s", p=OWL_EQ_PROP, o="o"))
        subc = _transitive_closure(subc_in)
        subp = _transitive_closure(subp_in)
        dom = _iri_obj_triples(cur, RDFS_DOMAIN)
        rng = _iri_obj_triples(cur, RDFS_RANGE)
        inv = _iri_obj_triples(cur, OWL_INVERSE)

        def _typed_props(cls: str, _cur=cur) -> DataFrame:
            return (
                _cur.where((F.col("p") == RDF_TYPE) & (F.col("o_kind") == KIND_IRI) & (F.col("o_lex") == cls))
                .select("s")
                .dropDuplicates()
            )

        # schema-closure triples themselves (rdfs5 / rdfs11 results)
        fresh.append(_mk_triples(subc, s="s", p=RDFS_SUBCLASS, o="o"))
        fresh.append(_mk_triples(subp, s="s", p=RDFS_SUBPROP, o="o"))

        # rdf1: (x P y) → (P a rdf:Property)
        props = cur.select(F.col("p").alias("s")).dropDuplicates()
        fresh.append(_mk_triples(props, s="s", p=RDF_TYPE, o=F.lit(RDF_PROPERTY)))

        # rdfs6: (u a rdf:Property) → (u subPropertyOf u)
        prop_t = _typed_props(RDF_PROPERTY)
        fresh.append(_mk_triples(prop_t, s="s", p=RDFS_SUBPROP, o=F.col("s")))
        # rdfs8 + rdfs10: (u a rdfs:Class) → (u ⊑ rdfs:Resource), (u ⊑ u)
        cls_t = _typed_props(RDFS_CLASS)
        fresh.append(_mk_triples(cls_t, s="s", p=RDFS_SUBCLASS, o=F.lit(RDFS_RESOURCE)))
        fresh.append(_mk_triples(cls_t, s="s", p=RDFS_SUBCLASS, o=F.col("s")))
        # rdfs12: (u a rdfs:ContainerMembershipProperty) → (u ⊑p rdfs:member)
        fresh.append(_mk_triples(_typed_props(RDFS_CMP), s="s", p=RDFS_SUBPROP, o=F.lit(RDFS_MEMBER)))
        # rdfs13: (u a rdfs:Datatype) → (u ⊑ rdfs:Literal)
        fresh.append(_mk_triples(_typed_props(RDFS_DATATYPE), s="s", p=RDFS_SUBCLASS, o=F.lit(RDFS_LITERAL)))

        if forward_chain_rdfs4:
            # rdfs4a: (u P x) → (u a rdfs:Resource);
            # rdfs4b: (u P v), v resource → (v a rdfs:Resource)
            subs = cur.select(F.col("s")).dropDuplicates()
            fresh.append(_mk_triples(subs, s="s", p=RDF_TYPE, o=F.lit(RDFS_RESOURCE)))
            objs = (
                cur.where(F.col("o_kind") != 2)
                .select(_obj_flat().alias("v"))
                .dropDuplicates()
            )
            fresh.append(_mk_triples_flat_obj(
                objs.select(F.col("v").alias("s"), F.lit(RDFS_RESOURCE).alias("o")),
                s="s", p=RDF_TYPE, o="o"))

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
            sym = _typed_props(OWL_SYMMETRIC)
            trans = _typed_props(OWL_TRANSITIVE)
            inv2 = inv.unionByName(_flip(inv))
            sym2 = sym.select(F.col("s"), F.col("s").alias("o"))
            inv_all = inv2.unionByName(sym2).dropDuplicates()
            j = (
                cur.where(F.col("o_kind") != 2)
                .join(F.broadcast(inv_all.withColumnRenamed("s", "p")), "p")
                .select(
                    _obj_flat().alias("ns"),
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
                _obj_flat().alias("y"),
            )
            r = tp.select(
                F.col("s").alias("y"), F.col("p").alias("p2"),
                F.col("o_lex").alias("z"),
            )
            step = l.join(r, (l["y"] == r["y"]) & (l["p"] == r["p2"])).select("x", "p", "z")
            fresh.append(_mk_triples(step, s="x", p=F.col("p"), o="z"))

            # owl:FunctionalProperty (RuleOwlFunctionalProperty.java:44):
            # (p a FunctionalProperty), (a p b), (a p c), b ≠ c →
            # (b sameAs c) — resource objects only (sameAs over literals
            # is outside the reference's SPO-level rule too)
            fp = _typed_props(OWL_FUNCTIONAL)
            fpt = (
                cur.where(F.col("o_kind") != 2)
                .join(F.broadcast(fp.withColumnRenamed("s", "p")), "p")
                .select("s", "p", _obj_flat().alias("b"))
            )
            pairs = (
                fpt.alias("l")
                .join(fpt.alias("r"), ["s", "p"])
                .where(F.col("l.b") != F.col("r.b"))
                .select(F.col("l.b").alias("s"), F.col("r.b").alias("o"))
                .dropDuplicates()
            )
            fresh.append(_mk_triples_flat_obj(
                pairs.select(F.col("s"), F.col("o")), s="s", p=OWL_SAMEAS, o="o"))

            # owl:InverseFunctionalProperty (RuleOwlInverseFunctional
            # Property.java): (p a IFP), (b p a), (c p a), b ≠ c →
            # (b sameAs c)
            ifp = _typed_props(OWL_INV_FUNCTIONAL)
            ift = (
                cur.join(F.broadcast(ifp.withColumnRenamed("s", "p")), "p")
                .select(F.col("s").alias("b"), "p", "o_kind", "o_lex", "o_dt", "o_lang")
            )
            ipairs = (
                ift.alias("l")
                .join(ift.alias("r"), ["p", "o_kind", "o_lex"])
                .where(
                    F.col("l.b") != F.col("r.b"))
                .where(F.col("l.o_dt").eqNullSafe(F.col("r.o_dt"))
                       & F.col("l.o_lang").eqNullSafe(F.col("r.o_lang")))
                .select(F.col("l.b").alias("s"), F.col("r.b").alias("o"))
                .dropDuplicates()
            )
            fresh.append(_mk_triples_flat_obj(
                ipairs.select(F.col("s"), F.col("o")), s="s", p=OWL_SAMEAS, o="o"))

            # owl:hasValue (RuleOwlHasValue.java:36): (x type a),
            # (a type owl:Restriction), (a owl:onProperty p),
            # (a owl:hasValue v) → (x p v).  The restriction node a is
            # typically a bnode; v may be any value (incl. literals),
            # so the hasValue object struct is carried through whole.
            restr = _typed_props(OWL_RESTRICTION).withColumnRenamed("s", "a")
            onp = _iri_obj_triples(cur, OWL_ONPROP).select(
                F.col("s").alias("a"), F.col("o").alias("__hv_p")
            )
            hv = (
                cur.where(F.col("p") == OWL_HASVALUE)
                .select(F.col("s").alias("a"), *[F.col(c) for c in cur.columns if c.startswith("o_")])
                .dropDuplicates(["a", "o_kind", "o_lex", "o_dt", "o_lang"])
            )
            hv_schema = restr.join(onp, "a").join(hv, "a")
            hv_inst = (
                cur.where((F.col("p") == RDF_TYPE) & (F.col("o_kind") != 2))
                .select(F.col("s").alias("__hv_x"), _obj_flat().alias("a"))
            )
            ghv, sthv = _g_stype_cols()
            jhv = hv_inst.join(F.broadcast(hv_schema), "a")
            fresh.append(
                jhv.select(
                    ghv, F.col("__hv_x").alias("s"),
                    F.col("__hv_p").cast("string").alias("p"),
                    *[F.col(c) for c in cur.columns if c.startswith("o_")],
                    sthv,
                ).select(*cur.columns)
            )

            # owl:sameAs (RuleOwlSameAs1/1b/2/3).  The reference
            # backchains sameAs (inf/BackchainAccessPath.java); its
            # FullClosure forward-chains it — we forward-chain here
            # (materialize mode); sameas="canonical" routes around this
            # block through _canonical_closure instead.
            sa = _resource_obj_triples(cur, OWL_SAMEAS) if sameas == "materialize" \
                else None
            if sa is not None and not sa.isEmpty():
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
                # objects; replacement may itself be a bnode (_:label).
                # g carried through like sameAs2's — sameAs replication
                # is GRAPH-LOCAL (a graph asserting x P y sees its own
                # replicated forms), which is also what the canonical
                # mode's in-place rewrite preserves, so canonical ≡
                # materialized holds inside GRAPH scopes
                res = not_sa.where(F.col("o_kind") != 2).select(
                    "g", "s", "p",
                    _obj_flat().alias("oy"),
                )
                j3 = res.join(eqr, res["oy"] == eqr["__eq_s"]).select(
                    F.col("g"), F.col("s"), F.col("p"),
                    F.col("__eq_o").alias("oz")
                )
                fresh.append(_mk_triples_flat_obj(j3, s="s", p=F.col("p"),
                                                  o="oz", g="g"))

        # rdfs3: (x P y), (P range C), y is IRI/bnode → (y type C)
        j = (
            cur.where(F.col("o_kind") != 2)
            .join(F.broadcast(rng.withColumnRenamed("s", "p")), "p")
            .select(
                # bnode objects carry a bare label; subjects use "_:label"
                _obj_flat().alias("y"),
                F.col("o").alias("cls"),
            )
        )
        fresh.append(_mk_triples(j, s="y", p=RDF_TYPE, o="cls"))

        cand = fresh[0]
        for d in fresh[1:]:
            cand = cand.unionByName(d)
        # checkpoint first: the whole rule program runs ONCE per round
        # (the emptiness probe then reads the checkpointed delta)
        new = _anti_new(cand, out).localCheckpoint(eager=True)
        if new.isEmpty():
            break
        out = out.unionByName(new).localCheckpoint(eager=True)
    return out


_STMT_KEYS = ["g", "s", "p", "o_kind", "o_lex", "o_dt", "o_lang"]

# instrumentation: tests assert the TM add path is DELTA-driven (no
# full re-closure) by watching these counters
FULL_CLOSURE_RUNS = 0
INCREMENTAL_RUNS = 0
RETRACTION_RUNS = 0

#: retraction re-derivation: hole-term sets at or below this size ship
#: as an InSet literal filter (one scan); larger sets use broadcast
#: semi-joins
_TERM_INSET_CAP = 8192


class NeedsFullClosure(Exception):
    """Raised by incremental_closure when the delta cannot be closed
    incrementally (it touches schema vocabulary, or fires a sameAs-
    generating rule) — caller falls back to rdfs_closure."""


# Predicates whose presence in a delta changes the RULE PROGRAM itself
# (schema relations are precomputed from the closed base in the
# incremental path, so a delta may not alter them).
_SCHEMA_PREDS = (
    RDFS_SUBCLASS, RDFS_SUBPROP, RDFS_DOMAIN, RDFS_RANGE,
    OWL_INVERSE, OWL_EQ_CLASS, OWL_EQ_PROP, OWL_ONPROP, OWL_HASVALUE,
    OWL_SAMEAS,
)
# rdf:type objects that make a statement schema-level.  rdf:Property is
# deliberately absent: (u a rdf:Property) only yields the reflexive
# (u ⊑p u), which the incremental rules emit directly.
_SCHEMA_CLASSES = (
    OWL_TRANSITIVE, OWL_SYMMETRIC, OWL_FUNCTIONAL, OWL_INV_FUNCTIONAL,
    OWL_RESTRICTION, RDFS_CLASS, RDFS_CMP, RDFS_DATATYPE,
)


# ---------------------------------------------------------------------------
# Canonical-representative owl:sameAs — the scale path.  The reference
# backchains sameAs at access-path time (inf/BackchainAccessPath.java)
# precisely because materializing the pair closure is O(Σ clique²): one
# dirty-crawl clique of 10⁵ members is 10¹⁰ pairs.  Here the closure
# stores per-clique canonical ids + a LINEAR member↔canonical mapping;
# :func:`expand_sameas` recovers the fully-materialized form for final
# query answers only.
# ---------------------------------------------------------------------------


def _sameas_cliques(statements: DataFrame) -> DataFrame:
    """(term, cls) clique membership over the non-self sameAs pairs in
    ``statements``; cls = min member id (distributed CC over the sameAs
    graph — min-label propagation, so clique DIAMETER bounds the round
    count; crawl-data cliques are shallow)."""
    from bigdata_old_spark.analytics import connected_components

    sa = _resource_obj_triples(statements, OWL_SAMEAS).where(F.col("s") != F.col("o"))
    comp = connected_components(
        sa.select(F.col("s").alias("src"), F.col("o").alias("dst")))
    return comp.select(F.col("v").alias("term"), F.col("component").alias("cls"))


def sameas_canonical_map(statements: DataFrame) -> DataFrame:
    """(member, canon) for every non-canonical member of a SAFE sameAs
    clique; canon = min member.  LINEAR in clique size.

    A clique is UNSAFE (excluded here; it keeps the exact materialized
    RuleOwlSameAs semantics in the closure) when any member is
    schema-positioned: used as a predicate anywhere, or as subject /
    resource object of a schema-predicate triple, or typed as a schema
    class.  Predicates are never rewritten by canonicalization, so
    rewriting such terms would desynchronize the rule-program joins;
    the rare property/class cliques stay on the legacy path while the
    instance cliques — the ones that explode at crawl scale — get the
    canonical treatment."""
    mem = _sameas_cliques(statements)
    schema_rows = statements.where(
        F.col("p").isin(*[p for p in _SCHEMA_PREDS if p != OWL_SAMEAS])
        | ((F.col("p") == RDF_TYPE) & (F.col("o_kind") == KIND_IRI)
           & F.col("o_lex").isin(*_SCHEMA_CLASSES))
    )
    schema_terms = (
        statements.select(F.col("p").alias("t"))
        .unionByName(schema_rows.select(F.col("s").alias("t")))
        .unionByName(
            schema_rows.where(F.col("o_kind") != 2).select(_obj_flat().alias("t")))
        .dropDuplicates()
    )
    unsafe_cls = (
        mem.join(schema_terms, mem["term"] == schema_terms["t"], "left_semi")
        .select("cls").dropDuplicates().withColumnRenamed("cls", "__uc")
    )
    safe = mem.join(unsafe_cls, mem["cls"] == F.col("__uc"), "left_anti")
    return safe.where(F.col("term") != F.col("cls")).select(
        F.col("term").alias("member"), F.col("cls").alias("canon"))


def _canonicalize(statements: DataFrame, canon: DataFrame) -> DataFrame:
    """Rewrite subjects and resource objects through (member → canon).
    sameAs pairs whose two ends land on the same canonical become
    self-pairs and are dropped (the mapping carries them); rewritten
    rows are tagged INFERRED, and when an explicit row collides with a
    rewrite of another row the strongest provenance tag (min stype)
    wins."""
    cs = canon.select(F.col("member").alias("__cm_s"), F.col("canon").alias("__cn_s"))
    co = canon.select(F.col("member").alias("__cm_o"), F.col("canon").alias("__cn_o"))
    df = (
        statements
        .join(cs, statements["s"] == cs["__cm_s"], "left")
        .join(co, (F.col("o_kind") != 2) & (_obj_flat() == co["__cm_o"]), "left")
    )
    new_o = F.col("__cn_o")
    changed = F.col("__cn_s").isNotNull() | new_o.isNotNull()
    keep = {
        c: F.col(c)
        for c in statements.columns
        if c not in ("s", "o_kind", "o_lex", "stype")
    }
    df = df.select(
        keep["g"],
        F.coalesce(F.col("__cn_s"), F.col("s")).alias("s"),
        keep["p"],
        F.when(
            new_o.isNotNull(),
            F.when(new_o.startswith("_:"), F.lit(1)).otherwise(F.lit(KIND_IRI)),
        ).otherwise(F.col("o_kind")).cast("tinyint").alias("o_kind"),
        F.when(
            new_o.isNotNull(),
            F.when(new_o.startswith("_:"),
                   new_o.substr(F.lit(3), F.length(new_o))).otherwise(new_o),
        ).otherwise(F.col("o_lex")).alias("o_lex"),
        keep["o_dt"], keep["o_lang"], keep["o_num"], keep["o_dbl"],
        keep["o_dtm"], keep["o_bool"],
        F.when(changed, F.lit(STYPE_INFERRED)).otherwise(F.col("stype"))
        .cast("tinyint").alias("stype"),
    )
    df = df.where(
        ~((F.col("p") == OWL_SAMEAS) & (F.col("o_kind") != 2)
          & (_obj_flat() == F.col("s")))
    )
    non_stype = [c for c in statements.columns if c != "stype"]
    return (
        df.groupBy(*non_stype)
        .agg(F.min("stype").cast("tinyint").alias("stype"))
        .select(*statements.columns)
    )


def _compose_canon(old: DataFrame, new: DataFrame) -> DataFrame:
    """Compose two (member → canon) maps: ``new`` operates on ids that
    are canonical under ``old`` (the closure canonicalizes between
    rounds), so old targets are forwarded through new and new members
    not seen by old are appended."""
    n2 = new.select(F.col("member").alias("__nm"), F.col("canon").alias("__nc"))
    fwd = old.join(n2, old["canon"] == F.col("__nm"), "left").select(
        F.col("member"), F.coalesce(F.col("__nc"), F.col("canon")).alias("canon"))
    fresh = new.join(old.select(F.col("member").alias("__om")),
                     new["member"] == F.col("__om"), "left_anti")
    return fwd.unionByName(fresh.select("member", "canon")).dropDuplicates()


def canonical_closure_with_map(
    statements: DataFrame,
    max_rounds: int = 50,
    with_owl: bool = True,
    forward_chain_rdfs4: bool = False,
    sameas_pair_limit: int | None = None,
) -> tuple[DataFrame, DataFrame | None]:
    """rdfs_closure with sameas="canonical": alternate (canonicalize
    safe cliques → run the rule program with the sameAs block off) until
    no new safe pairs appear (Functional/InverseFunctionalProperty rules
    can mint sameAs mid-closure), then append the linear member↔canon
    mapping triples.  Unsafe (schema-positioned) cliques keep their
    sameAs triples and are materialized exactly by the inner program.

    Returns (closed statements, member→canon mapping) — the mapping is
    None when no safe clique existed (the closure fell back to plain
    materialization).  TripleStore.closure seeds its backchain cache
    from the mapping so the first query pays no CC recompute.

    ``sameas_pair_limit`` defaults to None HERE (unlike rdfs_closure's
    materialize default): the caller already chose the canonical path,
    and whatever the inner rounds materialize is exactly the unsafe
    (schema-positioned) remainder that canonical mode cannot compress —
    raising "use sameas='canonical'" at them would be circular advice."""
    if max_rounds < 1:
        raise ValueError(f"max_rounds must be >= 1, got {max_rounds}")
    cur = statements
    mapping: DataFrame | None = None
    for _ in range(max_rounds):
        canon = sameas_canonical_map(cur).localCheckpoint(eager=True)
        if canon.isEmpty():
            if mapping is None:
                # no safe clique anywhere: plain materialized closure
                return rdfs_closure(
                    cur, max_rounds=max_rounds, with_owl=with_owl,
                    forward_chain_rdfs4=forward_chain_rdfs4,
                    sameas_pair_limit=sameas_pair_limit), None
            # cur is already the fixpoint of the previous inner run and
            # produced no new safe pairs — done
            break
        mapping = canon if mapping is None else \
            _compose_canon(mapping, canon).localCheckpoint(eager=True)
        cur = _canonicalize(cur, canon)
        cur = rdfs_closure(
            cur, max_rounds=max_rounds, with_owl=with_owl,
            forward_chain_rdfs4=forward_chain_rdfs4, sameas="materialize",
            sameas_pair_limit=sameas_pair_limit)
    pairs = mapping
    sa_fwd = _mk_triples_flat_obj(
        pairs.select(F.col("member").alias("s"), F.col("canon").alias("o")),
        s="s", p=OWL_SAMEAS, o="o")
    sa_bwd = _mk_triples_flat_obj(
        pairs.select(F.col("canon").alias("s"), F.col("member").alias("o")),
        s="s", p=OWL_SAMEAS, o="o")
    extra = _anti_new(sa_fwd.unionByName(sa_bwd), cur)
    out = cur.unionByName(extra.select(*cur.columns))
    # one final rule pass with the sameAs block OFF: the mapping triples
    # were appended after the program ran, so their vocabulary facts
    # (rdf1: owl:sameAs a rdf:Property; rdfs6 reflexive ⊑p) are derived
    # here without re-materializing any pairs
    return rdfs_closure(
        out, max_rounds=max_rounds, with_owl=with_owl,
        forward_chain_rdfs4=forward_chain_rdfs4, sameas="off"), mapping


def expand_sameas_bindings(
    result: DataFrame,
    statements: DataFrame,
    cols: list[str] | None = None,
    mem: DataFrame | None = None,
) -> DataFrame:
    """Replicate SELECT bindings across the sameAs cliques of
    ``statements``: each resource-valued binding in ``cols`` (default:
    every term-struct column) becomes one row per clique member — the
    answer-side half of the reference's query-time backchain
    (BackchainAccessPath), for results computed over a
    sameas="canonical" closure.  Literal bindings and resources in no
    clique pass through unchanged.  Returns DISTINCT rows (set
    semantics — replication across members makes bag multiplicities
    ill-defined).  Cost is the per-answer clique fan-out —
    O(|answers| · clique), never corpus-sized.  ``mem`` takes a
    pre-computed (term, cls) clique-membership frame (the
    TripleStore per-store cache) to skip the CC recompute."""
    if mem is None:
        mem = _sameas_cliques(statements).localCheckpoint(eager=True)
    if mem.isEmpty():
        return result
    if cols is None:
        cols = [
            c for c, t in result.dtypes
            if t.startswith("struct") and "kind" in t and "lex" in t
        ]
    out = result
    for i, c in enumerate(cols):
        flat = F.when(
            out[c]["kind"] == 1, F.concat(F.lit("_:"), out[c]["lex"])
        ).otherwise(out[c]["lex"])
        m1 = mem.select(F.col("term").alias(f"__t{i}"), F.col("cls").alias(f"__c{i}"))
        m2 = mem.select(F.col("cls").alias(f"__c{i}"), F.col("term").alias(f"__v{i}"))
        joined = (
            out.join(m1, (out[c]["kind"] != 2) & (flat == F.col(f"__t{i}")), "left")
            .join(m2, f"__c{i}", "left")  # null cls → no fan-out row kept via left
        )
        v = F.col(f"__v{i}")
        repl = F.struct(
            F.when(v.startswith("_:"), F.lit(1)).otherwise(F.lit(KIND_IRI))
            .cast("tinyint").alias("kind"),
            F.when(v.startswith("_:"), v.substr(F.lit(3), F.length(v)))
            .otherwise(v).alias("lex"),
            F.lit(None).cast("string").alias("dt"),
            F.lit(None).cast("string").alias("lang"),
            F.lit(None).cast("decimal(38,18)").alias("num"),
            F.lit(None).cast("double").alias("dbl"),
            F.lit(None).cast("timestamp").alias("dtm"),
            F.lit(None).cast("boolean").alias("bool"),
        )
        out = joined.select(
            *[
                (F.when(v.isNotNull(), repl).otherwise(F.col(cc)).alias(cc)
                 if cc == c else F.col(cc))
                for cc in result.columns
            ]
        )
    return out.dropDuplicates()


def expand_sameas(statements: DataFrame) -> DataFrame:
    """Materialize the full sameAs replication (RuleOwlSameAs1/1b/2/3)
    over ``statements`` — the O(Σ clique²) FINAL step, meant for query
    ANSWERS or bounded slices of a canonical-mode closure, never for
    the stored corpus.  expand_sameas(rdfs_closure(S, sameas="canonical"))
    equals rdfs_closure(S) on the (s, p, o) level."""
    mem = _sameas_cliques(statements).localCheckpoint(eager=True)
    if mem.isEmpty():
        return statements
    base = statements.where(F.col("p") != OWL_SAMEAS)
    # full pair set per clique (the sameAs1 answers)
    a = mem.select(F.col("cls"), F.col("term").alias("__a"))
    b = mem.select(F.col("cls"), F.col("term").alias("__b"))
    sa_full = _mk_triples_flat_obj(
        a.join(b, "cls").where(F.col("__a") != F.col("__b"))
        .select(F.col("__a").alias("s"), F.col("__b").alias("o")),
        s="s", p=OWL_SAMEAS, o="o")
    # subject replication: s → clique → every member
    smap = mem.select(F.col("term").alias("__st"), F.col("cls").alias("__sc"))
    svar = mem.select(F.col("cls").alias("__sc"), F.col("term").alias("__sv"))
    srep = (
        base.join(smap, base["s"] == F.col("__st"))
        .join(svar, "__sc")
        .where(F.col("__sv") != F.col("s"))
        .withColumn("s", F.col("__sv"))
        .withColumn("stype", F.lit(STYPE_INFERRED).cast("tinyint"))
        .select(*base.columns)
    )
    half = base.unionByName(srep)
    # object replication over the subject-expanded set (covers s×o combos)
    omap = mem.select(F.col("term").alias("__ot"), F.col("cls").alias("__oc"))
    ovar = mem.select(F.col("cls").alias("__oc"), F.col("term").alias("__ov"))
    orep = (
        half.where(F.col("o_kind") != 2)
        .join(omap, _obj_flat() == F.col("__ot"))
        .join(ovar, "__oc")
        .where(F.col("__ov") != _obj_flat())
        .withColumn(
            "o_kind",
            F.when(F.col("__ov").startswith("_:"), F.lit(1))
            .otherwise(F.lit(KIND_IRI)).cast("tinyint"))
        .withColumn(
            "o_lex",
            F.when(F.col("__ov").startswith("_:"),
                   F.col("__ov").substr(F.lit(3), F.length(F.col("__ov"))))
            .otherwise(F.col("__ov")))
        .withColumn("stype", F.lit(STYPE_INFERRED).cast("tinyint"))
        .select(*base.columns)
    )
    out = half.unionByName(orep).unionByName(
        statements.where(F.col("p") == OWL_SAMEAS).select(*base.columns)
    ).unionByName(sa_full.select(*base.columns))
    non_stype = [c for c in statements.columns if c != "stype"]
    return (
        out.groupBy(*non_stype)
        .agg(F.min("stype").cast("tinyint").alias("stype"))
        .select(*statements.columns)
    )


# ---------------------------------------------------------------------------
# Query-transparent canonical mode: the access-path halves of the
# reference's virtual sameAs closure (inf/BackchainAccessPath.java).
# A canonical-mode store holds rewritten statements, so (a) an IRI
# constant naming a non-canonical clique member would never match a
# scan — the compiler rewrites such constants through the stored
# member→canonical mapping (TripleStore.canon_of_lex) — and (b) each
# triple-pattern scan's VARIABLE bindings fan back out to every clique
# member (expand_member_bindings) so downstream joins, FILTERs, VALUES
# and aggregates see materialized-equivalent bindings with exact bag
# semantics.  Both run per access path, exactly like the reference's
# backchained iterator — never against the stored corpus.
# ---------------------------------------------------------------------------


def _member_term_struct(v):
    """Flat member string ("_:b" or IRI) → term struct column."""
    return F.struct(
        F.when(v.startswith("_:"), F.lit(1)).otherwise(F.lit(KIND_IRI))
        .cast("tinyint").alias("kind"),
        F.when(v.startswith("_:"), v.substr(F.lit(3), F.length(v)))
        .otherwise(v).alias("lex"),
        F.lit(None).cast("string").alias("dt"),
        F.lit(None).cast("string").alias("lang"),
        F.lit(None).cast("decimal(38,18)").alias("num"),
        F.lit(None).cast("double").alias("dbl"),
        F.lit(None).cast("timestamp").alias("dtm"),
        F.lit(None).cast("boolean").alias("bool"),
    )


def expand_member_bindings(
    df: DataFrame, mem: DataFrame, cols: list
) -> DataFrame:
    """Per-access-path sameAs backchain: each resource-valued binding
    column fans out to one row per member of its clique (two left joins
    against the small (term, cls) membership map — AQE broadcasts it);
    literal bindings and resources in no clique pass through on the
    left-join null path.  ``cols`` is [(name, is_flat)]: flat
    s-position strings (or path keys — literal keys carry a control
    prefix that never matches a clique term) or o-position term
    structs.  Cost is the matched-rows fan-out, never corpus-sized."""
    for i, (c, is_flat) in enumerate(cols):
        before = df.columns
        if is_flat:
            key = F.col(c)
        else:
            key = F.when(
                F.col(c)["kind"] != 2,
                F.when(F.col(c)["kind"] == 1,
                       F.concat(F.lit("_:"), F.col(c)["lex"]))
                .otherwise(F.col(c)["lex"]))
        t_ = mem.select(F.col("term").alias(f"__bt{i}"),
                        F.col("cls").alias(f"__bk{i}"))
        v_ = mem.select(F.col("cls").alias(f"__bk{i}"),
                        F.col("term").alias(f"__bv{i}"))
        df = (df.join(t_, key == F.col(f"__bt{i}"), "left")
              .join(v_, f"__bk{i}", "left"))
        v = F.col(f"__bv{i}")
        repl = (
            F.coalesce(v, F.col(c)) if is_flat
            else F.when(v.isNotNull(), _member_term_struct(v))
            .otherwise(F.col(c))
        )
        df = df.select(
            *[(repl.alias(cc) if cc == c else F.col(cc)) for cc in before])
    return df


def _delta_touches_schema(delta: DataFrame, ignore_reflexive: bool = False) -> bool:
    pred_hit = F.col("p").isin(*_SCHEMA_PREDS)
    if ignore_reflexive:
        # reflexive ⊑ edges (P ⊑p P / C ⊑c C) are emitted by the
        # incremental rdf1/rdfs6 rules themselves and change no schema
        # join result — don't let them punt every run to full closure
        pred_hit = pred_hit & ~(
            F.col("p").isin(RDFS_SUBPROP, RDFS_SUBCLASS)
            & (F.col("o_kind") == KIND_IRI)
            & (F.col("o_lex") == F.col("s"))
        )
    return (
        delta.where(
            pred_hit
            | (
                (F.col("p") == RDF_TYPE)
                & (F.col("o_kind") == KIND_IRI)
                & F.col("o_lex").isin(*_SCHEMA_CLASSES)
            )
        )
        .limit(1)
        .count()
        > 0
    )


class _SchemaSnap:
    """One-time schema closures computed from a CLOSED store and
    broadcast into the semi-naive instance rules — shared by
    incremental_closure (additions) and retraction_closure."""

    __slots__ = (
        "with_owl", "subc", "subp", "dom", "rng", "inv_all",
        "trans_preds", "fp_preds", "eqr", "hv_schema",
    )


def _schema_snapshot(closed: DataFrame, probe_extra: DataFrame | None = None) -> _SchemaSnap:
    snap = _SchemaSnap()
    probe = closed if probe_extra is None else closed.unionByName(probe_extra)
    snap.with_owl = (
        probe.where(
            F.col("p").startswith(OWL)
            | ((F.col("o_kind") == KIND_IRI) & F.col("o_lex").startswith(OWL))
        )
        .limit(1)
        .count()
        > 0
    )
    snap.subc = _iri_obj_triples(closed, RDFS_SUBCLASS)
    snap.subp = _iri_obj_triples(closed, RDFS_SUBPROP)
    snap.dom = _iri_obj_triples(closed, RDFS_DOMAIN)
    snap.rng = _iri_obj_triples(closed, RDFS_RANGE)
    snap.eqr = snap.inv_all = snap.hv_schema = None
    snap.trans_preds = []
    snap.fp_preds = []
    if snap.with_owl:
        def _typed(cls):
            return (
                closed.where(
                    (F.col("p") == RDF_TYPE)
                    & (F.col("o_kind") == KIND_IRI)
                    & (F.col("o_lex") == cls)
                )
                .select("s")
                .dropDuplicates()
            )

        inv = _iri_obj_triples(closed, OWL_INVERSE)
        sym = _typed(OWL_SYMMETRIC)
        snap.inv_all = (
            inv.unionByName(_flip(inv))
            .unionByName(sym.select(F.col("s"), F.col("s").alias("o")))
            .dropDuplicates()
        )
        # schema-small driver-side lists (one-time, like store stats)
        snap.trans_preds = [r["s"] for r in _typed(OWL_TRANSITIVE).collect()]
        snap.fp_preds = [
            r["s"]
            for r in _typed(OWL_FUNCTIONAL)
            .unionByName(_typed(OWL_INV_FUNCTIONAL))
            .dropDuplicates()
            .collect()
        ]
        sa = _resource_obj_triples(closed, OWL_SAMEAS)
        if not sa.isEmpty():
            # closed sameAs is already the full equivalence closure
            snap.eqr = F.broadcast(
                sa.where(F.col("s") != F.col("o")).select(
                    F.col("s").alias("__eq_s"), F.col("o").alias("__eq_o")
                )
            )
        restr = _typed(OWL_RESTRICTION).withColumnRenamed("s", "a")
        onp = _iri_obj_triples(closed, OWL_ONPROP).select(
            F.col("s").alias("a"), F.col("o").alias("__hv_p")
        )
        hv = (
            closed.where(F.col("p") == OWL_HASVALUE)
            .select(F.col("s").alias("a"),
                    *[F.col(c) for c in closed.columns if c.startswith("o_")])
            .dropDuplicates(["a", "o_kind", "o_lex", "o_dt", "o_lang"])
        )
        snap.hv_schema = restr.join(onp, "a").join(hv, "a")
        if snap.hv_schema.isEmpty():
            snap.hv_schema = None
    return snap


def _fire_instance_rules(fr: DataFrame, acc: DataFrame, snap: _SchemaSnap, cols) -> DataFrame:
    """One semi-naive round of the INSTANCE rules: ``fr`` is the
    frontier (the instance side of every join), ``acc`` the accumulated
    statement set (used only by the two-premise transitive rule, both
    directions — the classic semi-naive delta rule).  Returns the
    candidate inferences; callers anti-join against what exists."""
    fresh = []
    # rdf1 (+ rdfs6 chain): new predicates → (P a Property), (P ⊑p P)
    props = fr.select(F.col("p").alias("s")).dropDuplicates()
    fresh.append(_mk_triples(props, s="s", p=RDF_TYPE, o=F.lit(RDF_PROPERTY)))
    fresh.append(_mk_triples(props, s="s", p=RDFS_SUBPROP, o=F.col("s")))
    # rdfs6 on freshly-typed Properties
    fr_props = (
        fr.where(
            (F.col("p") == RDF_TYPE)
            & (F.col("o_kind") == KIND_IRI)
            & (F.col("o_lex") == RDF_PROPERTY)
        )
        .select("s")
        .dropDuplicates()
    )
    fresh.append(_mk_triples(fr_props, s="s", p=RDFS_SUBPROP, o=F.col("s")))
    # rdfs7: (x P y) ∈ Δ, (P ⊑p Q) → (x Q y)
    j = fr.join(F.broadcast(snap.subp.withColumnRenamed("s", "p")), "p")
    fresh.append(
        j.select(
            F.col("g"), F.col("s"), F.col("o").alias("p"),
            *[F.col(c) for c in cols if c.startswith("o_")],
            F.lit(STYPE_INFERRED).cast("tinyint").alias("stype"),
        ).select(*cols)
    )
    # rdfs9: (x type C) ∈ Δ, (C ⊑ D) → (x type D)
    types = fr.where((F.col("p") == RDF_TYPE) & (F.col("o_kind") == KIND_IRI))
    j = types.join(F.broadcast(snap.subc.withColumnRenamed("s", "o_lex")), "o_lex")
    fresh.append(_mk_triples(j, s="s", p=RDF_TYPE, o="o"))
    # rdfs2: (x P y) ∈ Δ, (P domain C) → (x type C)
    j = fr.join(F.broadcast(snap.dom.withColumnRenamed("s", "p")), "p")
    fresh.append(_mk_triples(j, s="s", p=RDF_TYPE, o="o"))
    # rdfs3: (x P y) ∈ Δ, (P range C), y resource → (y type C)
    j = (
        fr.where(F.col("o_kind") != 2)
        .join(F.broadcast(snap.rng.withColumnRenamed("s", "p")), "p")
        .select(_obj_flat().alias("y"), F.col("o").alias("cls"))
    )
    fresh.append(_mk_triples(j, s="y", p=RDF_TYPE, o="cls"))
    if snap.with_owl:
        # inverseOf / SymmetricProperty on delta facts
        j = (
            fr.where(F.col("o_kind") != 2)
            .join(F.broadcast(snap.inv_all.withColumnRenamed("s", "p")), "p")
            .select(
                _obj_flat().alias("ns"), F.col("o").alias("np"), F.col("s").alias("no")
            )
        )
        fresh.append(_mk_triples(j, s="ns", p=F.col("np"), o="no"))
        # TransitiveProperty: Δ ⋈ closure + closure ⋈ Δ
        if snap.trans_preds:
            fr_t = fr.where(F.col("p").isin(*snap.trans_preds) & (F.col("o_kind") != 2))
            all_t = acc.where(F.col("p").isin(*snap.trans_preds) & (F.col("o_kind") != 2))
            fl = fr_t.select(F.col("s").alias("x"), "p", _obj_flat().alias("y"))
            al = all_t.select(F.col("s").alias("x"), "p", _obj_flat().alias("y"))
            ar = all_t.select(F.col("s").alias("y"), F.col("p").alias("p2"), F.col("o_lex").alias("z"))
            frr = fr_t.select(F.col("s").alias("y"), F.col("p").alias("p2"), F.col("o_lex").alias("z"))
            step = fl.join(ar, (fl["y"] == ar["y"]) & (fl["p"] == ar["p2"])).select("x", "p", "z")
            step2 = al.join(frr, (al["y"] == frr["y"]) & (al["p"] == frr["p2"])).select("x", "p", "z")
            fresh.append(_mk_triples(step, s="x", p=F.col("p"), o="z"))
            fresh.append(_mk_triples(step2, s="x", p=F.col("p"), o="z"))
        # sameAs2/3: replicate delta facts across the (static)
        # equivalence classes
        if snap.eqr is not None:
            eqr = snap.eqr
            j2 = fr.join(eqr, fr["s"] == eqr["__eq_s"])
            fresh.append(
                j2.select(
                    F.col("g"), F.col("__eq_o").alias("s"), F.col("p"),
                    *[F.col(c) for c in cols if c.startswith("o_")],
                    F.lit(STYPE_INFERRED).cast("tinyint").alias("stype"),
                ).select(*cols)
            )
            res = fr.where(F.col("o_kind") != 2).select(
                "s", "p", _obj_flat().alias("oy")
            )
            j3 = res.join(eqr, res["oy"] == eqr["__eq_s"]).select(
                F.col("s"), F.col("p"), F.col("__eq_o").alias("oz")
            )
            fresh.append(_mk_triples_flat_obj(j3, s="s", p=F.col("p"), o="oz"))
        # hasValue: (x type a) ∈ Δ, restriction schema → (x p v)
        if snap.hv_schema is not None:
            ghv, sthv = _g_stype_cols()
            hv_inst = fr.where(
                (F.col("p") == RDF_TYPE) & (F.col("o_kind") != 2)
            ).select(F.col("s").alias("__hv_x"), _obj_flat().alias("a"))
            jhv = hv_inst.join(F.broadcast(snap.hv_schema), "a")
            fresh.append(
                jhv.select(
                    ghv, F.col("__hv_x").alias("s"),
                    F.col("__hv_p").cast("string").alias("p"),
                    *[F.col(c) for c in cols if c.startswith("o_")],
                    sthv,
                ).select(*cols)
            )
    cand = fresh[0]
    for d in fresh[1:]:
        cand = cand.unionByName(d)
    return cand


def incremental_closure(
    closed: DataFrame, delta: DataFrame, max_rounds: int = 50,
    snap: _SchemaSnap | None = None,
) -> DataFrame:
    """Close ``closed ∪ delta`` incrementally — work proportional to the
    DELTA, not the store (the reference's assertion-path truth
    maintenance: inf/TruthMaintenance.java:110 asserts the temp delta
    store and closes IT against the database; additions are monotone,
    so no full re-derivation is needed).

    Preconditions: ``closed`` is already a fixpoint of rdfs_closure;
    ``delta`` rows are explicit.  When the delta touches schema
    vocabulary (see _SCHEMA_PREDS/_SCHEMA_CLASSES) or would fire a
    sameAs-GENERATING rule (Functional/InverseFunctionalProperty over a
    delta fact), raises NeedsFullClosure — those rare deltas genuinely
    invalidate the precomputed schema joins and the caller re-closes in
    full, exactly the retraction-path cost model.

    Semi-naive shape: the tiny schema closures (sub-class/property
    hierarchies, domains/ranges, inverse/symmetric maps, hasValue
    templates, sameAs equivalence pairs, transitive-predicate set) are
    computed ONCE from the closed base and broadcast; each round fires
    the instance rules with the FRONTIER (last round's new facts) as
    the instance side, so every join is |frontier| × |schema| — except
    owl:TransitiveProperty, which joins the frontier against the
    transitive-predicate slice of the accumulating closure in both
    directions (the classic semi-naive delta rule)."""
    global INCREMENTAL_RUNS
    if _delta_touches_schema(delta):
        raise NeedsFullClosure("delta touches schema vocabulary")
    INCREMENTAL_RUNS += 1

    # split the delta: brand-new facts seed the frontier; facts already
    # closed as INFERRED flip to explicit (facts already explicit are
    # no-ops)
    delta = delta.dropDuplicates(_STMT_KEYS)
    delta_new = _anti_new(delta, closed).localCheckpoint(eager=True)
    dk = delta.select(*[F.col(k).alias(f"__d_{k}") for k in _STMT_KEYS]).dropDuplicates()
    cond = None
    for k in _STMT_KEYS:
        c = F.col(k).eqNullSafe(F.col(f"__d_{k}"))
        cond = c if cond is None else (cond & c)
    flips = closed.where(F.col("stype") == STYPE_INFERRED).join(dk, cond, "left_semi")
    kept = _anti_new(closed, flips.select(*closed.columns))  # closed minus flipped rows
    from bigdata_old_spark.model import STYPE_EXPLICIT

    flipped = flips.withColumn("stype", F.lit(STYPE_EXPLICIT).cast("tinyint"))
    out = kept.unionByName(flipped).unionByName(delta_new)

    if delta_new.isEmpty():
        return out

    # ``snap`` may be carried from an earlier closed store in the same
    # TM chain (update._apply_tm): every successful incremental path
    # provably touched no schema vocabulary (schema deltas raise
    # NeedsFullClosure above), so the schema closures are identical.
    # A carried with_owl=False is sound even if this delta's object
    # IRIs are owl-namespace: with no owl SCHEMA rows every owl rule
    # derives nothing — the flag only gates rule compilation.
    if snap is None:
        snap = _schema_snapshot(closed, probe_extra=delta)
    cols = closed.columns
    frontier = delta_new
    for _ in range(max_rounds):
        fr = frontier
        if snap.fp_preds:
            # a delta fact over a (Inverse)FunctionalProperty can mint
            # NEW sameAs pairs — that invalidates the static equivalence
            # snapshot; punt to full closure (rare path)
            if fr.where(F.col("p").isin(*snap.fp_preds)).limit(1).count() > 0:
                raise NeedsFullClosure("delta fires a sameAs-generating rule")
        cand = _fire_instance_rules(fr, out, snap, cols)
        new = _anti_new(cand, out).localCheckpoint(eager=True)
        if new.isEmpty():
            break
        # DERIVED facts can be schema facts even when the raw delta is
        # not (e.g. ':myP rdfs:subPropertyOf rdfs:subClassOf' in the
        # base + instance fact ':D :myP :E' derives ':D rdfs:subClassOf
        # :E' via rdfs7) — the frozen schema snapshot would go stale and
        # the result would silently be a non-fixpoint.  Any
        # schema-touching frontier punts to full closure (the reference
        # TM re-fires the full rule program including schema rules each
        # round, so this matches semantics).
        if _delta_touches_schema(new, ignore_reflexive=True):
            raise NeedsFullClosure("derived fact touches schema vocabulary")
        # only the (small, checkpointed) delta layers stack on top of the
        # already-materialized base — checkpointing the UNION here would
        # rewrite the whole store every round, cost ∝ store not delta
        out = out.unionByName(new)
        frontier = new
    return out


def _semi_stmt(base: DataFrame, keys: DataFrame) -> DataFrame:
    """Rows of base whose statement key appears in keys (null-safe)."""
    k = keys.select(*[F.col(c).alias(f"__k_{c}") for c in _STMT_KEYS]).dropDuplicates()
    cond = None
    for c in _STMT_KEYS:
        e = base[c].eqNullSafe(k[f"__k_{c}"])
        cond = e if cond is None else (cond & e)
    return base.join(k, cond, "left_semi")


def retraction_closure(
    closed: DataFrame, removed: DataFrame, max_rounds: int = 50,
    snap: _SchemaSnap | None = None,
) -> DataFrame:
    """Close ``closed − removed`` with work scoped to the retracted
    delta's CONE, not the store — the reference's retraction-path truth
    maintenance (inf/TruthMaintenance.java:110 retractAll closes the
    retracted temp store against the database to find the affected
    inferences, then inf/Justification.java grounds-checks each one;
    only the ungrounded are removed).

    Spark re-expression, justification-free:

    1. **Cone** — the forward consequences derivable FROM the retracted
       facts against the old closure (semi-naive: retracted facts seed
       the frontier; other premises come from the closed store).  Every
       inference that LOSES all derivations is in the cone (each of its
       derivations contains an affected premise, so it is derivable
       from affected facts + the store).
    2. **Remove** the retracted rows and the cone's INFERRED rows —
       the survivors are a sound under-approximation of the new
       closure.
    3. **Re-derive** — fixpoint over the holes: fire the instance rules
       with the instance side SEMI-JOINED to the holes' subject/object/
       predicate terms (broadcast — the delta is small), keep exactly
       the candidates that fill a hole, repeat until no hole fills.
       Grounded holes return as INFERRED (a retracted explicit fact
       that is still provable flips, the testTMRetract contract);
       ungrounded holes stay gone.

    Raises NeedsFullClosure when the retracted delta (or any cone
    frontier) touches schema vocabulary or fires a sameAs-generating
    rule — same punts as the assertion path, matching the reference,
    which re-fires the full program for schema-level changes."""
    global RETRACTION_RUNS
    removed = removed.dropDuplicates(_STMT_KEYS)
    if _delta_touches_schema(removed):
        raise NeedsFullClosure("retracted delta touches schema vocabulary")
    if snap is None:  # may be carried across the TM chain (see
        snap = _schema_snapshot(closed)  # incremental_closure's note)
    cols = closed.columns

    # ---- 1. affected cone (⊆ old closure by construction) -----------------
    seeds = _semi_stmt(closed, removed).localCheckpoint(eager=True)
    cone = seeds
    frontier = seeds
    for _ in range(max_rounds):
        if snap.fp_preds:
            if frontier.where(F.col("p").isin(*snap.fp_preds)).limit(1).count() > 0:
                raise NeedsFullClosure("retracted delta fires a sameAs-generating rule")
        cand = _fire_instance_rules(frontier, closed, snap, cols)
        # only facts that actually EXIST in the old closure matter (the
        # rule program over closure premises cannot leave the closure,
        # but candidate stype/g must match the stored row)
        new = _anti_new(_semi_stmt(closed, cand), cone).localCheckpoint(eager=True)
        if new.isEmpty():
            break
        if _delta_touches_schema(new, ignore_reflexive=True):
            raise NeedsFullClosure("cone reaches schema vocabulary")
        cone = cone.unionByName(new)
        frontier = new
    RETRACTION_RUNS += 1

    # ---- 2. open the holes -------------------------------------------------
    cone_inferred = cone.where(F.col("stype") == STYPE_INFERRED)
    holes = (
        seeds.unionByName(_anti_new(cone_inferred, seeds))
        .localCheckpoint(eager=True)
    )
    base = _anti_remove_stmts(closed, holes).localCheckpoint(eager=True)

    # ---- 3. scoped re-derivation fixpoint ----------------------------------
    remaining = holes
    store = base
    for _ in range(max_rounds):
        if remaining.isEmpty():
            break
        # terms a premise of a hole-filling derivation must mention:
        # the holes' subjects, resource objects and predicates, expanded
        # through the static sameAs equivalence (replication rules
        # derive a hole about x from premises about x's equivalents)
        terms = (
            remaining.select(F.col("s").alias("__t"))
            .unionByName(
                remaining.where(F.col("o_kind") != 2)
                .select(F.col("o_lex").alias("__t"))
            )
            .unionByName(remaining.select(F.col("p").alias("__t")))
            .dropDuplicates()
        )
        if snap.eqr is not None:
            partners = snap.eqr.join(
                terms, F.col("__eq_o") == F.col("__t"), "inner"
            ).select(F.col("__eq_s").alias("__t"))
            terms = terms.unionByName(partners).dropDuplicates()
        # small deltas (the normal case): one InSet-filtered scan of the
        # store instead of three semi-joins + a dedup shuffle; fall back
        # to broadcast semi-joins when the term set is genuinely large
        term_rows = terms.limit(_TERM_INSET_CAP + 1).collect()
        if len(term_rows) <= _TERM_INSET_CAP:
            tl = [r["__t"] for r in term_rows]
            fr = store.where(
                F.col("s").isin(tl)
                | F.col("p").isin(tl)
                | ((F.col("o_kind") != 2) & F.col("o_lex").isin(tl))
            )
        else:
            tb = F.broadcast(terms)
            fr = (
                store.join(tb, store["s"] == tb["__t"], "left_semi")
                .unionByName(store.join(tb, store["p"] == tb["__t"], "left_semi"))
                .unionByName(
                    store.where(F.col("o_kind") != 2)
                    .join(tb, store["o_lex"] == tb["__t"], "left_semi")
                )
                .dropDuplicates(_STMT_KEYS)
            )
        cand = _fire_instance_rules(fr, store, snap, cols)
        recovered = (
            _semi_stmt(cand.dropDuplicates(_STMT_KEYS), remaining)
            .localCheckpoint(eager=True)
        )
        if recovered.isEmpty():
            break
        # stack only the (small, checkpointed) recovered layer — never
        # re-materialize the whole store per round
        store = store.unionByName(recovered)
        remaining = _anti_new(remaining, recovered).localCheckpoint(eager=True)
    return store


def _anti_remove_stmts(base: DataFrame, victims: DataFrame) -> DataFrame:
    """base minus rows whose statement key appears in victims."""
    v = victims.select(*[F.col(c).alias(f"__v_{c}") for c in _STMT_KEYS]).dropDuplicates()
    cond = None
    for c in _STMT_KEYS:
        e = base[c].eqNullSafe(v[f"__v_{c}"])
        cond = e if cond is None else (cond & e)
    return base.join(v, cond, "left_anti")


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
