"""SPARQL 1.1 UPDATE — parsed ops + batch Parquet-rewrite execution.

The reference routes UPDATE through AST2BOpUpdate.convertUpdateSwitch
(eval/AST2BOpUpdate.java:213,378-416) with op types Create/Drop/Clear/
Copy/Move/Add/Load/InsertData/DeleteData/DeleteInsert
(UpdateType.java:38) and physical ops InsertDataOp/RemoveStatementsOp/
InsertStatementsOp/ParseOp/CommitOp (bop/rdf/update/).

Spark semantics: every op is a pure statements-DataFrame rewrite —
DELETE = null-safe anti-join, INSERT = union + distinct — and the new
TripleStore replaces the old (batch, not transactional OLTP, per
BASELINE.json).  At scale each op is one shuffle over the statements
table; the WHERE clause of DELETE/INSERT reuses the whole query
compiler.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bigdata_old_spark import algebra as A
from bigdata_old_spark.model import (
    KIND_LITERAL,
    STATEMENTS_SCHEMA,
    STYPE_EXPLICIT,
    Term,
    term_to_iri_string,
)
from bigdata_old_spark.parser import ParseError, _Parser


class ProtocolDatasetError(ValueError):
    """SPARQL 1.1 Protocol §2.2.3: using-graph-uri/using-named-graph-uri
    must not accompany an update that contains USING or WITH."""

# ---------------------------------------------------------------------------
# Op dataclasses (UpdateType.java analog)
# ---------------------------------------------------------------------------


@dataclass
class InsertData:
    quads: list  # (g|None, s Term, p Term, o Term)


@dataclass
class DeleteData:
    quads: list


@dataclass
class DeleteInsert:
    delete_template: list  # [(g, TriplePattern)]
    insert_template: list
    pattern: object
    with_graph: str | None = None
    # USING / USING NAMED → an A.Dataset scoping the WHERE evaluation
    # exactly like FROM/FROM NAMED scopes a query (reference
    # AST2BOpUpdate.java:378-416 evaluates the WHERE against the
    # update's dataset).  When present, WITH is ignored for the WHERE
    # (SPARQL 1.1 Update §3.1.3) but still scopes bare template quads.
    dataset: object | None = None


@dataclass
class ClearOp:
    target: str  # 'default' | 'named' | 'all' | graph IRI
    silent: bool = False


@dataclass
class DropOp:
    target: str
    silent: bool = False


@dataclass
class CreateOp:
    graph: str
    silent: bool = False


@dataclass
class CopyOp:
    src: str  # 'default' or IRI
    dst: str
    move: bool = False
    add: bool = False


@dataclass
class LoadOp:
    source: str
    graph: str | None = None
    silent: bool = False


@dataclass
class SolutionSetOp:
    """CREATE/DROP/CLEAR [SILENT] SOLUTIONS %name — the reference's
    named-solution-set management extension (BigdataSPARQLUpdateTest2,
    ISolutionSetManager; solution sets are session state, not
    statements)."""

    action: str  # 'create' | 'drop' | 'clear'
    name: str
    silent: bool = False


@dataclass
class SolutionsModify:
    """[DELETE FROM %s1 SELECT proj] [INSERT INTO %s2 SELECT proj]
    WHERE {…} — append query solutions to / remove matching solutions
    from named solution sets (reference INSERT INTO %set SELECT,
    BigdataSPARQLUpdateTest2.java:454,540,789)."""

    delete_set: str | None
    delete_proj: list | None  # var names, or None for SELECT *
    insert_set: str | None
    insert_proj: list | None
    pattern: object


# ---------------------------------------------------------------------------
# Parser (extends the query parser's token machinery)
# ---------------------------------------------------------------------------


class _UpdateParser(_Parser):
    def parse_update(self) -> list:
        ops = []
        while True:
            self.parse_prologue()
            if self.peek()[0] is None:
                break
            ops.append(self.parse_update_op())
            if not self.take_op(";"):
                break
        if self.peek()[0] is not None:
            raise ParseError(f"trailing tokens at {self.peek()}")
        return ops

    def parse_update_op(self):
        if self.take_word("INSERT"):
            if self.take_word("DATA"):
                return InsertData(self.parse_quad_data(ground=True))
            if self.at_word("INTO") and self.peek(1)[0] == "SOLSET":
                return self.parse_solutions_modify(delete_set=None, delete_proj=None)
            return self.parse_modify(delete_first=False)
        if self.take_word("DELETE"):
            if self.take_word("DATA"):
                return DeleteData(self.parse_quad_data(ground=True))
            if self.at_word("FROM") and self.peek(1)[0] == "SOLSET":
                self.next()
                name = self.parse_solset()
                proj = self.parse_solutions_proj()
                return self.parse_solutions_modify(delete_set=name, delete_proj=proj)
            if self.take_word("WHERE"):
                tmpl = self.parse_quad_patterns()
                pattern = _quads_to_pattern(tmpl)
                return DeleteInsert(tmpl, [], pattern)
            return self.parse_modify(delete_first=True)
        if self.take_word("WITH"):
            g = self.parse_iri().lex
            if self.take_word("DELETE"):
                return self.parse_modify(delete_first=True, with_graph=g)
            self.expect_word("INSERT")
            return self.parse_modify(delete_first=False, with_graph=g)
        if self.take_word("CLEAR"):
            silent = self.take_word("SILENT")
            if self.take_word("SOLUTIONS"):
                return SolutionSetOp("clear", self.parse_solset(), silent)
            return ClearOp(self.parse_graph_target(), silent)
        if self.take_word("DROP"):
            silent = self.take_word("SILENT")
            if self.take_word("SOLUTIONS"):
                return SolutionSetOp("drop", self.parse_solset(), silent)
            return DropOp(self.parse_graph_target(), silent)
        if self.take_word("CREATE"):
            silent = self.take_word("SILENT")
            if self.take_word("SOLUTIONS"):
                return SolutionSetOp("create", self.parse_solset(), silent)
            self.expect_word("GRAPH")
            return CreateOp(self.parse_iri().lex, silent)
        if self.take_word("COPY") or self.at_word("MOVE", "ADD"):
            move = add = False
            if self.take_word("MOVE"):
                move = True
            elif self.take_word("ADD"):
                add = True
            # SILENT is accepted and inert: graphs are implicit here, so
            # the spec's missing-source failure cannot occur
            self.take_word("SILENT")
            src = self.parse_graph_or_default()
            self.expect_word("TO")
            dst = self.parse_graph_or_default()
            return CopyOp(src, dst, move=move, add=add)
        if self.take_word("LOAD"):
            silent = self.take_word("SILENT")
            src = self.parse_iri().lex
            g = None
            if self.take_word("INTO"):
                self.expect_word("GRAPH")
                g = self.parse_iri().lex
            return LoadOp(src, g, silent)
        raise ParseError(f"unknown update op at {self.peek()}")

    def parse_graph_target(self) -> str:
        if self.take_word("DEFAULT"):
            return "default"
        if self.take_word("NAMED"):
            return "named"
        if self.take_word("ALL"):
            return "all"
        self.expect_word("GRAPH")
        return self.parse_iri().lex

    def parse_graph_or_default(self) -> str:
        if self.take_word("DEFAULT"):
            return "default"
        self.take_word("GRAPH")
        return self.parse_iri().lex

    def parse_modify(self, delete_first: bool, with_graph: str | None = None):
        del_tmpl: list = []
        ins_tmpl: list = []
        if delete_first:
            del_tmpl = self.parse_quad_patterns()
            if self.take_word("INSERT"):
                ins_tmpl = self.parse_quad_patterns()
        else:
            ins_tmpl = self.parse_quad_patterns()
        using_default: list = []
        using_named: list = []
        while self.take_word("USING"):
            if self.take_word("NAMED"):
                using_named.append(self.parse_iri().lex)
            else:
                using_default.append(self.parse_iri().lex)
        dataset = None
        if using_default or using_named:
            # same Dataset semantics as FROM/FROM NAMED: USING alone →
            # named-graph set empty; USING NAMED alone → default graph
            # empty (compiler._scan applies both rules)
            dataset = A.Dataset(using_default or None, using_named or None)
        self.expect_word("WHERE")
        pattern = self.parse_group()
        return DeleteInsert(del_tmpl, ins_tmpl, pattern, with_graph, dataset)

    def parse_solutions_proj(self) -> list | None:
        """SELECT * | SELECT ?v1 ?v2 … (the projection of a solution-set
        INSERT/DELETE clause)."""
        self.expect_word("SELECT")
        if self.take_op("*"):
            return None
        vars_ = []
        while self.peek()[0] == "VAR":
            vars_.append(self.parse_var().name)
        if not vars_:
            raise ParseError(f"expected projection variables at {self.peek()}")
        return vars_

    def parse_solutions_modify(self, delete_set, delete_proj):
        insert_set = insert_proj = None
        if self.take_word("INSERT"):
            self.expect_word("INTO")
            insert_set = self.parse_solset()
            insert_proj = self.parse_solutions_proj()
        elif self.at_word("INTO"):  # plain INSERT INTO (INSERT consumed)
            self.next()
            insert_set = self.parse_solset()
            insert_proj = self.parse_solutions_proj()
        self.expect_word("WHERE")
        pattern = self.parse_group()
        return SolutionsModify(delete_set, delete_proj, insert_set, insert_proj, pattern)

    def parse_quad_patterns(self) -> list:
        """{ triples (GRAPH g { triples })* } → [(g|None, TriplePattern)]"""
        self.expect_op("{")
        out = []
        while not self.at_op("}"):
            if self.take_word("GRAPH"):
                k, v = self.peek()
                g = self.parse_var() if k == "VAR" else self.parse_iri()
                self.expect_op("{")
                bgp = A.BGP()
                while not self.at_op("}"):
                    self.parse_triples_same_subject(bgp)
                    self.take_op(".")
                self.expect_op("}")
                out.extend((g, t) for t in bgp.triples)
            else:
                bgp = A.BGP()
                self.parse_triples_same_subject(bgp)
                self.take_op(".")
                out.extend((None, t) for t in bgp.triples)
        self.expect_op("}")
        return out

    def parse_quad_data(self, ground: bool) -> list:
        quads = self.parse_quad_patterns()
        for g, t in quads:
            for pos in (t.s, t.p, t.o):
                if isinstance(pos, A.Var) and not pos.name.startswith("_bnode_"):
                    raise ParseError("variables not allowed in INSERT/DELETE DATA")
        return quads


def parse_update(text: str) -> list:
    return _UpdateParser(text).parse_update()


def _quads_to_pattern(quads: list):
    """DELETE WHERE shorthand: the template is also the pattern."""
    default = A.BGP([t for g, t in quads if g is None])
    node = default if default.triples else None
    from collections import defaultdict

    by_g: dict = defaultdict(list)
    for g, t in quads:
        if g is not None:
            by_g[g].append(t)
    for g, triples in by_g.items():
        gp = A.GraphPat(g, A.BGP(triples))
        node = gp if node is None else A.Join(node, gp)
    return node if node is not None else A.BGP()


# ---------------------------------------------------------------------------
# Execution
# ---------------------------------------------------------------------------

_KEYS = ["g", "s", "p", "o_kind", "o_lex", "o_dt", "o_lang"]


def _ground_quads_df(spark, quads: list, default_graph: str | None = None,
                     forbid_bnodes: bool = False) -> DataFrame:
    # blank nodes in INSERT DATA (parsed as _bnode_* Vars) mint FRESH
    # bnodes per request (SPARQL 1.1 Update §3.1.1) — unique labels so
    # re-running the same INSERT DATA creates new nodes instead of
    # deduping against the last run's
    import uuid

    fresh: dict[str, Term] = {}

    def ground(x):
        if isinstance(x, A.Var):
            if forbid_bnodes:
                raise ValueError(
                    "blank nodes are not permitted in DELETE DATA "
                    "(SPARQL 1.1 Update §3.1.2)")
            if x.name not in fresh:
                fresh[x.name] = Term.bnode(f"{x.name}_{uuid.uuid4().hex[:12]}")
            return fresh[x.name]
        return x

    rows = []
    for g, t in quads:
        gname = g.lex if isinstance(g, Term) else default_graph
        ts, to = ground(t.s), ground(t.o)
        s = ts.lex if ts.kind != 1 else f"_:{ts.lex}"
        kind, lex, dt, lang, num, dbl, dtm, b = to.as_row()
        rows.append((gname, s, t.p.lex, kind, lex, dt, lang, num, dbl, dtm, b, STYPE_EXPLICIT))
    return spark.createDataFrame(rows, STATEMENTS_SCHEMA)


def _canonize_delta(store, df: DataFrame) -> DataFrame:
    """Rewrite a mutation delta into canonical space over a
    ``sameas_mode == "canonical"`` store: subjects/resource objects map
    through the stored member→canonical mapping, so an insert (or
    delete) through an ALIAS lands on the canonical FACT the query-time
    backchain serves — the reference's semantics, where the store holds
    explicit facts and BackchainAccessPath expands them at read
    (inserting `alias :p :b` must answer `canon :p ?y` AND
    `otherAlias :p ?y`; deleting any alias form retracts the fact the
    replicas derive from).  Explicit owl:sameAs assertions store RAW:
    extending the clique structure requires re-running
    closure(sameas="canonical") — the same contract as the reference's
    backchain, whose sameAs structures are rebuilt, not incrementally
    patched.  No-op on non-canonical stores."""
    if getattr(store, "sameas_mode", None) != "canonical":
        return df
    from bigdata_old_spark.inference import OWL_SAMEAS, _canonicalize

    cm = store._sameas_canon_map()
    sa = df.where(F.col("p") == OWL_SAMEAS)
    rest = df.where(F.col("p") != OWL_SAMEAS)
    return _canonicalize(rest, cm).select(*df.columns).unionByName(
        sa.select(*df.columns))


def _victim_cond(base: DataFrame, v: DataFrame, keys=_KEYS):
    """Conjunctive null-safe equality on ``keys`` — a HASH-JOINABLE
    condition (Spark plans <=> keys as BroadcastHashJoin/SMJ).  The
    old form folded the wild-graph wildcard in as an OR disjunct,
    which forced BroadcastNestedLoopJoin — a full corpus × victims
    scan per mutation layer in every subsequent read plan."""
    cond = None
    for k in keys:
        c = base[k].eqNullSafe(v[f"__v_{k}"])
        cond = c if cond is None else (cond & c)
    return cond


_KEYS_NOG = [k for k in _KEYS if k != "g"]


def _anti_remove(base: DataFrame, victims: DataFrame, wild_g: bool = False) -> DataFrame:
    """Remove victim rows from base.  ``wild_g`` implements the
    reference's unioned-default-graph removal semantics (BigdataSail
    quads mode; Sesame removeStatements with a null context): a victim
    with NO graph deletes the (s,p,o) from EVERY graph, while a
    graph-scoped victim deletes exactly its quad — expressed as TWO
    hash anti-joins (graph-bound victims on all keys, null-graph
    victims on the g-less keys) so neither degrades to a nested loop.
    Ported behavior pinned by TestSparqlUpdate.testDeleteInsertWhere /
    testDeleteData."""
    v = victims.select(*[F.col(k).alias(f"__v_{k}") for k in _KEYS]).dropDuplicates()
    if not wild_g:
        return base.join(v, _victim_cond(base, v), "left_anti")
    vb = v.where(F.col("__v_g").isNotNull())
    vn = v.where(F.col("__v_g").isNull())
    out = base.join(vb, _victim_cond(base, vb), "left_anti")
    return out.join(vn, _victim_cond(out, vn, _KEYS_NOG), "left_anti")


def _sid_cascade(base: DataFrame, gone: DataFrame) -> DataFrame:
    """SIDs-mode retraction cascade (semantics proven by the
    reference's TestChangeSets.java:415 testSids — removing a
    statement also removes the statements ABOUT its statement
    identifier, recursively): grow the removal set with every
    statement whose subject or object is the SID of an
    already-removed statement, to fixpoint.  SIDs are deterministic
    hashes of the statement key (provenance.sid_col), so each round is
    one semi-join — no sid registry lookup.

    Fast path: a store with NO ``sid:``-subject/object rows has nothing
    to cascade — one limit(1) probe (predicate pushes to the scan)
    replaces the whole fixpoint, so plain deletes on a SID-mode store
    that never made statements-about-statements pay one cheap job
    instead of several blocking rounds."""
    from bigdata_old_spark.compiler import _key_from_obj
    from bigdata_old_spark.provenance import sid_col

    has_sid_refs = (
        base.where(
            F.col("s").startswith("sid:")
            | ((F.col("o_kind") == 0) & F.col("o_lex").startswith("sid:"))
        )
        .limit(1)
        .count()
        > 0
    )
    if not has_sid_refs:
        return gone

    total = gone.localCheckpoint(eager=True)
    frontier = total
    while True:
        sids = frontier.select(
            sid_col(F.col("s"), F.col("p"), _key_from_obj()).alias("__sid")
        ).dropDuplicates()
        cond = (base["s"] == sids["__sid"]) | (
            (base["o_kind"] == 0) & (base["o_lex"] == sids["__sid"])
        )
        about = base.join(sids, cond, "left_semi")
        new = _anti_remove(about, total).localCheckpoint(eager=True)
        if new.isEmpty():
            return total
        total = total.unionByName(new).localCheckpoint(eager=True)
        frontier = new


def _semi_match(base: DataFrame, victims: DataFrame, wild_g: bool = False) -> DataFrame:
    """Rows of base that match a victim — the ACTUAL removal delta
    (requested-but-absent victims drop out).  Same two-hash-join split
    as _anti_remove; the two match sets are made disjoint (a row
    matching a graph-bound victim is excluded from the null-graph
    probe) so the union stays duplicate-free."""
    v = victims.select(*[F.col(k).alias(f"__v_{k}") for k in _KEYS]).dropDuplicates()
    if not wild_g:
        return base.join(v, _victim_cond(base, v), "left_semi")
    vb = v.where(F.col("__v_g").isNotNull())
    vn = v.where(F.col("__v_g").isNull())
    m1 = base.join(vb, _victim_cond(base, vb), "left_semi")
    rest = base.join(vb, _victim_cond(base, vb), "left_anti")
    m2 = rest.join(vn, _victim_cond(rest, vn, _KEYS_NOG), "left_semi")
    return m1.unionByName(m2)


def _template_to_statements(sol_df: DataFrame, template: list, resolve, default_graph: str | None) -> DataFrame:
    """Instantiate quad templates against WHERE solutions → statements DF
    (the ASTConstructIterator analog for update templates)."""
    outs = []
    from bigdata_old_spark.compiler import compile_expr
    from bigdata_old_spark.functions import null_term
    from bigdata_old_spark.model import term_lit

    if any(isinstance(pos_, A.Var) and pos_.name.startswith("_bnode_")
           and pos_.name not in resolve
           for _, tp in template for pos_ in (tp.s, tp.p, tp.o)):
        # Templates mint bnodes: give every WHERE solution a UNIQUE id so
        # duplicate solutions (bag semantics) mint distinct bnodes — a
        # content hash would coincide them (and 64-bit-collide distinct
        # ones).  localCheckpoint first so monotonically_increasing_id is
        # computed once on materialized partitions and stays consistent
        # across the per-template-triple select branches below.
        import uuid

        nonce = uuid.uuid4().hex[:8]  # fresh across requests too
        sol_df = (sol_df.localCheckpoint(eager=True)
                  .withColumn("__bnode_uid",
                              F.concat(F.lit(nonce + "_"),
                                       F.monotonically_increasing_id()
                                       .cast("string"))))

    for g, tp in template:
        def pos(x):
            if isinstance(x, A.Var):
                if x.name.startswith("_bnode_") and x.name not in resolve:
                    # template blank node: mint a FRESH bnode per WHERE
                    # solution (SPARQL 1.1 Update §3.1.3; reference
                    # ASTConstructIterator bnode minting).  Label =
                    # template label + per-solution unique id, so the
                    # same [] in two template triples of one solution
                    # coincides while every solution — duplicates
                    # included — gets its own node.
                    lex = F.concat(F.lit(x.name + "_"),
                                   sol_df["__bnode_uid"])
                    from bigdata_old_spark.model import KIND_BNODE

                    return F.struct(
                        F.lit(KIND_BNODE).cast("tinyint").alias("kind"),
                        lex.alias("lex"),
                        F.lit(None).cast("string").alias("dt"),
                        F.lit(None).cast("string").alias("lang"),
                        F.lit(None).cast("decimal(38,18)").alias("num"),
                        F.lit(None).cast("double").alias("dbl"),
                        F.lit(None).cast("timestamp").alias("dtm"),
                        F.lit(None).cast("boolean").alias("bool"),
                    )
                return resolve.get(x.name, null_term())
            return term_lit(x)

        s, p, o = pos(tp.s), pos(tp.p), pos(tp.o)
        if isinstance(g, A.Var):
            gcol = term_to_iri_string(resolve.get(g.name, null_term()))
        elif isinstance(g, Term):
            gcol = F.lit(g.lex)
        else:
            gcol = F.lit(default_graph).cast("string")
        valid = s.isNotNull() & p.isNotNull() & o.isNotNull() & (s["kind"] != KIND_LITERAL) & (p["kind"] == 0)
        outs.append(
            sol_df.where(valid).select(
                gcol.alias("g"),
                term_to_iri_string(s).alias("s"),
                p["lex"].alias("p"),
                o["kind"].alias("o_kind"),
                o["lex"].alias("o_lex"),
                F.when(o["kind"] == KIND_LITERAL, o["dt"]).alias("o_dt"),
                o["lang"].alias("o_lang"),
                o["num"].alias("o_num"),
                o["dbl"].alias("o_dbl"),
                o["dtm"].alias("o_dtm"),
                o["bool"].alias("o_bool"),
                F.lit(STYPE_EXPLICIT).cast("tinyint").alias("stype"),
            )
        )
    out = outs[0]
    for d in outs[1:]:
        out = out.unionByName(d)
    return out


def execute_update(store, text: str, change_log=None, dataset=None):
    """Run a SPARQL UPDATE request; returns the NEW TripleStore.

    ``change_log`` (changesets.ChangeLog — the IChangeLog analog) gets
    transaction_begin / one change_event(ChangeSet) per statement-
    mutating op with the ACTUAL added/removed deltas (anti-join
    results, not the requested sets) / transaction_committed, or
    transaction_aborted if an op raises.  The same deltas drive the
    incremental text-index maintenance, so a registered log costs no
    extra jobs beyond one checkpoint per op.

    ``dataset`` (A.Dataset) is the SPARQL 1.1 Protocol
    using-graph-uri/using-named-graph-uri override
    (BigdataRDFContext.java:183-201): it scopes the WHERE of every
    DELETE/INSERT operation.  Per Protocol §2.2.3 it is an error to
    combine it with an update that itself carries USING or WITH."""
    ops = parse_update(text)
    if dataset is not None:
        for op in ops:
            if isinstance(op, DeleteInsert):
                if op.dataset is not None or op.with_graph:
                    raise ProtocolDatasetError(
                        "protocol using-graph-uri forbidden with USING/WITH "
                        "in the update (SPARQL 1.1 Protocol 2.2.3)"
                    )
                op.dataset = dataset
    union_flag = store.union_default_graph
    if change_log is not None:
        change_log.transaction_begin()
    try:
        for op in ops:
            prev = store
            if store.truth_maintenance and isinstance(
                op, (InsertData, DeleteData, DeleteInsert, LoadOp, ClearOp, DropOp, CopyOp)
            ):
                store = _execute_one_tm(store, op, change_log)
            else:
                store = _execute_one(store, op, change_log)
            store.union_default_graph = union_flag
            if store is not prev:
                store._bump_mutation_depth(prev)
    except Exception:
        if change_log is not None:
            change_log.transaction_aborted()
        raise
    if change_log is not None:
        change_log.transaction_committed()
    return store


def _maintain_text_index(old_store, new_store, added=None, removed=None):
    """Carry a built text index across a mutation by delta maintenance
    (tokenizes only the touched literal keys).  Unbuilt indexes stay
    lazy; Clear/Drop-style ops don't route here and rebuild lazily."""
    if old_store._text_index is not None and (added is not None or removed is not None):
        from bigdata_old_spark.search import update_text_index

        new_store._text_index = update_text_index(
            old_store._text_index, new_store.statements, added, removed
        )
    return new_store


class _DeltaRecorder:
    """Minimal IChangeLog duck-type capturing one op's ACTUAL added
    delta (the anti-join result the op already computes) — feeds the
    incremental TM closure without an extra pass."""

    def __init__(self) -> None:
        self.added = None
        self.removed = None

    def change_event(self, ch) -> None:
        self.added, self.removed = ch.added, ch.removed


def _execute_one_tm(store, op, change_log):
    """Truth maintenance (reference BigdataSail TRUTH_MAINTENANCE
    + inf/TruthMaintenance.java:110, semantics proven by
    TestChangeSets.java testTMAdd/testTMRetract/testTMUpdate): the op
    mutates the EXPLICIT statements only, the closure is re-derived,
    and the changeset reports the full-store diff — inferred rows
    appear/disappear together with their premises, and a statement
    whose type flips (explicit add of an already-provable inference, or
    retraction of a still-provable explicit statement) is reported in
    ``updated`` with its new stype rather than added/removed.

    Statement-level deltas on a known-closed store take the reference's
    incremental paths (TruthMaintenance.java:110): ADDITIONS close the
    delta against the database (inference.incremental_closure —
    additions are monotone); RETRACTIONS remove and re-derive only the
    retracted delta's affected cone (inference.retraction_closure, the
    retractAll + Justification grounds-check analog) — both work
    proportional to the delta, not the store.  Deltas that touch schema
    vocabulary or fire sameAs-generating rules fall back to full
    re-closure, the SURVEY §2.12-sanctioned batch re-derivation (so do
    graph-level ops: Clear/Drop/Copy/Move).  Axiom triples are not
    modeled (the documented closure deviation), and like the reference
    TM is triples-mode only."""
    from bigdata_old_spark.inference import (
        NeedsFullClosure,
        incremental_closure,
        rdfs_closure,
        retraction_closure,
    )
    from bigdata_old_spark.model import STYPE_INFERRED

    old_full = store.statements
    explicit = old_full.where(F.col("stype") != STYPE_INFERRED)
    delta_op = isinstance(op, (InsertData, DeleteData, DeleteInsert)) or (
        isinstance(op, LoadOp) and store.load_closure != "batch"
    )
    new_full = None
    snap_used = None
    if delta_op and store.closed:
        rec = _DeltaRecorder()
        tmp = _execute_one(store.with_statements(explicit), op, rec, pattern_store=store)
        try:
            from bigdata_old_spark.inference import _schema_snapshot

            # schema snapshot carried across the TM chain: every
            # successful incremental op provably leaves the schema
            # untouched (schema deltas raise NeedsFullClosure), so the
            # closures it holds stay exact — recomputing them cost ~5
            # jobs per tiny UPDATE
            snap_used = getattr(store, "_tm_snap", None)
            cur = old_full
            # delete-before-insert, the op's own evaluation order
            if rec.removed is not None and not rec.removed.isEmpty():
                if snap_used is None:
                    snap_used = _schema_snapshot(old_full, probe_extra=rec.added)
                cur = retraction_closure(cur, rec.removed, snap=snap_used)
            if rec.added is not None and not rec.added.isEmpty():
                if snap_used is None:
                    snap_used = _schema_snapshot(old_full, probe_extra=rec.added)
                cur = incremental_closure(cur, rec.added, snap=snap_used)
            new_full = cur
        except NeedsFullClosure:
            new_full = None
            snap_used = None
    else:
        tmp = _execute_one(store.with_statements(explicit), op, None, pattern_store=store)
    if new_full is None:
        new_full = rdfs_closure(tmp.statements)
    new_full = new_full.localCheckpoint(eager=True)
    out = store.with_statements(new_full)
    out.closed = True  # TM invariant: the store IS the closure
    # carry (or reset) the schema snapshot for the next op in the chain
    out._tm_snap = snap_used
    added = removed = None
    if change_log is not None or store._text_index is not None:
        added, removed, updated = _tm_diff(old_full, new_full)
        if change_log is not None:
            from bigdata_old_spark.changesets import ChangeSet

            opname = {"LoadOp": "Load"}.get(type(op).__name__, type(op).__name__)
            change_log.change_event(
                ChangeSet(opname, added=added, removed=removed, updated=updated)
            )
    return _maintain_text_index(store, out, added=added, removed=removed)


def _tm_diff(old: DataFrame, new: DataFrame):
    """(added, removed, updated) between two closed stores: rows keyed
    by statement identity; ``updated`` = same statement, different
    stype (carrying the NEW stype)."""
    cols = old.columns

    def keyed(df, tag):
        k = F.concat_ws(
            "\x01", *[F.coalesce(F.col(c).cast("string"), F.lit("\x00")) for c in _KEYS]
        )
        return df.select(k.alias("__k"), *[F.col(c).alias(f"__{tag}_{c}") for c in cols])

    j = keyed(old, "o").join(keyed(new, "n"), "__k", "full_outer").localCheckpoint(eager=True)
    o_present, n_present = F.col("__o_stype").isNotNull(), F.col("__n_stype").isNotNull()
    added = j.where(~o_present).select(*[F.col(f"__n_{c}").alias(c) for c in cols])
    removed = j.where(~n_present).select(*[F.col(f"__o_{c}").alias(c) for c in cols])
    updated = j.where(
        o_present & n_present & (F.col("__o_stype") != F.col("__n_stype"))
    ).select(*[F.col(f"__n_{c}").alias(c) for c in cols])
    return added, removed, updated


def _execute_one(store, op, change_log=None, pattern_store=None):
    """Execute one UPDATE op, deriving the new store via
    ``store.with_statements`` so session state (named solution sets,
    ``union_default_graph``, and the SID map) survives mutation.  The
    SID map stays valid: it keys existing statements, deletes merely
    remove rows, and newly inserted plain triples have no SIDs until
    ``to_sids()`` is re-run (reference: SIDs are assigned at load,
    AbstractTripleStore.java:787).

    Statement-mutating ops compute their ACTUAL added/removed deltas
    (anti-join / semi-join results); the same slim DataFrames feed the
    incremental text-index maintenance AND the ``change_log`` callback
    (changesets.py — IChangeLog analog).  Deltas are checkpointed only
    when a consumer beyond the store union exists."""
    from bigdata_old_spark.compiler import QueryCompiler
    from bigdata_old_spark.rio import load_ntriples

    spark, df = store.spark, store.statements

    def snap(delta):
        """Checkpoint a delta consumed by more than the store union."""
        if change_log is not None or store._text_index is not None:
            return delta.localCheckpoint(eager=True)
        return delta

    def emit(opname, added=None, removed=None):
        if change_log is not None:
            from bigdata_old_spark.changesets import ChangeSet

            change_log.change_event(ChangeSet(opname, added=added, removed=removed))

    if isinstance(op, InsertData):
        add = _canonize_delta(store, _ground_quads_df(spark, op.quads))
        preds = sorted({t.p.lex for _, t in op.quads})
        probe = df
        if 0 < len(preds) <= store.ADD_PROBE_PRED_CAP:
            # the dedup probe reads only the touched predicates'
            # pruned partitions — the write pays one bounded job
            probe = df.where(F.col("p").isin(*preds))
        # ALWAYS checkpointed (not snap): a lazy delta makes every
        # later read replay the anti-join, and each further update
        # compounds the chain — the r10 writer-mix wedge
        delta = _anti_new_stmts(add, probe).localCheckpoint(eager=True)
        # has_named_graphs carries driver-side: the op's quads say
        # whether a named graph can appear (no per-swap corpus probe)
        ng = True if any(isinstance(g, Term) for g, _ in op.quads) \
            else store._has_ng
        out = store.with_statements(df.unionByName(delta), has_named_graphs=ng)
        out._carry_stats_from(store, preds)
        out._carry_oltp_base(store, preds)
        emit("InsertData", added=delta)
        return _maintain_text_index(store, out, added=delta)
    if isinstance(op, DeleteData):
        victims = _canonize_delta(
            store, _ground_quads_df(spark, op.quads, forbid_bnodes=True))
        wild = store.union_default_graph
        if store.sid_map is not None:
            # cascade victims' predicates are unknown driver-side —
            # no stats carry in SIDs mode
            gone = _sid_cascade(df, _semi_match(df, victims, wild))
            out = store.with_statements(_anti_remove(df, gone))
        else:
            gone = snap(_semi_match(df, victims, wild))
            # a delete never CREATES a named graph: True stays
            # (conservatively — merged-scan correctness is unaffected),
            # False stays False; no per-swap probe either way
            out = store.with_statements(_anti_remove(df, victims, wild),
                                        has_named_graphs=store._has_ng)
            dpreds = sorted({t.p.lex for _, t in op.quads})
            out._carry_stats_from(store, dpreds)
            out._carry_oltp_base(store, dpreds)
        emit("DeleteData", removed=gone)
        return _maintain_text_index(store, out, removed=gone)
    if isinstance(op, DeleteInsert):
        # under truth maintenance the WHERE pattern must see inferences
        # (the reference evaluates UPDATE WHERE with includeInferred —
        # BigdataSail TM); ``pattern_store`` carries the FULL closed
        # store while the templates mutate the explicit subset
        comp = QueryCompiler(
            pattern_store if pattern_store is not None else store,
            dataset=getattr(op, "dataset", None),
        )
        pattern = op.pattern
        if op.with_graph and op.dataset is None:
            # WITH scopes the WHERE only when no USING dataset overrides
            # it (SPARQL 1.1 Update §3.1.3; AST2BOpUpdate.java:378-416)
            pattern = A.GraphPat(Term.iri(op.with_graph), pattern)
        c = comp.compile_pattern(pattern)
        sol = c.df.localCheckpoint(eager=True)  # snapshot BEFORE mutation
        from bigdata_old_spark.model import iri_col_to_term

        resolve = {v: (iri_col_to_term(sol[v]) if v in c.flat else sol[v]) for v in c.vars}
        out = df
        gone = adds_delta = None
        if op.delete_template:
            victims = _canonize_delta(store, _template_to_statements(
                sol, op.delete_template, resolve, op.with_graph))
            wild = store.union_default_graph
            if store.sid_map is not None:
                gone = _sid_cascade(out, _semi_match(out, victims, wild))
                out = _anti_remove(out, gone)
            else:
                gone = snap(_semi_match(out, victims, wild))
                out = _anti_remove(out, victims, wild)
        if op.insert_template:
            adds = _canonize_delta(store, _template_to_statements(
                sol, op.insert_template, resolve, op.with_graph))
            ipreds = {tp.p for _, tp in op.insert_template}
            probe = out
            if (all(isinstance(p_, Term) for p_ in ipreds)
                    and 0 < len(ipreds) <= store.ADD_PROBE_PRED_CAP):
                probe = out.where(
                    F.col("p").isin(*sorted(p_.lex for p_ in ipreds)))
            # always checkpointed — bounded by solutions × template,
            # and a lazy anti-join would replay per read (see InsertData)
            adds_delta = _anti_new_stmts(adds, probe).localCheckpoint(eager=True)
            out = out.unionByName(adds_delta)
        # named-graph flag carries driver-side; a template writing into
        # any graph position (or under WITH) flips it to a conservative
        # True — merged-scan correctness never depends on a False here
        ng = store._has_ng
        if op.insert_template and (op.with_graph or any(
                g_ is not None for g_, _ in op.insert_template)):
            ng = True
        new_store = store.with_statements(out, has_named_graphs=ng)
        tmpl = list(op.delete_template or []) + list(op.insert_template or [])
        tpreds = {tp.p for _, tp in tmpl}
        if store.sid_map is None and all(isinstance(p_, Term) for p_ in tpreds):
            new_store._carry_stats_from(store, sorted(p_.lex for p_ in tpreds))
            new_store._carry_oltp_base(store, sorted(p_.lex for p_ in tpreds))
        emit("DeleteInsert", added=adds_delta, removed=gone)
        return _maintain_text_index(store, new_store, added=adds_delta, removed=gone)
    if isinstance(op, ClearOp) or isinstance(op, DropOp):
        t = op.target
        opname = "Clear" if isinstance(op, ClearOp) else "Drop"
        if t == "default":
            keep_cond = F.col("g").isNotNull()
        elif t == "named":
            keep_cond = F.col("g").isNull()
        elif t == "all":
            keep_cond = F.lit(False)
        else:
            keep_cond = ~F.col("g").eqNullSafe(F.lit(t))
        if t == "all":
            if change_log is not None:
                emit(opname, removed=df.localCheckpoint(eager=True))
            return store.with_statements(spark.createDataFrame([], STATEMENTS_SCHEMA))
        if store.sid_map is not None:
            # same cascade as DELETE: clearing a graph also retracts
            # statements about the SIDs of the cleared rows (the fast-
            # path probe inside _sid_cascade makes this free on stores
            # with no statements-about-statements)
            gone = _sid_cascade(df, df.where(~keep_cond))
            out = store.with_statements(_anti_remove(df, gone))
            if change_log is not None:
                emit(opname, removed=gone)
            return out
        if change_log is not None:
            emit(opname, removed=df.where(~keep_cond).localCheckpoint(eager=True))
        return store.with_statements(df.where(keep_cond))
    if isinstance(op, CreateOp):
        # graphs are implicit (no catalog), so CREATE is a no-op EXCEPT
        # the spec'd error: creating a graph that already exists fails
        # unless SILENT (SPARQL 1.1 Update 3.2.1; the reference errors
        # the same way — TestSparqlUpdate.testCreateExistingGraph)
        if not op.silent and not df.where(F.col("g") == op.graph).isEmpty():
            raise ValueError(f"CREATE GRAPH: graph <{op.graph}> already exists")
        return store
    if isinstance(op, CopyOp):
        # eqNullSafe throughout: a plain `g == iri` is NULL (not false)
        # for default-graph rows, and `~NULL` filters them out — COPY
        # DEFAULT TO <g> would silently DROP the default graph
        src_cond = F.col("g").isNull() if op.src == "default" \
            else F.col("g").eqNullSafe(F.lit(op.src))
        dst_val = F.lit(None).cast("string") if op.dst == "default" else F.lit(op.dst)
        moved = df.where(src_cond).withColumn("g", dst_val)
        removed_cond = F.lit(False)
        if not op.add:  # COPY/MOVE replace the destination graph
            dst_cond = F.col("g").isNull() if op.dst == "default" \
                else F.col("g").eqNullSafe(F.lit(op.dst))
            removed_cond = removed_cond | dst_cond
        if op.move:
            removed_cond = removed_cond | src_cond
        gone = df.where(removed_cond)
        if store.sid_map is not None and not op.add:
            # destination-replacement (and MOVE source) removals cascade
            # through SIDs exactly like DELETE
            if op.move:
                # ADVICE r6 (update.py:701): a MOVEd statement still
                # exists (in the destination graph) after the op, and
                # SIDs are keyed on (s,p,o) only — its provenance
                # annotations stay valid.  Seed the cascade with only
                # the rows whose statement KEY no longer exists in any
                # graph post-op.
                spo = [k for k in _KEYS if k != "g"]
                post = df.where(~removed_cond).unionByName(moved)
                pk = post.select(
                    *[F.col(k).alias(f"__p_{k}") for k in spo]
                ).dropDuplicates()
                cond = None
                for k in spo:
                    c = gone[k].eqNullSafe(pk[f"__p_{k}"])
                    cond = c if cond is None else (cond & c)
                seed = gone.join(pk, cond, "left_anti")
                # gone ∪ (cascade extras beyond the seed)
                gone = gone.unionByName(_anti_remove(_sid_cascade(df, seed), gone))
            else:
                gone = _sid_cascade(df, gone)
            rest = _anti_remove(df, gone)
        else:
            rest = df.where(~removed_cond)
        delta = snap(_anti_new_stmts(moved, rest))
        if change_log is not None:
            emit("Add" if op.add else ("Move" if op.move else "Copy"),
                 added=delta,
                 removed=gone.localCheckpoint(eager=True))
        return store.with_statements(rest.unionByName(delta))
    if isinstance(op, LoadOp):
        path = op.source
        if path.startswith("file://"):
            path = path[7:]
        elif path.startswith("file:"):
            path = path[5:]
        from bigdata_old_spark.rio import load_rdf

        try:
            # missing paths fail HERE (spark.read.text checks eagerly;
            # the driver-side parsers read the file in load_rdf)
            add = load_rdf(spark, path, graph=op.graph)
        except Exception:
            if op.silent:
                return store  # LOAD SILENT: failure leaves the store as-is
            raise
        if store.load_closure == "batch":
            # DataLoader ClosureEnum analog: LOAD + closure in one op.
            # The reported delta covers loaded AND inferred rows — the
            # reference's IChangeLog contract includes inferences added
            # by truth maintenance (changesets/IChangeLog.java:28).
            from bigdata_old_spark.inference import rdfs_closure

            closed = rdfs_closure(df.unionByName(_anti_new_stmts(add, df)))
            delta = snap(_anti_new_stmts(closed, df))
        else:
            delta = snap(_anti_new_stmts(add, df))
        out = store.with_statements(df.unionByName(delta))
        emit("Load", added=delta)
        return _maintain_text_index(store, out, added=delta)
    if isinstance(op, SolutionSetOp):
        from pyspark.sql import types as T

        new = store.with_statements(df)
        sets, name = new.solution_sets, op.name
        if op.action == "create":
            if name in sets:
                if not op.silent:
                    raise ValueError(f"solution set %{name} already exists")
            else:
                sets[name] = spark.createDataFrame([], T.StructType([]))
        elif op.action == "drop":
            if name not in sets:
                if not op.silent:
                    raise ValueError(f"no such solution set %{name}")
            else:
                del sets[name]
        else:  # clear
            if name not in sets:
                if not op.silent:
                    raise ValueError(f"no such solution set %{name}")
            else:
                sets[name] = sets[name].limit(0)
        return new
    if isinstance(op, SolutionsModify):
        comp = QueryCompiler(store)
        c = comp.compile_pattern(op.pattern)
        resolve = c.resolve()
        new = store.with_statements(df)
        sets = new.solution_sets

        def project(proj):
            names = proj if proj is not None else sorted(c.vars)
            return c.df.select(*[resolve[v].alias(v) for v in names])

        if op.delete_set is not None:
            ex = sets.get(op.delete_set)
            if ex is not None and ex.columns:
                victims = project(op.delete_proj)
                keys = [k for k in ex.columns if k in victims.columns]
                if not keys:
                    # a victim row sharing no variables is compatible
                    # with every stored solution — any match empties it
                    if victims.take(1):
                        sets[op.delete_set] = ex.limit(0)
                    return new
                # join on the flat term-identity encoding (null-safe,
                # robust to nested-NULL struct comparison)
                from bigdata_old_spark.compiler import _key_from_term

                v = victims.select(
                    *[_key_from_term(F.col(k)).alias(f"__v_{k}") for k in keys]
                ).dropDuplicates()
                cond = None
                for k in keys:
                    cc = _key_from_term(ex[k]).eqNullSafe(v[f"__v_{k}"])
                    cond = cc if cond is None else (cond & cc)
                sets[op.delete_set] = ex.join(v, cond, "left_anti").localCheckpoint(eager=True)
        if op.insert_set is not None:
            adds = project(op.insert_proj)
            ex = sets.get(op.insert_set)
            if ex is not None and ex.columns:
                adds = ex.unionByName(adds, allowMissingColumns=True)
            sets[op.insert_set] = adds.localCheckpoint(eager=True)
        return new
    raise NotImplementedError(type(op))


def _anti_new_stmts(cand: DataFrame, base: DataFrame) -> DataFrame:
    b = base.select(*[F.col(k).alias(f"__b_{k}") for k in _KEYS]).dropDuplicates()
    cond = None
    for k in _KEYS:
        c = cand[k].eqNullSafe(b[f"__b_{k}"])
        cond = c if cond is None else (cond & c)
    return cand.dropDuplicates(_KEYS).join(b, cond, "left_anti")
