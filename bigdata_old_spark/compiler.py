"""SPARQL algebra → DataFrame compiler.

Plays the role of the reference's AST2BOpUtility.convert
(bigdata-rdf/.../sparql/ast/eval/AST2BOpUtility.java:205): walks the
algebra bottom-up and emits a *declarative* DataFrame composition, so
Catalyst picks join strategies, pushes filters into the Parquet scan,
and AQE re-plans at runtime (replacing the reference's RTO,
joinGraph/rto/JGraph.java).

Solution representation: one DataFrame column per SPARQL variable,
typed as a term struct (model.TERM_TYPE); unbound = NULL.  This is the
reference's IBindingSet (bigdata/.../bop/IBindingSet.java:42) mapped
onto columnar rows.

Join semantics: SPARQL joins match on *shared* variables with
"compatible bindings" (BOpContext.bind(), bop/BOpContext.java:711).
The compiler tracks which variables are *certainly bound* on each side
(the reference's static analysis does the same to pick join vars);
certainly-bound shared vars become hash-join equality keys, while
maybe-unbound shared vars get the NULL-compatible OR-condition +
post-join coalesce.
"""

from __future__ import annotations

import itertools
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from bigdata_old_spark import algebra as A
from bigdata_old_spark import functions as SF
from bigdata_old_spark.model import (
    KIND_BNODE,
    KIND_IRI,
    KIND_LITERAL,
    TERM_FIELD_NAMES,
    TERM_TYPE,
    Term,
    iri_col_to_term,
    iri_name_to_term,
    obj_cols_to_term,
    term_lit,
    term_to_iri_string,
    term_to_resource_key,
)

_ids = itertools.count()

# Field separator for delimiter-encoded flat group keys (US, unit
# separator).  kind/dt/lang/dtm serializations can never contain it;
# lex goes last so even a lex embedding it survives split(limit).
_GK_SEP = "\x1f"

# Property-path endpoints ride the closure loops as flat KEY strings:
# a resource encodes to its s-position string (IRI or "_:label") —
# byte-identical to the store's subject key, so frontier joins hash
# short strings, never 8-field structs — and a literal to
# "\x1f" + dt\x1f lang\x1f dtm\x1f lex.  Injective across the two: the
# IRI grammar excludes control characters, so no resource string starts
# with \x1f.  This is the path-closure analog of the flat group-by key
# (same commute argument; VERDICT r01 item 10).
_PK_LIT = "\x1f"


def _key_from_obj() -> Column:
    """Statements-table object columns → flat path key."""
    res = F.when(
        F.col("o_kind") == KIND_BNODE, F.concat(F.lit("_:"), F.col("o_lex"))
    ).otherwise(F.col("o_lex"))
    lit = F.concat(F.lit(_PK_LIT), F.concat_ws(
        _GK_SEP,
        F.coalesce(F.col("o_dt"), F.lit("")),
        F.coalesce(F.col("o_lang"), F.lit("")),
        F.coalesce(F.col("o_dtm").cast("string"), F.lit("")),
        F.col("o_lex"),
    ))
    return F.when(F.col("o_kind") == KIND_LITERAL, lit).otherwise(res)


def _key_from_term(t: Column) -> Column:
    """Term struct → flat path key (NULL-preserving)."""
    res = F.when(t["kind"] == KIND_BNODE, F.concat(F.lit("_:"), t["lex"])).otherwise(t["lex"])
    lit = F.concat(F.lit(_PK_LIT), F.concat_ws(
        _GK_SEP,
        F.coalesce(t["dt"], F.lit("")),
        F.coalesce(t["lang"], F.lit("")),
        F.coalesce(t["dtm"].cast("string"), F.lit("")),
        t["lex"],
    ))
    return F.when(t.isNull(), F.lit(None)).when(t["kind"] == KIND_LITERAL, lit).otherwise(res)


def _term_from_key(c: Column) -> Column:
    """Flat path key → term struct (inverse of _key_from_term)."""
    parts = F.split(c.substr(F.lit(2), F.length(c)), _GK_SEP, 4)
    lit = SF.term_from_flat(
        F.lit(KIND_LITERAL).cast("byte"),
        parts[3],
        F.when(parts[0] != "", parts[0]),
        F.when(parts[1] != "", parts[1]),
        F.when(parts[2] != "", parts[2]).cast("timestamp"),
    )
    return (
        F.when(c.isNull(), F.lit(None).cast(TERM_TYPE))
        .when(c.startswith(_PK_LIT), lit)
        .otherwise(iri_col_to_term(c))
    )


def _path_ends_resource(p) -> tuple[bool, bool]:
    """Static (src, dst) resource-certainty of a path expression — a
    certain endpoint stays a flat string var downstream (joins against
    subject scans then stay flat AND bucket-aligned); an uncertain one
    is decoded to a term struct at the path boundary."""
    if isinstance(p, (Term, A.PathLink)):
        return (True, False)
    if isinstance(p, A.PathInv):
        s, d = _path_ends_resource(p.path)
        return (d, s)
    if isinstance(p, A.PathAlt):
        ends = [_path_ends_resource(a) for a in p.alts]
        return (all(e[0] for e in ends), all(e[1] for e in ends))
    if isinstance(p, A.PathSeq):
        return (_path_ends_resource(p.steps[0])[0], _path_ends_resource(p.steps[-1])[1])
    if isinstance(p, A.PathNeg):
        fwd = bool(p.forward_iris) or not p.inverse_iris
        inv = bool(p.inverse_iris)
        return (not inv, not fwd)
    if isinstance(p, A.PathStar):
        if p.min_len == 0:
            return (False, False)  # zero-length pairs range over every node
        return _path_ends_resource(p.path)
    return (False, False)


def _path_zeroable(p) -> bool:
    """True when the path expression can match a zero-length path."""
    if isinstance(p, A.PathStar):
        return p.min_len == 0 or _path_zeroable(p.path)
    if isinstance(p, A.PathInv):
        return _path_zeroable(p.path)
    if isinstance(p, A.PathAlt):
        return any(_path_zeroable(a) for a in p.alts)
    if isinstance(p, A.PathSeq):
        return all(_path_zeroable(s) for s in p.steps)
    return False


def _path_split_zero(p) -> tuple[object | None, bool]:
    """Split a path into (non-zero-length part, exact) — the canonical
    sameAs backchain evaluates the ≥1-length part in canonical space
    (then fans bindings out) and seeds the ZERO-length solution with the
    ORIGINAL, pre-canonicalization constant, matching ZeroLengthPathOp's
    bind-the-same-term semantics over a materialized store
    (paths/ZeroLengthPathOp.java:53 — zero length never replicates).

    Returns (None, True) for a pure-zero path, (p', True) when p' is
    exactly p minus the zero-length match, and (p, False) when the split
    is not expressible (an all-zeroable SEQUENCE — its non-zero part is
    a union over step subsets; that one shape keeps the documented
    divergence)."""
    if isinstance(p, A.PathStar):
        inner, exact = (_path_split_zero(p.path) if _path_zeroable(p.path)
                        else (p.path, True))
        if not exact or inner is None:
            # (pure-zero)* is pure zero; inexact inner stays inexact
            return (None, True) if inner is None else (p, False)
        if p.min_len == 0 and p.max_len == 0:
            return None, True
        # zero-steps of a zeroable inner are no-ops, so the non-zero
        # part is ≥1 compositions of the inner's own non-zero part
        import dataclasses as _dc

        return _dc.replace(p, path=inner, min_len=max(p.min_len, 1)), True
    if isinstance(p, A.PathInv):
        inner, exact = _path_split_zero(p.path)
        return (None, True) if inner is None else (A.PathInv(inner), exact)
    if isinstance(p, A.PathAlt):
        parts, exact = [], True
        for a in p.alts:
            nz, ex = _path_split_zero(a)
            exact = exact and ex
            if nz is not None:
                parts.append(nz)
        if not parts:
            return None, exact
        return (parts[0] if len(parts) == 1 else A.PathAlt(tuple(parts))), exact
    if isinstance(p, A.PathSeq):
        if _path_zeroable(p):
            return p, False  # all-zeroable sequence: no exact split
        return p, True
    return p, True  # link / negated set / constant: not zeroable


def _fresh(prefix: str = "v") -> str:
    return f"__{prefix}{next(_ids)}"


def _expand_static_path_triple(t: "A.TriplePattern") -> list | None:
    """Fixed-length link-chain path → plain triples with fresh
    intermediate variables (the reference's ASTPropertyPathOptimizer
    static expansion, ast/optimizers/ASTPropertyPathOptimizer.java:62):
    ``?s a/^b/c ?o`` becomes ``?s a ?v1 . ?v2 b ?v1 . ?v2 c ?o`` so the
    chain joins through the stats-ordered BGP machinery (greedy join
    order, star-join grouping, broadcast small sides, flat-key late
    materialization) instead of the generic pair-DF path compiler.
    Returns None when the path isn't a pure static chain (alternation /
    closure / negated sets keep the pair-DF path)."""
    p = t.p
    steps = list(p.steps) if isinstance(p, A.PathSeq) else [p]
    if len(steps) < 2:
        return None
    out: list = []
    src = t.s
    n = len(steps)
    for i, step in enumerate(steps):
        inv = False
        if isinstance(step, A.PathInv):
            step, inv = step.path, True
        if isinstance(step, A.PathLink):
            pred = Term.iri(step.iri)
        elif isinstance(step, Term):
            pred = step
        else:
            return None
        # intermediate nodes are non-distinguished vars: the _bnode_
        # prefix joins normally but stays out of SELECT * (same
        # convention as bnode syntax sugar)
        dst = t.o if i == n - 1 else A.Var(f"_bnode_pseq{next(_ids)}")
        out.append(
            A.TriplePattern(dst, pred, src) if inv else A.TriplePattern(src, pred, dst)
        )
        src = dst
    return out


@dataclass
class Compiled:
    df: DataFrame
    certain: frozenset  # var names definitely bound in every solution
    # vars stored as flat resource strings (IRI or "_:label"; NULL =
    # unbound) instead of term structs.  This is the Spark re-expression
    # of the reference's late materialization: joins run on compact IVs
    # and ChunkedMaterializationOp builds full terms only when a value
    # expression needs them (bop/rdf/join/ChunkedMaterializationOp.java:69,
    # constraints/INeedsMaterialization.java:34).  Subject/predicate/
    # graph-position vars can only ever bind resources, so their flat
    # string IS a lossless key — hashing/sorting it in joins is far
    # cheaper than the 8-field struct.
    flat: frozenset = frozenset()

    @property
    def vars(self) -> list[str]:
        return [c for c in self.df.columns if not c.startswith("__")]

    def tcol(self, v: str) -> Column:
        """Term-struct view of a variable (materializes flat vars
        lazily, inside whatever expression consumes them)."""
        c = self.df[v]
        return iri_col_to_term(c) if v in self.flat else c

    def resolve(self) -> dict[str, Column]:
        return {v: self.tcol(v) for v in self.vars}


def _upgrade(c: Compiled, names) -> Compiled:
    """Materialize the given flat vars into term structs (the explicit
    ChunkedMaterializationOp step, used where two plan branches must
    agree on representation)."""
    vs = set(names) & c.flat
    if not vs:
        return c
    cols = [
        (iri_name_to_term(v) if v in vs else F.col(v)).alias(v)
        for v in c.df.columns
    ]
    return Compiled(c.df.select(*cols), c.certain, c.flat - vs)


# ---------------------------------------------------------------------------
# Expression compilation
# ---------------------------------------------------------------------------

#: builtins whose calls must evaluate per-occurrence — never hoisted
#: into a shared temp column (each AST occurrence is a fresh draw)
_NONDET_FNS = {"RAND", "UUID", "STRUUID", "BNODE", "NOW"}


def _expr_has_nondet(e) -> bool:
    if isinstance(e, A.FuncCall):
        return e.name in _NONDET_FNS or any(_expr_has_nondet(a) for a in e.args)
    return False


def _linearize_expr(expr):
    """Split deep FuncCall nesting into ``([(tmp, sub_ast)…], top_ast)``
    in dependency order: a FuncCall argument that itself contains a
    FuncCall is replaced by a temp Var bound to its own (shallow)
    compilation.  Keeps every individually-compiled expression at most
    two call levels deep, bounding Catalyst tree growth linearly in the
    source-expression size.  Nondeterministic calls and EXISTS markers
    stay inline."""
    bindings: list[tuple] = []

    def walk(e, top: bool):
        if not isinstance(e, A.FuncCall):
            return e
        new_args = tuple(walk(a, False) for a in e.args)
        e = A.FuncCall(e.name, new_args)
        if (
            not top
            and any(isinstance(a, A.FuncCall) for a in new_args)
            and not _expr_has_nondet(e)
        ):
            name = f"__xb{len(bindings)}"
            bindings.append((name, e))
            return A.Var(name)
        return e

    if isinstance(expr, (A.FuncCall,)) and not isinstance(expr, A.ExistsExpr):
        return bindings, walk(expr, True)
    return bindings, expr


def compile_expr(e, resolve: dict[str, Column], exists_cols: dict | None = None) -> Column:
    """Expr AST → term-struct Column.  ``resolve`` maps var → Column."""
    if isinstance(e, A.Var):
        c = resolve.get(e.name)
        return c if c is not None else SF.null_term()
    if isinstance(e, A.Const):
        return term_lit(e.term)
    if isinstance(e, A.ExistsExpr):
        if exists_cols is None or id(e) not in exists_cols:
            raise NotImplementedError("EXISTS outside FILTER context")
        b = exists_cols[id(e)]
        return SF.boolean_term(~b if e.negated else b)
    if isinstance(e, A.FuncCall):
        args = [compile_expr(a, resolve, exists_cols) for a in e.args]
        return SF.apply_builtin(e.name, args, list(e.args))
    if isinstance(e, A.Aggregate):
        c = resolve.get(("agg", id(e)))
        if c is None:
            raise ValueError("aggregate used outside aggregation context")
        return c
    raise NotImplementedError(f"expression {type(e)}")


_BOOL_CMP = {"=", "!=", "<", "<=", ">", ">="}


def compile_bool(e, resolve: dict[str, Column], exists_cols: dict | None = None) -> Column:
    """Boolean-context compilation → a plain nullable BOOLEAN column
    (NULL = SPARQL type error / unbound input).

    Equivalent to ebv(compile_expr(e)) but skips the boolean-term
    struct round-trip at every operator level.  That round-trip is not
    just overhead: each ebv() field access duplicates the whole operand
    subtree, so nested boolean expressions grow ~8× per level — large
    FILTERs either fall out of codegen or OOM the planner.  Spark's
    Kleene AND/OR/NOT on nullable booleans is exactly SPARQL's
    error-propagating 3-valued logic (AndBOp/OrBOp/NotBOp), so the
    plain-boolean composition is semantics-preserving.
    """
    from bigdata_old_spark.functions import (
        compare as _cmp_fn,
        eq_term,
        ne_term,
        same_term,
        _is_string_lit,
        _regex_pattern,
        ebv,
    )

    if isinstance(e, A.ExistsExpr):
        if exists_cols is None or id(e) not in exists_cols:
            raise NotImplementedError("EXISTS outside FILTER context")
        b = exists_cols[id(e)]
        return ~b if e.negated else b
    if isinstance(e, A.FuncCall):
        n = e.name.upper()
        if n == "&&":
            return compile_bool(e.args[0], resolve, exists_cols) & compile_bool(e.args[1], resolve, exists_cols)
        if n == "||":
            return compile_bool(e.args[0], resolve, exists_cols) | compile_bool(e.args[1], resolve, exists_cols)
        if n == "!":
            return ~compile_bool(e.args[0], resolve, exists_cols)
        if n in _BOOL_CMP:
            l = compile_expr(e.args[0], resolve, exists_cols)
            r = compile_expr(e.args[1], resolve, exists_cols)
            if n == "=":
                return eq_term(l, r)
            if n == "!=":
                return ne_term(l, r)
            c = _cmp_fn(l, r)
            return F.when(c.isNotNull(), {"<": c < 0, "<=": c <= 0, ">": c > 0, ">=": c >= 0}[n])
        if n in ("IN", "NOT IN"):
            probe = compile_expr(e.args[0], resolve, exists_cols)
            hit = F.lit(False)
            for a in e.args[1:]:
                hit = hit | F.coalesce(eq_term(probe, compile_expr(a, resolve, exists_cols)), F.lit(False))
            return F.when(probe.isNotNull(), hit if n == "IN" else ~hit)
        if n == "BOUND":
            return compile_expr(e.args[0], resolve, exists_cols).isNotNull()
        if n in ("ISIRI", "ISURI", "ISBLANK", "ISLITERAL", "ISNUMERIC"):
            t = compile_expr(e.args[0], resolve, exists_cols)
            test = {
                "ISIRI": t["kind"] == 0, "ISURI": t["kind"] == 0,
                "ISBLANK": t["kind"] == 1, "ISLITERAL": t["kind"] == KIND_LITERAL,
                "ISNUMERIC": t["dbl"].isNotNull(),
            }[n]
            return F.when(t.isNotNull(), test)
        if n == "SAMETERM":
            l = compile_expr(e.args[0], resolve, exists_cols)
            r = compile_expr(e.args[1], resolve, exists_cols)
            return F.when(l.isNull() | r.isNull(), F.lit(None).cast("boolean")).otherwise(same_term(l, r))
        if n in ("STRSTARTS", "STRENDS", "CONTAINS"):
            l = compile_expr(e.args[0], resolve, exists_cols)
            r = compile_expr(e.args[1], resolve, exists_cols)
            op = {
                "STRSTARTS": l["lex"].startswith(r["lex"]),
                "STRENDS": l["lex"].endswith(r["lex"]),
                "CONTAINS": l["lex"].contains(r["lex"]),
            }[n]
            return F.when(_is_string_lit(l) & _is_string_lit(r), op)
        if n == "REGEX":
            t = compile_expr(e.args[0], resolve, exists_cols)
            pat = compile_expr(e.args[1], resolve, exists_cols)
            flags = compile_expr(e.args[2], resolve, exists_cols)["lex"] if len(e.args) > 2 else None
            return F.when(
                _is_string_lit(t),
                F.regexp_like(t["lex"], _regex_pattern(pat["lex"], flags)),
            )
    # generic fallback: full term expression, then effective boolean value
    return ebv(compile_expr(e, resolve, exists_cols))


def _find_exists(e, acc: list) -> None:
    if isinstance(e, A.ExistsExpr):
        acc.append(e)
    elif isinstance(e, A.FuncCall):
        for a in e.args:
            _find_exists(a, acc)


def _find_aggregates(e, acc: list) -> None:
    if isinstance(e, A.Aggregate):
        acc.append(e)
    elif isinstance(e, A.FuncCall):
        for a in e.args:
            _find_aggregates(a, acc)


# ---------------------------------------------------------------------------
# Compiler
# ---------------------------------------------------------------------------

class QueryCompiler:
    """Compiles one query against a TripleStore's statements DataFrame."""

    def __init__(self, store, dataset=None, backchain: bool = True,
                 star_survivors: dict | None = None):
        self.store = store
        self.dataset = dataset  # A.Dataset from FROM / FROM NAMED
        #: two-pass star-form selection (store.query): pass 1 compiles
        #: every functional star member as per-field firsts (the probe —
        #: Catalyst's ColumnPruning then reveals exactly which term
        #: fields the rest of the query touches) and records them in
        #: ``star_probes``; pass 2 receives ``star_survivors``
        #: ({star_seq: {pattern_idx: frozenset(field_names)}}) and
        #: compiles each member as ONE first() over a struct of only the
        #: surviving fields — r9's aggregation-buffer economics with
        #: r10's scan pruning.  Both forms are exact, so a wrong/missing
        #: entry can only cost performance, never correctness (missing
        #: defaults to the full struct).
        self._star_survivors = star_survivors
        self._star_seq = 0
        self.star_probes: dict[int, list[int]] = {}
        #: True once compilation executed Spark jobs (named-set /
        #: path-closure checkpoints, runtime join sampling, DESCRIBE
        #: expansion) — store.query skips the second star pass then, so
        #: eager work is never done twice.
        self.eager_compiled = False
        # virtual sameAs closure over a canonical-mode store
        # (inf/BackchainAccessPath.java): triple-pattern scans rewrite
        # alias constants to canonical ids and fan variable bindings
        # back out per access path.  None = store not in canonical mode
        # (or caller opted out / no cliques exist) — zero overhead.
        self._backchain_mem = None
        if backchain and getattr(store, "sameas_mode", None) == "canonical":
            mem = store._sameas_mem()
            if not mem.isEmpty():
                self._backchain_mem = mem
        # named solution sets: %name → Compiled (WITH {…} AS %name),
        # materialized once, re-aliased at each INCLUDE — the Spark
        # analog of the reference's SolutionSetManager + named solution
        # set hash index (JVMNamedSubqueryOp.java:76)
        self._named_sets: dict[str, Compiled] = {}
        # query hints collected from hint: triples (ASTQueryHintOptimizer)
        self.hints: dict[str, str] = {}
        # plan-cache carry bookkeeping (store.query / _carry_oltp_base):
        # the constant predicates every scan was restricted to, and
        # whether the compiled plan depends ONLY on those predicates'
        # rows (False as soon as any scan is predicate-unbounded or the
        # plan reads other per-store state — text index, SID map,
        # solution sets, DESCRIBE expansion, sameAs caches).  A
        # carry-safe entry stays valid across any mutation whose touched
        # predicates are disjoint from scan_preds, so the server can
        # keep serving the SAME compiled DataFrame (and its reusable
        # shuffle stages) across writer swaps.
        self.scan_preds: set[str] = set()
        self.cache_carry_safe = True
        if self._backchain_mem is not None:
            self.cache_carry_safe = False  # per-store clique caches

    # -- pattern dispatch ---------------------------------------------------
    def compile_pattern(self, node, graph=None) -> Compiled:
        if isinstance(node, A.BGP):
            return self.compile_bgp(node, graph)
        if isinstance(node, A.Join):
            # a SERVICE joined with sibling patterns runs VECTORED: the
            # sibling side compiles first and its solutions are pushed
            # to the endpoint as VALUES chunks (ServiceCallJoin analog)
            if isinstance(node.right, A.ServicePat) and not isinstance(
                node.left, A.ServicePat
            ):
                l = self.compile_pattern(node.left, graph)
                return self.join(l, self.compile_service(node.right, graph, outer=l))
            if isinstance(node.left, A.ServicePat) and not isinstance(
                node.right, A.ServicePat
            ):
                r = self.compile_pattern(node.right, graph)
                return self.join(self.compile_service(node.left, graph, outer=r), r)
            # ASTBindingAssigner analog (the reference pushes a SINGLE
            # exogenous/VALUES solution INTO the query so subselects
            # evaluate pre-bound — the behavior TestService794 pins:
            # a vectored SERVICE request's one-row VALUES must constrain
            # the service group's { SELECT … LIMIT } BEFORE the limit,
            # not join bottom-up after it).  Multi-row VALUES keeps the
            # spec's bottom-up join, as the reference does.
            for a, b in ((node.left, node.right), (node.right, node.left)):
                if isinstance(a, A.ValuesPat) and len(a.rows) == 1 \
                        and isinstance(b, A.SubSelect):
                    sub_vars = A.pattern_vars(b.query.pattern)
                    keep = [i for i, n in enumerate(a.names) if n in sub_vars]
                    if keep:
                        inner = A.ValuesPat(
                            [a.names[i] for i in keep],
                            [[a.rows[0][i] for i in keep]])
                        import copy as _copy

                        b2 = _copy.copy(b.query)
                        b2.pattern = A.Join(inner, b2.pattern)
                        b = A.SubSelect(b2)
                    return self.join(self.compile_pattern(a, graph),
                                     self.compile_pattern(b, graph))
            return self.join(self.compile_pattern(node.left, graph), self.compile_pattern(node.right, graph))
        if isinstance(node, A.LeftJoin):
            return self.left_join(node, graph)
        if isinstance(node, A.UnionPat):
            return self.union(self.compile_pattern(node.left, graph), self.compile_pattern(node.right, graph))
        if isinstance(node, A.MinusPat):
            return self.minus(self.compile_pattern(node.left, graph), self.compile_pattern(node.right, graph))
        if isinstance(node, A.FilterPat):
            ranges = _extract_ranges(node.expr) if isinstance(node.child, A.BGP) else {}
            child = (
                self.compile_bgp(node.child, graph, ranges)
                if ranges
                else self.compile_pattern(node.child, graph)
            )
            return self.filter(child, node.expr, graph)
        if isinstance(node, A.Extend):
            return self.extend(self.compile_pattern(node.child, graph), node.var, node.expr)
        if isinstance(node, A.ValuesPat):
            return self.values(node)
        if isinstance(node, A.GraphPat):
            if isinstance(node.child, A.BGP) and not node.child.triples:
                # GRAPH ?g {} binds ?g to every nonempty named graph;
                # GRAPH <g> {} is a nonempty-graph test (reference
                # trac709/trac429, TestGraphEmptyPattern709_429)
                # dataset rules mirror _scan exactly: FROM without
                # FROM NAMED → empty named-graph set; FROM NAMED VIRTUAL
                # GRAPH → membership semi-join
                self.cache_carry_safe = False
                base = self.store.statements.where(F.col("g").isNotNull())
                ds = self.dataset
                g = node.graph
                if isinstance(g, A.Var):
                    if ds is not None:
                        if ds.named_graphs is None and not ds.virtual_named:
                            base = base.limit(0)
                        elif ds.virtual_named:
                            m = self._vg_members(ds.virtual_named)
                            if ds.named_graphs is not None:
                                lit = self.store.spark.createDataFrame(
                                    [(x,) for x in ds.named_graphs], "__vg string")
                                m = m.unionByName(lit).dropDuplicates()
                            base = base.join(m, base["g"] == m["__vg"], "left_semi")
                        else:
                            base = base.where(F.col("g").isin(ds.named_graphs))
                    df = base.select(F.col("g").alias(g.name)).dropDuplicates()
                    return Compiled(df, frozenset([g.name]), frozenset([g.name]))
                if ds is not None and g.lex not in (ds.named_graphs or ()):
                    if not ds.virtual_named:
                        df = base.limit(0).select(F.lit(1).alias("__unit"))
                        return Compiled(df, frozenset())
                    m = self._vg_members(ds.virtual_named).where(F.col("__vg") == g.lex)
                    df = (
                        base.where(F.col("g") == g.lex)
                        .join(m, base["g"] == m["__vg"], "left_semi")
                        .limit(1)
                        .select(F.lit(1).alias("__unit"))
                    )
                else:
                    df = base.where(F.col("g") == g.lex).limit(1).select(F.lit(1).alias("__unit"))
                return Compiled(df, frozenset())
            return self.compile_pattern(node.child, graph=node.graph)
        if isinstance(node, A.SubSelect):
            return self.compile_subselect(node.query)
        if isinstance(node, A.IncludePat):
            c = self._named_sets.get(node.name)
            if c is None:
                # durable named solution sets on the store (reference
                # ISolutionSetManager / SolutionSetManager — INCLUDE of a
                # pre-materialized set, TestInclude.java:144)
                self.cache_carry_safe = False
                df = self.store.solution_sets.get(node.name)
                if df is not None:
                    c = Compiled(df, frozenset())
            if c is None:
                raise ValueError(f"INCLUDE %{node.name}: no such named subquery")
            # fresh alias per INCLUDE so two includes of the same set
            # don't collide as an ambiguous self-join
            return Compiled(c.df.alias(_fresh("inc")), c.certain, c.flat)
        if isinstance(node, A.ServicePat):
            return self.compile_service(node, graph)
        raise NotImplementedError(f"pattern {type(node)}")

    def compile_service(self, node: A.ServicePat, graph, outer=None) -> Compiled:
        """SERVICE <iri> {…} → registered handler (ServiceRegistry
        analog, sparql/ast/service/ServiceRegistry.java:34); an
        unregistered http(s) IRI goes to the remote SPARQL protocol
        client (ServiceCallJoin.java:103), vectoring ``outer``'s
        bindings into the request when provided.  SILENT turns any
        failure into the unit solution per spec."""
        from bigdata_old_spark.model import BDS
        from bigdata_old_spark.registry import lookup_service, resolve_service_alias

        self.cache_carry_safe = False
        # remote endpoints are contacted DURING compile (vectored
        # requests) — never compile twice
        self.eager_compiled = True

        if isinstance(node.iri, Term) and node.iri.lex == BDS + "search":
            # SERVICE bds:search { ?lit bds:search "q" . … } — the
            # SPARQL 1.1 SERVICE form of the search service
            # (SearchServiceFactory; TestSearch search-service-1)
            return self.compile_pattern(node.child, graph)

        if isinstance(node.iri, Term):
            # aliases resolve before handler lookup AND before the
            # remote client builds its request URL
            # (ServiceRegistry.java:310,349)
            handler = lookup_service(resolve_service_alias(node.iri.lex))
            if handler is not None:
                return handler(self.store, node.child, self)
        try:
            if isinstance(node.iri, A.Var):
                # SERVICE ?endpoint — resolved against the outer
                # solutions' bindings of the variable (the reference
                # groups solutions by ServiceCallUtility.getServiceURI
                # and runs one call per distinct bound URI,
                # ServiceCallJoin.java:401-414)
                from bigdata_old_spark.service import remote_service_var

                return remote_service_var(self.store, node, self, outer=outer)
            from bigdata_old_spark.service import remote_service

            return remote_service(self.store, node, self, outer=outer)
        except Exception:
            if node.silent:  # SERVICE SILENT: failure → unit solution
                return Compiled(
                    self.store.spark.range(1).select(F.lit(1).alias("__unit")).limit(1),
                    frozenset(),
                )
            raise

    # -- scans / BGP ---------------------------------------------------------
    def _scan(self, graph, preds=None) -> DataFrame:
        """Statements scan restricted to the graph scope.  Constant
        positions become Parquet-pushable flat-column filters (the
        Spark analog of choosing the best SPO/POS/OSP key order,
        reference SPOAccessPath.java:41).

        ``preds`` names the constant predicate(s) the caller will
        filter to: when a mutation chain is layered on a base store and
        none of them was touched, the scan serves the BASE plan
        (store.scan_source) — identical rows, and the bucketed store's
        zero-Exchange plan shape survives writer swaps."""
        if preds is None:
            self.cache_carry_safe = False
        else:
            self.scan_preds.update([preds] if isinstance(preds, str) else preds)
        df = self.store.scan_source(preds)
        ds = self.dataset
        if graph is None:
            if ds is not None and (ds.default_graphs is not None or ds.virtual_default):
                # FROM g1,g2 / FROM VIRTUAL GRAPH vg — the default graph
                # becomes the RDF merge of the listed (or vg-member)
                # named graphs (DataSetJoin: isin/semi-join on ?g).  The
                # merge is set semantics: a triple present in several
                # graphs binds once.
                parts = []
                if ds.default_graphs is not None:
                    # bd:nullGraph names the unnamed (null-context) graph
                    # (reference BD.java:126 NULL_GRAPH; the remote client
                    # sends FROM <bd:nullGraph> for a null context,
                    # RemoteRepository.java:486)
                    from bigdata_old_spark.model import BD_NULL_GRAPH

                    named = [g for g in ds.default_graphs if g != BD_NULL_GRAPH]
                    if named:
                        parts.append(df.where(F.col("g").isin(named)))
                    if len(named) != len(ds.default_graphs):
                        parts.append(df.where(F.col("g").isNull()))
                if ds.virtual_default:
                    m = self._vg_members(ds.virtual_default)
                    parts.append(df.join(m, df["g"] == m["__vg"], "left_semi"))
                scan = parts[0]
                for extra in parts[1:]:
                    scan = scan.unionByName(extra)
                if ds.virtual_default or len(ds.default_graphs or ()) > 1:
                    scan = scan.dropDuplicates(["s", "p", "o_kind", "o_lex", "o_dt", "o_lang"])
                return scan
            if ds is not None:
                # dataset present but no FROM/FROM VIRTUAL: the default
                # graph is EMPTY (SPARQL dataset description semantics —
                # FROM NAMED alone leaves nothing in the default graph)
                return df.limit(0)
            if self.store.union_default_graph and self.store.has_named_graphs:
                # Reference quads-mode default (AbstractTripleStore /
                # BigdataSail: no dataset → the RDF merge of ALL graphs,
                # incl. the unnamed one).  The merge dedup is computed
                # once per store and persisted (merged_default_graph) —
                # NOT a dropDuplicates shuffle per triple pattern.
                # Triples-only stores scan untouched.
                return self.store.merged_default_graph()
            return df.where(F.col("g").isNull())
        if isinstance(graph, A.Var):
            out = df.where(F.col("g").isNotNull())
            if ds is not None:
                if ds.named_graphs is None and not ds.virtual_named:
                    # FROM without FROM NAMED: the named-graph set is empty
                    return out.limit(0)
                if ds.virtual_named:
                    m = self._vg_members(ds.virtual_named)
                    if ds.named_graphs is not None:
                        lit = self.store.spark.createDataFrame(
                            [(g,) for g in ds.named_graphs], "__vg string")
                        m = m.unionByName(lit).dropDuplicates()
                    out = out.join(m, out["g"] == m["__vg"], "left_semi")
                else:
                    out = out.where(F.col("g").isin(ds.named_graphs))
            return out
        if ds is not None and graph.lex not in (ds.named_graphs or ()):
            if not ds.virtual_named:
                # not in the (possibly empty) named-graph set
                return df.limit(0)
            m = self._vg_members(ds.virtual_named).where(F.col("__vg") == graph.lex)
            return df.where(F.col("g") == graph.lex).join(
                m, df["g"] == m["__vg"], "left_semi")
        return df.where(F.col("g") == graph.lex)

    #: BD.VIRTUAL_GRAPH (reference bigdata-rdf/store/BD.java — virtual
    #: graph membership is data: (vg, bd:virtualGraph, member))
    VIRTUAL_GRAPH = "http://www.bigdata.com/rdf#virtualGraph"

    def _compile_reif_triple(self, t: A.TriplePattern) -> Compiled:
        """?sid rdf:subject/predicate/object ?x against the SID reverse
        map (provenance mode) — the virtual reification access path.
        Strictly more than the reference, which cannot reverse-map a SID
        (AbstractTripleStore.java:757); here the map is one slim DF."""
        self.cache_carry_safe = False
        m = self.store.sid_map
        role = self._REIF_PREDS[t.p.lex]
        df = m
        proj = []
        names: list[str] = []
        flat: set[str] = set()
        # subject position: the SID (flat resource string)
        if isinstance(t.s, A.Var):
            proj.append(F.col("sid").alias(t.s.name))
            names.append(t.s.name)
            flat.add(t.s.name)
        else:
            df = df.where(F.col("sid") == t.s.lex)
        # object position
        if role == "s":
            col, is_flat = F.col("ts"), True
        elif role == "p":
            col, is_flat = F.col("tp"), True
        else:
            col, is_flat = obj_cols_to_term("to_"), False
        if isinstance(t.o, A.Var):
            if isinstance(t.s, A.Var) and t.o.name == t.s.name:
                df = df.where(F.col("sid") == (col if is_flat else _key_from_term(col)))
            else:
                proj.append(col.alias(t.o.name))
                names.append(t.o.name)
                if is_flat:
                    flat.add(t.o.name)
        else:
            key = _key_from_term(term_lit(t.o))
            df = df.where((col if is_flat else _key_from_term(col)) == key)
        if not proj:
            proj = [F.lit(1).alias("__unit")]
        return Compiled(df.select(*proj), frozenset(names), frozenset(flat))

    def _vg_members(self, vgs) -> DataFrame:
        """Member graphs of the given virtual graphs, as a 1-col DF."""
        self.cache_carry_safe = False
        st = self.store.statements
        return (
            st.where(
                (F.col("p") == self.VIRTUAL_GRAPH)
                & F.col("s").isin(list(vgs))
                & (F.col("o_kind") == KIND_IRI)
            )
            .select(F.col("o_lex").alias("__vg"))
            .dropDuplicates()
        )

    #: virtual-reification predicates answered from the SID map when the
    #: store is in provenance mode (provenance.to_sids)
    _REIF_PREDS = {
        "http://www.w3.org/1999/02/22-rdf-syntax-ns#subject": "s",
        "http://www.w3.org/1999/02/22-rdf-syntax-ns#predicate": "p",
        "http://www.w3.org/1999/02/22-rdf-syntax-ns#object": "o",
    }

    def _canon_pattern_consts(self, t: A.TriplePattern) -> A.TriplePattern:
        """Rewrite the pattern's constant s/o IRIs through the stored
        member→canonical mapping (predicates are never rewritten by
        canonicalization, so p stays put) — the constant half of the
        backchain."""
        import dataclasses

        def canon(x):
            if isinstance(x, Term) and x.kind == KIND_IRI:
                c = self.store.canon_of_lex(x.lex)
                if c is not None:
                    return Term.iri(c)
            return x

        s, o = canon(t.s), canon(t.o)
        if s is t.s and o is t.o:
            return t
        return dataclasses.replace(t, s=s, o=o)

    def _backchain_expand(self, out: Compiled, t: A.TriplePattern) -> Compiled:
        """Fan the pattern's variable s/o bindings out across their
        sameAs cliques (the iterator half of the backchain).  Graph
        vars are never expanded — graphs are not renamed."""
        from bigdata_old_spark.inference import expand_member_bindings

        cols: list = []
        if isinstance(t.s, A.Var) and t.s.name in out.vars:
            # s is a flat key in triple-scan units but a term STRUCT in
            # zeroable-path units (zero-length endpoints range over
            # every node) — trust the unit's own flat set, not the
            # position
            cols.append((t.s.name, t.s.name in out.flat))
        if (isinstance(t.o, A.Var) and t.o.name in out.vars
                and all(t.o.name != n for n, _ in cols)):
            cols.append((t.o.name, t.o.name in out.flat))
        if not cols:
            return out
        return Compiled(
            expand_member_bindings(out.df, self._backchain_mem, cols),
            out.certain, out.flat)

    def compile_triple(self, t: A.TriplePattern, graph, ranges: dict | None = None) -> Compiled:
        from bigdata_old_spark.inference import OWL_SAMEAS

        if not isinstance(t.p, (A.Var, Term)):
            return self.compile_path_triple(t, graph)
        if (
            isinstance(t.p, Term)
            and t.p.lex in self._REIF_PREDS
            and self.store.sid_map is not None
        ):
            return self._compile_reif_triple(t)
        if self._backchain_mem is not None:
            # sameAs-PREDICATE patterns read the VIRTUAL pair relation
            # (the reference's OwlSameAsPropertiesExpandingIterator):
            # the stored linear mapping rows stand for the full
            # non-reflexive clique pair set, each pair ONCE — expanding
            # their endpoints like ordinary bindings would cross-product
            # the mapping rows into reflexive pairs and duplicates.
            # Constants stay ORIGINAL here (two distinct aliases of one
            # clique ARE sameAs; a term is never sameAs itself).
            if isinstance(t.p, Term) and t.p.lex == OWL_SAMEAS:
                return self._compile_triple_core(
                    t, self._sameas_backchain_scan(graph), graph, ranges)
            if isinstance(t.p, A.Var):
                tc = self._canon_pattern_consts(t)
                a = self._backchain_expand(
                    self._compile_triple_core(
                        tc,
                        self._scan(graph).where(F.col("p") != OWL_SAMEAS),
                        graph, ranges),
                    tc)
                b = self._compile_triple_core(
                    t, self._sameas_backchain_scan(graph), graph, ranges)
                return Compiled(a.df.unionByName(b.df),
                                a.certain & b.certain, a.flat)
            t = self._canon_pattern_consts(t)
            return self._backchain_expand(
                self._compile_triple_core(
                    t, self._scan(graph, t.p.lex if isinstance(t.p, Term)
                                  else None), graph, ranges), t)
        return self._compile_triple_core(
            t, self._scan(graph, t.p.lex if isinstance(t.p, Term) else None),
            graph, ranges)

    def _sameas_backchain_scan(self, graph) -> DataFrame:
        """The owl:sameAs access path over a canonical store: stored
        sameAs rows MINUS the safe-clique linear mapping rows, UNION the
        virtual full pair set generated from the broadcast membership
        map (non-reflexive, each pair once — RuleOwlSameAs1's exact
        output).  Unsafe-clique rows pass through stored (they were
        materialized exactly).  The pair join is per-query and
        constant-filtered downstream — never a stored O(clique²) blowup.
        Virtual rows live in the default graph like every closure
        inference, so GRAPH-scoped scans serve stored rows only."""
        from bigdata_old_spark.inference import OWL_SAMEAS

        base = self._scan(graph, OWL_SAMEAS).where(F.col("p") == OWL_SAMEAS)
        mem = self._backchain_mem
        mt = mem.select(F.col("term").alias("__mt"))
        stored = base.join(mt, base["s"] == F.col("__mt"), "left_anti")
        if graph is not None:
            return stored
        a = mem.select(F.col("cls").alias("__cls"), F.col("term").alias("__a"))
        b = mem.select(F.col("cls").alias("__cls"), F.col("term").alias("__b"))
        pairs = a.join(b, "__cls").where(F.col("__a") != F.col("__b"))
        av, bv = F.col("__a"), F.col("__b")
        cols = []
        for c in stored.columns:
            if c == "s":
                cols.append(av.alias("s"))
            elif c == "p":
                cols.append(F.lit(OWL_SAMEAS).alias("p"))
            elif c == "o_kind":
                cols.append(
                    F.when(bv.startswith("_:"), F.lit(KIND_BNODE))
                    .otherwise(F.lit(KIND_IRI)).cast("tinyint").alias("o_kind"))
            elif c == "o_lex":
                cols.append(
                    F.when(bv.startswith("_:"),
                           bv.substr(F.lit(3), F.length(bv)))
                    .otherwise(bv).alias("o_lex"))
            elif c == "stype":
                from bigdata_old_spark.model import STYPE_INFERRED

                cols.append(F.lit(STYPE_INFERRED).cast("tinyint").alias("stype"))
            else:
                f = dict(stored.dtypes)[c]
                cols.append(F.lit(None).cast(f).alias(c))
        return stored.unionByName(pairs.select(*cols))

    def _compile_triple_core(
        self, t: A.TriplePattern, df: DataFrame, graph, ranges: dict | None = None
    ) -> Compiled:
        cond = []
        proj: dict[str, Column] = {}
        flat_vars: set[str] = set()

        def bind(var_or_term, col_term: Column, flat_eq, flat_col: Column | None = None):
            """Var → project (flat string for s/p/g positions — joins on
            these later run on strings, not structs); repeated var →
            intra-pattern equality; constant → pushdown-friendly
            flat-column filter."""
            if isinstance(var_or_term, A.Var):
                name = var_or_term.name
                if name in proj:
                    prev = iri_col_to_term(proj[name]) if name in flat_vars else proj[name]
                    cur = col_term if flat_col is None else iri_col_to_term(flat_col)
                    if name in flat_vars and flat_col is not None:
                        cond.append(proj[name] == flat_col)  # both flat
                    else:
                        cond.append(prev == cur)
                elif flat_col is not None:
                    proj[name] = flat_col
                    flat_vars.add(name)
                else:
                    proj[name] = col_term
            else:
                cond.extend(flat_eq(var_or_term))

        bind(t.s, iri_name_to_term("s"),
             lambda o: [F.col("s") == _term_as_flat_string(o)], flat_col=F.col("s"))
        bind(t.p, iri_name_to_term("p"),
             lambda o: [F.col("p") == o.lex], flat_col=F.col("p"))

        def obj_eq(o: Term):
            if o.kind == KIND_LITERAL:
                return [
                    F.col("o_kind") == KIND_LITERAL,
                    F.col("o_lex") == o.lex,
                    F.col("o_dt").eqNullSafe(F.lit(o.dt)),
                    F.col("o_lang").eqNullSafe(F.lit(o.lang)),
                ]
            return [F.col("o_kind") == o.kind, F.col("o_lex") == o.lex]

        bind(t.o, obj_cols_to_term(), obj_eq)
        # range pushdown (ASTRangeOptimizer analog, optimizers/
        # ASTRangeOptimizer.java → RangeBOp): a FILTER like (?o > 5)
        # becomes a flat-column predicate at the scan, reaching Parquet
        # min/max stats; the original FILTER still runs for exact
        # SPARQL error semantics.
        if ranges and isinstance(t.o, A.Var) and t.o.name in ranges:
            for flat_cond in ranges[t.o.name]:
                cond.append(flat_cond)
        if isinstance(graph, A.Var) and graph.name not in proj:
            proj[graph.name] = F.col("g")
            flat_vars.add(graph.name)
        for c in cond:
            df = df.where(c)
        if not proj:
            out = df.select(F.lit(1).alias("__unit")).limit(1)
            return Compiled(out, frozenset())
        out = df.select(*[c.alias(v) for v, c in proj.items()])
        return Compiled(out, frozenset(proj), frozenset(flat_vars))

    #: query-hint namespace (reference ASTQueryHintOptimizer.java; the
    #: hint: triples are stripped from the pattern and recorded —
    #: hint:optimizer "None" pins syntactic join order, hint:describeMode
    #: selects the DESCRIBE algorithm, anything else is accepted inert
    #: (AQE replaces the reference's runtime hints).
    HINTS_NS = "http://www.bigdata.com/queryHints#"

    def _strip_hints(self, triples: list) -> list:
        out = []
        for t in triples:
            if isinstance(t.p, Term) and t.p.lex.startswith(self.HINTS_NS):
                self.hints[t.p.lex[len(self.HINTS_NS):]] = getattr(t.o, "lex", None)
            else:
                out.append(t)
        return out

    def compile_bgp(self, node: A.BGP, graph, ranges: dict | None = None) -> Compiled:
        triples_in = self._strip_hints(node.triples)
        if not triples_in:
            # the empty group — one solution binding nothing
            return Compiled(self.store.spark.range(1).select(F.lit(1).alias("__unit")), frozenset())
        search_units, triples = self._split_search_groups(triples_in, graph)
        if not triples and len(search_units) == 1:
            return search_units[0]
        # static link-chain paths expand to plain triples BEFORE star/
        # join planning, so they ride the optimized BGP machinery
        expanded: list = []
        for t in triples:
            exp = (
                _expand_static_path_triple(t)
                if not isinstance(t.p, (A.Var, Term))
                else None
            )
            expanded.extend(exp if exp is not None else [t])
        triples = expanded
        star_groups, rest = self._split_star_groups(triples)
        # property-path triples join LAST: a zero-length-capable path
        # (p?, p*) whose endpoints get bound by sibling patterns must see
        # those bindings in its zero-length domain (the reference
        # pipelines bindings into ArbitraryLengthPathOp — ticket739)
        path_ts = [t for t in rest if not isinstance(t.p, (A.Var, Term))]
        plain = [t for t in rest if isinstance(t.p, (A.Var, Term))]
        # NB: build a NEW list — `units = search_units` + `+=` would
        # mutate search_units through the alias and flip the reps guard
        # below, silently pinning every BGP to syntactic join order
        has_search = bool(search_units)
        units = list(search_units)
        units += [self.compile_star(s_name, ts, graph, ranges)
                  for s_name, ts in star_groups]
        units += [self.compile_triple(t, graph, ranges) for t in plain]
        reps = ([ts[0] for _, ts in star_groups] + plain) if not has_search else None
        acc = None
        if units:
            if reps is not None and len(reps) == len(units):
                acc = self._join_units(units, reps)
            else:
                # search units first (small, selective), then greedy join
                acc = units[0]
                for u in units[1:]:
                    acc = self.join(acc, u)
        for t in path_ts:
            unit = self.compile_path_triple(t, graph, seed_from=acc)
            acc = unit if acc is None else self.join(acc, unit)
        return acc

    def _split_search_groups(self, triples, graph=None):
        """bds: magic-predicate groups → full-text search units (the
        ASTSearchOptimizer→SearchServiceFactory rewrite,
        eval/ASTSearchOptimizer.java:83; predicate vocabulary
        store/BDS.java:94-431).  ``?lit bds:search "q"`` binds ?lit to
        matched literals; sibling bds: triples on the same subject set
        options / bind relevance+rank."""
        from bigdata_old_spark.model import BDS

        from collections import defaultdict

        groups: dict = defaultdict(list)
        rest: list = []
        for t in triples:
            if isinstance(t.p, Term) and t.p.lex.startswith(BDS) and isinstance(t.s, A.Var):
                groups[t.s.name].append(t)
            else:
                rest.append(t)
        units = [self._compile_search_unit(name, ts, graph) for name, ts in groups.items()]
        return units, rest

    def _scoped_text_index(self, graph):
        """Restrict the text index to the active dataset/GRAPH scope
        (quads-mode search — the reference's SearchServiceFactory honors
        the query's dataset; TestSearch search-named-graphs fixtures).
        Returns (TextIndex, g_var_name | None); when no graph var needs
        binding the g column is dropped and rows deduped (set semantics
        across graphs, like _scan's RDF-merge)."""
        from bigdata_old_spark.search import TextIndex

        self.cache_carry_safe = False
        ti = self.store.text_index()
        df, ds = ti.df, self.dataset
        g_name = None
        if graph is None:
            if ds is not None and (ds.default_graphs is not None or ds.virtual_default):
                cond = F.lit(False)
                if ds.default_graphs is not None:
                    cond = cond | F.col("g").isin(ds.default_graphs)
                df = df.where(cond)
                if ds.virtual_default:
                    m = self._vg_members(ds.virtual_default)
                    vg_hits = ti.df.join(m, ti.df["g"] == m["__vg"], "left_semi")
                    df = df.unionByName(vg_hits)
            elif ds is not None:
                df = df.limit(0)  # FROM NAMED only: empty default graph
            elif self.store.union_default_graph and self.store.has_named_graphs:
                pass  # union default graph: all graphs
            else:
                df = df.where(F.col("g").isNull())
        elif isinstance(graph, Term):
            if ds is not None and graph.lex not in (ds.named_graphs or ()):
                if ds.virtual_named:
                    m = self._vg_members(ds.virtual_named).where(F.col("__vg") == graph.lex)
                    df = df.where(F.col("g") == graph.lex).join(
                        m, df["g"] == m["__vg"], "left_semi")
                else:
                    df = df.limit(0)
            else:
                df = df.where(F.col("g") == graph.lex)
        else:  # GRAPH ?g — bind the containing graph
            df = df.where(F.col("g").isNotNull())
            if ds is not None:
                if ds.named_graphs is None and not ds.virtual_named:
                    df = df.limit(0)
                else:
                    cond = F.lit(False)
                    if ds.named_graphs is not None:
                        cond = cond | F.col("g").isin(ds.named_graphs)
                    df = df.where(cond) if not ds.virtual_named else df
                    if ds.virtual_named:
                        m = self._vg_members(ds.virtual_named)
                        if ds.named_graphs is not None:
                            lit = self.store.spark.createDataFrame(
                                [(g,) for g in ds.named_graphs], "__vg string")
                            m = m.unionByName(lit).dropDuplicates()
                        df = df.join(m, df["g"] == m["__vg"], "left_semi")
            g_name = graph.name
        if g_name is None:
            df = df.drop("g").dropDuplicates()
        return TextIndex(df, ti.n_docs, ti.n_subjects), g_name

    def _compile_search_unit(self, s_name: str, ts: list, graph=None) -> Compiled:
        """Compile one bds: magic-predicate group.  Full BDS vocabulary
        (BDS.java:94-431): search/relevance/rank/minRelevance/
        maxRelevance/minRank/maxRank/matchAllTerms/matchExact/
        matchRegex/prefixMatch/subjectSearch/searchInSearch/
        searchTimeout/rangeCount."""
        from bigdata_old_spark.model import BDS, mk_term_col
        from bigdata_old_spark.search import matching_subjects, ranked
        from bigdata_old_spark.search import search as ft_search
        from bigdata_old_spark.search import subject_search as ft_subject_search

        query = None
        rel_var = rank_var = count_var = None
        max_rank = min_rank = None
        subject_mode = False
        in_search = False
        opts: dict = {}
        for t in ts:
            local = t.p.lex[len(BDS):]
            if local == "search":
                query = t.o.lex
            elif local == "searchInSearch":
                query, in_search = t.o.lex, True
            elif local == "relevance":
                rel_var = t.o.name
            elif local == "rank":
                rank_var = t.o.name
            elif local == "rangeCount":
                count_var = t.o.name
            elif local == "minRelevance":
                opts["min_relevance"] = float(t.o.lex)
            elif local == "maxRelevance":
                opts["max_relevance"] = float(t.o.lex)
            elif local == "minRank":
                min_rank = int(t.o.lex)
            elif local == "maxRank":
                max_rank = int(t.o.lex)
            elif local == "matchAllTerms":
                opts["match_all_terms"] = t.o.lex == "true"
            elif local == "matchExact":
                opts["match_exact"] = t.o.lex == "true"
            elif local == "matchRegex":
                opts["match_regex"] = t.o.lex
            elif local == "prefixMatch":
                opts["prefix_match"] = t.o.lex == "true"
            elif local == "subjectSearch":
                subject_mode = t.o.lex == "true"
            elif local == "searchTimeout":
                # accepted for API parity; Spark has no per-operator
                # deadline — the cluster-level kill switch is
                # spark.sql.execution.* timeouts / job cancellation
                pass
        if query is None:
            raise NotImplementedError(f"bds: group on ?{s_name} lacks bds:search")

        idx, g_name = self._scoped_text_index(graph)
        if g_name is not None and (in_search or subject_mode):
            # subject-centric variants bind no graph: collapse to the
            # deduped literal set
            from bigdata_old_spark.search import TextIndex

            idx = TextIndex(idx.df.drop("g").dropDuplicates(), idx.n_docs, idx.n_subjects)
            g_name = None

        if in_search:
            # "search in search": ?s restricted to subjects linking to a
            # matched literal (SearchInSearchServiceFactory.java:89) —
            # a distinct subject set, flat resource strings
            subs = matching_subjects(
                idx, query,
                prefix_match=opts.get("prefix_match", False),
            )
            return Compiled(subs.select(F.col("s").alias(s_name)),
                            frozenset([s_name]), frozenset([s_name]))

        if subject_mode:
            hits = ft_subject_search(
                idx, query, with_rank=bool(rank_var),
                min_rank=min_rank, max_rank=max_rank, **opts)
            proj = [F.col("s").alias(s_name)]
            names, flat = [s_name], frozenset([s_name])
            if rel_var:
                proj.append(SF.double_term(F.col("relevance")).alias(rel_var))
                names.append(rel_var)
            if rank_var:
                proj.append(SF.integer_term(F.col("rank")).alias(rank_var))
                names.append(rank_var)
            return Compiled(hits.select(*proj), frozenset(names), flat)

        # rank semantics are literal-level here, so rank slices must NOT
        # prune occurrences inside search() (an occurrence-level top-k
        # can starve distinct literals); rank only computed if needed
        hits = ft_search(idx, query, with_rank=False, **opts)
        # collapse occurrences → distinct matched literals (the reference
        # indexes literals once; ours indexes occurrences); under
        # GRAPH ?g the document is the (graph, literal) pair and ?g binds
        lit_keys = (["g"] if g_name else []) + ["o_lex", "o_dt", "o_lang"]
        lit = hits.groupBy(*lit_keys).agg(F.max("relevance").alias("relevance"))

        if count_var:
            # fast range count: bind the hit count instead of the hits
            # (BDS.RANGE_COUNT — defined only without exact/regex filters)
            if opts.get("match_exact") or opts.get("match_regex"):
                raise NotImplementedError("bds:rangeCount with matchExact/matchRegex")
            cnt = lit.groupBy().agg(F.count(F.lit(1)).alias("__n"))
            return Compiled(
                cnt.select(SF.integer_term(F.col("__n")).alias(count_var)),
                frozenset([count_var]),
            )

        if max_rank is not None or min_rank is not None or rank_var:
            # rank on relevance quantized to 12 dp: scores that are
            # mathematically equal can differ by ulps depending on the
            # float summation order of a distributed aggregate, which
            # would make the rank ORDER nondeterministic run-to-run;
            # quantizing makes such pairs true ties, broken by o_lex
            rank_order = [F.desc(F.round(F.col("relevance"), 12)), F.asc("o_lex")]
            if g_name:
                rank_order.append(F.asc("g"))
            lit = ranked(lit, rank_order, max_rank=max_rank)
            if min_rank is not None:
                lit = lit.where(F.col("rank") >= min_rank)
        proj = [
            mk_term_col(
                kind=F.lit(KIND_LITERAL), lex=F.col("o_lex"),
                dt=F.col("o_dt"), lang=F.col("o_lang"),
            ).alias(s_name)
        ]
        names = [s_name]
        if rel_var:
            proj.append(SF.double_term(F.col("relevance")).alias(rel_var))
            names.append(rel_var)
        if rank_var:
            proj.append(SF.integer_term(F.col("rank")).alias(rank_var))
            names.append(rank_var)
        flat = frozenset()
        if g_name:
            proj.append(F.col("g").alias(g_name))
            names.append(g_name)
            flat = frozenset([g_name])
        return Compiled(lit.select(*proj), frozenset(names), flat)

    def _split_star_groups(self, triples):
        """Group ≥3 constant-predicate patterns sharing one subject var
        into star units (reference SPOStarJoin.java:49: many predicates
        off one subject in one index pass).  One scan + one groupBy
        replaces N−1 self-joins of the statements table — the dominant
        shape for direct-mapped relational data."""
        from collections import defaultdict

        by_subj: dict = defaultdict(list)
        rest: list = []
        reif_active = self.store.sid_map is not None
        from bigdata_old_spark.inference import OWL_SAMEAS

        for t in triples:
            if (
                isinstance(t.s, A.Var)
                and isinstance(t.p, Term)
                # virtual-reification patterns must route through
                # _compile_reif_triple (SID map), never a star scan
                and not (reif_active and t.p.lex in self._REIF_PREDS)
                # sameAs patterns over a canonical store read the
                # VIRTUAL pair relation, never the statements scan
                and not (self._backchain_mem is not None
                         and t.p.lex == OWL_SAMEAS)
                and (isinstance(t.o, Term) or (isinstance(t.o, A.Var) and t.o.name != t.s.name))
            ):
                by_subj[t.s.name].append(t)
            else:
                rest.append(t)
        import os

        # Round 3: with the functional-predicate fast path (first(when)
        # scalars instead of collect_list+explode — compile_star) the
        # star WINS on local[32] too: q03 warm 2.7 s → 0.7-1.3 s at
        # sf0.1.  Default ON from 3 patterns; the reference enables
        # SPOStarJoin by default as well.
        threshold = int(os.environ.get("BDOS_STAR_THRESHOLD", "3"))
        stars = []
        for s_name, ts in by_subj.items():
            o_vars = [t.o.name for t in ts if isinstance(t.o, A.Var)]
            if len(ts) >= threshold and len(o_vars) == len(set(o_vars)):
                stars.append((s_name, ts))
            else:
                rest.extend(ts)
        return stars, rest

    def compile_star(self, s_name: str, patterns: list, graph,
                     ranges: dict | None = None) -> Compiled:
        """One subject, many constant predicates: scan p∈{…}, groupBy
        subject, collect each predicate's values, explode back (keeps
        RDF multi-value cross-product semantics).  Constant objects
        become post-aggregation flags (no explode needed).

        FUNCTIONAL predicates (count == ndv(subject) in the cached
        store stats — every direct-mapped relational column) skip the
        collect_list+explode: a single first(when(...)) scalar keeps
        the aggregate a plain HashAggregate with no array buffers, the
        SPOStarJoin economics the reference gets from its one-pass SPO
        scan.

        Under the canonical sameAs backchain (r10) the star compiles
        normally — constants canonicalize up front, and the star-group
        OUTPUT is the single expansion seam: the star binds s and each
        o exactly like the joined per-triple group would, so one
        expand_member_bindings pass over its bound vars reproduces the
        per-pattern fan-out (same bag semantics: per-triple expansion
        fans s before the joins, which multiply identically)."""
        if self._backchain_mem is not None:
            patterns = [self._canon_pattern_consts(t) for t in patterns]
        star_id = self._star_seq
        self._star_seq += 1
        survivors = (None if self._star_survivors is None
                     else self._star_survivors.get(star_id))
        preds = sorted({t.p.lex for t in patterns})
        df = self._scan(graph, preds).where(F.col("p").isin(preds))
        # range pushdown at the star scan (RangeBOp analog — the join
        # path gets this per-pattern in _compile_triple_core): a
        # top-level FILTER range on a member var drops that pattern's
        # non-matching rows BEFORE the subject aggregate.  Sound for
        # the same reason as the per-triple push (the predicate is
        # implied by the filter, which still runs afterwards): a
        # dropped row either nulls the member's existence marker —
        # dropping the subject exactly like the post-agg FILTER would —
        # or removes one multi-value, exactly the exploded row the
        # FILTER would reject.  Only when the predicate appears ONCE in
        # the group: two patterns with the same predicate share the scan
        # rows, so pushing one var's range would also strip the other
        # var's values (ADVICE r10).
        n_with_pred = {p: sum(1 for t2 in patterns if t2.p.lex == p)
                       for p in preds}
        if ranges:
            for t in patterns:
                if (isinstance(t.o, A.Var) and t.o.name in ranges
                        and n_with_pred[t.p.lex] == 1):
                    for flat_cond in ranges[t.o.name]:
                        df = df.where((F.col("p") != t.p.lex) | flat_cond)
        keys = [F.col("s")]
        if isinstance(graph, A.Var):
            keys.append(F.col("g"))
        by_p = self.store.stats()["by_p"] if graph is None else {}

        def functional(p_iri: str) -> bool:
            st = by_p.get(p_iri)
            # EXACT test (stats maxn): max statements per (p,s) == 1.
            # Never guessed from approx ndv — a wrong "functional" would
            # silently drop multi-value solutions.
            return st is not None and len(st) > 3 and st[3] == 1

        # one predicate-ordinal column per row: the per-field firsts
        # below need a per-pattern match test, and long shared-prefix
        # IRI string compares × (patterns × 8 fields) dominated the
        # aggregate (q03: 20 string CASEs/row measured +0.7 s over the
        # struct form).  One 5-way string CASE per row, then every
        # aggregate matches a tinyint.
        pred_ord = {p: n for n, p in enumerate(preds)}
        pi = None
        for p_iri, n in pred_ord.items():
            pi = (F.when(F.col("p") == p_iri, n) if pi is None
                  else pi.when(F.col("p") == p_iri, n))
        # ordinal width sized to the group — a tinyint would wrap past
        # 127 predicates and silently drop every pattern's rows
        # (ADVICE r10)
        pi_t = "tinyint" if len(preds) <= 127 else (
            "smallint" if len(preds) <= 32767 else "int")
        df = df.withColumn("__pi", pi.cast(pi_t))
        aggs = []
        const_flags = []
        var_lists = []
        var_scalars = []
        for i, t in enumerate(patterns):
            cond = F.col("__pi") == pred_ord[t.p.lex]
            if isinstance(t.o, Term):
                o = t.o
                if o.kind == KIND_LITERAL:
                    m = (
                        cond & (F.col("o_kind") == KIND_LITERAL) & (F.col("o_lex") == o.lex)
                        & F.col("o_dt").eqNullSafe(F.lit(o.dt)) & F.col("o_lang").eqNullSafe(F.lit(o.lang))
                    )
                else:
                    m = cond & (F.col("o_kind") == o.kind) & (F.col("o_lex") == o.lex)
                aggs.append(F.max(F.when(m, 1).otherwise(0)).alias(f"__c{i}"))
                const_flags.append(f"__c{i}")
            elif functional(t.p.lex):
                # FUNCTIONAL member (≤1 row per (p,s)) — two exact
                # forms, chosen by the two-pass protocol (see __init__):
                #
                # PROBE (pass 1, no survivors): one first() PER TERM
                # FIELD.  A struct-valued aggregate pins every object
                # column into ReadSchema (q03 read 10 columns for a
                # 4-column query); field-wise firsts rebuild the term
                # struct AFTER the aggregate, so SimplifyExtractValueOps
                # + ColumnPruning drop the untouched fields all the way
                # into the parquet scan — and the surviving aliases
                # reveal EXACTLY which fields the rest of the query
                # touches.
                #
                # FINAL (pass 2, survivors known): ONE first() over a
                # struct of only the surviving fields.  The scan still
                # prunes to the union of surviving fields, but the
                # aggregate carries one buffer per pattern instead of
                # one per (pattern × field) — the r10 decomposition
                # quadrupled q03's aggregation state (20 firsts / 40
                # buffer slots vs 5/10) for a single pruned column,
                # which the driver measured as a 4× regression
                # (VERDICT r10 #1).
                #
                # Exact either way: at most one row matches (p,s), so
                # fields cannot mix across rows; o_kind — never NULL on
                # a statement — doubles as the row-existence marker.
                if survivors is None:
                    self.star_probes.setdefault(star_id, []).append(i)
                    for fname in TERM_FIELD_NAMES:
                        aggs.append(
                            F.first(F.when(cond, F.col(f"o_{fname}")),
                                    ignorenulls=True)
                            .alias(f"__v{star_id}_{i}_{fname}")
                        )
                    var_scalars.append((f"__v{star_id}_{i}", t.o.name, None))
                else:
                    fields = survivors.get(i)
                    # missing / unparseable probe → full struct (exact;
                    # only pruning is lost).  kind always rides along as
                    # the existence marker.
                    fields = (frozenset(TERM_FIELD_NAMES) if fields is None
                              else frozenset(fields) | {"kind"})
                    aggs.append(
                        F.first(
                            F.when(cond, F.struct(
                                *[F.col(f"o_{fn}").alias(fn)
                                  for fn in TERM_FIELD_NAMES if fn in fields]
                            )),
                            ignorenulls=True,
                        ).alias(f"__v{star_id}_{i}")
                    )
                    var_scalars.append((f"__v{star_id}_{i}", t.o.name, fields))
            else:
                aggs.append(F.collect_list(F.when(cond, obj_cols_to_term())).alias(f"__l{i}"))
                var_lists.append((f"__l{i}", t.o.name))
        g = df.groupBy(*keys).agg(*aggs)
        for flag in const_flags:
            g = g.where(F.col(flag) == 1)
        for col, _, fields in var_scalars:
            # pattern must match: a subject missing the predicate drops
            # (probe form: kind is the existence marker; struct form:
            # the when() left the whole struct NULL on no-match)
            if fields is None:
                g = g.where(F.col(f"{col}_kind").isNotNull())
            else:
                g = g.where(F.col(col).isNotNull())
        for list_col, var in var_lists:
            g = g.select("*", F.explode(list_col).alias(f"__e_{var}")).drop(list_col)
        proj = [F.col("s").alias(s_name)]
        names = [s_name]
        flat_vars = {s_name}
        for col, var, fields in var_scalars:
            # reassemble the full term struct — rows here all matched
            # (existence filtered above), so this is exactly the old
            # first(struct) value.  Non-surviving fields are typed NULL
            # literals: Catalyst itself proved (pass-1 pruning) the rest
            # of the query never reads them.
            if fields is None:
                proj.append(F.struct(
                    *[F.col(f"{col}_{fn}").alias(fn) for fn in TERM_FIELD_NAMES]
                ).alias(var))
            else:
                proj.append(F.struct(
                    *[(F.col(col)[fn] if fn in fields
                       else F.lit(None).cast(TERM_TYPE[fn].dataType)).alias(fn)
                      for fn in TERM_FIELD_NAMES]
                ).alias(var))
            names.append(var)
        for _, var in var_lists:
            proj.append(F.col(f"__e_{var}").alias(var))
            names.append(var)
        if isinstance(graph, A.Var):
            proj.append(F.col("g").alias(graph.name))
            names.append(graph.name)
            flat_vars.add(graph.name)
        unit = Compiled(g.select(*proj), frozenset(names), frozenset(flat_vars))
        if self._backchain_mem is not None:
            # the single star-group expansion seam (VERDICT r9 #1):
            # fan the star's bound vars out across their cliques exactly
            # like the joined per-triple group would — graph vars never
            # expand (graphs are not renamed)
            from bigdata_old_spark.inference import expand_member_bindings

            cols = [(s_name, True)] + [
                (vs[1], False) for vs in var_scalars] + [
                (v, False) for _, v in var_lists]
            unit = Compiled(
                expand_member_bindings(unit.df, self._backchain_mem, cols),
                unit.certain, unit.flat)
        return unit

    def _join_units(self, units: list[Compiled], triples) -> Compiled:
        """Greedy cardinality-ordered join (the static analog of the
        reference's ASTStaticJoinOptimizer.java:83 over rangeCount
        estimates): start from the smallest estimated pattern, always
        join a pattern sharing a variable with what's bound so far
        (avoids cartesians), smallest next.  AQE then fixes residual
        misestimates at runtime (broadcast conversion, skew split).

        hint:optimizer "None" pins the syntactic order (the reference's
        join-order escape hatch, ASTQueryHintOptimizer)."""
        if self.hints.get("optimizer") == "None":
            acc = units[0]
            for u in units[1:]:
                acc = self.join(acc, u)
            return acc
        if self.hints.get("optimizer") == "Runtime" and len(units) > 2:
            return self._join_units_rto(units, triples)
        cards = [self._estimate_card(t) for t in triples]
        remaining = list(range(len(units)))
        remaining.sort(key=lambda i: cards[i])
        first = remaining.pop(0)
        acc = units[first]
        while remaining:
            sharing = [i for i in remaining if set(units[i].vars) & set(acc.vars)]
            nxt = min(sharing, key=lambda i: cards[i]) if sharing else remaining[0]
            remaining.remove(nxt)
            acc = self.join(acc, units[nxt])
        return acc

    def _join_units_rto(self, units: list[Compiled], triples) -> Compiled:
        """Runtime query optimizer — ``hint:optimizer "Runtime"`` (the
        reference RTO: JoinGraph/JGraph cutoff-sampling join ordering,
        bigdata/src/java/com/bigdata/bop/joinGraph/rto/JGraph.java;
        vertex samples from SampleIndex.java; parameters
        QueryHints.RTO_LIMIT default 100 / RTO-sampleType /
        RTO-nedges, QueryHints.java:108-145).

        Instead of trusting the static rangeCount heuristic, each
        vertex (access path) is sampled by a LIMIT cutoff of its
        already-pruned scan (the DENSE leading-tuples sample), and each
        candidate edge is scored by running the partial chain's sample
        against the candidate's FULL access path under a LIMIT cutoff —
        measured selectivity, not an estimate ("cutoff join
        evaluation").  Greedy chain growth = the reference's
        nedges-seeded exploration with nedges=1.  The chosen order then
        drives the real, unsampled joins; AQE still re-plans the
        physical strategy (broadcast/skew) at runtime, which is why the
        static optimizer remains the default — Runtime pays O(k²) tiny
        sampling jobs at plan time, exactly the price the reference RTO
        pays, and earns it only on queries whose static estimates
        mislead."""
        self.eager_compiled = True  # sampling jobs run at compile time
        limit = int(self.hints.get("RTO-limit") or 100)
        cutoff = max(limit * 10, 1000)
        cards = [self._estimate_card(t) for t in triples]
        samples = [
            Compiled(u.df.limit(limit).localCheckpoint(eager=True), u.certain, u.flat)
            for u in units
        ]
        counts = [s.df.count() for s in samples]
        # a measured count below the cutoff is EXACT; saturated samples
        # fall back to the static estimate for the seed choice
        seeds = [
            float(c) if c < limit else max(cards[i], float(limit))
            for i, c in enumerate(counts)
        ]
        remaining = list(range(len(units)))
        first = min(remaining, key=lambda i: (seeds[i], i))
        remaining.remove(first)
        acc = units[first]
        acc_sample = samples[first]
        while remaining:
            sharing = [i for i in remaining if set(units[i].vars) & set(acc.vars)]
            if not sharing:
                nxt = min(remaining, key=lambda i: (seeds[i], i))
            else:
                score = {}
                for i in sharing:
                    # cutoff join: sampled chain ⋈ full access path,
                    # stop counting at the cutoff
                    probe = self.join(acc_sample, units[i])
                    score[i] = probe.df.limit(cutoff).count()
                nxt = min(sharing, key=lambda i: (score[i], cards[i], i))
            remaining.remove(nxt)
            acc = self.join(acc, units[nxt])
            acc_sample = Compiled(
                self.join(acc_sample, units[nxt]).df.limit(limit)
                .localCheckpoint(eager=True),
                acc.certain,
                acc.flat,
            )
        return acc

    def _estimate_card(self, t) -> float:
        """Estimated solutions for one (possibly as-bound) pattern from
        the store's predicate stats — count(p) scaled by 1/ndv for each
        bound position (the classic rangeCount heuristic)."""
        try:
            st = self.store.stats()
        except Exception:
            st = None
        p_iri = None
        if isinstance(t.p, Term):
            p_iri = t.p.lex
        elif isinstance(t.p, A.PathLink):
            p_iri = t.p.iri
        if st is None:
            base = 1e6
            ndv_s = ndv_o = 1e3
        elif p_iri is not None:
            n, ns, no = st["by_p"].get(p_iri, (0, 1, 1))[:3]
            base, ndv_s, ndv_o = float(max(n, 1)) if n else 0.5, float(ns), float(no)
        else:
            base = float(max(st["total"], 1))
            ndv_s = ndv_o = max(base / 10.0, 1.0)
        card = base
        if not isinstance(t.s, A.Var):
            card /= ndv_s
        if not isinstance(t.o, A.Var) and isinstance(t.o, Term):
            card /= ndv_o
        if not isinstance(t.p, (A.Var, Term, A.PathLink)):
            card *= 2  # complex path: closure expands
        return card

    # -- joins ----------------------------------------------------------------
    def join(self, l: Compiled, r: Compiled, how: str = "inner", extra=None, graph=None) -> Compiled:
        lv, rv = set(l.vars), set(r.vars)
        shared = lv & rv
        # shared vars must agree on representation so the equality keys
        # and the merged output column are well-typed; flat∩flat joins
        # on plain strings (the fast path — all BGP subject joins)
        mismatched = {v for v in shared if (v in l.flat) != (v in r.flat)}
        evs = A.expr_vars(extra) if extra is not None else set()
        # certain mixed-representation vars (object-position struct meets
        # subject-position flat — every FK chain) join on the flat
        # resource STRING: the struct side downgrades via
        # term_to_resource_key (literal → NULL key, correctly never
        # matches a resource) instead of the flat side inflating to an
        # 8-field struct hash key.  Vars the extra condition references
        # still upgrade — expressions need real term structs.
        str_key = {v for v in mismatched if v in l.certain and v in r.certain} - evs
        l = _upgrade(l, (mismatched - str_key) | (evs & l.flat))
        r = _upgrade(r, (mismatched - str_key) | (evs & r.flat))
        flat_out = (l.flat - rv) | (r.flat - lv) | (l.flat & r.flat)

        certain_shared = shared & l.certain & r.certain
        maybe_shared = shared - certain_shared

        def key(df_col: Column, is_flat: bool) -> Column:
            return df_col if is_flat else term_to_resource_key(df_col)

        rdf = r.df.select(*[F.col(v).alias(f"__r_{v}") for v in r.df.columns])
        conds = [
            key(l.df[v], v in l.flat) == key(rdf[f"__r_{v}"], v in r.flat)
            if v in str_key else l.df[v] == rdf[f"__r_{v}"]
            for v in sorted(certain_shared)
        ]
        conds += [
            l.df[v].isNull() | rdf[f"__r_{v}"].isNull() | (l.df[v] == rdf[f"__r_{v}"])
            for v in sorted(maybe_shared)
        ]

        merged_resolve = {}
        for v in lv | rv:
            if v in str_key:
                # output is the struct side; when l holds the flat repr a
                # left join's unmatched rows materialize l's value
                if v in l.flat:
                    merged_resolve[v] = F.coalesce(rdf[f"__r_{v}"], iri_col_to_term(l.df[v]))
                else:
                    merged_resolve[v] = l.df[v]
            elif v in maybe_shared:
                merged_resolve[v] = F.coalesce(l.df[v], rdf[f"__r_{v}"])
            elif v in lv:
                merged_resolve[v] = l.df[v]
            else:
                merged_resolve[v] = rdf[f"__r_{v}"]
        if extra is not None:
            exists_cols = self._exists_markers_none_check(extra)
            conds.append(F.coalesce(compile_bool(extra, merged_resolve), F.lit(False)))

        cond = None
        for c in conds:
            cond = c if cond is None else (cond & c)

        if cond is None:
            joined = l.df.crossJoin(rdf) if how == "inner" else l.df.join(rdf, F.lit(True), how)
        else:
            joined = l.df.join(rdf, cond, how)

        out_cols = [merged_resolve[v].alias(v) for v in sorted(lv | rv)]
        out = joined.select(*out_cols)
        if how == "inner":
            certain = l.certain | r.certain
        else:  # left outer
            certain = l.certain
        return Compiled(out, frozenset(certain), frozenset(flat_out))

    def _exists_markers_none_check(self, expr):
        acc: list = []
        _find_exists(expr, acc)
        if acc:
            raise NotImplementedError("EXISTS in join condition")
        return None

    def left_join(self, node: A.LeftJoin, graph) -> Compiled:
        l = self.compile_pattern(node.left, graph)
        # OPTIONAL { SERVICE … } vectors too: constraining the remote
        # fetch to the left side's bindings is sound for a left join
        # (service solutions matching no outer row would be dropped by
        # the join anyway, and non-matching outer rows null-pad either
        # way) — the reference's ServiceCallJoin is pipelined in both
        # join types
        if isinstance(node.right, A.ServicePat):
            r = self.compile_service(node.right, graph, outer=l)
        else:
            r = self.compile_pattern(node.right, graph)
        return self.join(l, r, how="left", extra=node.condition, graph=graph)

    def union(self, l: Compiled, r: Compiled) -> Compiled:
        lv, rv = set(l.vars), set(r.vars)
        # branches must agree per-var: flat survives only if flat (or
        # absent) on both sides; mixed reprs materialize to structs
        l = _upgrade(l, {v for v in l.flat if v in rv and v not in r.flat})
        r = _upgrade(r, {v for v in r.flat if v in lv and v not in l.flat})
        flat_out = (l.flat | r.flat) - ((lv - l.flat) | (rv - r.flat))
        all_vars = sorted(lv | rv)
        def pad(c: Compiled) -> DataFrame:
            cols = []
            for v in all_vars:
                if v in c.df.columns:
                    cols.append(F.col(v))
                elif v in flat_out:
                    cols.append(F.lit(None).cast("string").alias(v))
                else:
                    cols.append(SF.null_term().alias(v))
            return c.df.select(*cols)
        return Compiled(
            pad(l).unionByName(pad(r)), frozenset(l.certain & r.certain), frozenset(flat_out)
        )

    def minus(self, l: Compiled, r: Compiled) -> Compiled:
        """SPARQL MINUS (JoinTypeEnum.NotExists on compatible bindings,
        with the disjoint-domain rule: solutions with no overlapping
        bound vars survive)."""
        shared = set(l.vars) & set(r.vars)
        if not shared:
            return l
        certain_shared = shared & l.certain & r.certain
        # struct side → flat resource key BEFORE the distinct where the
        # comparison is key-based anyway (mixed certain): dedups narrow
        # strings, prunes the scan to kind+lex (see _exists_marker)
        pre_keyed = {
            v for v in certain_shared
            if (v in l.flat) != (v in r.flat) and v not in r.flat
        }
        rdf = r.df.select(*[
            (term_to_resource_key(F.col(v)) if v in pre_keyed
             else F.col(v)).alias(f"__r_{v}")
            for v in shared]).dropDuplicates()
        compat = None
        overlap = None
        for v in sorted(shared):
            lc, rc = l.df[v], rdf[f"__r_{v}"]
            # anti-join only filters l, so l's columns stay untouched;
            # mixed representations compare on the flat resource key
            # when certain (NULL key = literal, never matches — same
            # verdict as struct inequality), else the struct side wins
            # (a NULL key would masquerade as unbound in the compat test)
            mixed = (v in l.flat) != (v in r.flat)
            if v in pre_keyed:
                lc2, rc2 = lc, rc  # rc already keyed; lc already flat
            elif mixed and v in certain_shared:
                lc2 = lc if v in l.flat else term_to_resource_key(lc)
                rc2 = rc if v in r.flat else term_to_resource_key(rc)
            elif mixed:
                lc2 = iri_col_to_term(lc) if v in l.flat else lc
                rc2 = iri_col_to_term(rc) if v in r.flat else rc
            else:
                lc2, rc2 = lc, rc
            if v in certain_shared:
                c = lc2 == rc2
            else:
                c = lc2.isNull() | rc2.isNull() | (lc2 == rc2)
            compat = c if compat is None else (compat & c)
            ov = lc.isNotNull() & rc.isNotNull()
            overlap = ov if overlap is None else (overlap | ov)
        out = l.df.join(rdf, compat & overlap, "left_anti")
        return Compiled(out, l.certain, l.flat)

    # -- filter / extend / values ----------------------------------------------
    def filter(self, c: Compiled, expr, graph) -> Compiled:
        exists: list = []
        _find_exists(expr, exists)
        df = c.df
        exists_cols: dict = {}
        for ex in exists:
            df, col = self._exists_marker(Compiled(df, c.certain, c.flat), ex, graph)
            exists_cols[id(ex)] = col
        # flat vars the expression touches become real struct columns
        # first, so every field access in the compiled expression is an
        # attribute reference, not a copy of the conversion tree
        mat = A.expr_vars(expr) & c.flat
        for v in mat:
            df = df.withColumn(f"__m_{v}", iri_col_to_term(df[v]))
        resolve = {
            v: F.col(f"__m_{v}") if v in mat
            else (iri_col_to_term(df[v]) if v in c.flat else df[v])
            for v in c.vars
        }
        b = compile_bool(expr, resolve, exists_cols)
        out = df.where(F.coalesce(b, F.lit(False)))
        out = out.select(*[v for v in c.df.columns])
        return Compiled(out, c.certain, c.flat)

    def _exists_marker(self, c: Compiled, ex: A.ExistsExpr, graph):
        """Attach a boolean column answering EXISTS{pattern} per row
        (the ASTExistsOptimizer anonymous-variable trick, done with a
        semi+anti join pair so no duplication can occur)."""
        # top-level filters of the EXISTS group may correlate with OUTER
        # variables (sparql11-exists-06: FILTER(?n = ?m) where ?n binds
        # outside); peel them off, compile the rest, and fold correlated
        # filters into the join condition
        pattern = ex.pattern
        peeled = []
        while isinstance(pattern, A.FilterPat):
            peeled.append(pattern.expr)
            pattern = pattern.child
        sub = self.compile_pattern(pattern, graph)
        # partition the WHOLE peeled chain (not first-correlated-prefix —
        # a correlated filter can nest beneath a non-correlated one):
        # sub-local filters go back onto the subpattern, the rest fold
        # into the join condition as correlated predicates
        corr = []
        for e in peeled:
            if A.expr_vars(e) <= set(sub.vars):
                sub = self.filter(sub, e, graph)
            else:
                corr.append(e)
        shared_set = set(c.vars) & set(sub.vars)
        for e in corr:
            shared_set |= A.expr_vars(e) & set(sub.vars)
        shared = sorted(shared_set)
        marker = _fresh("ex")
        if not shared:
            # lazy: a 1-row nonempty probe rides the plan (global agg on
            # limit(1) always yields exactly one row), broadcast-crossed
            # onto the input — no Spark job at compile time.
            probe = (
                sub.df.limit(1)
                .groupBy()
                .agg((F.count(F.lit(1)) > 0).alias(marker))
            )
            return c.df.crossJoin(F.broadcast(probe)), F.col(marker)
        eq_shared = sorted(set(c.vars) & set(sub.vars))
        # project the struct side down to its flat resource key BEFORE
        # the distinct when the comparison is key-based anyway (mixed
        # certain, no correlated filter keeps the struct alive): the
        # distinct then dedups narrow strings instead of 8-field term
        # structs and column pruning reaches the scan (kind+lex only) —
        # q07's subquery side read all 10 statement columns for an
        # anti-join decided by the resource key.
        pre_keyed = set()
        if not corr:
            for v in eq_shared:
                if ((v in c.flat) != (v in sub.flat) and v not in sub.flat
                        and v in c.certain and v in sub.certain):
                    pre_keyed.add(v)
        keys = sub.df.select(*[
            (term_to_resource_key(F.col(v)) if v in pre_keyed
             else F.col(v)).alias(f"__r_{v}")
            for v in shared]).dropDuplicates()
        all_certain = all(v in c.certain and v in sub.certain for v in eq_shared)
        compat = None
        for v in eq_shared:
            lc, rc = c.df[v], keys[f"__r_{v}"]
            mixed = (v in c.flat) != (v in sub.flat)
            certain = v in c.certain and v in sub.certain
            if v in pre_keyed:
                pass  # rc is already the flat key; lc is already flat
            elif mixed and certain:
                # flat resource keys (literal → NULL, never matches)
                lc = lc if v in c.flat else term_to_resource_key(lc)
                rc = rc if v in sub.flat else term_to_resource_key(rc)
            elif mixed:
                lc = iri_col_to_term(lc) if v in c.flat else lc
                rc = iri_col_to_term(rc) if v in sub.flat else rc
            if certain:
                cc = lc == rc
            else:
                cc = lc.isNull() | rc.isNull() | (lc == rc)
            compat = cc if compat is None else (compat & cc)
        if corr:
            # correlated filters join outer columns with sub key columns
            resolve = {}
            for e in corr:
                for v in A.expr_vars(e):
                    if v in shared_set:
                        col = keys[f"__r_{v}"]
                        resolve[v] = iri_col_to_term(col) if v in sub.flat else col
                    elif v in c.vars:
                        col = c.df[v]
                        resolve[v] = iri_col_to_term(col) if v in c.flat else col
            for e in corr:
                b = F.coalesce(compile_bool(e, resolve, {}), F.lit(False))
                compat = b if compat is None else compat & b
            all_certain = False  # non-equi condition: keep semi+anti form
        if all_certain:
            # one-pass: the key set is distinct and equality is strict,
            # so a left join matches each input row at most once — a
            # single scan of the (possibly large) left side instead of
            # the semi+anti pair.
            flagged = keys.withColumn("__exm", F.lit(True))
            joined = c.df.join(flagged, compat, "left_outer")
            out = joined.withColumn(
                marker, F.coalesce(F.col("__exm"), F.lit(False))
            ).drop("__exm", *[f"__r_{v}" for v in shared])
            return out, F.col(marker)
        # unbound-compatible matching can hit many key rows per input
        # row, so a plain left join would duplicate.  EXISTS in the
        # projection plans an ExistenceJoin: duplication-free AND one
        # pass over the (possibly expensive) left side, where the old
        # semi+anti union pair evaluated it twice (guide §2.3, VERDICT
        # r10 #6).  The condition is rendered to SQL over two temp
        # views; falls back to the pair if rendering/resolution fails.
        try:
            if set(c.df.columns) & set(keys.columns):
                raise ValueError("ambiguous column names across sides")
            cond_sql = compat._jc.expr().sql()
            lv, rv = _fresh("exl"), _fresh("exr")
            c.df.createOrReplaceTempView(lv)
            keys.createOrReplaceTempView(rv)
            cols = ", ".join(f"`{lv}`.`{x}`" for x in c.df.columns)
            out = self.store.spark.sql(
                f"SELECT {cols}, EXISTS(SELECT 1 FROM `{rv}` WHERE {cond_sql}) "
                f"AS `{marker}` FROM `{lv}`"
            )
            return out, F.col(marker)
        except Exception:
            pos = c.df.join(keys, compat, "left_semi").withColumn(marker, F.lit(True))
            neg_ = c.df.join(keys, compat, "left_anti").withColumn(marker, F.lit(False))
            return pos.unionByName(neg_), F.col(marker)

    def extend(self, c: Compiled, var: str, expr) -> Compiled:
        # Deeply nested FuncCalls are linearized into bound temp columns
        # first: every builtin (arith promotion, comparisons) references
        # its operand Columns several times across when/otherwise
        # branches, so a nested tree like (a*(b-c))/(c*(d-a)) grows
        # EXPONENTIALLY once Catalyst's transform copies unshare the DAG
        # — deep enough expressions OOM the driver during analysis
        # (observed: BSBM BI Q4's price-ratio projection).  Separate
        # Projects stay separate because CollapseProject refuses to
        # inline a non-cheap alias referenced more than once.
        bindings, top = _linearize_expr(expr)
        df = c.df
        resolve = dict(c.resolve())
        for name, sub in bindings:
            df = df.withColumn(name, compile_expr(sub, resolve).cast(TERM_TYPE))
            resolve[name] = F.col(name)
        df = df.withColumn(var, compile_expr(top, resolve).cast(TERM_TYPE))
        if bindings:
            df = df.drop(*[n for n, _ in bindings])
        return Compiled(df, c.certain, c.flat - {var})

    def values(self, node: A.ValuesPat) -> Compiled:
        rows = []
        for row in node.rows:
            rows.append(tuple(t.as_row() if t is not None else None for t in row))
        schema_fields = [(n, TERM_TYPE) for n in node.names]
        from pyspark.sql import types as T

        schema = T.StructType([T.StructField(n, TERM_TYPE) for n in node.names])
        df = self.store.spark.createDataFrame(rows, schema)
        certain = frozenset(
            n for i, n in enumerate(node.names) if all(r[i] is not None for r in node.rows)
        )
        return Compiled(df, certain)

    # -- property paths ---------------------------------------------------------
    def compile_path_triple(self, t: A.TriplePattern, graph, seed_from: Compiled | None = None) -> Compiled:
        """Property-path pattern → DataFrame of (s, o) bindings.

        Static operators (seq/alt/inverse/negated-set) expand to plain
        DataFrame ops, mirroring the reference's
        ASTPropertyPathOptimizer.java:62; * + {n,m} run the
        ArbitraryLengthPathOp fixpoint (paths/ArbitraryLengthPathOp.java:87)
        as a driver-side semi-naive loop with localCheckpoint.
        """
        zero_orig = None
        zero_vv_inner = None  # var-var split: inner path for the zero diagonal
        zero_vv_pure = False
        if self._backchain_mem is not None:
            # backchain constant endpoints to canonical ids; variable
            # endpoints fan out at the path boundary below (the path
            # interior runs in canonical space — reachability there
            # equals materialized reachability, since canonicalization
            # merges exactly the clique-interchangeable nodes)
            t_orig = t
            t = self._canon_pattern_consts(t)
            if (isinstance(t.p, A.PathStar) and _path_zeroable(t.p)
                    and not (isinstance(t.s, A.Var) and isinstance(t.o, A.Var))):
                # ZERO-length semantics with a constant endpoint: the
                # materialized store binds the OTHER endpoint to the
                # SAME term — never to its clique (zero length is not a
                # statement, so sameAs replication can't apply).  Run
                # the ≥1-length part in canonical space (fan-out below),
                # then union one zero-length row seeded from the
                # ORIGINAL constant, un-expanded.  Top-level closures
                # only: their output is a deduplicated set, so the
                # set-union below is exact (an alternation branch would
                # need bag accounting).
                p_nz, exact = _path_split_zero(t.p)
                if exact:
                    import dataclasses as _dc

                    zero_orig = t_orig
                    if p_nz is None:  # pure-zero path (p{0,0})
                        zu = self._path_zero_unit(t_orig, *_path_ends_resource(t.p))
                        if zu is None:
                            zu = self.store.spark.range(0).select(
                                F.lit(1).alias("__unit"))
                            return Compiled(zu, frozenset())
                        names = [c for c in zu.columns if c != "__unit"]
                        flat = frozenset(n for n, d in zu.dtypes
                                         if n in names and d == "string")
                        return Compiled(zu, frozenset(names), flat)
                    t = _dc.replace(t, p=p_nz)
            elif (isinstance(t.p, A.PathStar) and _path_zeroable(t.p)
                    and isinstance(t.s, A.Var) and isinstance(t.o, A.Var)
                    and t.s.name != t.o.name):
                # var-var ZERO-length rows are a DIAGONAL — the per-column
                # fan-out below would cross-product a canonical-space
                # (c, c) row into spurious (alias_i, alias_j) pairs no
                # materialized store returns.  Split the zero part out:
                # the ≥1-length closure runs in canonical space (where
                # per-column fan-out IS correct — edge replication makes
                # every member pair reachable), and the zero diagonal is
                # rebuilt at ALIAS level below (expand the vertex SET,
                # then pair each member with itself).  Same-var patterns
                # (?x p* ?x) stay on the plain path: their single output
                # column fans out correctly.
                p_nz, exact = _path_split_zero(t.p)
                if exact:
                    import dataclasses as _dc

                    zero_vv_inner = t.p.path
                    if p_nz is None:  # pure-zero: the diagonal IS the result
                        zero_vv_pure = True
                    else:
                        t = _dc.replace(t, p=p_nz)
        s_name = t.s.name if isinstance(t.s, A.Var) else _fresh("ps")
        o_name = t.o.name if isinstance(t.o, A.Var) else _fresh("po")
        # endpoint bindings from already-joined sibling patterns widen
        # the zero-length domain (pipelined-bindings parity, ticket739)
        extra_zero = None
        if seed_from is not None:
            parts = []
            for end in (t.s, t.o):
                if isinstance(end, A.Var) and end.name in seed_from.vars:
                    col = seed_from.df[end.name]
                    key = col if end.name in seed_from.flat else _key_from_term(col)
                    parts.append(seed_from.df.select(key.alias("__n")).where(key.isNotNull()))
            if parts:
                extra_zero = parts[0]
                for p_ in parts[1:]:
                    extra_zero = extra_zero.unionByName(p_)
                extra_zero = extra_zero.dropDuplicates()
        if zero_vv_pure:
            # pure-zero var-var (p{0,0}): the alias-level diagonal IS
            # the whole result
            src_res, dst_res = _path_ends_resource(t.p)
            zu = self._path_zero_vv_diag(
                zero_vv_inner, graph, extra_zero, s_name, o_name,
                src_res, dst_res)
            flat = frozenset(
                n for n, r in ((s_name, src_res), (o_name, dst_res)) if r)
            return Compiled(zu, frozenset((s_name, o_name)), flat)
        src_b = t.s if not isinstance(t.s, A.Var) else None
        dst_b = t.o if not isinstance(t.o, A.Var) else None
        pairs = self._path_pairs(t.p, graph, src_b, dst_b, extra_zero)
        df = pairs.toDF("__src", "__dst") if pairs.columns != ["__src", "__dst"] else pairs
        # endpoints are flat keys: constant filters and the same-var
        # constraint compare strings, never structs
        conds = []
        if not isinstance(t.s, A.Var):
            conds.append(F.col("__src") == _key_from_term(term_lit(t.s)))
        if not isinstance(t.o, A.Var):
            conds.append(F.col("__dst") == _key_from_term(term_lit(t.o)))
        for c in conds:
            df = df.where(c)
        src_res, dst_res = _path_ends_resource(t.p)
        proj = []
        names: list[str] = []
        flat: set[str] = set()
        if isinstance(t.s, A.Var):
            col = F.col("__src") if src_res else _term_from_key(F.col("__src"))
            proj.append(col.alias(s_name))
            names.append(s_name)
            if src_res:
                flat.add(s_name)
        if isinstance(t.o, A.Var):
            if isinstance(t.s, A.Var) and t.o.name == t.s.name:
                df = df.where(F.col("__src") == F.col("__dst"))
            else:
                col = F.col("__dst") if dst_res else _term_from_key(F.col("__dst"))
                proj.append(col.alias(o_name))
                names.append(o_name)
                if dst_res:
                    flat.add(o_name)
        if not proj:
            proj = [F.lit(1).alias("__unit")]
        out = df.select(*proj)
        unit = Compiled(out, frozenset(names), frozenset(flat))
        if self._backchain_mem is not None:
            unit = self._backchain_expand(unit, t)
        if zero_orig is not None:
            zu = self._path_zero_unit(zero_orig, src_res, dst_res)
            if zu is not None:
                # a top-level closure's output is a deduplicated set, so
                # set-union the zero-length row (which a ≥1-length cycle
                # may independently reach)
                unit = Compiled(unit.df.unionByName(zu).dropDuplicates(),
                                unit.certain, unit.flat)
        if zero_vv_inner is not None:
            # var-var: union the alias-level zero diagonal (set
            # semantics at the closure boundary, as above)
            zu = self._path_zero_vv_diag(
                zero_vv_inner, graph, extra_zero, s_name, o_name,
                src_res, dst_res)
            unit = Compiled(unit.df.unionByName(zu).dropDuplicates(),
                            unit.certain, unit.flat)
        return unit

    def _path_zero_vv_diag(self, inner, graph, extra_zero, s_name, o_name,
                           src_res: bool, dst_res: bool) -> DataFrame:
        """The var-var ZERO-length diagonal over a canonical store, at
        ALIAS level: the inner path's edge vertices (canonical space)
        fan out across their cliques as a SET — then each member pairs
        with ITSELF (ZeroLengthPathOp.java:53 binds both endpoints to
        the same term; the materialized store's edge replication makes
        every clique member a vertex, so the expanded vertex SET is the
        materialized vertex set).  Sibling-pipelined endpoint bindings
        (ticket739) join the domain as bound — already alias-level."""
        from bigdata_old_spark.inference import expand_member_bindings

        e = self._path_pairs(inner, graph)
        verts = (e.select(F.col("__src").alias("__n"))
                 .unionByName(e.select(F.col("__dst").alias("__n"))))
        verts = expand_member_bindings(
            verts, self._backchain_mem, [("__n", True)])
        if extra_zero is not None:
            verts = verts.unionByName(extra_zero)
        verts = verts.dropDuplicates()
        scol = F.col("__n") if src_res else _term_from_key(F.col("__n"))
        ocol = F.col("__n") if dst_res else _term_from_key(F.col("__n"))
        return verts.select(scol.alias(s_name), ocol.alias(o_name))

    def _path_zero_unit(self, t: A.TriplePattern, src_res: bool, dst_res: bool):
        """The zero-length solution row of a zeroable path whose pattern
        has ≥1 constant endpoint — built from the ORIGINAL constants
        (ZeroLengthPathOp.java:53: a bound endpoint binds the other to
        the SAME term; the sameAs backchain never expands it, because a
        zero-length path is not a statement).  Returns None when there
        is no zero-length solution (two distinct constants)."""
        one = self.store.spark.range(1)
        if isinstance(t.s, A.Var) and not isinstance(t.o, A.Var):
            name, res, const = t.s.name, src_res, t.o
        elif isinstance(t.o, A.Var) and not isinstance(t.s, A.Var):
            name, res, const = t.o.name, dst_res, t.s
        else:  # both constant: solution iff the very same term
            if t.s.as_row() == t.o.as_row():
                return one.select(F.lit(1).alias("__unit"))
            return None
        if res:
            col = _key_from_term(term_lit(const))
        elif const.kind == KIND_LITERAL:
            # same construction as _term_from_key's literal branch (a
            # foldable literal routed through the split-decode trips
            # constant folding on the out-of-range array probe)
            tl = term_lit(const)
            col = SF.term_from_flat(
                F.lit(KIND_LITERAL).cast("byte"), tl["lex"],
                tl["dt"], tl["lang"], tl["dtm"])
        else:
            flat = const.lex if const.kind == KIND_IRI else "_:" + const.lex
            col = iri_col_to_term(F.lit(flat))
        return one.select(col.alias(name))

    def _path_pairs(
        self,
        p,
        graph,
        src_bound: Term | None = None,
        dst_bound: Term | None = None,
        extra_zero: DataFrame | None = None,
    ) -> DataFrame:
        """Compile a path expression to a (src key, dst key) pair DF —
        both columns flat strings (see _PK_LIT), so every seq join,
        closure frontier join, dedup and anti-join in the path machinery
        hashes compact strings, never 8-field term structs.

        ``src_bound``/``dst_bound`` are the constant terms adjacent to
        THIS subexpression's endpoints, threaded positionally through
        seq/alt/inverse — NOT the triple's endpoints (a closure nested
        mid-sequence must not seed from the triple object; reference
        ticket 734's workaround forms are exactly that shape)."""
        if isinstance(p, Term):
            p = A.PathLink(p.lex)
        if isinstance(p, A.PathLink):
            df = self._scan(graph, p.iri).where(F.col("p") == p.iri)
            if src_bound is not None:
                df = df.where(F.col("s") == _key_from_term(term_lit(src_bound)))
            return df.select(F.col("s").alias("__src"), _key_from_obj().alias("__dst"))
        if isinstance(p, A.PathInv):
            inner = self._path_pairs(p.path, graph, dst_bound, src_bound)
            return inner.select(F.col("__dst").alias("__src"), F.col("__src").alias("__dst"))
        if isinstance(p, A.PathAlt):
            parts = [self._path_pairs(a, graph, src_bound, dst_bound) for a in p.alts]
            out = parts[0]
            for d in parts[1:]:
                out = out.unionByName(d)
            return out
        if isinstance(p, A.PathSeq):
            n = len(p.steps)
            out = self._path_pairs(
                p.steps[0], graph, src_bound, dst_bound if n == 1 else None
            )
            zacc = _path_zeroable(p.steps[0])
            for i, step in enumerate(p.steps[1:], start=2):
                raw = self._path_pairs(step, graph, None, dst_bound if i == n else None)
                nxt = raw.select(F.col("__src").alias("__m"), F.col("__dst").alias("__nd"))
                joined = (
                    out.join(nxt, out["__dst"] == nxt["__m"])
                    .select(out["__src"].alias("__src"), nxt["__nd"].alias("__dst"))
                )
                parts = [joined]
                # a zero-length-capable step is skippable: pass the
                # accumulated pairs through unchanged.  The closure's own
                # vertex-domain zero pairs miss nodes outside ITS edge
                # set (e.g. `noSuchProp?` mid-seq — ticket-734
                # workaround4), so handle skippability algebraically.
                if _path_zeroable(step):
                    parts.append(out)
                # dually, a fully-zeroable accumulated prefix admits the
                # step's own pairs as the whole result so far
                if zacc:
                    parts.append(raw)
                if len(parts) > 1:
                    u = parts[0]
                    for d in parts[1:]:
                        u = u.unionByName(d)
                    out = u.dropDuplicates()
                else:
                    out = joined
                zacc = zacc and _path_zeroable(step)
            return out
        if isinstance(p, A.PathNeg):
            scans = []
            base = self._scan(graph)
            fwd = base
            if p.forward_iris:
                fwd = fwd.where(~F.col("p").isin(*p.forward_iris))
            scans.append(fwd.select(F.col("s").alias("__src"), _key_from_obj().alias("__dst")))
            if p.inverse_iris:
                inv = base.where(~F.col("p").isin(*p.inverse_iris))
                scans.append(inv.select(_key_from_obj().alias("__src"), F.col("s").alias("__dst")))
                if not p.forward_iris:
                    scans.pop(0)
            out = scans[0]
            for d in scans[1:]:
                out = out.unionByName(d)
            return out
        if isinstance(p, A.PathStar):
            return self._path_closure(p, graph, src_bound, dst_bound, extra_zero)
        raise NotImplementedError(f"path {type(p)}")

    def _path_closure(
        self,
        p: A.PathStar,
        graph,
        src_bound: Term | None = None,
        dst_bound: Term | None = None,
        extra_zero: DataFrame | None = None,
    ) -> DataFrame:
        # the closure's edge relation is the FULL inner-path pair set —
        # endpoint bounds seed the fixpoint below, they never filter edges
        self.eager_compiled = True  # driver-side fixpoint at compile time
        edges = self._path_pairs(p.path, graph).dropDuplicates().localCheckpoint(eager=True)
        min_len, max_len = p.min_len, p.max_len

        seed_term = None
        seed_side = None
        if src_bound is not None:
            seed_term, seed_side = src_bound, "src"
        elif dst_bound is not None:
            seed_term, seed_side = dst_bound, "dst"

        if seed_term is not None:
            # frontier expansion from the constant endpoint — the common,
            # scalable case (BFS from one node instead of full closure)
            if seed_side == "dst":
                edges = edges.select(F.col("__dst").alias("__src"), F.col("__src").alias("__dst"))
            seed = edges.sparkSession.range(1).select(
                _key_from_term(term_lit(seed_term)).alias("__dst")
            )
            reached = seed.select(F.col("__dst")) if min_len == 0 else None
            frontier = seed
            depth = 0
            acc = reached
            while max_len is None or depth < max_len:
                nxt = (
                    frontier.join(edges, frontier["__dst"] == edges["__src"])
                    .select(edges["__dst"].alias("__dst"))
                    .dropDuplicates()
                )
                depth += 1
                if acc is not None:
                    nxt = nxt.join(acc, nxt["__dst"] == acc["__dst"], "left_anti")
                nxt = nxt.localCheckpoint(eager=True)
                if nxt.isEmpty():
                    break
                if depth >= min_len or (min_len <= 1 and depth >= 1):
                    acc = nxt if acc is None else acc.unionByName(nxt).localCheckpoint(eager=True)
                frontier = nxt
            if acc is None:
                acc = seed.limit(0)
            src_lit = _key_from_term(term_lit(seed_term))
            out = acc.select(src_lit.alias("__src"), F.col("__dst"))
            if seed_side == "dst":
                out = out.select(F.col("__dst").alias("__src"), F.col("__src").alias("__dst"))
            return out

        # var-var: full pair closure (semi-naive)
        result = edges if max_len is None or max_len >= 1 else edges.limit(0)
        frontier = edges
        depth = 1
        while (max_len is None or depth < max_len) and not frontier.isEmpty():
            step = (
                frontier.alias("f")
                .join(edges.alias("e"), F.col("f.__dst") == F.col("e.__src"))
                .select(F.col("f.__src").alias("__src"), F.col("e.__dst").alias("__dst"))
                .dropDuplicates()
            )
            new = step.join(result, ["__src", "__dst"], "left_anti").localCheckpoint(eager=True)
            if new.isEmpty():
                break
            result = result.unionByName(new).localCheckpoint(eager=True)
            frontier = new
            depth += 1
        if min_len == 0:
            # Reference semantics (ZeroLengthPathOp over the path's edge
            # relation, TestPropertyPaths test_inVar_outVar_noSharedVars):
            # var-var zero-length endpoints range over the VERTICES OF
            # THE PATH'S EDGE SET, not every term in the graph — a
            # deliberate deviation from the strict W3C ALP definition
            # that bigdata ships, and vastly cheaper at scale (no
            # all-graph-nodes cross).
            verts = (
                edges.select(F.col("__src").alias("__n"))
                .unionByName(edges.select(F.col("__dst").alias("__n")))
            )
            if extra_zero is not None:
                # endpoints already bound by sibling patterns also admit
                # the zero-length solution (pipelined bindings parity)
                verts = verts.unionByName(extra_zero)
            verts = verts.dropDuplicates()
            zero = verts.select(F.col("__n").alias("__src"), F.col("__n").alias("__dst"))
            result = zero.unionByName(result).dropDuplicates()
        return result


    # -- query forms -------------------------------------------------------------
    def compile_select(self, q: A.SelectQuery) -> DataFrame:
        # WITH {…} AS %name: evaluate each named subquery ONCE, up
        # front, in its own bottom-up scope (localCheckpoint materializes
        # the solution set and cuts lineage — every INCLUDE then reads
        # the stored set instead of recomputing the subtree, exactly the
        # reference's evaluate-once named-solution-set contract).  Later
        # named subqueries may INCLUDE earlier ones (declaration order).
        for name, pat in q.named:
            self.eager_compiled = True  # materialized at compile time
            nc = self.compile_pattern(pat)
            self._named_sets[name] = Compiled(
                nc.df.localCheckpoint(eager=True), nc.certain, nc.flat
            )
        c = self._compile_with_values(q.pattern, q.values)

        has_agg = bool(q.group_by)
        agg_nodes: list = []
        for _, e in q.projection:
            if e is not None:
                _find_aggregates(e, agg_nodes)
        for e in q.having:
            _find_aggregates(e, agg_nodes)
        for e, _ in q.order_by:
            _find_aggregates(e, agg_nodes)
        has_agg = has_agg or bool(agg_nodes)

        if has_agg:
            c, resolve = self._aggregate(c, q, agg_nodes)
        else:
            resolve = c.resolve()

        df = c.df

        # materialize flat vars referenced by projection / HAVING /
        # ORDER BY expressions into struct columns (attribute refs)
        used: set[str] = set()
        for _, e in q.projection:
            if e is not None:
                used |= A.expr_vars(e)
        for e in q.having:
            used |= A.expr_vars(e)
        for e, _ in q.order_by:
            used |= A.expr_vars(e)
        for v in used & c.flat:
            df = df.withColumn(f"__m_{v}", iri_col_to_term(F.col(v)))
            resolve = dict(resolve)
            resolve[v] = F.col(f"__m_{v}")

        # projection expressions (SELECT (expr AS ?v) …), evaluated in order
        proj_names: list[str] = []
        if q.wildcard:
            # SELECT * excludes non-distinguished (bnode-sugar) vars
            pool = c.vars if not has_agg else [k for k in resolve if isinstance(k, str)]
            proj_names = sorted(v for v in pool if not v.startswith("_bnode_"))
            for v in proj_names:
                if v not in df.columns:
                    df = df.withColumn(v, resolve[v].cast(TERM_TYPE))
        else:
            for name, e in q.projection:
                if e is None:
                    col = resolve.get(name)
                    col = col if col is not None else SF.null_term()
                else:
                    # linearize deep FuncCall nesting (see extend())
                    bindings, top = _linearize_expr(e)
                    for bn, sub in bindings:
                        df = df.withColumn(bn, compile_expr(sub, resolve).cast(TERM_TYPE))
                        resolve = dict(resolve)
                        resolve[bn] = F.col(bn)
                    col = compile_expr(top, resolve)
                    if bindings:
                        df = df.withColumn(f"__proj_{name}", col.cast(TERM_TYPE)).drop(
                            *[bn for bn, _ in bindings]
                        )
                        resolve = dict(resolve)
                        resolve[name] = F.col(f"__proj_{name}")
                        proj_names.append(name)
                        continue
                df = df.withColumn(f"__proj_{name}", col.cast(TERM_TYPE))
                resolve = dict(resolve)
                resolve[name] = F.col(f"__proj_{name}")
                proj_names.append(name)

        # HAVING (aggregates already materialized into resolve)
        for e in q.having:
            b = compile_bool(e, resolve)
            df = df.where(F.coalesce(b, F.lit(False)))

        # ORDER BY before projection-rename (may reference non-projected vars)
        if q.order_by:
            sort_cols = []
            for i, (e, asc) in enumerate(q.order_by):
                bindings, top = _linearize_expr(e)
                rs = resolve
                for bn, sub in bindings:
                    df = df.withColumn(f"__s{i}{bn}", compile_expr(sub, rs).cast(TERM_TYPE))
                    rs = dict(rs)
                    rs[bn] = F.col(f"__s{i}{bn}")
                k = SF.order_key(compile_expr(top, rs))
                df = df.withColumn(f"__sort_{i}", k)
                if bindings:
                    df = df.drop(*[f"__s{i}{bn}" for bn, _ in bindings])
                sort_cols.append(F.col(f"__sort_{i}").asc() if asc else F.col(f"__sort_{i}").desc())
            df = df.orderBy(*sort_cols)

        # final materialization: any var still in flat representation
        # becomes a term struct here (the ChunkedMaterializationOp at the
        # pipeline end, before results leave the engine).  DISTINCT (no
        # ORDER BY) dedups BEFORE materializing — the flat↔struct mapping
        # is injective, so dedup commutes, and the exchange hashes
        # strings instead of structs.
        flatp = {
            n for n in proj_names
            if n in c.flat and (q.wildcard or f"__proj_{n}" not in df.columns)
        }
        proj_cols = [
            F.col(f"__proj_{n}").alias(n)
            if not q.wildcard and f"__proj_{n}" in df.columns
            else F.col(n).alias(n)
            for n in proj_names
        ]
        distinct_ordered_done = False
        if (q.distinct or q.reduced) and q.order_by:
            # ORDER BY may reference non-projected vars (ticket563): keep
            # each distinct projected row's best sort key through the
            # dedup, then order by it — DISTINCT preserving the
            # pre-projection sort, like the reference's order-preserving
            # distinct.  Uniform sort direction folds into one min/max;
            # mixed asc/desc falls back to a post-dedup re-sort.
            asc_all = all(asc for _, asc in q.order_by)
            desc_all = all(not asc for _, asc in q.order_by)
            sort_structs = [F.col(f"__sort_{i}") for i in range(len(q.order_by))]
            if asc_all or desc_all:
                agg = (F.min if asc_all else F.max)(F.struct(*sort_structs)).alias("__best")
                out = (
                    df.select(*proj_cols, *sort_structs)
                    .groupBy(*proj_names)
                    .agg(agg)
                    .orderBy(F.col("__best").asc() if asc_all else F.col("__best").desc())
                    .drop("__best")
                )
                distinct_ordered_done = True
        if not distinct_ordered_done:
            out = df.select(*proj_cols)
            if (q.distinct or q.reduced) and not q.order_by:
                out = out.dropDuplicates()
        out = out.select(*[
            (iri_col_to_term(F.col(n)) if n in flatp else F.col(n)).alias(n)
            for n in proj_names
        ])

        if (q.distinct or q.reduced) and q.order_by and not distinct_ordered_done:
            # dropDuplicates would shuffle away the order; re-sort after
            out = out.dropDuplicates()
            keys = []
            for e, asc in q.order_by:
                r2 = {v: out[v] for v in out.columns}
                try:
                    k = SF.order_key(compile_expr(e, r2))
                except Exception:
                    continue
                keys.append(k.asc() if asc else k.desc())
            if keys:
                out = out.orderBy(*keys)

        if q.offset:
            out = out.offset(q.offset)
        if q.limit is not None:
            out = out.limit(q.limit)
        return out

    def _aggregate(self, c: Compiled, q: A.SelectQuery, agg_nodes: list):
        df = c.df
        resolve_in = c.resolve()
        group_names: list[str] = []   # output column names (var/alias)
        key_cols: list[str] = []      # actual groupBy key columns
        struct_groups: list[str] = []  # group vars carried as term structs
        resolve_out: dict = {}
        flat_groups: set[str] = set()
        if q.group_by:
            for i, (alias, e) in enumerate(q.group_by):
                if isinstance(e, A.Var) and alias is None:
                    name = e.name
                    if name not in df.columns:
                        df = df.withColumn(name, SF.null_term())
                    group_names.append(name)
                    if name in c.flat:
                        # flat group vars group on the plain string (cheap
                        # hash keys); materialized only if projected
                        key_cols.append(name)
                        flat_groups.add(name)
                        resolve_out[name] = iri_col_to_term(F.col(name))
                    else:
                        struct_groups.append(name)
                        resolve_out[name] = F.col(name)
                else:
                    name = alias or _fresh("gk")
                    df = df.withColumn(name, compile_expr(e, resolve_in).cast(TERM_TYPE))
                    group_names.append(name)
                    struct_groups.append(name)
                    resolve_out[name] = F.col(name)

        # Struct-typed group keys (literal objects, computed keys) group on
        # a single delimiter-encoded string — kind␟dt␟lang␟dtm␟lex, which
        # is injective: num/dbl/bool are parsed from lex+dt by every
        # constructor, dtm is included exactly (datetime lex truncates to
        # seconds), and lex goes last so embedded separators stay intact
        # under split(limit=5).  The struct is rebuilt from the key after
        # the aggregate.  One string rides through the joins and the
        # exchange instead of an 8-field struct, and the agg stays a
        # HashAggregate (a first(struct) buffer would force the
        # SortAggregate fallback).  Same commute argument as the DISTINCT
        # flat-key path (6c62bda).
        drop_keys: list[str] = []
        for name in struct_groups:
            k = f"__gk_{name}"
            t = F.col(name)
            df = df.withColumn(k, F.when(t.isNotNull(), F.concat_ws(
                _GK_SEP,
                t["kind"].cast("string"),
                F.coalesce(t["dt"], F.lit("")),
                F.coalesce(t["lang"], F.lit("")),
                F.coalesce(t["dtm"].cast("string"), F.lit("")),
                t["lex"],
            )))
            key_cols.append(k)
            drop_keys.append(k)

        # Materialize each aggregate's input expression as one projected
        # column BEFORE the groupBy (ChunkedMaterializationOp analog for
        # value expressions): the aggregate functions then reference a
        # plain column instead of inlining the full constructor/promotion
        # expression 4-6× each — smaller codegen units, one evaluation
        # per row.
        aggs = []
        seen: dict = {}
        for node in agg_nodes:
            if id(node) in seen:
                continue
            name = _fresh("agg")
            seen[id(node)] = name
            col = None
            if node.expr is not None:
                in_name = _fresh("agg_in")
                df = df.withColumn(in_name, compile_expr(node.expr, resolve_in))
                col = F.col(in_name)
            aggs.append(self._agg_expr(node, col).alias(name))
        if not aggs:
            aggs = [F.count(F.lit(1)).alias(_fresh("agg_dummy"))]

        gdf = df.groupBy(*[F.col(g) for g in key_cols]).agg(*aggs) if key_cols else df.groupBy().agg(*aggs)
        for name in struct_groups:
            parts = F.split(F.col(f"__gk_{name}"), _GK_SEP, 5)
            gdf = gdf.withColumn(name, SF.term_from_flat(
                parts[0].cast("byte"),
                parts[4],
                F.when(parts[1] != "", parts[1]),
                F.when(parts[2] != "", parts[2]),
                F.when(parts[3] != "", parts[3]).cast("timestamp")))
        if drop_keys:
            gdf = gdf.drop(*drop_keys)

        resolve = dict(resolve_out)
        for node in agg_nodes:
            resolve[("agg", id(node))] = F.col(seen[id(node)])
        certain = frozenset(g for g in group_names)
        return Compiled(gdf, certain, frozenset(flat_groups)), resolve

    @staticmethod
    def _static_rank(e):
        """Static numeric-rank inference (0 int / 1 decimal / 2 float /
        3 double, None unknown) — lets statically-typed aggregates skip
        the runtime promotion + sticky-error machinery (the analog of
        the reference's IV type annotations on value expressions)."""
        from bigdata_old_spark.model import INTEGER_DTS, XSD_DECIMAL, XSD_DOUBLE, XSD_FLOAT

        def rank_of_dt(dt):
            if dt in INTEGER_DTS:
                return 0
            if dt == XSD_DECIMAL:
                return 1
            if dt == XSD_FLOAT:
                return 2
            if dt == XSD_DOUBLE:
                return 3
            return None

        if isinstance(e, A.Const):
            return rank_of_dt(e.term.dt)
        if isinstance(e, A.FuncCall):
            n = e.name
            if n.startswith("http://www.w3.org/2001/XMLSchema#"):
                return rank_of_dt(n)
            if n in ("+", "-", "*", "/"):
                ranks = [QueryCompiler._static_rank(a) for a in e.args]
                if all(r is not None for r in ranks):
                    r = max(ranks)
                    return max(r, 1) if n == "/" else r
        return None

    def _agg_expr(self, node: A.Aggregate, col: Column | None) -> Column:
        """One SPARQL aggregate → a Spark aggregate expression returning a
        term struct (reference bop/rdf/aggregate/COUNT|SUM|AVERAGE|MIN|
        MAX|SAMPLE|GROUP_CONCAT.java).  ``col`` is the aggregate's input
        term expression, already materialized as a projected column by
        ``_aggregate`` (None for COUNT(*))."""
        n = node.name.upper()

        if n == "COUNT":
            if col is None:
                v = F.count(F.lit(1))
            elif node.distinct:
                v = F.count_distinct(col)
            else:
                v = F.count(col)
            return SF.integer_term(v)

        if n in ("SUM", "AVG"):
            srank = self._static_rank(node.expr)
            if srank is not None and not node.distinct:
                # statically-typed input → single-column aggregate.  The
                # value column can still be NULL on a BOUND input (a
                # failed cast, e.g. xsd:decimal("abc")) — that is a type
                # error and must poison the whole aggregate to unbound,
                # exactly like the dynamic path (reference SUM.java:53).
                vcol = col["num"] if srank <= 1 else col["dbl"]
                err = F.max(F.when(col.isNotNull() & vcol.isNull(), 1).otherwise(0))
                if srank <= 1:
                    s, cnt = F.sum(col["num"]), F.count(col["num"])
                    if n == "AVG":
                        v = (s / F.when(cnt != 0, cnt)).cast("decimal(38,18)")
                        ok = F.when(cnt == 0, SF.integer_term(F.lit(0))).otherwise(SF.decimal_term(v))
                    elif srank == 0:
                        ok = SF.integer_term(F.coalesce(s, F.lit(0)))
                    else:
                        ok = F.when(cnt == 0, SF.integer_term(F.lit(0))).otherwise(SF.decimal_term(s))
                else:
                    s, cnt = F.sum(col["dbl"]), F.count(col["dbl"])
                    v = s / F.when(cnt != 0, cnt) if n == "AVG" else s
                    ok = F.when(cnt == 0, SF.integer_term(F.lit(0))).otherwise(SF.double_term(v))
                return F.when(err == 1, SF.null_term()).otherwise(ok)
            err = F.max(F.when(col.isNotNull() & col["dbl"].isNull(), 1).otherwise(0))
            rank = F.max(SF._num_rank(col))
            if node.distinct:
                # SPARQL Distinct(M) removes duplicate TERMS, not values:
                # "1"^^xsd:integer and "01"^^xsd:integer both contribute.
                # Dedup on the flat term key (collect_set of a slim
                # (key, num, dbl) struct), then fold the set — err/rank
                # above are max-style and thus dedup-invariant.
                item = F.when(
                    col.isNotNull(),
                    F.struct(
                        _key_from_term(col).alias("k"),
                        col["num"].alias("num"),
                        col["dbl"].alias("dbl"),
                    ),
                )
                vals = F.collect_set(item)
                cnt = cnt_dbl = F.size(vals)
                dec0 = F.lit(0).cast("decimal(38,18)")
                s_num = F.aggregate(
                    vals, dec0, lambda acc, x: (acc + x["num"]).cast("decimal(38,18)")
                )
                s_dbl = F.aggregate(vals, F.lit(0.0), lambda acc, x: acc + x["dbl"])
                s_num = F.when(cnt != 0, s_num)
                s_dbl = F.when(cnt_dbl != 0, s_dbl)
            else:
                s_num, s_dbl = F.sum(col["num"]), F.sum(col["dbl"])
                cnt = F.count(col["num"])
                cnt_dbl = F.count(col["dbl"])
            if n == "AVG":
                v_exact = (s_num / F.when(cnt != 0, cnt)).cast("decimal(38,18)")
                v_dbl = s_dbl / F.when(cnt_dbl != 0, cnt_dbl)
            else:
                v_exact, v_dbl = s_num, s_dbl
            exact_term = (
                F.when(rank <= 0, SF.integer_term(F.coalesce(v_exact, F.lit(0))))
                .when(rank == 1, SF.decimal_term(v_exact))
                .otherwise(SF.double_term(v_dbl))
            )
            # sticky type error (reference SUM.java:53): any non-numeric
            # bound value in the group poisons the aggregate → unbound
            return (
                F.when(err == 1, SF.null_term())
                .when(rank.isNull(), SF.integer_term(F.lit(0)))
                .otherwise(exact_term)
            )

        if n in ("MIN", "MAX"):
            pair = F.when(col.isNotNull(), F.struct(SF.order_key(col).alias("k"), col.alias("v")))
            agg = F.min(pair) if n == "MIN" else F.max(pair)
            return agg["v"]

        if n == "SAMPLE":
            return F.first(col, ignorenulls=True)

        if n == "GROUP_CONCAT":
            if node.distinct:
                # distinct TERMS — "a"@en and "a"@fr both contribute an
                # "a"; dedup on the flat term key, then keep the lex
                items = F.collect_set(
                    F.when(
                        col.isNotNull(),
                        F.struct(_key_from_term(col).alias("k"), col["lex"].alias("lex")),
                    )
                )
                vals = F.transform(items, lambda x: x["lex"])
            else:
                vals = F.collect_list(col["lex"])
            # SPARQL leaves concatenation order implementation-defined;
            # sorting makes results deterministic across shuffles (and
            # oracle-comparable)
            return SF.string_term(F.array_join(F.sort_array(vals), node.separator))

        from bigdata_old_spark.registry import lookup_aggregate

        custom = lookup_aggregate(node.name)
        if custom is not None:
            return custom(col, node.distinct)

        raise NotImplementedError(f"aggregate {n}")

    def compile_subselect(self, q: A.SelectQuery) -> Compiled:
        df = self.compile_select(q)
        inner = self.compile_pattern(q.pattern)
        if q.wildcard:
            certain = inner.certain
        else:
            certain = frozenset(n for n, e in q.projection if e is None) & inner.certain
        return Compiled(df, certain)

    def _compile_with_values(self, pattern, values) -> Compiled:
        """Compile a pattern with a trailing VALUES/BINDINGS block
        SEEDED at the pipeline start, mirroring the reference's
        evaluation (incoming bindings feed the leftmost operator, so
        OPTIONAL/MINUS right sides see the restriction —
        sparql11-bindings-04: an OPTIONAL that fails under the seeded
        binding leaves the VALUES binding in force, where a post-join
        would drop the row)."""
        if values is None:
            return self.compile_pattern(pattern)

        def seed(node):
            if isinstance(node, (A.LeftJoin, A.MinusPat)):
                import dataclasses

                return dataclasses.replace(node, left=seed(node.left))
            if isinstance(node, A.Join):
                import dataclasses

                return dataclasses.replace(node, left=seed(node.left))
            if isinstance(node, A.FilterPat):
                import dataclasses

                return dataclasses.replace(node, child=seed(node.child))
            return A.Join(values, node)

        return self.compile_pattern(seed(pattern))

    def compile_ask(self, q: A.AskQuery) -> DataFrame:
        c = self._compile_with_values(q.pattern, q.values)
        nonempty = len(c.df.take(1)) > 0
        return self.store.spark.createDataFrame([(nonempty,)], "ask boolean")

    def compile_construct(self, q: A.ConstructQuery) -> DataFrame:
        """CONSTRUCT template instantiation (ASTConstructIterator.java:88)
        → a statements-shaped DataFrame of term structs."""
        c = self.compile_pattern(q.pattern)
        df = c.df
        if q.offset:
            df = df.offset(q.offset)
        if q.limit is not None:
            df = df.limit(q.limit)
        # per-solution fresh bnodes for template bnodes
        df = df.withColumn("__row", F.expr("uuid()"))
        resolve = {v: (iri_col_to_term(df[v]) if v in c.flat else df[v]) for v in c.vars}
        outs = []
        for tp in q.template:
            def pos(x, role):
                from bigdata_old_spark.model import mk_term_col

                if isinstance(x, A.Var):
                    if x.name not in c.vars and x.name.startswith("_bnode_"):
                        # template [...] / _:b parsed as an anon var but
                        # never bound by the WHERE pattern: a CONSTRUCT
                        # template bnode, fresh per solution
                        # (ASTConstructIterator bnode handling,
                        # dawg-construct-reification-1)
                        return mk_term_col(
                            kind=F.lit(KIND_BNODE),
                            lex=F.concat(F.lit(x.name + "-"), F.col("__row")),
                        )
                    return resolve.get(x.name, SF.null_term())
                if x.kind == 1:  # template bnode → fresh per solution
                    return mk_term_col(kind=F.lit(KIND_BNODE), lex=F.concat(F.lit(x.lex + "-"), F.col("__row")))
                return term_lit(x)

            s, p, o = pos(tp.s, "s"), pos(tp.p, "p"), pos(tp.o, "o")
            valid = (
                s.isNotNull() & p.isNotNull() & o.isNotNull()
                & (s["kind"] != KIND_LITERAL) & (p["kind"] == 0)
            )
            outs.append(df.where(valid).select(s.alias("s"), p.alias("p"), o.alias("o")))
        out = outs[0]
        for d in outs[1:]:
            out = out.unionByName(d)
        return out.dropDuplicates()

    def compile_describe(self, q: A.DescribeQuery) -> DataFrame:
        """DESCRIBE with the reference's mode set
        (DescribeModeEnum.java:47-127):

          ForwardOneStep    — statements whose subject is a described node
          CBD               — ForwardOneStep + recursive closure through
                              blank-node OBJECTS (Concise Bounded
                              Description, the reference default)
          SymmetricOneStep  — ForwardOneStep + statements whose OBJECT is
                              a described node
          SCBD              — SymmetricOneStep + bnode closure in both
                              directions
        """
        spark = self.store.spark
        self.eager_compiled = True  # expansion may run jobs at compile time
        var_names = [t.name for t in q.terms if isinstance(t, A.Var)]
        const_rows = [(t.lex,) for t in q.terms if isinstance(t, Term)]
        nodes = None
        if q.pattern is not None:
            # always compile the pattern — even an all-constant DESCRIBE
            # carries hint: triples (describe-SymmetricOneStep-1.rq)
            c = self.compile_pattern(q.pattern)
            for v in var_names:
                vcol = F.col(v) if v in c.flat else term_to_iri_string(F.col(v))
                d = c.df.select(vcol.alias("__s")).where(F.col("__s").isNotNull())
                nodes = d if nodes is None else nodes.unionByName(d)
        if const_rows:
            cdf = spark.createDataFrame(const_rows, "__s string")
            nodes = cdf if nodes is None else nodes.unionByName(cdf)
        nodes = nodes.dropDuplicates()
        # hints are collected while compiling the pattern, so the mode
        # hint is resolved after it.  Default mode matches the reference
        # (QueryHints.DEFAULT_DESCRIBE_MODE = SymmetricOneStep).
        mode = (
            self.hints.get("describeMode")
            or getattr(q, "mode", None)
            or "SymmetricOneStep"
        )
        self.cache_carry_safe = False  # DESCRIBE expands over all predicates
        stmts = self.store.statements
        symmetric = mode in ("SymmetricOneStep", "SCBD")
        bnode_closure = mode in ("CBD", "SCBD")
        # cutoff semantics (CBD.java:299-312, QueryHints.java:509-525):
        # abort expansion iff BOTH the iteration limit AND the statement
        # limit are exceeded; 0 means unlimited.  Defaults 5 / 5000.
        iter_limit = int(self.hints.get("describeIterationLimit", 5)) or (1 << 31)
        stmt_limit = int(self.hints.get("describeStatementLimit", 5000)) or (1 << 31)

        def step(ns: DataFrame) -> DataFrame:
            fwd = stmts.join(F.broadcast(ns), stmts["s"] == ns["__s"], "left_semi")
            if not symmetric:
                return fwd
            okey = (
                F.when(F.col("o_kind") == 1, F.concat(F.lit("_:"), F.col("o_lex")))
                .otherwise(F.col("o_lex"))
            )
            rev = (
                stmts.where(F.col("o_kind") != 2)
                .join(F.broadcast(ns), okey == ns["__s"], "left_semi")
            )
            return fwd.unionByName(rev).dropDuplicates()

        def closure_from(ns: DataFrame) -> DataFrame:
            res = step(ns)
            if not bnode_closure:
                return res
            seen = ns
            frontier = ns
            nrounds = 0
            while True:  # terminates: `seen` grows or frontier empties
                if nrounds >= iter_limit:
                    # rounds exceeded — cutoff only if statements also
                    # exceeded (CBD.java:215-218 throws then).  Count
                    # DISTINCT statements: `res` is a union of per-round
                    # steps, and in SCBD mode a (s,p,bnode) arc reached
                    # both forward and in reverse appears twice, which
                    # would fire the cutoff below the real limit
                    nstmts = res.dropDuplicates().count()
                    if nstmts >= stmt_limit:
                        raise RuntimeError(
                            f"CBD cutoff: nrounds={nrounds + 1}, "
                            f"nstatements={nstmts}."
                        )
                nrounds += 1
                cur = step(frontier)
                # bnodes reachable from the current slice: objects of
                # forward statements, and (SCBD) subjects of reverse ones
                bn = cur.where(F.col("o_kind") == 1).select(
                    F.concat(F.lit("_:"), F.col("o_lex")).alias("__s"))
                if symmetric:
                    bn = bn.unionByName(
                        cur.where(F.col("s").startswith("_:")).select(F.col("s").alias("__s")))
                bn = bn.dropDuplicates()
                frontier = bn.join(seen, "__s", "left_anti").localCheckpoint(eager=True)
                if frontier.isEmpty():
                    break
                seen = seen.unionByName(frontier).localCheckpoint(eager=True)
                res = res.unionByName(step(frontier))
            return res

        out = closure_from(nodes)
        if bnode_closure:
            # CBD/SCBD step 3 (w3.org/Submission/CBD, describe-CBD-1
            # fixture): include the description of every REIFICATION of a
            # statement in the description — resources whose rdf:subject/
            # rdf:predicate/rdf:object point at an included triple.  One
            # reification level (reifications-of-reifications do not
            # occur in practice; the reference stops there too).
            RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
            skey = (
                F.when(F.col("o_kind") == 1, F.concat(F.lit("_:"), F.col("o_lex")))
                .otherwise(F.col("o_lex"))
            )
            subj_of = stmts.where((F.col("p") == RDF_NS + "subject") & (F.col("o_kind") != 2)).select(
                F.col("s").alias("__r"), skey.alias("__ts"))
            pred_of = stmts.where((F.col("p") == RDF_NS + "predicate") & (F.col("o_kind") == 0)).select(
                F.col("s").alias("__r"), F.col("o_lex").alias("__tp"))
            obj_of = stmts.where(F.col("p") == RDF_NS + "object").select(
                F.col("s").alias("__r"),
                *[F.col(c).alias(f"__t{c}") for c in ("o_kind", "o_lex", "o_dt", "o_lang")])
            cand = subj_of.join(pred_of, "__r").join(obj_of, "__r")
            included = out.select("s", "p", "o_kind", "o_lex", "o_dt", "o_lang").dropDuplicates()
            reif = (
                cand.join(
                    included,
                    (cand["__ts"] == included["s"])
                    & (cand["__tp"] == included["p"])
                    & (cand["__to_kind"] == included["o_kind"])
                    & (cand["__to_lex"] == included["o_lex"])
                    & cand["__to_dt"].eqNullSafe(included["o_dt"])
                    & cand["__to_lang"].eqNullSafe(included["o_lang"]),
                    "left_semi",
                )
                .select(F.col("__r").alias("__s"))
                .dropDuplicates()
            )
            out = out.unionByName(closure_from(reif))
        return out.select(
            iri_col_to_term(F.col("s")).alias("s"),
            iri_col_to_term(F.col("p")).alias("p"),
            obj_cols_to_term().alias("o"),
        ).dropDuplicates()

    def compile_query(self, q) -> DataFrame:
        if getattr(q, "dataset", None) is not None:
            self.dataset = q.dataset
        if isinstance(q, A.SelectQuery):
            return self.compile_select(q)
        if isinstance(q, A.AskQuery):
            return self.compile_ask(q)
        if isinstance(q, A.ConstructQuery):
            return self.compile_construct(q)
        if isinstance(q, A.DescribeQuery):
            return self.compile_describe(q)
        raise NotImplementedError(type(q))


_CMP_OPS = {"<", "<=", ">", ">=", "="}


def _extract_ranges(expr) -> dict:
    """Top-level conjuncts of the form (?v op const) → flat-column scan
    predicates keyed by var name.  Only predicates IMPLIED by the
    filter are emitted (rows they drop would be dropped by the filter
    anyway), so attaching them is always sound."""
    out: dict = {}

    def emit(var: A.Var, op: str, t: Term):
        conds = []
        dbl = t.dbl_key()
        dtm = t.dtm_key()
        if dbl is not None:
            c = F.col("o_dbl")
            conds.append({"<": c < dbl, "<=": c <= dbl, ">": c > dbl, ">=": c >= dbl, "=": c == dbl}[op])
        elif dtm is not None:
            c = F.col("o_dtm")
            conds.append({"<": c < dtm, "<=": c <= dtm, ">": c > dtm, ">=": c >= dtm, "=": c == dtm}[op])
        elif t.kind == 2 and t.dt in (None, "http://www.w3.org/2001/XMLSchema#string") and not t.lang:
            c = F.col("o_lex")
            conds.append({"<": c < t.lex, "<=": c <= t.lex, ">": c > t.lex, ">=": c >= t.lex, "=": c == t.lex}[op])
        if conds:
            out.setdefault(var.name, []).extend(conds)

    def walk(e):
        if isinstance(e, A.FuncCall):
            if e.name == "&&":
                walk(e.args[0])
                walk(e.args[1])
            elif e.name in _CMP_OPS and len(e.args) == 2:
                a, b = e.args
                flip = {"<": ">", "<=": ">=", ">": "<", ">=": "<=", "=": "="}
                if isinstance(a, A.Var) and isinstance(b, A.Const):
                    emit(a, e.name, b.term)
                elif isinstance(b, A.Var) and isinstance(a, A.Const):
                    emit(b, flip[e.name], a.term)

    walk(expr)
    return out


def _term_as_flat_string(t: Term) -> str:
    return f"_:{t.lex}" if t.kind == 1 else t.lex
