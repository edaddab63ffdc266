"""Comparison machinery for the reference's data-driven SPARQL fixtures.

Mirrors AbstractDataDrivenSPARQLTestCase.java:299 (compareTupleQueryResults
/ compareGraphs): result multisets are compared modulo a blank-node
bijection; graphs are compared by isomorphism.  Numeric literals are
compared by VALUE (all numeric datatypes in one class) because the
engine's computed lexical forms (e.g. decimal trailing zeros) need not
match Sesame's byte-for-byte — this is the same leniency DAWG's
"lax cardinality" comparisons allow, and it never masks a wrong value.
"""

from __future__ import annotations

from decimal import Decimal, InvalidOperation

XSD = "http://www.w3.org/2001/XMLSchema#"
RDF_LANGSTRING = "http://www.w3.org/1999/02/22-rdf-syntax-ns#langString"

_INT_LOCALS = {
    "integer", "int", "long", "short", "byte",
    "nonNegativeInteger", "nonPositiveInteger", "negativeInteger",
    "positiveInteger", "unsignedLong", "unsignedInt", "unsignedShort",
    "unsignedByte",
}
_NUM_LOCALS = _INT_LOCALS | {"decimal", "double", "float"}

BNODE = "__bnode__"  # canon marker


def canon_term(kind: int, lex: str, dt: str | None, lang: str | None):
    """RDF term → hashable comparison key; bnodes become (BNODE, label)
    so the bijection matcher can treat them specially."""
    if kind == 0:
        return ("iri", lex)
    if kind == 1:
        return (BNODE, lex)
    # literal
    if lang:
        return ("lang", lex, lang.lower())
    if dt == RDF_LANGSTRING:
        return ("lang", lex, "")
    dtv = dt or XSD + "string"
    local = dtv[len(XSD):] if dtv.startswith(XSD) else None
    if local in _NUM_LOCALS:
        # one canonical key per VALUE across numeric datatypes AND
        # representations: 0.35^^xsd:double and 0.35^^xsd:decimal must
        # collide, so floats canonicalize through repr() → Decimal
        # (shortest decimal that roundtrips), exact non-float-safe
        # decimals stay exact
        try:
            if local in ("double", "float"):
                return ("num", Decimal(repr(float(lex))).normalize())
            v = Decimal(lex)
            if v == Decimal(float(v)):
                return ("num", Decimal(repr(float(v))).normalize())
            return ("num", v.normalize())
        except (InvalidOperation, ValueError, OverflowError):
            pass  # ill-typed numeric: fall through to exact
    if local == "boolean":
        return ("bool", lex.strip() in ("true", "1"))
    if local in ("dateTime", "date", "time"):
        from bigdata_old_spark.model import parse_xsd_datetime

        p = parse_xsd_datetime(lex)
        if p is not None:
            return ("dtm", p.isoformat())
    if local == "string":
        return ("str", lex)
    return ("lit", lex, dtv)


def canon_model_term(t) -> tuple | None:
    """A driver-side model.Term (or None) → canon key."""
    if t is None:
        return None
    return canon_term(t.kind, t.lex, t.dt, t.lang)


def canon_row_value(v) -> tuple | None:
    """A collected Spark Row term-struct (or None) → canon key."""
    if v is None:
        return None
    return canon_term(v["kind"], v["lex"], v["dt"], v["lang"])


# -- blank-node bijection matching -------------------------------------------

def _has_bnode(row: dict) -> bool:
    return any(isinstance(v, tuple) and v[0] == BNODE for v in row.values())


def _unify(row_a: dict, row_b: dict, fwd: dict, rev: dict):
    """Can row_a equal row_b under an extension of bijection fwd/rev?
    Returns the (new_fwd, new_rev) or None."""
    if set(row_a) != set(row_b):
        return None
    nf, nr = dict(fwd), dict(rev)
    for k, va in row_a.items():
        vb = row_b[k]
        a_bn = isinstance(va, tuple) and va[0] == BNODE
        b_bn = isinstance(vb, tuple) and vb[0] == BNODE
        if a_bn != b_bn:
            return None
        if a_bn:
            la, lb = va[1], vb[1]
            if nf.get(la, lb) != lb or nr.get(lb, la) != la:
                return None
            nf[la] = lb
            nr[lb] = la
        elif va != vb:
            return None
    return nf, nr


def rows_equal(actual: list[dict], expected: list[dict], ordered: bool = False) -> bool:
    """Multiset (or sequence, if ordered) equality of binding rows modulo
    a blank-node bijection.  Rows are {var: canon-key} dicts (unbound
    vars absent or None — both normalized here)."""
    actual = [{k: v for k, v in r.items() if v is not None} for r in actual]
    expected = [{k: v for k, v in r.items() if v is not None} for r in expected]
    if len(actual) != len(expected):
        return False
    if ordered:
        fwd: dict = {}
        rev: dict = {}
        for ra, rb in zip(actual, expected):
            u = _unify(ra, rb, fwd, rev)
            if u is None:
                return False
            fwd, rev = u
        return True

    # fast path: no bnodes anywhere
    if not any(_has_bnode(r) for r in actual + expected):
        key = lambda r: sorted((k, repr(v)) for k, v in r.items())
        return sorted(map(key, actual)) == sorted(map(key, expected))

    # backtracking assignment; ground rows first to prune early
    actual = sorted(actual, key=_has_bnode)
    used = [False] * len(expected)

    def back(i: int, fwd: dict, rev: dict) -> bool:
        if i == len(actual):
            return True
        for j, rb in enumerate(expected):
            if used[j]:
                continue
            u = _unify(actual[i], rb, fwd, rev)
            if u is None:
                continue
            used[j] = True
            if back(i + 1, u[0], u[1]):
                return True
            used[j] = False
        return False

    return back(0, {}, {})


def graphs_isomorphic(a: list[tuple], b: list[tuple]) -> bool:
    """Triple lists [(s_key, p_key, o_key)] modulo bnode bijection."""
    rows_a = [{"s": s, "p": p, "o": o} for s, p, o in a]
    rows_b = [{"s": s, "p": p, "o": o} for s, p, o in b]
    return rows_equal(rows_a, rows_b)


# -- DAWG result-set graph decoding ------------------------------------------

RS = "http://www.w3.org/2001/sw/DataAccess/tests/result-set#"


def dawg_resultset(triples: list[tuple]):
    """Decode a DAWG rs:ResultSet graph (parse_turtle/-rdfxml output:
    (s_flat, p_iri, o_term)) → bool, or (vars, rows, ordered) with rows
    as {var: canon-key}."""
    from collections import defaultdict

    by_s = defaultdict(list)
    for s, p, o in triples:
        by_s[s].append((p, o))

    for s, po in by_s.items():
        for p, o in po:
            if p == RS + "boolean":
                return o.lex.strip() in ("true", "1")

    variables: list[str] = []
    rows = []
    ordered = False
    for s, po in by_s.items():
        types = [o.lex for p, o in po if p.endswith("#type") and o.kind == 0]
        if RS + "ResultSet" not in types and not any(
            p == RS + "solution" for p, o in po
        ):
            continue
        for p, o in po:
            if p == RS + "resultVariable":
                variables.append(o.lex)
            elif p == RS + "solution":
                sol_key = f"_:{o.lex}" if o.kind == 1 else o.lex
                row = {}
                idx = None
                for sp, so in by_s.get(sol_key, []):
                    if sp == RS + "index":
                        idx = int(Decimal(so.lex))
                        ordered = True
                    if sp != RS + "binding":
                        continue
                    b_key = f"_:{so.lex}" if so.kind == 1 else so.lex
                    var = val = None
                    for bp, bo in by_s.get(b_key, []):
                        if bp == RS + "variable":
                            var = bo.lex
                        elif bp == RS + "value":
                            val = canon_model_term(bo)
                    if var is not None:
                        row[var] = val
                rows.append((idx, row))
    if ordered:
        rows.sort(key=lambda t: (t[0] is None, t[0]))
    return variables, [r for _, r in rows], ordered
