"""SPARQL algebra — the logical plan the compiler consumes.

Mirrors the reference's AST layer (bigdata-rdf/.../sparql/ast/ —
QueryRoot, JoinGroupNode, UnionNode, FilterNode, AssignmentNode, …) but
as plain Python dataclasses; the compiler (compiler.py) plays the role
of AST2BOpUtility.convert (eval/AST2BOpUtility.java:205), emitting
DataFrame compositions instead of PipelineOps.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Union as U

from bigdata_old_spark.model import Term

# ---------------------------------------------------------------------------
# Expressions
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class Var:
    name: str

    def __repr__(self) -> str:  # pragma: no cover
        return f"?{self.name}"


@dataclass(frozen=True)
class Const:
    term: Term


@dataclass(frozen=True)
class FuncCall:
    """Builtin call (uppercase name: 'REGEX', '+', '&&', …) or extension
    function by IRI (reference FunctionRegistry.java:116)."""

    name: str
    args: tuple


@dataclass(frozen=True)
class Aggregate:
    """COUNT/SUM/AVG/MIN/MAX/SAMPLE/GROUP_CONCAT (reference
    bop/rdf/aggregate/*.java)."""

    name: str
    expr: object  # None for COUNT(*)
    distinct: bool = False
    separator: str = " "


@dataclass(frozen=True)
class ExistsExpr:
    """FILTER (NOT) EXISTS — compiled to semi/anti join
    (JoinTypeEnum.Exists/NotExists, join/JoinTypeEnum.java:60-69)."""

    pattern: object
    negated: bool = False


Expr = U[Var, Const, FuncCall, Aggregate, ExistsExpr]

# ---------------------------------------------------------------------------
# Property paths (reference ast/PathNode + ArbitraryLengthPathOp)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class PathLink:
    iri: str


@dataclass(frozen=True)
class PathInv:
    path: object


@dataclass(frozen=True)
class PathSeq:
    steps: tuple


@dataclass(frozen=True)
class PathAlt:
    alts: tuple


@dataclass(frozen=True)
class PathStar:  # also covers + and ? via min/max
    path: object
    min_len: int = 0
    max_len: Optional[int] = None  # None = unbounded


@dataclass(frozen=True)
class PathNeg:
    """!(:p1|:p2|^:p3) — negated property set."""

    forward_iris: tuple = ()
    inverse_iris: tuple = ()


Path = U[PathLink, PathInv, PathSeq, PathAlt, PathStar, PathNeg]

# ---------------------------------------------------------------------------
# Graph patterns
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class TriplePattern:
    s: U[Var, Term]
    p: U[Var, Term, PathLink, PathInv, PathSeq, PathAlt, PathStar, PathNeg]
    o: U[Var, Term]


@dataclass
class BGP:
    triples: list = field(default_factory=list)


@dataclass
class Join:
    left: object
    right: object


@dataclass
class LeftJoin:  # OPTIONAL
    left: object
    right: object
    condition: Optional[object] = None


@dataclass
class UnionPat:
    left: object
    right: object


@dataclass
class MinusPat:
    left: object
    right: object


@dataclass
class FilterPat:
    expr: object
    child: object


@dataclass
class Extend:  # BIND(expr AS ?v)
    child: object
    var: str
    expr: object


@dataclass
class ValuesPat:
    names: list
    rows: list  # list[list[Term|None]]


@dataclass
class GraphPat:  # GRAPH ?g / GRAPH <iri>
    graph: U[Var, Term]
    child: object


@dataclass
class SubSelect:
    query: "SelectQuery"


@dataclass
class ServicePat:
    iri: Term
    child: object
    silent: bool = False
    # reconstructed source of the inner group + the prefix decls in
    # scope — what a remote endpoint receives (ServiceCallJoin ships
    # the original service group text the same way)
    raw: str = ""
    prefixes: tuple = ()


# ---------------------------------------------------------------------------
# Query forms
# ---------------------------------------------------------------------------


@dataclass
class Dataset:
    """FROM / FROM NAMED clauses (reference DataSetJoin,
    bop/rdf/join/DataSetJoin.java:67: theta/IN restriction on ?g)."""

    default_graphs: Optional[list] = None  # None = the real default graph
    named_graphs: Optional[list] = None    # None = all named graphs
    # FROM [NAMED] VIRTUAL GRAPH <vg> — membership comes from
    # (vg, bd:virtualGraph, ?g) data triples (reference BD.VIRTUAL_GRAPH,
    # TestVirtualGraphs.java:80); resolved by the compiler as a semi-join
    virtual_default: Optional[list] = None
    virtual_named: Optional[list] = None


@dataclass
class IncludePat:
    """INCLUDE %name — join the pre-evaluated named solution set into
    the surrounding group (reference NamedSubqueryInclude /
    JVMNamedSubqueryOp.java:76)."""
    name: str


@dataclass
class SelectQuery:
    pattern: object
    # list of (var_name, Expr|None) — None means plain variable projection;
    # empty list + wildcard=True means SELECT *
    projection: list = field(default_factory=list)
    wildcard: bool = False
    distinct: bool = False
    reduced: bool = False
    group_by: Optional[list] = None  # list of (var_name|None, Expr)
    having: list = field(default_factory=list)
    order_by: list = field(default_factory=list)  # list of (Expr, ascending)
    limit: Optional[int] = None
    offset: Optional[int] = None
    values: Optional[ValuesPat] = None
    dataset: Optional[Dataset] = None
    # named subqueries: [(name, SubSelect|pattern)] — WITH {…} AS %name,
    # evaluated once before the main WHERE, referenced via IncludePat
    named: list = field(default_factory=list)


@dataclass
class AskQuery:
    pattern: object
    values: Optional[ValuesPat] = None
    dataset: Optional[Dataset] = None


@dataclass
class ConstructQuery:
    template: list  # list[TriplePattern]
    pattern: object
    limit: Optional[int] = None
    offset: Optional[int] = None
    values: Optional[ValuesPat] = None
    dataset: Optional[Dataset] = None


@dataclass
class DescribeQuery:
    terms: list  # list[Var|Term]
    pattern: Optional[object] = None
    values: Optional[ValuesPat] = None
    dataset: Optional[Dataset] = None
    # DescribeModeEnum.java:47-127: ForwardOneStep | CBD (forward +
    # recursive bnode-object closure) | SymmetricOneStep (± one step) |
    # SCBD (symmetric + bnode closure in both directions).  None →
    # compiler default (SymmetricOneStep, the reference's
    # QueryHints.DEFAULT_DESCRIBE_MODE).
    mode: str | None = None


Query = U[SelectQuery, AskQuery, ConstructQuery, DescribeQuery]


def expr_vars(e) -> set[str]:
    """Variables referenced by a value expression (not descending into
    EXISTS sub-patterns — those compile separately)."""
    out: set[str] = set()

    def walk(x):
        if isinstance(x, Var):
            out.add(x.name)
        elif isinstance(x, FuncCall):
            for a in x.args:
                walk(a)
        elif isinstance(x, Aggregate) and x.expr is not None:
            walk(x.expr)

    walk(e)
    return out


def pattern_vars(node) -> set[str]:
    """All variables syntactically present in a pattern."""
    out: set[str] = set()

    def walk_expr(e):
        if isinstance(e, Var):
            out.add(e.name)
        elif isinstance(e, FuncCall):
            for a in e.args:
                walk_expr(a)
        elif isinstance(e, Aggregate) and e.expr is not None:
            walk_expr(e.expr)

    def walk(n):
        if isinstance(n, BGP):
            for t in n.triples:
                for pos in (t.s, t.p, t.o):
                    if isinstance(pos, Var):
                        out.add(pos.name)
        elif isinstance(n, (Join, LeftJoin, UnionPat, MinusPat)):
            walk(n.left)
            walk(n.right)
        elif isinstance(n, FilterPat):
            walk(n.child)
        elif isinstance(n, Extend):
            walk(n.child)
            out.add(n.var)
            walk_expr(n.expr)
        elif isinstance(n, ValuesPat):
            out.update(n.names)
        elif isinstance(n, GraphPat):
            if isinstance(n.graph, Var):
                out.add(n.graph.name)
            walk(n.child)
        elif isinstance(n, SubSelect):
            q = n.query
            if q.wildcard:
                out.update(pattern_vars(q.pattern))
            else:
                out.update(name for name, _ in q.projection)
        elif isinstance(n, ServicePat):
            walk(n.child)

    walk(node)
    return out
