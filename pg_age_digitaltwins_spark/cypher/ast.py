"""AST for the Cypher read subset (SURVEY.md §2.2 C1-C14).

The reference delegates Cypher execution to Apache AGE inside Postgres;
this engine compiles the same constructs to DataFrame plans.  The
subset is the reference's own emitted/tested surface: MATCH (incl.
direction, inline property maps, multi-label edges, variable-length
edges), OPTIONAL MATCH, WHERE, RETURN with aliases/aggregates/DISTINCT,
ORDER BY, SKIP/LIMIT, UNWIND, UNION, WITH pipeline stages (projection /
aggregation / DISTINCT / ORDER/SKIP/LIMIT / trailing WHERE — the HAVING
idiom), and the scalar functions it uses (label, toLower, toUpper,
toString, l2_distance…).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Optional, Union


# --- expressions ------------------------------------------------------

@dataclass
class Var:
    name: str


@dataclass
class Prop:
    """``var.seg1.seg2`` — property path on a bound variable."""
    var: str
    path: list[str]


@dataclass
class PostfixProp:
    """``fn(...).seg`` / ``(expr).seg`` — property access on a computed
    value (temporal component extraction; a Var base renormalizes to
    Prop in the compiler)."""
    base: "Expr"
    path: list[str]


@dataclass
class Lit:
    value: Any
    kind: str  # 'string' | 'number' | 'bool' | 'null'


@dataclass
class ListLit:
    items: list["Expr"]


@dataclass
class Cmp:
    op: str  # = <> < > <= >=
    left: "Expr"
    right: "Expr"


@dataclass
class StringOp:
    op: str  # STARTS WITH | ENDS WITH | CONTAINS
    left: "Expr"
    right: "Expr"


@dataclass
class InList:
    operand: "Expr"
    items: "Expr"  # ListLit or Prop (array property)


@dataclass
class IsNull:
    operand: "Expr"
    negated: bool = False


@dataclass
class And:
    items: list["Expr"]


@dataclass
class Or:
    items: list["Expr"]


@dataclass
class Not:
    item: "Expr"


@dataclass
class Arith:
    """Numeric binary arithmetic ``+ - * / %``."""
    op: str
    left: "Expr"
    right: "Expr"


@dataclass
class Case:
    """``CASE [operand] WHEN … THEN … [ELSE …] END`` — both the simple
    (operand equality) and generic (searched predicate) forms."""
    operand: "Expr | None"
    whens: list[tuple["Expr", "Expr"]]
    else_: "Expr | None"


@dataclass
class Func:
    """count/sum/avg/min/max/collect (aggregates) or scalar
    label/toLower/toUpper/toString/toInteger/toFloat/size/l2_distance."""
    name: str  # lower-cased
    args: list["Expr"]
    distinct: bool = False
    star: bool = False  # count(*)


@dataclass
class ListComp:
    """``[x IN src WHERE pred | map]`` — openCypher list comprehension
    (filter and/or per-element projection)."""
    var: str
    src: "Expr"
    where: "Expr | None" = None
    map: "Expr | None" = None


@dataclass
class Reduce:
    """``reduce(acc = init, x IN src | step)`` — openCypher fold."""
    acc: str
    init: "Expr"
    var: str
    src: "Expr"
    step: "Expr" = None


@dataclass
class ListPred:
    """``any/all/none/single(x IN src WHERE pred)`` — openCypher list
    predicates.  Compile to the matching JVM higher-order function
    (exists / forall / NOT exists / size(filter)=1)."""
    kind: str  # "any" | "all" | "none" | "single"
    var: str
    src: "Expr"
    where: "Expr" = None


@dataclass
class PatternPred:
    """Existential pattern predicate ``WHERE (a)-[:R]->(b)`` (also the
    ``EXISTS { [MATCH] pattern [WHERE pred] }`` subquery form) — true
    when at least one match of the pattern exists from the bound
    anchor.  Compiles to a semi-join (anti-join under NOT)."""
    path: "PathPat"
    where: "Expr | None" = None


@dataclass
class CountSub:
    """``COUNT { [MATCH] pattern [WHERE pred] }`` subquery — the number
    of pattern matches from the bound anchor, per row.  Compiles to a
    pre-aggregated left join on the anchor key (coalesced to 0)."""
    path: "PathPat"
    where: "Expr | None" = None


Expr = Union[Var, Prop, Lit, ListLit, Cmp, StringOp, InList, IsNull, And, Or, Not, Arith, Case, Func, ListComp, Reduce, ListPred, PatternPred, CountSub]

AGGREGATES = {"count", "sum", "avg", "min", "max", "collect",
              "stdev", "stdevp", "percentilecont", "percentiledisc"}


def has_aggregate(e: Expr) -> bool:
    if isinstance(e, Func):
        if e.name in AGGREGATES:
            return True
        return any(has_aggregate(a) for a in e.args)
    if isinstance(e, (And, Or)):
        return any(has_aggregate(i) for i in e.items)
    if isinstance(e, Not):
        return has_aggregate(e.item)
    if isinstance(e, (Cmp, StringOp)):
        return has_aggregate(e.left) or has_aggregate(e.right)
    if isinstance(e, InList):
        return has_aggregate(e.operand)
    if isinstance(e, IsNull):
        return has_aggregate(e.operand)
    if isinstance(e, ListLit):
        return any(has_aggregate(i) for i in e.items)
    if isinstance(e, ListPred):
        return has_aggregate(e.src)
    if isinstance(e, PostfixProp):
        return has_aggregate(e.base)
    if isinstance(e, Arith):
        # r9: aggregates nest inside arithmetic (count(x) + 100) — the
        # implicit-grouping split must see them or grouped RETURNs
        # fail with MISSING_GROUP_BY
        return has_aggregate(e.left) or has_aggregate(e.right)
    if isinstance(e, Case):
        return (
            (e.operand is not None and has_aggregate(e.operand))
            or any(
                has_aggregate(c) or has_aggregate(v) for c, v in e.whens
            )
            or (e.else_ is not None and has_aggregate(e.else_))
        )
    return False


# --- patterns ---------------------------------------------------------

@dataclass
class NodePat:
    alias: Optional[str]
    labels: list[str] = field(default_factory=list)
    props: dict[str, Lit] = field(default_factory=dict)


@dataclass
class EdgePat:
    alias: Optional[str]
    labels: list[str] = field(default_factory=list)
    direction: str = "->"  # '->' | '<-' | '--' (undirected)
    props: dict[str, Lit] = field(default_factory=dict)
    var_length: Optional[tuple[int, Optional[int]]] = None  # (min, max)
    # r13: per-edge weight expression for weighted shortestPath —
    # ``[r:T*1..4 WEIGHT <expr over r>]``; only legal on var-length
    # edges inside shortestPath(...)
    weight: Optional[Expr] = None


@dataclass
class PathPat:
    nodes: list[NodePat]
    edges: list[EdgePat]
    var: "str | None" = None     # ``p = ...`` path variable
    shortest: bool = False       # wrapped in shortestPath(...)


@dataclass
class MatchClause:
    paths: list[PathPat]
    optional: bool = False
    where: Optional[Expr] = None


@dataclass
class UnwindClause:
    expr: Expr
    alias: str


@dataclass
class ReturnItem:
    expr: Expr
    alias: Optional[str] = None


@dataclass
class WithClause:
    """Intermediate projection stage: ``WITH [DISTINCT] items
    [ORDER BY ...] [SKIP n] [LIMIT n] [WHERE pred]``.  Replaces the
    variable scope with the projected names (openCypher semantics);
    the trailing WHERE filters the projected rows — the aggregate-then-
    filter (HAVING) idiom."""

    items: list[ReturnItem]
    distinct: bool = False
    where: Optional[Expr] = None
    order_by: list = field(default_factory=list)  # (expr, asc)
    skip: Optional[int] = None
    limit: Optional[int] = None
    star: bool = False  # WITH * — expand bound variables at compile


@dataclass
class ProcCallClause:
    """``CALL ns.proc(args) YIELD col [AS alias], ...`` — standalone
    procedure invocation (r14 language extension; the GDS/AGE
    ``CALL gds.pageRank.stream(...) YIELD ...`` shape).  Read-only
    analytics procedures over the loaded graph; must be the first
    clause (row-driven per-input invocation is the CALL-subquery
    form's job).  ``yields`` selects/renames the procedure's output
    columns; it is REQUIRED (no implicit star — deterministic schema)."""

    name: str                      # dotted, original case
    args: list                     # literal Expr list
    yields: list                   # [(colname, alias|None), ...]
    where: Optional["Expr"] = None  # WHERE directly after YIELD


@dataclass
class CallClause:
    """``[OPTIONAL] CALL { [WITH var] <subquery> RETURN ... }`` —
    openCypher CALL subquery.  ``imports`` is the importing-WITH
    variable list (empty = uncorrelated, executed once and joined to
    every row); the inner query's ORDER BY/SKIP/LIMIT apply PER input
    row (per-anchor top-k), matching once-per-row execution."""

    imports: list[str]
    query: "SingleQuery"
    optional: bool = False


@dataclass
class SingleQuery:
    clauses: list  # MatchClause | UnwindClause in order
    where: Optional[Expr] = None  # WHERE after the last MATCH handled in clause
    ret: list[ReturnItem] = field(default_factory=list)
    distinct: bool = False
    order_by: list[tuple[Expr, bool]] = field(default_factory=list)  # (expr, asc)
    skip: Optional[int] = None
    limit: Optional[int] = None
    ret_star: bool = False  # RETURN * — expand bound variables at compile


@dataclass
class UnionQuery:
    queries: list[SingleQuery]
    all: bool = False
