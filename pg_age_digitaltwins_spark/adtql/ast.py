"""AST for the ADT Query Language (and the compiler's IR).

Shapes follow the language surface catalogued in SURVEY.md §2.1
(Q1-Q27); the reference's translator is string-to-string
(``AdtQueryHelpers.cs:11-250``) — this AST is new design.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Optional, Union


# --- expressions ------------------------------------------------------

@dataclass
class PropRef:
    """``[alias.]seg1.seg2...`` — property path on a bound alias."""
    alias: Optional[str]
    path: list[str]


@dataclass
class Lit:
    value: Any
    kind: str  # 'string' | 'number' | 'bool'


@dataclass
class ArrayLit:
    items: list[Lit]


@dataclass
class Cmp:
    op: str  # = != < > <= >=
    left: "Expr"
    right: "Expr"


@dataclass
class InList:
    operand: "Expr"
    items: ArrayLit
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
class FuncCall:
    """ADT scalar/predicate function: IS_OF_MODEL, STARTSWITH, …
    plus engine extensions NUMBER()/STRING()/BOOL() for typed
    projection."""
    name: str  # upper-cased
    args: list["Expr"]


Expr = Union[PropRef, Lit, ArrayLit, Cmp, InList, And, Or, Not, FuncCall]


# --- projections ------------------------------------------------------

@dataclass
class Projection:
    expr: Expr  # PropRef (possibly bare alias) or FuncCall wrapper
    alias: Optional[str] = None  # AS name


@dataclass
class Star:
    pass


@dataclass
class CountAll:
    pass


# --- sources ----------------------------------------------------------

@dataclass
class PatternNode:
    alias: Optional[str]


@dataclass
class PatternEdge:
    alias: Optional[str]
    labels: list[str]  # empty = any label; >1 = multi-label OR (Q7)
    direction: str  # '->' (left-to-right) or '<-'


@dataclass
class MatchPattern:
    """Alternating nodes/edges: node edge node [edge node ...]"""
    nodes: list[PatternNode]
    edges: list[PatternEdge]


@dataclass
class JoinRelated:
    """``JOIN <target> RELATED <source>.<relName> [relAlias]`` (Q8)."""
    target_alias: str
    source_alias: str
    rel_name: str
    rel_alias: Optional[str] = None


@dataclass
class Query:
    source: str  # 'digitaltwins' | 'relationships'
    source_alias: Optional[str]
    select: Union[Star, CountAll, list[Projection]]
    top: Optional[int] = None
    match: Optional[MatchPattern] = None
    joins: list[JoinRelated] = field(default_factory=list)
    where: Optional[Expr] = None
