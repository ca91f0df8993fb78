"""Recursive-descent parser for the ADT Query Language.

Grammar (from the golden corpus,
``src/AgeDigitalTwins.Test/AdtQueryToCypherTests.cs:5-193`` and docs):

    query      := SELECT [TOP '(' n ')'] selectList FROM source
                  {join} [WHERE expr]
    selectList := '*' | COUNT '(' ')' | proj {',' proj} | ε
    proj       := operand [AS ident]
    source     := DIGITALTWINS [ident] [MATCH pattern]
                | RELATIONSHIPS [ident]
    pattern    := node { edge node }
    node       := '(' [ident] ')'
    edge       := '-' '[' [ident] [':' label {'|' label}] ']' '->'
                | '<-' '[' ... ']' '-'
    join       := JOIN ident RELATED ident '.' ident [ident]
    expr       := or; or := and {OR and}; and := unary {AND unary}
    unary      := NOT unary | '(' expr ')' | predicate
    predicate  := operand (cmpop operand | [NOT] IN array | ε)
                | func '(' args ')'
    operand    := literal | array | func '(' args ')' | proppath
    proppath   := ident {'.' ident}     (segments may start with $)

Keywords are case-insensitive (``FROM relationships`` appears in the
corpus).  ``TOP (50)`` with a space is accepted.
"""

from __future__ import annotations

from typing import Optional

from pg_age_digitaltwins_spark.adtql import ast as A
from pg_age_digitaltwins_spark.adtql.lexer import Token, tokenize

PREDICATE_FUNCS = {
    "IS_OF_MODEL", "STARTSWITH", "ENDSWITH", "CONTAINS", "ARRAY_CONTAINS",
    "IS_NULL", "IS_DEFINED", "IS_BOOL", "IS_NUMBER", "IS_STRING",
    "IS_OBJECT", "IS_PRIMITIVE",
    # engine extensions: typed scalar projection wrappers
    "NUMBER", "STRING", "BOOL", "JSON",
}


class ParseError(ValueError):
    pass


class Parser:
    def __init__(self, text: str):
        self.tokens = tokenize(text)
        self.i = 0

    # --- token helpers ------------------------------------------------
    def peek(self, offset: int = 0) -> Token:
        return self.tokens[min(self.i + offset, len(self.tokens) - 1)]

    def next(self) -> Token:
        t = self.tokens[self.i]
        if t.kind != "EOF":
            self.i += 1
        return t

    def accept(self, kind: str, value: Optional[str] = None) -> Optional[Token]:
        t = self.peek()
        if t.kind == kind and (value is None or t.value == value):
            return self.next()
        return None

    def expect(self, kind: str, value: Optional[str] = None) -> Token:
        t = self.accept(kind, value)
        if t is None:
            got = self.peek()
            raise ParseError(f"Expected {value or kind}, got {got.value!r} at {got.pos}")
        return t

    # --- entry --------------------------------------------------------
    def parse_query(self) -> A.Query:
        self.expect("KEYWORD", "SELECT")
        top = None
        if self.accept("KEYWORD", "TOP"):
            self.expect("PUNCT", "(")
            top = int(self.expect("NUMBER").value)
            self.expect("PUNCT", ")")
        select = self._parse_select_list()
        self.expect("KEYWORD", "FROM")
        src_tok = self.expect("KEYWORD")
        if src_tok.value == "DIGITALTWINS":
            source = "digitaltwins"
        elif src_tok.value == "RELATIONSHIPS":
            source = "relationships"
        else:
            raise ParseError(f"Unknown collection {src_tok.value}")
        source_alias = None
        t = self.peek()
        if t.kind == "IDENT":
            source_alias = self.next().value
        match = None
        if self.accept("KEYWORD", "MATCH"):
            if source != "digitaltwins":
                raise ParseError("MATCH is only valid on DIGITALTWINS")
            match = self._parse_pattern()
        joins: list[A.JoinRelated] = []
        while self.accept("KEYWORD", "JOIN"):
            target = self.expect("IDENT").value
            self.expect("KEYWORD", "RELATED")
            src_alias = self.expect("IDENT").value
            self.expect("PUNCT", ".")
            rel_name = self.expect("IDENT").value
            rel_alias = None
            if self.peek().kind == "IDENT":
                rel_alias = self.next().value
            joins.append(A.JoinRelated(target, src_alias, rel_name, rel_alias))
        where = None
        if self.accept("KEYWORD", "WHERE"):
            where = self._parse_expr()
        self.expect("EOF")
        return A.Query(
            source=source, source_alias=source_alias, select=select,
            top=top, match=match, joins=joins, where=where,
        )

    # --- select list --------------------------------------------------
    def _parse_select_list(self):
        if self.peek().kind == "PUNCT" and self.peek().value == "*":
            self.next()
            return A.Star()
        if self.peek().kind == "KEYWORD" and self.peek().value == "COUNT":
            self.next()
            self.expect("PUNCT", "(")
            self.expect("PUNCT", ")")
            return A.CountAll()
        if self.peek().kind == "KEYWORD" and self.peek().value == "FROM":
            return A.Star()  # SELECT TOP(1) FROM ... → RETURN *
        projs = [self._parse_projection()]
        while self.accept("PUNCT", ","):
            projs.append(self._parse_projection())
        return projs

    def _parse_projection(self) -> A.Projection:
        expr = self._parse_operand()
        alias = None
        if self.accept("KEYWORD", "AS"):
            alias = self.expect("IDENT").value
        return A.Projection(expr, alias)

    # --- MATCH pattern ------------------------------------------------
    def _parse_pattern(self) -> A.MatchPattern:
        nodes = [self._parse_node()]
        edges: list[A.PatternEdge] = []
        while True:
            t = self.peek()
            if t.kind == "OP" and t.value == "-":
                self.next()
                edge = self._parse_edge_body()
                # expect '->'
                t2 = self.next()
                if t2.kind == "OP" and t2.value == "->":
                    edge.direction = "->"
                elif t2.kind == "OP" and t2.value == "-":
                    edge.direction = "--"  # undirected (not in corpus)
                else:
                    raise ParseError(f"Bad edge terminator {t2.value!r}")
                edges.append(edge)
                nodes.append(self._parse_node())
            elif t.kind == "OP" and t.value == "<-":
                self.next()
                edge = self._parse_edge_body()
                self.expect("OP", "-")
                edge.direction = "<-"
                edges.append(edge)
                nodes.append(self._parse_node())
            else:
                break
        return A.MatchPattern(nodes, edges)

    def _parse_node(self) -> A.PatternNode:
        self.expect("PUNCT", "(")
        alias = None
        if self.peek().kind == "IDENT":
            alias = self.next().value
        self.expect("PUNCT", ")")
        return A.PatternNode(alias)

    def _parse_edge_body(self) -> A.PatternEdge:
        self.expect("PUNCT", "[")
        alias = None
        labels: list[str] = []
        if self.peek().kind == "IDENT":
            alias = self.next().value
        if self.accept("PUNCT", ":"):
            labels.append(self.expect("IDENT").value)
            while self.accept("PUNCT", "|"):
                labels.append(self.expect("IDENT").value)
        self.expect("PUNCT", "]")
        return A.PatternEdge(alias, labels, "->")

    # --- expressions --------------------------------------------------
    def _parse_expr(self) -> A.Expr:
        return self._parse_or()

    def _parse_or(self) -> A.Expr:
        items = [self._parse_and()]
        while self.accept("KEYWORD", "OR"):
            items.append(self._parse_and())
        return items[0] if len(items) == 1 else A.Or(items)

    def _parse_and(self) -> A.Expr:
        items = [self._parse_unary()]
        while self.accept("KEYWORD", "AND"):
            items.append(self._parse_unary())
        return items[0] if len(items) == 1 else A.And(items)

    def _parse_unary(self) -> A.Expr:
        if self.accept("KEYWORD", "NOT"):
            return A.Not(self._parse_unary())
        if self.peek().kind == "PUNCT" and self.peek().value == "(":
            # Could be a parenthesized boolean expr; funcs are handled in
            # operand position (they follow an IDENT/KEYWORD).
            self.next()
            inner = self._parse_expr()
            self.expect("PUNCT", ")")
            return self._maybe_predicate_tail(inner)
        operand = self._parse_operand()
        return self._maybe_predicate_tail(operand)

    def _maybe_predicate_tail(self, operand: A.Expr) -> A.Expr:
        t = self.peek()
        if t.kind == "OP" and t.value in ("=", "!=", "<", ">", "<=", ">="):
            self.next()
            right = self._parse_operand()
            return A.Cmp(t.value, operand, right)
        negated = False
        if t.kind == "KEYWORD" and t.value == "NOT" and self.peek(1).value == "IN":
            self.next()
            negated = True
            t = self.peek()
        if t.kind == "KEYWORD" and t.value == "IN":
            self.next()
            arr = self._parse_array_literal()
            return A.InList(operand, arr, negated)
        if t.kind == "KEYWORD" and t.value == "NIN":
            self.next()
            arr = self._parse_array_literal()
            return A.InList(operand, arr, True)
        return operand

    def _parse_operand(self) -> A.Expr:
        t = self.peek()
        if t.kind == "STRING":
            self.next()
            return A.Lit(_unquote(t.value), "string")
        if t.kind == "NUMBER":
            self.next()
            v = float(t.value) if ("." in t.value or "e" in t.value.lower()) else int(t.value)
            return A.Lit(v, "number")
        if t.kind == "KEYWORD" and t.value in ("TRUE", "FALSE"):
            self.next()
            return A.Lit(t.value == "TRUE", "bool")
        if t.kind == "PUNCT" and t.value == "[":
            return self._parse_array_literal()
        if t.kind == "KEYWORD" and t.value == "COUNT":
            # COUNT() in projection position handled upstream; treat as func
            self.next()
            self.expect("PUNCT", "(")
            self.expect("PUNCT", ")")
            return A.FuncCall("COUNT", [])
        if t.kind in ("IDENT", "KEYWORD"):
            name_u = t.value.upper()
            if name_u in PREDICATE_FUNCS and self.peek(1).value == "(":
                self.next()
                self.expect("PUNCT", "(")
                args: list[A.Expr] = []
                if not (self.peek().kind == "PUNCT" and self.peek().value == ")"):
                    args.append(self._parse_operand())
                    while self.accept("PUNCT", ","):
                        args.append(self._parse_operand())
                self.expect("PUNCT", ")")
                return A.FuncCall(name_u, args)
            if t.kind == "IDENT":
                return self._parse_proppath()
        raise ParseError(f"Unexpected token {t.value!r} at {t.pos}")

    def _parse_proppath(self) -> A.PropRef:
        segs = [self.expect("IDENT").value]
        while self.peek().kind == "PUNCT" and self.peek().value == ".":
            # only consume '.' when followed by an identifier segment
            if self.peek(1).kind != "IDENT":
                break
            self.next()
            segs.append(self.expect("IDENT").value)
        # alias resolution happens in the compiler: 'T.name' is ambiguous
        # between alias-qualified and bare-nested until aliases are known.
        return A.PropRef(None, segs)

    def _parse_array_literal(self) -> A.ArrayLit:
        self.expect("PUNCT", "[")
        items: list[A.Lit] = []
        if not (self.peek().kind == "PUNCT" and self.peek().value == "]"):
            items.append(self._parse_scalar_literal())
            while self.accept("PUNCT", ","):
                items.append(self._parse_scalar_literal())
        self.expect("PUNCT", "]")
        return A.ArrayLit(items)

    def _parse_scalar_literal(self) -> A.Lit:
        t = self.next()
        if t.kind == "STRING":
            return A.Lit(_unquote(t.value), "string")
        if t.kind == "NUMBER":
            v = float(t.value) if ("." in t.value or "e" in t.value.lower()) else int(t.value)
            return A.Lit(v, "number")
        if t.kind == "KEYWORD" and t.value in ("TRUE", "FALSE"):
            return A.Lit(t.value == "TRUE", "bool")
        raise ParseError(f"Expected literal, got {t.value!r} at {t.pos}")


def _unquote(s: str) -> str:
    body = s[1:-1]
    return body.replace("\\'", "'").replace('\\"', '"').replace("\\\\", "\\")


def parse(text: str) -> A.Query:
    return Parser(text).parse_query()
