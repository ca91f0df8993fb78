"""Recursive-descent parser for the Cypher read subset.

Grammar (the reference's own emitted/tested surface — SURVEY.md §2.2):

    query      := single (UNION [ALL] single)*
    single     := clause+ RETURN [DISTINCT] items
                  [ORDER BY expr [ASC|DESC] (, ...)*] [SKIP n] [LIMIT n]
    clause     := [OPTIONAL] MATCH path (, path)* [WHERE expr]
                | UNWIND expr AS ident
                | [OPTIONAL] CALL { [WITH ident (, ident)*] single }
    path       := node (edge node)*
    node       := ( [ident] [:Label]* [{props}] )
    edge       := -[...]-> | <-[...]- | -[...]- | --> | <-- | --
    edge body  := [ident] [:L1|L2...] [*min..max] [{props}]

Write clauses (CREATE/MERGE/SET/DELETE/REMOVE) are rejected — the
reference's /query endpoint blocks them by keyword filter
(``AgeDigitalTwinsClient.Query.cs:68-88``).
"""

from __future__ import annotations

from pg_age_digitaltwins_spark.cypher import ast as C
from pg_age_digitaltwins_spark.cypher.lexer import Token, tokenize

WRITE_KEYWORDS = {"CREATE", "MERGE", "SET", "DELETE", "DETACH", "REMOVE"}


class CypherParseError(ValueError):
    pass


class _Parser:
    def __init__(self, tokens: list[Token]):
        self.toks = tokens
        self.i = 0

    # -- helpers -------------------------------------------------------
    @property
    def cur(self) -> Token:
        return self.toks[self.i]

    def at(self, kind: str, value: str | None = None) -> bool:
        t = self.cur
        return t.kind == kind and (value is None or t.value == value)

    def eat(self, kind: str, value: str | None = None) -> Token:
        if not self.at(kind, value):
            raise CypherParseError(
                f"Expected {value or kind} at position {self.cur.pos}, got {self.cur.value!r}"
            )
        t = self.cur
        self.i += 1
        return t

    def opt(self, kind: str, value: str | None = None) -> bool:
        if self.at(kind, value):
            self.i += 1
            return True
        return False

    # -- entry ---------------------------------------------------------
    def query(self) -> C.UnionQuery | C.SingleQuery:
        first = self.single()
        queries = [first]
        union_all: bool | None = None
        while self.opt("KEYWORD", "UNION"):
            this_all = self.opt("KEYWORD", "ALL")
            if union_all is not None and this_all != union_all:
                raise CypherParseError("Cannot mix UNION and UNION ALL")
            union_all = this_all
            queries.append(self.single())
        self.eat("EOF")
        if len(queries) == 1:
            return first
        return C.UnionQuery(queries, all=bool(union_all))

    def single(self) -> C.SingleQuery:
        clauses: list = []
        while True:
            if self.at("KEYWORD", "OPTIONAL") and self._peek_is_call(1):
                self.i += 1
                clauses.append(self.call_clause(optional=True))
            elif self.at("KEYWORD", "OPTIONAL") and self._peek_is_proc_call(1):
                raise CypherParseError(
                    "OPTIONAL CALL applies to CALL { ... } subqueries only — "
                    "procedure calls always yield their full result"
                )
            elif self.at("KEYWORD", "OPTIONAL") or self.at("KEYWORD", "MATCH"):
                clauses.append(self.match_clause())
            elif self._peek_is_call(0):
                clauses.append(self.call_clause())
            elif self._peek_is_proc_call(0):
                clauses.append(self.proc_call_clause())
            elif self.at("KEYWORD", "UNWIND"):
                clauses.append(self.unwind_clause())
            elif self.at("KEYWORD", "WITH"):
                clauses.append(self.with_clause())
            elif self.cur.kind == "KEYWORD" and self.cur.value in WRITE_KEYWORDS:
                raise CypherParseError(
                    f"Write clause {self.cur.value} is not allowed in queries"
                )
            else:
                break
        self.eat("KEYWORD", "RETURN")
        distinct = self.opt("KEYWORD", "DISTINCT")
        star = False
        items: list[C.ReturnItem] = []
        if self.at("PUNCT", "*"):
            # RETURN * — every named variable in scope (expanded at
            # compile time, where the bindings are known); explicit
            # extra items may follow per openCypher (`RETURN *, n.x`)
            self.i += 1
            star = True
            while self.opt("PUNCT", ","):
                items.append(self.return_item())
        else:
            items = [self.return_item()]
            while self.opt("PUNCT", ","):
                items.append(self.return_item())
        q = C.SingleQuery(
            clauses=clauses, ret=items, distinct=distinct, ret_star=star
        )
        if self.opt("KEYWORD", "ORDER"):
            self.eat("KEYWORD", "BY")
            q.order_by.append(self.order_item())
            while self.opt("PUNCT", ","):
                q.order_by.append(self.order_item())
        if self.opt("KEYWORD", "SKIP"):
            q.skip = int(self.eat("NUMBER").value)
        if self.opt("KEYWORD", "LIMIT"):
            q.limit = int(self.eat("NUMBER").value)
        return q

    def order_item(self) -> tuple[C.Expr, bool]:
        e = self.expr()
        asc = True
        if self.opt("KEYWORD", "DESC") or self.opt("KEYWORD", "DESCENDING"):
            asc = False
        else:
            self.opt("KEYWORD", "ASC") or self.opt("KEYWORD", "ASCENDING")
        return (e, asc)

    def return_item(self) -> C.ReturnItem:
        e = self.expr()
        alias = None
        if self.opt("KEYWORD", "AS"):
            alias = self.eat_name()
        return C.ReturnItem(e, alias)

    def eat_name(self) -> str:
        """A name position: identifiers, or keywords used as plain names
        (edge labels like ``contains``, aliases like ``count``) — the
        original casing is preserved."""
        if self.cur.kind == "IDENT":
            return self.eat("IDENT").value
        if self.cur.kind == "KEYWORD":
            return self.eat("KEYWORD").raw
        raise CypherParseError(f"Expected name at {self.cur.pos}")

    def _peek_kw_in(self, offset: int) -> bool:
        """True when the token ``offset`` ahead is the keyword IN —
        the lookahead that distinguishes a list predicate
        ``any(x IN …)`` from an ordinary call ``any(expr)``."""
        t = self.toks[self.i + offset] if self.i + offset < len(self.toks) else None
        return t is not None and t.kind == "KEYWORD" and t.value == "IN"

    # -- clauses -------------------------------------------------------
    def _peek_is_call(self, offset: int) -> bool:
        """CALL is NOT a reserved keyword (it stays usable as a name) —
        a CALL clause is the IDENT ``call`` immediately followed by
        ``{``."""
        t = self.toks[self.i + offset] if self.i + offset < len(self.toks) else None
        nxt = (
            self.toks[self.i + offset + 1]
            if self.i + offset + 1 < len(self.toks)
            else None
        )
        return (
            t is not None
            and t.kind == "IDENT"
            and t.value.upper() == "CALL"
            and nxt is not None
            and nxt.kind == "PUNCT"
            and nxt.value == "{"
        )

    def _peek_is_proc_call(self, offset: int) -> bool:
        """``CALL`` followed by an identifier (not ``{``) starts a
        procedure invocation: ``CALL graph.pageRank(5) YIELD ...``."""
        t = self.toks[self.i + offset] if self.i + offset < len(self.toks) else None
        nxt = (
            self.toks[self.i + offset + 1]
            if self.i + offset + 1 < len(self.toks)
            else None
        )
        return (
            t is not None
            and t.kind == "IDENT"
            and t.value.upper() == "CALL"
            and nxt is not None
            and nxt.kind == "IDENT"
        )

    def proc_call_clause(self) -> C.ProcCallClause:
        """``CALL ns.proc(arg, ...) YIELD col [AS alias] (, ...)`` —
        r14 procedure-call surface.  YIELD is mandatory: the yielded
        names define the variables the rest of the query sees."""
        self.eat("IDENT")  # CALL
        name = self.eat("IDENT").raw
        while self.opt("PUNCT", "."):
            name += "." + self.eat_name()
        args: list = []
        self.eat("PUNCT", "(")
        if not self.at("PUNCT", ")"):
            args.append(self.expr())
            while self.opt("PUNCT", ","):
                args.append(self.expr())
        self.eat("PUNCT", ")")
        if not (self.cur.kind == "IDENT" and self.cur.value.upper() == "YIELD"):
            raise CypherParseError(
                f"CALL {name}(...) requires YIELD <col> [AS alias], ... "
                f"at {self.cur.pos} — procedure results must be "
                "explicitly yielded"
            )
        self.eat("IDENT")  # YIELD
        yields: list[tuple[str, str | None]] = []

        def _one() -> tuple[str, str | None]:
            col = self.eat_name()
            alias = self.eat_name() if self.opt("KEYWORD", "AS") else None
            return (col, alias)

        yields.append(_one())
        while self.opt("PUNCT", ","):
            yields.append(_one())
        where = self.expr() if self.opt("KEYWORD", "WHERE") else None
        return C.ProcCallClause(name, args, yields, where)

    def call_clause(self, optional: bool = False) -> C.CallClause:
        self.eat("IDENT")  # CALL
        self.eat("PUNCT", "{")
        imports: list[str] = []
        if self.at("KEYWORD", "WITH"):
            # importing WITH: simple bound variables only (openCypher)
            self.i += 1
            imports.append(self.eat_name())
            while self.opt("PUNCT", ","):
                imports.append(self.eat_name())
        inner = self.single()
        self.eat("PUNCT", "}")
        return C.CallClause(imports, inner, optional)

    def match_clause(self) -> C.MatchClause:
        optional = self.opt("KEYWORD", "OPTIONAL")
        self.eat("KEYWORD", "MATCH")
        paths = [self.path_item()]
        while self.opt("PUNCT", ","):
            paths.append(self.path_item())
        where = None
        if self.opt("KEYWORD", "WHERE"):
            where = self.expr()
        return C.MatchClause(paths, optional=optional, where=where)

    def unwind_clause(self) -> C.UnwindClause:
        self.eat("KEYWORD", "UNWIND")
        e = self.expr()
        self.eat("KEYWORD", "AS")
        return C.UnwindClause(e, self.eat_name())

    def with_clause(self) -> C.WithClause:
        self.eat("KEYWORD", "WITH")
        distinct = self.opt("KEYWORD", "DISTINCT")
        star = False
        items: list[C.ReturnItem] = []
        if self.at("PUNCT", "*"):
            # WITH * — carry every named variable forward (expanded at
            # compile time); extra items may follow (`WITH *, count(r)`)
            self.i += 1
            star = True
            while self.opt("PUNCT", ","):
                items.append(self.return_item())
        else:
            items = [self.return_item()]
            while self.opt("PUNCT", ","):
                items.append(self.return_item())
        wc = C.WithClause(items, distinct=distinct, star=star)
        if self.opt("KEYWORD", "ORDER"):
            self.eat("KEYWORD", "BY")
            wc.order_by.append(self.order_item())
            while self.opt("PUNCT", ","):
                wc.order_by.append(self.order_item())
        if self.opt("KEYWORD", "SKIP"):
            wc.skip = int(self.eat("NUMBER").value)
        if self.opt("KEYWORD", "LIMIT"):
            wc.limit = int(self.eat("NUMBER").value)
        if self.opt("KEYWORD", "WHERE"):
            wc.where = self.expr()
        return wc

    def path_item(self) -> C.PathPat:
        """A path with optional ``p =`` assignment and optional
        ``shortestPath(...)`` wrapper (openCypher)."""
        var = None
        if (
            self.cur.kind == "IDENT"
            and self.toks[self.i + 1].kind == "OP"
            and self.toks[self.i + 1].value == "="
        ):
            var = self.eat("IDENT").value
            self.i += 1  # '='
        # shortest: False | True (shortestPath) | "all"
        # (allShortestPaths — every minimum-length path, Neo4j
        # cardinality: one row per shortest path)
        shortest: bool | str = False
        if self.cur.kind == "IDENT" and self.cur.value.lower() in (
            "shortestpath", "allshortestpaths",
        ):
            shortest = (
                "all" if self.cur.value.lower() == "allshortestpaths" else True
            )
            self.i += 1
            self.eat("PUNCT", "(")
            p = self.path()
            self.eat("PUNCT", ")")
        else:
            p = self.path()
        p.var = var
        p.shortest = shortest
        return p

    def path(self) -> C.PathPat:
        nodes = [self.node()]
        edges: list[C.EdgePat] = []
        while True:
            edge = self.maybe_edge()
            if edge is None:
                break
            edges.append(edge)
            nodes.append(self.node())
        return C.PathPat(nodes, edges)

    def node(self) -> C.NodePat:
        self.eat("PUNCT", "(")
        alias = None
        labels: list[str] = []
        props: dict[str, C.Lit] = {}
        if self.cur.kind == "IDENT":
            alias = self.eat("IDENT").value
        while self.opt("PUNCT", ":"):
            labels.append(self.eat_name())
        if self.at("PUNCT", "{"):
            props = self.prop_map()
        self.eat("PUNCT", ")")
        return C.NodePat(alias, labels, props)

    def maybe_edge(self) -> C.EdgePat | None:
        # <-[...]-  |  <--
        if self.at("OP", "<-"):
            self.i += 1
            if self.at("PUNCT", "["):
                e = self.edge_body()
                self._eat_dash()
                e.direction = "<-"
                return e
            self._eat_dash()
            return C.EdgePat(None, direction="<-")
        # -[...]-> | -[...]- | --> | --
        if self.at("PUNCT", "-") or self.at("OP", "--"):
            if self.at("OP", "--"):  # '-->' lexes as '--' '>' ; '--' alone too
                self.i += 1
                if self.opt("OP", ">"):
                    return C.EdgePat(None, direction="->")
                return C.EdgePat(None, direction="--")
            self.i += 1  # single '-'
            if self.at("PUNCT", "["):
                e = self.edge_body()
                if self.opt("OP", "->"):
                    e.direction = "->"
                else:
                    self._eat_dash()
                    e.direction = "--"
                return e
            raise CypherParseError(f"Malformed edge at {self.cur.pos}")
        return None

    def _eat_dash(self) -> None:
        if not self.opt("PUNCT", "-"):
            raise CypherParseError(f"Expected '-' at {self.cur.pos}")

    def edge_body(self) -> C.EdgePat:
        self.eat("PUNCT", "[")
        alias = None
        labels: list[str] = []
        props: dict[str, C.Lit] = {}
        var_length = None
        if self.cur.kind == "IDENT":
            alias = self.eat("IDENT").value
        if self.opt("PUNCT", ":"):
            labels.append(self.eat_name())
            while self.opt("PUNCT", "|"):
                self.opt("PUNCT", ":")  # tolerate  :A|:B
                labels.append(self.eat_name())
        if self.opt("PUNCT", "*"):
            var_length = self.var_length_bounds()
        if self.at("PUNCT", "{"):
            props = self.prop_map()
        # r13: WEIGHT <expr> — weighted shortestPath cost (like CALL,
        # WEIGHT is NOT reserved: it is only recognized in this
        # position, immediately before ']' on a var-length edge)
        weight = None
        if self.cur.kind == "IDENT" and self.cur.value.upper() == "WEIGHT":
            if var_length is None:
                raise CypherParseError(
                    f"WEIGHT requires a variable-length relationship "
                    f"([*lo..hi]) at {self.cur.pos}"
                )
            self.eat("IDENT")
            weight = self.expr()
        self.eat("PUNCT", "]")
        return C.EdgePat(
            alias, labels, props=props, var_length=var_length, weight=weight
        )

    def var_length_bounds(self) -> tuple[int, int | None]:
        lo, hi = 1, None
        if self.cur.kind == "NUMBER":
            lo = int(self.eat("NUMBER").value)
            if self.opt("PUNCT", "."):
                self.eat("PUNCT", ".")
                if self.cur.kind == "NUMBER":
                    hi = int(self.eat("NUMBER").value)
            else:
                hi = lo  # exact length *n
        elif self.at("PUNCT", "."):
            self.eat("PUNCT", ".")
            self.eat("PUNCT", ".")
            hi = int(self.eat("NUMBER").value)
        return (lo, hi)

    def literal(self) -> C.Lit:
        t = self.cur
        if t.kind == "STRING":
            self.i += 1
            return C.Lit(_unquote(t.value), "string")
        if t.kind == "NUMBER":
            self.i += 1
            v = float(t.value) if any(c in t.value for c in ".eE") else int(t.value)
            return C.Lit(v, "number")
        if t.kind == "KEYWORD" and t.value in ("TRUE", "FALSE"):
            self.i += 1
            return C.Lit(t.value == "TRUE", "bool")
        if t.kind == "KEYWORD" and t.value == "NULL":
            self.i += 1
            return C.Lit(None, "null")
        if t.kind == "KEYWORD" and t.value == "CASE":
            self.i += 1
            operand = None if self.at("KEYWORD", "WHEN") else self.expr()
            whens: list[tuple[C.Expr, C.Expr]] = []
            while self.opt("KEYWORD", "WHEN"):
                cond = self.expr()
                self.eat("KEYWORD", "THEN")
                whens.append((cond, self.expr()))
            if not whens:
                raise CypherParseError(f"CASE requires at least one WHEN at {t.pos}")
            else_ = self.expr() if self.opt("KEYWORD", "ELSE") else None
            self.eat("KEYWORD", "END")
            return C.Case(operand, whens, else_)
        raise CypherParseError(f"Expected literal at {t.pos}")

    def prop_map(self) -> dict[str, C.Lit]:
        self.eat("PUNCT", "{")
        out: dict[str, C.Lit] = {}
        if not self.at("PUNCT", "}"):
            while True:
                key = self.eat_name()
                self.eat("PUNCT", ":")
                lit = self.literal()
                out[key] = lit
                if not self.opt("PUNCT", ","):
                    break
        self.eat("PUNCT", "}")
        return out

    # -- expressions ---------------------------------------------------
    def expr(self) -> C.Expr:
        return self.or_expr()

    def or_expr(self) -> C.Expr:
        items = [self.and_expr()]
        while self.opt("KEYWORD", "OR") or self.opt("KEYWORD", "XOR"):
            items.append(self.and_expr())
        return items[0] if len(items) == 1 else C.Or(items)

    def and_expr(self) -> C.Expr:
        items = [self.not_expr()]
        while self.opt("KEYWORD", "AND"):
            items.append(self.not_expr())
        return items[0] if len(items) == 1 else C.And(items)

    def not_expr(self) -> C.Expr:
        if self.opt("KEYWORD", "NOT"):
            return C.Not(self.not_expr())
        return self.comparison()

    def comparison(self) -> C.Expr:
        left = self.add_expr()
        t = self.cur
        if t.kind == "OP" and t.value == "=~":
            # openCypher regex match: '=~' is a FULL-string match
            self.i += 1
            return C.StringOp("REGEX", left, self.add_expr())
        if t.kind == "OP" and t.value in ("=", "<>", "<", ">", "<=", ">="):
            self.i += 1
            return C.Cmp(t.value, left, self.add_expr())
        if self.at("KEYWORD", "STARTS"):
            self.i += 1
            self.eat("KEYWORD", "WITH")
            return C.StringOp("STARTS WITH", left, self.primary())
        if self.at("KEYWORD", "ENDS"):
            self.i += 1
            self.eat("KEYWORD", "WITH")
            return C.StringOp("ENDS WITH", left, self.primary())
        if self.opt("KEYWORD", "CONTAINS"):
            return C.StringOp("CONTAINS", left, self.primary())
        if self.opt("KEYWORD", "IN"):
            return C.InList(left, self.primary())
        if self.at("KEYWORD", "IS"):
            self.i += 1
            negated = self.opt("KEYWORD", "NOT")
            self.eat("KEYWORD", "NULL")
            return C.IsNull(left, negated)
        return left

    def add_expr(self) -> C.Expr:
        left = self.mul_expr()
        while True:
            if self.at("OP", "+"):
                self.i += 1
                left = C.Arith("+", left, self.mul_expr())
            elif self.at("PUNCT", "-"):
                self.i += 1
                left = C.Arith("-", left, self.mul_expr())
            elif self.cur.kind == "NUMBER" and self.cur.value.startswith("-"):
                # `a-1` lexes the minus into the number literal; undo it
                t = self.cur
                self.i += 1
                left = C.Arith("-", left, C.Lit(
                    float(t.value[1:]) if any(c in t.value for c in ".eE")
                    else int(t.value[1:]), "number"))
            else:
                return left

    def mul_expr(self) -> C.Expr:
        left = self.pow_expr()
        while (self.at("PUNCT", "*") and self.toks[self.i + 1].kind
               in ("IDENT", "NUMBER", "STRING")) or (
            self.cur.kind == "OP" and self.cur.value in ("/", "%")
        ):
            op = "*" if self.at("PUNCT", "*") else self.cur.value
            self.i += 1
            left = C.Arith(op, left, self.pow_expr())
        return left

    def pow_expr(self) -> C.Expr:
        left = self.primary()
        if self.at("OP", "^"):
            self.i += 1
            # right-associative: 2 ^ 3 ^ 2 = 2 ^ (3 ^ 2)
            return C.Arith("^", left, self.pow_expr())
        return left

    def _postfix(self, e):
        """Trailing ``.name`` segments after a call or parenthesized
        expression — temporal component access on computed values
        (``datetime(x).year``, ``duration.between(a,b).days``)."""
        path = []
        while self.at("PUNCT", "."):
            self.i += 1
            path.append(self.eat_name())
        import pg_age_digitaltwins_spark.cypher.ast as C

        return C.PostfixProp(e, path) if path else e

    def primary(self) -> C.Expr:
        t = self.cur
        if t.kind == "STRING":
            self.i += 1
            return C.Lit(_unquote(t.value), "string")
        if t.kind == "NUMBER":
            self.i += 1
            v = float(t.value) if any(c in t.value for c in ".eE") else int(t.value)
            return C.Lit(v, "number")
        if t.kind == "KEYWORD" and t.value in ("TRUE", "FALSE"):
            self.i += 1
            return C.Lit(t.value == "TRUE", "bool")
        if t.kind == "KEYWORD" and t.value == "NULL":
            self.i += 1
            return C.Lit(None, "null")
        if t.kind == "KEYWORD" and t.value == "CASE":
            self.i += 1
            operand = None if self.at("KEYWORD", "WHEN") else self.expr()
            whens: list[tuple[C.Expr, C.Expr]] = []
            while self.opt("KEYWORD", "WHEN"):
                cond = self.expr()
                self.eat("KEYWORD", "THEN")
                whens.append((cond, self.expr()))
            if not whens:
                raise CypherParseError(f"CASE requires at least one WHEN at {t.pos}")
            else_ = self.expr() if self.opt("KEYWORD", "ELSE") else None
            self.eat("KEYWORD", "END")
            return C.Case(operand, whens, else_)
        if self.opt("PUNCT", "["):
            # `[x IN src WHERE pred | map]` — list comprehension; the
            # IDENT-IN prefix disambiguates from a plain list literal
            if (
                self.cur.kind == "IDENT"
                and self.toks[self.i + 1].kind == "KEYWORD"
                and self.toks[self.i + 1].value == "IN"
            ):
                var = self.eat("IDENT").value
                self.eat("KEYWORD", "IN")
                src = self.expr()
                where = self.expr() if self.opt("KEYWORD", "WHERE") else None
                mp = self.expr() if self.opt("PUNCT", "|") else None
                self.eat("PUNCT", "]")
                return C.ListComp(var, src, where, mp)
            items: list[C.Expr] = []
            if not self.at("PUNCT", "]"):
                while True:
                    items.append(self.expr())
                    if not self.opt("PUNCT", ","):
                        break
            self.eat("PUNCT", "]")
            return C.ListLit(items)
        if self.at("PUNCT", "("):
            # `(a)-[:R]->(b)` in expression position is an existential
            # pattern predicate; try the path grammar first and fall
            # back to a parenthesized expression (a bare `(x)` has no
            # edges and reparses as the expression x)
            save = self.i
            try:
                p = self.path()
                if p.edges:
                    return C.PatternPred(p)
            except CypherParseError:
                pass
            self.i = save
            self.eat("PUNCT", "(")
            e = self.expr()
            self.eat("PUNCT", ")")
            return self._postfix(e)
        if t.kind == "KEYWORD" and t.value == "ALL" and (
            self.toks[self.i + 1].kind == "PUNCT"
            and self.toks[self.i + 1].value == "("
        ):
            # ALL is the UNION ALL keyword, but ``all(x IN … WHERE …)``
            # in expression position is the list predicate
            self.i += 1
            return self._postfix(self._call("all"))
        if t.kind == "IDENT" or (t.kind == "KEYWORD" and t.value == "COUNT"):
            name = t.value
            self.i += 1
            if self.at("PUNCT", "{") and name.upper() in ("COUNT", "EXISTS"):
                # COUNT { … } / EXISTS { … } pattern subqueries
                self.eat("PUNCT", "{")
                self.opt("KEYWORD", "MATCH")
                p = self.path()
                where = self.expr() if self.opt("KEYWORD", "WHERE") else None
                self.eat("PUNCT", "}")
                if name.upper() == "COUNT":
                    return C.CountSub(p, where)
                return C.PatternPred(p, where)
            if self.at("PUNCT", "("):  # function call
                return self._postfix(self._call(name.lower()))
            path: list[str] = []
            dotted = True  # every segment so far came from `.` (call-eligible)
            while True:
                if self.opt("PUNCT", "."):
                    # keywords are legal property names after a dot
                    # (Neo4j/AGE: ``t.when``, ``t.contains`` — only the
                    # dot position disambiguates)
                    path.append(self.eat_name())
                elif (
                    self.at("PUNCT", "[")
                    and self.toks[self.i + 1].kind == "STRING"
                    and self.toks[self.i + 2].kind == "PUNCT"
                    and self.toks[self.i + 2].value == "]"
                ):
                    # AGE bracket property access: ``R['$sourceId']``,
                    # chained ``T['$metadata']['$model']`` — string-key
                    # subscripts only (the 3-token lookahead keeps list
                    # literals after IN unambiguous)
                    self.i += 1
                    path.append(_unquote(self.eat("STRING").value))
                    self.eat("PUNCT", "]")
                    dotted = False
                else:
                    break
            if path and dotted and self.at("PUNCT", "("):
                # namespace-qualified function call, e.g. the installed
                # plpgsql helper ``digitaltwins.is_of_model(t, 'dtmi:…')``
                # (GraphInitialization.cs:50-121; docs/concepts/querying.mdx)
                return self._postfix(
                    self._call(".".join([name] + path).lower())
                )
            if path:
                return C.Prop(name, path)
            return C.Var(name)
        raise CypherParseError(f"Unexpected token {t.value!r} at {t.pos}")

    def _call(self, name: str) -> C.Expr:
        """Parse the argument list of a (possibly qualified) call whose
        opening paren is the current token."""
        self.eat("PUNCT", "(")
        if name == "reduce":
            # reduce(acc = init, x IN src | step) — special fold syntax
            acc = self.eat("IDENT").value
            self.eat("OP", "=")
            init = self.expr()
            self.eat("PUNCT", ",")
            var = self.eat("IDENT").value
            self.eat("KEYWORD", "IN")
            src = self.expr()
            self.eat("PUNCT", "|")
            step = self.expr()
            self.eat("PUNCT", ")")
            return C.Reduce(acc, init, var, src, step)
        if name in ("any", "all", "none", "single") and (
            self.at("IDENT") and self._peek_kw_in(1)
        ):
            # any/all/none/single(x IN src WHERE pred) — list predicate
            # (the IDENT-IN lookahead keeps plain calls like all(x)
            # parsing as Func)
            var = self.eat("IDENT").value
            self.eat("KEYWORD", "IN")
            src = self.expr()
            self.eat("KEYWORD", "WHERE")
            where = self.expr()
            self.eat("PUNCT", ")")
            return C.ListPred(name, var, src, where)
        distinct = self.opt("KEYWORD", "DISTINCT")
        if self.opt("PUNCT", "*"):
            self.eat("PUNCT", ")")
            return C.Func(name, [], star=True)
        args: list[C.Expr] = []
        if not self.at("PUNCT", ")"):
            while True:
                args.append(self.expr())
                if not self.opt("PUNCT", ","):
                    break
        self.eat("PUNCT", ")")
        return C.Func(name, args, distinct=distinct)


def _unquote(s: str) -> str:
    body = s[1:-1]
    return body.replace("\\'", "'").replace('\\"', '"').replace("\\\\", "\\")


def parse_cypher(text: str) -> C.UnionQuery | C.SingleQuery:
    for kw in WRITE_KEYWORDS:
        # keyword filter parity (Query.cs:68-88) — word-boundary scan
        import re

        if re.search(rf"\b{kw}\b", text, re.IGNORECASE):
            raise CypherParseError(
                f"Write operations are not allowed in queries ({kw})"
            )
    return _Parser(tokenize(text)).query()
