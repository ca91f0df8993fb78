"""Parser robustness: arbitrary input must produce a clean ParseError
(or parse), never crash with an unrelated exception type or hang — the
/query endpoint feeds raw user strings straight into these parsers, so
every non-ParseError escape is a 500 instead of a 400."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from pg_age_digitaltwins_spark.adtql.lexer import LexError
from pg_age_digitaltwins_spark.adtql.parser import ParseError, parse as parse_adt
from pg_age_digitaltwins_spark.cypher.lexer import CypherLexError
from pg_age_digitaltwins_spark.cypher.parser import CypherParseError, parse_cypher

# printable junk + query-ish fragments to push deeper into the grammars
_FRAGMENTS = st.sampled_from([
    "SELECT", "TOP(", "COUNT()", "FROM", "DIGITALTWINS", "RELATIONSHIPS",
    "MATCH", "WHERE", "RETURN", "JOIN", "RELATED", "IS_OF_MODEL(",
    "STARTSWITH(", "AND", "OR", "NOT", "IN", "[", "]", "(", ")", "'x'",
    "T.$dtId", "$metadata", "->", "<-", "-[r:a|b*1..3]-", "..", "*", ",",
    "UNWIND", "WITH", "AS", "ORDER BY", "SKIP 1", "LIMIT 2", "CASE WHEN",
    "THEN", "ELSE", "END", "shortestPath(", "1.5e3", "`$dtId`", "= =",
    "\\", "'", '"', "//", "count(*)", "+", "-", "%", "p =",
])
_QUERYISH = st.lists(_FRAGMENTS, max_size=12).map(" ".join)


@settings(max_examples=300, deadline=None)
@given(st.one_of(st.text(max_size=120), _QUERYISH))
def test_adtql_parser_total(s: str) -> None:
    try:
        parse_adt(s)
    except (ParseError, LexError):
        # the contract: structured (ValueError-family) errors that the
        # HTTP layer maps to 400 — never an unrelated crash
        pass


@settings(max_examples=300, deadline=None)
@given(st.one_of(st.text(max_size=120), _QUERYISH))
def test_cypher_parser_total(s: str) -> None:
    try:
        parse_cypher(s)
    except (CypherParseError, CypherLexError):
        pass
