"""Tokenizer for the Cypher read subset.

openCypher-style lexical rules: backquoted identifiers for reserved
keys (``` `$dtId` ```), single- or double-quoted strings, ``//`` line
comments.  The reference ships these queries to AGE's parser
(``Npgsql.Age`` wraps them in ``ag_catalog.cypher``); we parse them
ourselves.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+|//[^\n]*)
  | (?P<number>-?\d+(?:\.\d+)?(?:[eE][+-]?\d+)?)
  | (?P<string>'(?:[^'\\]|\\.)*'|"(?:[^"\\]|\\.)*")
  | (?P<bq>`[^`]*`)
  | (?P<ident>[A-Za-z_][A-Za-z_0-9]*)
  | (?P<dident>\$[A-Za-z_][A-Za-z_0-9]*)
  | (?P<op><=|>=|<>|<-|->|--|=~|=|<|>|\+|/|%|\^)
  | (?P<punct>[(){},.\[\]|:*-])
    """,
    re.VERBOSE,
)

KEYWORDS = {
    "MATCH", "OPTIONAL", "WHERE", "RETURN", "AS", "ORDER", "BY", "SKIP",
    "LIMIT", "UNWIND", "UNION", "ALL", "DISTINCT", "AND", "OR", "NOT",
    "XOR", "IN", "IS", "NULL", "STARTS", "ENDS", "WITH", "CONTAINS",
    "ASC", "ASCENDING", "DESC", "DESCENDING", "TRUE", "FALSE",
    "CASE", "WHEN", "THEN", "ELSE", "END",
    # write keywords — recognized so the safety filter can reject them
    "CREATE", "MERGE", "SET", "DELETE", "DETACH", "REMOVE",
}


@dataclass
class Token:
    kind: str  # KEYWORD | IDENT | NUMBER | STRING | OP | PUNCT | EOF
    value: str
    pos: int
    raw: str = ""  # original text (keywords are upper-cased in ``value``)

    def __repr__(self) -> str:  # pragma: no cover
        return f"{self.kind}({self.value!r})"


class CypherLexError(ValueError):
    pass


def tokenize(text: str) -> list[Token]:
    tokens: list[Token] = []
    pos = 0
    n = len(text)
    while pos < n:
        m = TOKEN_RE.match(text, pos)
        if not m:
            raise CypherLexError(f"Unexpected character {text[pos]!r} at {pos}")
        kind = m.lastgroup
        val = m.group()
        if kind != "ws":
            if kind == "ident" and val.upper() in KEYWORDS:
                tokens.append(Token("KEYWORD", val.upper(), pos, val))
            elif kind in ("ident", "dident"):
                # dident: unbackticked ``$``-prefixed property names
                # (``T.$dtId``) — AGE accepts them bare in property
                # position; parameters are not supported in /query
                tokens.append(Token("IDENT", val, pos, val))
            elif kind == "bq":
                tokens.append(Token("IDENT", val[1:-1], pos, val[1:-1]))
            elif kind == "number":
                tokens.append(Token("NUMBER", val, pos, val))
            elif kind == "string":
                tokens.append(Token("STRING", val, pos, val))
            elif kind == "op":
                tokens.append(Token("OP", val, pos, val))
            else:
                tokens.append(Token("PUNCT", val, pos, val))
        pos = m.end()
    tokens.append(Token("EOF", "", n))
    return tokens
