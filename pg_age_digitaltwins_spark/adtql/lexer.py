"""Tokenizer for the ADT Query Language.

The reference never tokenizes — it rewrites ADT QL to Cypher with ~25
regexes (``src/AgeDigitalTwins/AdtQueryHelpers.cs``).  We build a real
lexer/parser instead; the golden pairs in
``src/AgeDigitalTwins.Test/AdtQueryToCypherTests.cs:5-193`` are the
behavioral spec.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+)
  | (?P<number>-?\d+(?:\.\d+)?(?:[eE][+-]?\d+)?)
  | (?P<string>'(?:[^'\\]|\\.)*')
  | (?P<ident>[$A-Za-z_][$A-Za-z_0-9]*)
  | (?P<op><=|>=|!=|<-|->|=|<|>|-)
  | (?P<punct>[(),.\[\]|:*])
    """,
    re.VERBOSE,
)

KEYWORDS = {
    "SELECT", "TOP", "COUNT", "FROM", "WHERE", "AND", "OR", "NOT", "IN",
    "NIN", "MATCH", "JOIN", "RELATED", "AS", "DIGITALTWINS", "RELATIONSHIPS",
    "TRUE", "FALSE",
}


@dataclass
class Token:
    kind: str  # KEYWORD | IDENT | NUMBER | STRING | OP | PUNCT | EOF
    value: str
    pos: int

    def __repr__(self) -> str:  # pragma: no cover
        return f"{self.kind}({self.value!r})"


class LexError(ValueError):
    pass


def tokenize(text: str) -> list[Token]:
    tokens: list[Token] = []
    pos = 0
    n = len(text)
    while pos < n:
        m = TOKEN_RE.match(text, pos)
        if not m:
            raise LexError(f"Unexpected character {text[pos]!r} at {pos}")
        kind = m.lastgroup
        val = m.group()
        if kind != "ws":
            if kind == "ident" and val.upper() in KEYWORDS:
                tokens.append(Token("KEYWORD", val.upper(), pos))
            elif kind == "ident":
                tokens.append(Token("IDENT", val, pos))
            elif kind == "number":
                tokens.append(Token("NUMBER", val, pos))
            elif kind == "string":
                tokens.append(Token("STRING", val, pos))
            elif kind == "op":
                tokens.append(Token("OP", val, pos))
            else:
                tokens.append(Token("PUNCT", val, pos))
        pos = m.end()
    tokens.append(Token("EOF", "", n))
    return tokens
