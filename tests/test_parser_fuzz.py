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
    "substring(", "replace(", "split(", "head(", "last(", "toBoolean(",
    "left(", "right(", "trim(", "reverse(", "range(",
    # r8 grammar: subqueries + path accessors
    "CALL {", "}", "EXISTS {", "COUNT {", "OPTIONAL CALL", "WITH a",
    "nodes(", "relationships(", "=~", "reduce(", "| x",
    # r8 session 3: bracket access, graph-qualified helpers, stars,
    # bare $-idents, temporal constructors
    "['$dtId']", "['$metadata']['$model']", "[''", "']",
    "testgraph.is_of_model(", "g.model_and_descendants(", "g.is_number(",
    "RETURN *", "WITH *", "*,", ".$dtId", "$x", "labels(", "elementId(",
    "date(", "datetime(",
    # r9 grammar: durations, postfix component access, keyword props
    "duration(", "duration.between(", "duration('P30D')", ".year",
    ".days", "(d + duration('P1D')).day", "t.when", "t.contains",
    "datetime(t.ts).year", "'P1M2D'",
    # r10 grammar: truncate/time constructors, duration scaling,
    # allShortestPaths
    "datetime.truncate(", "date.truncate('week',", "'month'",
    "time(", "localtime(", "duration('P1D') * 3", "/ 2",
    "allShortestPaths(", "allShortestPaths((a)-[*..2]->(b))",
    ".quarters", ".milliseconds",
    # r10 tail: endpoint accessors
    "startNode(", "endNode(", "startNode(r)", "endNode(r)",
    # r12 grammar: list predicates (incl. the ALL-keyword collision in
    # expression position) and percentile aggregates
    "any(", "all(", "none(", "single(", "any(x IN", "x IN t.xs",
    "all(x IN [1,2] WHERE x > 0)", "single(x IN t.tags WHERE",
    "none(x IN", "UNION ALL", "all(x)", "percentileCont(",
    "percentileDisc(t.x, 0.5)", "stDev(",
    # r13 grammar: weighted shortestPath — WEIGHT in the edge bracket
    # (position-recognized, not reserved) and the cost() accessor
    "WEIGHT", "WEIGHT r.w", "*1..3 WEIGHT", "[r:next*1..2 WEIGHT r.w]",
    "WEIGHT toInteger(coalesce(r.quantity, 1))", "cost(", "cost(p)",
    "shortestPath((a)-[r*1..2 WEIGHT r.w]->(b))", "[*2 WEIGHT",
    # r14 grammar: procedure calls — CALL ns.proc(args) YIELD c AS a
    "CALL graph.pageRank(", "YIELD", "YIELD node, rank",
    "CALL graph.degree() YIELD node AS n", "CALL graph.",
    "graph.personalizedPageRank(['a'],", "YIELD node WHERE rank > 0",
    "CALL x.y.z(1, 0.5)", "CALL graph.pageRank(5) YIELD",
    # r15 grammar: weight-property / relTypes trailing projections
    "CALL graph.pageRank(5, 0.85, 'q')", "'quantity', ['contains']",
    "CALL graph.pageRank(3, 0.85, ['next'], 'q') YIELD node, rank",
    # r16: the dedup/ann/text procedure families
    "CALL dedup.minhashVerified(0.5) YIELD doc_a, doc_b",
    "CALL ann.hamming(0, 10,", "CALL text.profile() YIELD column",
    "ann.cosine(0", "dedup.exactGroups()", "YIELD fp, n_docs",
    "dedup.levenshteinVerified(5", "text.langId()", "text.fingerprints()",
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


def test_compile_totality_on_parseable_fuzz(spark):
    """Strings that PARSE must either compile or raise the compilers'
    own error types — a leaked AnalysisException from query_df is a 500
    where the user deserves a 400."""
    import itertools
    import random

    from pg_age_digitaltwins_spark.adtql.compiler import CompileError
    from pg_age_digitaltwins_spark.client import DigitalTwinsSparkClient
    from pg_age_digitaltwins_spark.cypher.compiler import CypherCompileError
    from pg_age_digitaltwins_spark.store.graph_store import GraphStore

    models = [{"@id": "dtmi:fz:T;1", "@type": "Interface",
               "@context": "dtmi:dtdl:context;3", "contents": []}]
    twins = [{"$dtId": "t1", "$metadata": {"$model": "dtmi:fz:T;1"}, "x": 1.0}]
    rels = [{"$relationshipId": "r1", "$sourceId": "t1", "$targetId": "t1",
             "$relationshipName": "self"}]
    client = DigitalTwinsSparkClient(GraphStore.from_documents(
        spark, twin_docs=twins, relationship_docs=rels, model_docs=models))

    frags = [
        "SELECT", "TOP(2)", "COUNT()", "T", "T.$dtId", "T.x", "*",
        "FROM DIGITALTWINS", "FROM RELATIONSHIPS", "WHERE", "AND", "OR",
        "NOT", "IS_OF_MODEL('dtmi:fz:T;1')", "IS_DEFINED(x)", "x > 0",
        "JOIN B RELATED T.self", "MATCH (a)-[r:self]->(b)", "T.x = 'a'",
    ]
    cy_frags = [
        "MATCH (t:Twin)", "MATCH (a)-[r]->(b)", "WHERE t.x > 0", "WITH t",
        "RETURN t", "RETURN count(*) AS n", "RETURN t.x AS v", "UNWIND [1,2] AS u",
        "ORDER BY v", "LIMIT 2", "RETURN length(p)", "MATCH p = shortestPath((a)-[*..2]->(b))",
        "RETURN id(t) AS i", "RETURN CASE WHEN t.x > 0 THEN 1 ELSE 2 END AS c",
        "RETURN any(x IN [1,2] WHERE x = t.x) AS lp",
        "WHERE none(x IN [0] WHERE x > t.x)",
        "RETURN percentileDisc(t.x, 0.5) AS pd",
        # r13: weighted shortestPath through the COMPILE path too —
        # stray WEIGHT/cost fragments must surface as CypherParse/
        # CompileError, never as analysis exceptions
        "MATCH p = shortestPath((a)-[r:self*1..2 WEIGHT toInteger(r.w)]->(b))",
        "RETURN cost(p) AS c", "MATCH (a)-[r*1..2 WEIGHT r.w]->(b)",
    ]
    rng = random.Random(42)
    checked = 0
    for _ in range(400):
        adt = " ".join(rng.sample(frags, rng.randint(2, 6)))
        cy = " ".join(rng.sample(cy_frags, rng.randint(2, 5)))
        for q in (adt, cy):
            try:
                client.query_df(q)
                checked += 1
            except (ValueError,) as exc:
                # ParseError / LexError / CompileError / CypherCompileError
                # are all ValueError-family — the 400 contract
                assert isinstance(
                    exc,
                    (ValueError,),
                ), exc
            # anything else (AnalysisException, Py4JError, KeyError...)
            # propagates and fails the test
    assert checked >= 0
