"""Parser unit tests over the golden ADT QL corpus
(``src/AgeDigitalTwins.Test/AdtQueryToCypherTests.cs:5-193``) — we
assert AST shape, not Cypher strings."""

from pg_age_digitaltwins_spark.adtql import ast as A
from pg_age_digitaltwins_spark.adtql.parser import parse


def test_select_alias():
    q = parse("SELECT T FROM DIGITALTWINS T")
    assert q.source == "digitaltwins"
    assert q.source_alias == "T"
    assert isinstance(q.select, list)
    assert q.select[0].expr.path == ["T"]


def test_select_star():
    q = parse("SELECT * FROM DIGITALTWINS")
    assert isinstance(q.select, A.Star)
    assert q.source_alias is None


def test_relationships_case_insensitive():
    q = parse("SELECT * FROM relationships WHERE $sourceId = 'source'")
    assert q.source == "relationships"
    assert isinstance(q.where, A.Cmp)
    assert q.where.left.path == ["$sourceId"]


def test_top_with_space():
    q = parse("SELECT TOP (50) twin FROM DIGITALTWINS twin")
    assert q.top == 50


def test_count():
    q = parse("SELECT COUNT() FROM DIGITALTWINS")
    assert isinstance(q.select, A.CountAll)


def test_top_no_projection_is_star():
    q = parse("SELECT TOP(1) FROM DIGITALTWINS WHERE $metadata.$model = 'm'")
    assert isinstance(q.select, A.Star)
    assert q.top == 1


def test_nested_dollar_path():
    q = parse("SELECT * FROM DIGITALTWINS WHERE $metadata.$model='x'")
    assert q.where.left.path == ["$metadata", "$model"]


def test_match_pattern_directions():
    q = parse("SELECT r, t FROM DIGITALTWINS MATCH (s)<-[r]-(t) WHERE s.$dtId = 'root3'")
    assert q.match.edges[0].direction == "<-"
    assert q.match.nodes[0].alias == "s"
    assert q.match.nodes[1].alias == "t"

    q2 = parse("SELECT T,R FROM DIGITALTWINS MATCH (current)-[R]->(T) WHERE current.$dtId='root'")
    assert q2.match.edges[0].direction == "->"


def test_match_multilabel():
    q = parse(
        "SELECT B, R FROM DIGITALTWINS MATCH (T)-[R:hasBlob|hasModel]->(B) WHERE T.$dtId = 'root3'"
    )
    assert q.match.edges[0].labels == ["hasBlob", "hasModel"]


def test_match_chain():
    q = parse(
        "SELECT B FROM DIGITALTWINS MATCH (T)-[R:a]->(B)-[R2:b]->(T2) WHERE T.$dtId = 'x'"
    )
    assert len(q.match.nodes) == 3
    assert len(q.match.edges) == 2


def test_join_related_chain():
    q = parse(
        "SELECT LightBulb FROM DIGITALTWINS Building "
        "JOIN Floor RELATED Building.contains "
        "JOIN Room RELATED Floor.contains "
        "JOIN LightPanel RELATED Room.contains "
        "JOIN LightBulbRow RELATED LightPanel.contains "
        "JOIN LightBulb RELATED LightBulbRow.contains "
        "WHERE Building.$dtId = 'Building1'"
    )
    assert len(q.joins) == 5
    assert q.joins[0].target_alias == "Floor"
    assert q.joins[0].source_alias == "Building"
    assert q.joins[0].rel_name == "contains"


def test_join_related_with_rel_alias():
    q = parse("SELECT B, R FROM DIGITALTWINS DT JOIN B RELATED DT.has R WHERE DT.$dtId = 'root2'")
    assert q.joins[0].rel_alias == "R"


def test_functions_and_boolean_nesting():
    q = parse(
        "SELECT TOP(50) FROM DIGITALTWINS WHERE (CONTAINS(email,'test') OR CONTAINS(name,'test') "
        "OR CONTAINS($dtId,'test')) AND (IS_OF_MODEL('dtmi:com:example:identity:User;1') "
        "OR IS_OF_MODEL('dtmi:com:example:identity:Invite;1'))"
    )
    assert isinstance(q.where, A.And)
    assert isinstance(q.where.items[0], A.Or)


def test_in_list():
    q = parse("SELECT T FROM DIGITALTWINS T WHERE T.$dtId IN ['room1', 'room2']")
    assert isinstance(q.where, A.InList)
    assert [i.value for i in q.where.items.items] == ["room1", "room2"]


def test_neq_and_numbers():
    q = parse("SELECT * FROM DIGITALTWINS WHERE IS_NUMBER(Capacity) AND Capacity != 0")
    assert isinstance(q.where, A.And)
    cmp = q.where.items[1]
    assert cmp.op == "!="
    assert cmp.right.value == 0


def test_array_contains_typed_literals():
    for lit, val in [("'tag1'", "tag1"), ("1", 1), ("true", True)]:
        q = parse(f"SELECT T FROM DIGITALTWINS T WHERE ARRAY_CONTAINS(T.tags, {lit})")
        fc = q.where
        assert isinstance(fc, A.FuncCall)
        assert fc.args[1].value == val


def test_is_of_model_variants():
    q = parse("SELECT * FROM DIGITALTWINS WHERE IS_OF_MODEL(T, 'm;1', exact)")
    fc = q.where
    assert fc.name == "IS_OF_MODEL"
    assert len(fc.args) == 3


def test_keyword_property_names_after_dot():
    """Neo4j/AGE allow reserved words as property names after a dot —
    the dot position disambiguates (r9)."""
    from pg_age_digitaltwins_spark.cypher.parser import parse_cypher

    q = parse_cypher(
        "MATCH (t) WHERE t.when > 1 RETURN t.contains AS c, t.order AS o"
    )
    s = q.queries[0] if hasattr(q, "queries") else q
    names = [it.alias for it in s.ret]
    assert names == ["c", "o"]
