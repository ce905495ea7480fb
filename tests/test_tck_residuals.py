"""Residual TCK transcriptions (r7 verdict item 3): the base
lookup/LookUp.feature sweep, yield/return.feature, and
basic/Parser.feature. With these, the uncovered TCK remainder is exactly
optimizer plan-shape files (Catalyst owns plan shapes), obsolete admin,
.IntVid fixture duplicates, and the upstream-@skip'd files.

Reference files (query/expected pairs transcribed):
  tests/tck/features/lookup/LookUp.feature   (1066 lines)
  tests/tck/features/yield/return.feature    (144 lines)
  tests/tck/features/basic/Parser.feature    (16 lines)
"""

from __future__ import annotations

import pytest

from nebula_spark.catalog import SpaceCatalog
from nebula_spark.plans import execute
from nebula_spark.plans.ngql import parse


def rows(df, *cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


# ---------------------------------------------------------------------------
# basic/Parser.feature — special whitespace tolerance
# ---------------------------------------------------------------------------

def test_parser_special_whitespace(spark):
    """Parser.feature: runs of spaces (and tabs) between tokens lex away."""
    cat = SpaceCatalog(spark)
    execute(cat, "CREATE SPACE pws; USE pws")
    assert execute(cat, "USE pws; SHOW  SPACES").count() == 1
    df = execute(cat, "USE pws; RETURN  1")
    assert [tuple(r) for r in df.collect()] == [(1,)]
    assert execute(cat, "USE pws; RETURN\t1\t AS x").collect()[0].x == 1


# ---------------------------------------------------------------------------
# yield/return.feature — "A standalone return sentence is actually a
# yield sentence"
# ---------------------------------------------------------------------------

def test_return_base(spark, nba):
    from nebula_spark.catalog import GraphSpace
    sp = GraphSpace(spark, "ret")
    sp.create_tag("player", df=nba["player"])
    sp.create_edge("like", df=nba["like"])

    assert execute(sp, "RETURN 1+1 AS sum").collect()[0].sum == 2
    r = execute(sp, "RETURN last(LIST[]) AS a, head(LIST[]) AS b").collect()
    assert (r[0].a, r[0].b) == (None, None)
    assert execute(sp, "RETURN 1- -1 AS sub").collect()[0].sub == 2
    # `--` is MINUS_MINUS in the reference lexer (scanner.lex:370) with
    # no production — a syntax error, never 1-(-1)
    with pytest.raises(SyntaxError):
        execute(sp, "RETURN 1--1 AS sub")
    # list minus is a type refusal in both engines (ours via Catalyst's
    # DATATYPE_MISMATCH remapped to SemanticError; the reference phrases
    # the spaced form as SemanticError and the unspaced one as a
    # SyntaxError on `]-` — both refuse, class deviation documented)
    with pytest.raises(ValueError, match="SemanticError"):
        execute(sp, "RETURN [2,3 ] - [3] AS sub")
    with pytest.raises(ValueError, match="SemanticError"):
        execute(sp, "RETURN [2,3 ]-[3] AS sub")


def test_return_distinct_casts_row(spark):
    from nebula_spark.catalog import GraphSpace
    sp = GraphSpace(spark, "ret2")
    df = execute(sp, "RETURN DISTINCT 1+1, '1+1', (int)3.14, "
                     "(string)(1+1), (string)true")
    # expression-text column names, exactly the reference's header
    assert df.columns == ['(1+1)', '"1+1"', '(INT)3.14',
                          '(STRING)(1+1)', '(STRING)true']
    assert [tuple(r) for r in df.collect()] == [(2, "1+1", 3, "2", "true")]


def test_return_as_pipe_stage(spark, nba):
    from nebula_spark.catalog import GraphSpace
    sp = GraphSpace(spark, "ret3")
    sp.create_tag("player", df=nba["player"])
    sp.create_edge("like", df=nba["like"])
    df = execute(sp, 'GO FROM "p1" OVER like YIELD id($$) AS vid '
                     '| RETURN $-.vid AS dst')
    assert {r.dst for r in df.collect()} == {"p2", "p3"}
    df = execute(sp, 'FETCH PROP ON player "p2" YIELD player.age AS age '
                     '| RETURN $-.age + 100 AS age')
    assert [r.age for r in df.collect()] == [136]


def test_return_hash_call(spark):
    """return.feature "hash call": reference-exact values — strings via
    MurmurHash64A seed 0xc70f6907 (libstdc++ std::hash<string>), ints
    hash to themselves (Value.h:569-578)."""
    from nebula_spark.catalog import GraphSpace
    sp = GraphSpace(spark, "ret4")
    df = execute(sp, 'RETURN hash("Boris")')
    assert df.columns == ['hash("Boris")']
    assert df.collect()[0][0] == 9126854228122744212 - (1 << 64) \
        or df.collect()[0][0] == 9126854228122744212
    assert execute(sp, "RETURN hash(123)").collect()[0][0] == 123


def test_return_logical_precedence(spark):
    from nebula_spark.catalog import GraphSpace
    sp = GraphSpace(spark, "ret5")
    df = execute(sp, "RETURN NOT FALSE OR FALSE AND FALSE XOR FALSE")
    assert df.columns == ["((!(false) OR (false AND false)) XOR false)"]
    assert df.collect()[0][0] is True


def test_return_error_checks(spark, nba):
    from nebula_spark.catalog import GraphSpace
    sp = GraphSpace(spark, "ret6")
    sp.create_tag("player", df=nba["player"])
    # non-deterministic functions inside aggregates are refused (the
    # reference raises at parse; Catalyst raises at analysis — both land
    # in the SemanticError refusal class here)
    with pytest.raises((ValueError, SyntaxError)):
        execute(sp, "RETURN count(rand32())")
    with pytest.raises((ValueError, SyntaxError)):
        execute(sp, "RETURN avg(ranD()+1)")
    # $$/$^ on an unknown tag → TagNotFound (routed through the yield
    # grammar — return.feature "Error check")
    with pytest.raises(ValueError, match="TagNotFound"):
        execute(sp, "RETURN $$.dummyTag.p")
    with pytest.raises(ValueError, match="TagNotFound"):
        execute(sp, "RETURN $^.dummyTag.p")
    with pytest.raises(ValueError, match="not exist prop"):
        execute(sp, "RETURN $-.dummyTag.p")
    # bare label on the unit row — reference phrasing exactly
    with pytest.raises(ValueError, match="Invalid label identifiers: name"):
        execute(sp, "RETURN name")


# ---------------------------------------------------------------------------
# lookup/LookUp.feature — base-file sweep
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def lookup_cat(spark):
    cat = SpaceCatalog(spark)
    execute(cat, """
        CREATE SPACE lkbase; USE lkbase;
        CREATE TAG lookup_tag_1(col1 int, col2 int, col3 int);
        CREATE TAG lookup_tag_2(col1 bool, col2 int, col3 double, col4 bool);
        CREATE TAG INDEX t_index_1 ON lookup_tag_1(col1, col2, col3);
        CREATE TAG INDEX t_index_2 ON lookup_tag_2(col2, col3, col4);
        CREATE EDGE lookup_edge_1(col1 int, col2 int, col3 int);
        CREATE EDGE INDEX e_index_1 ON lookup_edge_1(col1, col2, col3);
        CREATE TAG student(number int, age int);
        CREATE TAG INDEX student_index ON student(number, age);
        CREATE TAG teacher(number int, age int)
    """)
    execute(cat, 'USE lkbase; INSERT VERTEX lookup_tag_1(col1, col2, col3) '
                 'VALUES "200":(200, 200, 200), "201":(201, 201, 201), '
                 '"202":(202, 202, 202)')
    execute(cat, 'USE lkbase; INSERT EDGE lookup_edge_1(col1, col2, col3) '
                 'VALUES "200" -> "201"@0:(201, 201, 201), '
                 '"200" -> "202"@0:(202, 202, 202)')
    execute(cat, 'USE lkbase; '
                 'INSERT VERTEX student(number, age), teacher(number, age) '
                 'VALUES "220":(1, 20, 1, 30), "221":(2, 22, 2, 32)')
    return cat


def test_lookup_vertex_index_hint(lookup_cat):
    """LookUp.feature VertexIndexHint — equality, AND-empty, OR."""
    q = 'USE lkbase; LOOKUP ON lookup_tag_1 WHERE %s YIELD id(vertex) as id'
    df = execute(lookup_cat, q % "lookup_tag_1.col2 == 200")
    assert rows(df, "id") == [("200",)]
    df = execute(lookup_cat,
                 q % "lookup_tag_1.col2 == 200 AND lookup_tag_1.col3 > 202")
    assert df.count() == 0
    df = execute(lookup_cat,
                 q % "lookup_tag_1.col2 >= 202 OR lookup_tag_1.col1 < 201")
    assert rows(df, "id") == [("200",), ("202",)]
    # empty tag2 scans
    df = execute(lookup_cat, 'USE lkbase; LOOKUP ON lookup_tag_2 '
                 'WHERE lookup_tag_2.col3 >= 0 YIELD id(vertex) as id')
    assert df.count() == 0


def test_lookup_edge_index_hint(lookup_cat):
    """LookUp.feature EdgeIndexHint — keys via src/dst/rank fns, IN+AND,
    bool-prop type error."""
    q = ('USE lkbase; LOOKUP ON lookup_edge_1 WHERE %s YIELD '
         'src(edge) as src, dst(Edge) as dst, rank(edge) as rank')
    df = execute(lookup_cat, q % "lookup_edge_1.col2 == 201")
    assert rows(df, "src", "dst", "rank") == [("200", "201", 0)]
    df = execute(lookup_cat,
                 q % "lookup_edge_1.col2 == 201 AND lookup_edge_1.col3 == 200")
    assert df.count() == 0
    df = execute(lookup_cat,
                 q % "lookup_edge_1.col2 == 201 OR lookup_edge_1.col3 == 200")
    assert rows(df, "src", "dst", "rank") == [("200", "201", 0)]
    df = execute(lookup_cat,
                 q % "lookup_edge_1.col2 IN [201] and lookup_edge_1.col2>3")
    assert rows(df, "src", "dst", "rank") == [("200", "201", 0)]


def test_lookup_function_expr_refusals(lookup_cat):
    """LookUp.feature FunctionExprTest — constant/prop-vs-prop/unknown-fn
    WHEREs are refusals; a foldable function argument is fine."""
    with pytest.raises(ValueError, match="not supported yet"):
        execute(lookup_cat, "USE lkbase; LOOKUP ON lookup_tag_2 "
                            "WHERE 1 == 1 YIELD vertex as node")
    with pytest.raises(ValueError, match="not supported yet"):
        execute(lookup_cat, "USE lkbase; LOOKUP ON lookup_tag_2 "
                            "WHERE 1 != 1 YIELD vertex as node")
    with pytest.raises(ValueError):
        execute(lookup_cat,
                "USE lkbase; LOOKUP ON lookup_tag_2 WHERE "
                "udf_is_in(lookup_tag_2.col2, 100, 200) YIELD vertex as node")
    with pytest.raises(ValueError, match="not supported yet"):
        execute(lookup_cat,
                "USE lkbase; LOOKUP ON lookup_tag_2 WHERE "
                "lookup_tag_2.col2 != lookup_tag_2.col3 YIELD id(vertex) as id")
    # abs(-5) folds to a constant operand — legal
    df = execute(lookup_cat, "USE lkbase; LOOKUP ON lookup_tag_2 WHERE "
                             "lookup_tag_2.col2 > abs(-5) YIELD id(vertex) as id")
    assert df.count() == 0


def test_lookup_yield_clause(lookup_cat):
    """LookUp.feature YieldClauseTest — YIELD/WHERE naming a schema other
    than the LOOKUP target is a SemanticError (never silently resolved
    against the target's same-named columns — found by this sweep, r8)."""
    with pytest.raises(ValueError, match="Schema name error"):
        execute(lookup_cat, "USE lkbase; LOOKUP ON student WHERE "
                            "student.number == 1 YIELD teacher.age")
    with pytest.raises(ValueError, match="Schema name error"):
        execute(lookup_cat, "USE lkbase; LOOKUP ON student WHERE "
                            "student.number == 1 "
                            "YIELD teacher.age AS student_name")
    with pytest.raises(ValueError, match="Schema name error"):
        execute(lookup_cat, "USE lkbase; LOOKUP ON student WHERE "
                            "teacher.number == 1 YIELD student.age")
    df = execute(lookup_cat, "USE lkbase; LOOKUP ON student WHERE "
                             "student.number == 1 "
                             "YIELD id(vertex) as name, student.age")
    assert df.columns == ["name", "student.age"]
    assert rows(df, "name", "student.age") == [("220", 20)]


def test_lookup_no_index_still_scans(lookup_cat):
    """LookUp.feature "no index to use at runtime" raises ExecutionError
    in the reference (IndexScan needs a secondary index). Parquet stats +
    Catalyst pushdown subsume secondary indexes here (SURVEY §2.1), so
    the same query legitimately ANSWERS — pinned as the documented
    improvement, not an accidental pass."""
    df = execute(lookup_cat, "USE lkbase; LOOKUP ON teacher WHERE "
                             "teacher.number == 1 YIELD id(vertex) as id")
    assert rows(df, "id") == [("220",)]


def test_parser_fuzz_corpus_includes_residual_grammar():
    """Parser.feature doubles as fuzz-corpus seed (r7 verdict): the
    statements this sweep exercises must parse standalone."""
    for q in ("SHOW  SPACES", "RETURN  1",
              "LOOKUP ON t WHERE t.a IN [1] and t.a>3 YIELD id(vertex)",
              "RETURN last(LIST[]) AS a"):
        parse(q)


def test_lookup_string_field(spark):
    """LookUp.feature StringFieldTest — compound predicates over string
    index columns (string-prefix indexes collapse to plain pushdown
    filters here)."""
    cat = SpaceCatalog(spark)
    execute(cat, """
        CREATE SPACE lkstr; USE lkstr;
        CREATE TAG tag_with_str(c1 int, c2 string, c3 string);
        CREATE TAG INDEX i1_with_str ON tag_with_str(c1, c2(30));
        CREATE TAG INDEX i2_with_str ON tag_with_str(c2(30), c3(30));
        CREATE TAG INDEX i3_with_str ON tag_with_str(c1, c2(30), c3(30))
    """)
    execute(cat, 'USE lkstr; INSERT VERTEX tag_with_str(c1, c2, c3) VALUES '
                 '"1":(1, "c1_row1", "c2_row1"), "2":(2, "c1_row2", "c2_row2"), '
                 '"3":(3, "abc", "abc"), "4":(4, "abc", "abc"), '
                 '"5":(5, "ab", "cabc"), "6":(5, "abca", "bc")')
    q = ('USE lkstr; LOOKUP ON tag_with_str WHERE %s '
         'YIELD id(vertex) as id')
    cases = [
        ("tag_with_str.c1 == 1", [("1",)]),
        ('tag_with_str.c1 == 1 AND tag_with_str.c2 == "ccc"', []),
        ('tag_with_str.c1 == 1 AND tag_with_str.c2 == "c1_row1"', [("1",)]),
        ('tag_with_str.c1 == 5 AND tag_with_str.c2 == "ab"', [("5",)]),
        ('tag_with_str.c2 == "abc" AND tag_with_str.c3 == "abc"',
         [("3",), ("4",)]),
        ('tag_with_str.c1 == 5 AND tag_with_str.c2 == "abca" '
         'AND tag_with_str.c3 == "bc"', [("6",)]),
    ]
    for cond, want in cases:
        assert rows(execute(cat, q % cond), "id") == want, cond


def test_lookup_condition_unicode(spark):
    """LookUp.feature ConditionTest — multi-clause AND with a non-ASCII
    string equality and int range; one clause misses → empty."""
    cat = SpaceCatalog(spark)
    execute(cat, """
        CREATE SPACE lkcond; USE lkcond;
        CREATE TAG identity(BIRTHDAY int, NATION string,
                            BIRTHPLACE_CITY string);
        CREATE TAG INDEX idx_identity ON
            identity(BIRTHDAY, NATION(30), BIRTHPLACE_CITY(30))
    """)
    execute(cat, 'USE lkcond; INSERT VERTEX '
                 'identity(BIRTHDAY, NATION, BIRTHPLACE_CITY) '
                 'VALUES "1" : (19860413, "汉族", "aaa")')
    df = execute(cat, 'USE lkcond; LOOKUP ON identity WHERE '
                      'identity.NATION == "汉族" AND '
                      'identity.BIRTHDAY > 19620101 AND '
                      'identity.BIRTHDAY < 20021231 AND '
                      'identity.BIRTHPLACE_CITY == "bbb" '
                      'YIELD id(vertex) as id')
    assert df.count() == 0
    df = execute(cat, 'USE lkcond; LOOKUP ON identity WHERE '
                      'identity.NATION == "汉族" AND '
                      'identity.BIRTHPLACE_CITY == "aaa" '
                      'YIELD id(vertex) as id, identity.NATION AS nation')
    assert rows(df, "id", "nation") == [("1", "汉族")]


def test_basic_data_containers(spark):
    """basic/data.feature — typed container literals LIST[…]/SET{…}/
    MAP{…}: size/IN over empty and populated forms, map-key membership,
    nested values, subscript; BARE `{}` is the reference's syntax error
    (the empty container must carry its SET/MAP prefix)."""
    from nebula_spark.catalog import GraphSpace
    sp = GraphSpace(spark, "datafeat")
    r = execute(sp, "RETURN size(LIST[]) AS a, size(SET{}) AS b, "
                    "size(MAP{}) AS c").collect()[0]
    assert (r.a, r.b, r.c) == (0, 0, 0)
    r = execute(sp, 'RETURN 1 IN LIST[] AS a, "Tony" IN SET{} AS b, '
                    '"a" IN MAP{} AS c').collect()[0]
    assert (r.a, r.b, r.c) == (False, False, False)
    r = execute(sp, "RETURN LIST[1, 2] AS a, SET{1, 2, 1} AS b, "
                    "MAP{a:1, b:2} AS c").collect()[0]
    assert r.a == [1, 2] and sorted(r.b) == [1, 2]
    assert (r.c.a, r.c.b) == (1, 2)
    r = execute(sp, 'RETURN 1 IN LIST[1, 2] AS a, 2 IN SET{1, 2, 1} AS b, '
                    '"a" IN MAP{a:1, b:2} AS c').collect()[0]
    assert (r.a, r.b, r.c) == (True, True, True)
    r = execute(sp, 'RETURN MAP{a: LIST[1,2], b: SET{1,2,1}, c: "hee"}["b"]'
                    " AS d").collect()[0]
    assert sorted(r.d) == [1, 2]
    # unprefixed forms stay legal…
    r = execute(sp, 'RETURN 2 IN [1, 2] AS a, 2 IN {1, 2, 1} AS b, '
                    '"b" IN MAP{a:1, b:2} AS c').collect()[0]
    assert (r.a, r.b, r.c) == (True, True, True)
    # …but a BARE empty {} is a syntax error (data.feature)
    with pytest.raises(SyntaxError):
        execute(sp, "RETURN [], {}, {}")


def test_match_edge_arrowhead_forms(spark, nba):
    """parser.yy match_edge production sweep: detail-less `--`/`-->`/
    `<--`/`<-->` tokens (scanner.lex:370-373) and both-arrowhead
    `<-[e]->` all parse, with BOTH direction for double-arrow forms."""
    from nebula_spark.catalog import GraphSpace
    sp = GraphSpace(spark, "arrows")
    sp.create_tag("player", df=nba["player"])
    sp.create_edge("like", df=nba["like"])
    q = "MATCH (a:player {name: 'Tim'})%s(b:player) RETURN b.player.name AS n"
    out = {form: sorted(r.n for r in execute(sp, q % form).collect())
           for form in ("-->", "<--", "--", "<-->", "<-[:like]->")}
    assert out["-->"] == ["Manu", "Tony"]
    assert out["<--"] == ["Tony"]
    assert out["--"] == ["Manu", "Tony", "Tony"]      # in+out union
    assert out["<-->"] == out["--"]
    assert out["<-[:like]->"] == out["--"]
