"""Parser fuzzing (r6 verdict item 7): every input — random token soup
or a mutated golden query — must either parse or raise one of the
engine's CONTROLLED refusal classes (SyntaxError for grammar errors,
ValueError/KeyError for semantic refusals, the same classes the TCK
goldens pin), never an uncontrolled Python traceback (IndexError,
AttributeError, TypeError, UnboundLocalError, RecursionError…).

The reference's GQLParser has the same contract: flex/bison turn any
byte sequence into either a Sentence or a SyntaxError status
(src/parser/GQLParser.h) — a crash is a bug there too. This suite is
pure front-end (tokenize/parse, no SparkSession), so thousands of cases
run in seconds.
"""

from __future__ import annotations

import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from nebula_spark.plans import ngql as A

# the classes a parse is ALLOWED to raise — grammar refusals and the
# semantic refusal classes the goldens pin (execute() maps them to the
# reference's error phrasings)
ALLOWED = (SyntaxError, ValueError, KeyError)

# recursion is bounded grammar-side; a RecursionError would mean an
# unbounded production — treat as a crash


def _try_parse(q: str):
    try:
        A.parse(q)
    except ALLOWED:
        pass
    # anything else propagates and fails the test


# -- corpus: a spread of valid statements across every family ------------
GOLDEN = [
    'GO FROM "a" OVER like YIELD like._dst AS d',
    'GO 1 TO 2 STEPS FROM "a" OVER * REVERSELY YIELD edge AS e',
    "GO FROM 1, 2 OVER e BIDIRECT WHERE e.x > 3 YIELD dst(edge)",
    'FETCH PROP ON player "Tim" YIELD player.name AS n',
    'FETCH PROP ON serve "a"->"b"@0 YIELD edge as e',
    "LOOKUP ON t WHERE t.a == 1 AND t.b CONTAINS 'x' YIELD id(vertex)",
    "MATCH (v:player{name: 'Tim'})-[e:like*1..2]->(w) RETURN v, count(*)",
    "MATCH p = shortestPath((a)-[*..5]-(b)) WHERE id(a) == 'x' RETURN p",
    "MATCH (v) WHERE v.player.age > 3 WITH v.player.name AS n "
    "ORDER BY n SKIP 1 LIMIT 2 RETURN collect(n)",
    'FIND SHORTEST PATH FROM "a" TO "b" OVER * UPTO 5 STEPS YIELD path as p',
    'GET SUBGRAPH 2 STEPS FROM "a" BOTH like YIELD vertices AS v, edges AS e',
    "YIELD [x IN [1,2,3] WHERE x > 1 | x + 1] AS l",
    "YIELD CASE WHEN true THEN 1 ELSE 2 END AS c, 3 IS NOT EMPTY",
    "UNWIND [1, 2, NULL] AS u RETURN u",
    '$var = GO FROM "a" OVER e YIELD e._dst AS d; '
    "GO FROM $var.d OVER e YIELD e._dst",
    "INSERT VERTEX t(a, b) VALUES \"v\":(1, datetime('2021-01-01T00:00:00'))",
    'INSERT EDGE e(w) VALUES "a"->"b"@5:(2.5)',
    'UPDATE VERTEX ON t "v" SET a = a + 1 WHEN a > 0 YIELD a',
    'UPSERT EDGE ON e "a"->"b" SET w = 1.0',
    'DELETE VERTEX "a", "b" WITH EDGE',
    'DELETE TAG t1, t2 FROM "a"',
    'DELETE EDGE e "a"->"b"@0',
    "CREATE TAG IF NOT EXISTS t(a int NOT NULL DEFAULT 3, b string)",
    "CREATE EDGE e(w double) TTL_COL = \"w\", TTL_DURATION = 100",
    "CREATE TAG INDEX idx ON t(a(10), b)",
    "ALTER TAG t ADD (c timestamp)",
    "SHOW TAGS; SHOW EDGES; DESCRIBE TAG t",
    "DROP SPACE IF EXISTS s; CREATE SPACE s2; USE s2",
    "GROUP BY $-.x YIELD $-.x, sum($-.y) AS s",
    "ORDER BY $-.a DESC, $-.b | LIMIT 2, 3",
    "(YIELD 1 AS a UNION YIELD 2 AS a) | YIELD count(*) AS c",
    "YIELD 1 AS a INTERSECT YIELD 2 AS a MINUS YIELD 3 AS a",
    # EXPLAIN/PROFILE are execute()-level prefixes, not parse()-level
    'GET SUBGRAPH WITH PROP FROM "a" IN like OUT serve YIELD edges AS e',
    "LOOKUP ON t WHERE t.s =~ 'a+b' YIELD t.s | "
    "DELETE VERTEX $-.s",
    # r7 grammar additions (multi-tag INSERT, const-call keys, piped
    # DELETE TAG) + r8 additions (all-props INSERT EDGE, key-named
    # props) join the mutation corpus per the r7 verdict
    'INSERT VERTEX t1(a), t2(b, c) VALUES "v":(1, 2, 3)',
    'INSERT VERTEX t3 VALUES "v":(1, 2)',
    'INSERT EDGE e2 VALUES hash("a")->hash("b")@0:(1)',
    'INSERT EDGE e(src, dst, rank) VALUES "a"->"b":(1, "x", now())',
    'FETCH PROP ON t hash("k") YIELD t.vid',
    'DELETE EDGE e hash("a")->hash("b")@-1',
    'LOOKUP ON t YIELD id(vertex) AS id | DELETE TAG t1 FROM $-.id',
    "CREATE TAG kt(vid int, src string, dst double, rank timestamp)",
    # r8 grammar: container literals, arrowhead edge forms, piped RETURN
    "RETURN size(LIST[]) AS a, size(SET{}) AS b, size(MAP{}) AS c",
    "YIELD 1 IN MAP{a:1} AS m, 2 IN SET{1,2} AS s2",
    "MATCH (a)-->(b)<--(c) RETURN a",
    "MATCH (a)<-->(b) RETURN a",
    "MATCH (a)<-[e:like]->(b) RETURN e",
    'GO FROM "x" OVER e YIELD id($$) AS v | RETURN $-.v AS v',
]

_TOKEN_POOL = [
    "GO", "FROM", "OVER", "YIELD", "WHERE", "MATCH", "RETURN", "WITH",
    "UNWIND", "FETCH", "PROP", "ON", "LOOKUP", "INSERT", "VERTEX",
    "EDGE", "DELETE", "TAG", "UPDATE", "UPSERT", "SET", "WHEN",
    "CREATE", "DROP", "ALTER", "SHOW", "DESCRIBE", "USE", "SPACE",
    "INDEX", "REBUILD", "FIND", "SHORTEST", "PATH", "SUBGRAPH",
    "STEPS", "UPTO", "REVERSELY", "BIDIRECT", "BOTH", "IN", "OUT",
    "ORDER", "BY", "GROUP", "LIMIT", "OFFSET", "SKIP", "SAMPLE",
    "UNION", "ALL", "DISTINCT", "INTERSECT", "MINUS", "CASE", "END",
    "NOT", "AND", "OR", "XOR", "NULL", "TRUE", "FALSE", "IS", "EMPTY",
    "CONTAINS", "STARTS", "ENDS", "|", ";", ",", "(", ")", "[", "]",
    "{", "}", "==", "!=", "<", ">", "<=", ">=", "=~", "+", "-", "*",
    "/", "%", "^", "=", "=>", "->", "<-", "@", "$-.", "$^", "$$",
    "$var", ".", "..", ":", "::", "\"str\"", "'s'", "`q`", "42",
    "3.14", "0x1F", "player", "like", "name", "v", "e", "p",
    "count", "sum", "id", "src", "dst", "rank", "properties",
    "LIST[", "SET{", "MAP{", "-->", "<--", "<-->", "--", "hash(",
    "RETURN", "$-.",
]


@settings(max_examples=400, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(st.sampled_from(_TOKEN_POOL), min_size=1, max_size=25))
def test_fuzz_token_soup(parts):
    """Arbitrary token sequences never escape the controlled classes."""
    _try_parse(" ".join(parts))


@settings(max_examples=400, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.sampled_from(GOLDEN), st.data())
def test_fuzz_mutated_goldens(q, data):
    """Structured mutations of valid queries: token deletion,
    duplication, swap, truncation, and identifier/literal replacement."""
    toks = re.findall(r"\s+|\w+|.", q)
    mode = data.draw(st.integers(0, 4))
    if not toks:
        return
    i = data.draw(st.integers(0, len(toks) - 1))
    if mode == 0:                                   # delete a token
        toks = toks[:i] + toks[i + 1:]
    elif mode == 1:                                 # duplicate a token
        toks = toks[:i] + [toks[i]] + toks[i:]
    elif mode == 2:                                 # swap two tokens
        j = data.draw(st.integers(0, len(toks) - 1))
        toks[i], toks[j] = toks[j], toks[i]
    elif mode == 3:                                 # truncate
        toks = toks[:i]
    else:                                           # replace with junk
        toks[i] = data.draw(st.sampled_from(
            ["?", "\\", "0b12", "'unterminated", '"', "```", "$",
             "9999999999999999999999999", "..", "@@", "::", "\x00"]))
    _try_parse("".join(toks))


@settings(max_examples=200, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.text(min_size=0, max_size=60))
def test_fuzz_raw_text(s):
    """Raw unicode soup — the lexer's own error path must hold too."""
    _try_parse(s)


def test_goldens_still_parse():
    """The mutation corpus itself is valid — guards against the fuzz
    suite silently degrading into error-only inputs."""
    for q in GOLDEN:
        A.parse(q)


def test_deep_nesting_bounded():
    """Pathological nesting raises a controlled error (or parses), not
    RecursionError: the parser must bound its descent."""
    for q in ("YIELD " + "(" * 300 + "1" + ")" * 300,
              "YIELD " + "[" * 200 + "]" * 200,
              "YIELD " + "NOT " * 400 + "true",
              "MATCH " + "(a)-->" * 150 + "(b) RETURN 1"):
        _try_parse(q)


def test_inverted_hop_range_refused():
    """Fuzz-found: `[e*11..2]` crashed the traversal with a NoneType
    frame; the reference refuses at validation
    (MatchValidator::validateStepRange, MatchValidator.cpp:574-580)."""
    import pytest
    with pytest.raises(ValueError, match="Max hop must be greater equal"):
        A.parse("MATCH (v)-[e:like*11..2]->(w) RETURN v")
    with pytest.raises(ValueError, match="Max hop"):
        A.parse("MATCH p = (a)-[*3..1]-(b) RETURN p")
    # equal bounds stay legal
    A.parse("MATCH (v)-[e*2..2]->(w) RETURN v")
