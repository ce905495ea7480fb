"""Differential result-fuzzer: random nGQL queries vs a DuckDB oracle.

Round-9 upgrade of the crash-fuzzer: every generated query carries either
a mechanically-derived DuckDB SQL twin (lane A) or a metamorphic nGQL
partner with provably-equal semantics (lane B), so SILENT wrong answers
— the class the r8 integer-division bug belonged to — are found by
machine.

Lane A twins encode the reference's GO semantics exactly as the engine
must implement them (GoPlanner.cpp / GetNeighbors):
  - the frontier between steps is the DEDUPLICATED neighbor set,
  - the WHERE predicate filters the RESULT rows after expansion
    (GoPlanner.cpp:263-265 — Filter over ExpandAll), NOT the traversal:
    intermediate steps expand unfiltered (verified: the first oracle
    draft filtered per-step and the engine's filter-at-end rows proved
    to be the reference plan's),
  - under REVERSELY the edge VALUE (src(edge)/dst(edge)) keeps stored
    orientation while ``e._src``/``e._dst`` keep the adjacency view,
  - BIDIRECT is the union of both orientations (self-loops twice).

Lane B invariants:
  - 1-step ``WHERE p`` ≡ yield p and filter in a pipe,
  - ``GO m TO n`` ≡ UNION ALL of the fixed-length GOs,
  - MATCH ``*m..n`` ≡ union of fixed lengths,
  - ``| YIELD $-.c`` projection is an identity,
  - 1-step BIDIRECT ≡ OUT ∪ REVERSELY.

Usage:  python tools/result_fuzz.py [N_TRIALS] [SEED]
The pytest smoke (tests/test_result_fuzz.py) runs a seeded 500-trial
pass; deep runs go through this CLI.
"""

from __future__ import annotations

import random
import string
import sys

NAME_ALPHA = string.ascii_uppercase

V_PROPS = ("name", "age", "score")      # string|null, long|null, long
E_PROPS = {"like": ("likeness",), "knows": ("since",)}


# ---------------------------------------------------------------- fixture

def build_graph(seed: int, n_v: int = 36, n_e: int = 110):
    """Random property graph as pandas frames: one tag ``player`` (every
    vid carries it), two edge types with NULL-able props, parallel edges
    (distinct ranks), self-loops and cycles."""
    import pandas as pd
    rng = random.Random(seed)
    vids = [f"v{i}" for i in range(n_v)]
    rows = []
    for v in vids:
        name = None if rng.random() < 0.12 else \
            "".join(rng.choices(NAME_ALPHA, k=rng.randint(1, 4)))
        age = None if rng.random() < 0.15 else rng.randint(-5, 60)
        rows.append((v, name, age, rng.randint(0, 9)))
    player = pd.DataFrame(rows, columns=["_vid", "name", "age", "score"])

    def edge_df(prop, null_p):
        seen, er = set(), []
        while len(er) < n_e:
            s, d = rng.choice(vids), rng.choice(vids)
            r = rng.choice((0, 0, 0, 1, 2))
            if (s, d, r) in seen:
                continue
            seen.add((s, d, r))
            w = None if rng.random() < null_p else rng.randint(0, 100)
            er.append((s, d, r, w))
        return pd.DataFrame(er, columns=["_src", "_dst", "_rank", prop])

    return {"player": player, "like": edge_df("likeness", 0.10),
            "knows": edge_df("since", 0.05)}


def make_space(spark, frames, name="fuzzg"):
    from nebula_spark.catalog import GraphSpace
    sp = GraphSpace(spark, name)
    sp.create_tag("player", df=spark.createDataFrame(
        frames["player"], "_vid string, name string, age long, score long"))
    for e in ("like", "knows"):
        sp.create_edge(e, df=spark.createDataFrame(
            frames[e],
            f"_src string, _dst string, _rank long, {E_PROPS[e][0]} long"))
    return sp


def make_duck(frames):
    import duckdb
    con = duckdb.connect()
    for t, df in frames.items():
        con.register(t, df)
    return con


# ---------------------------------------------------------- predicates

def gen_vpred(rng, pre_ngql: str, pre_sql: str, depth=0, lookup=False):
    """Vertex-prop predicate: (ngql, sql). ``pre_*`` qualify the prop.
    ``lookup=True`` restricts to index-scannable shapes — the LOOKUP
    scan-predicate whitelist (reference IndexScanRule) refuses prefix
    NOT / ENDS WITH / CONTAINS, so LOOKUP-based fuzz lanes must not
    generate them (both engines would refuse; there is no result to
    compare)."""
    roll = rng.random()
    if depth < 2 and roll < 0.30:
        op = rng.choice(("AND", "OR"))
        a = gen_vpred(rng, pre_ngql, pre_sql, depth + 1, lookup)
        b = gen_vpred(rng, pre_ngql, pre_sql, depth + 1, lookup)
        return (f"({a[0]} {op} {b[0]})", f"({a[1]} {op} {b[1]})")
    if depth < 2 and roll < 0.38 and not lookup:
        a = gen_vpred(rng, pre_ngql, pre_sql, depth + 1)
        return (f"(NOT {a[0]})", f"(NOT {a[1]})")
    atom = rng.randrange(6)
    if atom == 0:
        p, k = rng.choice(("age", "score")), rng.randint(-6, 61)
        op = rng.choice(("==", "!=", ">", ">=", "<", "<="))
        sop = "=" if op == "==" else ("<>" if op == "!=" else op)
        return (f"{pre_ngql}{p} {op} {k}", f"{pre_sql}{p} {sop} {k}")
    if atom == 1:
        pre = "".join(rng.choices(NAME_ALPHA, k=rng.randint(1, 2)))
        kw = "STARTS WITH" if lookup else \
            rng.choice(("STARTS WITH", "ENDS WITH", "CONTAINS"))
        pat = {"STARTS WITH": f"'{pre}%'", "ENDS WITH": f"'%{pre}'",
               "CONTAINS": f"'%{pre}%'"}[kw]
        return (f"{pre_ngql}name {kw} '{pre}'",
                f"{pre_sql}name LIKE {pat}")
    if atom == 2:
        p = rng.choice(V_PROPS)
        neg = rng.random() < 0.5
        return (f"{pre_ngql}{p} IS {'NOT ' if neg else ''}NULL",
                f"{pre_sql}{p} IS {'NOT ' if neg else ''}NULL")
    if atom == 3:
        ks = sorted({rng.randint(-6, 61) for _ in range(rng.randint(1, 4))})
        lst = ", ".join(map(str, ks))
        return (f"{pre_ngql}age IN [{lst}]", f"{pre_sql}age IN ({lst})")
    if atom == 4:
        nm = "".join(rng.choices(NAME_ALPHA, k=rng.randint(1, 4)))
        op = rng.choice(("==", "!="))
        sop = "=" if op == "==" else "<>"
        return (f"{pre_ngql}name {op} '{nm}'", f"{pre_sql}name {sop} '{nm}'")
    k1, k2 = sorted((rng.randint(-6, 61), rng.randint(-6, 61)))
    return (f"({pre_ngql}age >= {k1} AND {pre_ngql}age <= {k2})",
            f"({pre_sql}age >= {k1} AND {pre_sql}age <= {k2})")


def gen_epred(rng, edge: str, h: str = "h", with_vprops: bool = False):
    """Edge predicate over prop/_rank (optionally $^/$$ vertex props):
    (ngql, sql-over-oriented-row-with-ps/pd-joins)."""
    prop = E_PROPS[edge][0]
    if with_vprops and rng.random() < 0.35:
        side, tbl = rng.choice((("$^", "ps"), ("$$", "pd")))
        p = rng.choice(("age", "score"))
        k = rng.randint(-6, 61)
        op = rng.choice((">", ">=", "<", "<=", "==", "!="))
        sop = "=" if op == "==" else ("<>" if op == "!=" else op)
        return (f"{side}.player.{p} {op} {k}", f"{tbl}.{p} {sop} {k}")
    atom = rng.randrange(4)
    if atom == 0:
        k = rng.randint(0, 100)
        op = rng.choice((">", ">=", "<", "<=", "==", "!="))
        sop = "=" if op == "==" else ("<>" if op == "!=" else op)
        return (f"{edge}.{prop} {op} {k}", f"{h}.{prop} {sop} {k}")
    if atom == 1:
        r = rng.choice((0, 1, 2))
        op = rng.choice(("==", "!=", "<="))
        sop = "=" if op == "==" else ("<>" if op == "!=" else op)
        return (f"{edge}._rank {op} {r}", f"{h}._rank {sop} {r}")
    if atom == 2:
        neg = rng.random() < 0.5
        return (f"{edge}.{prop} IS {'NOT ' if neg else ''}NULL",
                f"{h}.{prop} IS {'NOT ' if neg else ''}NULL")
    a, b = gen_epred(rng, edge, h), gen_epred(rng, edge, h)
    op = rng.choice(("AND", "OR"))
    return (f"({a[0]} {op} {b[0]})", f"({a[1]} {op} {b[1]})")


# ------------------------------------------------------------ lane A gen

def _pick_vids(rng, frames, lo=1, hi=3):
    n = rng.randint(lo, hi)
    vids = sorted(rng.sample(list(frames["player"]["_vid"]), n))
    return vids


def gen_lookup(rng, frames):
    pred_n, pred_s = gen_vpred(rng, "player.", "", lookup=True)
    items = rng.sample([
        ("player.name AS n", "name AS n"),
        ("player.age AS a", "age AS a"),
        ("player.score AS sc", "score AS sc"),
        ("id(vertex) AS v", "_vid AS v"),
    ], k=rng.randint(1, 4))
    distinct = rng.random() < 0.25
    ngql = (f"LOOKUP ON player WHERE {pred_n} YIELD "
            f"{'DISTINCT ' if distinct else ''}"
            + ", ".join(i for i, _ in items))
    sql = (f"SELECT {'DISTINCT ' if distinct else ''}"
           + ", ".join(s for _, s in items)
           + f" FROM player WHERE {pred_s}")
    return ngql, sql, "set"


def gen_fetch(rng, frames):
    vids = _pick_vids(rng, frames, 1, 4)
    qv = ", ".join(f'"{v}"' for v in vids)
    sv = ", ".join(f"'{v}'" for v in vids)
    items = rng.sample([
        ("player.name AS n", "name AS n"),
        ("player.age AS a", "age AS a"),
        ("id(vertex) AS v", "_vid AS v"),
    ], k=rng.randint(1, 3))
    ngql = f"FETCH PROP ON player {qv} YIELD " \
           + ", ".join(i for i, _ in items)
    sql = ("SELECT " + ", ".join(s for _, s in items)
           + f" FROM player WHERE _vid IN ({sv})")
    return ngql, sql, "set"


#: YIELD item → (ngql text, sql expr over hop row h + ps/pd joins)
def _go_yield_pool(edge):
    p = E_PROPS[edge][0]
    return [
        (f"dst(edge) AS de", "h.de AS de"),
        (f"src(edge) AS se", "h.se AS se"),
        (f"{edge}._dst AS nb", "h.nb AS nb"),
        (f"{edge}._src AS og", "h.og AS og"),
        (f"{edge}._rank AS rk", "h._rank AS rk"),
        (f"{edge}.{p} AS w", f"h.{p} AS w"),
        ("$^.player.age AS sage", "ps.age AS sage"),
        ("$$.player.name AS dname", "pd.name AS dname"),
        ("$$.player.score AS dsc", "pd.score AS dsc"),
    ]


def _oriented_sql(edge, direction):
    p = E_PROPS[edge][0]
    out = (f"SELECT _src AS og, _dst AS nb, _src AS se, _dst AS de, "
           f'_rank, {p} FROM "{edge}"')
    rev = (f"SELECT _dst AS og, _src AS nb, _src AS se, _dst AS de, "
           f'_rank, {p} FROM "{edge}"')
    if direction == "":
        return out
    if direction == "REVERSELY":
        return rev
    return f"{out} UNION ALL {rev}"


def gen_go(rng, frames, force_steps=None, force_dir=None,
           with_where=None, edge=None):
    """GO k STEPS | GO m TO n — returns (ngql, sql, compare_kind)."""
    edge = edge or rng.choice(("like", "knows"))
    direction = force_dir if force_dir is not None else \
        rng.choice(("", "", "", "REVERSELY", "BIDIRECT"))
    if force_steps is not None:
        m, n = force_steps
    else:
        n = rng.randint(1, 3)
        m = rng.choice((n, n, max(1, n - rng.randint(0, 2))))
    vids = _pick_vids(rng, frames)
    qv = ", ".join(f'"{v}"' for v in vids)
    sv = ", ".join(f"'{v}'" for v in vids)
    use_where = with_where if with_where is not None else rng.random() < 0.5
    wn, ws = gen_epred(rng, edge, with_vprops=True) \
        if use_where else (None, None)
    items = rng.sample(_go_yield_pool(edge), k=rng.randint(1, 4))
    step_txt = f"{m} TO {n} STEPS" if m != n else \
        ("" if n == 1 and rng.random() < 0.5 else f"{n} STEPS")
    ngql = (f"GO {step_txt} FROM {qv} OVER {edge} {direction}"
            f"{' WHERE ' + wn if wn else ''} YIELD "
            + ", ".join(i for i, _ in items)).replace("  ", " ")

    ori = _oriented_sql(edge, direction)
    # WHERE filters only the final projected rows (GoPlanner.cpp:263);
    # the frontier CTEs expand UNFILTERED
    ctes = [f"e AS (SELECT * FROM ({ori}) h)",
            f"f0 AS (SELECT unnest(ARRAY[{sv}]) AS v)"]
    for k in range(1, n):
        ctes.append(f"f{k} AS (SELECT DISTINCT h.nb AS v FROM e h "
                    f"JOIN f{k-1} f ON h.og = f.v)")
    proj = ", ".join(s for _, s in items)
    hop = ("SELECT {proj} FROM e h JOIN f{k} f ON h.og = f.v "
           "LEFT JOIN player ps ON ps._vid = h.og "
           "LEFT JOIN player pd ON pd._vid = h.nb"
           + (f" WHERE {ws}" if ws else ""))
    parts = [hop.format(proj=proj, k=k - 1) for k in range(m, n + 1)]
    sql = "WITH " + ", ".join(ctes) + " " + " UNION ALL ".join(parts)
    return ngql, sql, "set"


def gen_go_groupby(rng, frames):
    """GO … | GROUP BY — aggregates over the hop output."""
    edge = rng.choice(("like", "knows"))
    p = E_PROPS[edge][0]
    base_ngql, base_sql, _ = gen_go(rng, frames, edge=edge)
    # regenerate with fixed yield: need known aliases — build directly
    direction = rng.choice(("", "REVERSELY"))
    n = rng.randint(1, 2)
    vids = _pick_vids(rng, frames)
    qv = ", ".join(f'"{v}"' for v in vids)
    sv = ", ".join(f"'{v}'" for v in vids)
    ngql_inner = (f"GO {n} STEPS FROM {qv} OVER {edge} {direction} "
                  f"YIELD {edge}._dst AS d, {edge}.{p} AS w"
                  ).replace("  ", " ")
    aggs = rng.sample([
        ("count(*) AS c", "COUNT(*) AS c"),
        (f"sum($-.w) AS s", "COALESCE(SUM(w), 0) AS s"),
        (f"max($-.w) AS mx", "MAX(w) AS mx"),
        (f"min($-.w) AS mn", "MIN(w) AS mn"),
        (f"count($-.w) AS cw", "COUNT(w) AS cw"),
        (f"count(DISTINCT $-.w) AS cdw", "COUNT(DISTINCT w) AS cdw"),
    ], k=rng.randint(1, 3))
    ngql = (ngql_inner + " | GROUP BY $-.d YIELD $-.d AS d, "
            + ", ".join(a for a, _ in aggs))
    ori = _oriented_sql(edge, direction)
    ctes = [f"e AS (SELECT * FROM ({ori}) h)",
            f"f0 AS (SELECT unnest(ARRAY[{sv}]) AS v)"]
    for k in range(1, n):
        ctes.append(f"f{k} AS (SELECT DISTINCT h.nb AS v FROM e h "
                    f"JOIN f{k-1} f ON h.og = f.v)")
    inner = (f"SELECT h.nb AS d, h.{p} AS w FROM e h "
             f"JOIN f{n-1} f ON h.og = f.v")
    sql = ("WITH " + ", ".join(ctes)
           + f" SELECT d, " + ", ".join(s for _, s in aggs)
           + f" FROM ({inner}) GROUP BY d")
    return ngql, sql, "set"


def gen_go_orderby(rng, frames):
    """GO … | ORDER BY all cols | LIMIT [OFFSET] — ordered list compare.
    The sort covers every output column, so the window is deterministic
    and OFFSET windows (r9 front-end forms) compare exactly."""
    edge = rng.choice(("like", "knows"))
    p = E_PROPS[edge][0]
    direction = rng.choice(("", "REVERSELY"))
    vids = _pick_vids(rng, frames)
    qv = ", ".join(f'"{v}"' for v in vids)
    sv = ", ".join(f"'{v}'" for v in vids)
    d1 = rng.choice(("ASC", "DESC"))
    d2 = rng.choice(("ASC", "DESC"))
    lim = rng.randint(1, 12)
    off = rng.choice((0, 0, 1, 2, 5))
    off_n = f" OFFSET {off}" if off else ""
    ngql = (f"GO FROM {qv} OVER {edge} {direction} "
            f"YIELD {edge}._dst AS d, {edge}.{p} AS w "
            f"| ORDER BY $-.w {d1}, $-.d {d2} | LIMIT {lim}{off_n}"
            ).replace("  ", " ")
    ori = _oriented_sql(edge, direction)
    # reference NULL order: last when ASC, first when DESC (Value.h type
    # tag order) — spelled explicitly for DuckDB
    n1 = "NULLS LAST" if d1 == "ASC" else "NULLS FIRST"
    n2 = "NULLS LAST" if d2 == "ASC" else "NULLS FIRST"
    sql = (f"WITH e AS (SELECT * FROM ({ori}) h), "
           f"f0 AS (SELECT unnest(ARRAY[{sv}]) AS v) "
           f"SELECT h.nb AS d, h.{p} AS w FROM e h JOIN f0 f "
           f"ON h.og = f.v ORDER BY w {d1} {n1}, d {d2} {n2} "
           f"LIMIT {lim} OFFSET {off}")
    return ngql, sql, "list"


def gen_setops(rng, frames):
    """Set ops between two LOOKUPs vs DuckDB (r10). Reference semantics
    (SetExecutor.cpp): UNION dedups, UNION ALL keeps bags, MINUS /
    INTERSECT are null-safe left-anti/semi MEMBERSHIP joins — LHS
    duplicates survive, so the SQL twin is NOT EXISTS / EXISTS with
    IS NOT DISTINCT FROM, not EXCEPT/INTERSECT."""
    items = rng.sample([("player.age AS a", "age AS a", "a"),
                        ("player.score AS sc", "score AS sc", "sc"),
                        ("player.name AS n", "name AS n", "n")],
                       k=rng.randint(1, 2))
    ni = ", ".join(i for i, _s, _c in items)
    si = ", ".join(s for _i, s, _c in items)
    cols = [c for _i, _s, c in items]
    p1n, p1s = gen_vpred(rng, "player.", "", lookup=True)
    p2n, p2s = gen_vpred(rng, "player.", "", lookup=True)
    q1n = f"LOOKUP ON player WHERE {p1n} YIELD {ni}"
    q2n = f"LOOKUP ON player WHERE {p2n} YIELD {ni}"
    q1s = f"SELECT {si} FROM player WHERE {p1s}"
    q2s = f"SELECT {si} FROM player WHERE {p2s}"
    op = rng.choice(("UNION", "UNION ALL", "MINUS", "INTERSECT"))
    ngql = f"{q1n} {op} {q2n}"
    if op in ("UNION", "UNION ALL"):
        return ngql, f"({q1s}) {op} ({q2s})", "set"
    cond = " AND ".join(f"(l.{c} IS NOT DISTINCT FROM r.{c})"
                        for c in cols)
    ex = "NOT EXISTS" if op == "MINUS" else "EXISTS"
    sql = (f"SELECT * FROM ({q1s}) l WHERE {ex} "
           f"(SELECT 1 FROM ({q2s}) r WHERE {cond})")
    return ngql, sql, "set"


def gen_unwind(rng, frames):
    """UNWIND over a piped list — constant and prop-derived elements;
    SQL twin via unnest (r10). NULL elements stay rows (openCypher keeps
    nulls INSIDE lists; only a NULL/empty list yields no rows)."""
    pred_n, pred_s = gen_vpred(rng, "player.", "", lookup=True)
    els = []
    for _ in range(rng.randint(1, 4)):
        r = rng.random()
        if r < 0.4:
            k = rng.randint(-3, 9)
            els.append((str(k), str(k)))
        elif r < 0.7:
            els.append(("$-.a", "age"))
        else:
            k = rng.randint(1, 5)
            els.append((f"$-.a + {k}", f"age + {k}"))
    nl = ", ".join(n for n, _s in els)
    sl = ", ".join(s for _n, s in els)
    ngql = (f"LOOKUP ON player WHERE {pred_n} YIELD player.age AS a "
            f"| UNWIND [{nl}] AS u | YIELD $-.u AS u")
    sql = (f"SELECT unnest(ARRAY[{sl}]) AS u FROM player "
           f"WHERE {pred_s}")
    return ngql, sql, "set"


def gen_dml_roundtrip(rng, frames):
    """Lane C (r10): a random DML script on a fresh space, final state
    vs a Python simulation of the reference's mutation semantics
    (INSERT overwrites, IF NOT EXISTS skips, UPDATE requires the key,
    UPSERT inserts-with-defaults, DELETE drops). kind='dml' — run_trials
    builds the space, runs the script, dumps and compares."""
    sim: dict[str, int] = {}
    stmts: list[str] = []
    keys = [f"k{i}" for i in range(6)]
    for _ in range(rng.randint(4, 12)):
        k = rng.choice(keys)
        roll = rng.random()
        if roll < 0.35:
            v = rng.randint(0, 99)
            stmts.append(f'INSERT VERTEX kv(x) VALUES "{k}":({v})')
            sim[k] = v
        elif roll < 0.50:
            v = rng.randint(0, 99)
            stmts.append(
                f'INSERT VERTEX IF NOT EXISTS kv(x) VALUES "{k}":({v})')
            sim.setdefault(k, v)
        elif roll < 0.70 and k in sim:
            c = rng.randint(1, 9)
            stmts.append(f'UPDATE VERTEX ON kv "{k}" SET x = x + {c}')
            if sim[k] is not None:
                sim[k] += c
        elif roll < 0.85:
            v = rng.randint(0, 99)
            stmts.append(f'UPSERT VERTEX ON kv "{k}" SET x = {v}')
            sim[k] = v
        elif k in sim:
            stmts.append(f'DELETE VERTEX "{k}"')
            sim.pop(k, None)
    expected = sorted(sim.items())
    return stmts, expected, "dml"


# ------------------------------------------------------------ lane B gen

def gen_meta_where_pipe(rng, frames):
    """WHERE p ≡ yield p, filter in a pipe — valid for ANY step count
    because the reference filters AFTER expansion (GoPlanner.cpp:263)."""
    edge = rng.choice(("like", "knows"))
    direction = rng.choice(("", "REVERSELY", "BIDIRECT"))
    steps = rng.choice(("", "", "2 STEPS ", "1 TO 2 STEPS "))
    vids = _pick_vids(rng, frames)
    qv = ", ".join(f'"{v}"' for v in vids)
    wn, _ = gen_epred(rng, edge)
    p = E_PROPS[edge][0]
    a = (f"GO {steps}FROM {qv} OVER {edge} {direction} WHERE {wn} "
         f"YIELD {edge}._dst AS d, {edge}.{p} AS w").replace("  ", " ")
    b = (f"GO {steps}FROM {qv} OVER {edge} {direction} "
         f"YIELD {edge}._dst AS d, {edge}.{p} AS w, ({wn}) AS p "
         f"| YIELD $-.d AS d, $-.w AS w WHERE $-.p").replace("  ", " ")
    return a, b, "meta_set"


def gen_meta_mton(rng, frames):
    """GO m TO n ≡ UNION ALL of fixed GO k."""
    edge = rng.choice(("like", "knows"))
    direction = rng.choice(("", "REVERSELY"))
    n = rng.randint(2, 3)
    m = max(1, n - rng.randint(1, 2))
    vids = _pick_vids(rng, frames)
    qv = ", ".join(f'"{v}"' for v in vids)
    y = f"YIELD {edge}._dst AS d, {edge}._rank AS r"
    a = (f"GO {m} TO {n} STEPS FROM {qv} OVER {edge} {direction} {y}"
         ).replace("  ", " ")
    parts = [(f"GO {k} STEPS FROM {qv} OVER {edge} {direction} {y}"
              ).replace("  ", " ") for k in range(m, n + 1)]
    return a, parts, "multiset_union"


def gen_meta_match_varlen(rng, frames):
    """MATCH *m..n ≡ union of fixed lengths."""
    edge = rng.choice(("like", "knows"))
    n = rng.randint(2, 3)
    m = max(1, n - rng.randint(1, 2))
    a = (f"MATCH (a:player)-[e:{edge}*{m}..{n}]->(b) "
         f"RETURN id(a) AS a, id(b) AS b")
    parts = [f"MATCH (a:player)-[e:{edge}*{k}]->(b) "
             f"RETURN id(a) AS a, id(b) AS b" for k in range(m, n + 1)]
    return a, parts, "multiset_union"


def gen_meta_bidirect(rng, frames):
    """1-step BIDIRECT ≡ OUT ∪ REVERSELY."""
    edge = rng.choice(("like", "knows"))
    vids = _pick_vids(rng, frames)
    qv = ", ".join(f'"{v}"' for v in vids)
    y = f"YIELD src(edge) AS s, dst(edge) AS d, {edge}._rank AS r"
    a = f"GO FROM {qv} OVER {edge} BIDIRECT {y}"
    parts = [f"GO FROM {qv} OVER {edge} {y}",
             f"GO FROM {qv} OVER {edge} REVERSELY {y}"]
    return a, parts, "multiset_union"


def gen_meta_pipe_identity(rng, frames):
    """| YIELD $-.x AS x projection is an identity."""
    ngql, sql, kind = gen_lookup(rng, frames)
    if " DISTINCT " in ngql:
        return gen_meta_pipe_identity(rng, frames)
    aliases = [seg.split(" AS ")[1] for seg in
               ngql.split("YIELD ")[1].split(", ")]
    b = ngql + " | YIELD " + ", ".join(f"$-.{al} AS {al}"
                                       for al in aliases)
    return ngql, b, "meta_set"


def gen_match_filter(rng, frames):
    """MATCH node-scan / 1-hop with a WHERE — SQL twin (r9: exercises the
    MATCH-lane filter compile, incl. the schema-directed logical ops)."""
    if rng.random() < 0.5:
        pred_n, pred_s = gen_vpred(rng, "v.player.", "")
        ngql = (f"MATCH (v:player) WHERE {pred_n} RETURN "
                f"v.player.name AS n, v.player.age AS a, id(v) AS i")
        sql = f"SELECT name AS n, age AS a, _vid AS i FROM player " \
              f"WHERE {pred_s}"
        return ngql, sql, "set"
    edge = rng.choice(("like", "knows"))
    p = E_PROPS[edge][0]
    vids = _pick_vids(rng, frames, 1, 3)
    qv = ", ".join(f'"{v}"' for v in vids)
    sv = ", ".join(f"'{v}'" for v in vids)
    k = rng.randint(0, 100)
    op = rng.choice((">", ">=", "<", "<=", "==", "!="))
    sop = "=" if op == "==" else ("<>" if op == "!=" else op)
    ngql = (f"MATCH (v:player)-[e:{edge}]->(w) WHERE id(v) IN [{qv}] "
            f"AND e.{p} {op} {k} "
            f"RETURN id(w) AS d, e.{p} AS wt, rank(e) AS r")
    sql = (f'SELECT e._dst AS d, e.{p} AS wt, e._rank AS r FROM "{edge}" e '
           f"WHERE e._src IN ({sv}) AND e.{p} {sop} {k}")
    return ngql, sql, "set"


def gen_match_badtype_logic(rng, frames):
    """Logical ops with a statically non-boolean operand
    (LogicalExpression.cpp evalAnd/evalOr: BAD_TYPE short-circuit — the
    r9 sweep find). Each variant has a provable SQL twin:
      `true OR <nonbool>`      ≡ true        (short-circuits first)
      `<nonbool> OR true`      ≡ BADNULL     (zero rows)
      `p OR (<nonbool> AND x)` ≡ p           (AND arm is NULL)
    """
    pred_n, pred_s = gen_vpred(rng, "v.player.", "")
    nonbool = rng.choice(("v.player.age", "v.player.name",
                          "v.player.age + 1", "v.player.score"))
    ret = "RETURN id(v) AS i, v.player.age AS a"
    sret = "SELECT _vid AS i, age AS a FROM player"
    roll = rng.randrange(3)
    if roll == 0:
        ngql = f"MATCH (v:player) WHERE true OR {nonbool} {ret}"
        sql = sret
    elif roll == 1:
        ngql = f"MATCH (v:player) WHERE {nonbool} OR true {ret}"
        sql = sret + " WHERE 1 = 0"
    else:
        ngql = (f"MATCH (v:player) WHERE {pred_n} OR ({nonbool} AND "
                f"false) {ret}")
        # OR(p, NULL): true where p true, NULL (dropped) otherwise
        sql = sret + f" WHERE {pred_s}"
    return ngql, sql, "set"


def gen_match_edge_endpoints(rng, frames):
    """src()/dst() vs none_direct_src()/none_direct_dst() under a
    REVERSED pattern (r9 sweep find: src/dst are CANONICAL per
    FunctionManager.cpp:2112, none_direct_* are the raw traversed entry
    per ExpressionUtils.cpp:156). For `(a)<-[e]-(b)` anchored at a, the
    physical edge is b→a, so the twin reads the edge table by _dst."""
    edge = rng.choice(("like", "knows"))
    vids = _pick_vids(rng, frames, 1, 3)
    qv = ", ".join(f'"{v}"' for v in vids)
    sv = ", ".join(f"'{v}'" for v in vids)
    if rng.random() < 0.5:
        ngql = (f"MATCH (a)<-[e:{edge}]-(b) WHERE id(a) IN [{qv}] "
                "RETURN src(e) AS s, dst(e) AS d, "
                "none_direct_src(e) AS ns, none_direct_dst(e) AS nd, "
                "id(b) AS b")
        sql = (f"SELECT e._src AS s, e._dst AS d, e._dst AS ns, "
               f'e._src AS nd, e._src AS b FROM "{edge}" e '
               f"WHERE e._dst IN ({sv})")
    else:
        ngql = (f"MATCH (a)-[e:{edge}]->(b) WHERE id(a) IN [{qv}] "
                "RETURN src(e) AS s, dst(e) AS d, "
                "none_direct_dst(e) AS nd, id(b) AS b")
        sql = (f"SELECT e._src AS s, e._dst AS d, e._dst AS nd, "
               f'e._dst AS b FROM "{edge}" e WHERE e._src IN ({sv})')
    return ngql, sql, "set"


GENERATORS = [
    (gen_lookup, 14), (gen_fetch, 8), (gen_go, 24), (gen_go_groupby, 12),
    (gen_go_orderby, 10), (gen_meta_where_pipe, 8), (gen_meta_mton, 7),
    (gen_meta_match_varlen, 5), (gen_meta_bidirect, 4),
    (gen_meta_pipe_identity, 4), (gen_match_filter, 8),
    (gen_match_badtype_logic, 5), (gen_match_edge_endpoints, 5),
    (gen_setops, 7), (gen_unwind, 6), (gen_dml_roundtrip, 4),
]
_WHEEL = [g for g, w in GENERATORS for _ in range(w)]


# ------------------------------------------------------------- compare

def _norm_val(v):
    if isinstance(v, bool):
        return int(v)
    if isinstance(v, float):
        return round(v, 6)
    try:  # numpy scalars from duckdb
        import numpy as np
        if isinstance(v, np.integer):
            return int(v)
        if isinstance(v, np.floating):
            return None if v != v else round(float(v), 6)
    except ImportError:
        pass
    return v


def norm_rows(rows):
    return [tuple(_norm_val(v) for v in r) for r in rows]


def canon(rows):
    return sorted(norm_rows(rows), key=repr)


def run_trials(spark, sp, con, n_trials: int, seed: int, log=None):
    """Returns (mismatches, errors, per_kind_counts)."""
    from nebula_spark.plans import execute
    rng = random.Random(seed)
    frames = None
    mismatches, errors = [], []
    counts = {}
    for i in range(n_trials):
        gen = rng.choice(_WHEEL)
        counts[gen.__name__] = counts.get(gen.__name__, 0) + 1
        try:
            q, oracle, kind = gen(rng, frames or sp._fuzz_frames)
        except Exception as ex:                      # generator bug
            errors.append((gen.__name__, "<gen>", repr(ex)))
            continue
        try:
            if kind == "dml":
                from nebula_spark.catalog import GraphSpace
                fresh = GraphSpace(spark, f"fuzz_dml_{i}")
                execute(fresh, "CREATE TAG kv(x int)")
                for stmt in q:
                    execute(fresh, stmt)
                got = [tuple(r) for r in execute(
                    fresh, "LOOKUP ON kv YIELD id(vertex) AS v, kv.x AS x"
                ).collect()]
                want = oracle
                if canon(got) != canon(want):
                    mismatches.append((gen.__name__, "; ".join(q), oracle,
                                       canon(got)[:8], canon(want)[:8]))
                    if log:
                        log(f"MISMATCH [{gen.__name__}] {'; '.join(q)}")
                continue
            got = execute(sp, q).collect()
            got = [tuple(r) for r in got]
            if kind == "list":
                want = con.execute(oracle).fetchall()
                ok = norm_rows(got) == norm_rows(want)
            elif kind == "set":
                want = con.execute(oracle).fetchall()
                ok = canon(got) == canon(want)
            elif kind == "multiset_union":
                want = []
                for part in oracle:
                    want += [tuple(r) for r in execute(sp, part).collect()]
                ok = canon(got) == canon(want)
            else:  # meta_set: oracle is one equivalent nGQL query
                want = [tuple(r) for r in execute(sp, oracle).collect()]
                ok = canon(got) == canon(want)
            if not ok:
                mismatches.append((gen.__name__, q, oracle,
                                   canon(got)[:8], canon(want)[:8]))
                if log:
                    log(f"MISMATCH [{gen.__name__}] {q}")
        except Exception as ex:
            errors.append((gen.__name__, q, repr(ex)))
            if log:
                log(f"ERROR [{gen.__name__}] {q} -> {ex!r}")
        if log and (i + 1) % 50 == 0:
            log(f"{i+1}/{n_trials} trials, "
                f"{len(mismatches)} mismatches, {len(errors)} errors")
    return mismatches, errors, counts


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 500
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 7
    from nebula_spark.session import get_spark
    spark = get_spark("result_fuzz", **{
        "spark.sql.shuffle.partitions": "4"})
    frames = build_graph(seed)
    sp = make_space(spark, frames)
    sp._fuzz_frames = frames
    con = make_duck(frames)
    mm, errs, counts = run_trials(spark, sp, con, n, seed, log=print)
    print(f"\n=== {n} trials seed={seed}: {len(mm)} mismatches, "
          f"{len(errs)} errors ===")
    for name, q, oracle, got, want in mm[:20]:
        print(f"\n[{name}] {q}\n  oracle: {oracle}\n  got:  {got}"
              f"\n  want: {want}")
    for name, q, ex in errs[:20]:
        print(f"\nERR [{name}] {q}\n  {ex}")
    print(counts)
    sys.exit(1 if (mm or errs) else 0)


if __name__ == "__main__":
    main()
