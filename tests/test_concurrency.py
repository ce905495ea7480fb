"""Multi-session / concurrent-execute smoke (r7 verdict item 6).

The reference tests MTSafe concurrency (bugfix/MTSafeConcurrencyVariables
— already a golden single-threaded); here N Python threads drive
execute() simultaneously against (a) fully separate spaces with
same-named tags/vars and (b) one shared read-only space, asserting no
cross-talk in session parameters, ``$var`` tables, or catalog state.
The risk surface is module-level shared state (catalog._SPACE_CACHE /
_TABLE_CACHE, the parser's module recursion limit) plus Spark's own
thread-shared session — DataFrames are immutable, so correctness hinges
on our layer never keying per-statement state globally.
"""

from __future__ import annotations

import threading

import pytest
from pyspark.sql import functions as F

from nebula_spark.catalog import GraphSpace, SpaceCatalog
from nebula_spark.plans import execute

N_THREADS = 8
N_ROUNDS = 5


def _run_all(workers):
    """Start the workers on a barrier, join, re-raise the first error."""
    errors: list[BaseException] = []
    barrier = threading.Barrier(len(workers))

    def wrap(fn):
        def go():
            try:
                barrier.wait()
                fn()
            except BaseException as e:  # noqa: BLE001 — re-raised below
                errors.append(e)
        return go

    ts = [threading.Thread(target=wrap(fn)) for fn in workers]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    if errors:
        raise errors[0]


def test_separate_spaces_no_crosstalk(spark):
    """Each thread owns a space with the SAME tag/edge names but distinct
    data; a DML+query script per round must only ever see its own rows."""
    def worker(i: int):
        def body():
            sp = GraphSpace(spark, f"conc_{i}")
            sp.options = {"vid_type": "int64"}
            execute(sp, "CREATE TAG item(grp int, val int);"
                        "CREATE EDGE rel(w int)")
            base = i * 1000
            for r in range(N_ROUNDS):
                execute(sp, f"INSERT VERTEX item(grp, val) VALUES "
                            f"{base + r}:({i}, {r})")
                execute(sp, f"INSERT EDGE rel(w) VALUES "
                            f"{base + r}->{base}:({r})")
                # $var assignment + pipe inside one script — the env is
                # per-execute, never global
                df = execute(sp, "$v = LOOKUP ON item YIELD item.grp AS g;"
                                 "YIELD $v.g AS g | GROUP BY $-.g "
                                 "YIELD $-.g AS g, count(*) AS n")
                rows = df.collect()
                assert len(rows) == 1, f"thread {i} saw foreign groups"
                assert rows[0].g == i and rows[0].n == r + 1
            # catalog state isolated: exactly our two schemas
            assert sp.show_tags() == ["item"]
            assert sp.show_edges() == ["rel"]
            assert sp.tag("item").count() == N_ROUNDS
        return body

    _run_all([worker(i) for i in range(N_THREADS)])


def test_shared_space_concurrent_reads_with_params(spark):
    """One shared space, each thread queries with ITS OWN session
    parameters — results must reflect the caller's params, not another
    thread's (parameter substitution happens per-execute, front-end
    side, so a global would corrupt exactly this)."""
    sp = GraphSpace(spark, "conc_shared")
    rows = [(i, i % 4, f"n{i}") for i in range(40)]
    sp.create_tag("node", df=spark.createDataFrame(
        rows, "_vid long, grp long, name string"))
    sp.create_edge("rel", df=spark.createDataFrame(
        [(i, (i + 1) % 40, 0) for i in range(40)],
        "_src long, _dst long, _rank long"))

    def worker(i: int):
        def body():
            want = i % 4
            for _ in range(N_ROUNDS):
                df = execute(sp, "LOOKUP ON node WHERE node.grp == $g "
                                 "YIELD node.grp AS g",
                             params={"g": want})
                got = {r.g for r in df.collect()}
                assert got == {want}, f"thread {i}: params crosstalk {got}"
                # params are refused in vid positions (parameter.feature)
                # — thread identity rides the WHERE param instead
                df = execute(sp, f"GO FROM {i} OVER rel "
                                 "WHERE rel._dst == $d YIELD dst(edge) AS d",
                             params={"d": (i + 1) % 40})
                assert [r.d for r in df.collect()] == [(i + 1) % 40]
        return body

    _run_all([worker(i) for i in range(N_THREADS)])


def test_shared_catalog_use_is_per_call_not_ambient(spark):
    """A SpaceCatalog shared by threads: every statement names its space
    via an explicit leading USE in the same execute() call, so the
    catalog's current-space pointer (inherently last-writer-wins shared
    state) never silently routes a thread's query to a foreign space."""
    cat = SpaceCatalog(spark)
    for i in range(N_THREADS):
        execute(cat, f"CREATE SPACE cs{i}(vid_type=int64); USE cs{i}; "
                     "CREATE TAG t(x int)")

    def worker(i: int):
        def body():
            for r in range(N_ROUNDS):
                execute(cat, f"USE cs{i}; INSERT VERTEX t(x) "
                             f"VALUES {r}:({i})")
                df = execute(cat, f"USE cs{i}; LOOKUP ON t "
                             "YIELD t.x AS x")
                xs = {row.x for row in df.collect()}
                assert xs == {i}, f"thread {i} read foreign rows {xs}"
        return body

    _run_all([worker(i) for i in range(N_THREADS)])
    for i in range(N_THREADS):
        assert execute(cat, f"USE cs{i}; LOOKUP ON t YIELD t.x AS x") \
            .count() == N_ROUNDS


def test_concurrent_ddl_on_separate_catalogs(spark):
    """DDL lifecycle (CREATE/ALTER/DROP) racing across separate catalogs
    — schema registries are per-space dicts, so no global registry may
    leak a tag created by another thread."""
    def worker(i: int):
        def body():
            cat = SpaceCatalog(spark)
            execute(cat, f"CREATE SPACE d{i}; USE d{i}; "
                         f"CREATE TAG only{i}(a int)")
            execute(cat, f"USE d{i}; ALTER TAG only{i} ADD (b string)")
            sp = cat.spaces[f"d{i}"]
            assert sp.show_tags() == [f"only{i}"]
            cols = [c for c, _t, _n in sp.describe(f"only{i}")]
            assert cols == ["_vid", "a", "b"]
            execute(cat, f"USE d{i}; DROP TAG only{i}")
            assert sp.show_tags() == []
        return body

    _run_all([worker(i) for i in range(N_THREADS)])


def test_dml_lineage_is_truncated(spark):
    """r8 deep-fuzz finding: every DML statement stacks an anti-join +
    union on the table's PLAN; a long session issuing hundreds of
    mutations OOMed the Catalyst analyzer (reproduced at ~390 mutations
    on a 5-row table). _rebind now localCheckpoints every
    _REBIND_CHECKPOINT_EVERY mutations — pin that the live plan depth
    stays bounded instead of growing one Union per statement."""
    sp = GraphSpace(spark, "lineage")
    execute(sp, "CREATE TAG t(x int)")
    for i in range(18):
        execute(sp, f'INSERT VERTEX t(x) VALUES "v{i}":({i})')
    plan = sp.tag("t")._jdf.queryExecution().analyzed().toString()
    # without truncation the analyzed tree carries one Union per INSERT
    # (18 here); with checkpoints every 8 mutations at most ~2 survive
    assert plan.count("Union") <= 8, plan[:2000]
    assert sp.tag("t").count() == 18


def test_shared_space_dml_race(spark):
    """N threads INSERT into ONE shared space/tag concurrently (r9
    verdict item 7). Pinned semantics: DML is a read-modify-swap over
    the table binding, serialized by the per-space mutex
    (GraphSpace._mutex — the analog of the reference's per-part raft
    log serializing writers, RaftPart.cpp), so EVERY insert lands;
    without the lock, concurrent writers would lose updates. Readers
    never take the mutex: an in-flight DataFrame is an immutable
    snapshot (MVCC-style reads)."""
    sp = GraphSpace(spark, "conc_dml_shared")
    sp.options = {"vid_type": "int64"}
    execute(sp, "CREATE TAG acc(t int, r int)")

    def worker(i: int):
        def body():
            for r in range(N_ROUNDS):
                execute(sp, f"INSERT VERTEX acc(t, r) VALUES "
                            f"{i * 1000 + r}:({i}, {r})")
                # interleaved read sees a consistent snapshot: full
                # (t, r) rows only, never a torn row
                df = execute(sp, "LOOKUP ON acc YIELD acc.t AS t, "
                                 "acc.r AS r")
                assert all(row.t is not None and row.r is not None
                           for row in df.collect())
        return body

    _run_all([worker(i) for i in range(N_THREADS)])
    # zero lost updates: every thread's every round is present
    rows = {(r.t, r.r) for r in execute(
        sp, "LOOKUP ON acc YIELD acc.t AS t, acc.r AS r").collect()}
    want = {(i, r) for i in range(N_THREADS) for r in range(N_ROUNDS)}
    assert rows == want, f"lost updates: {sorted(want - rows)[:5]}"


def test_shared_space_update_race_single_key(spark):
    """All threads UPSET the SAME vertex: increments serialize through
    the mutex, so the final value is exactly the sum of all applied
    increments — the classic lost-update litmus."""
    sp = GraphSpace(spark, "conc_upd_shared")
    sp.options = {"vid_type": "int64"}
    execute(sp, "CREATE TAG ctr(n int); INSERT VERTEX ctr(n) VALUES 1:(0)")

    def worker(_i: int):
        def body():
            for _ in range(N_ROUNDS):
                execute(sp, "UPDATE VERTEX ON ctr 1 SET n = n + 1")
        return body

    _run_all([worker(i) for i in range(N_THREADS)])
    [row] = execute(sp, "FETCH PROP ON ctr 1 YIELD ctr.n AS n").collect()
    assert row.n == N_THREADS * N_ROUNDS


def test_shared_space_ddl_race_create_drop(spark):
    """Concurrent CREATE TAG (same name) and DROP TAG on one space.
    Pinned semantics: schema registry writes serialize on the same
    per-space mutex; exactly ONE racing CREATE of a name wins and the
    rest fail `Existed!` (the reference's meta service refuses
    duplicates the same way); DROP of a missing tag raises. The catalog
    must end consistent — no half-registered schema."""
    sp = GraphSpace(spark, "conc_ddl_shared")
    sp.options = {"vid_type": "int64"}
    created = []
    lock = threading.Lock()

    def creator(i: int):
        def body():
            try:
                execute(sp, "CREATE TAG hot(a int)")
                with lock:
                    created.append(i)
            except ValueError as e:
                assert "Existed" in str(e)
        return body

    _run_all([creator(i) for i in range(N_THREADS)])
    assert len(created) == 1, f"{len(created)} CREATEs won the race"
    assert sp.show_tags() == ["hot"]

    # create/drop churn on distinct names while a reader polls: the
    # registry stays a consistent dict (each SHOW sees some subset of
    # fully-registered names, never a broken def)
    def churner(i: int):
        def body():
            for r in range(N_ROUNDS):
                execute(sp, f"CREATE TAG churn_{i}_{r}(x int)")
                execute(sp, f"INSERT VERTEX churn_{i}_{r}(x) "
                            f"VALUES {r}:({r})")
                execute(sp, f"DROP TAG churn_{i}_{r}")
        return body

    def reader():
        for _ in range(N_THREADS * N_ROUNDS):
            for t in sp.show_tags():
                assert t == "hot" or t.startswith("churn_")

    _run_all([churner(i) for i in range(N_THREADS)] + [reader])
    assert sp.show_tags() == ["hot"]
