"""Focused pins for the r12 optimization-round operator changes.

Guards: size-adaptive CC round partitioning (labels unchanged at any
width), the explicit NULL-endpoint contract, the distance-only
shortestPath route (row-set equality with the path-carrying single
mode, detector gating), and the narrowed LSH pair dedup.
"""

from pyspark.sql import functions as F


def test_cc_labels_identical_across_round_widths(spark):
    # the round width is derived from the observed node count and capped
    # at the session shuffle width — labels must be invariant to it
    from nebula_spark.pipeline import connected_components
    rows = [(0, 5), (5, 9), (9, 2), (20, 21), (22, 21), (7, 7), (40, 41)] \
        + [(i, i + 1) for i in range(100, 140)]
    pairs = spark.createDataFrame(rows, "id_a long, id_b long")
    want = {(r.node, r.cluster_id)
            for r in connected_components(pairs).collect()}
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        for w in ("1", "7"):
            spark.conf.set("spark.sql.shuffle.partitions", w)
            got = {(r.node, r.cluster_id)
                   for r in connected_components(pairs).collect()}
            assert got == want, w
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


def test_cc_null_endpoints_dropped(spark):
    # (x, NULL) no longer collapses to a self-loop via least/greatest —
    # NULL-endpoint rows carry no connectivity and are dropped outright
    from nebula_spark.pipeline import connected_components
    pairs = spark.createDataFrame(
        [(1, 2), (3, None), (None, 4), (None, None), (5, 5)],
        "id_a long, id_b long")
    got = {(r.node, r.cluster_id)
           for r in connected_components(pairs).collect()}
    assert got == {(1, 1), (2, 1), (5, 5)}


def test_cc_empty_input_converges_fast(spark):
    from nebula_spark.pipeline import connected_components
    pairs = spark.createDataFrame([], "id_a long, id_b long")
    assert connected_components(pairs).count() == 0


def _dists_vs_paths(spark, edges, sources, max_hops, direction):
    from nebula_spark.operators.paths import bfs_min_dists, bfs_min_paths
    d = bfs_min_dists(edges, sources, max_hops=max_hops,
                      direction=direction, self_loop_once=True)
    p = bfs_min_paths(edges, sources, max_hops=max_hops,
                      direction=direction, mode="single", min_hops=1,
                      self_loop_once=True)
    got = {(r.start_vid, r.end_vid, r.hops, len(r.path))
           for r in d.collect()}
    want = {(r.start_vid, r.end_vid, r.hops, len(r.path))
            for r in p.collect()}
    assert got == want, (direction, max_hops, got ^ want)


def test_bfs_min_dists_matches_single_mode(spark, nba):
    # row-set equality with the path-carrying single mode, including the
    # root-cycle rows (p1->p2->p1 2-cycle, p3 self-like 1-cycle) and the
    # PATH LENGTH (array_repeat of typed NULLs must size to hops)
    edges = nba["like"].withColumn("_etype", F.lit("like"))
    src = nba["player"].select(F.col("_vid"))
    for direction in ("out", "in"):
        for mh in (2, 3, 5):        # lazy (<=3) and counted (>3) modes
            _dists_vs_paths(spark, edges, src, mh, direction)


def test_bfs_min_dists_rejects_both_and_min0(spark, nba):
    import pytest
    from nebula_spark.operators.paths import bfs_min_dists
    edges = nba["like"]
    src = nba["player"].select("_vid")
    with pytest.raises(ValueError):
        bfs_min_dists(edges, src, 2, direction="both")
    with pytest.raises(ValueError):
        bfs_min_dists(edges, src, 2, min_hops=0)


def test_path_contents_detector(spark):
    from nebula_spark.plans import ngql
    from nebula_spark.plans.executor import _stmt_path_contents_unused

    def flag(q):
        st = ngql.parse(q)
        return _stmt_path_contents_unused(
            st.stages[0] if hasattr(st, "stages") else st)

    base = "MATCH p = shortestPath((a:player)-[:like*1..2]->(b)) "
    assert flag(base + "RETURN length(p)")
    assert flag(base + "RETURN id(a), id(b), length(p) ORDER BY length(p)")
    assert not flag(base + "RETURN p")
    assert not flag(base + "RETURN nodes(p)")
    assert not flag(base + "RETURN relationships(p)")
    assert not flag(base + "WHERE length(p) > 1 RETURN p")
    assert not flag("MATCH p = shortestPath((a:player)-[e:like*1..2]->(b)) "
                    "RETURN e")
    assert not flag(base + "RETURN *")


def test_shortest_path_length_only_matches_path_route(spark, nba,
                                                      monkeypatch):
    # end-to-end: the SAME length-only statement must produce identical
    # rows through the dists route (detector on) and the path-carrying
    # route (detector forced off)
    from nebula_spark.catalog import GraphSpace
    from nebula_spark.plans import execute, executor
    sp = GraphSpace(spark, "t_r12")
    sp.create_tag("player", df=nba["player"])
    sp.create_tag("team", df=nba["team"])
    sp.create_edge("like", df=nba["like"])
    sp.create_edge("serve", df=nba["serve"])
    q = """
        MATCH p = shortestPath((a:player)-[:like|serve*1..3]->(b))
        RETURN id(a) AS s, id(b) AS e, length(p) AS h
    """
    a = {(r.s, r.e, r.h) for r in execute(sp, q).collect()}
    monkeypatch.setattr(executor, "_stmt_path_contents_unused",
                        lambda st: False)
    b = {(r.s, r.e, r.h) for r in execute(sp, q).collect()}
    assert a == b and a


def test_band_width_split_constants(spark):
    # join width scales up two orders before the window width, both stay
    # p=1 for sf0.1-sized corpora and clamp at the session shuffle width
    from nebula_spark.pipeline import dedup as D
    df = spark.range(1)          # any frame bound to the session
    sess_p = int(spark.conf.get("spark.sql.shuffle.partitions"))
    for n, want_join in ((20_000, 1), (200_000, 7), (10**9, sess_p)):
        assert D._band_width(df, n, D._LSH_JOIN_ROWS_PER_TASK) == \
            min(want_join, sess_p)
    assert D._band_width(df, 20_000) == 1          # window path, sf0.1
    assert D._band_width(df, 200_000) == 1         # window path, sf1
    assert D._band_width(df, 10**12) == sess_p     # cap never exceeded


def test_lsh_pairs_est_before_dedup_unchanged(spark):
    # est computed pre-dropDuplicates must equal the old post-dedup zip
    from nebula_spark.pipeline import minhash_lsh_pairs
    docs = spark.createDataFrame(
        [(i, "the quick brown fox jumps over the lazy dog " + str(i % 3))
         for i in range(30)] + [(100, "completely different text here")],
        "doc_id long, text string")
    rows = minhash_lsh_pairs(docs, k=3, num_hashes=8, bands=4).collect()
    seen = set()
    for r in rows:
        assert (r.id_a, r.id_b) not in seen      # dedup held
        seen.add((r.id_a, r.id_b))
        assert r.id_a < r.id_b
        assert 0.0 <= r.est_jaccard <= 1.0
    # near-identical docs (same suffix class) must surface as pairs
    assert any(r.est_jaccard == 1.0 for r in rows)
