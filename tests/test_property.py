"""Property-based tests (hypothesis) — a tier the reference lacks
(SURVEY.md §5: no fuzzing/proptest in-repo; we add it).

Two surfaces: (1) the nGQL parser never crashes un-controlled (either a
Pipeline/SetOp or SyntaxError — no other exception escapes), and round-
trips structured GO statements; (2) duplicate-preserving set-op semantics
match a Python multiset model on arbitrary row bags.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from nebula_spark.plans import parse
from nebula_spark.plans.ngql import GoStmt, Pipeline

IDENT = st.from_regex(r"[a-z][a-z0-9_]{0,8}", fullmatch=True)


@given(st.text(max_size=60))
@settings(max_examples=200, deadline=None)
def test_parser_total(s):
    """Any input → Pipeline/SetOp or SyntaxError, nothing else."""
    try:
        out = parse(s)
        assert out is not None
    except SyntaxError:
        pass


@given(
    steps=st.tuples(st.integers(1, 5), st.integers(0, 3)),
    vids=st.lists(IDENT, min_size=1, max_size=3),
    edges=st.lists(IDENT, min_size=1, max_size=3, unique=True),
    direction=st.sampled_from(["", " REVERSELY", " BIDIRECT"]),
    limit=st.integers(1, 9),
)
@settings(max_examples=100, deadline=None)
def test_go_roundtrip(steps, vids, edges, direction, limit):
    """Structured GO statements parse back to their own shape."""
    mn, extra = steps
    mx = mn + extra
    vid_s = ",".join(f'"{v}"' for v in vids)
    q = (f"GO {mn} TO {mx} STEPS FROM {vid_s} OVER {','.join(edges)}"
         f"{direction} YIELD dst(edge) AS d | LIMIT {limit}")
    p = parse(q)
    assert isinstance(p, Pipeline) and len(p.stages) == 2
    go = p.stages[0]
    assert isinstance(go, GoStmt)
    assert (go.min_steps, go.max_steps) == (mn, mx)
    assert go.edges == list(edges)
    assert go.sources == list(vids)
    want = {"": "out", " REVERSELY": "in", " BIDIRECT": "both"}[direction]
    assert go.direction == want


ROW = st.tuples(st.integers(0, 3), st.sampled_from(["a", "b", None]))


@given(left=st.lists(ROW, max_size=8), right=st.lists(ROW, max_size=8))
@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow])
def test_setops_model(spark, left, right):
    """intersect/minus match the reference's hash-set model: LHS
    duplicates survive; NULL == NULL (Value::operator==)."""
    from nebula_spark.operators.setops import intersect, minus
    schema = "k int, v string"
    ldf = spark.createDataFrame(left or [(99, "zz")], schema)
    rdf = spark.createDataFrame(right or [(98, "zz")], schema)
    lrows = left or [(99, "zz")]
    rset = set(right or [(98, "zz")])
    key = lambda t: (t[0], t[1] is None, t[1] or "")  # noqa: E731
    got_i = sorted(((r.k, r.v) for r in intersect(ldf, rdf).collect()), key=key)
    got_m = sorted(((r.k, r.v) for r in minus(ldf, rdf).collect()), key=key)
    exp_i = sorted((t for t in lrows if t in rset), key=key)
    exp_m = sorted((t for t in lrows if t not in rset), key=key)
    assert got_i == exp_i
    assert got_m == exp_m


TEXT = st.text(alphabet="ab cd", min_size=0, max_size=40)


@given(texts=st.lists(TEXT, min_size=1, max_size=6))
@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow])
def test_minhash_invariants(spark, texts):
    """MinHash invariants: signatures are deterministic, identical
    normalized texts get identical signatures, and signature length is
    always num_hashes (empty shingle sets included)."""
    from nebula_spark.pipeline.dedup import minhash_signatures, normalize_text
    import pyspark.sql.functions as F
    rows = [(i, t) for i, t in enumerate(texts)] + \
           [(len(texts) + i, t) for i, t in enumerate(texts)]  # duplicates
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sigs = {r.id: tuple(r.sig or ())
            for r in minhash_signatures(df, num_hashes=4).collect()}
    norm = {r.doc_id: r.n for r in
            df.select("doc_id", normalize_text(F.col("text")).alias("n"))
            .collect()}
    by_norm: dict = {}
    for i, t in rows:
        by_norm.setdefault(norm[i], set()).add(sigs[i])
    for n, sset in by_norm.items():
        assert len(sset) == 1, f"same normalized text, differing sigs: {n!r}"
    for s in sigs.values():
        assert s == () or len(s) == 4


@given(vecs=st.lists(
    st.lists(st.floats(-1, 1, allow_nan=False, width=32),
             min_size=4, max_size=4), min_size=2, max_size=5))
@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow])
def test_hyperplane_bucket_deterministic(spark, vecs):
    """LSH bucket ids: pure function of the vector — duplicated vectors
    land in the same bucket, bucket id is always n_planes bits."""
    from nebula_spark.pipeline.similarity import hyperplane_bucket
    import pyspark.sql.functions as F
    rows = [(i, v) for i, v in enumerate(vecs + vecs)]
    df = spark.createDataFrame(rows, "id long, v array<float>")
    got = {r.id: r.b for r in df.select(
        "id", hyperplane_bucket(F.col("v"), 5).alias("b")).collect()}
    n = len(vecs)
    for i in range(n):
        assert got[i] == got[i + n]
        assert len(got[i]) == 5 and set(got[i]) <= {"0", "1"}
