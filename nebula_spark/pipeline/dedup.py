"""Deduplication at corpus scale: exact, n-gram Jaccard, MinHash+LSH,
SimHash, embedding-cosine near-dup.

Design for 100 TB: every method reduces to (1) a per-row signature computed
with JVM-side expressions (no Python), (2) a shuffle keyed on
signature/band/bucket — so the candidate-pair space is bucket-local, never
all-pairs. The only all-pairs variant (`ngram_jaccard_pairs`) is for
oracle-checkable small inputs and explicitly says so.

Cross-engine determinism: every hash bottoms out in md5 (identical in Spark
and DuckDB), so each operator has an exact SQL oracle — the correctness gate
covers the *distributed* implementation, not a reimplementation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from nebula_spark.operators.traverse import (checkpoint_count,
                                             checkpoint_observe)

# MinHash universal-hash parameters: h_i(x) = (a_i * x + b_i) mod P.
# P < 2^31 keeps a_i * x + b_i within int64 after x is reduced mod P.
MINHASH_P = 2_147_483_647  # 2^31 - 1, Mersenne prime
_A_SEED, _B_SEED = 0x9E3779B1, 0x85EBCA77

# Scale-adaptive partitioning for the CC superstep loop (r12, guide §2.2):
# each round shuffles (node, label) pairs — ~16-32 B a row — so ~2M rows a
# task lands shuffle partitions in the guide's 100 MB-1 GB band. The round
# width is derived from the OBSERVED node count (rides the seed job free)
# and capped at the session's configured spark.sql.shuffle.partitions, so
# a cluster-scaled config is never shrunk for big graphs while a tiny
# graph stops paying 32-task stages and per-stage AQE planning for a few
# thousand rows (measured at sf0.1: 2.05 s → 1.0 s for the round loop).
_CC_ROUND_ROWS_PER_TASK = 2_000_000

# Same idea for the LSH banding shuffle (explode rows are ~120 B: id, the
# signature array and the band signature string — 1M rows/task ≈ 100 MB,
# guide §2.2). The width is derived from the doc count observed free on
# the signature checkpoint job and embedded as an explicit repartition
# that the band window / band self-join then REUSES (hash(band, bsig, p)
# satisfies their clustered distribution — no second Exchange), capped at
# the session's configured shuffle width so cluster configs are never
# shrunk for corpora that need them.
#
# TWO constants because the two banded stages have per-row costs two
# orders apart (r12 second pass, guide §1.2 step 2 — size tasks by
# WORK, not only by shuffle bytes):
#   - the bucket-min WINDOW (lsh_star_edges) does one min+filter per
#     row — shuffle-byte currency applies, 1M rows/task ≈ 100 MB;
#   - the pair SELF-JOIN (minhash_lsh_pairs) forms O(bucket²) pairs and
#     compares two 16-long signatures per pair — at 50k docs (sf1-like
#     probe) one task held ~3-5 s of join compute while 31 cores idled.
#     32k rows/task keeps tiny corpora at p=1 (sf0.1's 20k banded rows
#     — the driver-visible plan is unchanged) and gives mid-size
#     corpora real parallelism: interleaved min-of-5 at the sf1 point
#     3.43 s vs 4.84 s (and 3.38 vs 5.52 in a second session), under
#     heavy host-steal noise documented in OPTIMIZATION_r12.md.
# At 100 TB both clamp to the session's configured width, so the
# constants only pick parallelism for mid-size inputs.
_LSH_BAND_ROWS_PER_TASK = 1_000_000
_LSH_JOIN_ROWS_PER_TASK = 32_000


def _band_width(df, n_rows: int,
                rows_per_task: int = _LSH_BAND_ROWS_PER_TASK) -> int:
    sess_p = int(df.sparkSession.conf.get(
        "spark.sql.shuffle.partitions", "200"))
    return max(1, min(sess_p, -(-n_rows // rows_per_task)))


def _md5_64(c: Column) -> Column:
    """Stable 60-bit integer from md5 hex — the cross-engine base hash."""
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def _perm_params(num_hashes: int) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs: a odd in [1, P), b in [0, P)."""
    out = []
    for i in range(num_hashes):
        a = (_A_SEED * (2 * i + 1)) % MINHASH_P
        b = (_B_SEED * (i + 1)) % MINHASH_P
        out.append((a | 1, b))
    return out


def normalize_text(c: Column) -> Column:
    """Canonical form for dedup: lower, collapse whitespace, trim."""
    return F.regexp_replace(F.trim(F.lower(c)), r"\s+", " ")


def consecutive_grams(arr: Column, n: int, sep: str = " ") -> Column:
    """n-grams of consecutive array elements via zipped shifted slices.

    The obvious spelling — ``transform(indices, i -> concat(element_at(
    arr, i), element_at(arr, i+1), …))`` — re-evaluates the WHOLE
    expression tree behind ``arr`` once per element per reference when
    ``arr`` is not a plain column: higher-order-function lambdas are
    interpreted (CodegenFallback) with no subexpression cache, so a
    split/regex-backed array turns O(n) grams into O(n·cost(arr)) —
    measured 45× on the contamination operator (OPTIMIZATION_r11.md,
    third pass). Here every lambda touches only its lambda variable;
    ``arr`` is referenced n+1 times per ROW (the slices + the size),
    never per element.

    Exactly ``max(size(arr) - n + 1, 0)`` grams; each slice has exactly
    that length (start j+1 ≤ n, so j+take ≤ size), so ``arrays_zip``
    never pads. NULL array → NULL, matching the transform spelling.
    """
    take = F.greatest(F.size(arr) - (n - 1), F.lit(0))
    slices = [F.slice(arr, j + 1, take).alias(f"_g{j}") for j in range(n)]
    return F.transform(
        F.arrays_zip(*slices),
        lambda s: F.concat_ws(sep, *[s[f"_g{j}"] for j in range(n)]))


def spread(df: DataFrame) -> DataFrame:
    """Give a compute-heavy row-wise stage input parallelism.

    Scan task count follows file bytes (`maxPartitionBytes`), which is the
    wrong currency for expression-heavy stages: a 5k-document parquet file
    is one scan task, and the shingle/md5 projection serializes on one
    core. Repartition up to the session default parallelism when the scan
    yields fewer partitions; on a real many-file corpus this is a no-op
    (and the round-robin shuffle of raw text is trivially cheap relative
    to the signature compute it unblocks).

    Partition-count heuristic uses input file count, never `.rdd` (which
    forces plan-to-RDD conversion and disables AQE on the branch): a scan
    over >= target files already has the parallelism; anything else —
    few files, or a non-scan plan (inputFiles() == []) whose parallelism
    we can't see cheaply — gets repartitioned, which AQE coalesces again
    if it was already wide."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if len(df.inputFiles()) >= target:
        return df
    return df.repartition(target)


def exact_dedup(df: DataFrame, text_col: str = "text",
                key_col: str = "doc_id") -> DataFrame:
    """Exact dedup on normalized-text hash; keeps the minimum key per group.

    Shuffle is on the 64-bit hash (uniform, no skew); the winner-per-group
    is a min-aggregate, not a window sort — one pass, map-side combinable.
    """
    h = _md5_64(normalize_text(F.col(text_col)))
    return (spread(df).withColumn("_h", h)
            .groupBy("_h")
            .agg(F.min(key_col).alias(key_col),
                 F.count(F.lit(1)).alias("dup_count"))
            .drop("_h"))


def shingles(c: Column, k: int = 5, mode: str = "word") -> Column:
    """k-shingles as an array column. word mode: k-grams of tokens;
    char mode: k-grams of characters. Distinct (set semantics)."""
    def safe_seq(n: Column) -> Column:
        # sequence(1, 0) would generate a DESCENDING [1, 0] — guard short docs
        return F.when(n >= k, F.sequence(F.lit(1), n - (k - 1))) \
                .otherwise(F.array().cast("array<int>"))

    if mode == "word":
        # zipped-slices form (r11): the per-index transform re-evaluated
        # the normalize+split tree once per token (see consecutive_grams)
        sh = consecutive_grams(F.split(normalize_text(c), " "), k, " ")
    elif mode == "char":
        s = normalize_text(c)
        idx = safe_seq(F.length(s))
        sh = F.transform(idx, lambda i: F.substring(s, i, F.lit(k)))
    else:
        raise ValueError(f"unknown shingle mode {mode!r}")
    return F.array_distinct(sh)


def ngram_jaccard_pairs(df: DataFrame, key_col: str = "doc_id",
                        text_col: str = "text", k: int = 3,
                        threshold: float = 0.8) -> DataFrame:
    """Exact n-gram Jaccard similarity pairs via shingle inverted index.

    Not all-pairs: docs are exploded to (shingle, doc) and joined on the
    shingle — the shuffle key is the shingle, candidate pairs share ≥1
    shingle, and Jaccard = |∩| / (|A|+|B|−|∩|) falls out of a count
    aggregate. This is the exact version of what MinHash approximates;
    at 100 TB you run MinHash first and this only to confirm candidates.
    """
    sh = (spread(df).select(F.col(key_col).alias("id"),
                            shingles(F.col(text_col), k).alias("sh"))
          .withColumn("n", F.size("sh"))
          .select("id", "n", F.explode("sh").alias("s")))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (a.join(b, (F.col("a.s") == F.col("b.s"))
                    & (F.col("a.id") < F.col("b.id")))
             .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
                      F.col("a.n").alias("n_a"), F.col("b.n").alias("n_b"))
             .agg(F.count(F.lit(1)).alias("n_common")))
    jac = F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common"))
    return (inter.withColumn("jaccard", F.round(jac, 6))
            .filter(F.col("jaccard") >= threshold)
            .select("id_a", "id_b", "jaccard"))


def minhash_signatures(df: DataFrame, key_col: str = "doc_id",
                       text_col: str = "text", k: int = 3,
                       num_hashes: int = 16) -> DataFrame:
    """MinHash signature per document: for each of ``num_hashes`` universal
    hashes, the min over the document's shingle set.

    Entirely JVM-side: shingle → md5 base hash (mod P) → per-permutation
    affine transform → array_min. One projection, zero shuffles.
    """
    def affine(a: int, b: int):
        return lambda x: (a * x + b) % MINHASH_P

    # materialize the md5 base array once per row (named column, not a
    # repeated subexpression under each array_min), then take the per-
    # permutation minima over it
    sig = F.array(*[F.array_min(F.transform(F.col("_mh_base"), affine(a, b)))
                    for a, b in _perm_params(num_hashes)])
    return (spread(df)
            .withColumn("_mh_base",
                        F.transform(shingles(F.col(text_col), k),
                                    lambda s: _md5_64(s) % MINHASH_P))
            .select(F.col(key_col).alias("id"), sig.alias("sig")))


def minhash_lsh_pairs(df: DataFrame, key_col: str = "doc_id",
                      text_col: str = "text", k: int = 3,
                      num_hashes: int = 16, bands: int = 4) -> DataFrame:
    """MinHash + LSH banding: candidate pairs agreeing on ≥1 full band.

    rows-per-band r = num_hashes/bands; collision probability s^r per band.
    Scale shape: explode to (band_id, band_signature) — the shuffle key —
    then self-join per bucket. Estimated similarity = fraction of matching
    signature positions, computed from the signatures (no second text pass).
    """
    if num_hashes % bands:
        raise ValueError("bands must divide num_hashes")
    r = num_hashes // bands
    # eager localCheckpoint, not persist(): the banded self-join below reads
    # the signatures twice, but a persist() here could never be unpersisted
    # (the returned frame is lazy) — checkpoint blocks are freed by the
    # ContextCleaner once the result goes out of scope, so a long-lived
    # driver loop doesn't accumulate cache entries. Whole-stage codegen off
    # for this one job: the 16-hash md5 tree compiles into one huge
    # generated method (~10 s of fresh-JVM compile at 16 hashes); the
    # per-expression interpreted path computes the same md5s at nearly the
    # same throughput because hashing, not virtual-call overhead, is the
    # bottleneck.
    from nebula_spark.operators.traverse import checkpoint_count
    from nebula_spark.session import scoped_conf
    sigs = minhash_signatures(df, key_col, text_col, k, num_hashes)
    with scoped_conf(df.sparkSession,
                     **{"spark.sql.codegen.wholeStage": "false"}):
        sigs, n_docs = checkpoint_count(sigs)
    banded = sigs.select(
        "id", "sig",
        F.explode(F.array(*[
            F.struct(F.lit(i).alias("band"),
                     F.array_join(F.slice("sig", i * r + 1, r), "_")
                     .alias("bsig"))
            for i in range(bands)])).alias("b"))
    # size-derived band-join width (r12, guide §2.2): the doc count rides
    # the signature checkpoint free; the explicit repartition is what both
    # join sides reuse, so tiny corpora stop paying session-width stages.
    # JOIN rows-per-task, not window rows-per-task: pair formation is
    # compute-dense (see the constants' comment)
    banded = banded.repartition(_band_width(df, n_docs * bands,
                                            _LSH_JOIN_ROWS_PER_TASK),
                                F.col("b.band"), F.col("b.bsig"))
    a, b = banded.alias("a"), banded.alias("b")
    # estimated similarity computed BEFORE the pair dedup (r12, guide
    # §2.3 shuffle fewer bytes): duplicate (id_a, id_b) rows from
    # different bands carry identical signatures, hence identical
    # estimates, so deduping (id_a, id_b, est) is equivalent — and the
    # dropDuplicates exchange moves one double per row instead of two
    # num_hashes-long signature arrays.
    est = (F.size(F.filter(F.zip_with(F.col("a.sig"), F.col("b.sig"),
                                      lambda x, y: x == y),
                           lambda v: v))
           / F.lit(num_hashes))
    return (a.join(b, (F.col("a.b.band") == F.col("b.b.band"))
                   & (F.col("a.b.bsig") == F.col("b.b.bsig"))
                   & (F.col("a.id") < F.col("b.id")))
            .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
                    F.round(est, 6).alias("est_jaccard"))
            .dropDuplicates(["id_a", "id_b"]))


def lsh_star_edges(df: DataFrame, key_col: str = "doc_id",
                   text_col: str = "text", k: int = 3,
                   num_hashes: int = 16, bands: int = 4,
                   distinct: bool = True) -> DataFrame:
    """Linear-output LSH bucketing for CLUSTERING: within each
    (band, band-signature) bucket emit one edge doc → bucket-min instead
    of all O(n²) pairs. A star spans exactly the same connected
    component as the clique, so cluster assignment downstream is
    IDENTICAL to feeding minhash_lsh_pairs into connected_components —
    but a 1M-clone duplicate group costs 10⁶ edges, not 5·10¹¹ pairs.
    (r10 skew-probe finding: a 10%-template skew dataset turned a
    500-doc group into 145k pairs; quadratic pair output is inherent to
    the pairs-with-similarity CONTRACT, not to clustering.)

    One window shuffle on (band, bsig) + one distinct — no self-join.
    Returns (id_a, id_b) edges with id_a = bucket min, id_a < id_b.
    """
    from pyspark.sql.window import Window

    if num_hashes % bands:
        raise ValueError("bands must divide num_hashes")
    r = num_hashes // bands
    # Signature checkpoint stays EAGER (measured twice, r11): skipping it
    # looks attractive — the signatures feed one banded explode under the
    # window Exchange — but connected_components' symmetrization unions
    # two copies of this frame, and A/B at sf0.1 (3+5 reps, both orders)
    # put the skip at best neutral (eager med 2.96/3.07 s vs lazy
    # 3.43/3.19 s for the full cluster pipeline). Same family as the
    # lazy-checkpoint negative result in OPTIMIZATION_r11.md item 14:
    # a map-only subtree with concurrent readers wants a real barrier.
    from nebula_spark.operators.traverse import checkpoint_count
    from nebula_spark.session import scoped_conf
    sigs = minhash_signatures(df, key_col, text_col, k, num_hashes)
    with scoped_conf(df.sparkSession,
                     **{"spark.sql.codegen.wholeStage": "false"}):
        sigs, n_docs = checkpoint_count(sigs)
    banded = sigs.select(
        "id",
        F.explode(F.array(*[
            F.struct(F.lit(i).alias("band"),
                     F.array_join(F.slice("sig", i * r + 1, r), "_")
                     .alias("bsig"))
            for i in range(bands)])).alias("b"))
    # size-derived window width (r12, guide §2.2): the bucket-min window
    # reuses the explicit hash(band, bsig, p) repartition — one Exchange,
    # sized to the corpus instead of the session default (see
    # _band_width; the count rides the signature checkpoint job free)
    banded = banded.repartition(_band_width(df, n_docs * bands),
                                F.col("b.band"), F.col("b.bsig"))
    w = Window.partitionBy("b.band", "b.bsig")
    out = (banded.withColumn("_root", F.min("id").over(w))
           .filter(F.col("id") != F.col("_root"))
           .select(F.col("_root").alias("id_a"), F.col("id").alias("id_b")))
    # ``distinct=False`` skips the dedup exchange for consumers that
    # re-shuffle-dedup anyway (connected_components symmetrizes then
    # distincts, so the same edge appearing under several bands is
    # absorbed one operator later — one full Exchange saved end-to-end);
    # the standalone contract stays deduped by default
    return out.distinct() if distinct else out


def simhash64(df: DataFrame, key_col: str = "doc_id",
              text_col: str = "text") -> DataFrame:
    """SimHash: 64-bit near-dup signature — per-token md5 hash, per-bit
    weighted vote, sign → bit.

    JVM-side trick: for each bit position, sum ±1 over token hashes
    (aggregate over the token array), no UDF. 64 aggregate expressions is
    heavy codegen but still one projection pass, no shuffle.
    """
    # token-hash array materialized as a named column (r11): as a bare
    # expression it was re-evaluated by each of the 64 bit aggregates —
    # 64 × (normalize + split + per-token md5) per row
    toks = F.array_distinct(F.split(normalize_text(F.col(text_col)), " "))
    df = spread(df).withColumn("_sh_h", F.transform(toks, _md5_64))
    h = F.col("_sh_h")

    def mask(bit: int) -> int:
        v = 1 << bit
        return v - (1 << 64) if v >= (1 << 63) else v  # signed int64 repr

    def voter(bit: int):
        return lambda acc, x: acc + F.when(
            x.bitwiseAND(F.lit(mask(bit))) != 0, 1).otherwise(-1)

    bits = []
    for bit in range(64):
        vote = F.aggregate(h, F.lit(0), voter(bit))
        bits.append(F.when(vote > 0, F.lit(mask(bit))).otherwise(F.lit(0)))
    sim = bits[0]
    for b in bits[1:]:
        sim = sim.bitwiseOR(b)
    return df.select(F.col(key_col).alias("id"), sim.alias("simhash"))


def embedding_cosine_dups(emb: DataFrame, key_col: str = "vec_id",
                          vec_col: str = "embedding",
                          threshold: float = 0.95,
                          n_buckets: int = 8) -> DataFrame:
    """Embedding near-dup pairs above a cosine threshold, random-hyperplane
    bucketed (SimHash-for-vectors) so the pair join is bucket-local.

    With ``n_buckets`` hyperplanes drawn from md5-seeded pseudo-random signs,
    two vectors land in the same bucket when they agree on every hyperplane
    side — high-cosine pairs almost always do for small n_buckets. Exact
    cosine is then computed only within buckets.
    """
    from nebula_spark.functions.graphfns import cos_similarity

    dim_idx = F.sequence(F.lit(0), F.size(F.col(vec_col)) - 1)
    # deterministic pseudo-random hyperplane sign for (plane, dim)
    def plane_sign(p: int):
        return lambda i: F.when(
            _md5_64(F.concat(F.lit(f"plane{p}:"), i.cast("string"))) % 2 == 0,
            F.lit(1.0)).otherwise(F.lit(-1.0))

    bucket = F.concat_ws("", *[
        F.when(F.aggregate(
            F.zip_with(F.col(vec_col),
                       F.transform(dim_idx, plane_sign(p)),
                       lambda x, s: x * s),
            F.lit(0.0), lambda acc, v: acc + v) >= 0, F.lit("1"))
        .otherwise(F.lit("0"))
        for p in range(n_buckets)])
    v = emb.select(F.col(key_col).alias("id"),
                   F.col(vec_col).cast("array<double>").alias("v"),
                   bucket.alias("bkt"))
    a, b = v.alias("a"), v.alias("b")
    pairs = (a.join(b, (F.col("a.bkt") == F.col("b.bkt"))
                    & (F.col("a.id") < F.col("b.id")))
             .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
                     F.round(cos_similarity(F.col("a.v"), F.col("b.v")), 6)
                     .alias("cosine")))
    return pairs.filter(F.col("cosine") >= threshold)


def connected_components(pairs: DataFrame, src: str = "id_a",
                         dst: str = "id_b",
                         max_iter: int = 25) -> DataFrame:
    """Duplicate-cluster assignment: connected components over a candidate
    pair list, label = min member id (the canonical representative a dedup
    pipeline keeps).

    Min-label propagation with POINTER JUMPING (r11): each round first
    takes the min label over the closed neighborhood (one shuffle keyed on
    node id, map-side combinable), then compresses label chains by
    replacing every label with its label's label (one join keyed on the
    label). Labels only decrease and only to ids inside the same
    component, so the fixpoint is unchanged — the component minimum — but
    chains shorten geometrically: a depth-d label tree converges in
    O(log d) rounds instead of d supersteps (measured at sf0.1: the LSH
    star-edge graph needed 7 neighbor-only supersteps, 3 jump rounds).
    The convergence probe is an improved-row Observation riding each
    round's checkpoint job (no dedicated probe stage), and labels are
    eagerly localCheckpoint-ed per round to cut lineage. For adversarially
    long chain graphs :func:`connected_components_star` (alternating
    large-star/small-star contraction, O(log² n) supersteps) remains —
    same frame contract, identical labels.

    Returns ``(node, cluster_id)``, one row per distinct node in *pairs*.
    """
    from nebula_spark.session import scoped_conf

    e = pairs.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    # NULL endpoints carry no connectivity and are dropped outright (r12,
    # ADVICE): under least/greatest canonicalization a (x, NULL) pair would
    # otherwise silently collapse to a self-loop (x, x) — make the NULL-id
    # contract explicit instead of an artifact of NULL-skipping functions.
    e = e.filter(F.col("a").isNotNull() & F.col("b").isNotNull())
    # Dedup BEFORE symmetrizing (r11 fourth pass): distinct(e ∪ swap(e))
    # is a symmetric set, i.e. exactly can ∪ swap(can) where can is the
    # canonically-oriented (min, max) distinct pair set — so the dedup
    # exchange carries |pairs| rows instead of 2·|pairs| and the swap is
    # a free projection on top of it. (A self-loop appears twice in sym
    # instead of once; every consumer is a min-aggregate or a join feeding
    # one, so labels are identical.)
    can = (e.select(F.least("a", "b").alias("a"),
                    F.greatest("a", "b").alias("b"))
           .distinct())
    sym = (can.unionByName(can.select(F.col("b").alias("a"),
                                      F.col("a").alias("b")))
           .persist())
    # whole-stage codegen off for the supersteps: every iteration builds a
    # *new* plan (fresh checkpoint lineage), so generated code recompiles
    # per superstep — compile latency dominates the fusion win, and when
    # the candidate pairs come from an md5-heavy LSH plan (the
    # dedup_clusters pipeline) the first superstep would compile the whole
    # 64-expression hash tree into one huge method. Measured at sf0.1:
    # fresh-session 32.7 s → ~15-20 s, warm 8.4 s → ~5 s.
    with scoped_conf(sym.sparkSession,
                     **{"spark.sql.codegen.wholeStage": "false"}):
        # round 0 folded into the seed (r11 second pass): with identity
        # labels the neighbor-min round is algebraically min over the
        # CLOSED neighborhood — min(node, min of neighbors) — which is a
        # single map-side-combinable aggregate over the symmetric edge
        # list (every node appears as `a` in sym). The identity-label
        # frame, the sym⋈labels message join and the union it fed are
        # gone; the probe sum rides the same checkpoint job as before.
        # Seed stays EAGER (measured, r11 fourth pass): folding its
        # checkpoint job into round 1 via a lazy cut saved one job
        # barrier (28→27) but round 1's two readers re-ran the seed's
        # post-exchange aggregation (345→599 tasks) — locally a wash
        # (interleaved mins 2.57/3.10 vs 3.20/2.72), and at scale a
        # full node-keyed aggregate re-run costs more than the barrier
        # it saves. The node COUNT rides the same observation (r12):
        # it sizes the round shuffles below and makes the empty-input
        # convergence explicit (n == 0) instead of overloading the sum
        # probe — a decimal(38,0) overflow now keeps iterating to
        # max_iter (NULL total never equals) rather than conflating
        # with emptiness (ADVICE r11).
        labels, m0 = checkpoint_observe(
            sym.groupBy(F.col("a").alias("node"))
               .agg(F.min(F.least("a", "b")).alias("label")),
            total=F.sum(F.col("label").cast("decimal(38,0)")),
            n=F.count(F.lit(1)))
        prev_total = m0["total"]
        n_nodes = int(m0["n"] or 0)
        # round-loop partitioning derived from the observed node count
        # (guide §2.2; see _CC_ROUND_ROWS_PER_TASK). The symmetric edge
        # list is re-hashed ONCE onto the round layout keyed by the
        # message-join key, so every round's sym-side Exchange
        # disappears (the persisted InMemoryRelation advertises
        # hash(a, p)); rounds shuffle only the shrinking label frame.
        sess_p = int(sym.sparkSession.conf.get(
            "spark.sql.shuffle.partitions", "200"))
        p = max(1, min(sess_p, -(-n_nodes // _CC_ROUND_ROWS_PER_TASK)))
        sym_r = sym.repartition(p, "a").persist()
        round_confs = {"spark.sql.shuffle.partitions": str(p)}
        if p == 1:
            # a single-partition round plan has nothing for AQE to adapt
            # (no coalescing, no skew split, no join re-planning across
            # one partition) while AQE still materializes every Exchange
            # as its own job — at p == 1 each round collapses to ONE job
            # under static planning (measured: 1.0 → 0.88 s round loop).
            # Any graph big enough for p > 1 keeps AQE untouched.
            round_confs["spark.sql.adaptive.enabled"] = "false"
        with scoped_conf(sym.sparkSession, **round_confs):
            for it in range(1, max_iter if n_nodes else 1):
                msgs = (sym_r.join(labels, sym_r["a"] == labels["node"],
                                   "inner")
                        .select(F.col("b").alias("node"), F.col("label")))
                nbr_min = (labels.unionByName(msgs)
                           .groupBy("node")
                           .agg(F.min("label").alias("label")))
                # pointer jump: label ← label[label]. label values are
                # node ids of the same component (induction over both
                # rules), so the left join resolves every non-root label
                # one more level toward the component min; roots
                # (label[label]=label) keep their value via the coalesce.
                # Never applied to the round-0 identity seed (folded into
                # the aggregate above): there the jump would re-aggregate
                # the largest pre-convergence frame for almost no
                # compression (measured at sf0.1: always-jump 2.7 s,
                # jump-from-1 1.8 s, no-jump 2.0 s / 7 rounds).
                lut = nbr_min.select(F.col("node").alias("_ln"),
                                     F.col("label").alias("_ll"))
                nbr_min = (nbr_min.join(lut,
                                        nbr_min["label"] == lut["_ln"],
                                        "left")
                           .select("node",
                                   F.coalesce("_ll", "label")
                                   .alias("label")))
                # convergence probe rides the checkpoint job: per-node
                # labels are monotone non-increasing, so the (exact,
                # decimal) label sum strictly decreases iff any node
                # improved — no join against the previous labels needed
                # (r11; was one extra node-keyed join per round)
                labels, m = checkpoint_observe(
                    nbr_min,
                    total=F.sum(F.col("label").cast("decimal(38,0)")))
                if m["total"] is not None and m["total"] == prev_total:
                    break
                prev_total = m["total"]
    sym.unpersist()
    sym_r.unpersist()
    return labels.select(F.col("node"), F.col("label").alias("cluster_id"))


def connected_components_star(pairs: DataFrame, src: str = "id_a",
                              dst: str = "id_b",
                              max_iter: int = 20) -> DataFrame:
    """Connected components by alternating large-star/small-star contraction
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    SoCC'14) — the scale path for graphs whose diameter defeats min-label
    propagation: a 1M-node chain needs 1M label supersteps but only
    O(log² n) ≈ a couple dozen contraction rounds.

    One round = two keyed shuffles (a groupBy-min per star phase), both
    map-side combinable; the edge frame is eagerly localCheckpoint-ed per
    round so lineage stays flat. Same contract and labels as
    :func:`connected_components`: returns ``(node, cluster_id)`` with
    cluster_id = min member id (the contraction's fixpoint is a star
    centered on each component's minimum).
    """
    e = pairs.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    # lazy: node set is only read by the final label join — the eager
    # variant paid a dedicated materialization job up front for nothing
    nodes = (e.select(F.col("u").alias("node"))
             .unionByName(e.select(F.col("v").alias("node")))
             .distinct().localCheckpoint(eager=False))
    # canonical orientation big→small; self-loops carry no connectivity
    edges, n_edges = checkpoint_count(
        e.filter(F.col("u") != F.col("v"))
        .select(F.greatest("u", "v").alias("u"),
                F.least("u", "v").alias("v"))
        .distinct())
    for _ in range(max_iter):
        if n_edges == 0:
            break
        # large-star(u): link every strictly-larger neighbor to the min of
        # the closed neighborhood — moves whole subtrees below small ids
        sym = edges.unionByName(edges.select(F.col("v").alias("u"),
                                             F.col("u").alias("v")))
        mins = (sym.groupBy("u").agg(F.min("v").alias("mn"))
                .select("u", F.least("u", "mn").alias("m")))
        ls = (sym.join(mins, "u")
              .filter(F.col("v") > F.col("u"))
              .select(F.col("v").alias("u"), F.col("m").alias("v"))
              .filter(F.col("u") != F.col("v")).distinct())
        # small-star(u): link u and all its smaller neighbors to their min
        m2 = ls.groupBy("u").agg(F.min("v").alias("m"))
        ss, n_new = checkpoint_count(
            ls.join(m2, "u")
            .select(F.col("v").alias("a"), F.col("m").alias("b"))
            .unionByName(m2.select(F.col("u").alias("a"),
                                   F.col("m").alias("b")))
            .filter(F.col("a") != F.col("b"))
            .select(F.greatest("a", "b").alias("u"),
                    F.least("a", "b").alias("v"))
            .distinct())
        # fixpoint: identical edge set (both sides distinct, so one-sided
        # exceptAll-empty + equal counts ⇒ equality)
        if n_new == n_edges and \
                ss.exceptAll(edges).limit(1).count() == 0:
            edges = ss
            break
        edges, n_edges = ss, n_new
    # at the fixpoint each node carries exactly one (node → min) edge; the
    # groupBy-min guards the max_iter-exhausted case (still one row/node)
    star = edges.groupBy(F.col("u").alias("node")) \
                .agg(F.min("v").alias("label"))
    return (nodes.join(star, "node", "left")
            .select("node", F.coalesce("label", "node").alias("cluster_id")))
