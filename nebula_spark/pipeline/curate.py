"""Dataset-curation operators for training-data pipelines: repetition
metrics, deterministic train/val/test splits, stratified sampling,
reproducible global shuffle, and PII scrubbing.

These extend the reference's surface (which has no corpus-curation ops —
its pipeline ends at graph queries) toward the north-star "LLM training
data pipeline" role. Everything here is pure Column expressions — JVM-side,
whole-stage codegen, zero shuffles except where a shuffle IS the operator
(global_shuffle) — and every formula is written to be replicable verbatim
in ANSI/DuckDB SQL so the driver's oracle can check exact values.

Scale notes (100 TB):
- per-document metrics are embarrassingly parallel: no shuffle, no UDF.
- split/sample/shuffle keys are md5-derived from the row id, so they are
  deterministic, reproducible across runs/engines, and independent of
  partitioning — the properties a training-data snapshot needs.
- ``global_shuffle`` is a range-repartition on the md5 key: the total
  order comes from range exchange + local sort, never a single-task
  global window.
- ``stratified_sample`` is one window per stratum (shuffle on the strata
  key); rank keys are md5(id), so re-runs pick identical rows.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "repetition_stats", "split_assign", "stratified_sample",
    "shuffle_key", "global_shuffle", "pii_scrub", "pii_counts",
    "contamination", "chunk_documents", "temperature_sample",
    "quality_filter", "pack_sequences",
]


def _words(text: Column) -> Column:
    return F.split(F.trim(text), r"\s+")


def _ngrams(words: Column, n: int) -> Column:
    """Word n-grams as space-joined strings (portable: DuckDB
    ``list_transform(range(1, len(W) - n + 2), i -> ...)``).

    Zipped-slices form (r11): the former index-lambda spelling
    (``element_at(words, i + j)`` inside the transform) re-evaluated the
    whole expression behind ``words`` once per element per reference —
    quadratic when ``words`` is a split() tree (see
    ``dedup.consecutive_grams``, measured 45× on contamination)."""
    from nebula_spark.pipeline.dedup import consecutive_grams
    return consecutive_grams(words, n, " ")


def repetition_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-style repetition metrics per document.

    Adds:
    - ``n_words`` — whitespace token count
    - ``dup_word_frac`` — 1 − distinct/total words (word-level repetition)
    - ``top_bigram_frac`` — occurrences of the most frequent bigram over
      total bigrams (the "top n-gram coverage" rule)
    - ``dup_trigram_frac`` — fraction of trigram occurrences that are
      repeats of an earlier trigram

    Documents dominated by repeated fragments (boilerplate, listings,
    crawler loops) score high and get filtered before dedup/training.

    Per-task cost (r11, guide §1.2 step 2): the top-bigram count is the
    max RUN LENGTH of the sorted bigram array — O(n log n) per row —
    instead of the former count-each-distinct-against-all scan, which was
    O(distinct · n) ≈ quadratic on long documents (same value: max
    multiplicity of any bigram either way; the oracle's formula is
    unchanged). The input is ``spread`` so a single-file corpus doesn't
    serialize the per-row array work on one scan task.
    """
    from nebula_spark.pipeline.dedup import spread
    # intermediate arrays materialized as named columns (r11): referenced
    # as bare expressions inside the HOF lambdas below they would be
    # re-evaluated per ELEMENT (interpreted lambda eval has no
    # subexpression cache — the former element_at(bs, i) filter re-sorted
    # the bigram array twice per bigram, O(n² log n) per row; measured
    # 12.4 s → sub-second for 500 docs). Multi-referenced non-cheap
    # producers are kept out of CollapseProject's inlining, so each
    # computes once per row.
    pre = (spread(df)
           .withColumn("_rs_w", _words(F.col(text_col)))
           .withColumn("_rs_bi", _ngrams(F.col("_rs_w"), 2))
           .withColumn("_rs_tri", _ngrams(F.col("_rs_w"), 3))
           .withColumn("_rs_bs", F.array_sort(F.col("_rs_bi"))))
    w, bi = F.col("_rs_w"), F.col("_rs_bi")
    tri, bs = F.col("_rs_tri"), F.col("_rs_bs")
    nw = F.size(w)
    # 1-based start positions of equal-runs in the sorted array, with a
    # sentinel n+1; max gap between consecutive starts = max multiplicity
    starts = F.filter(
        F.sequence(F.lit(1), F.size(bs)),
        lambda i: (i == 1) | (F.element_at(bs, i)
                              != F.element_at(bs, i - 1)))
    # guard: the hoisted column computes for EVERY row (unlike the former
    # spelling, evaluated only under when(size(bi) > 0)); with an empty
    # bigram array sequence(1, 0) is DESCENDING [1, 0] and the filter
    # would hit element_at(bs, 0). NULL here; consumers stay when-guarded.
    pre = pre.withColumn("_rs_bounds",
                         F.when(F.size(bs) > 0,
                                F.concat(starts, F.array(F.size(bs) + 1))))
    bounds = F.col("_rs_bounds")
    top_bi = F.array_max(F.zip_with(
        F.slice(bounds, 1, F.size(bounds) - 1),
        F.slice(bounds, 2, F.size(bounds) - 1),
        lambda s, e: e - s))
    return pre.withColumns({
        "n_words": nw,
        "dup_word_frac": F.round(
            1.0 - F.size(F.array_distinct(w)) / nw, 6),
        "top_bigram_frac": F.when(
            F.size(bi) > 0, F.round(top_bi / F.size(bi), 6)).otherwise(0.0),
        "dup_trigram_frac": F.when(
            F.size(tri) > 0,
            F.round((F.size(tri) - F.size(F.array_distinct(tri)))
                    / F.size(tri), 6)).otherwise(0.0),
    }).drop("_rs_w", "_rs_bi", "_rs_tri", "_rs_bs", "_rs_bounds")


def _md5_bucket(key: Column, buckets: int) -> Column:
    """Deterministic bucket in [0, buckets): first 8 md5 hex chars."""
    return (F.conv(F.substring(F.md5(key), 1, 8), 16, 10)
            .cast("long") % buckets)


def split_assign(df: DataFrame, id_col: str = "doc_id", seed: int = 42,
                 weights: Sequence[float] = (0.9, 0.05, 0.05),
                 names: Sequence[str] = ("train", "val", "test"),
                 col: str = "split") -> DataFrame:
    """Deterministic train/val/test assignment by id hash.

    The bucket is md5-derived from ``(id, seed)`` — stable across runs,
    engines, partitionings, and appends (a new row never moves an old row
    between splits, unlike fraction-based randomSplit).
    """
    if len(weights) != len(names) or abs(sum(weights) - 1.0) > 1e-9:
        raise ValueError("weights must match names and sum to 1")
    bucket = _md5_bucket(
        F.concat_ws(":", F.col(id_col).cast("string"), F.lit(str(seed))),
        1000)
    expr = F.lit(names[-1])
    acc = 0.0
    arms = []
    for name, wt in zip(names[:-1], weights[:-1]):
        acc += wt
        arms.append((int(round(acc * 1000)), name))
    for cut, name in reversed(arms):
        expr = F.when(bucket < cut, F.lit(name)).otherwise(expr)
    return df.withColumn(col, expr)


def stratified_sample(df: DataFrame, strata: Sequence[str],
                      n_per_stratum: int, id_col: str = "doc_id",
                      seed: int = 42) -> DataFrame:
    """Exactly-n-per-stratum deterministic sample.

    Rank within each stratum by md5(seed, id) and keep the first n: a
    reproducible uniform draw per group (md5 keys are unique given unique
    ids, so the order — and therefore the sample — is total and stable).
    One shuffle on the strata key; no global ordering anywhere.
    """
    rk = F.md5(F.concat_ws(
        ":", F.lit(str(seed)), F.col(id_col).cast("string")))
    w = Window.partitionBy(*strata).orderBy(rk, F.col(id_col))
    return (df.withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") <= n_per_stratum).drop("_rk"))


def shuffle_key(id_col: Column, seed: int = 42) -> Column:
    """64-bit deterministic shuffle key: md5('shuf:seed:id') → BIGINT.

    Sorting by this key is a reproducible global permutation (the
    property training-data snapshots need: same seed → same order,
    any engine)."""
    return (F.conv(F.substring(F.md5(F.concat_ws(
        ":", F.lit("shuf"), F.lit(str(seed)),
        id_col.cast("string"))), 1, 15), 16, 10).cast("long"))


def global_shuffle(df: DataFrame, id_col: str = "doc_id", seed: int = 42,
                   num_partitions: int | None = None) -> DataFrame:
    """Reproducible global shuffle for training-data export.

    Range-repartition on the md5 shuffle key + sort within partitions:
    the written files are totally ordered by the key without a global
    window (range exchange samples split points; each task sorts its
    range locally). At 100 TB this is one shuffle — the one the operator
    is for — with no single-task stage anywhere.
    """
    out = df.withColumn("shuffle_key", shuffle_key(F.col(id_col), seed))
    parts = [num_partitions] if num_partitions else []
    return (out.repartitionByRange(*parts, "shuffle_key")
            .sortWithinPartitions("shuffle_key"))


def contamination(docs: DataFrame, bench: DataFrame, n: int = 5,
                  text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Benchmark-contamination detection: flag training documents that
    share word n-grams with an evaluation/benchmark corpus (the standard
    decontamination step before LLM training — GPT-3 used 13-grams,
    most open pipelines 8- to 13-grams; ``n`` is a knob).

    Per probe document: ``n_ngrams`` (distinct n-grams), ``n_contaminated``
    (how many also occur anywhere in ``bench``), ``contamination_frac``.

    Scale (100 TB corpus, MB-GB benchmark): the benchmark n-gram set is
    tiny relative to the corpus, so it is deduped and **broadcast** — the
    corpus side streams map-side through explode → broadcast-semi-probe →
    re-group by doc id. The only shuffle is the per-doc regroup, keyed on
    the unique doc id (no skew by construction). Never an all-pairs or
    corpus-side-build join.
    """
    # gram array materialized BEFORE the explode (r11): in the former
    # one-select spelling the n_ngrams projection sat ABOVE the Generate
    # and recomputed the whole distinct-n-gram array once per EXPLODED
    # row — measured 81 s → 1.8 s warm at sf0.01. As a named column
    # referenced twice (size + generator) it survives CollapseProject
    # and computes once per document.
    grams = F.array_distinct(_ngrams(_words(F.col(text_col)), n))
    probe = (docs.select(F.col(id_col), grams.alias("_ct_g"))
             .select(F.col(id_col), F.size("_ct_g").alias("n_ngrams"),
                     F.explode_outer("_ct_g").alias("gram")))
    bench_grams = (bench
                   .select(grams.alias("_ct_g"))
                   .select(F.explode("_ct_g").alias("gram"))
                   .distinct()
                   .withColumn("hit", F.lit(1)))
    return (probe
            .join(F.broadcast(bench_grams), "gram", "left")
            .groupBy(id_col)
            .agg(F.max("n_ngrams").alias("n_ngrams"),
                 F.sum(F.coalesce(F.col("hit"), F.lit(0)))
                  .alias("n_contaminated"))
            .withColumn("contamination_frac",
                        F.round(F.col("n_contaminated")
                                / F.greatest(F.col("n_ngrams"), F.lit(1)),
                                6)))


def chunk_documents(df: DataFrame, chunk_size: int = 64, overlap: int = 16,
                    text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Split documents into fixed-size overlapping token windows — the
    shaping step that turns a curated corpus into training examples.

    Chunks start at word offsets 1, 1+step, 1+2·step … (step =
    chunk_size − overlap) and take ``chunk_size`` words each; a trailing
    start that would contribute no words beyond the previous chunk's
    overlap is dropped (rule: keep iff ``start == 1`` or
    ``n_words ≥ start + overlap``). Requires ``overlap ≤ step`` so only
    the final start can ever be dropped and ``chunk_id`` stays contiguous.

    Scale: pure per-row compute — split, sequence, posexplode, slice —
    zero shuffles, embarrassingly parallel, whole-stage codegen. Output
    rows ≈ input_words / step regardless of document skew.
    """
    step = chunk_size - overlap
    if step < overlap:
        raise ValueError("need overlap <= chunk_size/2 for contiguous ids")
    w = _words(F.col(text_col))
    ex = df.select(
        F.col(id_col), w.alias("_w"),
        F.posexplode(F.sequence(F.lit(1), F.greatest(F.size(w), F.lit(1)),
                                F.lit(step))).alias("chunk_id", "start"))
    keep = (F.col("start") == 1) | (F.size("_w") >=
                                    F.col("start") + overlap)
    win = F.slice(F.col("_w"), F.col("start"), chunk_size)
    return (ex.filter(keep)
            .select(id_col, "chunk_id", "start",
                    F.size(win).alias("n_tokens"),
                    F.concat_ws(" ", win).alias("chunk_text")))


def temperature_sample(df: DataFrame, group_col: str = "lang",
                       target_frac: float = 0.5, temperature: float = 2.0,
                       id_col: str = "doc_id", seed: int = 42) -> DataFrame:
    """Temperature-flattened resampling across groups (languages, domains):
    keep-probability per group ∝ n_g^(1/T) / n_g, so T=1 is uniform
    sampling and T→∞ equalizes group sizes — the multinomial-smoothing
    trick from multilingual-LM data mixing, made deterministic.

    Expected kept fraction over the whole corpus is ``target_frac``
    (groups whose rate clips at 1.0 keep every row). Acceptance is an
    integer compare of a 32-bit md5 hash of (seed, id) against
    ``floor(rate · 2³²)`` — reproducible across runs, engines, and
    partitionings, never a float-boundary coin flip.

    Scale: one groupBy over the (few) groups, a single-row totals frame
    broadcast back, then a map-side filter. No per-row shuffle at all.
    """
    counts = df.groupBy(group_col).agg(F.count("*").alias("n_g"))
    tot = counts.agg(
        F.sum("n_g").alias("n_total"),
        F.sum(F.pow(F.col("n_g"), 1.0 / temperature)).alias("z"))
    rates = counts.crossJoin(F.broadcast(tot)).select(
        group_col,
        F.least(F.lit(1.0), F.round(
            F.lit(target_frac) * F.col("n_total")
            * F.pow(F.col("n_g"), 1.0 / temperature)
            / (F.col("z") * F.col("n_g")), 9)).alias("rate"))
    h32 = F.conv(F.substring(F.md5(F.concat_ws(
        ":", F.lit("temp"), F.lit(str(seed)),
        F.col(id_col).cast("string"))), 1, 8), 16, 10).cast("long")
    return (df.join(F.broadcast(rates), group_col)
            .filter(h32 < F.floor(F.col("rate") * F.lit(4294967296.0))
                    .cast("long")))


def quality_filter(df: DataFrame, text_col: str = "text",
                   min_words: int = 50, max_words: int = 100_000,
                   max_dup_word_frac: float = 0.30,
                   max_top_bigram_frac: float = 0.18,
                   max_dup_trigram_frac: float = 0.30,
                   min_mean_word_len: float = 3.0,
                   max_mean_word_len: float = 10.0) -> DataFrame:
    """Gopher-rule composite filter: every rule evaluated per document,
    failed rule names collected into a ``drop_reasons`` array, ``keep``
    boolean alongside (so the caller can audit *why* rows were dropped —
    the operational requirement real curation pipelines have, and the
    reason this returns flags instead of silently filtering).

    Thresholds default to the Gopher paper's published cuts where one
    exists, else conventional values; all are keyword-overridable.

    Scale: builds on :func:`repetition_stats` — still pure per-row Column
    expressions, zero shuffles; ``df.filter("keep")`` afterwards keeps the
    whole pipeline map-side.
    """
    scored = repetition_stats(df, text_col)
    t = F.col(text_col)
    mean_wlen = (F.length(t) / F.greatest(F.col("n_words"), F.lit(1)))
    rules = {
        "too_short": F.col("n_words") < min_words,
        "too_long": F.col("n_words") > max_words,
        "dup_words": F.col("dup_word_frac") > max_dup_word_frac,
        "top_bigram": F.col("top_bigram_frac") > max_top_bigram_frac,
        "dup_trigrams": F.col("dup_trigram_frac") > max_dup_trigram_frac,
        "word_len": (mean_wlen < min_mean_word_len)
                    | (mean_wlen > max_mean_word_len),
    }
    reasons = F.filter(
        F.array(*[F.when(cond, F.lit(name)).otherwise(F.lit(None))
                  for name, cond in rules.items()]),
        lambda x: x.isNotNull())
    return (scored
            .withColumn("drop_reasons", reasons)
            .withColumn("keep", F.size("drop_reasons") == 0))


def pack_sequences(chunks: DataFrame, seq_len: int = 2048,
                   buckets: int = 1024, id_col: str = "doc_id",
                   ord_col: str = "chunk_id",
                   tokens_col: str = "n_tokens",
                   seed: int = 42) -> DataFrame:
    """Pack chunk rows into fixed-token training sequences — the step
    between :func:`chunk_documents` and the trainer's data loader.

    Adds ``pack_bucket``, ``seq_id`` (globally unique), ``seq_pos``
    (token offset of this chunk inside its sequence). Chunks are laid out
    by cumulative token offset; a chunk whose span crosses a ``seq_len``
    boundary stays in the sequence it starts in (offset packing — the
    trainer pads/splits at the boundary, which is the convention
    GPT-style pipelines use for document packing).

    Scale: true greedy packing is sequential, so the corpus is first
    hashed into ``buckets`` md5 buckets and packed independently within
    each — one shuffle on the bucket key, each bucket a window cumsum.
    Fill efficiency is unaffected (offsets are dense within a bucket);
    only sequence *numbering* differs from a single-stream pack. All keys
    are md5-derived → byte-identical output across runs/partitionings.
    """
    b = _md5_bucket(F.concat_ws(
        ":", F.lit("pack"), F.lit(str(seed)),
        F.col(id_col).cast("string")), buckets)
    rk = F.md5(F.concat_ws(":", F.lit(str(seed)),
                           F.col(id_col).cast("string")))
    out = chunks.withColumn("pack_bucket", b)
    w = (Window.partitionBy("pack_bucket")
         .orderBy(rk, F.col(id_col), F.col(ord_col))
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    start = F.sum(F.col(tokens_col)).over(w) - F.col(tokens_col)
    seq_in_bucket = F.floor(start / seq_len)
    return (out
            .withColumn("seq_id", F.col("pack_bucket")
                        * F.lit(1_000_000_000) + seq_in_bucket)
            .withColumn("seq_pos", (start % seq_len).cast("long")))


# PII patterns restricted to syntax that Java regex and RE2 (DuckDB)
# interpret identically: no backrefs, no lookaround, ASCII word boundaries
_PII_PATTERNS = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    "phone": (r"\b\d{3}[-.]\d{3,4}\b", "<PHONE>"),
    "ipv4": (r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    "url": (r"https?://[^\s]+", "<URL>"),
}

# order matters: emails before phones (an email local-part can contain
# digit runs), urls before ipv4 (a url can embed a host ip)
_PII_ORDER = ("email", "url", "ipv4", "phone")


def pii_counts(text: Column) -> dict[str, Column]:
    """Per-kind PII match counts (pre-scrub audit columns)."""
    return {
        f"n_{kind}": F.size(F.regexp_extract_all(
            text, F.lit(pat), F.lit(0)))
        for kind, (pat, _) in _PII_PATTERNS.items()
    }


def pii_scrub(text: Column) -> Column:
    """Replace emails / urls / ipv4s / phone-shaped digit runs with typed
    placeholder tokens. A regexp_replace chain — one codegen'd pass per
    pattern, no Python."""
    out = text
    for kind in _PII_ORDER:
        pat, repl = _PII_PATTERNS[kind]
        out = F.regexp_replace(out, pat, repl)
    return out
