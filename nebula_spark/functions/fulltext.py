"""Full-text search predicates (SURVEY.md §2.1 FulltextIndexScan).

The reference delegates PREFIX / WILDCARD / REGEXP / FUZZY text queries to
an external Elasticsearch cluster
(``src/graph/executor/query/FulltextIndexScanExecutor.cpp:1-107``,
``src/common/expression/TextSearchExpression.h``,
``src/common/plugin/fulltext/elasticsearch/ESAdapter.h``). Here the whole
service collapses into JVM-side column predicates — Catalyst pushes the
cheap ones into the Parquet scan, and there is no cluster to operate:

- prefix    → ``startswith``
- wildcard  → ``*``/``?`` translated to an anchored regex → ``rlike``
- regexp    → ``rlike``
- fuzzy     → per-token Levenshtein ≤ max_edits (built-in ``levenshtein``
  inside an array ``exists`` over the whitespace tokens — ES's
  fuzziness=AUTO matches per analyzed term, not whole-field)
- score     → term-frequency proxy: occurrences of the term
  (``regexp_count``), the rank key ES's `_score` fills in the reference
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F


def ft_prefix(col: Column, term: str) -> Column:
    return col.startswith(term)


def _wildcard_to_regex(pat: str) -> str:
    out = []
    for ch in pat:
        if ch == "*":
            out.append(".*")
        elif ch == "?":
            out.append(".")
        else:
            out.append(re.escape(ch))
    return "^" + "".join(out) + "$"


def ft_wildcard(col: Column, pattern: str) -> Column:
    return col.rlike(_wildcard_to_regex(pattern))


def ft_regexp(col: Column, pattern: str) -> Column:
    return col.rlike(pattern)


def ft_fuzzy(col: Column, term: str, max_edits: int = 2) -> Column:
    """True when any whitespace token is within ``max_edits`` of ``term``.
    Levenshtein runs JVM-side; short-circuit on exact containment first so
    the common case never computes distances."""
    toks = F.split(col, r"\s+")
    return col.contains(term) | F.exists(
        toks, lambda w: F.levenshtein(w, F.lit(term)) <= max_edits)


def ft_score(col: Column, term: str) -> Column:
    """Relevance proxy: term frequency (count of occurrences)."""
    return F.regexp_count(col, F.lit(re.escape(term)))


def ft_bm25(df, term: str, text_col: str = "text", k1: float = 1.2,
            b: float = 0.75, out_col: str = "bm25"):
    """BM25 relevance column — the ES ``_score`` shape the reference's
    fulltext plugin returns (ESAdapter.h; Lucene's practical scoring is
    BM25 since ES 5), without the external service.

    score = idf · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl)), with
    Lucene's non-negative idf = ln(1 + (N − df + 0.5)/(df + 0.5)).

    Corpus statistics (N, df, avgdl) are one global aggregate joined back
    by a broadcast cross join — no driver collect, two passes total, and
    the stats frame is one row so the join is free at any scale. tf counts
    whole-token occurrences (word-boundary regex), matching ES's analyzed
    per-term frequency rather than substring hits.

    Returns *df* with ``out_col`` appended (0.0 where the term is absent).
    """
    tf = F.regexp_count(F.col(text_col),
                        F.lit(r"\b" + re.escape(term) + r"\b"))
    dl = F.size(F.split(F.col(text_col), r"\s+"))
    stats = df.agg(
        F.count(F.lit(1)).alias("_bm25_n"),
        F.avg(dl).alias("_bm25_avgdl"),
        F.sum((tf > 0).cast("long")).alias("_bm25_df"))
    scored = df.crossJoin(F.broadcast(stats))
    idf = F.log(F.lit(1.0)
                + (F.col("_bm25_n") - F.col("_bm25_df") + 0.5)
                / (F.col("_bm25_df") + 0.5))
    denom = tf + k1 * (1 - b + b * dl / F.col("_bm25_avgdl"))
    return (scored.withColumn(out_col, idf * tf * (k1 + 1) / denom)
            .drop("_bm25_n", "_bm25_avgdl", "_bm25_df"))


FULLTEXT_FUNCTIONS = {
    "ft_prefix": ft_prefix,
    "ft_wildcard": ft_wildcard,
    "ft_regexp": ft_regexp,
    "ft_fuzzy": ft_fuzzy,
    "ft_score": ft_score,
    "ft_bm25": ft_bm25,
}
