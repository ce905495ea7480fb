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


FULLTEXT_FUNCTIONS = {
    "ft_prefix": ft_prefix,
    "ft_wildcard": ft_wildcard,
    "ft_regexp": ft_regexp,
    "ft_fuzzy": ft_fuzzy,
    "ft_score": ft_score,
}
