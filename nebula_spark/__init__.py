"""nebula_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of vesoft-inc/nebula (NebulaGraph).

The reference is a distributed property-graph database (graphd/metad/storaged,
C++). This package re-expresses the same query surface — GO / FETCH / LOOKUP /
FIND PATH / GET SUBGRAPH / MATCH-style traversal, plus the full relational
operator inventory (SURVEY.md §2) — as idiomatic PySpark: one DataFrame per
tag and per edge type, traversal hops as joins, iterative algorithms as
Python loops over persisted frontiers, everything else delegated to
Catalyst/Tungsten.

Layout:
- ``session``    SparkSession factory with scale-oriented defaults
- ``catalog``    graph spaces: tag/edge-type schemas over Parquet/Delta
- ``graph``      PropertyGraph: the vertices/edges DataFrame bundle
- ``operators``  the §2 operator inventory (traversal, joins, agg, paths, …)
- ``functions``  the scalar function surface (FunctionManager parity)
- ``pipeline``   large-scale training-data ops (dedup, similarity, text, multimodal)
- ``streaming``  Structured Streaming ingestion into graph tables
"""

__version__ = "0.1.0"

from nebula_spark.session import get_spark  # noqa: F401
