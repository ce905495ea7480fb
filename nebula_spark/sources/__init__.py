"""Sources & sinks (SURVEY.md §2.1): DDL schema parsing, CSV/JSON/parquet
vertex+edge import, scale-layout sinks."""

from nebula_spark.sources.ddl import parse_ddl  # noqa: F401
from nebula_spark.sources.importer import (  # noqa: F401
    load_space_from_config, read_edge_csv, read_vertex_csv,
)
from nebula_spark.sources.sink import write_edges, write_tag  # noqa: F401
