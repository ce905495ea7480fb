"""Graph spaces: the meta-service surface, Spark-first.

The reference keeps spaces / tag schemas / edge-type schemas / TTL in a
Raft-replicated meta service (``src/meta/``, schema thrift at
``src/interface/meta.thrift:71-96``; TTL at ``meta.thrift:87-91``). Here a
*space* is a named collection of tag tables and edge-type tables, each backed
by a Parquet path (or an in-memory DataFrame in tests), each with a declared
``StructType``. Partitioning (``partition_num`` in the reference's SpaceDesc,
``meta.thrift:108``) maps to how the parquet is bucketed/repartitioned:
vertices by ``_vid``, edges by ``_src`` — the Spark analog of the reference's
key layout where all out-edges of a vertex are physically contiguous
(``src/common/utils/NebulaKeyUtils.h:13-27``).

TTL parity: the reference filters expired rows at read time and purges them
in compaction (``src/storage/CompactionFilter.h:76-131``). We apply the same
read-time filter ``ttl_col + ttl_duration >= now()`` in :meth:`GraphSpace.tag`
/ :meth:`GraphSpace.edge`; the "compaction" analog is rewriting the parquet.
"""

from __future__ import annotations

import threading
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# ALL key columns are namespaced with a leading underscore (the
# reference's own pseudo-prop spellings: `GO … YIELD E._src, E._dst,
# E._rank`) so USER properties named `vid`/`src`/`dst`/`rank` — legal in
# the reference, whose keys live outside the row payload entirely
# (src/common/utils/NebulaKeyUtils.h:13-27) — never collide with keys.
# Leading-underscore identifiers are unspellable as prop names in the
# reference's lexer (scanner.lex LABEL = [a-zA-Z][_a-zA-Z0-9]*), and
# CREATE refuses them here too, so the `_`-prefix namespace is key-only.
# `rank` was namespaced in round 7; `vid`/`src`/`dst` in round 8.
VID = "_vid"
SRC = "_src"
DST = "_dst"
RANK = "_rank"

# Legacy spellings accepted from programmatic ``df=`` handles (pre-r8
# fixtures and external frames built with bare key names); normalized to
# the namespaced keys at load time when the namespaced column is absent.
# (`rank` is NOT in the edge map: user props named rank are legal since
# r7, so a bare `rank` column in a handed-in frame is a user prop.)
_LEGACY_TAG_KEYS = {"vid": VID}
_LEGACY_EDGE_KEYS = {"src": SRC, "dst": DST}


@dataclass
class TagDef:
    """A vertex tag: ``_vid`` key + typed property columns.

    Multi-tag vertices (``src/common/datatypes/Vertex.h:62-70``) fall out of
    the model: the same vid may appear in several tag tables; the full vertex
    is the outer join of its tag rows on ``_vid``.
    """

    name: str
    path: str | None = None
    df: DataFrame | None = None
    ttl_col: str | None = None
    ttl_duration: int = 0  # seconds
    decl: list | None = None   # declared (reference) types, for SHOW CREATE
    defaults: dict | None = None  # DDL DEFAULT exprs, applied at INSERT
    required: list | None = None  # NOT NULL columns (DDL nullability)
    comments: dict | None = None  # per-column COMMENT text (DESC)
    schema_comment: str | None = None  # COMMENT = "…" (SHOW CREATE)


@dataclass
class EdgeDef:
    """An edge type: ``(_src, _dst, _rank)`` key + typed property columns.

    All three keys are underscore-namespaced so user props named
    ``src``/``dst``/``rank`` never collide (the reference keeps keys in a
    separate namespace, ``NebulaKeyUtils.h:13-27``); ``_rank`` discriminates parallel edges
    (``src/common/datatypes/Edge.h:16-23``) and is part of edge identity
    everywhere (joins, path-uniqueness filters).
    """

    name: str
    path: str | None = None
    df: DataFrame | None = None
    ttl_col: str | None = None
    ttl_duration: int = 0
    decl: list | None = None   # declared (reference) types, for SHOW CREATE
    defaults: dict | None = None  # DDL DEFAULT exprs, applied at INSERT
    required: list | None = None  # NOT NULL columns (DDL nullability)
    comments: dict | None = None  # per-column COMMENT text (DESC)
    schema_comment: str | None = None  # COMMENT = "…" (SHOW CREATE)


@dataclass
class GraphSpace:
    """A namespace of tag + edge-type tables (reference: graph space)."""

    spark: SparkSession
    name: str
    tags: dict[str, TagDef] = field(default_factory=dict)
    edges: dict[str, EdgeDef] = field(default_factory=dict)
    # CREATE TAG/EDGE INDEX metadata ({name: IndexDef}) — kept for the
    # SHOW/DESCRIBE INDEX lifecycle even though scans ride Parquet
    # stats + Catalyst pushdown rather than secondary indexes
    indexes: dict = field(default_factory=dict)
    # per-space mutation mutex: DML's read-modify-swap and DDL registry
    # writes serialize driver-side (the analog of the reference's
    # per-part raft log serializing writers, RaftPart.cpp). Readers
    # never take it — an in-flight DataFrame is an immutable snapshot,
    # so reads behave MVCC-style (see tests/test_concurrency.py
    # shared-space DML races for the pinned semantics)
    _mutex: object = field(default_factory=threading.RLock,
                           repr=False, compare=False)

    # -- DDL ---------------------------------------------------------------
    def create_tag(self, name: str, *, path: str | None = None,
                   df: DataFrame | None = None, ttl_col: str | None = None,
                   ttl_duration: int = 0, decl: list | None = None,
                   defaults: dict | None = None,
                   required: list | None = None,
                   comments: dict | None = None,
                   schema_comment: str | None = None) -> TagDef:
        tag = TagDef(name, path, df, ttl_col, ttl_duration, decl, defaults,
                     required, comments, schema_comment)
        self.tags[name] = tag
        return tag

    def create_edge(self, name: str, *, path: str | None = None,
                    df: DataFrame | None = None, ttl_col: str | None = None,
                    ttl_duration: int = 0, decl: list | None = None,
                    defaults: dict | None = None,
                    required: list | None = None,
                    comments: dict | None = None,
                    schema_comment: str | None = None) -> EdgeDef:
        edge = EdgeDef(name, path, df, ttl_col, ttl_duration, decl,
                       defaults, required, comments, schema_comment)
        self.edges[name] = edge
        return edge

    def drop_tag(self, name: str) -> None:
        self.tags.pop(name, None)

    def drop_edge(self, name: str) -> None:
        self.edges.pop(name, None)

    # -- reads -------------------------------------------------------------
    def _load(self, d: TagDef | EdgeDef) -> DataFrame:
        df = d.df if d.df is not None else self.spark.read.parquet(d.path)
        # normalize legacy bare key names (vid/src/dst) from handed-in
        # frames to the namespaced key columns — only when the namespaced
        # column is absent, so user PROPS with those names (which the
        # namespacing exists to permit) pass through untouched
        legacy = _LEGACY_TAG_KEYS if isinstance(d, TagDef) \
            else _LEGACY_EDGE_KEYS
        for old, new in legacy.items():
            if new not in df.columns and old in df.columns:
                df = df.withColumnRenamed(old, new)
        if d.ttl_col and d.ttl_duration > 0:
            # read-time TTL filter (CompactionFilter.h:76-131 parity):
            # expired when ttl_col + ttl_duration <= now. Evaluated as
            # now − col < duration so an INT64_MAX duration (TTL2.feature
            # "never expires") cannot overflow; the col is epoch seconds
            # (int64 or timestamp — both legal ttl types), and a NULL
            # ttl value never expires (the filter can't evaluate → keep)
            c = F.col(d.ttl_col)
            dt = dict(df.dtypes).get(d.ttl_col, "")
            epoch = F.unix_timestamp(c) if dt.startswith("timestamp") \
                else c.cast("bigint")
            # NOW_OVERRIDE, when a harness pins it (the TCK runner's
            # `wait N seconds` steps), freezes the read clock between
            # waits so sub-5s TTL scenarios don't race statement
            # latency; unset (production) reads use the real clock
            from nebula_spark.functions.scalar import NOW_OVERRIDE
            now_col = F.lit(int(NOW_OVERRIDE[0])) \
                if NOW_OVERRIDE[0] is not None \
                else F.unix_timestamp(F.current_timestamp())
            age = now_col - epoch
            # the reference's expiration ALSO fires when col + duration
            # overflows int64 (a pinned upstream bug — TTL2.feature "ttl
            # expire" expects EMPTY for ttl_duration=INT64_MAX with the
            # correct rows commented out under a TODO)
            thr = (2**63 - 1) - d.ttl_duration
            df = df.filter(c.isNull() | ((age < F.lit(d.ttl_duration))
                                         & (epoch <= F.lit(thr))))
        return df

    def tag(self, name: str) -> DataFrame:
        """Tag table: ``_vid`` + props. Catalyst prunes columns / pushes filters."""
        return self._load(self.tags[name])

    def edge(self, name: str) -> DataFrame:
        """Edge table: ``_src, _dst, _rank`` + props."""
        return self._load(self.edges[name])

    # -- admin / meta surface (SURVEY.md §2.12) ----------------------------
    def show_tags(self) -> list[str]:
        """SHOW TAGS (ShowTagsExecutor analog)."""
        return sorted(self.tags)

    def show_edges(self) -> list[str]:
        """SHOW EDGES."""
        return sorted(self.edges)

    def describe(self, name: str) -> list[tuple[str, str, bool]]:
        """DESC TAG/EDGE: (field, type, nullable) rows from the actual
        DataFrame schema — the meta-thrift column defs collapse into
        StructType (meta.thrift:79-85)."""
        d = self.tags.get(name) or self.edges.get(name)
        if d is None:
            raise KeyError(f"no tag or edge named {name!r}")
        df = self._load(d)
        return [(f.name, f.dataType.simpleString(), f.nullable)
                for f in df.schema.fields]

    def show_stats(self, refresh: bool = False) -> DataFrame:
        """SUBMIT JOB STATS / SHOW STATS (ShowStatsExecutor.cpp analog):
        row counts per tag/edge plus space totals. Counts are computed on
        demand and cached on the space (the reference also materializes
        stats via an explicit job, not per-query)."""
        if refresh or not hasattr(self, "_stats"):
            rows = []
            for n in sorted(self.tags):
                rows.append(("tag", n, self.tag(n).count()))
            for n in sorted(self.edges):
                rows.append(("edge", n, self.edge(n).count()))
            rows.append(("space", "vertices",
                         sum(c for k, _, c in rows if k == "tag")))
            rows.append(("space", "edges",
                         sum(c for k, _, c in rows if k == "edge")))
            self._stats = rows
        return self.spark.createDataFrame(self._stats,
                                          ["kind", "name", "count"])

    def vertex(self, vids_or_df, tags: list[str] | None = None) -> DataFrame:
        """Assemble full vertices (all requested tags) for a vid set.

        Reference: GetVertices (``GetVerticesExecutor.cpp:1-72``) — fetch tag
        props for given vids. Here: left joins of the vid set against each tag
        table; small vid sets broadcast automatically under AQE.
        """
        if isinstance(vids_or_df, DataFrame):
            if VID not in vids_or_df.columns and "vid" in vids_or_df.columns:
                vids_or_df = vids_or_df.withColumnRenamed("vid", VID)
            base = vids_or_df.select(VID).distinct()
        else:
            base = self.spark.createDataFrame([(v,) for v in vids_or_df], [VID])
        for t in tags or list(self.tags):
            tdf = self.tag(t)
            props = [c for c in tdf.columns if c != VID]
            renamed = tdf.select(
                F.col(VID), *[F.col(c).alias(f"{t}_{c}") for c in props]
            )
            base = base.join(renamed, VID, "left")
        return base


# ---------------------------------------------------------------------------
# TPC-H relational overlay (FIXTURES.md "Relational overlay"): view the
# driver's synthetic star schema as a property graph so every traversal
# operator is exercisable against the DuckDB oracle.
# ---------------------------------------------------------------------------

_TABLE_CACHE: dict[tuple[int, str, str], DataFrame] = {}


@dataclass
class SpaceCatalog:
    """The meta-service's space registry + the session's current space —
    what makes reference scripts (every TCK file opens with ``USE nba;``)
    run verbatim through ``execute()``.

    Reference: spaces live in the meta service (``SpaceDesc``,
    ``src/interface/meta.thrift:108``); ``USE`` binds one to the session
    (``parser.yy:2431`` use_sentence); statements validated without one
    fail "Space was not chosen." (``src/graph/validator/
    Validator.cpp:355``) — the same error this raises.
    """

    spark: SparkSession
    spaces: dict[str, GraphSpace] = field(default_factory=dict)
    current_name: str | None = None

    @classmethod
    def wrap(cls, space: GraphSpace) -> "SpaceCatalog":
        """An ephemeral catalog around one space, pre-chosen — keeps the
        single-space ``execute(space, …)`` call form working, including
        scripts that open with ``USE <that space's name>``."""
        return cls(space.spark, {space.name: space}, space.name)

    def create_space(self, name: str, *, options: dict | None = None,
                     if_not_exists: bool = False,
                     as_space: str | None = None) -> GraphSpace:
        """CREATE SPACE (``parser.yy:3633``): vid_type/partition_num/
        replica_factor become metadata — partitioning is how the backing
        parquet is bucketed, replication is the storage layer's job.

        ``as_space`` implements CREATE SPACE x AS y (CreateSpaceAs
        .feature): tag/edge defs copy (sharing the immutable source
        DataFrames — later mutations rebind only the clone's defs) and
        options inherit."""
        if name in self.spaces:
            if if_not_exists:
                return self.spaces[name]
            raise ValueError(f"Existed space {name!r}!")
        sp = GraphSpace(self.spark, name)
        if as_space is not None:
            from dataclasses import replace
            if as_space not in self.spaces:
                raise KeyError(f"SpaceNotFound: {as_space!r}")
            src = self.spaces[as_space]
            sp.tags = {n: replace(d) for n, d in src.tags.items()}
            sp.edges = {n: replace(d) for n, d in src.edges.items()}
            sp.options = dict(getattr(src, "options", None) or {})
        else:
            sp.options = dict(options or {})
        self.spaces[name] = sp
        return sp

    def drop_space(self, name: str, if_exists: bool = False) -> None:
        if name not in self.spaces:
            if if_exists:
                return
            raise KeyError(f"no space named {name!r}")
        del self.spaces[name]
        if self.current_name == name:
            self.current_name = None

    def use(self, name: str) -> GraphSpace:
        if name not in self.spaces:
            raise KeyError(f"SpaceNotFound: {name!r}")
        self.current_name = name
        return self.spaces[name]

    def current(self) -> GraphSpace:
        if self.current_name is None:
            raise ValueError("Space was not chosen.")
        return self.spaces[self.current_name]

    def show_spaces(self) -> list[str]:
        return sorted(self.spaces)


def load_tables(spark: SparkSession, sf_dir: str,
                names: tuple[str, ...] = ("region", "nation", "customer",
                                          "supplier", "part", "orders",
                                          "lineitem", "events", "documents",
                                          "embeddings")) -> dict[str, DataFrame]:
    """Memoized per (session, dir, table): parquet footer/schema reads are
    driver latency; the DataFrame handle itself is immutable metadata."""
    # The driver's events.parquet carries TIMESTAMP(NANOS), which Spark
    # refuses by default (PARQUET_TYPE_ILLEGAL). The conf is runtime-settable,
    # so set it on the *caller's* session — sessions built outside
    # nebula_spark.session.get_spark (e.g. an external harness) must work too.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    out = {}
    for n in names:
        key = (id(spark), sf_dir, n)
        df = _TABLE_CACHE.get(key)
        if df is None:
            df = spark.read.parquet(f"{sf_dir}/{n}.parquet")
            if n == "events" and dict(df.dtypes).get("ts") == "bigint":
                # TIMESTAMP(NANOS) read via nanosAsLong; ns div 1000 must be
                # integer division — ns-since-epoch exceeds double precision
                df = df.withColumn("ts",
                                   F.timestamp_micros(F.expr("ts div 1000")))
            _TABLE_CACHE[key] = df
        out[n] = df
    return out


_SPACE_CACHE: dict[tuple[int, str], "GraphSpace"] = {}


def tpch_space(spark: SparkSession, sf_dir: str) -> GraphSpace:
    """Build the FIXTURES.md graph overlay over /root/testdata parquet.

    v_customer/v_supplier/v_part/v_nation/v_region as tags;
    e_placed (customer→order), e_contains (order→part, rank=l_linenumber),
    e_located_in (customer|supplier→nation), e_member_of (nation→region).

    Memoized per (session, dir): the overlay is pure metadata (lazy
    DataFrames), and re-reading seven parquet footers per query is driver
    latency the reference's cached MetaClient doesn't pay either.
    """
    key = (id(spark), sf_dir)
    hit = _SPACE_CACHE.get(key)
    if hit is not None:
        return hit
    t = load_tables(spark, sf_dir, ("region", "nation", "customer",
                                    "supplier", "part", "orders", "lineitem"))
    sp = GraphSpace(spark, f"tpch:{sf_dir}")

    # every tag also stores its id as a USER prop named `vid` — legal now
    # that keys are namespaced (`_vid`), and what reference schemas with
    # id-valued props look like; nGQL slots reference it (`customer.vid`)
    sp.create_tag("customer", df=t["customer"].select(
        F.col("c_custkey").alias(VID), F.col("c_custkey").alias("vid"),
        "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"))
    sp.create_tag("supplier", df=t["supplier"].select(
        F.col("s_suppkey").alias(VID), F.col("s_suppkey").alias("vid"),
        "s_name", "s_nationkey", "s_acctbal"))
    sp.create_tag("part", df=t["part"].select(
        F.col("p_partkey").alias(VID), F.col("p_partkey").alias("vid"),
        "p_name", "p_brand", "p_type", "p_size", "p_retailprice"))
    sp.create_tag("nation", df=t["nation"].select(
        F.col("n_nationkey").cast("long").alias(VID),
        F.col("n_nationkey").cast("long").alias("vid"),
        "n_name", "n_regionkey"))
    sp.create_tag("region", df=t["region"].select(
        F.col("r_regionkey").cast("long").alias(VID),
        F.col("r_regionkey").cast("long").alias("vid"), "r_name"))
    sp.create_tag("order", df=t["orders"].select(
        F.col("o_orderkey").alias(VID), F.col("o_orderkey").alias("vid"),
        "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority"))

    sp.create_edge("placed", df=t["orders"].select(
        F.col("o_custkey").alias(SRC), F.col("o_orderkey").alias(DST),
        F.lit(0).cast("long").alias(RANK), "o_totalprice", "o_orderdate"))
    sp.create_edge("contains", df=t["lineitem"].select(
        F.col("l_orderkey").alias(SRC), F.col("l_partkey").alias(DST),
        F.col("l_linenumber").cast("long").alias(RANK), "l_quantity",
        "l_extendedprice", "l_discount", "l_shipdate"))
    sp.create_edge("located_in", df=t["customer"].select(
        F.col("c_custkey").alias(SRC),
        F.col("c_nationkey").cast("long").alias(DST),
        F.lit(0).cast("long").alias(RANK)))
    sp.create_edge("member_of", df=t["nation"].select(
        F.col("n_nationkey").cast("long").alias(SRC),
        F.col("n_regionkey").cast("long").alias(DST),
        F.lit(0).cast("long").alias(RANK)))
    _SPACE_CACHE[key] = sp
    return sp
