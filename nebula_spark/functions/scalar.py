"""The reference's scalar-function registry re-expressed as Column builders.

Reference: ``src/common/function/FunctionManager.cpp`` (3188 LoC; math at
:503-1100, string at :1100-1700, temporal/containers/casts after). Every
function maps to a JVM-side ``pyspark.sql.functions`` expression — zero
Python UDFs in this module, so all of these stay inside whole-stage codegen.

``FUNCTIONS`` maps the nebula-visible (lower-case) name to a builder taking
Column args; ``call(name, *args)`` is the dynamic entry the expression layer
uses. Null propagation follows Spark SQL semantics, which matches the
reference's NULL-in→NULL-out for these functions; the 8 typed null kinds
(``Value.h:37-46``) collapse to SQL NULL — documented deviation, the
engine-error kinds (DIV_BY_ZERO, BAD_TYPE) surface as NULL under
non-ANSI mode.
"""

from __future__ import annotations
import math

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

# test-harness logical clock: when set (seconds since epoch), now() and
# the TTL read filter evaluate against THIS instant instead of the real
# clock — the TCK runner advances it on explicit `wait N seconds` steps
# so second-granular TTL scenarios don't race per-statement latency.
# None (production) keeps the real clock.
NOW_OVERRIDE: list = [None]


def _now_col() -> Column:
    if NOW_OVERRIDE[0] is not None:
        return F.timestamp_seconds(F.lit(int(NOW_OVERRIDE[0])))
    return F.current_timestamp()




def _rand32(*_: Column) -> Column:
    return (F.rand() * (1 << 32) - (1 << 31)).cast("long")


def murmur64a(data: bytes, seed: int = 0xc70f6907) -> int:
    """MurmurHash64A — libstdc++'s std::hash<string> (_Hash_bytes), the
    reference's hash() for strings (FunctionManager.cpp:1707 →
    std::hash<nebula::Value>, Value.h:569-578). Returns the SIGNED
    64-bit value the reference's int64 cast produces; return.feature
    pins hash("Boris") == 9126854228122744212."""
    m, r, mask = 0xc6a4a7935bd1e995, 47, (1 << 64) - 1
    h = (seed ^ (len(data) * m)) & mask
    n = len(data) // 8
    for i in range(n):
        k = int.from_bytes(data[i * 8:(i + 1) * 8], "little")
        k = (k * m) & mask
        k ^= k >> r
        k = (k * m) & mask
        h = ((h ^ k) * m) & mask
    tail = data[n * 8:]
    if tail:
        h = ((h ^ int.from_bytes(tail, "little")) * m) & mask
    h ^= h >> r
    h = (h * m) & mask
    h ^= h >> r
    return h - (1 << 64) if h >= (1 << 63) else h


def _hash_batch(s: "pd.Series") -> "pd.Series":
    if pd.api.types.is_integer_dtype(s.dtype) \
            or pd.api.types.is_bool_dtype(s.dtype):
        return s.astype("int64")
    # Arrow delivers a NULLABLE long batch as float64 (NaN for NULL),
    # so a batch's dtype alone can't distinguish LONG-with-nulls from a
    # genuine double column. Restore integral floats to ints (identity
    # hash) and NaN to NULL; a non-integral double still hashes over its
    # string form (documented approximation of std::hash<double>).

    def one(v):
        if v is None or v is pd.NA or (isinstance(v, float) and v != v):
            return None
        if isinstance(v, int) and not isinstance(v, bool):
            return v
        if isinstance(v, float) and v.is_integer():
            return int(v)
        if isinstance(v, bytes):
            return murmur64a(v)
        return murmur64a(str(v).encode("utf-8"))
    return s.map(one).astype("Int64")


def _hash_double_batch(s: "pd.Series") -> "pd.Series":
    """std::hash<double> — libstdc++ hashes the 8 raw little-endian
    bytes with the SAME _Hash_bytes murmur as strings (verified:
    murmur64a(pack('<d', 123.0)) == -2256853663865737834, the
    yield.feature HashCall golden), with ±0.0 pinned to 0
    (_Hash_impl: `d != 0 ? hash(&d, 8) : 0`)."""
    import struct

    def one(v):
        if v is None or v is pd.NA or (isinstance(v, float) and v != v):
            # NaN: hash its bytes like libstdc++ does — but a NaN cell
            # in an Arrow float batch is indistinguishable from NULL,
            # so NULL wins (nullable-batch delivery)
            return None
        v = float(v)
        if v == 0.0:
            return 0
        return murmur64a(struct.pack("<d", v))
    return s.map(one).astype("Int64")


_HASH_UDF = None  # built lazily: pandas_udf needs an active SparkContext
_HASH_DBL_UDF = None


def hash_double(c: Column) -> Column:
    """hash() over a STATICALLY-double column — reference-exact
    std::hash<double>. The generic `_hash` cannot use this: Arrow
    delivers nullable LONG batches as float64, so only the caller's
    Spark-side type (ExprCompiler dispatch) can tell a true double."""
    global _HASH_DBL_UDF
    if _HASH_DBL_UDF is None:
        _HASH_DBL_UDF = pandas_udf(_hash_double_batch, "long")
    return _HASH_DBL_UDF(c)


def _hash(c: Column) -> Column:
    """Reference-exact hash() (std::hash<nebula::Value>, Value.h:569):
    integers hash to THEMSELVES (return.feature: hash(123) == 123);
    strings via MurmurHash64A seed 0xc70f6907 (libstdc++ _Hash_bytes —
    hash("Boris") == 9126854228122744212); everything else over the
    value's string form (documented approximation of Value::hash).
    Arrow-batched pandas_udf — hash() is a key-spelling scalar, not the
    bulk-dedup path (pipelines use F.xxhash64 internally)."""
    global _HASH_UDF
    if _HASH_UDF is None:
        _HASH_UDF = pandas_udf(_hash_batch, "long")
    return _HASH_UDF(c)


def _json_extract(c: Column) -> Column:
    return F.from_json(c, "map<string,string>")


ROUND_MODES = ("up", "down", "ceiling", "floor",
               "half_up", "half_down", "half_even")


def round_mode(v: Column, n: Column, mode: str = "half_up") -> Column:
    """``round(x, decimal[, mode])`` with the reference's seven modes
    (FunctionManager.cpp:593-668). The reference computes in scaled
    doubles (``val * 10^decimal``) and so do we — including its
    ``modf``-fraction comparisons for the half_* modes — so literal
    cases round identically (e.g. ``-1.35 * 10`` snaps to exactly
    ``-13.5`` in IEEE754, making half_up(-1.35, 1) = -1.4 in both).
    Unknown mode → BAD_TYPE, normalized to NULL."""
    f = F.pow(F.lit(10.0), n)
    vf = v.cast("double") * f
    absf = F.abs(vf)
    frac = absf - F.floor(absf)       # |modf fraction| of vf
    m = mode.lower()
    if m == "up":                     # away from zero
        out = F.signum(vf) * F.ceil(absf)
    elif m == "down":                 # toward zero (truncate)
        out = F.signum(vf) * F.floor(absf)
    elif m == "ceiling":
        out = F.ceil(vf)
    elif m == "floor":
        out = F.floor(vf)
    elif m == "half_up":              # std::round — half away from zero
        out = F.signum(vf) * F.floor(absf + F.lit(0.5))
    elif m == "half_down":
        ceil_cond = (((frac <= 0.5) & (v < 0)) | ((frac > 0.5) & (v > 0)))
        out = F.when(ceil_cond, F.ceil(vf)).otherwise(F.floor(vf))
    elif m == "half_even":
        # the reference's exact predicate, fmod and all
        ceil_cond = (((frac == 0.5) & ((vf - 0.5) % 2.0 == 1.0))
                     | ((frac > 0.5) & (v > 0))
                     | ((frac < 0.5) & (v < 0)))
        out = F.when(ceil_cond, F.ceil(vf)).otherwise(F.floor(vf))
    else:
        return F.lit(None).cast("double")
    return out.cast("double") / f


def _left(c: Column, n: Column) -> Column:
    return F.substring(c, 1, n)


def _right(c: Column, n: Column) -> Column:
    return F.substring(c, -n, n)


def _strcasecmp(a: Column, b: Column) -> Column:
    la, lb = F.lower(a), F.lower(b)
    return F.when(la == lb, 0).when(la < lb, -1).otherwise(1)


def _range(a: Column, b: Column, *step: Column) -> Column:
    return F.sequence(a, b, *step)


def _head(c: Column) -> Column:
    return F.element_at(c, 1)


def _last(c: Column) -> Column:
    return F.element_at(c, -1)


def _tail(c: Column) -> Column:
    return F.slice(c, 2, F.greatest(F.size(c) - 1, F.lit(0)))


FUNCTIONS: dict[str, object] = {
    # math (FunctionManager.cpp:503-1100)
    "abs": F.abs, "floor": F.floor, "ceil": F.ceil, "round": F.round,
    "sqrt": F.sqrt, "cbrt": F.cbrt, "hypot": F.hypot, "pow": F.pow,
    "exp": F.exp, "exp2": lambda c: F.pow(F.lit(2.0), c),
    "log": F.log, "log2": F.log2, "log10": F.log10,
    "sin": F.sin, "asin": F.asin, "cos": F.cos, "acos": F.acos,
    "tan": F.tan, "atan": F.atan, "radians": F.radians,
    "sign": F.signum, "rand": F.rand, "rand32": _rand32,
    "rand64": lambda: F.xxhash64(F.rand()),
    # uuid() is a random int64 in the reference (UUIDExpression,
    # parser.yy:1157) — not an RFC UUID string
    "uuid": lambda: F.xxhash64(F.rand()),
    "e": lambda: F.lit(math.e), "pi": lambda: F.lit(math.pi),
    "bit_and": lambda a, b: a.bitwiseAND(b),
    "bit_or": lambda a, b: a.bitwiseOR(b),
    "bit_xor": lambda a, b: a.bitwiseXOR(b),
    # string (FunctionManager.cpp:1100-1700)
    "lower": F.lower, "tolower": F.lower, "upper": F.upper,
    "toupper": F.upper, "length": F.length, "trim": F.trim,
    "ltrim": F.ltrim, "rtrim": F.rtrim, "left": _left, "right": _right,
    "lpad": F.lpad, "rpad": F.rpad, "substr": F.substring,
    "substring": F.substring, "reverse": F.reverse,
    "replace": F.regexp_replace, "split": F.split, "concat": F.concat,
    # concat_ws takes a Column separator here (PySpark's helper wants a
    # Python string) — call the SQL function directly; bare Python
    # strings are literal separators, not column names
    "concat_ws": lambda *cs: F.call_function(
        "concat_ws", *[c if isinstance(c, Column) else F.lit(c)
                       for c in cs]),
    "strcasecmp": _strcasecmp, "hash": _hash,
    "md5": F.md5, "json_extract": _json_extract,
    # temporal
    "now": lambda: _now_col(), "timestamp": F.to_timestamp,
    "date": F.to_date, "datetime": F.to_timestamp,
    # reference extract() is regex-match-all (FunctionManager.cpp
    # "extract": std::regex iteration over the haystack;
    # FunctionCall.feature "extract") — temporal field extraction is
    # attribute access (.year), NOT this function
    "extract": lambda s, pat: F.regexp_extract_all(s, pat, F.lit(0)),
    # containers
    "size": F.size, "range": _range, "head": _head, "last": _last,
    "tail": _tail, "keys": F.map_keys, "coalesce": F.coalesce,
    "erase": F.array_remove, "setadd": lambda s, v: F.array_union(s, F.array(v)),
    "toset": F.array_distinct,
    # FunctionManager cos_similarity (container family) — shared with the
    # ANN pipeline implementation
    "cos_similarity": None,  # bound below (avoids circular import at top)
    # casts
    "toboolean": lambda c: c.cast("boolean"),
    "tofloat": lambda c: c.cast("double"),
    "tointeger": lambda c: c.cast("long"),
    "tostring": lambda c: c.cast("string"),
}

# geo / temporal / fulltext families register into the same namespace
# (FunctionManager keeps one flat registry too — FunctionManager.cpp:503)
from nebula_spark.functions.fulltext import FULLTEXT_FUNCTIONS as _FT  # noqa: E402
from nebula_spark.functions.geo import GEO_FUNCTIONS as _GEO  # noqa: E402
from nebula_spark.functions.temporal import TEMPORAL_FUNCTIONS as _TMP  # noqa: E402

FUNCTIONS.update(_GEO)
FUNCTIONS.update(_TMP)
FUNCTIONS.update(_FT)

from nebula_spark.functions.graphfns import cos_similarity as _cos  # noqa: E402

FUNCTIONS["cos_similarity"] = _cos


def call(name: str, *args: Column) -> Column:
    """Dynamic dispatch by nebula function name (case-insensitive),
    mirroring FunctionManager::get."""
    fn = FUNCTIONS.get(name.lower())
    if fn is None:
        raise ValueError(f"unknown function: {name}")
    return fn(*args)
