"""Temporal functions (SURVEY.md §2.9 temporal; reference
``src/common/datatypes/Date.h:38,115,182``, ``Duration.h:20``, temporal
registrations in ``src/common/function/FunctionManager.cpp``).

Type mapping per SURVEY §1.1: DATE → DateType, DATETIME →
TimestampNTZType, TIME → struct(hour, minute, sec, microsec) (no Spark
TIME type), DURATION → struct(months, seconds, microseconds) — the
reference's Duration is exactly (months, seconds, µs), deliberately NOT
normalized (1 month ≠ fixed seconds), so CalendarInterval semantics are
reproduced by applying months via add_months and seconds separately.
All builders are JVM-side Columns.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


# -- constructors ----------------------------------------------------------

def d_date(s: Column | None = None) -> Column:
    """date("2020-01-02") / date(datetime); zero-arg date() is the
    current UTC date (FunctionManager date — CompareDate.feature)."""
    if s is None:
        return F.current_date()
    return F.to_date(s)


_OFFSET_RE = r"(Z|[+-]\d{2}:?\d{2})$"


def _tz_parts(s: Column) -> tuple[Column, Column, Column]:
    """Split a temporal literal into (base text, utc offset text, zone
    name): ``23:01:00.010000+08:00[Asia/Shanghai]`` → ("23:01:00.010000",
    "+08:00", "Asia/Shanghai") (TimeUtils parse — offsets and bracketed
    IANA names, InsertWithTimeType.feature)."""
    zone = F.regexp_extract(s, r"\[([^\]]+)\]", 1)
    nob = F.regexp_replace(s, r"\[[^\]]+\]", "")
    off = F.regexp_extract(nob, _OFFSET_RE, 1)
    base = F.regexp_replace(nob, _OFFSET_RE, "")
    return base, off, zone


def _utc_ts(base: Column, off: Column, zone: Column,
            prefix: Column | None = None) -> Column:
    """Base text (+offset and/or zone) → UTC TimestampNTZ. A mismatched
    offset-and-zone pair yields NULL (the INSERT path phrases it as the
    reference's "Wrong value type" error)."""
    txt = F.concat(prefix, base) if prefix is not None else base
    ntz = F.to_timestamp_ntz(txt)
    by_off = F.to_timestamp(F.concat(txt, off)).cast("timestamp_ntz")
    by_zone = F.convert_timezone(zone, F.lit("UTC"), ntz)
    has_off, has_zone = off != "", zone != ""
    return (F.when(has_off & has_zone,
                   F.when(by_off == by_zone, by_off))
            .when(has_off, by_off)
            .when(has_zone, by_zone)
            .otherwise(ntz))


def d_datetime(s: Column | None = None) -> Column:
    """datetime(...) → TimestampNTZ (UTC); zero-arg = now. Accepts UTC
    offsets and bracketed zone names (InsertWithTimeType.feature)."""
    if s is None:
        return F.localtimestamp()
    base, off, zone = _tz_parts(s)
    return F.when((off != "") | (zone != ""),
                  _utc_ts(base, off, zone)) \
            .otherwise(F.to_timestamp_ntz(s))


def d_time(s: Column | None = None) -> Column:
    """time("10:20:30") → struct(hour,minute,sec) — TIME has no Spark
    type (SURVEY §1.1); struct compares correctly field-by-field.
    Zero-arg = current time of day. Offsets/zone names convert to UTC
    wall time (wrapping at 24h)."""
    if s is None:
        now = F.localtimestamp()
        return F.struct(F.hour(now).alias("hour"),
                        F.minute(now).alias("minute"),
                        F.second(now).cast("double").alias("sec"))
    base, off, zone = _tz_parts(s)
    p = F.split(base, ":")
    plain = F.struct(p[0].try_cast("int").alias("hour"),
                     p[1].try_cast("int").alias("minute"),
                     p[2].try_cast("double").alias("sec"))
    ts = _utc_ts(base, off, zone, prefix=F.lit("1970-01-01T"))
    frac = p[2].try_cast("double") - F.floor(p[2].try_cast("double"))
    shifted = F.struct(
        F.hour(ts).alias("hour"), F.minute(ts).alias("minute"),
        (F.second(ts) + frac).alias("sec"))
    return F.when((off != "") | (zone != ""),
                  F.when(ts.isNotNull(), shifted)).otherwise(plain)


def d_timestamp(s: Column | None = None) -> Column:
    """timestamp(...) → seconds since epoch (reference Timestamp = int64).
    Zero-arg = now (TimeUtils::utcTimestamp — InsertEdgeOnDiffParts
    .feature's `default timestamp()`)."""
    if s is None:
        from nebula_spark.functions.scalar import _now_col
        return F.unix_timestamp(_now_col())
    return F.unix_timestamp(F.to_timestamp(s))


def duration(months: int = 0, days: int = 0, hours: int = 0,
             minutes: int = 0, seconds: int = 0) -> Column:
    """duration({months:…, days:…, …}) → struct(months, seconds)
    (Duration.h:20 — months kept separate from seconds, unnormalized)."""
    secs = ((days * 24 + hours) * 60 + minutes) * 60 + seconds
    return F.struct(F.lit(months).alias("months"),
                    F.lit(secs).cast("long").alias("seconds"))


# -- arithmetic ------------------------------------------------------------

def datetime_plus(ts: Column, dur: Column) -> Column:
    """datetime + duration: months via add_months (calendar-aware), then
    seconds — the reference's two-component application order."""
    with_months = F.timestamp_add("MONTH", dur["months"], ts)
    return F.timestamp_add("SECOND", dur["seconds"], with_months)


def datetime_minus(ts: Column, dur: Column) -> Column:
    with_months = F.timestamp_add("MONTH", -dur["months"], ts)
    return F.timestamp_add("SECOND", -dur["seconds"], with_months)


def date_diff_days(a: Column, b: Column) -> Column:
    return F.datediff(a, b)


def time_plus(t: Column, dur: Column) -> Column:
    """TIME + duration (Date.h:115 Time arithmetic): only the seconds
    component applies (TIME has no date part for months to act on); wraps
    mod 24 h. Returns the same struct(hour, minute, sec) convention."""
    total = F.pmod(t["hour"].cast("long") * 3600
                   + t["minute"].cast("long") * 60
                   + t["sec"] + dur["seconds"], F.lit(86400))
    return F.struct(
        F.floor(total / 3600).cast("int").alias("hour"),
        F.floor(total % 3600 / 60).cast("int").alias("minute"),
        (total % 60).alias("sec"))


def time_minus(t: Column, dur: Column) -> Column:
    """TIME - duration, wrapping mod 24 h like the reference."""
    neg = F.struct(dur["months"].alias("months"),
                   (-dur["seconds"]).alias("seconds"))
    return time_plus(t, neg)


# -- component extraction (kAttribute on DATE/DATETIME, and extract()) -----

COMPONENTS = {
    "year": F.year, "month": F.month, "day": F.day,
    "quarter": F.quarter, "week": F.weekofyear, "dayofweek": F.dayofweek,
    "hour": F.hour, "minute": F.minute, "second": F.second,
}


def extract(field: str, src: Column) -> Column:
    """extract(unit FROM temporal) — unit names per the reference's
    extract() (year/month/day/hour/minute/second + week/quarter)."""
    fn = COMPONENTS.get(field.lower())
    if fn is None:
        raise ValueError(f"extract: unsupported field {field!r}")
    return fn(src)


TEMPORAL_FUNCTIONS = {
    "date": d_date,
    "datetime": d_datetime,
    "time": d_time,
    "timestamp": d_timestamp,
    "year": F.year, "month": F.month, "day": F.day,
    "quarter": F.quarter, "week": F.weekofyear,
    "hour": F.hour, "minute": F.minute, "second": F.second,
    "datediff": date_diff_days,
}
