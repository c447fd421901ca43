"""Time scalar functions (reference F1/F2, in_sql.rb:62, 91-92, 118-126).

All JVM-side built-ins — no UDFs — so they stay inside whole-stage codegen.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column
from pyspark.sql import functions as F

# Reference default time_format '%Y-%m-%d %H:%M:%S.%6N%z' (in_sql.rb:62):
# microsecond precision plus numeric zone.  Spark pattern equivalent:
REFERENCE_TIME_FORMAT = "yyyy-MM-dd HH:mm:ss.SSSSSSxx"


def format_event_time(col: Column | str, fmt: str = REFERENCE_TIME_FORMAT) -> Column:
    """F1: Time→string serialization cast (in_sql.rb:91-92).  With the
    session pinned to UTC the zone renders as ``+0000``, matching the
    reference's ``%z`` under TZ=UTC."""
    return F.date_format(col, fmt)


def lenient_to_timestamp(col: Column | str, now: Any | None = None) -> Column:
    """F2/T3: lenient parse with now-fallback (in_sql.rb:118-126).
    NULL or unparseable values become ``now`` (wall clock by default; pin a
    literal for deterministic replays/tests) — rows are never dropped."""
    c = F.col(col) if isinstance(col, str) else col
    now_expr = F.lit(now).cast("timestamp") if now is not None else F.current_timestamp()
    return F.coalesce(c.try_cast("timestamp"), now_expr)


def time_fallback_flag(col: Column | str) -> Column:
    """Companion to :func:`lenient_to_timestamp` — True where the fallback
    fired (the reference logs a warning there; we keep it queryable)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.try_cast("timestamp").isNull()


def safe_date_trunc(unit: str, col: Column | str) -> Column:
    """``date_trunc`` that NULLs results before year 1 CE.

    Spark happily computes year-0 timestamps (week/month truncation of a
    first-days-of-CE input underflows the proleptic calendar), but
    Python's ``datetime`` cannot represent year 0, so any
    collect()/toPandas boundary raises ``year 0 is out of range`` —
    a single dirty ancient timestamp would kill the job.  The guard
    (``year(t) >= 2``) evaluates JVM-side, so the bad value never
    crosses into Python; the row degrades to NULL like every other
    dirty-data path.  Year 1 is excluded too: PySpark's
    internal-micros→datetime conversion underflows on some year-1
    values even when the JVM value is valid (measured: 0001-01-01
    NTZ collects as "year 0 is out of range")."""
    t = F.date_trunc(unit, col)
    return F.when(F.year(t) >= 2, t)
