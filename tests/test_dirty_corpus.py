"""Registry-wide dirty-data sweep (VERDICT r7 #6): every registered
query must SURVIVE an adversarial corpus — NULL keys, empty strings and
arrays, zero-norm vectors, NaN/Inf, extreme timestamps — without
raising.  The round-7 job-killer (one zero-norm embedding →
DIVIDE_BY_ZERO) is exactly this class of bug; the codec surface already
has a fuzzed never-raise contract, this extends it to the SQL surface.

Wrong-but-deterministic results on garbage rows are acceptable; an
exception that would kill a 1000-executor job is not.
"""

from __future__ import annotations

import datetime
import math

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    DateType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    TimestampNTZType,
    TimestampType,
)

from fluent_plugin_sql_spark.io import load_table

SF_SRC = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem "
    "events documents embeddings"
).split()

_TS_MIN = datetime.datetime(1, 1, 2, 0, 0, 0)
_TS_MAX = datetime.datetime(2200, 12, 31, 23, 59, 59)


def _adversarial_values(dt, sample):
    """Four dirty values (null-ish / empty-or-zero / high extreme /
    low-negative extreme) for a type."""
    if isinstance(dt, StringType):
        return [None, "", "\N{UNICORN FACE} " + "x" * 2000, "\t\n  \r "]
    if isinstance(dt, (LongType, IntegerType)):
        hi = 2**31 - 1 if isinstance(dt, IntegerType) else 2**63 - 1
        return [None, 0, hi, -hi - 1]
    if isinstance(dt, (DoubleType, FloatType)):
        return [None, 0.0, float("nan"), float("-inf")]
    if isinstance(dt, (TimestampNTZType, TimestampType)):
        return [None, _TS_MIN, _TS_MAX, datetime.datetime(1969, 12, 31, 23, 59, 59)]
    if isinstance(dt, DateType):
        return [
            None,
            datetime.date(1, 1, 2),
            datetime.date(2200, 12, 31),
            datetime.date(1969, 12, 31),
        ]
    if isinstance(dt, BooleanType):
        return [None, False, True, None]
    if isinstance(dt, BinaryType):
        return [None, b"", b"\x00\xff" * 64, b"\xff" * 16]
    if isinstance(dt, ArrayType):
        dim = len(sample) if sample is not None else 4
        if isinstance(dt.elementType, (FloatType, DoubleType)):
            # zero-norm, and a ragged shorter vector with an Inf element
            return [None, [], [0.0] * dim, [float("inf")] * max(1, dim // 2)]
        return [None, [], None, None]
    return [None, None, None, None]


@pytest.fixture(scope="module")
def dirty_dir(spark, tmp_path_factory) -> str:
    d = tmp_path_factory.mktemp("dirty_sf")
    for t in TABLES:
        df = load_table(spark, SF_SRC, t)
        base = df.limit(30)
        sample_row = base.first()
        cols = []
        for i in range(4):
            row = []
            for f in df.schema.fields:
                sample = sample_row[f.name] if sample_row is not None else None
                row.append(_adversarial_values(f.dataType, sample)[i])
            cols.append(tuple(row))
        dirty = spark.createDataFrame(cols, df.schema)
        base.unionByName(dirty).coalesce(1).write.mode("overwrite").parquet(
            f"{d}/{t}.parquet"
        )
    return str(d)


def test_all_registered_queries_survive_dirty_corpus(spark, dirty_dir):
    import __spark_entry__ as entry_mod

    failures = []
    for name, fn in sorted(entry_mod.queries().items()):
        try:
            rows = fn(spark, dirty_dir).collect()
            assert rows is not None
        except Exception as ex:  # noqa: BLE001 — collecting all failures
            failures.append((name, type(ex).__name__, str(ex).split("\n")[0][:160]))
    assert not failures, "\n".join(map(str, failures))
