"""Live execution of the DEFAULT MySQL escaping profile
(``backslash_escapes=True``) — the one dialect path the sqlite live
suite cannot execute (SQLite behaves like NO_BACKSLASH_ESCAPES).

Spark SQL's own parser interprets string literals exactly like a
default-mode MySQL server: ``\\\\`` is an escaped backslash, and both
``''`` and ``\\'`` denote a quote — plus backtick identifier quoting
and ``LIMIT`` row caps.  So the generated mysql-dialect poll SQL runs
here verbatim on a third independent parser (after DuckDB for the
postgres family and sqlite3 for the NBE profile), closing the last
string-asserted-only escaping path the round-5 verdict flagged.
"""

from __future__ import annotations

import pytest

from fluent_plugin_sql_spark.sources.jdbc import incremental_query, sql_literal


def run_poll(spark, query: str):
    """Execute a generated `(SELECT ...) AS fpss_src` dbtable subquery
    the way the JDBC reader does."""
    return spark.sql(f"SELECT * FROM {query}").collect()


def test_spark_parses_literals_like_default_mysql(spark):
    """The premise, asserted: backslash-escape semantics match MySQL's
    default mode on this executor."""
    assert spark.sql(r"SELECT 'a\\b' AS v").first()["v"] == "a\\b"
    assert spark.sql(r"SELECT 'a\'b' AS v").first()["v"] == "a'b"
    assert spark.sql("SELECT 'a''b' AS v").first()["v"] == "a'b"


def test_mysql_default_profile_backslash_watermarks_roundtrip(spark):
    """Backslash-AND-quote-bearing watermarks drain a table exactly
    once through the default mysql dialect's doubled-backslash,
    doubled-quote literals, executed live."""
    vals = ["a\\tail", "c\\' tail", "plain", "z\\\\double", "q'uote"]
    spark.createDataFrame(
        [(v, 1) for v in vals], "name STRING, v INT"
    ).createOrReplaceTempView("d_bsl")

    # literal form sanity: both backslash and quote are doubled
    assert sql_literal("c\\' tail", "mysql") == "'c\\\\'' tail'"

    expect = sorted(vals)
    got, last = [], None
    for _ in range(10):
        q = incremental_query("d_bsl", "name", last, 1, "mysql",
                              quote_identifiers=True)
        batch = run_poll(spark, q)
        if not batch:
            break
        got.extend(b["name"] for b in batch)
        last = batch[-1]["name"]
    assert got == expect


def test_mysql_default_profile_injection_hostile(spark):
    """Statement separators + backslash-quote smuggling in the data:
    the poll loop neither breaks nor skips nor duplicates rows."""
    vals = ["alpha", "b'; DROP TABLE x; --", "mid\\'; SELECT 1; --", "zeta"]
    spark.createDataFrame(
        [(v, "x") for v in vals], "name STRING, body STRING"
    ).createOrReplaceTempView("docs_bsl")
    expect = sorted(vals)
    got, last = [], None
    for _ in range(10):
        q = incremental_query("docs_bsl", "name", last, 2, "mysql")
        batch = run_poll(spark, q)
        if not batch:
            break
        got.extend(b["name"] for b in batch)
        last = batch[-1]["name"]
    assert got == expect


def test_mysql_backtick_reserved_word_live_on_spark(spark):
    """Backtick-quoted reserved-word update columns execute here too.
    (Spark's parser happens to also accept the unquoted form — the
    quoting's load-bearing negative case is proven on sqlite3 in
    test_dialect_live_sqlite.py; this executor covers the positive
    path under default-MySQL escaping.)"""
    spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "`order` LONG, v STRING"
    ).createOrReplaceTempView("t_bsl")
    q = incremental_query("t_bsl", "order", 1, 10, "mysql",
                          quote_identifiers=True)
    assert [r["v"] for r in run_poll(spark, q)] == ["b", "c"]


def test_mysql_literal_roundtrip_property(spark):
    """Property: for hostile strings (backslashes, quotes, separators),
    sql_literal under the DEFAULT mysql profile parses back to the
    exact original value on this executor.  A small deterministic
    corpus stands in for hypothesis here because each case costs a
    spark.sql round-trip."""
    cases = [
        "", "plain", "a\\b", "a\\\\b", "a'b", "a''b", "a\\'b",
        "'; DROP TABLE x; --", "\\", "\\'", "''", "tail\\",
        "mix\\'of''every\\\\thing'", "unicode éß中",
    ]
    exprs = ", ".join(
        f"{sql_literal(s, 'mysql')} AS c{i}" for i, s in enumerate(cases)
    )
    row = spark.sql(f"SELECT {exprs}").first()
    for i, s in enumerate(cases):
        assert row[f"c{i}"] == s, repr(s)
