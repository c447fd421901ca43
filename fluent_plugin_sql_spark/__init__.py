"""fluent_plugin_sql_spark — a PySpark-native analytics engine with the
query and data-processing capabilities of fluent/fluent-plugin-sql.

The reference (fluent-plugin-sql v2.3.2, Ruby) is a Fluentd plugin pair:
an incremental RDBMS poller (``in_sql``) and a tag-routed buffered RDBMS
sink (``out_sql``).  This package re-expresses those semantics — and the
analytics / LLM-data-pipeline surface the north star requires — as
idiomatic Spark: DataFrame/SQL plans optimized by Catalyst, Structured
Streaming for streams, Arrow-vectorized pandas UDFs only where built-ins
cannot express the semantics.

Layout
------
- ``session``    SparkSession factory (AQE on, UTC, tuned shuffle).
- ``config``     typed configs: tables, routes, column_mapping, tag globs.
- ``state``      atomic JSON checkpoint store (reference: YAML state_file).
- ``sources``    incremental table scan + poll loop (in_sql), dialect-aware
                 JDBC wrappers, snapshot→tail bootstrap, and the
                 streaming-native source (offsets in Spark's checkpoint).
- ``sinks``      first-match-wins tag router + JDBC/parquet writers
                 (out_sql), effectively-once epoch sink, lake layer
                 (partitioned/bucketed writes, small-file compaction).
- ``functions``  scalar surface: time format/parse, tags, text analytics.
- ``operators``  dedup (exact/OPH-minhash/simhash/jaccard/embedding +
                 connected-component clustering), similarity search
                 (brute force, LSH, persistable IVF), as-of & range
                 joins, skew salting, multimodal decode (pure-stdlib
                 BMP/PPM/PNG incl. Adam7+16-bit, baseline+progressive
                 JPEG, MJPEG frame sampling, PCM WAV).
- ``plans``      analytics query catalog (TPC-H shapes, windows, set ops,
                 quality filters, packing, funnels) — each entry paired
                 with a DuckDB oracle.
- ``streaming``  Structured Streaming wrappers (windows, sessionization,
                 watermarked dedup, stateful ops).
"""

__version__ = "0.1.0"
