"""Config-driven BATCH corpus curation — the one-config end-to-end
training-data job, composing the engine's LLM-pipeline operators the way
``pipeline.run_streaming`` composes the incremental stores:

```yaml
input:  {path: /data, table: documents}     # {path}/{table}.parquet
steps:
  - quality_filter: {min_tokens: 30, min_ttr: 0.4, max_stop_ratio: 0.35}
  - exact_dedup: {}
  - near_dedup: {threshold: 0.8, num_hashes: 24, bands: 6}
  - simhash_dedup: {max_hamming: 6}
  - semantic_dedup: {k: 8, tau: 0.95, dim: 64}   # SemDeDup over embeddings
    # optional: max_cluster_size ("auto" default / int / null=opt-out),
    #           log_cap_stats: true  (logs salt-sharded mega-clusters)
  - span_removal: {n: 8, min_count: 2}
  - weighted_sample: {k: 10000, weight_col: n_chars}
output: {path: /data/curated, shards: 16}
```

Run: ``python -m fluent_plugin_sql_spark.curation job.yaml`` — prints a
JSON report of per-step row counts plus the shard manifest.

Steps execute in declared order (put cheap filters first); each is a
lazy DataFrame transformation, so Catalyst plans the whole chain
together and the only materializations are the per-step counts (cheap
on the checkpointed lineage) and the final shard write.  Dedup keep
policy is lowest-id-per-cluster throughout, matching the streaming
stores' and gate queries' semantics.

Scale notes: near_dedup uses OPH-MinHash LSH candidates with
star-capped buckets and exact-Jaccard verification; clustering uses the
O(log diameter) star-contraction components; span_removal's rewrite is
interval-bounded.  Nothing in the chain is quadratic or driver-bound.
"""

from __future__ import annotations

import json
import logging
import sys
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_LOG = logging.getLogger(__name__)


def _keep_non_dups(df: DataFrame, pairs: DataFrame, id_col: str) -> DataFrame:
    """Pairs → star-contraction components → drop every doc whose
    cluster label is not itself (keep the lowest id per cluster)."""
    from .operators.dedup import dup_clusters_star

    dups = (
        dup_clusters_star(pairs)
        .where(F.col("doc") != F.col("cluster_id"))
        .select(F.col("doc").alias(id_col))
    )
    return df.join(dups, id_col, "left_anti")


def run_curation(spark: SparkSession, cfg: dict[str, Any]) -> dict[str, Any]:
    """Execute a curation job config; returns the report dict."""
    from .io import load_table

    inp = cfg["input"]
    id_col = inp.get("id_col", "doc_id")
    text_col = inp.get("text_col", "text")
    df = load_table(spark, inp["path"], inp["table"])
    report: dict[str, Any] = {"input_rows": df.count(), "steps": []}

    for step in cfg.get("steps", []):
        (name, opts), = step.items()
        opts = opts or {}
        if name == "quality_filter":
            from .functions.text import quality_predicate

            df = df.where(quality_predicate(opts, text_col))
        elif name == "exact_dedup":
            # first occurrence (lowest id) per exact content hash — one
            # hash-shuffle window, linear at any corpus size (a broadcast
            # of the per-hash aggregate would be O(corpus) driver memory)
            from pyspark.sql import Window

            keep = F.min(id_col).over(
                Window.partitionBy(F.md5(F.col(text_col)))
            )
            df = (
                df.withColumn("_keep", keep)
                .where(F.col(id_col) == F.col("_keep"))
                .drop("_keep")
            )
        elif name == "near_dedup":
            from .operators.dedup import minhash_lsh_dup_pairs

            pairs = minhash_lsh_dup_pairs(
                df, text_col, id_col,
                threshold=float(opts.get("threshold", 0.8)),
                num_hashes=int(opts.get("num_hashes", 24)),
                bands=int(opts.get("bands", 6)),
            )
            df = _keep_non_dups(df, pairs, id_col)
        elif name == "simhash_dedup":
            from .operators.dedup import simhash_dup_pairs

            pairs = simhash_dup_pairs(
                df, text_col, id_col,
                max_hamming=int(opts.get("max_hamming", 6)),
            )
            df = _keep_non_dups(df, pairs, id_col)
        elif name == "semantic_dedup":
            # SemDeDup (operators/cluster): k-means the embeddings,
            # prune within-cluster cosine near-duplicates, keep-first.
            # Docs WITHOUT a valid embedding are kept — dedup cannot
            # judge them, and silently dropping them would turn a
            # missing feature into data loss.
            from .operators.cluster import semdedup_prune

            vec_col = opts.get("vec_col", "embedding")
            if vec_col in df.columns:
                src = df
            else:
                emb = load_table(
                    spark, inp["path"], opts.get("table", "embeddings")
                )
                eid = opts.get("embedding_id_col", "vec_id")
                src = df.select(id_col).join(
                    emb.select(F.col(eid).alias(id_col), vec_col), id_col
                )
            mcs = opts.get("max_cluster_size", "auto")
            dec = semdedup_prune(
                src,
                k=int(opts.get("k", 8)),
                iters=int(opts.get("iters", 2)),
                dim=int(opts.get("dim", 64)),
                tau=float(opts.get("tau", 0.95)),
                vec_col=vec_col,
                id_col=id_col,
                init=opts.get("init", "hash"),
                max_cluster_size=mcs,
                # numeric_mode: "vectorized" = numpy-GEMM distance path
                # (operators/dense) — the 100 TB arithmetic setting;
                # cross_shard_recovery = second salted prune pass when
                # the mega-cluster cap engages
                numeric_mode=opts.get("numeric_mode", "fold"),
                cross_shard_recovery=bool(
                    opts.get("cross_shard_recovery", False)
                ),
            ).select(F.col("vec_id").alias(id_col), "keep")
            if opts.get("log_cap_stats") and mcs is not None:
                # the execution-time engagement notice (≤k rows; one
                # extra k-means pass — opt-in for that reason)
                from .operators.cluster import semdedup_cap_stats

                for r in semdedup_cap_stats(
                    src,
                    k=int(opts.get("k", 8)),
                    iters=int(opts.get("iters", 2)),
                    dim=int(opts.get("dim", 64)),
                    vec_col=vec_col,
                    id_col=id_col,
                    init=opts.get("init", "hash"),
                    max_cluster_size=mcs,
                ).collect():
                    if r.capped:
                        _LOG.warning(
                            "semantic_dedup: cluster %s size %d exceeds "
                            "cap %d — salt-sharded into %d shards "
                            "(within-cluster keep is a superset)",
                            r.cluster, r.size, r.cap, r.shards,
                        )
            df = (
                df.join(dec, id_col, "left")
                .where(F.col("keep").isNull() | F.col("keep"))
                .drop("keep")
            )
        elif name == "span_removal":
            from .operators.dedup import remove_duplicate_spans

            clean = remove_duplicate_spans(
                df, text_col, id_col,
                n=int(opts.get("n", 8)),
                min_count=int(opts.get("min_count", 2)),
            ).select(id_col, "clean_text")
            df = (
                df.join(clean, id_col)
                .drop(text_col)
                .withColumnRenamed("clean_text", text_col)
            )
        elif name == "weighted_sample":
            from .functions.text import md5_long

            k = int(opts["k"])
            wcol = opts.get("weight_col")
            if wcol:
                # A-ES requires strictly positive weights: a negative
                # weight flips the sort (always selected), zero yields a
                # null key (silently excluded) — fail fast instead
                bad = df.where(
                    F.col(wcol).isNull() | (F.col(wcol) <= 0)
                ).limit(1).count()
                if bad:
                    raise ValueError(
                        f"weighted_sample weight_col {wcol!r} must be "
                        "strictly positive and non-null for every row"
                    )
            u = (
                F.pmod(md5_long(F.col(id_col).cast("string")), F.lit(1_000_003))
                + 0.5
            ) / 1_000_003.0
            weight = F.col(wcol) if wcol else F.lit(1.0)
            df = (
                df.withColumn("_sk", F.log(u) / weight)
                .orderBy(F.desc("_sk"), F.asc(id_col))
                .limit(k)
                .drop("_sk")
            )
        else:
            raise ValueError(f"unknown curation step: {name}")
        # pin lineage per step: the count is then cheap, and the next
        # step's plan doesn't re-run this one's joins
        df = df.localCheckpoint(eager=True)
        report["steps"].append({"step": name, "rows_after": df.count()})

    out = cfg.get("output")
    if out:
        from .sinks.lake import write_training_shards

        report["manifest"] = write_training_shards(
            df, out["path"], text_col=text_col, id_col=id_col,
            num_shards=int(out.get("shards", 16)),
        )
    return report


def main(argv: list[str] | None = None) -> int:
    from .pipeline import load_config
    from .session import get_spark

    args = argv if argv is not None else sys.argv[1:]
    if not args:
        print(__doc__)
        return 2
    cfg = load_config(args[0])
    spark = get_spark("fpss-curation")
    print(json.dumps(run_curation(spark, cfg)))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
