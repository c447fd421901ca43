"""Deduplication operators for LLM training-data pipelines.

Five dedup families (north star: BASELINE.json), each expressed as
composable DataFrame plans — no Python UDFs anywhere in the hot path:

- exact        content-hash groupBy (linear, one shuffle on the hash)
- n-gram Jaccard   shingle inverted-index join + exact verification
- MinHash LSH  signature → band buckets → candidates → exact verification
- SimHash      per-row 60-bit sketch → hamming-distance pairing
- embedding    cosine-similarity pairing over `array<float>` vectors

Scale design: exact jaccard on all pairs is O(n²) and exists here as the
verification step only; candidate GENERATION is what changes with scale —
shared-shingle inverted index (`jaccard_dup_pairs`) for mid scale, MinHash
band buckets (`minhash_lsh_dup_pairs`) for 100 TB (candidates per doc are
O(#band collisions), independent of corpus size; each stage is a plain
shuffle-on-key the optimizer can plan).  Everything that reaches OUTPUT
(content hashes, jaccard values, simhash sketches) uses engine-portable
hashing (md5-derived, functions.text.md5_long); internal acceleration
structures (minhash signatures) use JVM-native xxhash64 — deterministic
across runs and partitionings, which is all they need.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import md5_long, simhash60_from_hashes, token_hashes, tokens


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Exact dedup: canonical content hash, keep the lowest id per group.

    Returns (keep_id, n_dups, content_hash).  One hash-shuffle; with
    map-side combine the shuffle carries one row per distinct document.
    """
    return (
        df.select(F.col(id_col), F.md5(F.col(text_col)).alias("content_hash"))
        .groupBy("content_hash")
        .agg(F.min(id_col).alias("keep_id"), F.count("*").alias("n_copies"))
    )


def shingle_sets(df: DataFrame, text_col: str, id_col: str, k: int = 3) -> DataFrame:
    """Distinct word-k-gram shingles per document: (id, shingle).

    Built with higher-order array functions (transform over a sequence of
    offsets) then exploded — stays in codegen until the explode.
    """
    toks = tokens(text_col)
    shingles = F.when(
        F.size(toks) >= k,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - k),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k)),
        ),
    ).otherwise(F.array())  # guard: Spark sequence(0, negative) would descend
    return (
        df.select(F.col(id_col).alias("doc"), F.explode(F.array_distinct(shingles)).alias("shingle"))
    )


def _pair_jaccard(sh: DataFrame) -> DataFrame:
    """Exact Jaccard for every pair sharing ≥1 shingle (inverted-index join)."""
    sizes = sh.groupBy("doc").agg(F.count("*").alias("n"))
    a = sh.alias("a")
    b = sh.alias("b")
    shared = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc") < F.col("b.doc")))
        .groupBy(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .agg(F.count("*").alias("shared"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    return (
        shared.join(sa, F.col("doc_a") == F.col("sa.doc"))
        .join(sb, F.col("doc_b") == F.col("sb.doc"))
        .select(
            "doc_a",
            "doc_b",
            (
                F.col("shared")
                / (F.col("sa.n") + F.col("sb.n") - F.col("shared"))
            ).alias("jaccard"),
        )
    )


def jaccard_dup_pairs(
    df: DataFrame, text_col: str, id_col: str, threshold: float = 0.8, k: int = 3
) -> DataFrame:
    """n-gram Jaccard near-dup pairs (doc_a < doc_b, jaccard ≥ threshold).

    Candidate generation = shared-shingle inverted index; a pair with zero
    common shingles is never materialized.  For 100 TB prefer
    :func:`minhash_lsh_dup_pairs`, which bounds candidates per band bucket.
    """
    sh = shingle_sets(df, text_col, id_col, k)
    return (
        _pair_jaccard(sh)
        .where(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", F.round("jaccard", 4).alias("jaccard"))
    )


def shingle_hash_arrays(
    df: DataFrame, text_col: str, id_col: str, k: int = 3
) -> DataFrame:
    """(doc, shs): per-row array of k-gram shingle hashes.

    Tokens are hashed ONCE (one xxhash64 per token), then each shingle
    hash is a fixed-width ``xxhash64(h_i, …, h_{i+k-1})`` combine of k
    consecutive token hashes — no per-shingle string slicing/concat,
    which profiling showed dominated signature cost (~5 µs/shingle for
    slice+concat_ws+hash vs ~1 µs for the integer combine).  The token-
    hash array is materialized as its own projection on purpose:
    inlining it into the shingle lambda would re-evaluate the whole
    inner transform per element access (O(L²) per row — measured 17×
    slower); Catalyst's CollapseProject keeps multi-referenced non-cheap
    projections staged, preserving the O(L) shape.

    No shingle dedup — downstream MIN-aggregation is insensitive to
    duplicate shingles, and skipping array_distinct is measurably faster.
    """
    toks = tokens(text_col)
    staged = df.select(
        F.col(id_col).alias("doc"),
        F.transform(toks, lambda x: F.xxhash64(x)).alias("_th"),
    )
    th = F.col("_th")
    shs = F.when(
        F.size(th) >= k,
        F.transform(
            F.sequence(F.lit(0), F.size(th) - k),
            lambda i: F.xxhash64(*[F.element_at(th, i + j + 1) for j in range(k)]),
        ),
    ).otherwise(F.array().cast("array<bigint>"))
    return staged.select("doc", shs.alias("shs"))


def minhash_signatures(
    df: DataFrame, text_col: str, id_col: str, num_hashes: int = 32, k: int = 3
) -> DataFrame:
    """(doc, h0..h{n-1}): one-permutation-hashing (OPH) MinHash signature
    matrix, one row per document — computed entirely PER ROW, no shuffle.

    OPH (Li/Owen/Zhang 2012): hash each shingle ONCE (inside
    :func:`shingle_hash_arrays`) and partition the 64-bit hash space into
    ``num_hashes`` buckets; signature slot i = min shingle-hash landing
    in bucket i, here ``array_min(filter(shs, s -> pmod(s, m) = i))``
    over the row's shingle array.  The earlier formulation exploded the
    shingle arrays and MIN-aggregated 5M rows through a hash shuffle;
    row-wise HOFs keep the whole signature inside the scan stage —
    embarrassingly parallel, zero exchange — which is both the local win
    (2.2 s → 0.75 s at sf0.1) and the 100 TB shape: signing a corpus is
    a map, not an aggregation.

    Empty buckets (short documents) are ROTATION-densified (Shrivastava
    2017): slot i borrows the nearest non-empty bucket's min going
    right (circular) — itself a real minhash of the document, so the
    per-slot collision probability stays ≈ J even when most buckets are
    empty.  A content-derived fill (``xxhash64(i, global_min)``) was
    measurably worse here: for a short near-dup pair whose global
    min-hash differs (probability 1−J), EVERY fill slot differed at
    once, and recall collapsed exactly for short borderline documents —
    at sf0.1 that lost 5 of 256 true J≥0.8 pairs, all with ≤31 tokens.
    No per-slot salt: a spurious borrow collision only costs a candidate
    that exact verification rejects, while a salt would break near-dup
    fills whenever emptiness patterns differ by one bucket.  Signatures
    are an internal acceleration structure — dedup OUTPUT is
    exact-Jaccard-verified, so only determinism and collision statistics
    matter.  (All-empty docs fall through to a constant per-slot fill —
    zero-shingle docs can never verify anyway.)

    Slot extraction is GENERATED SQL, not Column objects (a Column-tree
    formulation costs thousands of py4j round-trips of driver time per
    call; selectExpr strings parse JVM-side in one hop).
    """
    m = num_hashes
    shs = shingle_hash_arrays(df, text_col, id_col, k)
    slots = [f"array_min(filter(shs, s -> pmod(s, {m}) = {i})) as r{i}" for i in range(m)]
    raw = shs.selectExpr("doc", *slots)
    fills = [
        "coalesce("
        + ", ".join(f"r{(i + j) % m}" for j in range(m))
        + f", xxhash64({i}L)) as h{i}"
        for i in range(m)
    ]
    return raw.selectExpr("doc", *fills)


def _bucket_pair_expr(star_bucket_threshold: int | None) -> str:
    """selectExpr string expanding a bucket's sorted doc list into
    candidate (doc_a, doc_b) pairs: exhaustive i<j pairs, or — above
    ``star_bucket_threshold`` — star pairs anchored at the bucket min
    (O(n) instead of O(n²); see :func:`minhash_lsh_dup_pairs`).

    NB: element access ds[i] is 0-BASED in Spark SQL while slice() is
    1-based — doc_a is element i, its partners are elements i+1..n-1.
    """
    all_pairs = """flatten(transform(sequence(0, size(ds)-2),
                i -> transform(slice(ds, i+2, size(ds)-i-1),
                               x -> struct(ds[i] as doc_a, x as doc_b))))"""
    star_pairs = """transform(slice(ds, 2, size(ds)-1),
                              x -> struct(ds[0] as doc_a, x as doc_b))"""
    if star_bucket_threshold is None:
        pair_expr = f"explode({all_pairs}) as p"
    else:
        pair_expr = (
            f"explode(CASE WHEN size(ds) > {int(star_bucket_threshold)} "
            f"THEN {star_pairs} ELSE {all_pairs} END) as p"
        )
    return pair_expr.replace("ds", "array_sort(docs)")


def minhash_lsh_dup_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    threshold: float = 0.8,
    num_hashes: int = 24,
    bands: int = 6,
    k: int = 3,
    star_bucket_threshold: int = 1024,
) -> DataFrame:
    """MinHash + LSH banding + exact-Jaccard verification.

    rows-per-band = num_hashes/bands (r=4, b=6 default → J=0.8 pairs
    collide in ≥1 band with P ≈ 0.996; J=0.97 with P ≈ 1-6e-7).
    Verification makes precision exact; banding only bounds the candidate
    set, which is the property that survives 100×/1000× scale-up.

    ``star_bucket_threshold`` guards the one quadratic hazard left: a
    bucket of n near-identical documents (web boilerplate, mirrored
    pages) expands to n(n−1)/2 pairs — 100k copies means 5e9 pairs out
    of one bucket.  Buckets larger than the threshold emit STAR pairs
    instead (bucket-min vs each other doc, O(n)): every member is still
    detected as a duplicate of the bucket min, and
    :func:`dup_clusters`-style grouping recovers the full clique, but
    the pair LIST omits non-min pairs within oversized buckets — the
    standard recall/cost trade for survivor-set dedup.  The default
    (1024) caps any bucket's fan-out at ~0.5M pairs; pass ``None`` for
    strict all-pairs semantics.
    """
    r = num_hashes // bands
    sig = minhash_signatures(df, text_col, id_col, num_hashes, k)
    # band keys: concat the band's r minhashes, then unpivot to
    # (doc, band, band_key) — stack() is a zero-shuffle generator
    band_cols = [
        F.concat_ws(",", *[F.col(f"h{b * r + j}") for j in range(r)]).alias(f"band{b}")
        for b in range(bands)
    ]
    stack_expr = (
        f"stack({bands}, "
        + ", ".join(f"{b}, band{b}" for b in range(bands))
        + ") as (band, band_key)"
    )
    band_keys = sig.select("doc", *band_cols).selectExpr("doc", stack_expr)
    # candidate pairs by BUCKET EXPANSION, not a band self-join: group the
    # band keys into buckets and explode each bucket's doc list into its
    # i<j pairs.  ONE key-shuffle total (a self-join shuffles both sides
    # and needs the signature pipeline materialized up front to avoid
    # double computation); bucket sizes — hence per-task pair fan-out —
    # are bounded by the banding construction, which is the property that
    # survives 100×.  The tiny per-bucket pair expansion runs as an
    # (interpreted) nested HOF over arrays of a few doc ids.
    buckets = (
        band_keys.groupBy("band", "band_key")
        .agg(F.collect_list("doc").alias("docs"))
        .where(F.size("docs") > 1)
    )
    candidates = (
        buckets.selectExpr(_bucket_pair_expr(star_bucket_threshold))
        .select("p.doc_a", "p.doc_b")
        .distinct()
        # consumed by TWO broadcast joins below; each broadcast plans as
        # its own job, so an unmaterialized plan would recompute the whole
        # signature pipeline per consumer.  Eager localCheckpoint
        # materializes exactly once, truncates lineage, and is freed on
        # DataFrame GC (a bare cache() would accumulate executor storage
        # across calls in a long-lived poll-loop driver).  No driver
        # collect: stays distributed.
        .localCheckpoint(eager=True)
    )
    # verify ONLY candidate docs: restrict the CORPUS before shingling, so
    # exact string shingles are built for the candidate neighborhood, not
    # the whole corpus
    cand_ids = (
        candidates.select(F.col("doc_a").alias(id_col))
        .union(candidates.select(F.col("doc_b").alias(id_col)))
        .distinct()
    )
    df_cand = df.join(F.broadcast(cand_ids), id_col, "left_semi")
    # small by construction (candidate neighborhood only) and scanned 3×
    # inside _pair_jaccard (sizes + both join sides) — materialize once
    sh = shingle_sets(df_cand, text_col, id_col, k).localCheckpoint(eager=True)
    verified = _pair_jaccard(sh).join(
        F.broadcast(candidates), ["doc_a", "doc_b"], "left_semi"
    )
    return (
        verified.where(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", F.round("jaccard", 4).alias("jaccard"))
    )


def simhash_dup_pairs(
    df: DataFrame, text_col: str, id_col: str, max_hamming: int = 6
) -> DataFrame:
    """SimHash near-dup pairs: hamming(simhash_a, simhash_b) ≤ max_hamming.

    The sketch is one 60-bit value per document (constant space).  Pairing
    uses pigeonhole blocking: split the 60 bits into ``max_hamming + 1``
    contiguous blocks — two sketches within hamming distance ``max_hamming``
    differ in at most ``max_hamming`` blocks, so they must agree EXACTLY on
    at least one block.  Candidates come from an equi-join on
    (block_index, block_value) — a plain shuffle hash/sort-merge join the
    optimizer can plan and AQE can skew-split — then the full 60-bit
    hamming distance verifies each candidate.  Recall is exact (pigeonhole
    is a guarantee, not a heuristic); work scales with block-bucket
    collision counts, not n², so the plan survives 100×.
    """
    nb = max_hamming + 1
    # materialize the token-hash arrays BEFORE the simhash projection:
    # the sketch makes 60 per-bit passes over `hs`, and without a
    # materialization barrier projection collapse substitutes the md5
    # transform into every pass (and into both self-join sides) → md5
    # recomputed 120× per doc (measured 79 s at sf0.1).
    hs = df.select(F.col(id_col).alias("doc"), token_hashes(text_col).alias("hs")).cache()
    sk = hs.select("doc", simhash60_from_hashes("hs").alias("sk"))
    # block keys: bits [bounds[i], bounds[i+1]) of the sketch, unpivoted to
    # (doc, sk, blk_idx, blk_val) — stack() is a zero-shuffle generator
    bounds = [i * 60 // nb for i in range(nb)] + [60]
    block_cols = [
        F.shiftright("sk", bounds[i])
        .bitwiseAND(F.lit((1 << (bounds[i + 1] - bounds[i])) - 1))
        .alias(f"blk{i}")
        for i in range(nb)
    ]
    stack_expr = (
        f"stack({nb}, "
        + ", ".join(f"{i}, blk{i}" for i in range(nb))
        + ") as (blk_idx, blk_val)"
    )
    # localCheckpoint (eager): materialized once for both self-join sides
    # with truncated lineage, and — unlike a bare cache() — the blocks are
    # freed when the DataFrame is GC'd, so repeated calls in a long-lived
    # poll-loop driver don't accumulate executor storage.  (On a real
    # cluster with executor churn you would set a checkpoint dir and use
    # reliable checkpoints instead.)
    keyed = (
        sk.select("doc", "sk", *block_cols)
        .selectExpr("doc", "sk", stack_expr)
        .localCheckpoint(eager=True)
    )
    hs.unpersist()
    a, b = keyed.alias("a"), keyed.alias("b")
    ham = F.bit_count(F.col("a.sk").bitwiseXOR(F.col("b.sk")))
    return (
        a.join(
            b,
            (F.col("a.blk_idx") == F.col("b.blk_idx"))
            & (F.col("a.blk_val") == F.col("b.blk_val"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .where(ham <= max_hamming)
        .select(
            F.col("a.doc").alias("doc_a"),
            F.col("b.doc").alias("doc_b"),
            ham.alias("hamming"),
        )
        # a close pair can agree on several blocks → one row per block hit
        .distinct()
    )


def embedding_dup_pairs(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    threshold: float = 0.9,
    num_blocks: int = 8,
) -> DataFrame:
    """Embedding-cosine near-dup pairs (id_a < id_b, cosine ≥ threshold).

    Distributed block matmul: vectors are hash-assigned to ``num_blocks``
    blocks; every unordered block pair (i ≤ j) forms one group containing
    both blocks' rows, and a grouped pandas UDF computes the cross-block
    cosine matrix with one float64 BLAS matmul.  Replication factor is
    ~num_blocks per row (the known cost of block nested-loop), there is
    no driver collect, and each task's working set is two blocks — pick
    num_blocks so a block fits executor memory at the target scale.

    (The previous zip_with/aggregate pair-join formulation was O(pairs ×
    dim) *interpreted* expression evals — 86 s at sf0.1 vs ~2 s for the
    BLAS path.)
    """
    import numpy as np
    import pandas as pd

    v = df.select(F.col(id_col).alias("vid"), F.col(vec_col).alias("vec"))
    blk = F.abs(F.xxhash64("vid")) % num_blocks
    # row of block b participates in every group (i,j), i<=j, with b∈{i,j}
    groups = F.filter(
        F.transform(
            F.sequence(F.lit(0), F.lit(num_blocks - 1)),
            lambda o: F.when(
                blk <= o, F.concat_ws(":", blk, o)
            ).otherwise(F.concat_ws(":", o, blk)),
        ),
        lambda g: g.isNotNull(),
    )
    exploded = v.select("vid", "vec", blk.alias("blk"), F.explode(F.array_distinct(groups)).alias("grp"))

    out_schema = "id_a long, id_b long, cos double"

    def block_cosine(pdf: pd.DataFrame) -> pd.DataFrame:
        i, j = (int(x) for x in pdf["grp"].iloc[0].split(":"))
        mat = np.asarray(list(pdf["vec"]), dtype=np.float64)
        ids = pdf["vid"].to_numpy()
        norms = np.linalg.norm(mat, axis=1)
        blks = pdf["blk"].to_numpy()
        if i == j:
            sims = np.round((mat @ mat.T) / np.outer(norms, norms), 4)
            sims[np.tril_indices(len(ids))] = -2.0  # keep one orientation only
            ia, ib = np.nonzero(sims >= threshold)
            id_a, id_b, cos = ids[ia], ids[ib], sims[ia, ib]
        else:
            la, lb = blks == i, blks == j
            sims = np.round(
                (mat[la] @ mat[lb].T) / np.outer(norms[la], norms[lb]), 4
            )
            ia, ib = np.nonzero(sims >= threshold)
            id_a, id_b, cos = ids[la][ia], ids[lb][ib], sims[ia, ib]
        lo, hi = np.minimum(id_a, id_b), np.maximum(id_a, id_b)
        keep = lo < hi  # dedup the symmetric same-block hits
        return pd.DataFrame({"id_a": lo[keep], "id_b": hi[keep], "cos": cos[keep]})

    return exploded.groupBy("grp").applyInPandas(block_cosine, out_schema)


def dup_clusters(pairs: DataFrame, max_iterations: int = 20) -> DataFrame:
    """Connected components over near-dup pairs → (doc, cluster_id), with
    cluster_id = the smallest doc id in the component.  This is the step
    that turns PAIR output (minhash/simhash/jaccard) into dedup decisions:
    keep cluster_id, drop the rest of its component.

    Algorithm: iterative min-label propagation — each round every node
    takes the min label among itself and its neighbors; converges in
    O(component diameter) rounds (near-dup clusters are small and dense,
    so typically 2-4).  Each round is one shuffle-on-key join; lineage is
    truncated per round with an eager localCheckpoint so the loop's plan
    doesn't grow (the standard Spark iterative-algorithm pattern).  The
    driver only inspects a 1-row convergence count, never the data.
    """
    edges = (
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .union(pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        edges.select(F.col("src").alias("doc"))
        .distinct()
        .withColumn("label", F.col("doc"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iterations):
        neighbor_min = (
            edges.join(labels, edges.dst == labels.doc)
            .groupBy("src")
            .agg(F.min("label").alias("nbr_label"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.doc == neighbor_min.src, "left")
            .select(
                "doc",
                F.least(
                    F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))
                ).alias("label"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "doc")
            .where(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.select("doc", F.col("label").alias("cluster_id"))


def _band_key_rows(sig: DataFrame, num_hashes: int, bands: int) -> DataFrame:
    """(doc, band, band_key) unpivot of a signature matrix — stack() is a
    zero-shuffle generator (same construction as minhash_lsh_dup_pairs)."""
    r = num_hashes // bands
    band_cols = [
        F.concat_ws(",", *[F.col(f"h{b * r + j}") for j in range(r)]).alias(f"band{b}")
        for b in range(bands)
    ]
    stack_expr = (
        f"stack({bands}, "
        + ", ".join(f"{b}, band{b}" for b in range(bands))
        + ") as (band, band_key)"
    )
    return sig.select("doc", *band_cols).selectExpr("doc", stack_expr)



class _StoreFS:
    """Hadoop-FS plumbing shared by the incremental dedup stores:
    existence checks and the staging-dir compaction swap.  Uses the
    Hadoop FileSystem API, so the stores work unchanged on any
    Hadoop-compatible filesystem (local, HDFS, object stores)."""

    def __init__(self, spark, path: str):
        self.spark = spark
        self.path = path.rstrip("/")
        jvm = spark._jvm  # noqa: SLF001
        self._jpath = jvm.org.apache.hadoop.fs.Path
        self._fs = self._jpath(self.path).getFileSystem(
            spark._jsc.hadoopConfiguration()  # noqa: SLF001
        )

    def exists(self, sub: str) -> bool:
        return self._fs.exists(self._jpath(f"{self.path}/{sub}"))

    def compact_table(self, sub: str, part_col: str, num_files: int) -> None:
        """Rewrite ``{path}/{sub}`` with ``num_files`` files total,
        preserving the ``part_col`` directory partitioning, via a
        staging-dir swap: bucket ids (hence probe pruning) are identical
        before and after, the live tree stays readable until the swap,
        and a crash mid-compact just re-runs."""
        if not self.exists(sub):
            return
        live = f"{self.path}/{sub}"
        staged = f"{self.path}/_compact_{sub}"
        (
            self.spark.read.parquet(live)
            .repartition(num_files, F.col(part_col))
            .write.mode("overwrite")
            .partitionBy(part_col)
            .parquet(staged)
        )
        old = self._jpath(f"{self.path}/_old_{sub}")
        self._fs.rename(self._jpath(live), old)
        self._fs.rename(self._jpath(staged), self._jpath(live))
        self._fs.delete(old, True)


class MinHashDedupStore:
    """Incremental near-dedup for CONTINUOUS ingestion — the missing
    piece between batch ``minhash_lsh_dup_pairs`` (one corpus, one shot)
    and a poll-loop/streaming pipeline that must ask, per batch: "have we
    already accepted something near-identical, possibly months ago?".

    State is two append-only parquet tables under ``path`` — band keys
    hash-bucketed by ``pmod(hash(band, band_key), num_buckets)`` and full
    signatures hash-bucketed by ``pmod(hash(doc), num_buckets)``.  The
    bucket id is a *directory partition column*, so the per-batch probe
    pushes the (≤ ``num_buckets``) bucket ids it needs as a partition
    filter and Spark prunes every other directory at planning time — the
    probe reads O(matching buckets), not O(store), and NEVER shuffles the
    store side: the batch side is explicitly broadcast, so both probe
    joins are BroadcastHashJoin with the store streaming through.
    (Directory bucketing instead of ``bucketBy``/``saveAsTable`` keeps the
    store self-contained on disk — no metastore entry to lose between
    sessions; a fresh SparkSession re-opens the same path and pruning
    still works.)  Per batch:

    1. sign the batch (OPH MinHash, O(1)/shingle);
    2. candidates = band-key collisions batch×store (shuffle bounded by
       banding) plus batch-internal bucket expansion;
    3. verify candidates on the ESTIMATED Jaccard — the fraction of
       matching signature slots, an unbiased estimator of true Jaccard —
       so the store never needs document text (at 100 TB the store holds
       ~200 bytes/doc, not the corpus);
    4. survivors (non-dups, batch-internal keep-lowest-id) are returned
       AND their band keys + signatures appended.

    Unlike the batch operator there is no exact-shingle verification:
    that is the deliberate trade for a text-free store, and why
    ``sig_match_frac`` exposes the estimator threshold (24 slots at 0.5
    ≈ accepting estimated J ≥ 0.5; tighten per corpus).  Crash contract:
    the append of state happens AFTER the survivor set is computed; a
    crash between sink-write and state-append re-admits at most one
    batch's near-dups (at-least-once state, matching the poll loop's
    at-least-once emit).
    """

    def __init__(
        self,
        spark,
        path: str,
        num_hashes: int = 24,
        bands: int = 6,
        k: int = 3,
        sig_match_frac: float = 0.5,
        num_buckets: int = 32,
    ):
        self.spark = spark
        self.path = path.rstrip("/")
        self.num_hashes = num_hashes
        self.bands = bands
        self.k = k
        self.sig_match_frac = sig_match_frac
        self.num_buckets = num_buckets
        self._store_fs = _StoreFS(spark, self.path)

    def _exists(self, sub: str) -> bool:
        return self._store_fs.exists(sub)

    def _sig_cols(self) -> list[str]:
        return [f"h{i}" for i in range(self.num_hashes)]

    def _est_match(self, a_prefix: str, b_prefix: str):
        """Fraction of equal signature slots (estimated Jaccard)."""
        return (
            sum(
                F.when(
                    F.col(f"{a_prefix}.h{i}") == F.col(f"{b_prefix}.h{i}"), 1
                ).otherwise(0)
                for i in range(self.num_hashes)
            )
            / F.lit(float(self.num_hashes))
        )

    def _bk_bucket(self):
        """Bucket id of a (band, band_key) row — MUST match on the write
        and probe sides (Spark's own ``hash`` over the same columns)."""
        return F.pmod(F.hash("band", "band_key"), F.lit(self.num_buckets))

    def _sig_bucket(self, col: str = "doc"):
        return F.pmod(F.hash(col), F.lit(self.num_buckets))

    def _candidate_pairs(self, bk: DataFrame) -> DataFrame:
        """(new doc, old doc) band-key collisions batch × store — bucket
        ids pushed as a partition filter, batch side broadcast."""
        probe_bkts = [
            r[0] for r in bk.select(self._bk_bucket().alias("b")).distinct().collect()
        ]
        store_bk = self.spark.read.parquet(f"{self.path}/band_keys").where(
            F.col("bkt").isin(probe_bkts)
        )
        return (
            store_bk.withColumnRenamed("doc", "old_doc")
            .join(F.broadcast(bk), ["band", "band_key"])
            .select("doc", "old_doc")
            .distinct()
        )

    def _cross_batch_dups(self, bk: DataFrame, sig: DataFrame) -> DataFrame | None:
        """Batch ids that near-match something already in the store.

        Scale contract (the probe is the hot path of continuous ingest):
        - the store is NEVER shuffled: the batch side is broadcast, so both
          joins are BroadcastHashJoin with the store streaming through;
        - the store is barely even READ: the probe collects the ≤
          ``num_buckets`` bucket ids its keys hash to (bounded by the
          bucket count, not the batch size) and pushes them as a partition
          filter, so directory pruning skips every non-matching bucket.
        """
        if not self._exists("band_keys"):
            return None
        cand = self._candidate_pairs(bk).localCheckpoint(
            eager=True
        )  # small; feeds bucket-collect + join
        sig_bkts = [
            r[0]
            for r in cand.select(self._sig_bucket("old_doc").alias("b"))
            .distinct()
            .collect()
        ]
        store_sig = self.spark.read.parquet(f"{self.path}/signatures").where(
            F.col("sbkt").isin(sig_bkts)
        )
        return (
            store_sig.alias("o")
            .join(
                F.broadcast(
                    cand.join(F.broadcast(sig.alias("n")), cand["doc"] == F.col("n.doc")).select(
                        cand["doc"], cand["old_doc"], *[f"n.h{i}" for i in range(self.num_hashes)]
                    )
                ).alias("n"),
                F.col("n.old_doc") == F.col("o.doc"),
            )
            .where(self._est_match("n", "o") >= self.sig_match_frac)
            .select(F.col("n.doc").alias("dup"))
            .distinct()
        )

    def probe_dups(self, df: DataFrame, text_col: str, id_col: str) -> DataFrame:
        """Read-only: ids in ``df`` that are near-dups of the store OR of a
        lower-id row in the same batch.  ``process_batch`` = this + absorb."""
        sig = minhash_signatures(
            df, text_col, id_col, self.num_hashes, self.k
        ).localCheckpoint(eager=True)  # feeds 3 consumers; compute once
        return self._dup_ids(sig)

    def _dup_ids(self, sig: DataFrame) -> DataFrame:
        bk = _band_key_rows(sig, self.num_hashes, self.bands)
        dup_ids = self._cross_batch_dups(bk, sig)

        # batch-internal near-dups: bucket expansion (keep lowest id).
        # Star pairing above the threshold is LOSSLESS here — the store
        # only needs "is this doc a dup of an earlier one", and within a
        # mega-bucket the min-anchored pairs decide exactly that.
        buckets = (
            bk.groupBy("band", "band_key")
            .agg(F.collect_list("doc").alias("docs"))
            .where(F.size("docs") > 1)
        )
        internal = (
            buckets.selectExpr(_bucket_pair_expr(star_bucket_threshold=1024))
            .select("p.doc_a", "p.doc_b")
            .distinct()
            .join(sig.alias("a"), F.col("doc_a") == F.col("a.doc"))
            .join(sig.alias("b"), F.col("doc_b") == F.col("b.doc"))
            .where(self._est_match("a", "b") >= self.sig_match_frac)
            .select(F.col("doc_b").alias("dup"))  # keep the lower id
            .distinct()
        )
        return internal if dup_ids is None else dup_ids.unionByName(internal).distinct()

    def process_batch(self, df: DataFrame, text_col: str, id_col: str) -> DataFrame:
        """Return the near-dup-free subset of ``df`` and absorb it into
        the store.  Output columns = input columns."""
        sig = minhash_signatures(
            df, text_col, id_col, self.num_hashes, self.k
        ).localCheckpoint(eager=True)  # feeds 3 consumers; compute once
        dup_ids = self._dup_ids(sig)

        survivors = df.join(
            dup_ids.withColumnRenamed("dup", id_col), id_col, "left_anti"
        ).localCheckpoint(eager=True)  # pin BEFORE the store mutates

        keep = survivors.select(F.col(id_col).alias("doc"))
        sig_keep = sig.join(keep, "doc", "left_semi")
        _band_key_rows(sig_keep, self.num_hashes, self.bands).withColumn(
            "bkt", self._bk_bucket()
        ).write.mode("append").partitionBy("bkt").parquet(f"{self.path}/band_keys")
        sig_keep.withColumn("sbkt", self._sig_bucket()).write.mode("append").partitionBy(
            "sbkt"
        ).parquet(f"{self.path}/signatures")
        return survivors

    def compact(self, files_per_bucket: int = 1) -> None:
        """Rewrite both state tables with ``files_per_bucket`` files per
        bucket directory.

        Every ``process_batch`` appends one small file per touched bucket,
        so a long-running ingest accumulates O(batches) files per bucket
        and probe latency decays into file-open overhead.  Run this
        periodically (e.g. every N batches, or from a maintenance job) —
        bucket ids are preserved, so probes are identical before and
        after; the rewrite is atomic-enough for the store's at-least-once
        contract (a crash mid-compact re-runs the compact, and the
        staging-dir rename keeps the live tree readable until the swap).
        """
        for sub, part in (("band_keys", "bkt"), ("signatures", "sbkt")):
            self._store_fs.compact_table(
                sub, part, self.num_buckets * files_per_bucket
            )


class ExactDedupStore:
    """Incremental EXACT dedup for continuous ingestion — the
    cross-restart complement of ``streaming.stream.dedup_stream``
    (``dropDuplicatesWithinWatermark`` only holds keys until the
    watermark passes; this store remembers every accepted document's
    content hash forever, at ~16 bytes/doc, never the text).

    Same scale contract as :class:`MinHashDedupStore` — state is one
    append-only parquet table hash-bucketed into partition directories
    (``pmod(hash(content_hash), num_buckets)``); the per-batch probe
    collects its ≤ ``num_buckets`` bucket ids, pushes them as a
    partition filter (directory pruning), and broadcasts the batch
    side, so the store is never shuffled and barely read.  Crash
    contract: state appends AFTER the survivor set is pinned; a replay
    re-probes and its own hashes now look like dups — replays converge
    instead of double-inserting (self-healing at-least-once).

    Reference parity: this is the poll-loop dedup a fluentd user
    approximates with downstream unique filters; here it is exact,
    durable, and distributed (in_sql.rb:136-161 emits raw rows with no
    dedup — SURVEY §2.9 T5 notes the at-least-once re-delivery this
    store absorbs).
    """

    def __init__(self, spark, path: str, num_buckets: int = 32):
        self.spark = spark
        self.path = path.rstrip("/")
        self.num_buckets = num_buckets
        self._store_fs = _StoreFS(spark, self.path)

    def _exists(self) -> bool:
        return self._store_fs.exists("hashes")

    def _bucket(self):
        return F.pmod(F.hash("content_hash"), F.lit(self.num_buckets))

    def probe_new(self, df: DataFrame, text_col: str, id_col: str) -> DataFrame:
        """Read-only: the subset of ``df`` that is NOT already in the
        store and NOT a lower-id duplicate within the batch."""
        hashed = df.withColumn("content_hash", F.md5(F.col(text_col)))
        # batch-internal: keep the lowest id per content hash (groupBy-min
        # + broadcast join back keeps map-side combine; renamed key avoids
        # self-join ambiguity)
        w_min = hashed.groupBy(F.col("content_hash").alias("_ch")).agg(
            F.min(id_col).alias("_keep_id")
        )
        firsts = hashed.join(
            F.broadcast(w_min),
            (F.col("content_hash") == F.col("_ch"))
            & (F.col(id_col) == F.col("_keep_id")),
        ).drop("_ch", "_keep_id")
        if not self._exists():
            return firsts
        probe_bkts = [
            r[0]
            for r in hashed.select(self._bucket().alias("b")).distinct().collect()
        ]
        store = self.spark.read.parquet(f"{self.path}/hashes").where(
            F.col("bkt").isin(probe_bkts)
        )
        seen = (
            store.join(
                F.broadcast(hashed.select("content_hash").distinct()),
                "content_hash",
                "left_semi",
            )
            .select("content_hash")
            .distinct()
        )
        return firsts.join(F.broadcast(seen), "content_hash", "left_anti")

    def process_batch(self, df: DataFrame, text_col: str, id_col: str) -> DataFrame:
        """Return the exact-dup-free subset of ``df`` (first occurrence
        wins across ALL prior batches and within the batch by lowest id)
        and absorb the survivors' content hashes.  Output columns =
        input columns."""
        survivors = self.probe_new(df, text_col, id_col).localCheckpoint(
            eager=True
        )  # pin BEFORE the store mutates
        survivors.select("content_hash").distinct().withColumn(
            "bkt", self._bucket()
        ).write.mode("append").partitionBy("bkt").parquet(f"{self.path}/hashes")
        return survivors.drop("content_hash")

    def compact(self, files_per_bucket: int = 1) -> None:
        """Rewrite the hash table with ``files_per_bucket`` files per
        bucket (see :meth:`MinHashDedupStore.compact` — same contract)."""
        self._store_fs.compact_table(
            "hashes", "bkt", self.num_buckets * files_per_bucket
        )


class EmbeddingDedupStore:
    """Incremental EMBEDDING-cosine near-dedup for continuous ingestion —
    completes the store family (:class:`ExactDedupStore` for verbatim
    copies, :class:`MinHashDedupStore` for text edits, this for semantic
    duplicates whose text differs but whose embeddings coincide).

    IVF layout (operators/similarity.build_ivf_index pattern): centroids
    are picked deterministically from the FIRST batch (smallest
    xxhash64(id) — no trained model, stable across restarts) and frozen;
    state is one append-only postings table (bucket, doc, vec)
    partitioned by home bucket.  A probe assigns each new vector to its
    ``nprobe`` nearest centroids, reads ONLY those bucket directories
    (partition pruning; ≤ num_centroids ids collected), and broadcasts
    the batch side — the store is never shuffled, same contract as the
    sibling stores.  Recall is the IVF trade: a true near-dup pair's
    vectors are nearly parallel, so they agree on home centroid (and a
    fortiori on one of ``nprobe``) except when the pair straddles a
    centroid boundary — raise ``nprobe`` to taste.

    Crash contract: state appends AFTER the survivor set is pinned;
    replays converge (their vectors now match themselves in the store).
    """

    def __init__(
        self,
        spark,
        path: str,
        threshold: float = 0.9,
        num_centroids: int = 16,
        nprobe: int = 2,
        store_replicas: int = 2,
    ):
        self.spark = spark
        self.path = path.rstrip("/")
        self.threshold = threshold
        self.num_centroids = num_centroids
        self.nprobe = nprobe
        self.store_replicas = store_replicas
        self._store_fs = _StoreFS(spark, self.path)

    def _exists(self, sub: str) -> bool:
        return self._store_fs.exists(sub)

    def compact(self, files_per_bucket: int = 1) -> None:
        """Rewrite the postings table with ``files_per_bucket`` files
        per centroid bucket (see :meth:`MinHashDedupStore.compact`)."""
        self._store_fs.compact_table(
            "postings", "bucket", self.num_centroids * files_per_bucket
        )

    def _centroids(self, batch_vecs: DataFrame) -> DataFrame:
        """Load the frozen centroid set, creating it from this batch on
        first use."""
        if not self._exists("centroids"):
            (
                batch_vecs.withColumn("_h", F.xxhash64("doc"))
                .orderBy("_h")
                .limit(self.num_centroids)
                .select(F.col("doc").alias("centroid_id"), F.col("vec").alias("centvec"))
                .write.mode("overwrite")
                .parquet(f"{self.path}/centroids")
            )
        return self.spark.read.parquet(f"{self.path}/centroids")

    def _assign(self, vecs: DataFrame, centroids: DataFrame, top_n: int) -> DataFrame:
        """(doc, vec, bucket, _rn): each vector's top_n nearest centroids
        (rank 1 = home bucket).  One broadcast of the tiny centroid set;
        assignment is a map over the batch."""
        from pyspark.sql import Window

        from .similarity import cosine

        scored = vecs.join(F.broadcast(centroids)).select(
            "doc", "vec", "centroid_id", cosine(F.col("vec"), F.col("centvec")).alias("_cc")
        )
        w = Window.partitionBy("doc").orderBy(F.desc("_cc"), F.asc("centroid_id"))
        return (
            scored.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") <= top_n)
            .select("doc", "vec", F.col("centroid_id").alias("bucket"), "_rn")
        )

    def probe_dups(self, df: DataFrame, vec_col: str, id_col: str) -> DataFrame:
        """Read-only: ids in ``df`` whose vector matches (cosine ≥
        threshold) an accepted vector in a probed bucket, or a lower-id
        batch row sharing a home bucket."""
        from .similarity import cosine

        vecs = df.select(
            F.col(id_col).alias("doc"), F.col(vec_col).alias("vec")
        ).localCheckpoint(eager=True)  # feeds centroid-init + 2 assigns
        centroids = self._centroids(vecs)
        probes = self._assign(vecs, centroids, self.nprobe).localCheckpoint(eager=True)

        # batch-internal: any shared probe bucket, keep the lower id
        internal = (
            probes.alias("a")
            .join(
                F.broadcast(probes.alias("b")),
                (F.col("a.bucket") == F.col("b.bucket"))
                & (F.col("a.doc") < F.col("b.doc")),
            )
            .where(cosine(F.col("a.vec"), F.col("b.vec")) >= self.threshold)
            .select(F.col("b.doc").alias("dup"))
            .distinct()
        )
        if not self._exists("postings"):
            return internal
        probe_bkts = [r[0] for r in probes.select("bucket").distinct().collect()]
        store = self.spark.read.parquet(f"{self.path}/postings").where(
            F.col("bucket").isin(probe_bkts)
        )
        cross = (
            store.alias("o")
            .join(
                F.broadcast(probes.alias("n")),
                F.col("o.bucket") == F.col("n.bucket"),
            )
            .where(cosine(F.col("o.vec"), F.col("n.vec")) >= self.threshold)
            .select(F.col("n.doc").alias("dup"))
            .distinct()
        )
        return cross.unionByName(internal).distinct()

    def process_batch(self, df: DataFrame, vec_col: str, id_col: str) -> DataFrame:
        """Return the semantically-novel subset of ``df`` and absorb its
        vectors.  Output columns = input columns."""
        dup_ids = self.probe_dups(df, vec_col, id_col)
        survivors = df.join(
            dup_ids.withColumnRenamed("dup", id_col), id_col, "left_anti"
        ).localCheckpoint(eager=True)  # pin BEFORE the store mutates

        vecs = survivors.select(
            F.col(id_col).alias("doc"), F.col(vec_col).alias("vec")
        )
        centroids = self._centroids(vecs)
        homes = self._assign(vecs, centroids, self.store_replicas).select(
            "bucket", "doc", "vec"
        )
        homes.write.mode("append").partitionBy("bucket").parquet(
            f"{self.path}/postings"
        )
        return survivors
