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
shuffle-on-key the optimizer can plan).  All hashing is the md5-derived
portable primitive (functions.text.md5_long) so signatures are stable
across engines, runs, and partitionings.
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


def minhash_signatures(
    df: DataFrame, text_col: str, id_col: str, num_hashes: int = 32, k: int = 3
) -> DataFrame:
    """(id, seed, minhash): MinHash signature rows.

    h_i(s) = md5_long(i ':' s) — seed folded into the hashed string, so the
    family is deterministic and engine-portable (no JVM seeds).
    """
    sh = shingle_sets(df, text_col, id_col, k)
    seeds = F.explode(F.sequence(F.lit(0), F.lit(num_hashes - 1))).alias("seed")
    return (
        sh.select("doc", "shingle", seeds)
        .select(
            "doc",
            "seed",
            md5_long(F.concat_ws(":", F.col("seed"), F.col("shingle"))).alias("h"),
        )
        .groupBy("doc", "seed")
        .agg(F.min("h").alias("minhash"))
    )


def minhash_lsh_dup_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    threshold: float = 0.8,
    num_hashes: int = 32,
    bands: int = 8,
    k: int = 3,
) -> DataFrame:
    """MinHash + LSH banding + exact-Jaccard verification.

    rows-per-band = num_hashes/bands (r=4, b=8 default → S-curve knee at
    J ≈ (1/b)^(1/r) ≈ 0.59; J=0.8 pairs collide with P ≈ 0.9996).
    Verification makes precision exact; banding only bounds the candidate
    set, which is the property that survives 100×/1000× scale-up.
    """
    r = num_hashes // bands
    sig = minhash_signatures(df, text_col, id_col, num_hashes, k)
    # band key: band index + the band's r minhashes in seed order
    band_keys = (
        sig.withColumn("band", (F.col("seed") / r).cast("int"))
        .groupBy("doc", "band")
        .agg(
            F.concat_ws(
                ",", F.transform(F.array_sort(F.collect_list(F.struct("seed", "minhash"))), lambda s: s["minhash"])
            ).alias("band_key")
        )
    )
    a = band_keys.alias("a")
    b = band_keys.alias("b")
    candidates = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .select(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .distinct()
    )
    sh = shingle_sets(df, text_col, id_col, k)
    verified = _pair_jaccard(sh).join(candidates, ["doc_a", "doc_b"], "left_semi")
    return (
        verified.where(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", F.round("jaccard", 4).alias("jaccard"))
    )


def simhash_dup_pairs(
    df: DataFrame, text_col: str, id_col: str, max_hamming: int = 6
) -> DataFrame:
    """SimHash near-dup pairs: hamming(simhash_a, simhash_b) ≤ max_hamming.

    The sketch is one 60-bit value per document (constant space); pairing
    here is the simple all-pairs comparison over sketches — at 100 TB,
    block on simhash prefixes (split the 60 bits into max_hamming+1 blocks;
    matching pairs must share ≥1 exact block — same inverted-index trick
    as shingles).
    """
    sk = df.select(
        F.col(id_col).alias("doc"), token_hashes(text_col).alias("hs")
    ).select("doc", simhash60_from_hashes("hs").alias("sk"))
    a, b = sk.alias("a"), sk.alias("b")
    ham = F.bit_count(F.col("a.sk").bitwiseXOR(F.col("b.sk")))
    return (
        a.join(b, F.col("a.doc") < F.col("b.doc"))
        .where(ham <= max_hamming)
        .select(
            F.col("a.doc").alias("doc_a"),
            F.col("b.doc").alias("doc_b"),
            ham.alias("hamming"),
        )
    )


def embedding_dup_pairs(
    df: DataFrame, vec_col: str, id_col: str, threshold: float = 0.9
) -> DataFrame:
    """Embedding-cosine near-dup pairs (id_a < id_b, cosine ≥ threshold).

    Cosine is a zip_with/aggregate expression in double precision —
    JVM-side, no UDF.  All-pairs here; the LSH-bucketed variant for scale
    is operators.similarity.lsh_topk's bucketing applied to pairing.
    """
    from .similarity import cosine

    v = df.select(F.col(id_col).alias("vid"), F.col(vec_col).alias("vec"))
    a, b = v.alias("a"), v.alias("b")
    cos = cosine(F.col("a.vec"), F.col("b.vec"))
    return (
        a.join(b, F.col("a.vid") < F.col("b.vid"))
        .select(
            F.col("a.vid").alias("id_a"),
            F.col("b.vid").alias("id_b"),
            F.round(cos, 4).alias("cos"),
        )
        .where(F.col("cos") >= threshold)
    )
