"""Vectorized (Arrow + numpy) dense-math path for the embedding
operators — the per-core throughput lever.

Reference parity note: the reference plugin (`/root/reference/lib/
fluent/plugin/in_sql.rb`) has no vector surface; this module belongs to
the training-data-pipeline extension scope.

Why it exists: every distance in the fold path (`similarity.dot`,
`cluster._sq_l2`) is an interpreted ``zip_with`` + ``aggregate``
higher-order-function expression.  Those are CodegenFallback in Spark —
measured ~1.6M dim-32 folds/s box-wide on 32 cores — so at 100 TB an
embedding pass is arithmetic-bound two orders of magnitude below what
the same cores deliver as BLAS matmuls.  This module runs the SAME math
as batched numpy matrix products over Arrow-transferred chunks
(``mapInPandas`` / ``applyInPandas``): one ``batch × k`` GEMM per Arrow
batch instead of ``batch × k`` interpreted folds.

Contract vs the fold path:

- **The fold path stays the default and the oracle mode.**  Every gate
  query's DuckDB oracle models the order-exact sequential fold;
  ``numeric_mode="vectorized"`` is the opt-in scale path.
- **Same results up to summation order.**  numpy reduces with
  pairwise/SIMD summation, the fold sequentially — doubles agree to a
  relative ~1e-15, so ROUNDED scores (the operators round cosine to 4
  decimals) and argmin/top-k SETS are identical unless a true value
  sits within an ulp of a rounding/tie boundary — the same
  vanishing-collision class the centroid grid documents.  Equality of
  the full top-k/assignment output on the gate corpora is asserted in
  tests/test_dense.py.
- **Same dirty-data semantics**, replicated explicitly: NULL/wrong-dim
  vectors drop; zero norms give NULL cosine (dropped from rankings,
  never pruned on); NaN follows Spark SQL semantics (NaN is GREATER
  than everything: ranks first in a desc top-k, and ``NaN >= tau`` is
  true in a prune predicate).

Scale shape: identical to the fold plans — the query/centroid side is
small and driver-collected (the fold path broadcasts the same table
whole to every executor; collecting it is the same boundedness
contract), the corpus side streams through Arrow batches with
per-partition pruning, and the only shuffle carries the pruned
candidate/argmin rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _np_round_half_up(x, decimals: int):
    """Round half AWAY FROM ZERO like Spark's ``F.round`` (numpy's own
    ``round`` is half-to-even).  NaN/Inf pass through."""
    import numpy as np

    p = 10.0**decimals
    with np.errstate(invalid="ignore"):
        return np.sign(x) * np.floor(np.abs(x) * p + 0.5) / p


def _collect_vectors(df: DataFrame, id_col: str, vec_col: str, what: str):
    """Driver-side (ids, matrix, dim) of a SMALL single-dim vector
    table — the side the fold path broadcasts whole.  Mixed dims raise
    (a mixed-dim CENTROID table is a caller bug, not dirty data)."""
    import numpy as np

    rows = [
        (r[0], r[1])
        for r in df.select(id_col, vec_col).collect()
        if r[0] is not None and r[1] is not None
    ]
    if not rows:
        return [], np.zeros((0, 0)), None
    dims = {len(v) for _, v in rows}
    if len(dims) != 1:
        raise ValueError(
            f"vectorized mode needs a single {what}-side dim, got {sorted(dims)}"
        )
    ids = [i for i, _ in rows]
    mat = np.array(
        [[np.nan if x is None else float(x) for x in v] for _, v in rows],
        dtype=np.float64,
    )
    return ids, mat, mat.shape[1]


def _collect_query_groups(queries: DataFrame, id_col: str, vec_col: str):
    """Driver-side query groups keyed by vector LENGTH.  The fold path
    pairs every (query, corpus) row and lets ``zip_with`` NULL any
    length-mismatched pair — i.e. each query only ever scores corpus
    vectors of its OWN length.  Grouping by dim replicates that
    exactly, so dirty mixed-dim corpora behave identically instead of
    raising.  Each group: (dim, id_array, matrix, norms, id→columns)."""
    import collections

    import numpy as np

    by_dim: dict = collections.defaultdict(list)
    # the string form keys the executor-side self-pair mask: corpus ids
    # travel through Arrow AS STRINGS (see brute_force_topk_vectorized)
    # so the mask must compare in the same domain
    for r in queries.select(
        id_col, F.col(id_col).cast("string"), vec_col
    ).collect():
        if r[0] is not None and r[2] is not None:
            by_dim[len(r[2])].append((r[0], r[1], r[2]))
    groups = []
    for d, rows in sorted(by_dim.items()):
        if d == 0:
            # zero-length vectors have zero norm → NULL cosine → every
            # pair drops in the fold path; skipping the group is exact
            # (and reshape(-1, 0) is ill-defined anyway)
            continue
        ids = np.array([i for i, _, _ in rows], dtype=object)
        mat = np.array(
            [
                [np.nan if x is None else float(x) for x in v]
                for _, _, v in rows
            ],
            dtype=np.float64,
        ).reshape(len(rows), d)
        norm = np.sqrt((mat * mat).sum(axis=1))
        pos: dict = collections.defaultdict(list)
        for idx, (_, s, _) in enumerate(rows):
            pos[s].append(idx)
        groups.append((d, ids, mat, norm, pos))
    return groups


def brute_force_topk_vectorized(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 5,
    round_decimals: int = 4,
) -> DataFrame:
    """`similarity.brute_force_topk` with the scoring stage as numpy
    GEMMs — same output schema ``(query_id, match_id, cos, rank)`` and
    (up to the documented ulp tolerance) the same rows.

    Plan shape: queries are collected once (the fold path broadcasts
    the same table; O(q × dim) driver read), the corpus streams through
    ``mapInPandas`` where each Arrow batch scores ``batch × q`` in one
    matmul; every partition keeps only rows whose cosine ties-or-beats
    its k-th largest per query (a THRESHOLD prune — safe under any tie
    ordering, so the surviving rows are a superset of each partition's
    exact top-k), and the final exact rank runs JVM-side on the
    O(partitions × q × k) survivors — the same pruned-exchange shape
    WindowGroupLimit gives the fold path.
    """
    import numpy as np

    groups = _collect_query_groups(queries, id_col, vec_col)

    from pyspark.sql.types import (
        DoubleType,
        IntegerType,
        StructField,
        StructType,
    )

    from pyspark.sql.types import StringType

    qid_type = queries.schema[id_col].dataType
    cid_type = corpus.schema[id_col].dataType
    if not groups:
        return corpus.sparkSession.createDataFrame(
            [],
            StructType(
                [
                    StructField("query_id", qid_type),
                    StructField("match_id", cid_type),
                    StructField("cos", DoubleType()),
                    StructField("rank", IntegerType()),
                ]
            ),
        )
    # corpus ids cross the Arrow boundary AS STRINGS and are cast back
    # JVM-side after the prune: Spark→pandas turns a nullable long
    # column into float64, which both hides NULLs from `is None` checks
    # and silently mangles ids above 2^53 — the string round-trip is
    # lossless for integral and string id types (the supported ones)
    from pyspark.sql.types import BooleanType

    # NaN cosines ride as (cos=0.0, is_nan=true): pandas→Arrow treats
    # float NaN as NULL, which would silently demote Spark's
    # NaN-ranks-first semantics to NULL-drops-last
    out_schema = StructType(
        [
            StructField("query_id", qid_type),
            StructField("match_id", StringType()),
            StructField("cos", DoubleType()),
            StructField("is_nan", BooleanType()),
        ]
    )
    out_fields = corpus.select(
        F.col(id_col).cast("string").alias("match_id"),
        F.col(vec_col).alias("cvec"),
    )

    def score(batches):
        import pandas as pd

        buf_q, buf_m, buf_c = [], [], []
        for pdf in batches:
            # .isna(), not `is None`: Spark → pandas turns a nullable
            # long column into float64 with NaN for NULL ids
            id_ok = (~pdf["match_id"].isna()).to_numpy()
            all_ids = pdf["match_id"].to_numpy()
            vecs = pdf["cvec"]
            lens = np.fromiter(
                (-1 if v is None else len(v) for v in vecs),
                dtype=np.int64,
                count=len(vecs),
            )
            for qdim, qid_arr, qmat, qnorm, qpos in groups:
                ok = (lens == qdim) & id_ok
                if not ok.any():
                    continue
                ids = all_ids[ok]
                cmat = np.array(
                    [np.asarray(v, dtype=np.float64) for v in vecs[ok]],
                    dtype=np.float64,
                ).reshape(-1, qdim)
                with np.errstate(divide="ignore", invalid="ignore"):
                    cnorm = np.sqrt((cmat * cmat).sum(axis=1))
                    # (b, q) GEMM — THE vectorized hot loop
                    dots = cmat @ qmat.T
                    denom = cnorm[:, None] * qnorm[None, :]
                    cos = dots / denom
                cos = _np_round_half_up(cos, round_decimals)
                # fold-path semantics: zero-norm denominators → NULL →
                # dropped; self-pairs excluded; NaN scores KEPT and
                # ranked first (Spark sorts NaN greatest)
                valid = denom != 0.0
                for bi, cid in enumerate(ids):  # self-pair mask, O(b)
                    for qj in qpos.get(cid, ()):
                        valid[bi, qj] = False
                key = np.where(np.isnan(cos), np.inf, cos)
                key = np.where(valid, key, -np.inf)
                if k < key.shape[0]:
                    kth = np.partition(key, key.shape[0] - k, axis=0)[
                        key.shape[0] - k
                    ]
                else:
                    kth = np.full(key.shape[1], -np.inf)
                keep = (key >= kth) & valid & (key > -np.inf)
                bi, qj = np.nonzero(keep)
                if len(bi):
                    buf_q.append(qid_arr[qj])
                    buf_m.append(ids[bi])
                    buf_c.append(cos[bi, qj])
        if not buf_q:
            return
        q = np.concatenate(buf_q)
        m = np.concatenate(buf_m)
        c = np.concatenate(buf_c)
        # cross-batch re-prune bounds the partition's output at
        # ~q × (k + ties) rows no matter how many batches it saw
        frame = pd.DataFrame(
            {"query_id": q, "match_id": m, "cos": c,
             "k": np.where(np.isnan(c), np.inf, c)}
        )
        # vectorized per-query threshold (no per-group lambda): sort by
        # (query, key desc); the group's k-th row holds its threshold
        frame = frame.sort_values(
            ["query_id", "k"], ascending=[True, False], kind="mergesort"
        )
        pos = frame.groupby("query_id", sort=False).cumcount()
        sizes = frame.groupby("query_id", sort=False)["k"].transform("size")
        at_kth = pos == np.minimum(k, sizes) - 1
        thr = frame.loc[at_kth, ["query_id", "k"]].rename(
            columns={"k": "_thr"}
        )
        frame = frame.merge(thr, on="query_id", how="left")
        out = frame.loc[
            frame["k"] >= frame["_thr"], ["query_id", "match_id", "cos"]
        ]
        out = out.assign(is_nan=np.isnan(out["cos"].to_numpy()))
        out.loc[out["is_nan"], "cos"] = 0.0
        yield out

    cand = (
        out_fields.mapInPandas(score, out_schema)
        .select(
            "query_id",
            # cast back BEFORE ranking: the id tie-break must order in
            # the original domain (long 2 < 10, but string "10" < "2")
            F.col("match_id").cast(cid_type).alias("match_id"),
            F.when(F.col("is_nan"), F.lit(float("nan")))
            .otherwise(F.col("cos"))
            .alias("cos"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("match_id"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "match_id", "cos", "rank")
    )


def assign_argmin_vectorized(
    e: DataFrame, cents: DataFrame
) -> DataFrame:
    """Per-ROW nearest-centroid via one ``batch × k`` numpy pass — the
    vectorized drop-in for the scoring half of ``cluster._assign``
    (the JVM-side dup-collapsing ``min(struct)`` aggregate stays).

    Centroids are collected (k × dim — the exact table the fold path
    broadcasts).  Distances use the expanded form
    ``|v|² − 2·v·c + |c|²`` (one GEMM) clamped at 0 — equal to the
    fold's ``Σ(x−y)²`` to ~1e-12 relative; ties and rounding-boundary
    flips are the documented vanishing-collision class.  NaN/Inf
    vectors follow IEEE argmin semantics like the fold (NaN distances
    lose to every finite one; all-NaN rows keep the first centroid).
    Returns ``(vec_id, cid, dist, v)`` one row per input row.

    Arrow NaN transport: pandas→Arrow converts float NaN to NULL (top
    level AND inside arrays), so NaN distances ride a boolean flag and
    NaN vector elements are restored JVM-side with ``coalesce(x, NaN)``.
    One documented semantic difference: a NULL ELEMENT inside an input
    vector is indistinguishable from NaN after the Arrow hop, so
    vectorized mode treats it as a NaN coordinate (the fold path yields
    a NULL distance for it — null-element corpora should use fold
    mode).  Ids are assumed null-free here (callers feed
    ``_valid_vectors`` output) — integral ids above 2^53 in the SAME
    Arrow batch as a NULL id would lose precision in pandas; the
    brute-force scorer's string transport shows the general fix."""
    import numpy as np

    cids, cmat, cdim = _collect_vectors(cents, "cid", "c", "centroid")
    order = np.argsort(np.array(cids))  # argmin tie → smallest cid
    cid_arr = np.array(cids)[order]
    cmat = cmat[order]
    cnorm2 = (cmat * cmat).sum(axis=1)

    from pyspark.sql.types import (
        BooleanType,
        DoubleType,
        IntegerType,
        StructField,
        StructType,
    )

    out_schema = StructType(
        [
            StructField("vec_id", e.schema["vec_id"].dataType),
            StructField("cid", IntegerType()),
            StructField("dist", DoubleType()),
            StructField("dist_nan", BooleanType()),
            StructField("v", e.schema["v"].dataType),
        ]
    )

    def assign(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            vmat = np.array(
                [np.asarray(v, dtype=np.float64) for v in pdf["v"]],
                dtype=np.float64,
            )
            with np.errstate(invalid="ignore", over="ignore"):
                vnorm2 = (vmat * vmat).sum(axis=1)
                d = (
                    vnorm2[:, None]
                    - 2.0 * (vmat @ cmat.T)
                    + cnorm2[None, :]
                )
                # the expanded form turns an Inf coordinate into
                # inf − inf = NaN where the fold gets a clean Inf
                # distance — recompute non-finite rows/columns with the
                # direct Σ(x−y)² (they are rare; the GEMM stays the
                # bulk path)
                bad_r = ~np.isfinite(vmat).all(axis=1)
                if bad_r.any():
                    diff = vmat[bad_r][:, None, :] - cmat[None, :, :]
                    d[bad_r] = (diff * diff).sum(axis=2)
                bad_c = ~np.isfinite(cmat).all(axis=1)
                if bad_c.any():
                    diff = vmat[:, None, :] - cmat[None, bad_c, :]
                    d[:, bad_c] = (diff * diff).sum(axis=2)
                np.maximum(d, 0.0, out=d, where=~np.isnan(d))
            # IEEE argmin with NaN-last: numpy argmin propagates NaN,
            # Spark's min(struct) ranks NaN greatest — mask NaN to +inf,
            # then repair the one collision that mask creates: a TRUE
            # +inf distance must beat a NaN one (fold: inf < NaN), but
            # both carry key inf and argmin would pick by column index
            nanmask = np.isnan(d)
            key = np.where(nanmask, np.inf, d)
            j = np.argmin(key, axis=1)
            rows = np.arange(len(j))
            fix = nanmask[rows, j] & (~nanmask).any(axis=1)
            if fix.any():
                # picked NaN while a non-NaN exists ⟹ every non-NaN is
                # exactly inf ⟹ the right pick is the first (smallest
                # cid) non-NaN column
                j[fix] = np.argmax(~nanmask[fix], axis=1)
            dist = d[rows, j]
            dn = np.isnan(dist)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].values,
                    "cid": cid_arr[j].astype("int32"),
                    "dist": np.where(dn, 0.0, dist),
                    "dist_nan": dn,
                    "v": pdf["v"].values,
                }
            )

    nan = F.lit(float("nan"))
    return e.mapInPandas(assign, out_schema).select(
        "vec_id",
        "cid",
        F.when(F.col("dist_nan"), nan).otherwise(F.col("dist")).alias("dist"),
        F.transform("v", lambda x: F.coalesce(x, nan)).alias("v"),
    )


def _sq_dists_gram(vmat, cmat, cnorm2):
    """Squared L2 distances (b×k) via the expanded |v|²−2v·c+|c|² GEMM,
    with exact direct recompute of non-finite rows/columns (the
    expansion turns an Inf coordinate into inf−inf=NaN where the fold
    gets a clean Inf) and a ≥0 clamp."""
    import numpy as np

    with np.errstate(invalid="ignore", over="ignore"):
        vnorm2 = (vmat * vmat).sum(axis=1)
        d = vnorm2[:, None] - 2.0 * (vmat @ cmat.T) + cnorm2[None, :]
        bad_r = ~np.isfinite(vmat).all(axis=1)
        if bad_r.any():
            diff = vmat[bad_r][:, None, :] - cmat[None, :, :]
            d[bad_r] = (diff * diff).sum(axis=2)
        bad_c = ~np.isfinite(cmat).all(axis=1)
        if bad_c.any():
            diff = vmat[:, None, :] - cmat[None, bad_c, :]
            d[:, bad_c] = (diff * diff).sum(axis=2)
        np.maximum(d, 0.0, out=d, where=~np.isnan(d))
    return d


def _argmin_spark_nan(d):
    """Row argmin of a distance matrix under Spark's NaN-greatest
    ordering: NaN loses to every number INCLUDING +inf; ties break to
    the first (lowest-index) column.  Returns (j, dist, is_nan)."""
    import numpy as np

    nanmask = np.isnan(d)
    key = np.where(nanmask, np.inf, d)
    j = np.argmin(key, axis=1)
    rows = np.arange(len(j))
    fix = nanmask[rows, j] & (~nanmask).any(axis=1)
    if fix.any():
        j[fix] = np.argmax(~nanmask[fix], axis=1)
    dist = d[rows, j]
    return j, dist, np.isnan(dist)


def two_level_argmin_vectorized(
    e: DataFrame,
    coarse_rows: list,
    fine_rows: list,
    nprobe: int,
) -> DataFrame:
    """The corpus side of ``cluster.assign_two_level`` as numpy GEMMs:
    coarse routing (b×m), stable-sorted top-``nprobe`` cells (ties break
    to the lower gid — the fold path's ``array_sort(struct(d, g))``
    order), then per-cell fine GEMMs merged under the (is_nan, dist,
    cid) order Spark's ``min(struct)`` implements.  ``coarse_rows`` =
    [(gid, vec)] sorted by gid (occupied cells only); ``fine_rows`` =
    [(gid, cid, vec)] — the same tables the fold path broadcasts.
    Returns one row per input row ``(vec_id, cid, dist, dist_nan)``;
    the caller collapses dup ids JVM-side exactly like the fold."""
    import numpy as np

    gmat = np.array([list(map(float, g)) for _, g in coarse_rows])
    gnorm2 = (gmat * gmat).sum(axis=1)
    by_cell: dict = {}
    for gid, cid, c in fine_rows:
        by_cell.setdefault(gid, []).append((cid, c))
    gid_to_idx = {gid: i for i, (gid, _) in enumerate(coarse_rows)}
    cells = []
    for gid, pairs in by_cell.items():
        pairs.sort(key=lambda t: t[0])  # argmin tie → smallest cid
        cmat = np.array([list(map(float, c)) for _, c in pairs])
        cells.append(
            (
                gid_to_idx[gid],
                np.array([cid for cid, _ in pairs]),
                cmat,
                (cmat * cmat).sum(axis=1),
            )
        )
    np_probe = min(nprobe, len(coarse_rows))

    from pyspark.sql.types import (
        BooleanType,
        DoubleType,
        IntegerType,
        StructField,
        StructType,
    )

    out_schema = StructType(
        [
            StructField("vec_id", e.schema["vec_id"].dataType),
            StructField("cid", IntegerType()),
            StructField("dist", DoubleType()),
            StructField("dist_nan", BooleanType()),
        ]
    )

    def assign(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            vmat = np.array(
                [np.asarray(v, dtype=np.float64) for v in pdf["v"]],
                dtype=np.float64,
            )
            b = len(vmat)
            dg = _sq_dists_gram(vmat, gmat, gnorm2)
            # stable sort: equal coarse distances keep column order =
            # ascending gid, matching the fold's struct(d, g) sort.
            # NaN coarse distances sort LAST under numpy — same place
            # Spark's array_sort puts NaN structs.
            order = np.argsort(dg, axis=1, kind="stable")[:, :np_probe]
            best_d = np.full(b, np.inf)
            best_c = np.full(b, -1, dtype=np.int64)
            best_nan = np.zeros(b, dtype=bool)
            seen = np.zeros(b, dtype=bool)
            for cell_idx, cids, cmat, cnorm2 in cells:
                rows = np.nonzero((order == cell_idx).any(axis=1))[0]
                if not len(rows):
                    continue
                d = _sq_dists_gram(vmat[rows], cmat, cnorm2)
                j, dist, isnan = _argmin_spark_nan(d)
                cand_c = cids[j]
                # merge under (is_nan, dist, cid): NaN loses to any
                # number; ties break to the smaller cid
                cur_d, cur_c, cur_n = (
                    best_d[rows], best_c[rows], best_nan[rows],
                )
                dk = np.where(isnan, np.inf, dist)
                ck = np.where(cur_n, np.inf, cur_d)
                take = (
                    ~seen[rows]
                    | (~isnan & cur_n)
                    | ((isnan == cur_n) & (dk < ck))
                    | ((isnan == cur_n) & (dk == ck) & (cand_c < cur_c))
                )
                best_d[rows] = np.where(take, dist, cur_d)
                best_c[rows] = np.where(take, cand_c, cur_c)
                best_nan[rows] = np.where(take, isnan, cur_n)
                seen[rows] = True
            ok = seen
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].values[ok],
                    "cid": best_c[ok].astype("int32"),
                    "dist": np.where(best_nan[ok], 0.0, best_d[ok]),
                    "dist_nan": best_nan[ok],
                }
            )

    return e.mapInPandas(assign, out_schema)


def weights_argmin_vectorized(
    finite: DataFrame, cand_rows: list
) -> DataFrame:
    """The k-means|| weighting pass as one GEMM per Arrow batch:
    per-corpus-row argmin over the collected candidate table (the same
    one-row array the fold path broadcasts), emitted as ``cand_pos``
    (the candidate's index in ``cand_rows``, which the caller maps back
    to ids) — positions, not ids, so string-id candidate tables never
    touch the Arrow id-mangling path.  The JVM side does the count."""
    import numpy as np

    cmat = np.array([list(map(float, v)) for _, v in cand_rows])
    cnorm2 = (cmat * cmat).sum(axis=1)

    from pyspark.sql.types import IntegerType, StructField, StructType

    out_schema = StructType([StructField("cand_pos", IntegerType())])

    def assign(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            vmat = np.array(
                [np.asarray(v, dtype=np.float64) for v in pdf["v"]],
                dtype=np.float64,
            )
            d = _sq_dists_gram(vmat, cmat, cnorm2)
            j, _, _ = _argmin_spark_nan(d)
            yield pd.DataFrame({"cand_pos": j.astype("int32")})

    return finite.mapInPandas(assign, out_schema)


def dmin_update_vectorized(
    state: DataFrame, cand_vecs: list, first: bool = False
) -> DataFrame:
    """One k-means|| sampling-round dmin update as a GEMM:
    ``dmin' = min(dmin, min_c Σ(v−c)²)`` against the round's ≤l new
    candidates (closed over driver-side — the fold path broadcasts the
    same array).  ``state`` is ``(vec_id, v[, dmin])`` over FINITE
    vectors only (the sampling universe), so no NaN handling is needed;
    returns the same shape with ``dmin`` (re)computed."""
    import numpy as np

    cmat = np.array(
        [[float(x) for x in v] for v in cand_vecs], dtype=np.float64
    )
    cnorm2 = (cmat * cmat).sum(axis=1)

    from pyspark.sql.types import DoubleType, StructField, StructType

    out_schema = StructType(
        [
            StructField("vec_id", state.schema["vec_id"].dataType),
            StructField("v", state.schema["v"].dataType),
            StructField("dmin", DoubleType()),
        ]
    )

    def upd(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            vmat = np.array(
                [np.asarray(v, dtype=np.float64) for v in pdf["v"]],
                dtype=np.float64,
            )
            d = _sq_dists_gram(vmat, cmat, cnorm2).min(axis=1)
            if not first:
                d = np.minimum(d, pdf["dmin"].to_numpy())
            yield pd.DataFrame(
                {"vec_id": pdf["vec_id"].values, "v": pdf["v"].values,
                 "dmin": d}
            )

    return state.mapInPandas(upd, out_schema)


def semdedup_pairs_vectorized(
    av: DataFrame, tau: float, id_col: str = "vec_id"
) -> DataFrame:
    """The pruned-id set of SemDeDup's within-group pair comparison as
    one ``applyInPandas`` per ``_pk`` group: normalize the group's
    vectors, one Gram matmul, prune every id with a LOWER-id neighbor
    at cosine ≥ tau.  Group sizes are bounded by the salt cap upstream,
    so the Gram matrix is ≤ cap² — executor-sized by construction.

    Fold-parity semantics: zero-norm vectors never prune nor get pruned
    (NULL cosine); NaN cosines DO prune (Spark SQL treats NaN as
    greater than every threshold)."""
    import numpy as np

    from pyspark.sql.types import StructField, StructType

    out_schema = StructType(
        [StructField(id_col, av.schema[id_col].dataType)]
    )

    def prune(pdf):
        import pandas as pd

        pdf = pdf.sort_values(id_col, kind="mergesort").reset_index(drop=True)
        vmat = np.array(
            [np.asarray(v, dtype=np.float64) for v in pdf["v"]],
            dtype=np.float64,
        )
        norm = np.sqrt((vmat * vmat).sum(axis=1))
        ok = norm != 0.0
        safe = np.where(ok, norm, 1.0)
        vhat = vmat / safe[:, None]
        g = vhat @ vhat.T
        # NaN >= tau is TRUE in Spark SQL (NaN greatest) — replicate
        hit = (g >= tau) | np.isnan(g)
        hit &= ok[:, None] & ok[None, :]
        # strictly-lower-id prior row prunes a later one
        hit &= np.tri(len(pdf), k=-1, dtype=bool).T
        pruned = hit.any(axis=0)
        return pd.DataFrame({id_col: pdf.loc[pruned, id_col].values})

    return av.groupBy("_pk").applyInPandas(prune, out_schema).distinct()
