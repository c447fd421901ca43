"""Round-8 scale hardening: the MinHash verify-join broadcast guard.

Force-broadcasting the candidate neighborhood is only safe while it IS
small; a pathological corpus (everything near-identical) makes candidates
a large fraction of the input and the hint becomes a driver/executor OOM
at scale.  Above a threshold the hints must vanish (AQE decides) with
bit-identical output.
"""

from __future__ import annotations

from fluent_plugin_sql_spark.operators.dedup import minhash_lsh_dup_pairs


def _mk_corpus(spark, n_groups=8, group_size=6):
    """n_groups near-dup cliques plus singletons — a dense candidate set."""
    rows = []
    did = 0
    for g in range(n_groups):
        base = " ".join(f"g{g}tok{j}" for j in range(20))
        for m in range(group_size):
            # one trailing token differs per member → high but <1 Jaccard
            rows.append((did, base + f" tail{m}"))
            did += 1
    for s in range(10):
        rows.append((did, " ".join(f"solo{s}w{j}" for j in range(15))))
        did += 1
    return spark.createDataFrame(rows, "doc_id LONG, text STRING")


def _logical_hint_count(df) -> int:
    return df._jdf.queryExecution().analyzed().toString().count("ResolvedHint")


def test_minhash_verify_shuffle_path_identical_output(spark):
    corpus = _mk_corpus(spark)

    bc = minhash_lsh_dup_pairs(corpus, "text", "doc_id", threshold=0.7)
    sh = minhash_lsh_dup_pairs(
        corpus, "text", "doc_id", threshold=0.7, broadcast_verify_threshold=0
    )

    # the guard actually changes the plan: hints present on the small
    # path (the a/b verify joins; the cand_ids hint sits behind the
    # localCheckpoint lineage cut), absent on the forced-shuffle path
    assert _logical_hint_count(bc) == 2
    assert _logical_hint_count(sh) == 0

    a = sorted(map(tuple, bc.collect()))
    b = sorted(map(tuple, sh.collect()))
    assert a == b and len(a) > 0
    # sanity: each clique's pairs survived verification
    pair_ids = {p for r in a for p in (r[0], r[1])}
    assert len(pair_ids) >= 40
