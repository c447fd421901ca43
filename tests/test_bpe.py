"""BPE token counting: hand-derived merges, equivalence of the
expression path (rank-order literal replaces) and the classic
lowest-rank-pair-first encoder, and the quality-gate integration."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fluent_plugin_sql_spark.functions.text import (
    DEFAULT_BPE_MERGES,
    bpe_encode_count,
    bpe_token_count,
    bpe_token_count_udf,
    quality_predicate,
)

_RANKS = {m: i for i, m in enumerate(DEFAULT_BPE_MERGES)}


class TestClassicEncoder:
    @pytest.mark.parametrize(
        "word,want",
        [
            # hand-derived with the DEFAULT_BPE_MERGES table
            ("the", 1),     # t h e -> th e -> the
            ("then", 2),    # t h e n -> th e n -> the n? no: (e,n)@7 vs
                            # (th,e)@1 -> th e n -> the n -> 2
            ("and", 1),     # a n d -> an d -> and
            ("thing", 2),   # t h i n g -> th i n g -> th in g -> th ing
            ("ringing", 3),  # r in g in g -> r ing ing
            ("zzz", 3),     # no merges apply
            ("a", 1),
            ("", 0),
            ("xenon", 3),   # x e n o n -> x en on
        ],
    )
    def test_hand_derived_counts(self, word, want):
        assert bpe_encode_count(word, _RANKS) == want

    def test_overlap_is_left_to_right(self):
        # "aaa" with merge (a,a): leftmost-non-overlapping -> [aa, a]
        assert bpe_encode_count("aaa", {("a", "a"): 0}) == 2
        assert bpe_encode_count("aaaa", {("a", "a"): 0}) == 2  # aa aa -> ?
        # (aa,aa) not in ranks -> stays 2

    def test_rank_priority_beats_position(self):
        # (b,c) rank 0 beats earlier-position (a,b) rank 1: a b c ->
        # a bc (then (a,bc) unknown) = 2 tokens
        assert bpe_encode_count("abc", {("b", "c"): 0, ("a", "b"): 1}) == 2


class TestPathEquivalence:
    def test_expression_equals_encoder_on_corpus(self, spark, sf_dir):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        out = docs.select(
            bpe_token_count("text").alias("a"),
            bpe_token_count_udf()(F.col("text")).alias("b"),
        )
        assert out.where(F.col("a") != F.col("b")).count() == 0

    def test_expression_on_handmade_rows(self, spark):
        rows = [
            (1, "the thing and another thing"),
            (2, "To Be OR NOT to be, that is the question!"),
            (3, ""),
            (4, None),
            (5, "123 456 --- !!!"),
            (6, "interesting orthogonal antidisestablishmentarianism"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            r.doc_id: (r.a, r.b)
            for r in df.select(
                "doc_id",
                bpe_token_count("text").alias("a"),
                bpe_token_count_udf()(F.col("text")).alias("b"),
            ).collect()
        }
        import re

        for doc_id, text in rows:
            if text is None:
                assert got[doc_id] == (None, None)
                continue
            want = sum(
                bpe_encode_count(w, _RANKS)
                for w in re.findall("[a-z]+", text.lower())
            )
            assert got[doc_id] == (want, want), (doc_id, text)

    def test_custom_merge_table(self, spark):
        merges = [("a", "b"), ("ab", "c")]
        df = spark.createDataFrame([(1, "abc abcabc zab")], "i long, text string")
        a, b = df.select(
            bpe_token_count("text", merges).alias("a"),
            bpe_token_count_udf(merges)(F.col("text")).alias("b"),
        ).first()
        # abc->1, abcabc->2, zab->2
        assert (a, b) == (5, 5)


class TestQualityGateBpeMode:
    def test_budget_mode_switches_counter(self, spark):
        df = spark.createDataFrame(
            [(1, "the and to"), (2, "zzz qqq xxx")],
            "doc_id long, text string",
        )
        # whitespace: both have 3 tokens; BPE: doc 1 = 3, doc 2 = 9
        ws = df.where(
            quality_predicate({"min_tokens": 4}, "text")
        ).count()
        bpe = df.where(
            quality_predicate(
                {"min_tokens": 4, "token_budget_mode": "bpe"}, "text"
            )
        ).count()
        assert ws == 0
        assert bpe == 1

    def test_bad_mode_rejected(self):
        with pytest.raises(ValueError, match="token_budget_mode"):
            quality_predicate({"token_budget_mode": "gpt"}, "text")
