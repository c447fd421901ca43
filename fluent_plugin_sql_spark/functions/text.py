"""Text-analysis scalar surface for LLM-data pipelines (north star:
BASELINE.json "LLM-data-pipeline operators").

Everything here is a JVM-side Column expression (split / higher-order
array functions / md5) — no Python UDFs — so text processing runs inside
whole-stage codegen and scales linearly with no serde overhead.  The
md5-derived 60-bit hash is the engine's portable hash primitive: identical
results in Spark (``conv(substr(md5(x),1,15),16,10)``) and any ANSI engine
with md5, which is what makes dedup/fingerprint results reproducible
across engines and cluster topologies (unlike partition-order-dependent
or JVM-seeded hashes).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# modular prime for rolling hashes (fits bigint arithmetic without overflow)
FINGERPRINT_MOD = 1_000_000_007

# small English stopword list (public-domain common words)
STOPWORDS = (
    "the a an and or of to in is are was were be been it this that with as "
    "for on at by from"
).split()


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def md5_long(col: Column | str) -> Column:
    """Portable 60-bit hash: first 15 hex digits of md5 as bigint."""
    return F.conv(F.substring(F.md5(_c(col)), 1, 15), 16, 10).cast("long")


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization (single-space normalized corpus)."""
    return F.split(_c(col), " ")


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col))


def word_token_count(col: Column | str) -> Column:
    """BPE-ish regex token count: alphabetic runs (a cheap, deterministic
    proxy for subword pre-tokenization)."""
    return F.regexp_count(_c(col), F.lit("[a-z]+"))


def distinct_token_count(col: Column | str) -> Column:
    return F.size(F.array_distinct(tokens(col)))


# --------------------------------------------------------------- BPE tokens
#
# Real LLM pipelines budget and pack shards by TOKENIZER tokens, not
# whitespace words.  This is a deterministic byte-pair-encoding token
# counter with two implementations that provably agree:
#
# - an EXPRESSION path (JVM, whole-stage codegen): merges applied in
#   rank order as literal string replaces over a separator-charified
#   word.  For a VALID merge list (every merge's parts exist before it
#   — true of any list produced by BPE training) rank-order exhaustive
#   application is equivalent to the classic encoder's
#   lowest-rank-pair-first loop, and Java's String.replace scans
#   left-to-right non-overlapping exactly like the encoder's merge
#   sweep — so both paths produce the same segmentation.  This is the
#   path the DuckDB gate oracle re-derives (replace() has identical
#   semantics there), giving BPE counts a full value-hash oracle.
# - a PANDAS-UDF path (Arrow-batched) running the classic encoder over
#   a broadcast ranks dict — the path for REAL vocabularies (50k
#   merges), where a 50k-deep replace chain is not an expression.
#   Equality of the two paths is asserted in tests on the default
#   vocabulary and on hand-derivable words.
#
# Pre-tokenization: lowercased alphabetic runs ([a-z]+).  Digits,
# punctuation and non-Latin text are NOT counted — this is a budget
# signal for the quality gates and shard packing, not a faithful GPT
# tokenizer; the UDF path accepts any merge table if one is available.

#: Word-internal separator for the expression path — cannot occur in a
#: ``[a-z]+`` word.
BPE_SEP = "\x1f"

#: Compact demonstration vocabulary (frequent English pairs).  VALID by
#: construction: each merge's parts are single letters or the product
#: of an EARLIER merge ("th"@0 before ("th","e")@1, "an"@4 before
#: ("an","d")@6, "in"@2 before ("in","g")@10).
DEFAULT_BPE_MERGES: list[tuple[str, str]] = [
    ("t", "h"),
    ("th", "e"),
    ("i", "n"),
    ("e", "r"),
    ("a", "n"),
    ("o", "n"),
    ("an", "d"),
    ("e", "n"),
    ("t", "o"),
    ("o", "r"),
    ("in", "g"),
    ("a", "t"),
    ("e", "s"),
    ("o", "u"),
    ("i", "t"),
    ("a", "l"),
]


def _bpe_words(col: Column | str) -> Column:
    return F.regexp_extract_all(F.lower(_c(col)), F.lit("[a-z]+"), F.lit(0))


def _bpe_word_token_count(w: Column, merges) -> Column:
    """Token count of ONE word: charify with a leading separator per
    char, apply every merge in rank order as a literal replace, count
    the surviving separators."""
    x = F.regexp_replace(w, "(.)", BPE_SEP + "$1")
    for a, b in merges:
        x = F.replace(x, F.lit(BPE_SEP + a + BPE_SEP + b), F.lit(BPE_SEP + a + b))
    return F.length(x) - F.length(F.replace(x, F.lit(BPE_SEP), F.lit("")))


def bpe_token_count(col: Column | str, merges=None) -> Column:
    """Total BPE token count of a text column (expression path; see the
    section comment).  NULL text yields NULL; no words yields 0."""
    merges = list(merges if merges is not None else DEFAULT_BPE_MERGES)
    return F.aggregate(
        F.transform(_bpe_words(col), lambda w: _bpe_word_token_count(w, merges)),
        F.lit(0),
        lambda acc, x: acc + x,
    )


def bpe_encode_count(word: str, ranks: dict) -> int:
    """Classic BPE encoder (count only): repeatedly merge the
    lowest-rank adjacent pair, left-to-right non-overlapping, until no
    pair is in the ranks table.  The reference algorithm the expression
    path is proven against in tests."""
    parts = list(word)
    while len(parts) > 1:
        best_rank = None
        best_pair = None
        for pair in zip(parts, parts[1:]):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_pair = r, pair
        if best_pair is None:
            break
        a, b = best_pair
        merged = a + b
        out = []
        i = 0
        while i < len(parts):
            if i < len(parts) - 1 and parts[i] == a and parts[i + 1] == b:
                out.append(merged)
                i += 2
            else:
                out.append(parts[i])
                i += 1
        parts = out
    return len(parts)


def bpe_token_count_udf(merges=None):
    """Arrow-batched pandas UDF computing the same count as
    :func:`bpe_token_count` via the classic encoder — the path for real
    (50k-merge) vocabularies.  The ranks dict ships once per executor
    in the UDF closure (a broadcast in all but name); per-word results
    are memoized, so the cost is per DISTINCT word per batch."""
    import functools
    import re

    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    ranks = {
        tuple(m): i
        for i, m in enumerate(merges if merges is not None else DEFAULT_BPE_MERGES)
    }
    word_re = re.compile("[a-z]+")

    def _count(texts):
        @functools.lru_cache(maxsize=1 << 16)
        def one(word):
            return bpe_encode_count(word, ranks)

        def total(t):
            if t is None:
                return None
            return sum(one(w) for w in word_re.findall(t.lower()))

        return texts.map(total)

    # real annotation OBJECTS: the module's `from __future__ import
    # annotations` would stringify inline hints, which pandas_udf's
    # signature inference cannot resolve
    _count.__annotations__ = {"texts": pd.Series, "return": pd.Series}
    return pandas_udf(_count, "int")


def type_token_ratio(col: Column | str) -> Column:
    """Lexical diversity: distinct tokens / total tokens."""
    return F.round(distinct_token_count(col) / token_count(col), 6)


def avg_token_length(col: Column | str) -> Column:
    t = tokens(col)
    total = F.aggregate(
        F.transform(t, lambda x: F.length(x)), F.lit(0), lambda acc, x: acc + x
    )
    return F.round(total / F.size(t), 6)


def stopword_ratio(col: Column | str) -> Column:
    t = tokens(col)
    stops = F.array(*[F.lit(w) for w in STOPWORDS])
    n_stop = F.size(F.filter(t, lambda x: F.array_contains(stops, x)))
    return F.round(n_stop / F.size(t), 6)


def quality_score(col: Column | str) -> Column:
    """Composite quality heuristic in [0,1]: favors mid-length documents
    with diverse vocabulary and a sane stopword rate.  Deterministic
    arithmetic only — reproducible across engines and runs."""
    n = token_count(col)
    length_term = F.least(n / F.lit(50.0), F.lit(1.0))
    diversity_term = distinct_token_count(col) / n
    stop_term = F.lit(1.0) - F.least(stopword_ratio(col) * 2, F.lit(1.0))
    return F.round((length_term + diversity_term + stop_term) / 3.0, 6)


def lang_id(col: Column | str) -> Column:
    """Character/stopword-profile language heuristic.

    Order of checks: CJK codepoints → zh; characteristic function words →
    de/fr/es; English stopwords → en; else unknown.  (On the synthetic
    corpus every document is English-vocabulary, so the heuristic is
    validated engine-vs-engine rather than against the ``lang`` label.)
    """
    c = _c(col)
    padded = F.concat(F.lit(" "), c, F.lit(" "))

    def has_any(words: list[str]) -> Column:
        cond = None
        for w in words:
            t = padded.contains(f" {w} ")
            cond = t if cond is None else (cond | t)
        return cond

    return (
        F.when(c.rlike("[\\x{4e00}-\\x{9fff}]"), "zh")
        .when(has_any(["der", "und", "nicht", "ich", "das"]), "de")
        .when(has_any(["le", "les", "une", "est", "et"]), "fr")
        .when(has_any(["el", "los", "una", "es", "y"]), "es")
        .when(has_any(["the", "a", "is", "and", "of"]), "en")
        .otherwise("unknown")
    )


def doc_fingerprint(col: Column | str) -> Column:
    """Rolling-hash document fingerprint: polynomial fold of the portable
    token hashes, mod a 30-bit prime.  Content-defined (whitespace-
    normalization invariant) and engine-portable."""
    hashes = F.transform(tokens(col), lambda t: md5_long(t))
    return F.aggregate(
        hashes,
        F.lit(0).cast("long"),
        lambda acc, x: (acc * 31 + x) % FINGERPRINT_MOD,
    )


def token_hashes(col: Column | str) -> Column:
    """Array of portable 60-bit token hashes — compute ONCE per row and
    reuse (simhash folds it 60×; rehashing per bit would be 60× the md5s)."""
    return F.transform(tokens(col), lambda t: md5_long(t))


def simhash60_from_hashes(hashes_col: str) -> Column:
    """60-bit SimHash from a precomputed ``token_hashes`` array column.

    Per bit b: sum ±1 over token hashes' bit b; bit set iff sum > 0.
    Pure higher-order-function expression (SQL text because the bit shift
    needs the lambda variable as the shift amount) — per-row, no
    aggregation state, so it parallelizes embarrassingly.  60 bits keeps
    the sketch positive in a signed bigint on every engine.
    """
    return F.expr(
        f"""
        aggregate(
          transform(sequence(0, 59), b ->
            CASE WHEN aggregate(`{hashes_col}`, cast(0 as bigint),
                   (acc, h) -> acc + (((h >> b) & 1) * 2 - 1)) > 0
                 THEN cast(1 as bigint) ELSE cast(0 as bigint) END),
          cast(0 as bigint), (acc, x) -> acc * 2 + x)
        """
    )


def quality_predicate(cfg: dict, text_col: str = "text"):
    """Boolean Column for the Gopher-style quality gate from a config
    block ``{min_tokens, max_tokens, min_ttr, max_stop_ratio}`` — shared
    by the streaming pipeline stage (source.quality_filter) and the
    batch curation runner.  Omitted thresholds are skipped; all checks
    are pure codegen.

    ``token_budget_mode: bpe`` switches the min/max_tokens bounds from
    whitespace tokens to BPE tokens (:func:`bpe_token_count`, the
    expression path) — shard budgets are tokenizer budgets in a real
    pipeline.  Defaults to ``ws`` (whitespace)."""
    from pyspark.sql import functions as F

    mode = cfg.get("token_budget_mode", "ws")
    if mode == "bpe":
        def _tc(c):
            return bpe_token_count(c)
    elif mode == "ws":
        _tc = token_count
    else:
        raise ValueError(
            f"token_budget_mode must be 'ws' or 'bpe', got {mode!r}"
        )
    pred = F.lit(True)
    if "min_tokens" in cfg:
        pred = pred & (_tc(text_col) >= int(cfg["min_tokens"]))
    if "max_tokens" in cfg:
        pred = pred & (_tc(text_col) <= int(cfg["max_tokens"]))
    if "min_ttr" in cfg:
        pred = pred & (type_token_ratio(text_col) >= float(cfg["min_ttr"]))
    if "max_stop_ratio" in cfg:
        pred = pred & (stopword_ratio(text_col) <= float(cfg["max_stop_ratio"]))
    return pred
