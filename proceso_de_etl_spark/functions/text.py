"""Text-analysis column expressions (SURVEY.md §2.3 T8-T11).

Everything here is JVM-side (split / filter / regexp / md5 — no
Python UDFs in the hot path). Each Spark builder has a paired SQL
fragment builder so the DuckDB oracles apply the *same* definition —
one source of truth for tokenization and stopword lists.

Portability constraints honored by design:
- tokenization = lower + split on ``[^a-z0-9]+`` + drop empties
  (identical semantics in Java regex and RE2);
- hashes that cross engines use md5 hex strings (identical
  everywhere), never xxhash64/hash (engine-internal).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# Per-language stopword marker sets for the n-gram/stopword lang-ID
# heuristic. Tiny by design: the operator's shape (tokenize → set
# hits → argmax) is what matters; swap in real lists in production.
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is"),
    "es": ("el", "la", "de", "y", "que", "los", "una"),
    "fr": ("le", "la", "et", "les", "des", "une", "est"),
    "de": ("der", "die", "und", "das", "ein", "ist", "nicht"),
}
LANG_PRIORITY = ("en", "es", "fr", "de", "zh")
CJK_PATTERN = r"[\x{4e00}-\x{9fff}]"
BPE_ISH_PATTERN = r"[a-z]+|[0-9]|[^a-z0-9\s]"

TOKEN_SPLIT = "[^a-z0-9]+"


def tokens(c: Column) -> Column:
    """lower → split on non-alphanumeric runs → drop empties."""
    return F.filter(F.split(F.lower(c), TOKEN_SPLIT), lambda x: x != F.lit(""))


def tokens_sql(expr: str) -> str:
    return (
        f"list_filter(regexp_split_to_array(lower({expr}), '{TOKEN_SPLIT}'), x -> x <> '')"
    )


_ALNUM_SPACE = (
    "abcdefghijklmnopqrstuvwxyz"
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
    "0123456789 "
)


def nonalnum_count(c: Column) -> Column:
    """Count of codepoints outside ``[a-zA-Z0-9 ]`` — value-identical
    to ``F.regexp_count(c, '[^a-zA-Z0-9 ]')`` (a one-codepoint regex
    class matches per codepoint; ``translate`` deletes per codepoint;
    ``length`` counts codepoints — so the identity holds for any
    Unicode text, BMP or not), but ~35x faster: ``translate`` is a
    codegen'd char-map lookup while Java-regex counting pays a
    per-row UTF8String->String conversion plus NFA scan (measured at
    the derived sf10 tier: 20.2 s vs 0.6 s over 600k documents — the
    whole r11 text_quality_score third-decade watch item was this one
    expression). The paired DuckDB oracle keeps the regexp spelling:
    same value, independent path."""
    return F.length(F.translate(c, _ALNUM_SPACE, ""))


def stop_hits(toks: Column, words: tuple[str, ...]) -> Column:
    """How many tokens are in the marker set (with repetition)."""
    arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(toks, lambda x: F.array_contains(arr, x)))


def stop_hits_sql(toks_expr: str, words: tuple[str, ...]) -> str:
    inlist = ", ".join(f"'{w}'" for w in words)
    return f"len(list_filter({toks_expr}, x -> x IN ({inlist})))"


def shingles(toks: Column, n: int = 3) -> Column:
    """Word n-gram shingles (space-joined). Empty array when the
    document has fewer than n tokens (F.sequence would otherwise
    descend and produce garbage).

    The input expression is BOUND ONCE per row via an outer transform
    lambda before the per-position element_at references: inlined
    directly, each of the n element_at calls per span position would
    re-evaluate the whole ``toks`` expression (e.g. re-tokenize the
    document) — and a caller-side projection boundary does NOT
    protect against this because CollapseProject re-inlines adjacent
    selects (measured 87 s → 2 s at sf0.1 for 12-token spans). The
    one-element array wrap costs one allocation per row."""

    def spans_of(t: Column) -> Column:
        count = F.size(t) - (n - 1)
        return F.when(
            count >= 1,
            F.transform(
                F.sequence(F.lit(1), count),
                # element_at is O(1); building each shingle via slice()
                # allocates a subarray per shingle (measurably slower)
                lambda i: F.concat_ws(
                    " ", *[F.element_at(t, i + k) for k in range(n)]
                ),
            ),
        ).otherwise(F.array().cast("array<string>"))

    return F.element_at(F.transform(F.array(toks), spans_of), 1)


def shingles_sql(toks_expr: str, n: int = 3) -> str:
    # duckdb list slicing is 1-based inclusive: t[i:i+n-1] = n items;
    # range(1, len-n+2) is end-exclusive = 1 .. len-n+1.
    return (
        f"list_transform(range(1, len({toks_expr}) - {n - 2}), "
        f"i -> array_to_string(({toks_expr})[i:i+{n - 1}], ' '))"
    )
