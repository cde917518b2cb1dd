"""Text-analysis column functions for training-data pipelines (beyond the
reference — SURVEY build mandate: language-ID, quality scoring, token
counting, fingerprinting).

Everything here is a *native* Catalyst expression (no Python UDF): the
hot path stays in whole-stage codegen, and every function has an exact
ANSI-SQL mirror for the correctness oracle.  Regex classes are kept to
the portable subset shared by Java regex and RE2/DuckDB.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# fixed stopword lists (deterministic; intentionally small)
STOPWORDS = {
    "en": ["the", "a", "an", "of", "and", "to", "in", "is", "on", "for",
           "with", "as", "by", "at", "be", "this", "that", "it", "or", "are"],
    "es": ["el", "la", "de", "que", "los", "las", "un", "una", "por", "con"],
    "de": ["der", "die", "das", "und", "ist", "von", "mit", "den", "ein", "zu"],
    "fr": ["le", "la", "les", "de", "des", "et", "est", "un", "une", "pour"],
}
PUNCT_CLASS = "[.,!?;:]"        # portable across Java regex and RE2
CJK_CLASS = "[\\x{4e00}-\\x{9fff}]"   # Spark/Java syntax; oracle uses [一-鿿]


def tokens(text) -> Column:
    """Whitespace tokenization, empty tokens removed."""
    c = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(F.lower(c), "\\s+"), lambda t: t != "")


def token_count(text) -> Column:
    return F.size(tokens(text))


# GPT-2-style pre-tokenizer shape (contractions | letter runs | digit runs
# | punctuation runs), restricted to the regex subset with identical
# leftmost-first semantics in Java regex and RE2/DuckDB (no lookarounds,
# no unicode classes; whitespace separates and is never a token).
# Counting its matches approximates a BPE tokenizer's sequence length
# well enough for length-based corpus filtering without shipping a vocab.
BPE_SPLIT_RE = "'(?:s|t|re|ve|m|ll|d)|[a-z]+|[0-9]+|[^a-z0-9'\\s]+|'"


def bpe_token_count(text) -> Column:
    """Approximate BPE token count: matches of the pre-tokenizer regex
    over lowercased text."""
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_count(F.lower(c), F.lit(BPE_SPLIT_RE))


def stopword_hits(text, lang: str = "en") -> Column:
    lst = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.filter(tokens(text), lambda t: F.array_contains(lst, t)))


def stopword_ratio(text, lang: str = "en") -> Column:
    n = token_count(text)
    return F.when(n > 0, stopword_hits(text, lang) / n).otherwise(F.lit(0.0))


def punct_ratio(text) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    n = F.length(c)
    return F.when(n > 0, F.regexp_count(c, F.lit(PUNCT_CLASS)) / n).otherwise(F.lit(0.0))


def mean_token_len(text) -> Column:
    t = tokens(text)
    n = F.size(t)
    total = F.aggregate(t, F.lit(0), lambda acc, x: acc + F.length(x))
    return F.when(n > 0, total / n).otherwise(F.lit(0.0))


def quality_score(text) -> Column:
    """Deterministic [0,1] quality heuristic: length, stopword density,
    punctuation sanity, token shape.  Not a model — a filterable feature
    (c4/refinedweb-style rule scoring)."""
    tc = token_count(text).cast("double")
    length_term = F.least(F.lit(1.0), tc / F.lit(50.0))
    stop_term = F.least(F.lit(1.0), stopword_ratio(text) * F.lit(4.0))
    punct_term = F.greatest(F.lit(0.0), F.lit(1.0) - punct_ratio(text) * F.lit(10.0))
    shape_term = F.least(F.lit(1.0), mean_token_len(text) / F.lit(8.0))
    return F.round(length_term * 0.3 + stop_term * 0.3
                   + punct_term * 0.2 + shape_term * 0.2, 6)


def lang_id(text) -> Column:
    """n-gram/stopword heuristic language ID over {en, es, de, fr, zh}:
    CJK codepoints force zh; otherwise argmax of per-language stopword
    hits with ties broken by fixed order (en first)."""
    c = F.col(text) if isinstance(text, str) else text
    scores = [(lang, stopword_hits(c, lang)) for lang in ("en", "es", "de", "fr")]
    best = scores[0][1]
    for _, s in scores[1:]:
        best = F.greatest(best, s)
    pick = F.when(scores[0][1] == best, F.lit("en"))
    for lang, s in scores[1:]:
        pick = pick.when(s == best, F.lit(lang))
    return (F.when(F.regexp_count(c, F.lit(CJK_CLASS)) > 0, F.lit("zh"))
            .when(best == 0, F.lit("und"))
            .otherwise(pick))


def fingerprint_md5(text) -> Column:
    """Exact-dup fingerprint: md5 of whitespace-normalized lowercase text."""
    return F.md5(F.concat_ws(" ", tokens(text)))


def shingles_from_tokens(t: Column, k: int = 3) -> Column:
    """Array of k-word shingles from a token-array column.  Pass a plain
    column reference, not an expression: the HOF lambda re-evaluates a
    captured expression per array element (~3x slower at sf0.1)."""
    n = F.size(t)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    return F.when(n >= k,
                  F.transform(idx, lambda i: F.concat_ws(" ", F.slice(t, i + 1, k)))
                  ).otherwise(F.array(F.concat_ws(" ", t)))


def word_shingles(text, k: int = 3) -> Column:
    """Array of k-word shingles (space-joined), the minhash input unit."""
    return shingles_from_tokens(tokens(text), k)
