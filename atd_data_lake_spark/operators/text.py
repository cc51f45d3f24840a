"""Text-analysis operators for training-data pipelines.

Beyond-reference extensions (BASELINE.json north star): language ID
(stopword-hit heuristic), quality scoring (length / punctuation /
stopword ratios), token counting (whitespace + a BPE-ish sub-token
regex), and document fingerprinting (normalized-content hash).  All pure
column expressions — each query is one scan + optional one shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from atd_data_lake_spark.operators.dedup import tokens
from atd_data_lake_spark.operators.scale import fan_out

# Tiny deterministic stopword lists per language — heuristic language ID,
# not a model; chosen to be reproducible in ANSI SQL for oracle checks.
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to"],
    "es": ["el", "la", "de", "que", "y"],
    "de": ["der", "die", "das", "und", "ist"],
    "fr": ["le", "la", "de", "et", "est"],
}


def token_count(text: Column) -> Column:
    """Whitespace token count (empty/blank text → 0)."""
    return F.size(tokens(text))


def subtoken_count(text: Column) -> Column:
    """BPE-ish sub-token count: word chunks of ≤4 chars + digits +
    punctuation marks each count as one token.  Cheap ceil-based
    approximation of a BPE vocabulary: ceil(len(word)/4) per word."""
    return F.aggregate(
        tokens(text),
        F.lit(0).cast("long"),
        lambda acc, t: acc + F.ceil(F.length(t) / 4.0).cast("long"),
    )


def _count_occurrences(text: Column, word: str) -> Column:
    """Occurrences of ``word`` as a whole token in lowercased text."""
    padded = F.concat(F.lit(" "), F.lower(text), F.lit(" "))
    needle = f" {word} "
    return (
        (F.length(padded) - F.length(F.replace(padded, F.lit(needle), F.lit(""))))
        / len(needle)
    ).cast("long")


def stopword_hits(text: Column, lang: str) -> Column:
    """Total occurrences of the language's stopwords (overlap-free because
    needles are space-delimited whole words)."""
    out = F.lit(0).cast("long")
    for w in STOPWORDS[lang]:
        out = out + _count_occurrences(text, w)
    return out


def language_id(text: Column) -> Column:
    """Predicted language = argmax of stopword hits, 'und' if all zero.
    Deterministic tie-break by language code order en < es < de < fr
    (first listed wins ties)."""
    hits = {lang: stopword_hits(text, lang) for lang in STOPWORDS}
    best = F.greatest(*hits.values())
    expr = F.lit("und")
    # build reversed so earlier langs take precedence on ties
    for lang in reversed(list(STOPWORDS)):
        expr = F.when((hits[lang] == best) & (best > 0), F.lit(lang)).otherwise(expr)
    return expr


def punct_ratio(text: Column) -> Column:
    """Fraction of characters that are not [a-zA-Z0-9 ] (0 for empty)."""
    clean = F.regexp_replace(text, "[a-zA-Z0-9 ]", "")
    return F.when(F.length(text) == 0, 0.0).otherwise(
        F.round(F.length(clean) / F.length(text).cast("double"), 6)
    )


def quality_score(text: Column) -> Column:
    """Composite quality heuristic in [0,1]:
    0.4·length_score + 0.3·(1−punct_ratio) + 0.3·stopword_presence,
    where length_score = min(n_tokens,100)/100 and stopword_presence is 1
    if any known stopword occurs.  Rounded to 6 places."""
    n_tok = token_count(text)
    length_score = F.least(n_tok, F.lit(100)) / 100.0
    any_stop = F.lit(0).cast("long")
    for lang in STOPWORDS:
        any_stop = any_stop + stopword_hits(text, lang)
    stop_presence = F.when(any_stop > 0, 1.0).otherwise(0.0)
    return F.round(
        0.4 * length_score + 0.3 * (1.0 - punct_ratio(text)) + 0.3 * stop_presence, 6
    )


def fingerprint(text: Column) -> Column:
    """Document fingerprint: md5 of lowercase text with non-alphanumerics
    collapsed to single spaces — stable under whitespace/punctuation noise."""
    norm = F.trim(F.regexp_replace(F.lower(text), "[^a-z0-9]+", " "))
    return F.md5(norm)


def profile_documents(df: DataFrame, text_col: str = "text") -> DataFrame:
    """One-pass per-document text profile."""
    t = F.col(text_col)
    return fan_out(df).select(
        "*",
        token_count(t).alias("n_tokens"),
        subtoken_count(t).alias("n_subtokens"),
        punct_ratio(t).alias("punct_ratio"),
        language_id(t).alias("lang_pred"),
        quality_score(t).alias("quality"),
        fingerprint(t).alias("fingerprint"),
    )
