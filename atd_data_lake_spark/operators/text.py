"""Text-analysis operators for training-data pipelines.

Beyond-reference extensions (BASELINE.json north star): language ID
(stopword-hit heuristic), quality scoring (length / punctuation /
stopword ratios), token counting (whitespace + a BPE-ish sub-token
regex), and document fingerprinting (normalized-content hash).  All pure
column expressions — each query is one scan + optional one shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
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


# GPT-2-style pre-tokenizer, simplified to the subset whose semantics are
# identical in Java regex (Spark) and RE2 (DuckDB oracle): no lookahead,
# leftmost-first alternation.  Contractions, letter runs, digit runs,
# punctuation runs; whitespace is a separator, not a token.
BPE_PRETOKEN_RE = r"'(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+"

# Distinctive character trigrams per language (space-padded = word
# boundary).  Deterministic n-gram language ID — the counting is a
# non-overlapping left-to-right scan so it is exactly reproducible with
# replace() arithmetic in ANSI SQL.
TRIGRAM_PROFILES = {
    "en": ["the", " th", "he ", "ing", " an", "nd "],
    "es": [" de", " la", "os ", " qu", "ue ", " el"],
    "de": ["der", "ein", "ich", "sch", "und", "die"],
    "fr": [" le", " de", "es ", "ent", "que", "ion"],
}

# Rabin-Karp rolling-hash parameters (winnowing, Schleimer et al. 2003).
RK_BASE = 257
RK_MOD = 1_000_000_007
RK_K = 8  # character k-gram width
RK_W = 4  # winnowing window (fingerprints per ~w grams)


def token_count(text: Column) -> Column:
    """Whitespace token count (empty/blank text → 0)."""
    return F.size(tokens(text))


def bpe_pretoken_count(text: Column) -> Column:
    """BPE-ish token count: number of GPT-2-style pre-tokenizer matches.
    JVM-side regexp_count — stays inside whole-stage codegen."""
    return F.regexp_count(text, F.lit(BPE_PRETOKEN_RE)).cast("long")


def trigram_hits(text: Column, lang: str) -> Column:
    """Non-overlapping occurrences of the language's profile trigrams in
    space-padded lowercased text (padding makes ' th' match at string
    start)."""
    padded = F.concat(F.lit(" "), F.lower(text), F.lit(" "))
    out = F.lit(0).cast("long")
    for needle in TRIGRAM_PROFILES[lang]:
        out = out + (
            (F.length(padded) - F.length(F.replace(padded, F.lit(needle), F.lit(""))))
            / len(needle)
        ).cast("long")
    return out


def trigram_language_id(text: Column) -> tuple[Column, Column]:
    """(predicted language, score) from character-trigram profiles —
    argmax of profile hits, 'und' if all zero, ties to the first language
    in TRIGRAM_PROFILES order."""
    hits = {lang: trigram_hits(text, lang) for lang in TRIGRAM_PROFILES}
    best = F.greatest(*hits.values())
    expr = F.lit("und")
    for lang in reversed(list(TRIGRAM_PROFILES)):
        expr = F.when((hits[lang] == best) & (best > 0), F.lit(lang)).otherwise(expr)
    return expr, F.when(best > 0, best).otherwise(F.lit(0)).cast("long")


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


def profile_documents_expr(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Column-expression profile — kept for composition inside larger
    plans; the bulk path below is ~40% faster with far tighter variance
    (the 20 stopword replace() needles allocate a padded copy of every
    text per needle)."""
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


def _hu6_np(x):
    """Half-up rounding to 6 places over a numpy array — the oracle's
    ROUND semantics (shared by the profile pass and its fused twin)."""
    import numpy as np

    return np.sign(x) * np.floor(np.abs(x) * 1e6 + 0.5) / 1e6


def profile_arrays(text, langs=None):
    """The per-batch profile computation over a pandas text Series:
    returns ``(cols, toks, low)`` where ``cols`` holds the n_tokens /
    n_subtokens / punct_ratio / lang_pred / quality arrays, ``toks`` is
    the whitespace token-list Series (reusable by a fused shingle pass —
    ``s.strip().split()`` tokens are exactly ``s.split()``'s), and
    ``low`` is the lowercased text (for the fingerprint).

    ONE definition of the quality/langid formulas: ``profile_documents``
    and the round-46 fused profile+shingle pass both call this, so the
    formulas cannot drift between the single-operator oracle and the
    pipeline's (r10 fusion)."""
    import re

    import numpy as np

    if langs is None:
        langs = list(STOPWORDS)
    low = text.str.lower()
    padded = " " + low + " "
    hits = {}
    for lang in langs:
        tot = np.zeros(len(text), dtype=np.int64)
        for w in STOPWORDS[lang]:
            tot += padded.str.count(re.escape(f" {w} ")).to_numpy()
        hits[lang] = tot
    H = np.stack([hits[lg] for lg in langs])
    best = H.max(axis=0)
    arg = H.argmax(axis=0)  # first max wins = STOPWORDS order
    cols = {}
    cols["lang_pred"] = np.where(
        best > 0, np.array(langs, dtype=object)[arg], "und"
    )
    toks = text.str.strip().str.split()
    cols["n_tokens"] = (
        toks.map(lambda t: len(t) if t else 0).astype("int64").to_numpy()
    )
    cols["n_subtokens"] = (
        toks.map(
            lambda t: int(sum(-(-len(w) // 4) for w in t)) if t else 0
        )
        .astype("int64")
        .to_numpy()
    )
    clean_len = (
        text.str.replace(r"[a-zA-Z0-9 ]", "", regex=True).str.len().to_numpy()
    )
    tlen = text.str.len().to_numpy().astype(np.float64)
    pr = np.where(tlen == 0, 0.0, _hu6_np(clean_len / np.maximum(tlen, 1)))
    cols["punct_ratio"] = pr
    q = (
        0.4 * (np.minimum(cols["n_tokens"], 100) / 100.0)
        + 0.3 * (1.0 - pr)
        + 0.3 * (H.sum(axis=0) > 0)
    )
    cols["quality"] = _hu6_np(q)
    return cols, toks, low


def profile_documents(df: DataFrame, text_col: str = "text") -> DataFrame:
    """One-pass per-document text profile (Arrow-batched pandas).

    Semantics identical to ``profile_documents_expr`` (verified
    value-for-value): whole-token stopword needle counts, ceil(len/4)
    subtokens, half-up rounding to 6 places, md5 fingerprint of
    normalized text.  Input columns pass through unchanged.
    """
    import hashlib
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql import types as T

    out_schema = T.StructType(
        list(df.schema.fields)
        + [
            T.StructField("n_tokens", T.LongType()),
            T.StructField("n_subtokens", T.LongType()),
            T.StructField("punct_ratio", T.DoubleType()),
            T.StructField("lang_pred", T.StringType()),
            T.StructField("quality", T.DoubleType()),
            T.StructField("fingerprint", T.StringType()),
        ]
    )
    langs = list(STOPWORDS)

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            # NULL text degrades to the empty-string profile (0 tokens,
            # quality floor) instead of crashing the Arrow worker
            text = pdf[text_col].fillna("")
            cols, _toks, low = profile_arrays(text, langs)
            out = pdf.copy()
            out["lang_pred"] = cols["lang_pred"]
            out["n_tokens"] = cols["n_tokens"]
            out["n_subtokens"] = cols["n_subtokens"]
            out["punct_ratio"] = cols["punct_ratio"]
            out["quality"] = cols["quality"]
            norm = low.str.replace(r"[^a-z0-9]+", " ", regex=True).str.strip()
            out["fingerprint"] = [
                hashlib.md5(s.encode("utf-8")).hexdigest() for s in norm
            ]
            yield out

    return fan_out(df).mapInPandas(op, schema=out_schema)


def repetition_profile(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style repetition signals (Rae et al. 2021 §A1.1): the
    fraction of word-bigram occurrences taken by the most frequent bigram
    and the fraction of duplicate tokens — high values mark boilerplate /
    degenerate text that quality gates drop before training.

    One Arrow-batched map stage, no shuffle.  Docs with < 2 tokens score
    0.0 on both (nothing to repeat); fractions are rounded half-up to 6
    places for oracle parity.
    """
    from collections import Counter
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    out_schema = T.StructType(
        [
            T.StructField(id_col, df.schema[id_col].dataType),
            T.StructField("top_bigram_frac", T.DoubleType()),
            T.StructField("dup_token_frac", T.DoubleType()),
        ]
    )

    def _hu6(x: float) -> float:
        return np.sign(x) * np.floor(abs(x) * 1e6 + 0.5) / 1e6

    def one(text: str | None) -> tuple[float, float]:
        toks = text.split() if text else []  # NULL-safe
        if not toks:
            return 0.0, 0.0
        dup = _hu6(1.0 - len(set(toks)) / len(toks))
        if len(toks) < 2:
            return 0.0, dup
        grams = Counter(zip(toks, toks[1:]))
        return _hu6(max(grams.values()) / (len(toks) - 1)), dup

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            res = [one(t) for t in pdf[text_col]]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "top_bigram_frac": [r[0] for r in res],
                    "dup_token_frac": [r[1] for r in res],
                }
            )

    return fan_out(df.select(id_col, text_col)).mapInPandas(op, schema=out_schema)


def langid_trigram_documents(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Bulk character-trigram language ID (Arrow-batched pandas).

    Value-identical to ``trigram_language_id`` — pandas ``str.count`` and
    SQL ``replace()`` arithmetic are both non-overlapping left-to-right
    scans — but the plan is one mapInPandas node instead of ~270 repeated
    replace() expressions (column-expression variant measured ~3.5 s of
    driver-side plan build alone).
    """
    import re
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    out_schema = T.StructType(
        [
            T.StructField(id_col, df.schema[id_col].dataType),
            T.StructField("lang_trigram", T.StringType()),
            T.StructField("tri_score", T.LongType()),
        ]
    )
    langs = list(TRIGRAM_PROFILES)

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            padded = " " + pdf[text_col].fillna("").str.lower() + " "
            H = np.stack(
                [
                    sum(
                        padded.str.count(re.escape(g)).to_numpy()
                        for g in TRIGRAM_PROFILES[lang]
                    )
                    for lang in langs
                ]
            )
            best = H.max(axis=0)
            arg = H.argmax(axis=0)  # first max wins = TRIGRAM_PROFILES order
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "lang_trigram": np.where(
                        best > 0, np.array(langs, dtype=object)[arg], "und"
                    ),
                    "tri_score": best.astype(np.int64),
                }
            )

    # project BEFORE the pandas stage: mapInPandas consumes whole rows, so
    # without this the scan reads every column of the table
    return fan_out(df.select(id_col, text_col)).mapInPandas(op, schema=out_schema)


def winnow_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = RK_K,
    w: int = RK_W,
) -> DataFrame:
    """Rolling-hash document fingerprinting (winnowing, Schleimer et al.
    SIGMOD'03): Rabin-Karp hash every character ``k``-gram of the
    normalized text, slide a ``w``-wide window over the gram hashes and
    keep each window's minimum; the distinct minima are the document's
    fingerprint set.

    Output per document: ``n_grams`` (k-gram count), ``rk_min`` (global
    minimum hash, -1 when the text is shorter than ``k`` — sentinel
    instead of NULL so driver-side row sorting stays well-defined) and
    ``n_fingerprints`` (distinct winnowed minima; documents with
    0 < n_grams < w contribute exactly one fingerprint).

    Arrow-batched numpy: the hash fold is vectorized across all grams of
    a document (k sequential steps, not len(text) steps), mod-reduced at
    every step so values stay < 2**38 — no overflow under ANSI or int64.
    """
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd
    from numpy.lib.stride_tricks import sliding_window_view
    from pyspark.sql import types as T

    out_schema = T.StructType(
        [
            T.StructField(id_col, df.schema[id_col].dataType),
            T.StructField("n_grams", T.LongType()),
            T.StructField("rk_min", T.LongType()),
            T.StructField("n_fingerprints", T.LongType()),
        ]
    )

    def one(s: str) -> tuple[int, int, int]:
        codes = np.frombuffer(s.encode("utf-8"), dtype=np.uint8).astype(np.int64)
        n = len(codes) - k + 1
        if n <= 0:
            return 0, -1, 0
        h = np.zeros(n, dtype=np.int64)
        for j in range(k):
            h = (h * RK_BASE + codes[j : j + n]) % RK_MOD
        if n < w:
            mins = np.array([h.min()])
        else:
            mins = sliding_window_view(h, w).min(axis=1)
        return n, int(h.min()), len(np.unique(mins))

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            norm = (
                pdf[text_col]
                .fillna("")
                .str.lower()
                .str.replace(r"[^a-z0-9]+", " ", regex=True)
                .str.strip()
            )
            res = [one(s) for s in norm]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "n_grams": np.array([r[0] for r in res], dtype=np.int64),
                    "rk_min": np.array([r[1] for r in res], dtype=np.int64),
                    "n_fingerprints": np.array([r[2] for r in res], dtype=np.int64),
                }
            )

    # project BEFORE the pandas stage: mapInPandas consumes whole rows, so
    # without this the scan reads every column of the table
    return fan_out(df.select(id_col, text_col)).mapInPandas(op, schema=out_schema)


def tfidf_top_terms(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    min_len: int = 3,
) -> DataFrame:
    """Per-document top-k terms by a TF-IDF-shaped score, entirely in JVM
    expressions (regexp tokenize → explode → two keyed aggregations → one
    window) — zero Python stages at any corpus size.

    Beyond-reference training-data op: surfacing each document's most
    characteristic terms (keyword extraction for corpus exploration and
    quality audits).  The score is integer-exact for engine parity:
    ``score = tf * 1_000_000 // df`` (term frequency in the doc, divided
    by the term's document frequency) — rank-equivalent to tf·idf with
    idf = 1/df, no float log in the comparison path.  Ties break on the
    lexically smallest term.  Stopwords and short tokens are excluded.

    Shuffle inventory: 1 on (doc, term) for the tf count, 1 on term for
    the df count (both with map-side partial agg), 1 broadcast-join of
    the df dimension (bounded by vocabulary size), 1 on doc for the
    window — each keyed by small reduced data, never raw text.
    """
    stop_list = sorted(STOPWORDS)
    toks = df.select(
        F.col(id_col),
        F.explode(
            F.expr(f"regexp_extract_all(lower({text_col}), '[a-z0-9]+', 0)")
        ).alias("term"),
    ).filter(
        (F.length("term") >= min_len) & ~F.col("term").isin(stop_list)
    )
    tf = toks.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    scored = tf.join(F.broadcast(dfreq), "term").select(
        id_col,
        "term",
        "tf",
        "df",
        # integer div, no float in the comparison path (`div` is Spark's
        # integral division; DuckDB's `//` on integers matches)
        F.expr("tf * 1000000L div df").alias("score"),
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(id_col, "term", "tf", "df", "score", "rank")
    )


def unigram_logprob_score(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """CCNet-style language-model quality proxy: score each document by
    the mean log-probability of its tokens under the corpus's own
    unigram distribution.  Gibberish and boilerplate-stuffed documents
    score low (rare-token soup / pathologically peaked repetition);
    fluent text scores near the corpus mode.  The real CCNet uses a
    5-gram KenLM; the unigram variant keeps the identical pipeline shape
    (model = an aggregate of the corpus itself) while staying
    SQL-expressible for the oracle.

    Plan: explode to (doc, token) → token counts (shuffle 1, map-side
    combined) → count-join back (8-byte key; AQE picks broadcast while
    the vocabulary fits, shuffle join beyond) → per-doc mean (shuffle 2
    on the id).  The normalizer (total token count) is the SUM of the
    vocab aggregate attached as a 1-row broadcast — not a separate
    count() action, which would burn one full extra pass over the token
    stream at 100 TB.  The model is derived IN the plan — no driver
    collect, no side-channel state; the vocabulary aggregate is
    Zipf-bounded, orders below the corpus.

    Output: (id, n_tokens, mean_logprob) — mean over tokens of
    ln(count(token)/total_tokens), rounded to 6 dp.  ln() ULP skew
    between engines is the same accepted risk as the haversine oracle's
    trig (s_haversine, driver-green since round 1).
    """
    toks = df.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("tok")
    )
    vocab = toks.groupBy("tok").agg(F.count("*").alias("tok_n"))
    total = vocab.agg(F.sum("tok_n").cast("double").alias("_total"))
    scored = (
        toks.join(vocab, "tok")
        .join(F.broadcast(total))  # 1-row broadcast: benign nested-loop
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_tokens"),
            F.round(
                F.avg(F.log(F.col("tok_n") / F.col("_total"))), 6
            ).alias("mean_logprob"),
        )
    )
    # docs with zero tokens drop out of the explode; restore them
    return (
        df.select(id_col)
        .join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
            "mean_logprob",
        )
    )


def ngram_novelty(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    common_df: int = 2,
) -> DataFrame:
    """Memorization-risk scan: per document, the fraction of its
    distinct word n-gram shingles that are "common" — shared with at
    least ``common_df`` documents corpus-wide.

    The per-DOCUMENT complement of the near-dup detectors: a doc can be
    far from every single neighbor (low pairwise Jaccard) yet consist
    mostly of corpus-frequent boilerplate n-grams — exactly the
    over-represented spans an LM memorizes.  Low ``novelty_ratio`` →
    boilerplate/template documents; combine with `quality_score` for
    pruning decisions.

    Output: (id, n_shingles, n_common, novelty_ratio) for every doc
    with ≥ n tokens, novelty_ratio = round(1 − n_common/n_shingles, 6).

    Scale shape (100 TB): shingling is the Arrow map stage shared with
    the Jaccard/MinHash family (``shingle_hash_rows`` — 8-byte hashes,
    never shingle strings, on the wire); then ONE hash-keyed exchange
    builds the df counts, one join of (id, hash, sz) rows against the
    (hash, df) side, one id-keyed agg.  Hot (stop-phrase) shingles skew
    the df groupBy → map-side partial combine absorbs them; the join is
    AQE-skew-eligible.  Nothing materializes per-shingle posting lists.
    """
    from atd_data_lake_spark.operators.dedup import shingle_hashes

    # sh feeds BOTH the df count and the membership join: the shared
    # session-memoized frame (dedup.shingle_hashes) runs the Arrow
    # shingling once — for this operator AND any dedup stage in the
    # same session shingling the same corpus
    sh = shingle_hashes(df, id_col, text_col, n=n, with_size=True)
    dfc = sh.groupBy("_hash").agg(F.count("*").alias("_df"))
    return (
        sh.join(dfc, "_hash")
        .groupBy("_id")
        .agg(
            F.first("_sz").alias("n_shingles"),
            F.sum(
                F.when(F.col("_df") >= common_df, 1).otherwise(0)
            ).alias("n_common"),
        )
        .select(
            F.col("_id").alias(id_col),
            "n_shingles",
            F.col("n_common").cast("long").alias("n_common"),
            F.round(
                F.lit(1.0) - F.col("n_common") / F.col("n_shingles"), 6
            ).alias("novelty_ratio"),
        )
    )


# ---------------------------------------------------------------------------
# Line-level corpus dedup (RefinedWeb / CCNet style)
# ---------------------------------------------------------------------------


def line_level_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    words_per_line: int = 10,
    max_df: int = 2,
) -> DataFrame:
    """Corpus-level LINE dedup: any line appearing in ``max_df`` or more
    distinct documents is boilerplate (nav bars, cookie banners, license
    headers) and is removed from every document — the RefinedWeb/CCNet
    line-dedup pass, the single highest-yield cleaning step for web
    corpora after URL dedup.

    The corpus has no newline structure, so "lines" are deterministic
    ``words_per_line``-word chunks (the same windowing as
    ``cur_chunk_documents``); with real page text the splitter would be
    ``split(text, '\\n')`` and everything downstream is unchanged.

    Output per doc: ``n_lines / n_kept / n_dropped / clean_md5`` (md5 of
    the surviving lines re-joined in order — portable across engines).

    100 TB shape: two shuffles total — groupBy(line) computes document
    frequency (map-side partial on the line key; at scale the key would
    be the 8-byte xxhash of the line, same exchange shape), and
    groupBy(doc) reassembles.  The frequent-line set joins back on the
    same line key the df-aggregate just exchanged on, so AQE reuses that
    exchange; the frequent set itself is output-sized (repeated lines
    only), never corpus-sized, and the per-doc collect_list is bounded
    by document length, not corpus size.
    """
    words = F.split(F.col(text_col), " ")
    n_chunks = F.ceil(F.size(words) / F.lit(float(words_per_line))).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.concat_ws(
            " ", F.slice(words, i * words_per_line + 1, words_per_line)
        ),
    )
    lines = df.select(
        F.col(id_col), F.posexplode(chunks).alias("pos", "line")
    ).withColumn("_lh", F.xxhash64("line"))
    # df-count and flag-join key on the 8-byte line hash, not the line
    # text — the exchanges carry (id, 8B) rows instead of full strings
    # (measured 14.6 → ~5 s on the 10× all-lines-frequent worst case).
    # A 64-bit collision could only mark an innocent line frequent; at
    # the 80k-distinct-line worst case that's P ≈ 3e-10, and the
    # multi-SF oracle sweep (which recomputes df on raw text in DuckDB)
    # would surface it as a hash mismatch rather than silence it.
    freq = (
        lines.groupBy("_lh")
        .agg(F.countDistinct(id_col).alias("_df"))
        .filter(F.col("_df") >= max_df)
        .select("_lh", F.lit(True).alias("_is_freq"))
    )
    flagged = lines.join(freq, "_lh", "left").withColumn(
        "_drop", F.coalesce("_is_freq", F.lit(False))
    )
    kept_struct = F.when(
        ~F.col("_drop"), F.struct(F.col("pos"), F.col("line"))
    )
    return flagged.groupBy(id_col).agg(
        F.count("*").alias("n_lines"),
        F.sum(F.when(~F.col("_drop"), 1).otherwise(0)).alias("n_kept"),
        F.sum(F.when(F.col("_drop"), 1).otherwise(0)).alias("n_dropped"),
        F.md5(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(F.collect_list(kept_struct)),
                    lambda s: s["line"],
                ),
            )
        ).alias("clean_md5"),
    )
