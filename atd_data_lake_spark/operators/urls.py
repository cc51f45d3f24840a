"""URL / domain-level curation operators.

Web-scale training corpora are curated per *registrable domain* (the
"site"): C4/RefinedWeb-style pipelines score and gate whole domains, not
individual pages, because quality and licensing are domain-level
properties.  These operators provide the Spark-side plumbing:

- :func:`url_parts` — scheme/host/path/query extraction (JVM
  ``parse_url``, zero shuffle);
- :func:`with_registrable_domain` — eTLD+1 extraction against an
  embedded multi-part public-suffix set (pure column expressions — the
  suffix set is model-sized and inlined into the plan, never joined);
- :func:`with_query_params` — tracking-parameter (``utm_*``) detection
  and stripping for URL canonicalization before dedup;
- :func:`domain_quality_rollup` — per-domain doc counts, host fan-out,
  language mix and a keep/drop gate.

100 TB shape: every per-row derivation here is whole-stage-codegen
column math over the scan (no UDF, no shuffle, no collect); the rollup
is ONE groupBy(domain) with map-side partial aggregation — domain
cardinality is millions at web scale, far below the row count, so the
shuffle carries only the rollup rows.

Reference parity: the reference curates per data source/device class
(``atd_data_lake/drivers/*``); domain-level gating is the web-corpus
analog of its per-source routing, added per the build brief's
training-data-pipeline mandate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Multi-part public suffixes the extractor recognizes (an embedded,
# deliberately small slice of the PSL — the full list is ~9k entries and
# would ship the same way: inlined literals or a broadcast map, never a
# shuffled join side).
MULTI_PART_SUFFIXES: tuple[str, ...] = (
    "co.uk",
    "ac.uk",
    "gov.uk",
    "com.au",
    "net.au",
    "co.jp",
    "com.br",
    "co.in",
)


def url_parts(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Add ``host``, ``path``, ``query_string`` parsed from ``url_col``.

    ``parse_url`` is a built-in JVM expression (codegen, no UDF); the
    missing-query case is normalized to ``''`` so downstream string ops
    are null-free.
    """
    return df.withColumns(
        {
            "host": F.lower(F.expr(f"parse_url({url_col}, 'HOST')")),
            "path": F.coalesce(F.expr(f"parse_url({url_col}, 'PATH')"), F.lit("")),
            "query_string": F.coalesce(
                F.expr(f"parse_url({url_col}, 'QUERY')"), F.lit("")
            ),
        }
    )


def registrable_domain(
    host: Column, suffixes: tuple[str, ...] = MULTI_PART_SUFFIXES
) -> Column:
    """eTLD+1 of ``host``: the last two labels, or the last three when
    the final two form a known multi-part public suffix (``co.uk`` →
    ``example.co.uk``).  Pure column math — split + element_at with
    negative indices; hosts with fewer than two labels pass through."""
    labels = F.split(host, r"\.")
    last2 = F.concat_ws(
        ".", F.element_at(labels, -2), F.element_at(labels, -1)
    )
    return (
        F.when(
            (F.size(labels) >= 3) & last2.isin(*suffixes),
            F.concat_ws(".", F.element_at(labels, -3), last2),
        )
        .when(F.size(labels) >= 2, last2)
        .otherwise(host)
    )


def with_registrable_domain(
    df: DataFrame,
    host_col: str = "host",
    out_col: str = "reg_domain",
    suffixes: tuple[str, ...] = MULTI_PART_SUFFIXES,
) -> DataFrame:
    return df.withColumn(out_col, registrable_domain(F.col(host_col), suffixes))


def path_depth(path: Column) -> Column:
    """Number of non-empty ``/``-separated segments in a URL path
    (``'/'`` → 0, ``'/a/b'`` → 2)."""
    return F.size(
        F.filter(F.split(F.substring(path, 2, 1 << 20), "/"), lambda s: s != "")
    ).cast("long")


def with_query_params(
    df: DataFrame,
    query_col: str = "query_string",
    tracking_prefix: str = "utm_",
) -> DataFrame:
    """Derive ``n_params``, ``has_tracking`` and ``clean_query`` (the
    query string with ``utm_*`` tracking parameters stripped — the
    canonicalization step before URL-level dedup)."""
    params = F.filter(
        F.split(F.col(query_col), "&"), lambda p: p != ""
    )
    is_tracking = lambda p: p.startswith(tracking_prefix)  # noqa: E731
    return df.withColumns(
        {
            "n_params": F.size(params).cast("long"),
            "has_tracking": F.exists(params, is_tracking),
            "clean_query": F.array_join(
                F.filter(params, lambda p: ~is_tracking(p)), "&"
            ),
        }
    )


def domain_quality_rollup(
    df: DataFrame,
    domain_col: str = "reg_domain",
    host_col: str = "host",
    lang_col: str = "lang",
    chars_col: str = "n_chars",
    keep_lang: str = "en",
    min_docs: int = 3,
    min_lang_frac: float = 0.3,
) -> DataFrame:
    """Per-registrable-domain quality rollup + keep gate (the C4-style
    domain filter): doc count, distinct-host fan-out, total chars, the
    target-language fraction, and ``keep`` = enough documents AND enough
    of them in the target language.

    ONE shuffle (groupBy domain, map-side combine); ``lang_frac`` is an
    exact integer ratio evaluated as one final double expression."""
    n_docs = F.count("*")
    n_lang = F.sum(F.when(F.col(lang_col) == keep_lang, 1).otherwise(0))
    lang_frac = F.round(n_lang / n_docs, 6)
    return df.groupBy(F.col(domain_col).alias("reg_domain")).agg(
        n_docs.alias("n_docs"),
        F.countDistinct(host_col).alias("n_hosts"),
        F.sum(chars_col).cast("long").alias("total_chars"),
        lang_frac.alias("lang_frac"),
        ((n_docs >= min_docs) & (lang_frac >= min_lang_frac)).alias("keep"),
    )
