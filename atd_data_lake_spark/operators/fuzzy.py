"""J10 — fuzzy entity-resolution join (the GS site ↔ Knack device cascade).

Reference semantics (gs_ready.py:134-215, _findFuzzyWinner :343-353,
util/gps_h.py:9-24):
  ① exact lookup on "St1_St2" via a curated map (config_app.py:62-64);
  ② fuzzy difflib.SequenceMatcher.ratio() of "st1 st2" vs both
    "primary cross" and the reversed "cross primary" (tracking a
    ``reversed`` flag), accept ratio ≥ 0.7 (MIN_MATCH_RATIO gs_ready.py:22);
  ③ retry ② after street-synonym substitution (config_app.py:67-70);
  ④ device IP equality (gs_ready.py:177-186);
  ⑤ nearest haversine GPS within 300 ft (MAX_DIST gs_ready.py:25).

Spark-first design: each stage is a join; unresolved rows cascade to the
next stage.  Both sides are *device-dimension scale* (~100s of rows), so
every stage broadcasts — the cascade costs no shuffles regardless of
fact-data volume.  The similarity scorer stays a real
SequenceMatcher-backed pandas UDF for exactness with the reference
(SURVEY.md §7.4); a built-in ``levenshtein_ratio`` fallback is provided
for SQL-expressible pipelines.
"""

from __future__ import annotations

from difflib import SequenceMatcher

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from atd_data_lake_spark.functions.geo import haversine_feet

MIN_MATCH_RATIO = 0.7  # gs_ready.py:22
MAX_DIST_FEET = 300.0  # gs_ready.py:25


@F.pandas_udf(T.DoubleType())
def seq_ratio(a: pd.Series, b: pd.Series) -> pd.Series:
    """difflib.SequenceMatcher.ratio(), vectorized over Arrow batches."""
    return pd.Series(
        [
            SequenceMatcher(None, x, y).ratio() if x is not None and y is not None else 0.0
            for x, y in zip(a, b)
        ]
    )


def levenshtein_ratio(a: Column, b: Column) -> Column:
    """SQL-expressible similarity: 1 - levenshtein/max_len.  Used where a
    DuckDB-oracle-checkable analog of difflib ratio is needed."""
    max_len = F.greatest(F.length(a), F.length(b))
    return F.when(max_len == 0, F.lit(1.0)).otherwise(
        1.0 - F.levenshtein(a, b) / max_len.cast("double")
    )


def _norm_street(col: Column, synonyms: dict[str, str]) -> Column:
    out = F.lower(F.trim(col))
    for k, v in synonyms.items():
        out = F.regexp_replace(out, k.lower(), v.lower())
    return out


def fuzzy_device_match(
    sites: DataFrame,
    devices: DataFrame,
    exact_lookups: dict[str, str] | None = None,
    street_synonyms: dict[str, str] | None = None,
    min_ratio: float = MIN_MATCH_RATIO,
    max_dist_feet: float = MAX_DIST_FEET,
) -> DataFrame:
    """Resolve each site row to at most one device row.

    ``sites`` columns: base, street1, street2, device_net_addr,
    latitude, longitude.
    ``devices`` columns: atd_location_id, device_ip, primary_st, cross_st,
    lat, lon (strings allowed; cast internally).

    Returns sites + (atd_location_id, match_stage, match_ratio, reversed).
    match_stage ∈ {exact, fuzzy, fuzzy_syn, ip, gps} or NULL if unmatched.
    """
    exact_lookups = exact_lookups or {}
    street_synonyms = street_synonyms or {}

    dev = devices.select(
        F.col("atd_location_id").alias("_d_loc"),
        F.trim(F.col("device_ip")).alias("_d_ip"),
        F.lower(F.trim(F.col("primary_st"))).alias("_d_primary"),
        F.lower(F.trim(F.col("cross_st"))).alias("_d_cross"),
        F.col("lat").cast("double").alias("_d_lat"),
        F.col("lon").cast("double").alias("_d_lon"),
    )

    s = sites.withColumn("_s_st1", F.lower(F.trim(F.col("street1")))).withColumn(
        "_s_st2", F.lower(F.trim(F.col("street2")))
    )

    # ① exact curated lookup on "St1_St2"
    if exact_lookups:
        lookup_df = sites.sparkSession.createDataFrame(
            [(k, v) for k, v in exact_lookups.items()], ["_lk_key", "_lk_loc"]
        )
        s = s.join(
            F.broadcast(lookup_df),
            F.concat_ws("_", F.col("street1"), F.col("street2")) == F.col("_lk_key"),
            "left",
        )
    else:
        s = s.withColumn("_lk_loc", F.lit(None).cast("string"))

    # ②/③ fuzzy stage: cross-join site×device (both broadcast-small),
    # score both orderings, optionally after synonym substitution.
    site_name = F.concat_ws(" ", F.col("_s_st1"), F.col("_s_st2"))
    dev_fwd = F.concat_ws(" ", F.col("_d_primary"), F.col("_d_cross"))
    dev_rev = F.concat_ws(" ", F.col("_d_cross"), F.col("_d_primary"))

    scored = (
        s.join(F.broadcast(dev), how="cross")
        .withColumn("_r_fwd", seq_ratio(site_name, dev_fwd))
        .withColumn("_r_rev", seq_ratio(site_name, dev_rev))
    )
    if street_synonyms:
        syn_name = _norm_street(site_name, street_synonyms)
        scored = scored.withColumn("_r_fwd_syn", seq_ratio(syn_name, dev_fwd)).withColumn(
            "_r_rev_syn", seq_ratio(syn_name, dev_rev)
        )
    else:
        scored = scored.withColumn("_r_fwd_syn", F.lit(0.0)).withColumn(
            "_r_rev_syn", F.lit(0.0)
        )

    scored = scored.withColumn(
        "_ratio", F.greatest("_r_fwd", "_r_rev", "_r_fwd_syn", "_r_rev_syn")
    ).withColumn(
        "_reversed",
        F.greatest("_r_rev", "_r_rev_syn") > F.greatest("_r_fwd", "_r_fwd_syn"),
    ).withColumn(
        "_dist_ft",
        haversine_feet(
            F.col("latitude"), F.col("longitude"), F.col("_d_lat"), F.col("_d_lon")
        ),
    ).withColumn("_ip_match", F.col("device_net_addr") == F.col("_d_ip"))

    # stage classification per candidate pair
    stage = (
        F.when(F.col("_lk_loc") == F.col("_d_loc"), F.lit("exact"))
        .when(
            (F.greatest("_r_fwd", "_r_rev") >= min_ratio), F.lit("fuzzy")
        )
        .when(
            (F.greatest("_r_fwd_syn", "_r_rev_syn") >= min_ratio), F.lit("fuzzy_syn")
        )
        .when(F.col("_ip_match"), F.lit("ip"))
        .when(F.col("_dist_ft") <= max_dist_feet, F.lit("gps"))
    )
    stage_rank = (
        F.when(F.col("match_stage") == "exact", 0)
        .when(F.col("match_stage") == "fuzzy", 1)
        .when(F.col("match_stage") == "fuzzy_syn", 2)
        .when(F.col("match_stage") == "ip", 3)
        .when(F.col("match_stage") == "gps", 4)
        .otherwise(99)
    )

    candidates = scored.withColumn("match_stage", stage).filter(
        F.col("match_stage").isNotNull()
    )
    # winner per site: best (earliest) stage, then max ratio, then min dist
    w = Window.partitionBy("base").orderBy(
        stage_rank.asc(), F.col("_ratio").desc(), F.col("_dist_ft").asc(), F.col("_d_loc").asc()
    )
    winners = (
        candidates.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            *sites.columns,
            F.col("_d_loc").alias("atd_location_id"),
            "match_stage",
            F.round(F.col("_ratio"), 6).alias("match_ratio"),
            F.col("_reversed").alias("reversed"),
        )
    )
    unmatched = sites.join(winners.select("base"), "base", "left_anti").select(
        *sites.columns,
        F.lit(None).cast("string").alias("atd_location_id"),
        F.lit(None).cast("string").alias("match_stage"),
        F.lit(None).cast("double").alias("match_ratio"),
        F.lit(None).cast("boolean").alias("reversed"),
    )
    return winners.unionByName(unmatched)


# ---------------------------------------------------------------------------
# PassJoin: edit-distance similarity join (Li, Deng, Wang, Feng — ICDE'11)
# ---------------------------------------------------------------------------


def _pj_segments(k: int) -> str:
    """SQL fragment: the canonical k-way segmentation of a string of
    length L — base = L div k; the FIRST (k - L%k) segments get base
    chars, the remaining L%k get base+1.  Start of segment i (1-based):
    1 + i*base + max(0, i - (k - L%k))."""
    return (
        f"named_struct("
        f"'i', i, "
        f"'p', 1 + i * (pj_len div {k})"
        f"   + greatest(0, i - ({k} - pj_len % {k})), "
        f"'l', (pj_len div {k})"
        f"   + (CASE WHEN i >= {k} - pj_len % {k} THEN 1 ELSE 0 END))"
    )


def passjoin_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    str_col: str = "title",
    max_dist: int = 1,
) -> DataFrame:
    """All pairs with ``levenshtein(a, b) <= max_dist`` — WITHOUT the
    all-pairs scan, via PassJoin segment pigeonholing (Li et al.,
    ICDE'11): split every string into ``k = max_dist + 1`` segments; if
    ``ed(a, b) <= d`` then b contains at least one of a's segments
    verbatim, within a start-position shift of ±d — so candidates come
    from an EQUI-join on (hypothesized length, segment index, segment
    text) and only candidates pay the exact ``levenshtein`` verify.

    100 TB shape: the index side emits k keys per string, the probe
    side at most ``(2d+1)·k·(2d+1)`` bounded substring keys; exchanges
    carry (id, short segment) rows.  Candidate volume is governed by
    segment selectivity (segments are ~L/k chars — long enough to be
    rare).  Strings SHORTER than k cannot be indexed (a k-way
    pigeonhole needs k non-empty segments) but still probe; the
    short-short class (both lengths <= d) joins directly — every such
    pair is within distance d by definition, so that join is
    output-bound, not a scan blowup.  Output: (id_a, id_b, edit_dist),
    id_a < id_b, exact and partitioning-invariant.

    The reference's fuzzy device-match cascade (fuzzy_device_match
    above; knack_access.py:108 in cityofaustin/atd-data-lake) solves
    small-N string matching driver-side; PassJoin is the corpus-scale
    member of the same family.
    """
    d, k = max_dist, max_dist + 1
    s_all = (
        df.select(
            F.col(id_col).alias("pj_id"),
            F.col(str_col).alias("pj_s"),
            F.length(str_col).alias("pj_len"),
        )
        .filter(F.col("pj_s").isNotNull())
    )
    # Pigeonholing needs k NON-EMPTY segments, so only strings of
    # length >= k can be INDEXED.  Shorter strings still PROBE (their
    # valid substrings reach indexed strings within ±d), and the
    # short-short class (both lengths <= d) is handled below — every
    # such pair is within distance d by definition (ed <= max length),
    # so its quadratic join is output-bound, not a scan blowup.
    s = s_all.filter(F.col("pj_len") >= k)

    akeys = (
        s.select(
            "pj_id",
            "pj_s",
            "pj_len",
            F.explode(
                F.expr(f"transform(sequence(0, {k - 1}), i -> {_pj_segments(k)})")
            ).alias("g"),
        )
        .select(
            F.col("pj_id").alias("a_id"),
            F.col("pj_s").alias("a_s"),
            F.col("pj_len").alias("a_len"),
            F.col("g.i").alias("i"),
            F.expr("substring(pj_s, g.p, g.l)").alias("seg"),
        )
    )

    # Probe side: hypothesize every index-side length La in [L-d, L+d];
    # for each segment of THAT segmentation, try start shifts in [-d, d].
    probe_grid = f"""
        filter(
          flatten(transform(sequence(pj_len - {d}, pj_len + {d}), La ->
            flatten(transform(sequence(0, {k - 1}), i ->
              transform(sequence(-{d}, {d}), sh -> named_struct(
                'La', La, 'i', i,
                'p', 1 + i * (La div {k})
                   + greatest(0, i - ({k} - La % {k})) + sh,
                'l', (La div {k})
                   + (CASE WHEN i >= {k} - La % {k} THEN 1 ELSE 0 END))))))),
          g -> g.La >= {k} AND g.p >= 1 AND g.p + g.l - 1 <= pj_len)
    """
    bkeys = (
        s_all.select(
            "pj_id",
            "pj_s",
            F.explode(F.expr(probe_grid)).alias("g"),
        )
        .select(
            F.col("pj_id").alias("b_id"),
            F.col("pj_s").alias("b_s"),
            F.col("g.La").alias("a_len"),
            F.col("g.i").alias("i"),
            F.expr("substring(pj_s, g.p, g.l)").alias("seg"),
        )
    )

    cand = (
        akeys.join(bkeys, ["a_len", "i", "seg"])
        .filter(F.col("a_id") != F.col("b_id"))
        .filter(F.levenshtein("a_s", "b_s") <= d)
        .select(
            F.least("a_id", "b_id").alias("id_a"),
            F.greatest("a_id", "b_id").alias("id_b"),
            F.levenshtein("a_s", "b_s").alias("edit_dist"),
        )
    )

    # short-short completion: both lengths <= d => ed <= d always
    shorts = s_all.filter(F.col("pj_len") < k)
    sl = shorts.select(
        F.col("pj_id").alias("a_id"), F.col("pj_s").alias("a_s")
    )
    sr = shorts.select(
        F.col("pj_id").alias("b_id"), F.col("pj_s").alias("b_s")
    )
    # broadcast the short side: the ≤d-char class is bounded (distinct
    # strings ≤ |alphabet|^d); a corpus DOMINATED by such strings is out
    # of scope for a segment join (docstring) — this stays a
    # BroadcastNestedLoopJoin over a trivially small build side
    short_pairs = (
        sl.crossJoin(F.broadcast(sr))
        .filter(F.col("a_id") < F.col("b_id"))
        .select(
            F.col("a_id").alias("id_a"),
            F.col("b_id").alias("id_b"),
            F.levenshtein("a_s", "b_s").alias("edit_dist"),
        )
    )
    return cand.unionByName(short_pairs).distinct()
