"""Dataset-curation operators for training-data pipelines.

Beyond-reference capabilities a corpus-prep pipeline needs at 100 TB:
deterministic train/val/test splitting, benchmark decontamination
(n-gram overlap against a held-out eval set), token-window chunking,
and per-stratum deterministic sampling.

All of these are pure JVM column expressions or broadcast-join shapes —
no Python stages, no driver collects, no cross joins — so they scale
with the scan.  The split/sample primitives hash with ``md5`` (not
xxhash64) on purpose: md5 is the one hash every engine computes
identically, which makes assignments reproducible across Spark, DuckDB,
and anything else that reads the corpus, and lets the driver oracle
re-derive them exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from atd_data_lake_spark.operators.dedup import shingle_hash_rows, tokens

# hash_u16 yields 0..65535; split thresholds quantize fractions to
# 1/65536 granularity
_HASH_SPACE = 1 << 16


def _hex_val(h: Column, pos: int) -> Column:
    """Value 0..15 of the hex digit at 1-based ``pos`` of lowercase hex
    string ``h`` — ascii arithmetic only, so the same expression exists
    verbatim in any SQL dialect (no conv()/strtol dependence)."""
    c = F.substring(h, pos, 1)
    return F.ascii(c) - F.when(c <= "9", F.lit(48)).otherwise(F.lit(87))


def hash_u16(key: Column, salt: str = "") -> Column:
    """Deterministic uniform value in [0, 65536) from the first 4 hex
    digits of md5(salt || key).  Engine-portable (md5 + ascii math) and
    stable across runs, partitionings, and cluster sizes — the property
    a train/test split must have so no document ever migrates between
    splits when the corpus is re-processed."""
    h = F.md5(F.concat(F.lit(salt), key.cast("string")))
    v = _hex_val(h, 1)
    for i in (2, 3, 4):
        v = v * 16 + _hex_val(h, i)
    return v.cast("long")


def split_dataset(
    df: DataFrame,
    key_col: str = "doc_id",
    fractions: dict[str, float] | None = None,
    salt: str = "v1",
) -> DataFrame:
    """Assign every row a split label ('train'/'val'/'test'/...) by
    thresholding ``hash_u16`` against cumulative fractions.

    Zero shuffles: the assignment is a per-row expression evaluated
    inside the scan stage.  Changing ``salt`` re-rolls the assignment;
    changing ``fractions`` only moves rows across adjacent boundaries
    (a doc in train at 80% is still in train at 85%) — the standard
    monotone-threshold property hash splits are chosen for.

    Fractions are quantized to 1/65536; documented, not a defect.
    """
    fractions = fractions or {"train": 0.8, "val": 0.1, "test": 0.1}
    if abs(sum(fractions.values()) - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {fractions}")
    v = hash_u16(F.col(key_col), salt=salt)
    cum = 0.0
    expr = None
    names = list(fractions)
    for name in names[:-1]:
        cum += fractions[name]
        bound = int(round(cum * _HASH_SPACE))
        clause = F.when(v < bound, F.lit(name))
        expr = clause if expr is None else expr.when(v < bound, F.lit(name))
    expr = (
        F.lit(names[-1])
        if expr is None
        else expr.otherwise(F.lit(names[-1]))
    )
    return df.withColumn("bucket", v).withColumn("split", expr)


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    key_col: str = "doc_id",
    default_fraction: float = 0.0,
    salt: str = "v1",
) -> DataFrame:
    """Deterministic per-stratum sampling: keep a row iff its
    ``hash_u16`` falls below the stratum's fraction threshold.

    Unlike ``DataFrame.sample``, membership is a pure function of
    (key, salt), so re-runs, retried tasks, and different partitionings
    all select the same rows — required for reproducible corpus mixes
    (e.g. "3% web, 30% code, 100% books").  Zero shuffles.
    """
    for s, frac in fractions.items():
        if not 0.0 <= frac <= 1.0:
            raise ValueError(f"fraction for {s!r} outside [0, 1]: {frac}")
    v = hash_u16(F.col(key_col), salt=salt)
    thresh = F.lit(int(round(default_fraction * _HASH_SPACE)))
    for s, frac in fractions.items():
        thresh = (
            F.when(F.col(strata_col) == s, int(round(frac * _HASH_SPACE)))
            .otherwise(thresh)
        )
    return df.filter(v < thresh)


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.0,
) -> DataFrame:
    """Benchmark decontamination: per-document overlap with a held-out
    eval set's word n-grams.

    Returns (id, n_shingles, n_overlap, contam_ratio, is_contaminated)
    for every document with >= n tokens; ``is_contaminated`` is true
    when contam_ratio > threshold (the conventional policy is any-hit:
    threshold 0).  Join the clean side back with
    ``docs.join(result.filter(~is_contaminated), id_col, 'left_semi')``.

    Scale shape: the benchmark's distinct shingle-hash set is bounded by
    the eval suite size (thousands of docs), so it is BROADCAST; the
    corpus side streams through a map-side left join — the corpus text
    never shuffles.  The only exchange is the (id, counts) aggregation,
    which is map-side-combined.  At 100 TB this is one scan + one narrow
    agg.

    Both sides shingle through the Arrow-batched ``shingle_hash_rows``
    (the interpreted higher-order array expressions measure 6-10× slower
    on bulk text) and compare 64-bit shingle hashes, not strings — the
    broadcast ships 8 bytes per benchmark shingle.
    """
    doc_sh = shingle_hash_rows(docs, id_col, text_col, n, with_size=True)
    bench_h = (
        shingle_hash_rows(benchmark, id_col, text_col, n)
        .select("_hash")
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    # one pass: n_shingles = rows per doc, n_overlap = rows whose hash
    # found a benchmark marker in the broadcast left join
    rep = (
        doc_sh.join(F.broadcast(bench_h), "_hash", "left")
        .groupBy(F.col("_id").alias(id_col))
        .agg(
            F.count("*").alias("n_shingles"),
            F.count("_hit").alias("n_overlap"),
        )
    )
    ratio = F.round(
        F.col("n_overlap") / F.col("n_shingles").cast("double"), 6
    )
    return rep.select(
        id_col,
        "n_shingles",
        "n_overlap",
        ratio.alias("contam_ratio"),
        (ratio > threshold).alias("is_contaminated"),
    )


def semantic_decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    threshold: float = 0.30,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_benchmark_rows: int = 200_000,
) -> DataFrame:
    """Embedding-level benchmark decontamination: flag training docs
    whose embedding is too close (cosine) to any held-out eval vector.

    The n-gram ``decontaminate`` catches verbatim leakage; this catches
    paraphrase-level leakage (the Phi/Llama eval-contamination report
    recipe).  Returns one row per corpus vector:
    (id, bench_id, cos_sim, contaminated) — the BEST benchmark match
    (max rounded cosine, ties broken toward the smallest bench id) and
    whether it crosses ``threshold``.  Filter ``~contaminated`` for the
    clean side.

    Scale shape (100 TB): benchmark sets are small (10³–10⁵ rows — MMLU
    scale), so the benchmark matrix ships in the task closure and the
    whole operator is ONE Arrow-batched map stage over the corpus —
    zero shuffles, zero joins, corpus vectors never move.  Same float
    discipline as ``cosine_topk``: float64 matmul, half-up round(6) so
    the scores hash-match DuckDB's ``list_cosine_similarity``.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    from atd_data_lake_spark.operators.scale import fan_out
    from atd_data_lake_spark.operators.similarity import (
        _cosine_matrix,
        _round_half_up,
        drop_null_vectors,
    )

    corpus = drop_null_vectors(corpus, vec_col)
    benchmark = drop_null_vectors(benchmark, vec_col)

    # Enforce the "benchmark sets are small" contract IN the collect:
    # one pass collects at most max+1 rows — the cap protects the driver
    # (a miscalled benchmark=corpus would otherwise OOM it and ship an
    # O(N) matrix in every task closure; same gate pattern as
    # similarity.embedding_near_dups' max_collect_rows).
    brows = benchmark.select(id_col, vec_col).limit(
        max_benchmark_rows + 1
    ).collect()
    if len(brows) > max_benchmark_rows:
        raise ValueError(
            f"benchmark set exceeds max_benchmark_rows={max_benchmark_rows}; "
            "semantic_decontaminate broadcasts the benchmark matrix to every "
            "task — pass a held-out eval set (10^3-10^5 rows), not a corpus"
        )
    brows = sorted(brows, key=lambda r: r[0])
    if not brows:
        raise ValueError("benchmark set is empty")
    bids = np.array([r[0] for r in brows], dtype=np.int64)
    bmat = np.array([r[1] for r in brows], dtype=np.float64)

    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("bench_id", T.LongType()),
            T.StructField("cos_sim", T.DoubleType()),
            T.StructField("contaminated", T.BooleanType()),
        ]
    )

    def op(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue  # np.stack crashes on an empty partition
            mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            sims = _round_half_up(_cosine_matrix(mat, bmat))  # n×b
            # bids are sorted ascending, argmax takes the FIRST max →
            # ties resolve to the smallest bench id deterministically
            best = np.argmax(sims, axis=1)
            best_sim = sims[np.arange(len(mat)), best]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "bench_id": bids[best],
                    "cos_sim": best_sim,
                    "contaminated": best_sim >= threshold,
                }
            )

    return fan_out(corpus).select(id_col, vec_col).mapInPandas(
        op, schema=out_schema
    )


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 64,
    stride: int = 48,
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Split documents into overlapping token windows for context-length
    packing: chunk i covers tokens [i*stride, i*stride + chunk_tokens).

    n_chunks = 1 + ceil(max(n_tokens - chunk_tokens, 0) / stride), so a
    short doc yields exactly one chunk and every token lands in at least
    one chunk.  Output: (id, chunk_id, n_chunk_tokens, chunk_text).

    Pure JVM sequence/explode/slice — the explode happens AFTER the scan
    projects (id, text) only, and there is no shuffle at all: chunking
    is embarrassingly parallel and the output partitioning inherits the
    input's.
    """
    if stride <= 0 or chunk_tokens <= 0:
        raise ValueError("chunk_tokens and stride must be positive")
    if stride > chunk_tokens:
        raise ValueError("stride > chunk_tokens would drop tokens")
    toks = tokens(F.col(text_col))
    n = F.size(toks)
    n_chunks = 1 + F.ceil(
        F.greatest(n - chunk_tokens, F.lit(0)) / F.lit(stride)
    ).cast("int")
    base = df.select(
        F.col(id_col),
        *[F.col(c) for c in keep_cols],
        toks.alias("_toks"),
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_id"),
    )
    piece = F.slice(
        F.col("_toks"), F.col("chunk_id") * stride + 1, chunk_tokens
    )
    return base.select(
        id_col,
        *keep_cols,
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.size(piece).cast("long").alias("n_chunk_tokens"),
        F.concat_ws(" ", piece).alias("chunk_text"),
    )


def pack_chunks(
    chunks: DataFrame,
    context_tokens: int,
    shard_col: str = "source",
    id_col: str = "doc_id",
    chunk_col: str = "chunk_id",
    tokens_col: str = "n_chunk_tokens",
) -> DataFrame:
    """Concat-and-cut sequence packing: within each shard, lay the
    chunks end to end in (id, chunk_id) order and cut every
    ``context_tokens`` — each chunk's pack is the context window its
    FIRST token falls in (floor(cum_tokens_before / context)).

    This is the standard LLM-pretraining packing (documents
    concatenated, context windows cut regardless of boundaries), made
    deterministic by the explicit ordering.  Packing is per-shard on
    purpose: a single global running sum would serialize the whole
    corpus through one partition, while per-shard windows parallelize
    across shards and still produce contiguous, reproducible packs —
    shard identity simply becomes part of the pack key.

    One shuffle (the window partition on shard).  Output adds
    (cum_before, pack_id) keyed by (shard, pack_id).
    """
    if context_tokens <= 0:
        raise ValueError("context_tokens must be positive")
    from pyspark.sql import Window

    w = (
        Window.partitionBy(shard_col)
        .orderBy(id_col, chunk_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(tokens_col).over(w) - F.col(tokens_col)
    return chunks.select(
        shard_col,
        id_col,
        chunk_col,
        tokens_col,
        cum.cast("long").alias("cum_before"),
        F.floor(cum / context_tokens).cast("long").alias("pack_id"),
    )


def cap_per_source(
    df: DataFrame,
    source_col: str = "source",
    key_col: str = "doc_id",
    max_per_source: int = 10,
    salt: str = "v1",
) -> DataFrame:
    """Per-source document cap (the Common-Crawl-style per-domain
    quota): keep at most ``max_per_source`` rows per source, chosen by
    the deterministic ``hash_u16`` order (hash asc, key asc tiebreak) so
    the retained set is a stable pseudo-random sample, not
    first-in-file-order.

    One shuffle (window on source); the rank filter keeps only k rows
    per group downstream.
    """
    from pyspark.sql import Window

    v = hash_u16(F.col(key_col), salt=salt)
    w = Window.partitionBy(source_col).orderBy(
        v.asc(), F.col(key_col).asc()
    )
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= max_per_source)
        .drop("_rk")
    )


def quality_gate_percentile(
    df: DataFrame,
    metric_col: str,
    group_col: str | None = None,
    min_percentile: float = 0.1,
) -> DataFrame:
    """Drop the bottom ``min_percentile`` of rows by a quality metric,
    optionally within groups (e.g. per language, so high-resource
    languages don't crowd out low-resource ones).

    Uses ``percent_rank`` — rank-based, so it needs no global scan to
    find the threshold value and is deterministic under ties (equal
    metric values share a rank and are kept or dropped together).
    One shuffle (the window partition).
    """
    if not 0.0 <= min_percentile < 1.0:
        raise ValueError("min_percentile must be in [0, 1)")
    from pyspark.sql import Window

    w = (
        Window.partitionBy(group_col) if group_col else Window.partitionBy()
    ).orderBy(F.col(metric_col).asc())
    return (
        df.withColumn("_pr", F.percent_rank().over(w))
        .filter(F.col("_pr") >= min_percentile)
        .drop("_pr")
    )


def keep_best_per_cluster(
    clusters: DataFrame,
    quality: DataFrame,
    id_col: str = "doc_id",
    cluster_col: str = "component",
    quality_col: str = "quality",
) -> DataFrame:
    """Canonical-document selection: given near-dup cluster assignments
    (one row per clustered doc) and a per-doc quality frame, emit one row
    per cluster carrying the member to KEEP — highest quality, smallest
    id on ties — plus the cluster size.

    This is the step that turns a near-dup pair list into an actionable
    drop set: everything in the cluster except ``kept_id`` is removed
    from the corpus.  Keeping the *best* member (not an arbitrary one)
    is standard corpus-prep practice — near-dup clusters often mix a
    clean original with mangled re-crawls.

    Plan: one broadcast-eligible equi-join on the id, one agg keyed by
    cluster.  ``max_by`` over a (quality, -id) struct does the
    argmax-with-tiebreak in a single map-side-combinable aggregate — no
    window sort, no secondary shuffle.
    """
    ordering = F.struct(F.col(quality_col), (-F.col(id_col)).alias("_neg"))
    return (
        clusters.join(quality, id_col)
        .groupBy(F.col(cluster_col).alias("cluster_id"))
        .agg(
            F.max_by(F.col(id_col), ordering).alias("kept_id"),
            F.max_by(F.col(quality_col), ordering).alias("kept_quality"),
            F.count("*").alias("n_members"),
        )
    )


def token_budget_per_source(
    df: DataFrame,
    source_col: str = "source",
    key_col: str = "doc_id",
    text_col: str = "text",
    budget_tokens: int = 10_000,
    order_col: str | None = None,
) -> DataFrame:
    """Greedy per-source selection under a TOKEN budget (not a document
    count — ``cap_per_source`` does that): order each source's documents
    best-first and keep documents while the running token total stays
    within ``budget_tokens``.

    This is the mixture-building step that follows quality scoring:
    "take the best N *tokens* (not docs) from each source" is how corpus
    recipes are actually specified.  Greedy-by-rank under a running-sum
    window is the standard formulation; a knapsack-optimal selection is
    neither deterministic-stable nor needed.

    ``order_col``: ranking column, best DESC first (``key_col`` asc
    breaks ties).  Defaults to the token count itself (longest-first).

    One shuffle (window on source); token counts are a JVM expression
    (whitespace split), so the text never feeds a Python stage.
    """
    from pyspark.sql import Window

    order_col = order_col or "_n_tokens"
    toks = F.size(F.split(F.col(text_col), " ")).cast("long")
    out = df.withColumn("_n_tokens", toks)
    w = (
        Window.partitionBy(source_col)
        .orderBy(F.col(order_col).desc(), F.col(key_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        out.withColumn("cum_tokens", F.sum("_n_tokens").over(w))
        .filter(F.col("cum_tokens") <= budget_tokens)
        .select(
            key_col,
            source_col,
            F.col("_n_tokens").alias("n_tokens"),
            "cum_tokens",
        )
    )


def mixture_resample(
    df: DataFrame,
    weights: dict[str, float],
    source_col: str = "source",
    key_col: str = "doc_id",
    salt: str = "mix1",
) -> DataFrame:
    """Deterministic down-sampling to a target SOURCE MIXTURE: given
    target weights (relative proportions, not fractions), keep the
    largest corpus whose per-source composition matches them exactly.

    The mixture-building step after quality gating: recipes specify
    "2 parts curated web : 1 part code : 1 part forums"; this computes
    the binding constraint (the source whose supply runs out first at
    those proportions keeps 100%) and down-samples every other source
    to w_s·scale documents, scale = min_s(n_s / w_s).  Sources absent
    from ``weights`` are dropped (weight 0).

    Everything stays in the plan: per-source counts (one tiny shuffle),
    the 1-row scale aggregate, and the per-source keep-threshold join
    back are all broadcast-sized; membership is ``hash_u16(key, salt) <
    floor(w·scale/n·65536)`` — a pure function of (key, salt, counts),
    so re-runs and repartitionings keep the identical document set, and
    raising a weight only ADDS documents from that source (threshold
    monotonicity, same property as ``split_dataset``).

    Count-exactness caveat: thresholding a uniform 16-bit hash yields
    approximately w_s·scale documents per source (binomial jitter), not
    the exact integer — the price of partition-independent determinism.
    For exact-count mixes rank within source instead (one window sort
    per source — ``token_budget_per_source``'s shape).
    """
    wt = F.lit(0.0)
    for s, w in weights.items():
        wt = F.when(F.col(source_col) == s, F.lit(float(w))).otherwise(wt)
    counts = df.groupBy(source_col).agg(F.count("*").cast("long").alias("_n"))
    per = counts.withColumn("_w", wt).filter(F.col("_w") > 0)
    scale = per.agg(F.min(F.col("_n") / F.col("_w")).alias("_scale"))
    thr = (
        per.crossJoin(F.broadcast(scale))
        .select(
            source_col,
            F.floor(
                F.col("_w") * F.col("_scale") / F.col("_n") * F.lit(65536.0)
            ).cast("long").alias("_thr"),
        )
    )
    return (
        df.join(F.broadcast(thr), source_col)
        .filter(hash_u16(F.col(key_col), salt=salt) < F.col("_thr"))
        .select(key_col, source_col)
    )
