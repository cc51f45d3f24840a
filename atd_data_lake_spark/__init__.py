"""atd_data_lake_spark — a PySpark-native analytics engine with the data
model, operator semantics, and pipeline capabilities of the
cityofaustin/atd-data-lake reference (see SURVEY.md), re-expressed as
idiomatic Spark DataFrame/SQL over Parquet.

Layout:
- ``session``     SparkSession factory tuned for local[32] testing and
                  cluster-scale defaults (AQE, shuffle partitions, Arrow).
- ``schemas``     explicit StructTypes for every reference file type
                  (the Spark analog of the reference's per-file column lists).
- ``functions``   scalar helpers: ids (md5 surrogate keys), datetime
                  (timebin, day parts, clock-drift), geo (haversine-feet).
- ``operators``   reusable DataFrame-level operators: incremental anti-join
                  catalog plan (J1), as-of joins (J8/J9), fuzzy entity
                  resolution (J10), window helpers (A5/A6/A7), dedup
                  (exact/MinHash-LSH/SimHash/n-gram), similarity search,
                  text analysis, multimodal binary-column plumbing.
- ``pipelines``   the BT / WT / GS source pipelines (standardize → ready →
                  publish) as pure DataFrame → DataFrame functions.
- ``catalog``     the data-lake catalog table + upsert (MERGE emulation).
- ``streaming``   Structured Streaming analogs of the batch operators.
"""

__version__ = "0.1.0"
