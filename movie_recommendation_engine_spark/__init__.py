"""PySpark-native analytics engine with the query & data-processing
capabilities of nyu-big-data/Movie_Recommendation_Engine.

The reference (/root/reference) is a MovieLens collaborative-filtering
workload: CSV scans -> cast/project -> grouped aggregates (mean, count,
percentile) -> weighted-rating scoring -> global sort/top-k, plus an ALS
latent-factor pipeline, a per-user train/val/test splitter, and ranking
metrics (RMSE, MAP@K, hit-ratio).  This package re-expresses every one of
those operators Spark-first (DataFrame/SQL, Catalyst-optimized, no
driver-side collects on hot paths) and adds the large-scale
training-data-pipeline surface: dedup (exact/MinHash-LSH/SimHash/n-gram
Jaccard/embedding), similarity search, text analysis, multimodal column
plumbing, and Structured Streaming over event tables.

Subpackages
-----------
sources    schema'd readers/writers (CSV/Parquet/JSON) — SURVEY §2.1
operators  relational + pipeline operators (dedup, sampling, topk, ...)
functions  column-expression helpers (hashing, weighted rating, arrays)
plans      end-to-end pipelines (popularity, splitter, recommender, metrics)
streaming  Structured Streaming surface over the events table
"""

__version__ = "0.1.0"
