"""tf_datapipeline_spark — a PySpark-native analytics/data-pipeline engine.

A brand-new engine with the query and data-processing capabilities of the
reference `dypark86/tf_datapipeline` (an ML data-pipeline tutorial: scan →
decode → map/augment → shuffle → batch → repeat → prefetch), re-expressed
Spark-first (DataFrame/SQL over Parquet, Catalyst-optimized), plus the
LLM-data-pipeline operators a 100 TB training-data pipeline needs:
deduplication (exact / MinHash-LSH / SimHash / n-gram Jaccard / embedding
cosine), similarity search, multimodal binary columns, and text analysis.

Layout:
    session.py    SparkSession factory tuned for the workload
    catalog.py    Parquet catalog over the test star schema
    registry.py   query registry: name -> (spark, sf_dir) -> DataFrame,
                  plus the DuckDB oracle SQL twin for the correctness gate
    operators/    relational, window, events, dedup, similarity, text,
                  pipeline (the reference's own operator surface)
    sources/      binary/image corpus scan + sharded ETL writer
    functions/    reusable column expressions (deterministic hashing, dots)
    streaming/    Structured Streaming wrappers of the event operators
"""

__version__ = "0.1.0"
