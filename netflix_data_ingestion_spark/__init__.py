"""netflix_data_ingestion_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first reimplementation of the query and
data-processing capabilities of the reference ETL pipeline
(harrymardika/netflix-data-ingestion): stateful text ingestion into a
star schema (dim_date / dim_movie / dim_customer / fact_ratings) plus
the analytical query layer declared in its warehouse DDL — re-expressed
as DataFrame/SQL logical plans that Catalyst optimizes, with
distributed Parquet storage instead of a driver-funneled PostgreSQL
sink.

Beyond the reference surface, the engine adds the operators a
large-scale training-data pipeline needs: deduplication (exact,
MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine), similarity
search over embedding columns, text analysis (language-ID, quality
scoring, token counting, fingerprinting), multimodal binary-column
plumbing, and Structured Streaming ingestion with watermarked windows.

Design stance (SURVEY.md §7.0):
- storage = partitioned Parquet; compute = DataFrame API + Spark SQL
- zero custom Catalyst rules — every operator is declarative
- deterministic Spark-generated surrogate keys (no DB SERIAL)
- no driver funnels: no toPandas()/collect() on large data
- AQE on; broadcast for true dimension tables; salting documented for skew
"""

__version__ = "0.1.0"
