"""sports_stats_data_pipeline_spark — a PySpark-native analytics engine.

A brand-new engine providing the query and data-processing capabilities of
the reference pipeline (muhammadadnanmomin/sports-stats-data-pipeline, an
incremental scraping ETL — see SURVEY.md), re-expressed Spark-first:

- ``session``    — SparkSession factory tuned for large-scale execution
- ``schemas``    — explicit StructTypes (bronze all-string, silver typed)
- ``sources``    — table loaders, retry/rate-limited fetch infra, HTML parse
- ``functions``  — column-expression library (messy-string parsers, text
                   analysis, vector math)
- ``operators``  — incremental merge (insert-if-absent), dedup family
                   (exact / MinHash-LSH / SimHash / n-gram Jaccard /
                   embedding-cosine), similarity search, as-of & range joins,
                   multimodal column plumbing
- ``plans``      — named analytic queries (relational, events, documents)
- ``streaming``  — Structured Streaming pipelines over the events table

Everything is declared through the DataFrame/SQL API so Catalyst plans the
physical execution (pushdown, pruning, broadcast vs sort-merge, AQE). Python
UDFs appear only where built-ins cannot express the semantics, always as
Arrow-batched pandas UDFs / mapInPandas — never row-at-a-time.
"""

__version__ = "0.1.0"
