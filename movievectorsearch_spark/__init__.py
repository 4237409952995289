"""movievectorsearch_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the query and data-processing
capabilities of ``lukeUCL/movieVectorSearch`` (reference snapshot at
``/root/reference``), built Spark-first: DataFrame/SQL plans optimized
by Catalyst, vector kernels as native SQL expressions (whole-stage
codegen, no Python in the hot path), Structured Streaming for the
ingestion analog, and LSH/IVF for approximate search at scale.

Layout
------
- ``session``    SparkSession factory tuned for large-scale batch work
- ``catalog``    table registry over the parquet testdata + the
                 reference-shaped ``films`` view
- ``functions``  scalar/vector/text/hash expression builders (pure
                 Column expressions — portable to a DuckDB oracle)
- ``operators``  relational + vector operators (KNN, dedup, search,
                 upsert, subtopic grouping, text analysis)
- ``pipeline``   the ingestion dataflow analog (parse→clean→validate→
                 dedup→derive→embed→merge)
- ``streaming``  Structured Streaming analogs of the reference's
                 checkpoint/resume/dedup ingestion loop
"""

__version__ = "0.1.0"
