"""urban_traffic_data_lake_project_spark — a PySpark-native analytics engine.

A brand-new, idiomatic Spark implementation of the query and data-processing
capabilities of the reference repo ``Fares403/urban-traffic-data-lake-project``
(a pandas/sklearn medallion data lake), re-expressed as lazy DataFrame / SQL
plans optimized by Catalyst, plus the LLM-training-data-pipeline surface
(deduplication, similarity search, text analysis, multimodal plumbing) the
reference lacks.

Layout
------
- ``session``    : SparkSession factory tuned for both local testing and
                   large-cluster execution (AQE, shuffle sizing, Arrow).
- ``functions``  : scalar/column helpers (multi-format timestamp parse,
                   stable 64-bit hashing, text normalization, seasons).
- ``operators``  : DataFrame -> DataFrame operators (cleaning kernel, joins,
                   stats, dedup, similarity, text analysis, Monte Carlo,
                   bootstrap, factor analysis, multimodal).
- ``sources``    : readers/writers with per-layer schema contracts
                   (bronze string-tolerant, silver typed, partitioned gold).
- ``plans``      : the medallion pipeline composed from operators.
- ``streaming``  : Structured Streaming surface (windows, watermarks,
                   stateful dedup) over the ``events`` table.
- ``queries``    : the named query registry exported through
                   ``__spark_entry__.py`` with DuckDB oracle SQL.
"""

__version__ = "0.1.0"
