"""PySpark-native analytics engine with the query and data-processing
capabilities of ``yandex-cloud-examples/yc-yq-airflow-etl``.

The reference is a "data cooling" ETL pipeline: an Airflow DAG
(``src/py/yq_dag.py``) that moves yearly partitions of a PostgreSQL
``payments`` table into Hive-partitioned Parquet on object storage via
federated YQL queries, reconciles both sides with an EXCLUSION JOIN,
and retires the source partitions. This package re-expresses that
surface — plus the large-scale training-data extensions (dedup,
similarity search, text analysis, multimodal columns, streaming) —
Spark-first: DataFrame/SQL plans optimized by Catalyst, partitioned
lake writes, broadcast/AQE-aware joins, Pandas UDFs only where
built-ins genuinely cannot express the semantics.

Layout
------
- ``session``    SparkSession builder (AQE, dynamic partition overwrite, UTC)
- ``schemas``    explicit StructTypes for every table (never infer)
- ``catalog``    named connections/bindings (``pg-finance``, ``etl_object_storage``)
- ``functions``  scalar/text/vector expression helpers (JVM-side first)
- ``operators``  exclusion/as-of/range joins, dedup, similarity, multimodal
- ``sources``    federated JDBC + partitioned parquet lake read/write
- ``plans``      the reference's queries + pipeline driver + analytics queries
- ``streaming``  Structured Streaming: watermarks, windows, cooling-as-stream
"""

__version__ = "0.1.0"
