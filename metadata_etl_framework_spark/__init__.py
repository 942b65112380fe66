"""metadata_etl_framework_spark — a PySpark-native analytics/ETL engine.

A from-scratch, Spark-first re-implementation of the capabilities of the
reference metadata-driven ETL framework (umeshrakhe/metadata-etl-framework):
a step-vocabulary transform engine (filter, map, typeconversion, join,
aggregate, pivot, window, customudf, sqltransform), a data-quality rule
engine, anomaly detection, incremental/CDC loading, plus large-scale
training-data operators (dedup, similarity search, text analysis).

All data-plane work is expressed through the PySpark DataFrame/SQL API so
Catalyst + Tungsten own optimization and physical execution; Python UDFs are
reserved for semantics the built-in operators cannot express.
"""

__version__ = "0.1.0"

from metadata_etl_framework_spark.session import get_spark  # noqa: F401
