"""dataengineer_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the query and data-processing capabilities
evidenced by BCCancerRegistry/DataEngineer (an Airflow + pandas + Postgres
clinical-NLP ETL suite; see SURVEY.md), re-expressed Spark-first:

- lazy DataFrame plans instead of the pandas/Postgres round-trip data plane
- Catalyst instead of hand-built SQL strings
- a ``batch_id``-partitioned parquet lake instead of the audit-table pattern
- Arrow-batched pandas UDFs instead of in-process model calls
- plus LLM-data-pipeline operators (dedup, similarity search, multimodal
  columns, text analysis) and event-time/streaming analytics.

Everything here derives from the public Apache Spark API and the behavior
observed in the reference repo; no proprietary systems are referenced.
"""

from dataengineer_spark.session import build_session, stop_session
from dataengineer_spark.config import RunConfig
from dataengineer_spark.catalog import Catalog

__all__ = ["build_session", "stop_session", "RunConfig", "Catalog"]

__version__ = "0.1.0"
