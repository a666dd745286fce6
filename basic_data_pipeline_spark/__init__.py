"""basic_data_pipeline_spark — a PySpark-native analytics & ingestion engine.

Re-expresses the query and data-processing capabilities of the reference
CDC/ELT pipeline (kuppalaORG/basic-data-pipeline: MySQL → Debezium → Kafka →
consumer → ClickHouse) idiomatically on Apache Spark:

- relational analytics: DataFrame / Spark SQL over a star schema
  (Catalyst-optimized: pushdown, pruning, broadcast, AQE)
- CDC ingestion: from_json envelope decode → normalize column expressions →
  foreachBatch apply (upsert compaction via window, delete via anti-join,
  DLQ quarantine) — the Spark-first equivalent of the reference's
  consumer_to_file.py poll loop
- Structured Streaming: watermarks + event-time windows
- LLM-data-pipeline extensions: exact/near dedup (MinHash-LSH, SimHash),
  embedding similarity search, text analysis, multimodal column plumbing

Designed for 100 TB scale: declarative plans, shuffle-conscious operators,
broadcast-able dimensions, partition-aligned writes. Tested on local[*]
against deterministic parquet fixtures with a DuckDB oracle.
"""

from basic_data_pipeline_spark.session import get_spark, stop_spark
from basic_data_pipeline_spark.catalog import TABLES, load_table, load_tables, register_views

__all__ = [
    "get_spark",
    "stop_spark",
    "TABLES",
    "load_table",
    "load_tables",
    "register_views",
]
