"""hiveberg_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of ExpediaGroup/hiveberg (read path over
Iceberg-style snapshot tables + full relational surface), extended with
LLM-data-pipeline operators (dedup, similarity search, text analysis,
multimodal columns) and designed for 100 TB scale.

The reference (/root/reference) is a Hive InputFormat/SerDe/StorageHandler
for Apache Iceberg: it provides the *scan layer* (table resolution, split
planning, predicate & projection pushdown, time travel, snapshot metadata)
and delegates relational execution to Hive. Here the scan layer is Spark's
DataSource V2 + a small snapshot-table format (`hiveberg_spark.sources`),
and the relational surface is Catalyst — declared, not hand-scheduled.
"""

from hiveberg_spark.session import get_spark
from hiveberg_spark.registry import QUERIES, ORACLES, query

__all__ = ["get_spark", "QUERIES", "ORACLES", "query"]
__version__ = "0.1.0"
