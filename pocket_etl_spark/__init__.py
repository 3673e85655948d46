"""pocket_etl_spark — a from-scratch, PySpark-native CDC / incremental-ingest engine.

Re-expresses the capabilities of the reference Java fluent-ETL library
(amazon-archives/pocket-etl, surveyed in SURVEY.md) as idiomatic Spark:

- DataFrame/Catalyst logical plans instead of hand-built producer/consumer chains
  (reference: src/main/java/com/amazon/pocketEtl/EtlStream.java:33-35);
- Structured Streaming ``foreachBatch`` + keyed last-writer-wins MERGE instead of the
  Redshift stage-table copy-and-merge
  (reference: src/main/java/com/amazon/pocketEtl/integration/RedshiftJdbcClient.java:103-148);
- Arrow/pandas-vectorized UDFs instead of per-record Java lambdas
  (reference: src/main/java/com/amazon/pocketEtl/Transformer.java:31-61).

Nothing here is a translation of the reference's code; citations are provided only so
behavioral parity can be checked.
"""

__version__ = "0.1.0"

from pocket_etl_spark.session import get_spark  # noqa: F401
