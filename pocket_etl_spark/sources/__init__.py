"""Sources — the reference's Extractor inventory (SURVEY.md §2.1) as Spark readers.

Each class implements ``to_df(spark) -> DataFrame`` — the pull-based
``Extractor.next()`` contract (Extractor.java:29-59) becomes a declarative scan
whose batching/buffering Spark owns. All are lazy: nothing is read until an
action runs, and filters/projections applied downstream push into the scan.
"""

from __future__ import annotations

import hashlib
import os
from collections.abc import Iterable
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


@dataclass
class IterableExtractor:
    """Wraps an in-memory iterable of dict rows
    (extractor/IterableExtractor.java:34-77, IteratorExtractor.java:30-47)."""

    rows: Iterable[dict]
    schema: T.StructType | str | None = None

    def to_df(self, spark: SparkSession) -> DataFrame:
        rows = list(self.rows)
        if self.schema is not None:
            return spark.createDataFrame(rows, schema=self.schema)
        return spark.createDataFrame(rows)


@dataclass
class CsvExtractor:
    """CSV files → typed rows (extractor/CsvInputStreamMapper.java:35-94):
    configurable separator, header row, and the reference's
    FAIL_ON_MISSING_COLUMNS via FAILFAST mode (CsvInputStreamMapper.java:80-81).
    S3: pass s3a:// paths — Hadoop S3A replaces S3BufferedInputStream's
    whole-object buffering (S3BufferedExtractor.java:40-106)."""

    path: str
    schema: T.StructType | str | None = None
    sep: str = ","
    header: bool = True
    fail_on_malformed: bool = True

    def to_df(self, spark: SparkSession) -> DataFrame:
        r = (
            spark.read.option("sep", self.sep)
            .option("header", str(self.header).lower())
            .option("mode", "FAILFAST" if self.fail_on_malformed else "PERMISSIVE")
        )
        if self.schema is not None:
            r = r.schema(self.schema)
        else:
            r = r.option("inferSchema", "true")
        return r.csv(self.path)


@dataclass
class JsonExtractor:
    """JSON-lines files → rows (extractor/JSONStringMapper.java:48-87). The
    reference maps one JSON string per record, case-insensitively, ignoring
    unknown fields — spark.read.json with an explicit schema does the same
    (unknown keys dropped, missing keys null)."""

    path: str
    schema: T.StructType | str | None = None

    def to_df(self, spark: SparkSession) -> DataFrame:
        r = spark.read
        if self.schema is not None:
            r = r.schema(self.schema)
        return r.json(self.path)


def json_column(df: DataFrame, col: str, schema: T.StructType | str, out: str = "parsed") -> DataFrame:
    """JSONStringMapper as a mid-stream transform: parse a JSON string column
    into a struct (the SqsExtractor's messageMapper shape,
    extractor/SqsExtractor.java:88)."""
    return df.withColumn(out, F.from_json(F.col(col), schema))


@dataclass
class ParquetExtractor:
    """Columnar scan of one of the engine's tables or any parquet path."""

    path: str

    def to_df(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(self.path)


@dataclass
class JdbcExtractor:
    """SqlExtractor (extractor/SqlExtractor.java:54-158): parameterized SQL
    against a JDBC source. The reference's ``#name`` parameters are prepared-
    statement-safe (EtlJdbi.java:44-51); Spark's JDBC source takes a full query
    (pushed down to the database) and properties. Untestable in this sandbox
    (no database); kept thin over spark.read.jdbc."""

    url: str
    query: str
    properties: dict[str, str] = field(default_factory=dict)

    def to_df(self, spark: SparkSession) -> DataFrame:  # pragma: no cover
        return spark.read.format("jdbc").options(
            url=self.url, query=self.query, **self.properties
        ).load()


class FileQueueExtractor:
    """Queue-tail source — the SqsExtractor re-expressed over a directory of
    message files (extractor/SqsExtractor.java:58-247).

    Reference semantics preserved:
    - ``batch_size_limit`` caps one run's intake (visibility-timeout
      protection, SqsExtractor.java:124-126 → maxFilesPerTrigger analogue);
    - duplicate deliveries are eliminated by message digest
      (LinkedHashSet dedupe, SqsExtractor.java:190-232);
    - consumed messages are deleted only at ``commit()`` after the batch is
      durably loaded — at-least-once with commit-on-close
      (delete-on-close, SqsExtractor.java:239-247). A crash before commit()
      re-delivers the whole batch; the lake's batch-id fencing makes the
      replay a no-op (lake.py merge).
    """

    def __init__(self, dir_path: str, schema: T.StructType | str, batch_size_limit: int | None = None):
        self.dir_path = dir_path
        self.schema = schema
        self.batch_size_limit = batch_size_limit
        self._claimed: list[str] = []

    def to_df(self, spark: SparkSession) -> DataFrame:
        names = sorted(
            f for f in os.listdir(self.dir_path) if not f.startswith(("_", "."))
        )
        if self.batch_size_limit is not None:
            names = names[: self.batch_size_limit]
        self._claimed = [os.path.join(self.dir_path, f) for f in names]
        if not self._claimed:
            return spark.createDataFrame([], self.schema)
        df = spark.read.schema(self.schema).json(self._claimed)
        # duplicate-delivery elimination: same logical message delivered twice
        # (possibly as two files) collapses to one record
        return df.dropDuplicates()

    def commit(self) -> int:
        """Delete consumed messages (call after the sink commit)."""
        n = 0
        for p in self._claimed:
            try:
                os.remove(p)
                n += 1
            except FileNotFoundError:
                pass
        self._claimed = []
        return n


def message_digest(body: str) -> str:
    """Stable digest for queue-message dedupe bookkeeping."""
    return hashlib.sha256(body.encode()).hexdigest()
