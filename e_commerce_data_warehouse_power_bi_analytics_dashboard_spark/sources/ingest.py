"""Bronze-layer ingest: CSV staging readers/writers (SURVEY S1).

The reference loads raw CSVs into all-TEXT staging tables
(Group No.6_ETL.sql:22-62, README.md:27-30) — schema-on-read with typing
deferred to the cleaning pipeline (operators/cleaning.py). The driver
testdata ships as parquet, so production entry points read parquet; this
module provides the CSV path itself plus a lossless round-trip used by
the ``staging_csv_ingest`` catalog entry and tests.

Null discipline: CSV cannot natively distinguish NULL from '' — both
serialize as an empty field. We write with ``nullValue=\\N`` (the classic
COPY convention) so the round-trip is exact, matching the reference's
staging contract where blanks and NULLs are both conformed later by
``NULLIF(TRIM(x),'')``.

Scale: ``spark.read.csv`` splits uncompressed files by byte ranges, so a
100 TB CSV drop parallelizes across executors without pre-splitting;
schema is a fixed all-string StructType (no sampling pass over the data,
unlike inferSchema which scans everything twice).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

NULL_TOKEN = r"\N"


def string_schema(columns: list[str]) -> T.StructType:
    """All-TEXT staging schema (E:22-58's contract)."""
    return T.StructType([T.StructField(c, T.StringType()) for c in columns])


def write_staging_csv(df: DataFrame, path: str) -> None:
    """Serialize any DataFrame to staging CSV (all values stringified)."""
    out = df.select([F.col(c).cast("string").alias(c) for c in df.columns])
    (
        out.write.mode("overwrite")
        .option("header", True)
        .option("nullValue", NULL_TOKEN)
        .option("emptyValue", "")
        .csv(path)
    )


def read_staging_csv(spark: SparkSession, path: str, columns: list[str]) -> DataFrame:
    """Read a CSV drop as an all-string staging DataFrame (no inference)."""
    return (
        spark.read.schema(string_schema(columns))
        .option("header", True)
        .option("nullValue", NULL_TOKEN)
        .option("emptyValue", "")
        .csv(path)
    )


def clone_schema(spark: SparkSession, src: DataFrame) -> DataFrame:
    """CREATE TABLE ... WITH NO DATA (SURVEY S3, ELT.sql:30-40): an empty
    DataFrame with the source's exact schema."""
    return spark.createDataFrame([], src.schema)
