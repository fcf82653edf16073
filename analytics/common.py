"""Shared helpers for the driver-parity analytics surface.

Every ``queries()`` callable receives the *driver's* SparkSession, whose
session time zone is unknown; `utc()` pins it to UTC so timestamp
rendering and epoch arithmetic agree with DuckDB's naive-UTC semantics
(the driver's oracle engine).  All float outputs are rounded to 4
decimals on BOTH sides so partial-aggregation summation order can never
flip the driver's value hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def utc(spark: SparkSession) -> SparkSession:
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return spark
