"""Parquet table sources for the driver-generated testdata star schema.

At production scale these would be Iceberg catalog tables
(``spark.read.table``) with partition pruning on the time column; the
sandbox ships plain parquet, which still exercises predicate pushdown and
column pruning (check ``PushedFilters`` / ``ReadSchema`` in ``.explain``).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = [
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
]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
