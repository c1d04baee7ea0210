"""Test-table loader for /root/testdata/sf*/ parquet.

The driver's parquet files store TIMESTAMP(NANOS,false), which Spark's
parquet reader only accepts with ``spark.sql.legacy.parquet.nanosAsLong``
(session.py sets it).  This loader detects nanosecond timestamp columns
from the parquet footer (via pyarrow, driver-side only — no data read)
and converts them to proper TimestampType (microsecond truncation —
identical to what DuckDB's TIMESTAMP does with ns values).
"""

from __future__ import annotations

import os
from functools import lru_cache

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@lru_cache(maxsize=128)
def _nanos_cols(path: str) -> tuple[str, ...]:
    import pyarrow.parquet as pq
    import pyarrow as pa

    schema = pq.read_schema(path)
    out = []
    for field in schema:
        if isinstance(field.type, pa.TimestampType) and field.type.unit == "ns":
            out.append(field.name)
    return tuple(out)


#: path -> inferred Spark schema.  ``spark.read.parquet`` without an
#: explicit schema launches a footer-inference job on EVERY call
#: (~80 ms + one scheduler round trip); the schema of a given file is
#: immutable, so the first inference is remembered and later loads
#: pass it explicitly (zero jobs).  Metadata only — no data or query
#: results are memoized.
_SCHEMA_MEMO: dict = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # the driver's session may not carry these confs; both are
    # runtime-settable.  UTC keeps timestamp formatting/epoch math
    # aligned with DuckDB's naive-UTC timestamps regardless of host TZ.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    path = os.path.join(sf_dir, f"{name}.parquet")
    known = _SCHEMA_MEMO.get(path)
    if known is not None:
        df = spark.read.schema(known).parquet(path)
    else:
        df = spark.read.parquet(path)
        _SCHEMA_MEMO[path] = df.schema
    for c in _nanos_cols(path):
        # integer div — float division loses microsecond precision on
        # ~1.7e18 nanos values (double mantissa is 53 bits)
        df = df.withColumn(c, F.expr(f"timestamp_micros(`{c}` div 1000)"))
    # parquet TIMESTAMP(MICROS, isAdjustedToUTC=false) loads as
    # TIMESTAMP_NTZ; normalize to TimestampType — exact under the pinned
    # UTC session TZ and matches DuckDB's naive timestamps
    from pyspark.sql import types as T

    for field in df.schema.fields:
        if isinstance(field.dataType, T.TimestampNTZType):
            df = df.withColumn(field.name, F.col(field.name).cast("timestamp"))
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    for name, df in load_all(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
