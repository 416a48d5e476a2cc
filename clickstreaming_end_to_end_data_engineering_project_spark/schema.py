"""Declared schemas.

CLICKSTREAM_SCHEMA mirrors the reference's explicit StructType at
spark_processor/stream_processor.py:85-106 field-for-field (types from
the generator domains, data_generator/clickstream_generator.py:14-86).

EVENTS_PROPS_SCHEMA covers the driver testdata ``events.props`` JSON
column (TESTDATA.md): the testdata generator emits ``{"k": <int>}``.
"""

from __future__ import annotations

from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

DEVICE_SCHEMA = StructType(
    [
        StructField("type", StringType(), True),
        StructField("browser", StringType(), True),
        StructField("os", StringType(), True),
    ]
)

# Reference: stream_processor.py:85-106 (same fields, same types).
CLICKSTREAM_SCHEMA = StructType(
    [
        StructField("user_id", IntegerType(), True),
        StructField("session_id", StringType(), True),
        StructField("timestamp", TimestampType(), True),
        StructField("page", StringType(), True),
        StructField("event_type", StringType(), True),
        StructField("referrer", StringType(), True),
        StructField("device", DEVICE_SCHEMA, True),
        StructField("ip_address", StringType(), True),
        StructField("user_agent", StringType(), True),
        StructField("search_query", StringType(), True),
        StructField("product_id", IntegerType(), True),
        StructField("product_price", DoubleType(), True),
        StructField("quantity", IntegerType(), True),
        StructField("order_id", StringType(), True),
        StructField("total_amount", DoubleType(), True),
    ]
)

# Driver testdata events.props JSON payload.
EVENTS_PROPS_SCHEMA = StructType([StructField("k", IntegerType(), True)])

TABLE_NAMES = (
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
