"""Explicit schemas for every table the engine touches.

The reference declares schemas everywhere (PG DDL in
``src/sql/db_init.sql:5-28``; the S3 binding's explicit column list in
``img/YQLink3.png``) and never infers. We mirror that: a StructType per
table, used on every read, so plans are stable and the Parquet reader
prunes columns against a known schema.
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- reference-native tables (src/sql/db_init.sql:5-28) -----------------

ACCOUNTS = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("num", T.StringType(), False),
        T.StructField("saldo", T.DecimalType(10, 2), False),
        T.StructField("open_date", T.TimestampType(), False),
    ]
)

PAYMENTS = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("doc_num", T.StringType(), False),
        T.StructField("accdt", T.LongType(), False),
        T.StructField("acckt", T.LongType(), False),
        T.StructField("amount", T.DoubleType(), False),  # PG float8; int-valued
        T.StructField("payment_date", T.TimestampType(), False),
        T.StructField("descr", T.StringType(), True),
        T.StructField("state", T.StringType(), False),
    ]
)

# Cold (lake) copy = PAYMENTS + Hive partition column payment_year
# (UINT32 in the YQ binding, img/YQLink4.png → int here; non-negative
# asserted by the unwrap() on the write path, yq_dag.py:73).
PAYMENTS_LAKE = T.StructType(
    PAYMENTS.fields + [T.StructField("payment_year", T.IntegerType(), False)]
)

# --- driver testdata (/root/testdata/sf*/, TESTDATA.md) -----------------

REGION = T.StructType(
    [
        T.StructField("r_regionkey", T.IntegerType(), False),
        T.StructField("r_name", T.StringType(), False),
    ]
)

NATION = T.StructType(
    [
        T.StructField("n_nationkey", T.IntegerType(), False),
        T.StructField("n_name", T.StringType(), False),
        T.StructField("n_regionkey", T.IntegerType(), False),
    ]
)

CUSTOMER = T.StructType(
    [
        T.StructField("c_custkey", T.LongType(), False),
        T.StructField("c_name", T.StringType(), False),
        T.StructField("c_nationkey", T.IntegerType(), False),
        T.StructField("c_acctbal", T.DoubleType(), False),
        T.StructField("c_mktsegment", T.StringType(), False),
    ]
)

SUPPLIER = T.StructType(
    [
        T.StructField("s_suppkey", T.LongType(), False),
        T.StructField("s_name", T.StringType(), False),
        T.StructField("s_nationkey", T.IntegerType(), False),
        T.StructField("s_acctbal", T.DoubleType(), False),
    ]
)

PART = T.StructType(
    [
        T.StructField("p_partkey", T.LongType(), False),
        T.StructField("p_name", T.StringType(), False),
        T.StructField("p_brand", T.StringType(), False),
        T.StructField("p_type", T.StringType(), False),
        T.StructField("p_size", T.IntegerType(), False),
        T.StructField("p_retailprice", T.DoubleType(), False),
    ]
)

ORDERS = T.StructType(
    [
        T.StructField("o_orderkey", T.LongType(), False),
        T.StructField("o_custkey", T.LongType(), False),
        T.StructField("o_orderstatus", T.StringType(), False),
        T.StructField("o_totalprice", T.DoubleType(), False),
        T.StructField("o_orderdate", T.TimestampType(), False),
        T.StructField("o_orderpriority", T.StringType(), False),
    ]
)

LINEITEM = T.StructType(
    [
        T.StructField("l_orderkey", T.LongType(), False),
        T.StructField("l_partkey", T.LongType(), False),
        T.StructField("l_suppkey", T.LongType(), False),
        T.StructField("l_linenumber", T.IntegerType(), False),
        T.StructField("l_quantity", T.DoubleType(), False),
        T.StructField("l_extendedprice", T.DoubleType(), False),
        T.StructField("l_discount", T.DoubleType(), False),
        T.StructField("l_tax", T.DoubleType(), False),
        T.StructField("l_returnflag", T.StringType(), False),
        T.StructField("l_linestatus", T.StringType(), False),
        T.StructField("l_shipdate", T.TimestampType(), False),
    ]
)

# events.parquet stores ts as TIMESTAMP(NANOS), which Spark's Parquet
# reader rejects; we read it as long (spark.sql.legacy.parquet.nanosAsLong)
# and convert to microsecond TimestampType in catalog.load_testdata.
EVENTS_RAW = T.StructType(
    [
        T.StructField("event_id", T.LongType(), False),
        T.StructField("ts", T.LongType(), False),
        T.StructField("user_id", T.LongType(), False),
        T.StructField("event_type", T.StringType(), False),
        T.StructField("value", T.DoubleType(), False),
        T.StructField("props", T.StringType(), True),
    ]
)

EVENTS = T.StructType(
    [
        T.StructField("event_id", T.LongType(), False),
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("user_id", T.LongType(), False),
        T.StructField("event_type", T.StringType(), False),
        T.StructField("value", T.DoubleType(), False),
        T.StructField("props", T.StringType(), True),  # JSON payload
    ]
)

# JSON schema of events.props for from_json (json/array/map coverage);
# observed payload shape: {"k": <int>}.
EVENT_PROPS = T.StructType([T.StructField("k", T.LongType(), True)])

DOCUMENTS = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("n_chars", T.LongType(), True),
    ]
)

EMBEDDINGS = T.StructType(
    [
        T.StructField("vec_id", T.LongType(), False),
        T.StructField("embedding", T.ArrayType(T.FloatType(), True), True),
        T.StructField("label", T.IntegerType(), True),
    ]
)

TESTDATA_TABLES: dict[str, T.StructType] = {
    "region": REGION,
    "nation": NATION,
    "customer": CUSTOMER,
    "supplier": SUPPLIER,
    "part": PART,
    "orders": ORDERS,
    "lineitem": LINEITEM,
    "events": EVENTS,
    "documents": DOCUMENTS,
    "embeddings": EMBEDDINGS,
}
