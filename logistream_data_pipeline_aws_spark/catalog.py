"""Logical table registry — the engine's stand-in for the Glue Data Catalog.

The reference resolves tables through AWS Glue
(``create_dynamic_frame.from_catalog(database=..., table_name=...).toDF()``,
etl_jobs/glue_master_etl.py GE:100-103) with crawler-inferred schemas
(README.md RM:86).  Here the catalog is explicit: every logical table name
maps to a fixed ``StructType`` (never ``inferSchema`` in the engine proper)
and a path resolver, and ``register_views`` binds them as temp views so the
whole analytics surface is reachable from ``spark.sql``.

Two table families:

- **testdata tables** — the driver-generated TPC-H-ish star schema at
  ``/root/testdata/sf*/`` (region nation customer supplier part orders
  lineitem events documents embeddings), parquet.
- **reference-shaped tables** — ``rawdata`` (order line items, the 33
  ETL-touched columns of the 58-column DataCo CSV) and ``processed_routes``
  (flattened GeoJSON routes, 5 columns per LJ:24), used by the
  reference-parity warehouse build and its unit tests.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# --------------------------------------------------------------------------
# testdata (TPC-H-ish) schemas — fixed, mirroring the parquet footers
# --------------------------------------------------------------------------

TESTDATA_SCHEMAS: dict[str, T.StructType] = {
    "region": T.StructType(
        [
            T.StructField("r_regionkey", T.IntegerType()),
            T.StructField("r_name", T.StringType()),
        ]
    ),
    "nation": T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType()),
            T.StructField("n_name", T.StringType()),
            T.StructField("n_regionkey", T.IntegerType()),
        ]
    ),
    "customer": T.StructType(
        [
            T.StructField("c_custkey", T.LongType()),
            T.StructField("c_name", T.StringType()),
            T.StructField("c_nationkey", T.IntegerType()),
            T.StructField("c_acctbal", T.DoubleType()),
            T.StructField("c_mktsegment", T.StringType()),
        ]
    ),
    "supplier": T.StructType(
        [
            T.StructField("s_suppkey", T.LongType()),
            T.StructField("s_name", T.StringType()),
            T.StructField("s_nationkey", T.IntegerType()),
            T.StructField("s_acctbal", T.DoubleType()),
        ]
    ),
    "part": T.StructType(
        [
            T.StructField("p_partkey", T.LongType()),
            T.StructField("p_name", T.StringType()),
            T.StructField("p_brand", T.StringType()),
            T.StructField("p_type", T.StringType()),
            T.StructField("p_size", T.IntegerType()),
            T.StructField("p_retailprice", T.DoubleType()),
        ]
    ),
    "orders": T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_custkey", T.LongType()),
            T.StructField("o_orderstatus", T.StringType()),
            T.StructField("o_totalprice", T.DoubleType()),
            T.StructField("o_orderdate", T.TimestampType()),
            T.StructField("o_orderpriority", T.StringType()),
        ]
    ),
    "lineitem": T.StructType(
        [
            T.StructField("l_orderkey", T.LongType()),
            T.StructField("l_partkey", T.LongType()),
            T.StructField("l_suppkey", T.LongType()),
            T.StructField("l_linenumber", T.IntegerType()),
            T.StructField("l_quantity", T.DoubleType()),
            T.StructField("l_extendedprice", T.DoubleType()),
            T.StructField("l_discount", T.DoubleType()),
            T.StructField("l_tax", T.DoubleType()),
            T.StructField("l_returnflag", T.StringType()),
            T.StructField("l_linestatus", T.StringType()),
            T.StructField("l_shipdate", T.TimestampType()),
        ]
    ),
    "events": T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    ),
    "documents": T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    ),
    "embeddings": T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("label", T.IntegerType()),
        ]
    ),
}

# --------------------------------------------------------------------------
# reference-shaped staging schemas (FIXTURES.md §A1/§A3; types per the
# warehouse DDL data_warehouse/ddl_snowflake_schema.sql DS:1-102)
# --------------------------------------------------------------------------

RAWDATA_SCHEMA = T.StructType(
    [
        T.StructField("order_id", T.IntegerType()),
        T.StructField("order_item_id", T.IntegerType()),
        T.StructField("order_customer_id", T.IntegerType()),
        T.StructField("customer_id", T.IntegerType()),
        T.StructField("customer_fname", T.StringType()),
        T.StructField("customer_lname", T.StringType()),
        T.StructField("customer_email", T.StringType()),
        T.StructField("customer_city", T.StringType()),
        T.StructField("customer_state", T.StringType()),
        T.StructField("customer_segment", T.StringType()),
        T.StructField("customer_country", T.StringType()),
        T.StructField("department_id", T.IntegerType()),
        T.StructField("department_name", T.StringType()),
        T.StructField("category_id", T.IntegerType()),
        T.StructField("category_name", T.StringType()),
        T.StructField("product_card_id", T.IntegerType()),
        T.StructField("product_name", T.StringType()),
        T.StructField("product_image", T.StringType()),
        T.StructField("order_item_product_price", T.DecimalType(10, 2)),
        T.StructField("shipping_mode", T.StringType()),
        T.StructField("delivery_status", T.StringType()),
        T.StructField("order_status", T.StringType()),
        T.StructField("order_date_dateorders", T.StringType()),
        T.StructField("shipping_date_dateorders", T.StringType()),
        T.StructField("order_city", T.StringType()),
        T.StructField("order_state", T.StringType()),
        T.StructField("order_country", T.StringType()),
        T.StructField("order_region", T.StringType()),
        T.StructField("market", T.StringType()),
        T.StructField("latitude_src", T.DoubleType()),
        T.StructField("longitude_src", T.DoubleType()),
        T.StructField("latitude_dest", T.DoubleType()),
        T.StructField("longitude_dest", T.DoubleType()),
        T.StructField("sales", T.DecimalType(10, 2)),
        T.StructField("order_item_quantity", T.IntegerType()),
        T.StructField("order_profit_per_order", T.DecimalType(10, 2)),
        T.StructField("order_item_discount_rate", T.DecimalType(10, 2)),
        T.StructField("days_for_shipping_real", T.IntegerType()),
        T.StructField("days_for_shipment_scheduled", T.IntegerType()),
        T.StructField("late_delivery_risk", T.IntegerType()),
    ]
)

PROCESSED_ROUTES_SCHEMA = T.StructType(
    [
        T.StructField("origin_lat", T.DoubleType()),
        T.StructField("origin_long", T.DoubleType()),
        T.StructField("dest_lat", T.DoubleType()),
        T.StructField("dest_long", T.DoubleType()),
        T.StructField("shape_wkt", T.StringType()),
    ]
)


def table_path(name: str, sf_dir: str = DEFAULT_SF_DIR) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


# raw-read schema for TIMESTAMP(NANOS)-encoded events files: ts as int64
EVENTS_RAW_NS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)

# keyed by (probe file, mtime, size): the driver regenerates testdata
# in-place between rounds — a stale cached unit would silently shift
# every parsed timestamp by 1000x, so the cache self-invalidates when the
# file changes (the footer peek is cheap; the stat is cheaper)
_EVENTS_TS_UNIT_CACHE: dict[tuple[str, float, int], str] = {}


def events_ts_unit(sf_dir: str = DEFAULT_SF_DIR) -> str:
    """Footer-sniff the time unit of ``events.ts``: ``'us'`` or ``'ns'``.

    The driver regenerates testdata between rounds and has shipped BOTH
    encodings (TIMESTAMP(NANOS) in rounds 1-2, TIMESTAMP(MICROS) in round
    3) — one cached metadata peek per file-version makes every batch and
    stream reader unit-proof instead of hardcoding either era.  The unit
    comes from the typed arrow API (not string matching), so tz-annotated
    micros (``timestamp[us, tz=UTC]``, common for Spark-written parquet)
    classify correctly; a timestamp unit this reader has no path for
    (ms/s) raises instead of silently reading raw int64 at the wrong
    scale.  Plain ``int64`` (no logical type, e.g. hand-built fixtures)
    is treated as raw nanos.
    """
    path = table_path("events", sf_dir)
    if os.path.isdir(path):
        inner = [f for f in sorted(os.listdir(path)) if f.endswith(".parquet")]
        probe = os.path.join(path, inner[0]) if inner else path
    else:
        probe = path
    st = os.stat(probe)
    cache_key = (probe, st.st_mtime, st.st_size)
    unit = _EVENTS_TS_UNIT_CACHE.get(cache_key)
    if unit is None:
        import pyarrow as pa
        import pyarrow.parquet as pq

        t = pq.ParquetFile(probe).schema_arrow.field("ts").type
        if pa.types.is_timestamp(t):
            unit = t.unit
            if unit not in ("us", "ns"):
                raise ValueError(
                    f"events.ts has timestamp unit {unit!r} ({probe}); this "
                    "reader handles 'us' (native) and 'ns' (nanosAsLong) only"
                )
        else:
            unit = "ns"
        _EVENTS_TS_UNIT_CACHE[cache_key] = unit
    return unit


def load_table(spark: SparkSession, name: str, sf_dir: str = DEFAULT_SF_DIR) -> DataFrame:
    """Read one testdata table with its fixed schema (no inference).

    Column pruning + predicate pushdown reach the parquet scan because the
    read is a plain declarative ``spark.read.parquet`` — downstream
    ``select``/``filter`` land in ``PushedFilters`` / ``ReadSchema``.

    ``events.ts`` is unit-sniffed (``events_ts_unit``): a MICROS file is
    Spark's native timestamp encoding and reads directly; a NANOS file is
    read as raw nanos (``nanosAsLong`` — Spark's vectorized reader refuses
    to widen nanos to its microsecond TimestampType) and floored to micros.
    Session-local, decided at read time so any SparkSession works.
    """
    if name not in TESTDATA_SCHEMAS:
        raise KeyError(f"unknown table {name!r}; known: {sorted(TESTDATA_SCHEMAS)}")
    if name == "events" and events_ts_unit(sf_dir) == "ns":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        raw = spark.read.schema(EVENTS_RAW_NS_SCHEMA).parquet(table_path(name, sf_dir))
        from pyspark.sql import functions as F

        # integer div: ns epoch (~1.7e18) exceeds double's 53-bit mantissa
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return spark.read.schema(TESTDATA_SCHEMAS[name]).parquet(table_path(name, sf_dir))


class events_stream:
    """Context manager yielding a STREAMING events frame with engine-native
    microsecond timestamps, whatever the file encoding.

    For NANOS files the ``nanosAsLong`` session conf must stay set while
    the stream drains, so the flip is scoped to the ``with`` block and
    restored on exit; MICROS files need no conf at all.  Use::

        with events_stream(spark, sf_dir) as stream:
            agg = ...build on stream...
            run_available_now(agg, sink_name)
    """

    _CONF = "spark.sql.legacy.parquet.nanosAsLong"

    def __init__(self, spark: SparkSession, sf_dir: str):
        self.spark, self.sf_dir = spark, sf_dir
        self._prev: str | None = None
        self._flipped = False

    def _source(self, reader, schema) -> DataFrame:
        """The events table may be a single flat file named
        ``events.parquet`` (driver testdata) or a directory of part
        files under that name (any Spark writer, the scale probe) —
        point the file source at whichever exists.  A glob filter only
        matches LEAF file names, so the flat layout needs it while the
        directory layout must not have it."""
        path = table_path("events", self.sf_dir)
        if os.path.isdir(path):
            return reader.schema(schema).parquet(path)
        return (
            reader.schema(schema)
            .option("pathGlobFilter", "events.parquet")
            .parquet(self.sf_dir)
        )

    def __enter__(self) -> DataFrame:
        reader = self.spark.readStream
        if events_ts_unit(self.sf_dir) == "us":
            return self._source(reader, TESTDATA_SCHEMAS["events"])
        try:
            self._prev = self.spark.conf.get(self._CONF)
        except Exception:
            self._prev = None
        self.spark.conf.set(self._CONF, "true")
        self._flipped = True
        from pyspark.sql import functions as F

        return self._source(reader, EVENTS_RAW_NS_SCHEMA).withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000"))
        )

    def __exit__(self, *exc) -> None:
        if not self._flipped:
            return
        if self._prev is None:
            try:
                self.spark.conf.unset(self._CONF)
            except Exception:
                pass
        else:
            self.spark.conf.set(self._CONF, self._prev)


def load_all(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    return {name: load_table(spark, name, sf_dir) for name in TESTDATA_SCHEMAS}


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    """Bind every testdata table as a temp view (spark.sql surface, §3.3)."""
    dfs = load_all(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
