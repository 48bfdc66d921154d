"""Distributed synthetic staging-data generator for the reference-shaped
pipeline (``plans.reference_pipeline``).

The pytest fixture (tests/fixtures.py::make_rawdata) builds rawdata with a
driver-side Python loop — right for 80-order unit tests, wrong for bench
scale.  This generator is pure ``spark.range`` + deterministic column
expressions: no driver loop, no RNG, linear in partitions, so a
bench/perf-floor run of ``build_warehouse`` scales with the cluster the
same way a real staging scan would.

Schema matches ``catalog.RAWDATA_SCHEMA`` (the reference's rawdata table,
FIXTURES.md §A1); values are synthetic but exercise every pipeline path:
hierarchy fan-out, junk-status combos, null/parsable "M/d/yyyy H:m" dates
(GE:184 filter), geography triples, and route coordinates (mostly misses —
the reference's route lookup is also sparse).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_CITIES = [
    ("Miami", "FL", "USA", "South", "LATAM"),
    ("Austin", "TX", "USA", "West", "LATAM"),
    ("Berlin", "BE", "Germany", "Europe", "Europe"),
    ("Lyon", "RA", "France", "Europe", "Europe"),
    ("Osaka", "KG", "Japan", "Asia", "Pacific Asia"),
]
_SEGMENTS = ["Consumer", "Corporate", "Home Office"]
_MODES = ["Standard Class", "First Class", "Second Class", "Same Day"]
_STATUSES = ["COMPLETE", "PENDING", "CLOSED", "ON_HOLD"]
_DELIVERY = ["Advance shipping", "Late delivery", "Shipping on time"]


def _pick(options: list[str], idx_col, col_name: str):
    arr = F.array(*[F.lit(x) for x in options])
    return F.element_at(arr, (F.pmod(idx_col, F.lit(len(options))) + 1).cast("int")).alias(col_name)


def synthetic_rawdata(spark: SparkSession, n_orders: int = 50_000) -> DataFrame:
    """~2x ``n_orders`` rawdata line items, fully distributed and
    deterministic (same rows for the same ``n_orders``, any cluster)."""
    o = spark.range(1, n_orders + 1).select(F.col("id").alias("oid"))
    ex = o.select(
        "oid",
        F.explode(
            F.sequence(F.lit(1), (F.lit(1) + F.pmod(F.col("oid"), F.lit(3))).cast("int"))
        ).alias("item_i"),
    )
    oid, item = F.col("oid"), F.col("item_i")
    item_id = oid * 4 + item
    cust = F.lit(100) + F.pmod(oid, F.lit(500))
    prod = F.lit(1000) + F.pmod(oid * 3 + item, F.lit(200))
    cat = F.lit(10) + F.pmod(prod, F.lit(25))
    dept = F.lit(1) + F.pmod(cat, F.lit(8))
    price = F.lit(10.0) + F.pmod(prod, F.lit(7)).cast("double") * 2.5
    qty = (F.lit(1) + F.pmod(item_id, F.lit(5))).cast("int")
    city_i = F.pmod(oid, F.lit(len(_CITIES)))
    dest_i = F.pmod(oid + 2, F.lit(len(_CITIES)))
    month = F.lit(1) + F.pmod(oid, F.lit(12))
    day = F.lit(1) + F.pmod(oid, F.lit(27))
    # the reference's raw "M/d/yyyy H:m" strings, with a null-date stripe
    order_date = F.when(
        F.pmod(oid, F.lit(17)) != 0,
        F.concat(
            month.cast("string"), F.lit("/"), day.cast("string"), F.lit("/2018 "),
            F.pmod(oid, F.lit(24)).cast("string"), F.lit(":"),
            F.pmod(oid, F.lit(60)).cast("string"),
        ),
    )
    ship_date = F.when(
        F.pmod(oid, F.lit(19)) != 0,
        F.concat(
            month.cast("string"), F.lit("/"),
            (F.lit(1) + F.pmod(oid, F.lit(26))).cast("string"), F.lit("/2018 4:5"),
        ),
    )
    city = lambda i, field: F.element_at(  # noqa: E731
        F.array(*[F.lit(c[field]) for c in _CITIES]), (i + 1).cast("int")
    )
    d2 = lambda c: c.cast("decimal(10,2)")  # noqa: E731
    days_real = (F.lit(1) + F.pmod(item_id, F.lit(7))).cast("int")
    days_sched = (F.lit(2) + F.pmod(oid, F.lit(4))).cast("int")
    return ex.select(
        oid.cast("int").alias("order_id"),
        item_id.cast("int").alias("order_item_id"),
        cust.cast("int").alias("order_customer_id"),
        cust.cast("int").alias("customer_id"),
        F.concat(F.lit("First"), cust.cast("string")).alias("customer_fname"),
        F.concat(F.lit("Last"), cust.cast("string")).alias("customer_lname"),
        F.concat(F.lit("c"), cust.cast("string"), F.lit("@example.com")).alias("customer_email"),
        city(city_i, 0).alias("customer_city"),
        city(city_i, 1).alias("customer_state"),
        _pick(_SEGMENTS, cust, "customer_segment"),
        city(city_i, 2).alias("customer_country"),
        dept.cast("int").alias("department_id"),
        F.concat(F.lit("Dept "), dept.cast("string")).alias("department_name"),
        cat.cast("int").alias("category_id"),
        F.concat(F.lit("Category "), cat.cast("string")).alias("category_name"),
        prod.cast("int").alias("product_card_id"),
        F.concat(F.lit("Product "), prod.cast("string")).alias("product_name"),
        F.concat(F.lit("http://img/"), prod.cast("string")).alias("product_image"),
        d2(price).alias("order_item_product_price"),
        _pick(_MODES, item_id, "shipping_mode"),
        _pick(_DELIVERY, oid + item, "delivery_status"),
        _pick(_STATUSES, oid, "order_status"),
        order_date.alias("order_date_dateorders"),
        ship_date.alias("shipping_date_dateorders"),
        city(dest_i, 0).alias("order_city"),
        city(dest_i, 1).alias("order_state"),
        city(dest_i, 2).alias("order_country"),
        city(dest_i, 3).alias("order_region"),
        city(dest_i, 4).alias("market"),
        (F.lit(25.7) + F.pmod(oid, F.lit(40)).cast("double")).alias("latitude_src"),
        (F.lit(-80.1) - F.pmod(oid, F.lit(30)).cast("double")).alias("longitude_src"),
        (F.lit(27.9) + F.pmod(oid, F.lit(35)).cast("double")).alias("latitude_dest"),
        (F.lit(-82.3) - F.pmod(oid, F.lit(25)).cast("double")).alias("longitude_dest"),
        d2(price * qty).alias("sales"),
        qty.alias("order_item_quantity"),
        d2(price * qty * 0.12).alias("order_profit_per_order"),
        d2(F.pmod(item_id, F.lit(4)).cast("double") * 0.05).alias("order_item_discount_rate"),
        days_real.alias("days_for_shipping_real"),
        days_sched.alias("days_for_shipment_scheduled"),
        (days_real > days_sched).cast("int").alias("late_delivery_risk"),
    )
