"""Deterministic reference-shaped fixtures (FIXTURES.md §A1-§A3).

~200 rawdata rows with: multi-item orders, duplicated customers/products
across rows (dedup does real work), mixed-case + padded status strings
(upper/trim normalization), 1-digit M/d/H/m date strings plus NULLs, and
route coordinates that overlap the GeoJSON fixture for both hits and
misses.
"""

from __future__ import annotations

import decimal
import json

from pyspark.sql import DataFrame, SparkSession

from logistream_data_pipeline_aws_spark.catalog import RAWDATA_SCHEMA

_SEGMENTS = ["Consumer", "Corporate", "Home Office"]
_MODES = ["Standard Class", " first class ", "SECOND CLASS", "Same Day"]
_DELIV = ["Advance shipping", "late delivery", " Shipping on time "]
_OSTATUS = ["COMPLETE", "PENDING", "CLOSED", "PROCESSING"]
_CITIES = [
    ("Miami", "FL", "USA", "South", "USCA", 25.7, -80.1),
    ("miami", "FL", "USA", "South", "USCA", 25.7, -80.1),  # case-dup of Miami
    ("Berlin", "BE", "Germany", "Central", "Europe", 52.5, 13.4),
    ("Lagos", "LA", "Nigeria", "West", "Africa", 6.5, 3.3),
    ("Lima", "LI", "Peru", "Andes", "LATAM", -12.0, -77.0),
]
# (dest_lat, dest_long): first two match routes.geojson feature endpoints
_DESTS = [(27.9, -82.3), (40.25, 30.5), (48.8, 2.3), (35.6, 139.6)]

ROUTES_GEOJSON = {
    "type": "FeatureCollection",
    "features": [
        {  # origin Miami -> dest (27.9, -82.3): fact rows will HIT this
            "type": "Feature",
            "geometry": {
                "type": "LineString",
                "coordinates": [[-80.1, 25.7], [-81.0, 26.5], [-82.3, 27.9]],
            },
        },
        {  # origin Berlin -> dest (40.25, 30.5): HIT
            "type": "Feature",
            "geometry": {
                "type": "LineString",
                "coordinates": [[13.4, 52.5], [20.0, 45.0], [30.5, 40.25]],
            },
        },
        {  # orphan route: no fact row matches (MISS side of the join)
            "type": "Feature",
            "geometry": {
                "type": "LineString",
                "coordinates": [[0.0, 0.0], [1.0, 1.0]],
            },
        },
    ],
}


def _d(x: float) -> decimal.Decimal:
    return decimal.Decimal(str(x)).quantize(decimal.Decimal("0.01"))


def make_rawdata(spark: SparkSession, n_orders: int = 80) -> DataFrame:
    rows = []
    item_id = 0
    for o in range(1, n_orders + 1):
        n_items = 1 + (o % 3)  # 1..3 line items per order
        cust = 100 + (o % 20)  # 20 distinct customers
        city = _CITIES[o % len(_CITIES)]
        dest = _DESTS[o % len(_DESTS)]
        for i in range(n_items):
            item_id += 1
            prod = 1000 + ((o * 3 + i) % 15)  # 15 products
            cat = 10 + (prod % 5)  # 5 categories
            dept = 1 + (cat % 2)  # 2 departments
            price = 10.0 + (prod % 7) * 2.5
            qty = 1 + (item_id % 5)
            if o % 17 == 0:
                order_date = None  # null-date rows (GE:184 filter)
            elif o % 2 == 0:
                order_date = f"{1 + o % 12}/{1 + o % 27}/2018 {o % 24}:{o % 60}"
            else:
                order_date = f"12/31/2017 23:59"
            ship_date = None if o % 19 == 0 else f"{1 + o % 12}/{2 + o % 26}/2018 4:5"
            rows.append(
                (
                    o,  # order_id
                    item_id,  # order_item_id
                    cust,  # order_customer_id
                    cust,  # customer_id
                    f"First{cust}",
                    f"Last{cust}",
                    f"c{cust}@example.com",
                    city[0],
                    city[1],
                    _SEGMENTS[cust % 3],
                    city[2],
                    dept,
                    f"Dept {dept}",
                    cat,
                    f"Category {cat}",
                    prod,
                    f"Product {prod}",
                    f"http://img/{prod}.png",
                    _d(price),
                    _MODES[o % 4],
                    _DELIV[o % 3],
                    _OSTATUS[o % 4],
                    order_date,
                    ship_date,
                    city[0],
                    city[1],
                    city[2],
                    city[3],
                    city[4],
                    city[5],
                    city[6],
                    dest[0],
                    dest[1],
                    _d(price * qty),
                    qty,
                    _d(price * qty * 0.1 - 5),
                    _d(0.05 * (o % 4)),
                    o % 8,
                    (o + 3) % 8,
                    1 if o % 5 < 2 else 0,
                )
            )
    return spark.createDataFrame(rows, RAWDATA_SCHEMA)


def write_routes_geojson(tmp_path) -> str:
    p = tmp_path / "routes.geojson"
    p.write_text(json.dumps(ROUTES_GEOJSON))
    return str(p)
