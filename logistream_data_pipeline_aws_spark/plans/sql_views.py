"""The SQL surface (SURVEY §3.3): the reference's two external SQL
consumers (Athena ad-hoc validation, Redshift dashboard queries) collapse
to one path here — ``spark.sql`` over registered views.

``register_warehouse_views`` binds the base tables *and* the analytic
queries as named views, so a SQL user sees the same objects the Python
API builds; the ``sql_*`` query functions below run the canonical
dashboard queries through the SQL parser end-to-end (proving parser →
analyzer → optimizer parity with the DataFrame plans — Catalyst compiles
both to the same physical plan)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from logistream_data_pipeline_aws_spark.catalog import register_views

# Named analytic views over the base tables — the dashboard SQL a BI tool
# would issue against the reference's Redshift schema (RM:146-158),
# retargeted at the star-schema testdata.
ANALYTIC_VIEWS: dict[str, str] = {
    "v_profit_by_hierarchy": """
        SELECT p.p_brand, p.p_type,
               CAST(SUM(CAST(l.l_extendedprice * (1.0 - l.l_discount) AS DECIMAL(30,6))) AS DOUBLE) AS total_revenue,
               COUNT(*) AS n_items
        FROM lineitem l LEFT JOIN part p ON l.l_partkey = p.p_partkey
        GROUP BY p.p_brand, p.p_type
    """,
    "v_sales_trend": """
        SELECT CAST(year(o_orderdate) AS INT) AS order_year,
               CAST(month(o_orderdate) AS INT) AS order_month,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE) AS total_sales,
               COUNT(*) AS n_orders
        FROM orders GROUP BY 1, 2
    """,
    "v_returns_by_nation": """
        SELECT n.n_name AS nation_name, COUNT(*) AS n_returned_items,
               CAST(SUM(CAST(l.l_extendedprice * (1.0 - l.l_discount) AS DECIMAL(30,6))) AS DOUBLE) AS returned_revenue
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        WHERE l.l_returnflag = 'R'
        GROUP BY n.n_name
    """,
}


def register_warehouse_views(spark: SparkSession, sf_dir: str) -> None:
    register_views(spark, sf_dir)
    for name, sql in ANALYTIC_VIEWS.items():
        spark.sql(f"CREATE OR REPLACE TEMPORARY VIEW {name} AS {sql}")


def sql_profit_by_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 through the SQL front door — must hash-match the DataFrame
    version (`a5_profit_by_hierarchy`) and therefore shares its oracle."""
    register_warehouse_views(spark, sf_dir)
    return spark.sql("SELECT * FROM v_profit_by_hierarchy")


def sql_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-shape: 3-way join, filtered both sides, grouped revenue,
    ordered top-10 — the canonical 'shipping priority' dashboard query."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT l.l_orderkey,
               CAST(SUM(CAST(l.l_extendedprice * (1.0 - l.l_discount) AS DECIMAL(30,6))) AS DOUBLE) AS revenue,
               CAST(date_format(o.o_orderdate, 'yyyyMMdd') AS INT) AS order_date_key,
               o.o_orderpriority
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE c.c_mktsegment = 'BUILDING'
          AND o.o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
          AND l.l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
        GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
        ORDER BY revenue DESC, l.l_orderkey
        LIMIT 10
        """
    )


def sql_product_profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9-shape: 4-way join + date-part extraction + LIKE filter,
    grouped two ways — the 'profit attribution' dashboard query."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT n.n_name AS nation_name,
               CAST(year(o.o_orderdate) AS INT) AS order_year,
               CAST(SUM(CAST(l.l_extendedprice * (1.0 - l.l_discount) AS DECIMAL(30,6))) AS DOUBLE) AS profit
        FROM lineitem l
        JOIN part p ON l.l_partkey = p.p_partkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        WHERE p.p_name LIKE '%a%'
        GROUP BY n.n_name, year(o.o_orderdate)
        """
    )


def sql_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7-shape: revenue flow between two nation pairs per year —
    supplier nation vs customer nation with a symmetric pair predicate."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT supp_nation, cust_nation, l_year,
               CAST(SUM(CAST(volume AS DECIMAL(30,6))) AS DOUBLE) AS revenue
        FROM (
            SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                   CAST(year(l.l_shipdate) AS INT) AS l_year,
                   l.l_extendedprice * (1.0 - l.l_discount) AS volume
            FROM supplier s
            JOIN lineitem l ON s.s_suppkey = l.l_suppkey
            JOIN orders o ON o.o_orderkey = l.l_orderkey
            JOIN customer c ON c.c_custkey = o.o_custkey
            JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
            JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
            WHERE (n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
               OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3')
        ) shipping
        GROUP BY supp_nation, cust_nation, l_year
        """
    )


def sql_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8-shape: one nation's share of regional revenue per year —
    a conditional-aggregate ratio (exact because both operands are
    decimal sums and the division happens once per group)."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_year,
               CAST(ROUND(
                   CAST(SUM(CAST(CASE WHEN nation = 'NATION_5' THEN volume ELSE 0.0 END AS DECIMAL(30,6))) AS DOUBLE)
                   / CAST(SUM(CAST(volume AS DECIMAL(30,6))) AS DOUBLE), 6) AS DOUBLE) AS mkt_share
        FROM (
            SELECT CAST(year(o.o_orderdate) AS INT) AS o_year,
                   l.l_extendedprice * (1.0 - l.l_discount) AS volume,
                   n1.n_name AS nation
            FROM lineitem l
            JOIN supplier s ON s.s_suppkey = l.l_suppkey
            JOIN orders o ON o.o_orderkey = l.l_orderkey
            JOIN customer c ON c.c_custkey = o.o_custkey
            JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
            JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
            JOIN region r ON n2.n_regionkey = r.r_regionkey
            WHERE r.r_name = 'AMERICA'
        ) all_nations
        GROUP BY o_year
        """
    )


def sql_lapsed_big_spenders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated subqueries (EXISTS + NOT EXISTS): customers with at
    least one large order but none recently — Catalyst decorrelates both
    predicates into semi/anti hash joins, no per-row subquery execution."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c.c_custkey, c.c_name AS customer_name
        FROM customer c
        WHERE EXISTS (
            SELECT 1 FROM orders o
            WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000.0
        )
        AND NOT EXISTS (
            SELECT 1 FROM orders o
            WHERE o.o_custkey = c.c_custkey
              AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
        )
        """
    )


def sql_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-shape: 6-way snowflake join with a same-nation predicate
    between two dimension legs — the hardest join-ordering case in the
    surface; Catalyst broadcast-plans all dim legs."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT n.n_name AS nation_name,
               CAST(SUM(CAST(l.l_extendedprice * (1.0 - l.l_discount) AS DECIMAL(30,6))) AS DOUBLE) AS revenue
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        WHERE r.r_name = 'ASIA'
        GROUP BY n.n_name
        """
    )


def sql_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13-shape: LEFT OUTER join with a join-condition-only filter
    (non-urgent orders), then a double aggregation — per-customer order
    counts re-aggregated into a histogram.  The outer join keeps
    zero-order customers in the c_count=0 bucket; the filter must live in
    the JOIN condition (a WHERE would turn the join inner)."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c_count, COUNT(*) AS custdist
        FROM (
            SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
            FROM customer c
            LEFT JOIN orders o
              ON c.c_custkey = o.o_custkey
             AND o.o_orderpriority <> '1-URGENT'
            GROUP BY c.c_custkey
        )
        GROUP BY c_count
        """
    )


def sql_orders_above_customer_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated SCALAR subquery: orders more than 1.5x their own
    customer's average order value.  Catalyst decorrelates the per-row
    aggregate into a grouped aggregate + join — no per-row subquery
    execution.  The average is written as explicit decimal-sum / count
    (not AVG) so the threshold comparison is bit-identical across
    engines."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o.o_orderkey, o.o_custkey, o.o_totalprice
        FROM orders o
        WHERE o.o_totalprice > 1.5 * (
            SELECT CAST(SUM(CAST(o2.o_totalprice AS DECIMAL(30,6))) AS DOUBLE) / COUNT(*)
            FROM orders o2 WHERE o2.o_custkey = o.o_custkey
        )
        """
    )


def sql_large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18-shape: IN over an aggregated HAVING subquery (orders
    whose total line quantity clears a threshold) joined back to the
    detail — Catalyst turns the IN into a semi-join against the
    aggregate, then the detail join stays a broadcast lookup."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o.o_orderkey, o.o_custkey, o.o_totalprice,
               CAST(SUM(CAST(l.l_quantity AS DECIMAL(30,6))) AS DOUBLE) AS total_qty
        FROM orders o
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE o.o_orderkey IN (
            SELECT l_orderkey FROM lineitem
            GROUP BY l_orderkey HAVING SUM(l_quantity) > 300
        )
        GROUP BY o.o_orderkey, o.o_custkey, o.o_totalprice
        """
    )


def sql_unshipped_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4/Q21/Q22-flavor membership shape: NOT EXISTS over a
    correlated subquery — orders in a date band with NO lineitem shipped
    within 90 days of the order date.  Catalyst rewrites the correlated
    NOT EXISTS into a LEFT ANTI hash join on the equi key
    (l_orderkey = o_orderkey) with the date bound as the join condition,
    so the membership test is one shuffle-free probe per order, never a
    per-row subquery."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o.o_orderpriority, COUNT(*) AS n_orders
        FROM orders o
        WHERE o.o_orderdate >= DATE '1995-01-01'
          AND o.o_orderdate < DATE '1996-01-01'
          AND NOT EXISTS (
            SELECT 1 FROM lineitem l
            WHERE l.l_orderkey = o.o_orderkey
              AND l.l_shipdate < date_add(o.o_orderdate, 90)
          )
        GROUP BY o.o_orderpriority
        """
    )


def sql_prospect_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 flavor: positive-balance customers richer than the
    positive-balance average who have never placed an order.  Catalyst
    decorrelates the scalar subquery into a broadcast 1-row aggregate
    and rewrites NOT EXISTS into a LEFT ANTI hash join on o_custkey —
    at scale: one narrow orders key scan probed against the customer
    side, no correlated per-row execution.  The average follows the
    decimal-sum/count contract so the threshold is engine-exact."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c.c_nationkey, COUNT(*) AS numcust,
               CAST(SUM(CAST(c.c_acctbal AS DECIMAL(30,6))) AS DOUBLE) AS total_acctbal
        FROM customer c
        WHERE c.c_acctbal > (
            SELECT CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(30,6))) AS DOUBLE) / COUNT(*)
            FROM customer c2 WHERE c2.c_acctbal > 0.0
        )
        AND NOT EXISTS (
            SELECT 1 FROM orders o
            WHERE o.o_custkey = c.c_custkey
              AND o.o_orderdate >= DATE '2000-07-01'
        )
        GROUP BY c.c_nationkey
        """
    )


def sql_disjunctive_basket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19-shape: revenue under an OR of conjunctive brand/size/
    quantity baskets.  The disjunction shares the join key, so Catalyst
    still plans one broadcast hash join with the OR evaluated as the join
    filter, and the common `l_quantity`/`p_size` bounds are pushed into
    both scans as range predicates."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT CAST(SUM(CAST(l.l_extendedprice * (1.0 - l.l_discount) AS DECIMAL(30,6))) AS DOUBLE) AS revenue,
               COUNT(*) AS n_items
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15 AND l.l_quantity BETWEEN 1 AND 20)
           OR (p.p_brand = 'Brand#7' AND p.p_size BETWEEN 1 AND 25 AND l.l_quantity BETWEEN 5 AND 35)
           OR (p.p_brand = 'Brand#13' AND p.p_size BETWEEN 1 AND 35 AND l.l_quantity BETWEEN 10 AND 50)
        """
    )


def sql_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14-shape: conditional aggregation — the share of revenue
    from promotional parts, by ship month across one year.  One broadcast
    hash join (part is the small dim) feeding two decimal sums whose CASE
    split is evaluated inside whole-stage codegen; the year bound pushes
    into the lineitem scan as a range predicate."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT CAST(month(l.l_shipdate) AS INT) AS ship_month,
               CAST(SUM(CAST(CASE WHEN p.p_type LIKE 'PROMO%'
                        THEN l.l_extendedprice * (1.0 - l.l_discount)
                        ELSE 0.0 END AS DECIMAL(30,6))) AS DOUBLE) AS promo_revenue,
               CAST(SUM(CAST(l.l_extendedprice * (1.0 - l.l_discount) AS DECIMAL(30,6))) AS DOUBLE) AS total_revenue,
               COUNT(*) AS n_items
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        WHERE l.l_shipdate >= DATE '1996-01-01'
          AND l.l_shipdate < DATE '1997-01-01'
        GROUP BY 1
        """
    )


def sql_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15-shape: per-supplier revenue over a quarter, keeping the
    supplier(s) whose revenue equals the maximum — the classic
    aggregate-then-compare-to-scalar-max membership.  Catalyst plans the
    scalar subquery as a broadcast 1-row aggregate over the SAME grouped
    frame (self-referenced view), so the detail scan runs once per side;
    the revenue comparison is exact because both sides go through the
    decimal-sum contract."""
    register_views(spark, sf_dir)
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY VIEW v_supplier_revenue AS
        SELECT l_suppkey AS supplier_no,
               CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(30,6))) AS DOUBLE) AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1996-04-01'
        GROUP BY l_suppkey
        """
    )
    return spark.sql(
        """
        SELECT s.s_suppkey, s.s_name, r.total_revenue
        FROM supplier s
        JOIN v_supplier_revenue r ON s.s_suppkey = r.supplier_no
        WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM v_supplier_revenue)
        """
    )


def sql_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6-shape: the pure scan-filter-aggregate probe — revenue
    delta from a discount band in one year.  No join at all; every
    predicate (date range, discount band, quantity cap) must reach the
    parquet scan as a pushed filter, which makes this the canonical
    pushdown regression query for the plan audit."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(30,6))) AS DOUBLE) AS revenue_delta,
               COUNT(*) AS n_items
        FROM lineitem
        WHERE l_shipdate >= DATE '1997-01-01' AND l_shipdate < DATE '1998-01-01'
          AND l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 24.0
        """
    )


def sql_cheapest_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape adapted to this schema (no partsupp table): per
    part, keep the supplier(s) whose realized unit cost equals the
    part's minimum — the correlated-scalar-MIN membership Catalyst
    decorrelates into an aggregate + join on the grouping key.  Unit
    cost goes through the decimal-sum contract on both numerator and
    denominator so the MIN comparison is engine-exact; the quotient is
    emitted UNROUNDED — round(x, 6) hits round-half ties differently per
    engine (Spark decimal HALF_UP vs DuckDB binary-double), while the raw
    quotient is bit-identical."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        WITH cost AS (
          SELECT l_partkey AS part_key, l_suppkey AS supp_key,
                 CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,6))) AS DOUBLE) /
                 CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE) AS unit_cost
          FROM lineitem GROUP BY 1, 2)
        SELECT c.part_key, c.supp_key, c.unit_cost
        FROM cost c
        WHERE c.unit_cost = (SELECT MIN(c2.unit_cost) FROM cost c2
                             WHERE c2.part_key = c.part_key)
        """
    )


def sql_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: per supplier nation, the parts whose shipped
    value exceeds a fixed fraction of the nation's total — the
    group-then-compare-to-a-scalar-per-group pattern.  The national
    total is a separate decimal-sum aggregate joined back (never a
    windowed double sum, which accumulates in partition order and
    diverges across engines); the cut is 3x the nation's average
    per-part value, so the query stays non-degenerate at every scale
    factor instead of emptying as part cardinality grows."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        WITH v AS (
          SELECT s.s_nationkey AS nation_key, l.l_partkey AS part_key,
                 CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(30,6))) AS DOUBLE) AS part_value
          FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
          GROUP BY 1, 2),
        tot AS (
          SELECT nation_key, COUNT(*) AS n_parts
          FROM v GROUP BY 1),
        ntot AS (
          SELECT s.s_nationkey AS nation_key,
                 CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(30,6))) AS DOUBLE) AS nation_total
          FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
          GROUP BY 1)
        SELECT v.nation_key, v.part_key, v.part_value
        FROM v JOIN tot ON v.nation_key = tot.nation_key
        JOIN ntot ON v.nation_key = ntot.nation_key
        WHERE v.part_value > 3.0 * (ntot.nation_total / tot.n_parts)
        """
    )


def sql_supplier_part_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct-supplier count per (brand, size) with a
    NOT IN exclusion subquery — the null-aware anti join Spark plans for
    NOT IN, plus a count-distinct aggregate over the surviving join."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT p.p_brand, p.p_size, COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        WHERE p.p_brand <> 'Brand#1'
          AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0)
        GROUP BY 1, 2
        """
    )


def sql_excess_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: nested IN membership — suppliers who shipped a
    large quantity of matching parts in one year.  Two levels of
    semi-join (supplier IN shippers, part IN name-matched parts); the
    HAVING threshold goes through the decimal-sum contract so the
    boundary is engine-exact."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT s.s_suppkey, s.s_name FROM supplier s
        WHERE s.s_suppkey IN (
            SELECT l.l_suppkey FROM lineitem l
            WHERE l.l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE '%a%')
              AND l.l_shipdate >= DATE '1997-01-01' AND l.l_shipdate < DATE '1998-01-01'
            GROUP BY l.l_suppkey
            HAVING CAST(SUM(CAST(l.l_quantity AS DECIMAL(30,6))) AS DOUBLE) > 100.0)
          AND s.s_acctbal > 0.0
        """
    )


def sql_returned_item_losses(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: revenue lost to returned items per customer over
    a quarter — 3-way join with the return flag pushed into the lineitem
    scan and the date band into orders; grouped decimal-sum revenue."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c.c_custkey, c.c_name,
               CAST(SUM(CAST(l.l_extendedprice * (1.0 - l.l_discount) AS DECIMAL(30,6))) AS DOUBLE) AS revenue,
               c.c_acctbal, n.n_name AS nation_name
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        WHERE o.o_orderdate >= DATE '1995-10-01'
          AND o.o_orderdate < DATE '1996-01-01'
          AND l.l_returnflag = 'R'
        GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
        """
    )


def sql_priority_shipping_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: per-group conditional counts — high- vs
    low-priority line counts for late-shipped lineitems in one year,
    split by return flag (standing in for ship mode, absent from this
    schema).  The CASE split runs inside whole-stage codegen; both count
    branches combine map-side."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT l.l_returnflag,
               SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END) AS high_line_count,
               SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END) AS low_line_count
        FROM orders o
        JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        WHERE l.l_shipdate >= DATE '1996-01-01'
          AND l.l_shipdate < DATE '1997-01-01'
          AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
        GROUP BY l.l_returnflag
        """
    )


def sql_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: the double-correlated EXISTS / NOT EXISTS — for
    finalized ('F') multi-supplier orders, suppliers who were the ONLY
    one to ship late (> 60 days after the order date; this schema has no
    commit/receipt dates, so the late predicate adapts Q21's
    receipt-after-commit test to the ship-after-order margin).

    Physical shape: Catalyst decorrelates both subqueries into one LEFT
    SEMI and one LEFT ANTI hash join against lineitem on l_orderkey,
    with the supplier-inequality and the late bound as join residuals —
    three passes over the narrow (orderkey, suppkey, shipdate) lineitem
    projection, never a per-row subquery.  At 100 TB all three probes
    shuffle on the same uniform l_orderkey, and supplier/nation stay
    broadcast lookups."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT n.n_name AS nation, s.s_name AS s_name, COUNT(*) AS numwait
        FROM supplier s
        JOIN lineitem l1 ON l1.l_suppkey = s.s_suppkey
        JOIN orders o ON o.o_orderkey = l1.l_orderkey
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        WHERE o.o_orderstatus = 'F'
          AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
          AND EXISTS (
            SELECT 1 FROM lineitem l2
            WHERE l2.l_orderkey = l1.l_orderkey
              AND l2.l_suppkey <> l1.l_suppkey
          )
          AND NOT EXISTS (
            SELECT 1 FROM lineitem l3
            WHERE l3.l_orderkey = l1.l_orderkey
              AND l3.l_suppkey <> l1.l_suppkey
              AND l3.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
          )
        GROUP BY n.n_name, s.s_name
        """
    )


def sql_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue that would be lost by refusing
    small-quantity orders of a brand's small parts — the correlated
    scalar AVG subquery (l_quantity < 0.2 * per-part average), which
    Catalyst decorrelates into a per-part aggregate joined back to the
    probe.  The per-part average divides a decimal-exact sum by its
    count once, so the 0.2x threshold compares identical doubles on
    both engines; the closing /7.0 is the classic annualization."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        WITH pa AS (
          SELECT l_partkey,
                 0.2 * (CAST(SUM(CAST(l_quantity AS DECIMAL(30,2))) AS DOUBLE)
                        / COUNT(l_quantity)) AS qty_cut
          FROM lineitem GROUP BY l_partkey
        )
        SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,2))) AS DOUBLE) / 7.0 AS avg_yearly,
               COUNT(*) AS n_small
        FROM lineitem
        JOIN part ON p_partkey = l_partkey
        JOIN pa ON pa.l_partkey = lineitem.l_partkey
        WHERE p_brand = 'Brand#4' AND p_size <= 10 AND l_quantity < qty_cut
        """
    )
