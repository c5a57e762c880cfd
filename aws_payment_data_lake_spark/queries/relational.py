"""Relational query surface: scan/filter/project/join/agg/window/sort/set-ops.

The engine's stand-in for the reference's declared-but-absent Athena SQL
layer (S9, README.md:33,67,88-89) and gold-layer aggregates (A3,
README.md:130), exercised over the driver's TPC-H-ish tables. The
reference itself contains no joins (§2.4), so this module is where the
engine earns the full relational surface a lake needs.

Scale conventions used throughout:
  * dimension sides of joins (region/nation/supplier/part/customer at
    fixed cardinality) are ``broadcast()`` — fact tables never shuffle
    for a dim join at 100 TB;
  * per-group top-k uses a rank window AFTER aggregation or on the
    already-reduced side, never a global sort;
  * money sums are summed as DECIMAL(18,d) (inputs are exact at <=6
    decimal places, so decimal aggregation is exact and reproducible
    regardless of partition/summation order; double sums differ in final
    ulps between engines — SURVEY.md §7.5), then the RESULT is cast to
    DOUBLE once, on both engine and oracle sides. Rationale: the driver's
    hash is type-sensitive through the pandas path (DuckDB DECIMAL/HUGEINT
    surface as float64 while Spark keeps Decimal/int64 — see
    scripts/driver_sim.py), so final outputs carry only int64/float64/
    bool/string/datetime. The single decimal->double cast is correctly
    rounded in BOTH engines while unscaled < 2^53, i.e. value*10^scale
    < 9e15 — keep output scale <= 4 and magnitudes < 1e11;
  * averages are emitted as exact-decimal-sum cast to DOUBLE divided by
    the BIGINT count: every arithmetic step is bit-identical across
    engines, so no rounding is needed (rounding a near-tie double is
    itself a cross-engine hazard);
  * NO collection-typed columns (array/map/struct) in registered outputs:
    the driver canonicalizes results with pandas ``sort_values``, which
    factorizes every column and raises ``TypeError: unhashable type:
    'list'`` on list cells (CORRECTNESS_r02: dedup_exact_groups).
    ``array_join(sort_array(...), ',')`` on the Spark side and
    ``array_to_string(list_sort(...), ',')`` in DuckDB. oracle.py and
    scripts/driver_sim.py REJECT collection columns so the local gate is
    strictly at least as strict as the driver.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from aws_payment_data_lake_spark.queries import register
from aws_payment_data_lake_spark.sources import load
from aws_payment_data_lake_spark.streaming.joins import (
    view_purchase_attribution_batch,
)


def _dec_sum(col: F.Column, scale: int, alias: str) -> F.Column:
    """Exact money sum pinned for cross-engine hashing: cast each term to
    DECIMAL(18,scale), sum exactly (associative — partition order can't
    perturb it), then cast the result to DOUBLE once. Oracle twin:
    ``CAST(sum(CAST(x AS DECIMAL(18,s))) AS DOUBLE)``."""
    return F.sum(col.cast(f"decimal(18,{scale})")).cast("double").alias(alias)


def _dec_avg(col: F.Column, scale: int, alias: str) -> F.Column:
    """Exact average: decimal-exact sum cast to DOUBLE, divided by the
    row count — both operands bit-identical across engines, and IEEE
    division is correctly rounded, so the quotient needs no rounding.
    Oracle twin: ``CAST(sum(CAST(x AS DECIMAL(18,s))) AS DOUBLE)/count(*)``."""
    return (F.sum(col.cast(f"decimal(18,{scale})")).cast("double")
            / F.count(F.lit(1))).alias(alias)


# ===========================================================================
# Aggregation
# ===========================================================================

@register(
    "q1_pricing_summary",
    oracle="""
    SELECT
      l_returnflag,
      l_linestatus,
      CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                                                  AS sum_base_price,
      CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
           AS DOUBLE)                             AS sum_disc_price,
      CAST(sum(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax)
                    AS DECIMAL(18,6))) * 1000000 AS BIGINT)
                                                  AS sum_charge_micros,
      CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*)
                                                  AS avg_qty,
      CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*)
                                                  AS avg_price,
      CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / count(*)
                                                  AS avg_disc,
      count(*)                                    AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    tags=("aggregate", "flagship"),
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q1-style pricing summary: scan -> pushed filter -> partial+final
    hash agg (one shuffle on a 6-group key) -> sort."""
    (li,) = load(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dec_sum(F.col("l_quantity"), 2, "sum_qty"),
            _dec_sum(F.col("l_extendedprice"), 2, "sum_base_price"),
            _dec_sum(disc_price, 4, "sum_disc_price"),
            # charge has 6 exact decimals. A decimal(_,6)->DOUBLE cast
            # diverges by 1 ulp between engines once the unscaled sum
            # crosses 2^53 — OBSERVED at the sf1.0 parity probe
            # (27864155010.94159 vs ...93; fine at the driver SFs), and
            # lowering the TERM scale would put 4dp rounding ties at
            # the mercy of each engine's double->decimal path. So emit
            # the production convention instead: money as INTEGER
            # micro-units — exact decimal sum * 1e6 to BIGINT, bit-
            # identical in both engines until per-group sums reach 9e12.
            (F.sum(charge.cast("decimal(18,6)")) * 1_000_000)
             .cast("long").alias("sum_charge_micros"),
            _dec_avg(F.col("l_quantity"), 2, "avg_qty"),
            _dec_avg(F.col("l_extendedprice"), 2, "avg_price"),
            _dec_avg(F.col("l_discount"), 2, "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "distinct_stats_orders",
    oracle="""
    SELECT o_orderpriority,
           count(DISTINCT o_custkey)            AS n_customers,
           count(*)                             AS n_orders,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                                                AS total_price,
           min(o_totalprice)                    AS min_price,
           max(o_totalprice)                    AS max_price,
           round(stddev_samp(o_totalprice), 4)  AS sd_price
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    tags=("aggregate", "distinct"),
)
def distinct_stats_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-count + order stats per priority (distinct agg = the
    expand+two-phase plan Catalyst generates; no driver-side loop)."""
    (orders,) = load(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            F.countDistinct("o_custkey").alias("n_customers"),
            F.count(F.lit(1)).alias("n_orders"),
            _dec_sum(F.col("o_totalprice"), 2, "total_price"),
            # min/max select an existing double bit-for-bit — no rounding
            F.min("o_totalprice").alias("min_price"),
            F.max("o_totalprice").alias("max_price"),
            F.round(F.stddev_samp("o_totalprice"), 4).alias("sd_price"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "rollup_orders_year_status",
    oracle="""
    SELECT year(o_orderdate) AS order_year, o_orderstatus,
           count(*) AS n_orders,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS total_price
    FROM orders
    GROUP BY ROLLUP (year(o_orderdate), o_orderstatus)
    ORDER BY order_year NULLS FIRST, o_orderstatus NULLS FIRST
    """,
    tags=("aggregate", "rollup"),
)
def rollup_orders_year_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals (year, status) -> (year) -> grand total."""
    (orders,) = load(spark, sf_dir, "orders")
    return (
        orders.withColumn("order_year", F.year("o_orderdate"))
        .rollup("order_year", "o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n_orders"),
             _dec_sum(F.col("o_totalprice"), 2, "total_price"))
        .orderBy(F.col("order_year").asc_nulls_first(),
                 F.col("o_orderstatus").asc_nulls_first())
    )


@register(
    "cube_events_type_date",
    oracle="""
    SELECT event_type, CAST(ts AS DATE) AS event_date,
           count(*) AS n_events,
           round(sum(value), 4) AS sum_value
    FROM events
    GROUP BY CUBE (event_type, CAST(ts AS DATE))
    ORDER BY event_type NULLS FIRST, event_date NULLS FIRST
    """,
    tags=("aggregate", "cube"),
)
def cube_events_type_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (type, date): all 4 grouping sets in one pass (Expand)."""
    (ev,) = load(spark, sf_dir, "events")
    return (
        ev.withColumn("event_date", F.to_date("ts"))
        .cube("event_type", "event_date")
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.round(F.sum("value"), 4).alias("sum_value"))
        .orderBy(F.col("event_type").asc_nulls_first(),
                 F.col("event_date").asc_nulls_first())
    )


@register(
    "grouping_sets_revenue",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
                AS DOUBLE) AS revenue,
           count(*) AS n_items
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
    ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
    tags=("aggregate", "grouping-sets", "sql-surface"),
)
def grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS via the spark.sql surface (S9)."""
    (li,) = load(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("lineitem_gs")
    return spark.sql("""
        SELECT l_returnflag, l_linestatus,
               CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                             AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
               count(*) AS n_items
        FROM lineitem_gs
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """)


# ===========================================================================
# Joins
# ===========================================================================

@register(
    "q3_shipping_priority",
    oracle="""
    SELECT l.l_orderkey,
           CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                         AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
           o.o_orderdate, o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    tags=("join", "aggregate", "topk"),
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q3-style: selective dim filter -> join into orders -> join
    fact -> agg -> top-10 (TakeOrderedAndProject, no global sort
    materialization). customer is O(SF) so it carries NO broadcast hint:
    size statistics / AQE broadcast it while it fits and shuffle it when
    it doesn't."""
    cust, orders, li = load(spark, sf_dir, "customer", "orders", "lineitem")
    cutoff = F.lit("1998-03-15 00:00:00").cast("timestamp")
    return (
        li.where(F.col("l_shipdate") > cutoff)
        .join(orders.where(F.col("o_orderdate") < cutoff),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust.where(F.col("c_mktsegment") == "BUILDING"),
              F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(_dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")),
                      4, "revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


@register(
    "q5_local_supplier_volume",
    oracle="""
    SELECT n.n_name,
           CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                         AS DECIMAL(18,4))) AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'EUROPE'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n.n_name
    ORDER BY revenue DESC, n_name
    """,
    tags=("join", "aggregate", "broadcast"),
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q5-style 6-table join. Fixed-cardinality dimensions
    (nation, region) carry explicit broadcast hints; the O(SF) sides
    (customer, supplier) are left to size statistics / AQE — they
    broadcast while small and degrade to shuffle joins at scale instead
    of OOMing the driver."""
    cust, orders, li, sup, nat, reg = load(
        spark, sf_dir, "customer", "orders", "lineitem",
        "supplier", "nation", "region")
    lo = F.lit("1996-01-01 00:00:00").cast("timestamp")
    hi = F.lit("1998-01-01 00:00:00").cast("timestamp")
    dim = (sup.join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
           .join(F.broadcast(reg.where(F.col("r_name") == "EUROPE")),
                 F.col("n_regionkey") == F.col("r_regionkey")))
    return (
        li.join(orders.where((F.col("o_orderdate") >= lo)
                             & (F.col("o_orderdate") < hi)),
                F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(dim, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("n_name")
        .agg(_dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")),
                      4, "revenue"))
        .orderBy(F.col("revenue").desc(), F.col("n_name"))
    )


@register(
    "join_left_outer_order_lines",
    oracle="""
    SELECT o.o_orderkey, o.o_orderstatus,
           count(l.l_orderkey) AS n_lines,
           coalesce(CAST(sum(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE),
                    CAST(0 AS DOUBLE)) AS total_qty
    FROM orders o
    LEFT JOIN lineitem l
      ON o.o_orderkey = l.l_orderkey AND l.l_quantity > 45
    GROUP BY o.o_orderkey, o.o_orderstatus
    ORDER BY o.o_orderkey
    """,
    tags=("join", "outer"),
)
def join_left_outer_order_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER join with a join-side predicate (kept in the ON clause —
    moving it to WHERE would silently turn the join inner)."""
    orders, li = load(spark, sf_dir, "orders", "lineitem")
    return (
        orders.join(
            li.where(F.col("l_quantity") > 45),
            orders.o_orderkey == li.l_orderkey, "left")
        .groupBy("o_orderkey", "o_orderstatus")
        .agg(F.count("l_orderkey").alias("n_lines"),
             F.coalesce(F.sum(F.col("l_quantity").cast("decimal(18,2)"))
                        .cast("double"),
                        F.lit(0.0)).alias("total_qty"))
        .orderBy("o_orderkey")
    )


@register(
    "join_outer_recon",
    oracle="""
    WITH big_orders AS (
      SELECT o_orderkey, o_totalprice
      FROM orders WHERE o_totalprice > 250000.0),
    heavy AS (
      SELECT l_orderkey, count(*) AS n_heavy,
             CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
               AS heavy_qty
      FROM lineitem WHERE l_quantity > 45 GROUP BY l_orderkey)
    SELECT coalesce(o.o_orderkey, h.l_orderkey) AS orderkey,
           (o.o_orderkey IS NOT NULL) AS is_big_order,
           (h.l_orderkey IS NOT NULL) AS has_heavy_lines,
           o.o_totalprice,
           coalesce(h.n_heavy, 0) AS n_heavy,
           coalesce(h.heavy_qty, 0.0) AS heavy_qty
    FROM big_orders o
    FULL OUTER JOIN heavy h ON o.o_orderkey = h.l_orderkey
    ORDER BY orderkey
    """,
    tags=("join", "outer", "right", "full"),
)
def join_outer_recon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sided reconciliation (the Athena-layer read the reference's
    declared SQL surface implies): big orders vs orders having heavy
    lineitems, rows preserved from BOTH sides. Implemented as the
    right-outer + left-anti decomposition of FULL OUTER —
    ``heavy RIGHT JOIN big`` keeps every big order, the anti branch adds
    heavy-only orders — so both ``how="right"`` and full-outer semantics
    are exercised and hash-checked against a single FULL OUTER oracle
    (tests/test_plan_quality.py asserts the decomposition equals native
    ``how="full"``)."""
    orders, li = load(spark, sf_dir, "orders", "lineitem")
    big = (orders.where(F.col("o_totalprice") > 250_000.0)
           .select("o_orderkey", "o_totalprice"))
    heavy = (li.where(F.col("l_quantity") > 45)
             .groupBy("l_orderkey")
             .agg(F.count(F.lit(1)).alias("n_heavy"),
                  _dec_sum(F.col("l_quantity"), 2, "heavy_qty")))
    matched = heavy.join(big, heavy.l_orderkey == big.o_orderkey, "right")
    heavy_only = (heavy.join(big, heavy.l_orderkey == big.o_orderkey,
                             "left_anti")
                  .withColumn("o_orderkey", F.lit(None).cast("long"))
                  .withColumn("o_totalprice", F.lit(None).cast("double")))
    return (
        matched.unionByName(heavy_only)
        .select(
            F.coalesce("o_orderkey", "l_orderkey").alias("orderkey"),
            F.col("o_orderkey").isNotNull().alias("is_big_order"),
            F.col("l_orderkey").isNotNull().alias("has_heavy_lines"),
            "o_totalprice",
            F.coalesce("n_heavy", F.lit(0)).alias("n_heavy"),
            F.coalesce("heavy_qty", F.lit(0.0)).alias("heavy_qty"),
        )
        .orderBy("orderkey")
    )


@register(
    "join_semi_anti_customers",
    oracle="""
    SELECT 'with_urgent' AS kind, c_custkey, c_name
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT')
    UNION ALL
    SELECT 'no_urgent' AS kind, c_custkey, c_name
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
    ORDER BY kind, c_custkey
    """,
    tags=("join", "semi", "anti", "subquery"),
)
def join_semi_anti_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI (EXISTS) + LEFT ANTI (NOT EXISTS) over the same build
    side, tagged and unioned: semi probes never duplicate, the build side
    is reduced before the join, and the two branches partition the
    customer table exactly."""
    cust, orders = load(spark, sf_dir, "customer", "orders")
    urgent = orders.where(F.col("o_orderpriority") == "1-URGENT")
    semi = (cust.join(urgent, cust.c_custkey == urgent.o_custkey, "left_semi")
            .select(F.lit("with_urgent").alias("kind"), "c_custkey", "c_name"))
    anti = (cust.join(urgent, cust.c_custkey == urgent.o_custkey, "left_anti")
            .select(F.lit("no_urgent").alias("kind"), "c_custkey", "c_name"))
    return semi.unionByName(anti).orderBy("kind", "c_custkey")


@register(
    "range_join_price_bands",
    oracle="""
    SELECT b.band_name, count(*) AS n_orders,
           CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS total_price
    FROM orders o
    JOIN (VALUES ('small', 0.0, 50000.0),
                 ('medium', 50000.0, 150000.0),
                 ('large', 150000.0, 1000000000.0))
         AS b(band_name, lo, hi)
      ON o.o_totalprice >= b.lo AND o.o_totalprice < b.hi
    GROUP BY b.band_name
    ORDER BY b.band_name
    """,
    tags=("join", "range", "non-equi"),
)
def range_join_price_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi (range) join against a tiny banding dimension. Broadcast
    turns it into a BroadcastNestedLoopJoin — each fact row tests 3 bands
    locally; no shuffle at any scale."""
    (orders,) = load(spark, sf_dir, "orders")
    from aws_payment_data_lake_spark.localframe import local_frame
    bands = local_frame(
        orders.sparkSession,
        [("small", 0.0, 50_000.0),
         ("medium", 50_000.0, 150_000.0),
         ("large", 150_000.0, 1_000_000_000.0)],
        "band_name string, lo double, hi double")
    return (
        orders.join(F.broadcast(bands),
                    (F.col("o_totalprice") >= F.col("lo"))
                    & (F.col("o_totalprice") < F.col("hi")))
        .groupBy("band_name")
        .agg(F.count(F.lit(1)).alias("n_orders"),
             _dec_sum(F.col("o_totalprice"), 2, "total_price"))
        .orderBy("band_name")
    )


# ===========================================================================
# Subqueries
# ===========================================================================

@register(
    "subquery_gallery",
    oracle="""
    SELECT 'above_avg_balance' AS kind, c_custkey AS entity_key,
           c_acctbal AS metric
    FROM customer
    WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer)
    UNION ALL
    SELECT 'above_customer_avg' AS kind, o.o_orderkey AS entity_key,
           o.o_totalprice AS metric
    FROM orders o
    JOIN (SELECT o_custkey, avg(o_totalprice) AS cust_avg
          FROM orders GROUP BY o_custkey) a
      ON o.o_custkey = a.o_custkey
    WHERE o.o_totalprice > 1.5 * a.cust_avg
    ORDER BY kind, entity_key
    """,
    tags=("subquery", "scalar", "correlated"),
)
def subquery_gallery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar (uncorrelated) + correlated subqueries, tagged and unioned.
    The scalar branch broadcasts its single-row aggregate as a literal
    into the filter; the correlated branch (orders >1.5x their customer's
    average) is decorrelated into an aggregate + self-join — the same
    rewrite Catalyst's RewriteCorrelatedScalarSubquery performs. Both
    filter comparisons run on raw doubles (bit-identical inputs, avg is
    only a threshold — never emitted), and metrics pass source doubles
    through untouched."""
    cust, orders = load(spark, sf_dir, "customer", "orders")
    cust.createOrReplaceTempView("customer_ssq")
    scalar = spark.sql("""
        SELECT 'above_avg_balance' AS kind, c_custkey AS entity_key,
               c_acctbal AS metric
        FROM customer_ssq
        WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer_ssq)
    """)
    avgs = orders.groupBy("o_custkey").agg(F.avg("o_totalprice").alias("cust_avg"))
    correlated = (
        orders.join(avgs, "o_custkey")
        .where(F.col("o_totalprice") > 1.5 * F.col("cust_avg"))
        .select(F.lit("above_customer_avg").alias("kind"),
                F.col("o_orderkey").alias("entity_key"),
                F.col("o_totalprice").alias("metric"))
    )
    return scalar.unionByName(correlated).orderBy("kind", "entity_key")


# ===========================================================================
# Window functions
# ===========================================================================

@register(
    "topk_orders_per_customer",
    oracle="""
    SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS totalprice, rk
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rk
      FROM orders
    ) WHERE rk <= 3
    ORDER BY o_custkey, rk
    """,
    tags=("window", "topk"),
)
def topk_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-k via rank window; deterministic tiebreak on the key.
    (At extreme group sizes, pre-aggregate with max_by before ranking.)"""
    (orders,) = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        orders.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 3)
        .select("o_custkey", "o_orderkey",
                F.round("o_totalprice", 2).alias("totalprice"), "rk")
        .orderBy("o_custkey", "rk")
    )


@register(
    "window_event_analytics",
    oracle="""
    SELECT event_id, user_id, ts,
           round(value, 4) AS value,
           round(lag(value) OVER w, 4) AS prev_value,
           round(lead(value) OVER w, 4) AS next_value,
           round(sum(value) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND CURRENT ROW), 4) AS running_sum,
           round(avg(value) OVER (w ROWS BETWEEN 2 PRECEDING
                                  AND CURRENT ROW), 4) AS moving_avg3,
           CAST(date_diff('second', lag(ts) OVER w, ts) AS BIGINT) AS gap_s
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ORDER BY user_id, ts, event_id
    """,
    tags=("window", "analytic", "lag", "events"),
)
def window_event_analytics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user analytic windows over the event stream: lag/lead, running
    sum, moving average (frame specs the reference never used — SURVEY.md
    §2.6), plus the inter-event gap in integer seconds (exact arithmetic;
    NULL on each user's first event). Window order is total (ts then
    event_id) so ties can't flip any of the offsets; prefix sums run in
    the same sequential order in both engines, so rounding them is
    tie-stable."""
    (ev,) = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.select(
            "event_id", "user_id", "ts",
            F.round("value", 4).alias("value"),
            F.round(F.lag("value").over(w), 4).alias("prev_value"),
            F.round(F.lead("value").over(w), 4).alias("next_value"),
            F.round(F.sum("value").over(
                w.rowsBetween(Window.unboundedPreceding, 0)), 4)
             .alias("running_sum"),
            F.round(F.avg("value").over(w.rowsBetween(-2, 0)), 4)
             .alias("moving_avg3"),
            (F.unix_timestamp("ts")
             - F.unix_timestamp(F.lag("ts").over(w))).alias("gap_s"),
        )
        .orderBy("user_id", "ts", "event_id")
    )


@register(
    "global_topk_lineitems",
    oracle="""
    SELECT l_orderkey, l_linenumber, round(l_extendedprice, 2) AS price
    FROM lineitem
    ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
    LIMIT 20
    """,
    tags=("sort", "limit", "topk"),
)
def global_topk_lineitems(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-20: orderBy+limit compiles to TakeOrderedAndProject —
    per-partition heaps + driver merge of 20 rows, never a full sort."""
    (li,) = load(spark, sf_dir, "lineitem")
    return (
        li.orderBy(F.col("l_extendedprice").desc(), "l_orderkey", "l_linenumber")
        .select("l_orderkey", "l_linenumber",
                F.round("l_extendedprice", 2).alias("price"))
        .limit(20)
    )


# ===========================================================================
# Set operations
# ===========================================================================

_BUYERS_95 = """SELECT DISTINCT o_custkey FROM orders
                WHERE year(o_orderdate) = 1995"""
_BUYERS_96 = """SELECT DISTINCT o_custkey FROM orders
                WHERE year(o_orderdate) = 1996"""


def _buyers(orders: DataFrame, yr: int) -> DataFrame:
    return (orders.where(F.year("o_orderdate") == yr)
            .select("o_custkey").distinct())


@register(
    "set_ops_buyers",
    oracle=f"""
    SELECT 'union' AS set_op, o_custkey
    FROM (({_BUYERS_95}) UNION ({_BUYERS_96}))
    UNION ALL
    SELECT 'intersect' AS set_op, o_custkey
    FROM (({_BUYERS_95}) INTERSECT ({_BUYERS_96}))
    UNION ALL
    SELECT 'except' AS set_op, o_custkey
    FROM (({_BUYERS_95}) EXCEPT ({_BUYERS_96}))
    ORDER BY set_op, o_custkey
    """,
    tags=("setop", "union", "intersect", "except"),
)
def set_ops_buyers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All three set operations over 1995/1996 buyer keys, tagged and
    unioned: UNION DISTINCT (everyone active either year), INTERSECT
    (active both years), EXCEPT (1995 buyers who vanished in 1996)."""
    (orders,) = load(spark, sf_dir, "orders")
    b95, b96 = _buyers(orders, 1995), _buyers(orders, 1996)

    def tag(df: DataFrame, op: str) -> DataFrame:
        return df.select(F.lit(op).alias("set_op"), "o_custkey")

    return (
        tag(b95.union(b96).distinct(), "union")
        .unionByName(tag(b95.intersect(b96), "intersect"))
        .unionByName(tag(b95.exceptAll(b96).distinct(), "except"))
        .orderBy("set_op", "o_custkey")
    )


# ===========================================================================
# As-of join (time-series; Spark has no native ASOF — composed from
# union + window, the scale-correct pattern: one shuffle on user_id,
# sequential scan per user, no per-row probe)
# ===========================================================================

@register(
    "asof_join_purchase_view",
    oracle="""
    WITH tagged AS (
      SELECT user_id, ts, event_id,
             CASE WHEN event_type = 'view' THEN 0 ELSE 1 END AS tag,
             CASE WHEN event_type = 'view' THEN event_id END AS v_id,
             CASE WHEN event_type = 'view' THEN ts END AS v_ts
      FROM events WHERE event_type IN ('view', 'purchase')
    ), w AS (
      SELECT *,
        last_value(v_id IGNORE NULLS) OVER
          (PARTITION BY user_id ORDER BY ts, tag, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prior_view_id,
        last_value(v_ts IGNORE NULLS) OVER
          (PARTITION BY user_id ORDER BY ts, tag, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prior_view_ts
      FROM tagged
    )
    SELECT 'asof' AS variant, event_id AS purchase_id, user_id,
           ts AS purchase_ts, prior_view_id AS view_id,
           prior_view_ts AS view_ts
    FROM w WHERE tag = 1
    UNION ALL
    SELECT 'window_attr' AS variant, p.event_id AS purchase_id, p.user_id,
           p.ts AS purchase_ts, v.event_id AS view_id, v.ts AS view_ts
    FROM events p JOIN events v
      ON p.event_type = 'purchase' AND v.event_type = 'view'
     AND v.user_id = p.user_id
     AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL 1 HOUR
    ORDER BY variant, purchase_id, view_id
    """,
    tags=("join", "asof", "timeseries", "stream-stream-twin"),
)
def asof_join_purchase_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Purchase-to-view correlation, both temporal-join shapes in one
    tagged union (50-slot registry — the stream-stream join's batch twin
    shares this slot):

      variant='asof'         backward as-of join: each purchase matched
                             to the user's most recent view at-or-before
                             it (ties: view sorts before purchase; latest
                             event_id wins). Union + last(ignorenulls)
                             window — linear per user, no per-row probe.
      variant='window_attr'  view->purchase attribution: EVERY
                             (view, purchase) pair for the same user with
                             the purchase within 1 hour after the view —
                             streaming/joins.py's batch twin, the exact
                             plan the watermarked stream-stream join runs
                             (stream==batch parity is asserted in
                             tests/test_streaming.py; this row makes the
                             batch side driver-hash-checked too).
    """
    (ev,) = load(spark, sf_dir, "events")
    both = ev.where(F.col("event_type").isin("view", "purchase")).select(
        "user_id", "ts", "event_id",
        F.when(F.col("event_type") == "view", 0).otherwise(1).alias("tag"),
        F.when(F.col("event_type") == "view", F.col("event_id")).alias("v_id"),
        F.when(F.col("event_type") == "view", F.col("ts")).alias("v_ts"),
    )
    w = (Window.partitionBy("user_id").orderBy("ts", "tag", "event_id")
         .rowsBetween(Window.unboundedPreceding, -1))
    asof = (
        both.withColumn("prior_view_id", F.last("v_id", ignorenulls=True).over(w))
        .withColumn("prior_view_ts", F.last("v_ts", ignorenulls=True).over(w))
        .where(F.col("tag") == 1)
        .select(F.lit("asof").alias("variant"),
                F.col("event_id").alias("purchase_id"), "user_id",
                F.col("ts").alias("purchase_ts"),
                F.col("prior_view_id").alias("view_id"),
                F.col("prior_view_ts").alias("view_ts"))
    )
    attr = (
        view_purchase_attribution_batch(ev, "1 hour")
        .select(F.lit("window_attr").alias("variant"),
                F.col("purchase_event_id").alias("purchase_id"),
                "user_id",
                "purchase_ts",
                F.col("view_event_id").alias("view_id"),
                "view_ts")
    )
    return asof.unionByName(attr).orderBy("variant", "purchase_id", "view_id")


# ===========================================================================
# Pivot
# ===========================================================================

_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


@register(
    "pivot_user_event_counts",
    oracle="""
    SELECT user_id,
           count(*) FILTER (event_type = 'click')    AS click,
           count(*) FILTER (event_type = 'error')    AS error,
           count(*) FILTER (event_type = 'purchase') AS purchase,
           count(*) FILTER (event_type = 'signup')   AS signup,
           count(*) FILTER (event_type = 'view')     AS view
    FROM events GROUP BY user_id ORDER BY user_id
    """,
    tags=("pivot", "aggregate"),
)
def pivot_user_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot event_type into count columns (explicit value list — at scale
    an unlisted pivot would need an extra distinct pass)."""
    (ev,) = load(spark, sf_dir, "events")
    piv = (ev.groupBy("user_id").pivot("event_type", _EVENT_TYPES)
           .agg(F.count(F.lit(1))))
    return piv.select(
        "user_id",
        *[F.coalesce(F.col(t), F.lit(0)).alias(t) for t in _EVENT_TYPES]
    ).orderBy("user_id")


# ===========================================================================
# Scalar function galleries (string/math + date/time)
# ===========================================================================

@register(
    "scalar_function_gallery",
    oracle="""
    SELECT o_orderkey,
           substr(o_orderpriority, 1, 4)                AS prio_prefix,
           lower(o_orderpriority)                       AS prio_lower,
           length(o_orderpriority)                      AS prio_len,
           concat_ws('|', o_orderstatus, o_orderpriority) AS status_prio,
           replace(o_orderpriority, '-', '_')           AS prio_snake,
           regexp_extract(o_orderpriority, '([0-9]+)', 1) AS prio_num,
           (o_orderpriority LIKE '1%')                  AS is_urgent,
           o_orderkey % 7                               AS key_mod7,
           abs(o_totalprice - 100000.0)                 AS price_dist,
           sqrt(o_totalprice)                           AS price_sqrt,
           round(ln(o_totalprice), 6)                   AS price_ln,
           CAST(ceil(o_totalprice) AS BIGINT)           AS price_ceil,
           CAST(floor(o_totalprice) AS BIGINT)          AS price_floor,
           CAST(o_orderdate AS DATE)                    AS order_date,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
           year(o_orderdate)                            AS yr,
           quarter(o_orderdate)                         AS qtr,
           dayofmonth(o_orderdate)                      AS dom,
           CAST(o_orderdate AS DATE) + 30               AS due_date,
           last_day(CAST(o_orderdate AS DATE))          AS month_end,
           datediff('day', DATE '1995-01-01',
                    CAST(o_orderdate AS DATE))          AS days_since_95
    FROM orders ORDER BY o_orderkey
    """,
    tags=("scalar", "string", "math", "datetime"),
)
def scalar_function_gallery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The scalar-function surface in one codegen'd projection — string
    (substr/case/length/concat_ws/replace/regexp/LIKE), math
    (mod/abs/sqrt/ln/ceil/floor), and date/time
    (trunc/extract/arith/last_day/diff) families; zero Python in the row
    path. sqrt is IEEE-correctly-rounded (bit-identical cross-engine,
    emitted raw); ln differs by ulps between libms, so it is the one
    rounded column."""
    (orders,) = load(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.substring("o_orderpriority", 1, 4).alias("prio_prefix"),
        F.lower("o_orderpriority").alias("prio_lower"),
        F.length("o_orderpriority").alias("prio_len"),
        F.concat_ws("|", "o_orderstatus", "o_orderpriority").alias("status_prio"),
        F.replace(F.col("o_orderpriority"), F.lit("-"), F.lit("_"))
         .alias("prio_snake"),
        F.regexp_extract("o_orderpriority", r"([0-9]+)", 1).alias("prio_num"),
        F.col("o_orderpriority").like("1%").alias("is_urgent"),
        (F.col("o_orderkey") % 7).alias("key_mod7"),
        F.abs(F.col("o_totalprice") - 100000.0).alias("price_dist"),
        F.sqrt("o_totalprice").alias("price_sqrt"),
        F.round(F.log("o_totalprice"), 6).alias("price_ln"),
        F.ceil("o_totalprice").alias("price_ceil"),
        F.floor("o_totalprice").alias("price_floor"),
        F.to_date("o_orderdate").alias("order_date"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.year("o_orderdate").alias("yr"),
        F.quarter("o_orderdate").alias("qtr"),
        F.dayofmonth("o_orderdate").alias("dom"),
        F.date_add(F.to_date("o_orderdate"), 30).alias("due_date"),
        F.last_day(F.to_date("o_orderdate")).alias("month_end"),
        F.datediff(F.to_date("o_orderdate"), F.lit("1995-01-01").cast("date"))
         .alias("days_since_95"),
    ).orderBy("o_orderkey")
