"""Ad-hoc query layer over the lake tables.

The reference ships an interactive notebook layer over its silver/gold
tables (``Query the Metric tables/Query the delta tables.scala`` and the
Step 05.a/b/c aggregate queries).  This module is the same capability
over this lake's TPC-H-shaped tables: declarative DataFrame plans that
Catalyst turns into pushed-down scans, broadcast joins for the small
dims, and partial-aggregated shuffles.

Doubles are rounded at the output edge (engine-stable comparison);
every computed column is aliased to match the oracle SQL exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from telemetry_streaming_datalake_spark.operators.derived import floor_round


def q1_pricing(lineitem: DataFrame, cutoff: str = "1998-09-02") -> DataFrame:
    """TPC-H Q1-style pricing summary (scan + single agg shuffle)."""
    li = lineitem.filter(F.col("l_shipdate") <= cutoff)
    # decimal sums (the q10 discipline): the big double sums here are
    # order-dependent in the last ulp — exact at any partitioning
    ep = F.col("l_extendedprice").cast("decimal(18,4)")
    one = F.lit(1).cast("decimal(18,4)")
    disc_price = ep * (one - F.col("l_discount").cast("decimal(18,4)"))
    charge = disc_price * (one + F.col("l_tax").cast("decimal(18,4)"))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum(F.col("l_quantity").cast("decimal(18,4)")), 2)
            .cast("double").alias("sum_qty"),
            F.round(F.sum(ep), 2).cast("double").alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).cast("double").alias("sum_disc_price"),
            F.round(F.sum(charge), 2).cast("double").alias("sum_charge"),
            floor_round(F.avg("l_quantity"), 6).alias("avg_qty"),
            floor_round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            floor_round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def q3_shipping(customer: DataFrame, orders: DataFrame, lineitem: DataFrame,
                segment: str = "BUILDING", date: str = "1995-03-15") -> DataFrame:
    """TPC-H Q3-style shipping priority: filtered 3-way join, customer
    side broadcast, top revenue per order."""
    c = F.broadcast(customer.filter(F.col("c_mktsegment") == segment))
    o = orders.filter(F.col("o_orderdate") < date)
    l = lineitem.filter(F.col("l_shipdate") > date)
    # decimal arithmetic (the q10 discipline): a double sum can land
    # either side of a cent boundary depending on partitioning/engine —
    # passes at sf0.01 by luck, diverged at sf0.1 (measured, r9)
    revenue = F.col("l_extendedprice").cast("decimal(18,4)") * (
        F.lit(1).cast("decimal(18,4)") - F.col("l_discount").cast("decimal(18,4)")
    )
    return (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .groupBy("l_orderkey", "o_orderpriority")
        .agg(F.round(F.sum(revenue), 2).cast("double").alias("revenue"))
    )


def q5_supplier_volume(region: DataFrame, nation: DataFrame, customer: DataFrame,
                       orders: DataFrame, lineitem: DataFrame, supplier: DataFrame,
                       region_name: str = "ASIA",
                       date_lo: str = "1996-01-01", date_hi: str = "1997-01-01") -> DataFrame:
    """TPC-H Q5-style local supplier volume: star join, all dims
    broadcast, customer and supplier constrained to the same nation."""
    r = region.filter(F.col("r_name") == region_name)
    n = nation.join(F.broadcast(r), nation["n_regionkey"] == r["r_regionkey"])
    o = orders.filter((F.col("o_orderdate") >= date_lo) & (F.col("o_orderdate") < date_hi))
    revenue = F.col("l_extendedprice").cast("decimal(18,4)") * (
        F.lit(1).cast("decimal(18,4)") - F.col("l_discount").cast("decimal(18,4)")
    )
    return (
        lineitem.join(o, lineitem["l_orderkey"] == o["o_orderkey"])
        .join(supplier, lineitem["l_suppkey"] == supplier["s_suppkey"])
        .join(F.broadcast(customer.select("c_custkey", "c_nationkey")),
              o["o_custkey"] == F.col("c_custkey"))
        .join(F.broadcast(n.select("n_nationkey", "n_name")),
              (supplier["s_nationkey"] == F.col("n_nationkey"))
              & (F.col("c_nationkey") == F.col("n_nationkey")))
        .groupBy("n_name")
        .agg(F.round(F.sum(revenue), 2).cast("double").alias("revenue"))
    )


Q1_ORACLE = """
SELECT l_returnflag, l_linestatus,
       CAST(round(sum(CAST(l_quantity AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_qty,
       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_base_price,
       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4))
                      * (1 - CAST(l_discount AS DECIMAL(18,4)))), 2) AS DOUBLE) AS sum_disc_price,
       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4))
                      * (1 - CAST(l_discount AS DECIMAL(18,4)))
                      * (1 + CAST(l_tax AS DECIMAL(18,4)))), 2) AS DOUBLE) AS sum_charge,
       floor(avg(l_quantity) * 1000000.0 + 0.5) / 1000000.0       AS avg_qty,
       floor(avg(l_extendedprice) * 1000000.0 + 0.5) / 1000000.0   AS avg_price,
       floor(avg(l_discount) * 1000000.0 + 0.5) / 1000000.0        AS avg_disc,
       count(*)                                                    AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY ALL
"""

Q3_ORACLE = """
SELECT l_orderkey, o_orderpriority,
       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4))
                      * (1 - CAST(l_discount AS DECIMAL(18,4)))), 2)
            AS DOUBLE) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
  AND l_shipdate  > TIMESTAMP '1995-03-15 00:00:00'
GROUP BY ALL
"""

Q5_ORACLE = """
SELECT n_name,
       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4))
                      * (1 - CAST(l_discount AS DECIMAL(18,4)))), 2)
            AS DOUBLE) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON s_nationkey = n_nationkey AND c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY ALL
"""


def adhoc_gold_slice(gold: DataFrame) -> DataFrame:
    """The reference's live-debug slice (``Query Delta tables - 3 -
    aggregation issue.scala:66-69``): filter gold to one provider and a
    metric set over a day window, day-bucket the timestamp, group by
    (bucket, remote, metric, provider, category), sum values, and keep
    non-zero sums (HAVING).

    Plan shape: the provider/metric/datestamp predicates push into the
    scan (partition + row-group pruning on a datestamp-partitioned
    lake); one partial-aggregated shuffle; no joins.
    """
    sliced = gold.filter(
        (F.col("provider_id") == 1)
        & F.col("metric_id").isin(100, 101, 102)
        & (F.col("datestamp") >= "2024-01-08")
        & (F.col("datestamp") < "2024-01-15")
    )
    day = (F.col("unix_ts") - F.col("unix_ts") % 86400).alias("unix_day")
    return (
        sliced.select(day, "remote_id", "metric_id", "provider_id", "category_id", "value_double")
        .groupBy("unix_day", "remote_id", "metric_id", "provider_id", "category_id")
        .agg(floor_round(F.sum("value_double"), 6).alias("sum_value"))
        .filter(F.col("sum_value") != 0)
    )


def adhoc_gold_slice_oracle(gold_cte: str) -> str:
    return f"""
WITH gold AS ({gold_cte})
SELECT unix_ts - unix_ts % 86400 AS unix_day,
       remote_id, metric_id, provider_id, category_id,
       floor(sum(value_double) * 1000000.0 + 0.5) / 1000000.0 AS sum_value
FROM gold
WHERE provider_id = 1 AND metric_id IN (100, 101, 102)
  AND datestamp >= '2024-01-08' AND datestamp < '2024-01-15'
GROUP BY ALL
HAVING floor(sum(value_double) * 1000000.0 + 0.5) / 1000000.0 <> 0
"""


def q6_forecast_revenue(lineitem: DataFrame,
                        date_lo: str = "1996-01-01", date_hi: str = "1997-01-01",
                        disc_lo: float = 0.05, disc_hi: float = 0.07,
                        qty_max: int = 24) -> DataFrame:
    """TPC-H Q6-style forecast-revenue delta: pure scan-and-aggregate.

    Every predicate is a scan-level pushdown (date range, discount
    band, quantity cap) — the showcase for `PushedFilters` reaching
    the parquet reader; the aggregate is a single global partial+final
    sum with no shuffle of row data at all.
    """
    li = lineitem.filter(
        (F.col("l_shipdate") >= date_lo)
        & (F.col("l_shipdate") < date_hi)
        & (F.col("l_discount") >= disc_lo)
        & (F.col("l_discount") <= disc_hi)
        & (F.col("l_quantity") < qty_max)
    )
    return li.agg(
        F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"),
        F.count(F.lit(1)).alias("n_rows"),
    )


Q6_ORACLE = """
SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
       count(*) AS n_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


def q10_returned_items(customer: DataFrame, orders: DataFrame, lineitem: DataFrame,
                       nation: DataFrame,
                       date_lo: str = "1996-01-01", date_hi: str = "1996-04-01",
                       k: int = 20) -> DataFrame:
    """TPC-H Q10-style returned-item ranking: who returned the most
    revenue this quarter.

    Fact-side filters first (quarter of orders, RETURN flag), then the
    customer/nation dims broadcast onto the aggregated fact — the agg
    runs BEFORE the dim attach, so the join input is one row per
    customer, not one per lineitem.  Top-k via rounded-revenue sort
    with custkey tiebreak (engine-stable).
    """
    o = orders.filter(
        (F.col("o_orderdate") >= date_lo) & (F.col("o_orderdate") < date_hi)
    )
    l = lineitem.filter(F.col("l_returnflag") == "R")
    # decimal arithmetic: the per-customer sum feeds a top-k cut, so it
    # must be EXACT (order-independent) — a double sum can land either
    # side of a cent boundary depending on partitioning/engine
    revenue = F.col("l_extendedprice").cast("decimal(18,4)") * (
        F.lit(1).cast("decimal(18,4)") - F.col("l_discount").cast("decimal(18,4)")
    )
    per_cust = (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .groupBy("o_custkey")
        .agg(F.round(F.sum(revenue), 2).cast("double").alias("revenue"))
    )
    ranked = (
        per_cust.join(F.broadcast(customer), per_cust["o_custkey"] == customer["c_custkey"])
        .join(F.broadcast(nation), customer["c_nationkey"] == nation["n_nationkey"])
        .select("c_custkey", "c_name", "n_name", "revenue")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(k)
    )
    return ranked


Q10_ORACLE = """
SELECT c_custkey, c_name, n_name, revenue
FROM (
    SELECT o_custkey,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4))
                          * (1 - CAST(l_discount AS DECIMAL(18,4)))), 2)
                AS DOUBLE) AS revenue
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
    GROUP BY o_custkey
) r
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


def q12_priority_shipping(orders: DataFrame, lineitem: DataFrame,
                          date_lo: str = "1996-01-01", date_hi: str = "1997-01-01") -> DataFrame:
    """TPC-H Q12-style shipping-priority audit (adapted to this
    schema's columns): per ship-month, how many shipped lineitems
    belong to high-priority orders vs low.

    Ship-window filter pushes to the lineitem scan; the orders side
    projects (orderkey, priority flag) only; the join is orderkey-equi
    (at this dim ratio AQE broadcasts the filtered fact-side build);
    one partial-agg shuffle on the month key.
    """
    l = lineitem.filter(
        (F.col("l_shipdate") >= date_lo) & (F.col("l_shipdate") < date_hi)
    ).select("l_orderkey", F.date_format("l_shipdate", "yyyy-MM").alias("ship_month"))
    o = orders.select(
        "o_orderkey",
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH").alias("is_high"),
    )
    return (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .groupBy("ship_month")
        .agg(
            F.sum(F.when(F.col("is_high"), 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~F.col("is_high"), 1).otherwise(0)).alias("low_line_count"),
        )
    )


Q12_ORACLE = """
SELECT strftime(l_shipdate, '%Y-%m') AS ship_month,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT)
           AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT)
           AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY 1
"""


def q14_promo_revenue(lineitem: DataFrame, part: DataFrame,
                      date_lo: str = "1996-03-01", date_hi: str = "1996-04-01") -> DataFrame:
    """TPC-H Q14 promotion-revenue share: % of the month's revenue from
    PROMO parts.  One month of lineitem (scan-pushed filter) joins the
    part dim broadcast; exact decimal sums feed the ratio so the
    percentage is partitioning-independent; single-row output.
    """
    l = lineitem.filter(
        (F.col("l_shipdate") >= date_lo) & (F.col("l_shipdate") < date_hi)
    )
    rev = F.col("l_extendedprice").cast("decimal(18,4)") * (
        F.lit(1).cast("decimal(18,4)") - F.col("l_discount").cast("decimal(18,4)")
    )
    j = l.join(F.broadcast(part), l["l_partkey"] == part["p_partkey"])
    # the ratio computes in DOUBLE over the exact decimal sums with
    # the same op order as the oracle (100.0 * p / r), floor-form
    # rounded — a decimal-division path would follow each engine's own
    # scale rules and a round() would follow its midpoint convention
    return j.agg(
        floor_round(
            F.lit(100.0)
            * F.sum(F.when(F.col("p_type").startswith("PROMO"), rev)).cast("double")
            / F.sum(rev).cast("double"),
            4,
        ).alias("promo_revenue_pct")
    )


Q14_ORACLE = """
SELECT floor(100.0 * CAST(sum(CASE WHEN p_type LIKE 'PROMO%'
                     THEN CAST(l_extendedprice AS DECIMAL(18,4))
                          * (1 - CAST(l_discount AS DECIMAL(18,4))) END) AS DOUBLE)
       / CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))
             * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE)
       * 10000.0 + 0.5) / 10000.0
    AS promo_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
"""


def q7_nation_volume(customer: DataFrame, orders: DataFrame, lineitem: DataFrame,
                     supplier: DataFrame, nation: DataFrame,
                     nation_a: str = "NATION_1", nation_b: str = "NATION_2") -> DataFrame:
    """TPC-H Q7-style bilateral trade volume: revenue shipped between
    two nations per ship-year, both directions.

    The nation pair filter lands on the broadcast dim side, pruning
    the fact stream inside the join; revenue sums in exact decimal;
    one partial-agg shuffle on (supp_nation, cust_nation, year).
    """
    n = nation.filter(F.col("n_name").isin(nation_a, nation_b))
    s = supplier.join(F.broadcast(n), supplier["s_nationkey"] == n["n_nationkey"]).select(
        "s_suppkey", F.col("n_name").alias("supp_nation")
    )
    c = customer.join(F.broadcast(n), customer["c_nationkey"] == n["n_nationkey"]).select(
        "c_custkey", F.col("n_name").alias("cust_nation")
    )
    rev = F.col("l_extendedprice").cast("decimal(18,4)") * (
        F.lit(1).cast("decimal(18,4)") - F.col("l_discount").cast("decimal(18,4)")
    )
    j = (
        lineitem.join(F.broadcast(s), lineitem["l_suppkey"] == s["s_suppkey"])
        .join(orders, lineitem["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(c), orders["o_custkey"] == c["c_custkey"])
        .filter(F.col("supp_nation") != F.col("cust_nation"))
    )
    return (
        j.groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("ship_year")
        )
        .agg(F.round(F.sum(rev), 2).cast("double").alias("revenue"))
    )


Q7_ORACLE = """
SELECT supp_nation, cust_nation, ship_year,
       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4))
                      * (1 - CAST(l_discount AS DECIMAL(18,4)))), 2) AS DOUBLE)
           AS revenue
FROM (
    SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
           CAST(year(l_shipdate) AS INTEGER) AS ship_year,
           l_extendedprice, l_discount
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ns ON s_nationkey = ns.n_nationkey
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation nc ON c_nationkey = nc.n_nationkey
    WHERE ns.n_name IN ('NATION_1', 'NATION_2')
      AND nc.n_name IN ('NATION_1', 'NATION_2')
      AND ns.n_name <> nc.n_name
)
GROUP BY 1, 2, 3
"""


def q18_large_orders(customer: DataFrame, orders: DataFrame, lineitem: DataFrame,
                     qty_threshold: int = 250) -> DataFrame:
    """TPC-H Q18-style large-volume-order audit: orders whose total
    lineitem quantity exceeds the threshold, with customer attribution.

    The quantity HAVING aggregate runs on the fact FIRST (one
    partial-agg shuffle on orderkey); only the few surviving orders
    join the dims — broadcast — so the heavy side never re-shuffles.
    """
    big = (
        lineitem.groupBy("l_orderkey")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .filter(F.col("total_qty") > qty_threshold)
    )
    j = (
        big.join(orders, big["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(customer), orders["o_custkey"] == customer["c_custkey"])
    )
    return j.select(
        "c_custkey",
        "c_name",
        "o_orderkey",
        F.unix_timestamp("o_orderdate").alias("order_unix"),
        F.round("o_totalprice", 2).alias("o_totalprice"),
        "total_qty",
    )


def q18_oracle(qty_threshold: int = 250) -> str:
    return f"""
SELECT c_custkey, c_name, o_orderkey,
       (epoch_us(o_orderdate) // 1000000) AS order_unix,
       round(o_totalprice, 2) AS o_totalprice,
       total_qty
FROM (
    SELECT l_orderkey, round(sum(l_quantity), 2) AS total_qty
    FROM lineitem GROUP BY l_orderkey HAVING round(sum(l_quantity), 2) > {qty_threshold}
)
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
"""


def q4_priority_check(orders: DataFrame, lineitem: DataFrame,
                      date_lo: str = "1996-01-01", date_hi: str = "1996-04-01") -> DataFrame:
    """TPC-H Q4-style order-priority check (EXISTS semi-join, adapted
    to this schema: orders in the quarter that had at least one
    returned lineitem).

    The EXISTS spells as `left_semi` — the probe side streams the
    quarter's orders and the build side carries only the distinct
    orderkeys of returned lineitems; no row multiplication, no
    distinct-aggregate needed (semi-join stops at first match).
    """
    o = orders.filter(
        (F.col("o_orderdate") >= date_lo) & (F.col("o_orderdate") < date_hi)
    )
    returned = lineitem.filter(F.col("l_returnflag") == "R").select("l_orderkey")
    return (
        o.join(returned, o["o_orderkey"] == returned["l_orderkey"], "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


Q4_ORACLE = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
GROUP BY o_orderpriority
"""


def q13_order_distribution(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """TPC-H Q13-style customer order-count distribution: how many
    customers placed exactly N non-urgent orders (zero included).

    LEFT OUTER join keeps order-less customers; the filter on the
    orders side lives in the join condition (NOT the WHERE — a WHERE
    would silently turn the outer join inner).  Two partial-agg
    shuffles over single-bigint keys; the second input is one row per
    customer.
    """
    o = orders.filter(F.col("o_orderpriority") != "1-URGENT").select(
        "o_orderkey", "o_custkey"
    )
    per_cust = (
        customer.select("c_custkey")
        .join(o, customer["c_custkey"] == o["o_custkey"], "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


Q13_ORACLE = """
SELECT c_count, count(*) AS custdist
FROM (
    SELECT c_custkey, count(o_orderkey) AS c_count
    FROM customer LEFT OUTER JOIN orders
      ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
    GROUP BY c_custkey
)
GROUP BY c_count
"""


def q16_supplier_variety(lineitem: DataFrame, part: DataFrame, supplier: DataFrame,
                         excl_brand: str = "Brand#45", sizes: tuple = (1, 14, 23, 45)) -> DataFrame:
    """TPC-H Q16-style supplier-variety count (partsupp stands in as
    the observed lineitem part×supplier pairs): distinct suppliers per
    (brand, type, size) slice, excluding flagged suppliers.

    The NOT IN subquery spells as `left_anti` against the (tiny,
    broadcast) flagged-supplier list; the part dim broadcasts into the
    fact scan; count(DISTINCT) runs as Spark's two-phase expand-agg —
    partial per (grp, suppkey), final count — never a global sort.
    """
    flagged = supplier.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    p = part.filter(
        (F.col("p_brand") != excl_brand) & F.col("p_size").isin(*sizes)
    )
    pairs = (
        lineitem.select("l_partkey", "l_suppkey")
        .join(F.broadcast(flagged), lineitem["l_suppkey"] == flagged["s_suppkey"], "left_anti")
        .join(F.broadcast(p), F.col("l_partkey") == p["p_partkey"])
    )
    return (
        pairs.groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


Q16_ORACLE = """
SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#45'
  AND p_size IN (1, 14, 23, 45)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
"""


def q19_disjunctive_revenue(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """TPC-H Q19-style disjunctive-predicate revenue: three OR-combined
    (brand, size-band, quantity-band) clauses over the part join.

    The OR-of-ANDs stays one predicate on the joined row — Catalyst
    extracts the common `p_partkey` equi-key so the join is still hash
    (never nested-loop), broadcasts the part dim, and pushes the
    derivable quantity bound to the lineitem scan.  Single-row exact
    decimal aggregate.
    """
    rev = F.col("l_extendedprice").cast("decimal(18,4)") * (
        F.lit(1).cast("decimal(18,4)") - F.col("l_discount").cast("decimal(18,4)")
    )
    j = lineitem.join(F.broadcast(part), lineitem["l_partkey"] == part["p_partkey"])
    clause = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 5)
         & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 10)
           & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#34") & F.col("p_size").between(1, 15)
           & F.col("l_quantity").between(20, 30))
    )
    return j.filter(clause).agg(
        F.round(F.sum(rev), 2).cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("n_rows"),
    )


Q19_ORACLE = """
SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4))
                      * (1 - CAST(l_discount AS DECIMAL(18,4)))), 2) AS DOUBLE)
           AS revenue,
       count(*) AS n_rows
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5  AND l_quantity BETWEEN 1  AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)
"""


def q22_dormant_value(customer: DataFrame, orders: DataFrame,
                      recent: str = "1999-01-01") -> DataFrame:
    """TPC-H Q22-style dormant-high-value audit: customers with an
    above-average positive balance and no order since the cutoff,
    counted per market segment.

    The global average is a 1-row aggregate broadcast back via
    crossJoin (scalar-subquery shape — the fact never re-shuffles for
    it); NOT EXISTS spells as `left_anti` on custkey.  The anti-join
    build side projects a single bigint column, pre-filtered by the
    scan-pushed date bound.
    """
    avg_bal = customer.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    rich = customer.crossJoin(F.broadcast(avg_bal)).filter(
        F.col("c_acctbal") > F.col("avg_bal")
    )
    dormant = rich.join(
        orders.filter(F.col("o_orderdate") >= recent).select("o_custkey"),
        rich["c_custkey"] == F.col("o_custkey"),
        "left_anti",
    )
    return dormant.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("numcust"),
        F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
    )


Q22_ORACLE = """
SELECT c_mktsegment, count(*) AS numcust, round(sum(c_acctbal), 2) AS totacctbal
FROM customer
WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
GROUP BY c_mktsegment
"""


def q15_top_supplier(lineitem: DataFrame, supplier: DataFrame,
                     date_lo: str = "1996-01-01", date_hi: str = "1996-04-01") -> DataFrame:
    """TPC-H Q15-style top supplier: the supplier(s) whose quarter
    revenue equals the maximum over all suppliers.

    The revenue view aggregates once (partial-agg shuffle on suppkey);
    the scalar max is a 1-row aggregate OF THAT VIEW broadcast back
    onto it — the view is never recomputed (the classic Q15 pitfall of
    evaluating the view twice), and exact decimal sums make the
    equality well-defined.
    """
    l = lineitem.filter(
        (F.col("l_shipdate") >= date_lo) & (F.col("l_shipdate") < date_hi)
    )
    rev = F.col("l_extendedprice").cast("decimal(18,4)") * (
        F.lit(1).cast("decimal(18,4)") - F.col("l_discount").cast("decimal(18,4)")
    )
    revenue_view = (
        l.groupBy("l_suppkey").agg(F.sum(rev).alias("total_revenue_exact"))
    )
    top = revenue_view.agg(F.max("total_revenue_exact").alias("max_revenue"))
    return (
        revenue_view.crossJoin(F.broadcast(top))
        .filter(F.col("total_revenue_exact") == F.col("max_revenue"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == supplier["s_suppkey"])
        .select(
            "s_suppkey",
            "s_name",
            F.round(F.col("total_revenue_exact"), 2).cast("double").alias("total_revenue"),
        )
    )


Q15_ORACLE = """
WITH revenue_view AS (
    SELECT l_suppkey,
           sum(CAST(l_extendedprice AS DECIMAL(18,4))
               * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS total_revenue_exact
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
    GROUP BY l_suppkey
)
SELECT s_suppkey, s_name,
       CAST(round(total_revenue_exact, 2) AS DOUBLE) AS total_revenue
FROM revenue_view
JOIN supplier ON l_suppkey = s_suppkey
WHERE total_revenue_exact = (SELECT max(total_revenue_exact) FROM revenue_view)
"""


def q17_small_quantity_revenue(lineitem: DataFrame, part: DataFrame,
                               brand: str = "Brand#23") -> DataFrame:
    """TPC-H Q17-style small-quantity revenue: yearly revenue lost if
    orders below 20% of a part's average quantity were not filled.

    The correlated scalar subquery (per-part avg) spells as a per-part
    aggregate joined back to the fact — the aggregate is
    part-cardinality and broadcasts; the fact never shuffles.  The
    brand filter prunes BOTH the aggregate build and the probe.
    """
    p = part.filter(F.col("p_brand") == brand).select("p_partkey")
    li = lineitem.join(F.broadcast(p), lineitem["l_partkey"] == F.col("p_partkey"))
    avg_qty = li.groupBy("l_partkey").agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("qty_threshold")
    )
    small = li.join(F.broadcast(avg_qty), "l_partkey").filter(
        F.col("l_quantity") < F.col("qty_threshold")
    )
    return small.agg(
        F.round(F.sum(F.col("l_extendedprice").cast("decimal(18,4)")) / 7, 2)
        .cast("double")
        .alias("avg_yearly"),
        F.count(F.lit(1)).alias("n_rows"),
    )


Q17_ORACLE = """
SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4))) / 7, 2) AS DOUBLE)
           AS avg_yearly,
       count(*) AS n_rows
FROM lineitem l
JOIN part ON l.l_partkey = p_partkey
WHERE p_brand = 'Brand#23'
  AND l_quantity < (
      SELECT 0.2 * avg(l_quantity) FROM lineitem i
      WHERE i.l_partkey = l.l_partkey
  )
"""


def q2_min_cost_supplier(part: DataFrame, supplier: DataFrame, nation: DataFrame,
                         region: DataFrame, lineitem: DataFrame,
                         region_name: str = "EUROPE", size: int = 15) -> DataFrame:
    """TPC-H Q2-style minimum-cost supplier (analog: the lake has no
    partsupp table, so the part↔supplier supply cost is derived from
    shipped lineitems — ``min(l_extendedprice)`` per (part, supplier),
    exact parquet doubles so the per-part min-equality is well-defined).

    Shape: one partial-agg shuffle builds the (part, supplier) cost
    relation; the correlated ``cost = (SELECT min ...)`` spells as a
    per-part re-aggregate broadcast back onto it; supplier/nation/
    region dims broadcast.  The fact table is scanned once.
    """
    r = region.filter(F.col("r_name") == region_name)
    n = nation.join(F.broadcast(r), nation["n_regionkey"] == r["r_regionkey"]).select(
        "n_nationkey", "n_name"
    )
    s = supplier.join(
        F.broadcast(n), supplier["s_nationkey"] == F.col("n_nationkey")
    ).select("s_suppkey", "s_name", "s_acctbal", "n_name")
    p = part.filter(F.col("p_size") == size).select("p_partkey", "p_type")
    cost = (
        lineitem.join(F.broadcast(p), lineitem["l_partkey"] == F.col("p_partkey"))
        .join(F.broadcast(s), lineitem["l_suppkey"] == F.col("s_suppkey"))
        .groupBy("p_partkey", "p_type", "s_suppkey", "s_name", "s_acctbal", "n_name")
        .agg(F.min("l_extendedprice").alias("supply_cost"))
    )
    min_cost = cost.groupBy("p_partkey").agg(
        F.min("supply_cost").alias("min_cost")
    )
    return (
        cost.join(F.broadcast(min_cost), "p_partkey")
        .filter(F.col("supply_cost") == F.col("min_cost"))
        .select(
            "p_partkey", "p_type", "s_suppkey", "s_name", "n_name",
            F.col("s_acctbal"),
            F.col("supply_cost"),
        )
    )


Q2_ORACLE = """
WITH cost AS (
    SELECT p_partkey, p_type, s_suppkey, s_name, s_acctbal, n_name,
           min(l_extendedprice) AS supply_cost
    FROM lineitem
    JOIN part     ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE p_size = 15 AND r_name = 'EUROPE'
    GROUP BY 1, 2, 3, 4, 5, 6
)
SELECT p_partkey, p_type, s_suppkey, s_name, n_name, s_acctbal, supply_cost
FROM cost c
WHERE supply_cost = (
    SELECT min(supply_cost) FROM cost i WHERE i.p_partkey = c.p_partkey
)
"""


def q8_market_share(part: DataFrame, supplier: DataFrame, nation: DataFrame,
                    region: DataFrame, customer: DataFrame, orders: DataFrame,
                    lineitem: DataFrame,
                    share_nation: str = "NATION_3", region_name: str = "AMERICA",
                    p_type: str = "ECONOMY",
                    date_lo: str = "1995-01-01", date_hi: str = "1997-01-01") -> DataFrame:
    """TPC-H Q8-style national market share: of all order volume for a
    part type sold to customers in a region, the fraction supplied by
    one nation, per year.

    Shape: star join with every dim broadcast (part filter prunes the
    probe), ONE partial-agg shuffle on year with the share as a
    conditional-sum ratio — no second pass over the fact.
    """
    r = region.filter(F.col("r_name") == region_name)
    cust_n = nation.join(F.broadcast(r), nation["n_regionkey"] == r["r_regionkey"])
    c = customer.join(
        F.broadcast(cust_n.select("n_nationkey")),
        customer["c_nationkey"] == F.col("n_nationkey"),
    ).select("c_custkey")
    supp_n = nation.select(
        F.col("n_nationkey").alias("sn_nationkey"), F.col("n_name").alias("supp_nation")
    )
    p = part.filter(F.col("p_type") == p_type).select("p_partkey")
    o = orders.filter(
        (F.col("o_orderdate") >= date_lo) & (F.col("o_orderdate") < date_hi)
    )
    # decimal arithmetic (the q10 discipline, r9 review): raw double
    # sums are partial-aggregated in Spark but sequential in DuckDB —
    # the same class q3 measured flipping at sf0.1.  The share ratio
    # then computes in DOUBLE over the exact sums, floor-form rounded.
    volume = F.col("l_extendedprice").cast("decimal(18,4)") * (
        F.lit(1).cast("decimal(18,4)") - F.col("l_discount").cast("decimal(18,4)")
    )
    return (
        lineitem.join(F.broadcast(p), lineitem["l_partkey"] == F.col("p_partkey"))
        .join(o, lineitem["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == F.col("c_custkey"))
        .join(supplier, lineitem["l_suppkey"] == supplier["s_suppkey"])
        .join(F.broadcast(supp_n), supplier["s_nationkey"] == F.col("sn_nationkey"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            floor_round(
                F.sum(
                    F.when(F.col("supp_nation") == share_nation, volume)
                    .otherwise(F.lit(0))
                ).cast("double")
                / F.sum(volume).cast("double"),
                6,
            ).alias("mkt_share"),
            F.round(F.sum(volume), 2).cast("double").alias("total_volume"),
        )
    )


Q8_ORACLE = """
SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
       floor(CAST(sum(CASE WHEN n2.n_name = 'NATION_3'
                      THEN CAST(l_extendedprice AS DECIMAL(18,4))
                           * (1 - CAST(l_discount AS DECIMAL(18,4)))
                      ELSE 0 END) AS DOUBLE)
             / CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))
                        * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE)
             * 1000000.0 + 0.5) / 1000000.0 AS mkt_share,
       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4))
                      * (1 - CAST(l_discount AS DECIMAL(18,4)))), 2) AS DOUBLE)
           AS total_volume
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON c_nationkey = n1.n_nationkey
JOIN region   ON n1.n_regionkey = r_regionkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
WHERE p_type = 'ECONOMY' AND r_name = 'AMERICA'
  AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY 1
"""


def q9_product_profit(part: DataFrame, supplier: DataFrame, nation: DataFrame,
                      orders: DataFrame, lineitem: DataFrame,
                      name_word: str = "widget") -> DataFrame:
    """TPC-H Q9-style product-type profit by nation and year (analog:
    no partsupp → supply cost proxied as ``0.4 * p_retailprice *
    l_quantity``, a deterministic function of broadcast part columns).

    Shape: part filter broadcast-prunes the fact scan, supplier/nation
    dims broadcast, one partial-agg shuffle on (nation, year).
    Decimal amounts keep both engines' sums exact.
    """
    p = part.filter(F.col("p_name").contains(name_word)).select(
        "p_partkey", "p_retailprice"
    )
    amount = (
        F.col("l_extendedprice").cast("decimal(18,4)")
        * (F.lit(1).cast("decimal(18,4)") - F.col("l_discount").cast("decimal(18,4)"))
        - F.lit(0.4).cast("decimal(18,4)")
        * F.col("p_retailprice").cast("decimal(18,4)")
        * F.col("l_quantity").cast("decimal(18,4)")
    )
    return (
        lineitem.join(F.broadcast(p), lineitem["l_partkey"] == F.col("p_partkey"))
        .join(supplier, lineitem["l_suppkey"] == supplier["s_suppkey"])
        .join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            supplier["s_nationkey"] == F.col("n_nationkey"),
        )
        .join(orders, lineitem["l_orderkey"] == orders["o_orderkey"])
        .groupBy(
            F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year")
        )
        .agg(F.round(F.sum(amount), 2).cast("double").alias("sum_profit"))
    )


Q9_ORACLE = """
SELECT n_name AS nation,
       CAST(year(o_orderdate) AS BIGINT) AS o_year,
       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4))
                      * (1 - CAST(l_discount AS DECIMAL(18,4)))
                      - CAST(0.4 AS DECIMAL(18,4))
                        * CAST(p_retailprice AS DECIMAL(18,4))
                        * CAST(l_quantity AS DECIMAL(18,4))), 2) AS DOUBLE)
           AS sum_profit
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN orders   ON l_orderkey = o_orderkey
WHERE p_name LIKE '%widget%'
GROUP BY 1, 2
"""


def q11_important_stock(supplier: DataFrame, nation: DataFrame, lineitem: DataFrame,
                        nation_name: str = "NATION_7",
                        fraction: float = 0.001) -> DataFrame:
    """TPC-H Q11-style important stock (analog: part value held by one
    nation's suppliers = decimal sum of ``l_extendedprice * l_quantity``
    over that nation's shipments, no partsupp table).  Keeps parts whose
    value exceeds ``fraction`` of the nation's total — the classic
    HAVING-versus-global-scalar shape.

    Shape: one partial-agg shuffle on partkey; the global threshold is
    a 1-row re-aggregate OF the per-part relation broadcast back — the
    fact is scanned once and the value relation is never recomputed.
    Exact decimal sums make the threshold comparison well-defined.
    """
    s = supplier.join(
        F.broadcast(nation.filter(F.col("n_name") == nation_name)),
        supplier["s_nationkey"] == F.col("n_nationkey"),
    ).select("s_suppkey")
    value = F.col("l_extendedprice").cast("decimal(18,4)") * F.col(
        "l_quantity"
    ).cast("decimal(18,4)")
    per_part = (
        lineitem.join(F.broadcast(s), lineitem["l_suppkey"] == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(F.sum(value).alias("part_value_exact"))
    )
    threshold = per_part.agg(
        (F.sum("part_value_exact") * F.lit(fraction).cast("decimal(18,10)")).alias(
            "cut"
        )
    )
    return (
        per_part.crossJoin(F.broadcast(threshold))
        .filter(F.col("part_value_exact") > F.col("cut"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.round(F.col("part_value_exact"), 2).cast("double").alias("part_value"),
        )
    )


Q11_ORACLE = """
WITH per_part AS (
    SELECT l_partkey,
           sum(CAST(l_extendedprice AS DECIMAL(18,4))
               * CAST(l_quantity AS DECIMAL(18,4))) AS part_value_exact
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_7'
    GROUP BY 1
)
SELECT l_partkey AS p_partkey,
       CAST(round(part_value_exact, 2) AS DOUBLE) AS part_value
FROM per_part
WHERE part_value_exact > (
    SELECT sum(part_value_exact) * CAST(0.001 AS DECIMAL(18,10)) FROM per_part
)
"""


def q20_excess_shippers(supplier: DataFrame, nation: DataFrame, part: DataFrame,
                        lineitem: DataFrame,
                        nation_name: str = "NATION_6", name_word: str = "bolt",
                        date_lo: str = "1996-01-01", date_hi: str = "1997-01-01",
                        share: float = 0.5) -> DataFrame:
    """TPC-H Q20-style dominant shippers (analog: with no partsupp
    availability column, "excess" is a supplier shipping MORE than
    ``share`` of a part's total year volume — same nested semi-join
    chain: parts by name → per-(part,supplier) aggregate vs per-part
    scalar → DISTINCT suppliers → nation filter).

    Shape: fact scanned once into a (part, supplier) partial agg; the
    per-part total is a re-aggregate broadcast back; the supplier list
    is a distinct semi-join — suppliers never fan out.
    """
    p = part.filter(F.col("p_name").contains(name_word)).select("p_partkey")
    li = (
        lineitem.filter(
            (F.col("l_shipdate") >= date_lo) & (F.col("l_shipdate") < date_hi)
        )
        .join(F.broadcast(p), lineitem["l_partkey"] == F.col("p_partkey"))
    )
    qty = F.col("l_quantity").cast("decimal(18,4)")
    per_ps = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(qty).alias("supp_qty")
    )
    per_part = per_ps.groupBy("l_partkey").agg(F.sum("supp_qty").alias("part_qty"))
    dominant = (
        per_ps.join(F.broadcast(per_part), "l_partkey")
        .filter(F.col("supp_qty") > F.lit(share).cast("decimal(18,4)") * F.col("part_qty"))
        .select("l_suppkey")
        .distinct()
    )
    s = supplier.join(
        F.broadcast(nation.filter(F.col("n_name") == nation_name)),
        supplier["s_nationkey"] == F.col("n_nationkey"),
    )
    return (
        s.join(F.broadcast(dominant), s["s_suppkey"] == F.col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
    )


Q20_ORACLE = """
WITH per_ps AS (
    SELECT l_partkey, l_suppkey, sum(CAST(l_quantity AS DECIMAL(18,4))) AS supp_qty
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE p_name LIKE '%bolt%'
      AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY 1, 2
)
SELECT s_suppkey, s_name
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
WHERE n_name = 'NATION_6'
  AND s_suppkey IN (
      SELECT l_suppkey FROM per_ps a
      WHERE supp_qty > CAST(0.5 AS DECIMAL(18,4)) * (
          SELECT sum(supp_qty) FROM per_ps b WHERE b.l_partkey = a.l_partkey
      )
  )
"""


def q21_waiting_supplier(supplier: DataFrame, nation: DataFrame, orders: DataFrame,
                         lineitem: DataFrame,
                         nation_name: str = "NATION_5",
                         late_days: int = 60) -> DataFrame:
    """TPC-H Q21-style suppliers who kept orders waiting (analog: the
    lake has no receipt/commit dates, so "late" = shipped more than
    ``late_days`` after the order date).  A supplier is counted for an
    order when it was late on a finished multi-supplier order AND no
    other supplier on that order was late — the classic
    EXISTS / NOT-EXISTS double correlation.

    Shape: the two correlated EXISTS spell as ONE per-order conditional
    aggregate (distinct suppliers, distinct late suppliers) joined back
    to the late lineitems — the fact is scanned twice (once per side),
    each with partial aggregation, and no per-row subquery loops.
    """
    fin = orders.filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey", "o_orderdate"
    )
    li = lineitem.join(fin, lineitem["l_orderkey"] == fin["o_orderkey"]).withColumn(
        "is_late",
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr(f"INTERVAL {late_days} DAYS"),
    )
    per_order = li.groupBy("l_orderkey").agg(
        F.count_distinct("l_suppkey").alias("n_supp"),
        F.count_distinct(F.when(F.col("is_late"), F.col("l_suppkey"))).alias(
            "n_late_supp"
        ),
    )
    s = supplier.join(
        F.broadcast(nation.filter(F.col("n_name") == nation_name)),
        supplier["s_nationkey"] == F.col("n_nationkey"),
    ).select("s_suppkey", "s_name")
    late_lines = (
        li.filter(F.col("is_late"))
        .join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .select("l_orderkey", "s_suppkey", "s_name")
        .distinct()
    )
    return (
        late_lines.join(
            per_order.filter((F.col("n_supp") > 1) & (F.col("n_late_supp") == 1)),
            "l_orderkey",
        )
        .groupBy("s_suppkey", "s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


Q21_ORACLE = """
WITH li AS (
    SELECT l_orderkey, l_suppkey,
           l_shipdate > o_orderdate + INTERVAL 60 DAY AS is_late
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    WHERE o_orderstatus = 'F'
),
per_order AS (
    SELECT l_orderkey,
           count(DISTINCT l_suppkey) AS n_supp,
           count(DISTINCT CASE WHEN is_late THEN l_suppkey END) AS n_late_supp
    FROM li GROUP BY 1
)
SELECT s_suppkey, s_name, count(*) AS numwait
FROM (
    SELECT DISTINCT l_orderkey, s_suppkey, s_name
    FROM li
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE is_late AND n_name = 'NATION_5'
) late_lines
JOIN per_order USING (l_orderkey)
WHERE n_supp > 1 AND n_late_supp = 1
GROUP BY 1, 2
"""
