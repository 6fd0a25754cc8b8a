"""Decision-support join shapes, batch 23: the remaining classic TPC-H
query skeletons expressible over the driver's sf tables
(Q3/Q6/Q8/Q10/Q12/Q13/Q18/Q19/Q22, adapted where a TPC-H column is
absent from the synthetic schema — noted per query). With batches 13/19
(Q1/Q4/Q5/Q7/Q9/Q14/Q15/Q17/Q21) this completes every TPC-H shape that
does not require the ``partsupp`` table (Q2/Q11/Q16/Q20 need it).

Scale design (100 TB):
- Money stays INTEGER CENTS through every aggregate (see
  ``tpch.py``): partial sums are exact int64, so results are
  order-independent across partitions, engines, and cluster sizes.
- ``ship_priority`` (Q3): the two date filters prune lineitem and
  orders BEFORE their shuffle join; the top-10 is
  TakeOrderedAndProject over the aggregated (orderkey-grain) table —
  only k rows per partition reach the driver-side heap, never a global
  sort.
- ``forecast_revenue`` (Q6): pure scan-aggregate; all three predicates
  push into the parquet scan (shipdate range lands in footer min/max
  pruning on a date-clustered table) and ONE row crosses the shuffle.
- ``market_share`` (Q8): nation joins play two roles (customer side,
  supplier side) — both broadcast; numerator is a conditional sum in
  the SAME aggregate as the denominator, so the share needs no second
  pass and no self-join.
- ``returned_items`` (Q10): returnflag + quarter filters cut lineitem/
  orders before the customer join; top-20 via TakeOrderedAndProject.
- ``priority_lines`` (Q12 shape; l_shipmode is absent — l_linestatus
  is the grouping stand-in, o_orderpriority the urgency class):
  conditional counts in one aggregate after an orderkey equi-join.
- ``cust_order_dist`` (Q13): LEFT OUTER customer←orders so zero-order
  customers survive with count 0, then a second aggregate over the
  per-customer counts — the count-of-counts histogram is |distinct
  counts|-sized, tiny at any scale.
- ``large_volume_cust`` (Q18): the HAVING sum(qty) > T group-by runs
  FIRST (orderkey grain, map-side combinable); only qualifying
  orderkeys join back to orders/customer — the semi-join-on-aggregate
  shape.
- ``disjunctive_pred`` (Q19): the OR-of-ANDs residual rides on the
  partkey equi-join; per-branch part predicates are OR-folded into one
  scan filter on part (brand IN + size range superset), so the join's
  build side is pre-pruned.
- ``dormant_customers`` (Q22; no c_phone — the trailing digits of
  c_name act as the country code): the positive-balance average is a
  1-row aggregate compared in exact integers (cents·n > sum_cents),
  "has no orders" is a broadcast-able LEFT ANTI join on custkey.

Reference parity: the reference has no warehouse layer; these extend
SURVEY.md §2 A/J families exactly as ``tpch.py`` does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .tpch import _DUCK_CENTS, _DUCK_PCT, _cents, _pct
from .util import table

Q3_SEGMENT = "BUILDING"
Q3_DATE = "1997-06-01"
Q3_TOP = 10
Q6_FROM, Q6_TO = "1996-01-01", "1997-01-01"
Q6_DISC_LO, Q6_DISC_HI = 3, 7  # integer percent, inclusive
Q6_QTY = 24
Q8_REGION = "EUROPE"
Q8_NATION = "NATION_3"
Q8_TYPE = "PROMO"
Q10_FROM, Q10_TO = "1996-07-01", "1996-10-01"
Q10_TOP = 20
Q12_FROM, Q12_TO = "1996-01-01", "1997-01-01"
Q13_EXCLUDE_PRIO = "5-LOW"
Q18_QTY = 300
Q18_TOP = 100
Q19_BRANCHES = (  # (brand, size_lo, size_hi, qty_lo, qty_hi)
    ("Brand#12", 1, 5, 1, 11),
    ("Brand#23", 1, 10, 10, 20),
    ("Brand#34", 1, 15, 20, 30),
)
Q22_CUTOFF = "1999-01-01"  # orders at/after this ⇒ customer not dormant


def _ts(s: str) -> F.Column:
    return F.lit(s).cast("timestamp")


def q_ship_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3: unshipped-order revenue by order, one market segment,
    orders placed before / lines shipped after a date; top-10 by
    revenue (orderkey tie-break for a deterministic row set)."""
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > _ts(Q3_DATE))
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < _ts(Q3_DATE))
    c = table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == Q3_SEGMENT)
    j = li.join(o, li.l_orderkey == o.o_orderkey).join(c, o.o_custkey == c.c_custkey)
    agg = (
        j.groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(_cents("l_extendedprice") * _pct("l_discount")).alias("rc"))
        .select(
            "l_orderkey",
            (F.col("rc") / 10000.0).alias("revenue"),
            "o_orderdate",
            "o_orderpriority",
            F.col("rc").alias("revenue_cents"),
        )
    )
    return agg.orderBy(
        F.col("revenue_cents").desc(), F.col("o_orderdate").asc(), F.col("l_orderkey").asc()
    ).limit(Q3_TOP)


_Q3_SQL = f"""
    SELECT l_orderkey,
           sum({_DUCK_CENTS.format(x='l_extendedprice')}
               * {_DUCK_PCT.format(x='l_discount')}) / 10000.0 AS revenue,
           o_orderdate, o_orderpriority,
           CAST(sum({_DUCK_CENTS.format(x='l_extendedprice')}
               * {_DUCK_PCT.format(x='l_discount')}) AS BIGINT) AS revenue_cents
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    WHERE c_mktsegment = '{Q3_SEGMENT}'
      AND o_orderdate < TIMESTAMP '{Q3_DATE}'
      AND l_shipdate  > TIMESTAMP '{Q3_DATE}'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue_cents DESC, o_orderdate ASC, l_orderkey ASC
    LIMIT {Q3_TOP}
"""


def q_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: forecast-revenue-change scan-aggregate. All three
    predicates (shipdate year, discount band, quantity cap) push into
    the parquet scan; revenue = Σ extendedprice·discount in exact
    cents·percent."""
    li = table(spark, sf_dir, "lineitem")
    disc_pct = F.round(F.col("l_discount") * 100).cast("long")
    sel = li.filter(
        (F.col("l_shipdate") >= _ts(Q6_FROM))
        & (F.col("l_shipdate") < _ts(Q6_TO))
        & disc_pct.between(Q6_DISC_LO, Q6_DISC_HI)
        & (F.col("l_quantity") < Q6_QTY)
    )
    return sel.agg(
        (F.sum(_cents("l_extendedprice") * disc_pct) / 10000.0).alias("revenue"),
        F.count("*").alias("n_lines"),
    )


_Q6_SQL = f"""
    SELECT sum({_DUCK_CENTS.format(x='l_extendedprice')}
               * CAST(round(l_discount * 100) AS BIGINT)) / 10000.0 AS revenue,
           count(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '{Q6_FROM}'
      AND l_shipdate <  TIMESTAMP '{Q6_TO}'
      AND CAST(round(l_discount * 100) AS BIGINT) BETWEEN {Q6_DISC_LO} AND {Q6_DISC_HI}
      AND l_quantity < {Q6_QTY}
"""


def q_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: one nation's share of the revenue that one REGION's
    customers spend on one part type, by order year. The nation dim
    joins twice (customer role filters the region, supplier role tags
    the numerator); numerator and denominator come out of the SAME
    aggregate so the share needs no self-join."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    s = table(spark, sf_dir, "supplier")
    p = table(spark, sf_dir, "part").filter(F.col("p_type") == Q8_TYPE)
    n_c = table(spark, sf_dir, "nation").alias("nc")
    n_s = table(spark, sf_dir, "nation").alias("ns")
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == Q8_REGION)
    j = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n_c), c.c_nationkey == F.col("nc.n_nationkey"))
        .join(F.broadcast(r), F.col("nc.n_regionkey") == r.r_regionkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n_s), s.s_nationkey == F.col("ns.n_nationkey"))
    )
    rev = _cents("l_extendedprice") * _pct("l_discount")
    agg = (
        j.groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            F.sum(F.when(F.col("ns.n_name") == Q8_NATION, rev).otherwise(F.lit(0))).alias(
                "nation_cents"
            ),
            F.sum(rev).alias("total_cents"),
        )
    )
    return agg.select(
        "o_year",
        "nation_cents",
        "total_cents",
        (F.col("nation_cents") / F.col("total_cents")).alias("mkt_share"),
    )


_Q8_SQL = f"""
    SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
           CAST(sum(CASE WHEN ns.n_name = '{Q8_NATION}'
                    THEN {_DUCK_CENTS.format(x='l_extendedprice')}
                         * {_DUCK_PCT.format(x='l_discount')}
                    ELSE 0 END) AS BIGINT) AS nation_cents,
           CAST(sum({_DUCK_CENTS.format(x='l_extendedprice')}
               * {_DUCK_PCT.format(x='l_discount')}) AS BIGINT) AS total_cents,
           sum(CASE WHEN ns.n_name = '{Q8_NATION}'
                    THEN {_DUCK_CENTS.format(x='l_extendedprice')}
                         * {_DUCK_PCT.format(x='l_discount')}
                    ELSE 0 END)
           / sum({_DUCK_CENTS.format(x='l_extendedprice')}
                 * {_DUCK_PCT.format(x='l_discount')}) AS mkt_share
    FROM lineitem
    JOIN part     ON l_partkey = p_partkey
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation nc ON c_nationkey = nc.n_nationkey
    JOIN region   ON nc.n_regionkey = r_regionkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ns ON s_nationkey = ns.n_nationkey
    WHERE p_type = '{Q8_TYPE}' AND r_name = '{Q8_REGION}'
    GROUP BY 1
"""


def q_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: revenue lost to returned items per customer over one
    quarter; top-20 customers (custkey tie-break)."""
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts(Q10_FROM)) & (F.col("o_orderdate") < _ts(Q10_TO))
    )
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    j = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
    )
    agg = (
        j.groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(_cents("l_extendedprice") * _pct("l_discount")).alias("rc"))
        .select(
            "c_custkey",
            "c_name",
            (F.col("rc") / 10000.0).alias("revenue"),
            "n_name",
            F.col("rc").alias("revenue_cents"),
        )
    )
    return agg.orderBy(F.col("revenue_cents").desc(), F.col("c_custkey").asc()).limit(
        Q10_TOP
    )


_Q10_SQL = f"""
    SELECT c_custkey, c_name,
           sum({_DUCK_CENTS.format(x='l_extendedprice')}
               * {_DUCK_PCT.format(x='l_discount')}) / 10000.0 AS revenue,
           n_name,
           CAST(sum({_DUCK_CENTS.format(x='l_extendedprice')}
               * {_DUCK_PCT.format(x='l_discount')}) AS BIGINT) AS revenue_cents
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '{Q10_FROM}'
      AND o_orderdate <  TIMESTAMP '{Q10_TO}'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue_cents DESC, c_custkey ASC
    LIMIT {Q10_TOP}
"""


def q_priority_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (l_shipmode absent → l_linestatus groups,
    o_orderpriority classifies): per line status over one ship year,
    how many lines belong to urgent/high-priority orders vs not —
    conditional counts in ONE aggregate after the orderkey join."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts(Q12_FROM)) & (F.col("l_shipdate") < _ts(Q12_TO))
    )
    o = table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


_Q12_SQL = f"""
    SELECT l_linestatus,
           sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END)::BIGINT AS high_line_count,
           sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 0 ELSE 1 END)::BIGINT AS low_line_count
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipdate >= TIMESTAMP '{Q12_FROM}'
      AND l_shipdate <  TIMESTAMP '{Q12_TO}'
    GROUP BY l_linestatus
"""


def q_cust_order_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: distribution of customers by order count. LEFT OUTER
    customer←orders (one priority class excluded, standing in for the
    comment NOT LIKE filter) keeps zero-order customers at count 0;
    the second aggregate runs over the per-customer counts, a table of
    |customers| rows collapsing to |distinct counts| — tiny output at
    any scale."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != Q13_EXCLUDE_PRIO
    )
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
    )


_Q13_SQL = f"""
    SELECT c_count, count(*) AS custdist
    FROM (
        SELECT c_custkey, count(o_orderkey) AS c_count
        FROM customer
        LEFT OUTER JOIN orders
          ON c_custkey = o_custkey AND o_orderpriority != '{Q13_EXCLUDE_PRIO}'
        GROUP BY c_custkey
    )
    GROUP BY c_count
"""


def q_large_volume_cust(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: customers with orders above a total-quantity
    threshold. The HAVING aggregate runs first at orderkey grain
    (map-side combinable); only qualifying keys join back to orders/
    customer. Quantities are integral doubles → exact int64 sums."""
    li = table(spark, sf_dir, "lineitem")
    qual = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.round("l_quantity").cast("long")).alias("sum_qty"))
        .filter(F.col("sum_qty") > Q18_QTY)
    )
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    j = (
        qual.join(o, qual.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            _cents("o_totalprice").alias("totalprice_cents"),
            "sum_qty",
        )
    )
    return j.orderBy(
        F.col("totalprice_cents").desc(), F.col("o_orderkey").asc()
    ).limit(Q18_TOP)


_Q18_SQL = f"""
    SELECT c_name, c_custkey, o_orderkey, o_orderdate,
           {_DUCK_CENTS.format(x='o_totalprice')} AS totalprice_cents,
           sum_qty
    FROM (
        SELECT l_orderkey,
               CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty
        FROM lineitem GROUP BY l_orderkey HAVING sum_qty > {Q18_QTY}
    )
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    ORDER BY totalprice_cents DESC, o_orderkey ASC
    LIMIT {Q18_TOP}
"""


def q_disjunctive_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19: OR-of-ANDs join residual (brand × size band × qty
    band, no p_container in the schema). The per-branch part predicates
    are OR-folded into the part scan so the broadcast build side is
    pre-pruned; the qty bands stay in the join residual."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    part_pred = None
    residual = None
    for brand, slo, shi, qlo, qhi in Q19_BRANCHES:
        pp = (F.col("p_brand") == brand) & F.col("p_size").between(slo, shi)
        rr = pp & F.col("l_quantity").between(qlo, qhi)
        part_pred = pp if part_pred is None else (part_pred | pp)
        residual = rr if residual is None else (residual | rr)
    j = li.join(
        F.broadcast(p.filter(part_pred)), (li.l_partkey == p.p_partkey) & residual
    )
    return j.agg(
        (F.sum(_cents("l_extendedprice") * _pct("l_discount")) / 10000.0).alias(
            "revenue"
        ),
        F.count("*").alias("n_lines"),
    )


def _q19_sql() -> str:
    ors = " OR ".join(
        f"(p_brand = '{b}' AND p_size BETWEEN {slo} AND {shi}"
        f" AND l_quantity BETWEEN {qlo} AND {qhi})"
        for b, slo, shi, qlo, qhi in Q19_BRANCHES
    )
    return f"""
        SELECT sum({_DUCK_CENTS.format(x='l_extendedprice')}
                   * {_DUCK_PCT.format(x='l_discount')}) / 10000.0 AS revenue,
               count(*) AS n_lines
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        WHERE {ors}
    """


def q_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22: customers with above-average positive balance and no
    recent orders, grouped by "country code" (the trailing digits of
    c_name — c_phone is absent). The positive-balance mean is a 1-row
    aggregate broadcast back and compared in EXACT integers
    (cents·n > sum_cents); "no recent orders" is a LEFT ANTI join."""
    c = table(spark, sf_dir, "customer").withColumn(
        "cntrycode", F.substring("c_name", 17, 2)
    )
    bal = _cents("c_acctbal")
    stats = c.filter(F.col("c_acctbal") > 0.0).agg(
        F.sum(bal).alias("sum_cents"), F.count("*").alias("n_pos")
    )
    recent = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= _ts(Q22_CUTOFF))
        .select("o_custkey")
    )
    cand = (
        c.crossJoin(F.broadcast(stats))
        .filter(bal * F.col("n_pos") > F.col("sum_cents"))
        .join(recent, c.c_custkey == recent.o_custkey, "left_anti")
    )
    return (
        cand.groupBy("cntrycode")
        .agg(
            F.count("*").alias("numcust"),
            (F.sum(bal) / 100.0).alias("totacctbal"),
        )
    )


_Q22_SQL = f"""
    WITH stats AS (
        SELECT sum({_DUCK_CENTS.format(x='c_acctbal')}) AS sum_cents,
               count(*) AS n_pos
        FROM customer WHERE c_acctbal > 0.0
    )
    SELECT substr(c_name, 17, 2) AS cntrycode,
           count(*) AS numcust,
           sum({_DUCK_CENTS.format(x='c_acctbal')}) / 100.0 AS totacctbal
    FROM customer, stats
    WHERE {_DUCK_CENTS.format(x='c_acctbal')} * n_pos > sum_cents
      AND c_custkey NOT IN (
          SELECT o_custkey FROM orders
          WHERE o_orderdate >= TIMESTAMP '{Q22_CUTOFF}'
      )
    GROUP BY 1
"""


QUERIES = {
    "ship_priority": q_ship_priority,
    "forecast_revenue": q_forecast_revenue,
    "market_share": q_market_share,
    "returned_items": q_returned_items,
    "priority_lines": q_priority_lines,
    "cust_order_dist": q_cust_order_dist,
    "large_volume_cust": q_large_volume_cust,
    "disjunctive_pred": q_disjunctive_pred,
    "dormant_customers": q_dormant_customers,
}

ORACLES = {
    "ship_priority": _Q3_SQL,
    "forecast_revenue": _Q6_SQL,
    "market_share": _Q8_SQL,
    "returned_items": _Q10_SQL,
    "priority_lines": _Q12_SQL,
    "cust_order_dist": _Q13_SQL,
    "large_volume_cust": _Q18_SQL,
    "disjunctive_pred": _q19_sql(),
    "dormant_customers": _Q22_SQL,
}
