"""Decision-support join shapes, batch 13: the classic TPC-H query
skeletons (Q4/Q5/Q14/Q15/Q17/Q21) re-expressed over the driver's sf
tables, plus LSH-gated edit-distance verification of near-dup pairs.

These close the remaining *relational* shapes a warehouse user expects
from the engine: multi-fact star joins with a cross-dimension equality
(Q5), EXISTS semi-joins with a non-equi residual (Q4), conditional-
aggregate ratios (Q14), having-equal-to-global-max (Q15), correlated
per-group average subqueries decorrelated into a join (Q17), and the
"exactly one offender per group" multi-pass shape (Q21).

Scale design (100 TB):
- Money is INTEGER CENTS end-to-end: ``round(price*100)::BIGINT`` and
  ``(100 - round(discount*100))`` make every revenue sum an exact int64
  — no float-summation-order drift between partial aggregates, engines,
  or cluster sizes; the single final division back to currency is one
  IEEE op on an exact integer (bit-identical in Spark and DuckDB).
- ``local_volume``: lineitem⋈orders⋈customer shuffle on their keys;
  nation/region dims broadcast; the supplier join carries the
  cross-dimension equality (s_nationkey = c_nationkey) as part of the
  join condition, never a post-join filter over a wider join.
- ``top_supplier``: per-supplier revenue (one keyed agg), the global max
  is a 1-row aggregate equi-joined back on the exact integer revenue —
  tie-SAFE (every supplier at the max qualifies), no window over the
  whole table, no driver collect.
- ``small_qty_revenue``: the Q17 correlated subquery (qty < 0.2×avg per
  part) decorrelated into one per-part aggregate joined back, with the
  threshold compared in integers: 5·qty·cnt < sum_qty ⇔ qty < 0.2·avg —
  zero float comparisons.
- ``order_priority``: LEFT SEMI join (orderkey equi + ship-after-30-days
  residual) — the EXISTS never duplicates orders, so no distinct.
- ``sole_return_supplier``: one per-order aggregate (distinct suppliers,
  distinct returning suppliers) joined to the distinct returning pairs —
  two shuffles on orderkey, then a supplier-keyed count; top-k via
  TakeOrderedAndProject.
- ``lev_verify``: Levenshtein runs ONLY on LSH band-candidate pairs
  (equi-join on (band, band_key)) and only on fixed-length prefixes —
  the O(n²·len²) brute force never exists in the plan.

Reference parity: the reference has no warehouse layer; these extend
the relational surface (SURVEY.md §2 A/J families) the same way
``relational.py`` does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .util import table

Q5_REGION = "ASIA"
Q5_FROM, Q5_TO = "1996-01-01", "1997-01-01"
Q15_FROM, Q15_TO = "1996-01-01", "1996-04-01"
Q17_BRAND = "Brand#12"
Q4_FROM, Q4_TO = "1996-01-01", "1996-04-01"
Q4_LATE_DAYS = 30
Q14_YEAR = 1996
Q21_TOP = 10
Q7_NATION_A, Q7_NATION_B = "NATION_1", "NATION_2"
Q9_TOKEN = "widget"
LEV_PREFIX = 80  # chars of document prefix compared
LEV_MAX = 20  # edit-distance acceptance threshold


def _cents(col: str) -> F.Column:
    """Exact integer cents from a 2-decimal double price column."""
    return F.round(F.col(col) * 100).cast("long")


def _pct(col: str) -> F.Column:
    """(1 - discount) as an exact integer percentage 0..100."""
    return (F.lit(100) - F.round(F.col(col) * 100).cast("long"))


_DUCK_CENTS = "CAST(round({x} * 100) AS BIGINT)"
_DUCK_PCT = "(100 - CAST(round({x} * 100) AS BIGINT))"


def q_local_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: revenue per nation from orders where the customer
    and the line's supplier sit in the SAME nation, one region, one
    order-year. The s_nationkey = c_nationkey equality rides inside the
    supplier join condition."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit(Q5_FROM).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(Q5_TO).cast("timestamp"))
    )
    c = table(spark, sf_dir, "customer")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == Q5_REGION)
    j = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            s,
            (li.l_suppkey == s.s_suppkey)
            & (s.s_nationkey == c.c_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    rev = F.sum(_cents("l_extendedprice") * _pct("l_discount")).alias("rc")
    return (
        j.groupBy("n_name")
        .agg(rev, F.count("*").alias("n_lines"))
        .select(
            "n_name",
            (F.col("rc") / 10000.0).alias("revenue"),
            "n_lines",
        )
    )


_Q5_SQL = f"""
    SELECT n_name,
           sum({_DUCK_CENTS.format(x='l_extendedprice')}
               * {_DUCK_PCT.format(x='l_discount')}) / 10000.0 AS revenue,
           count(*) AS n_lines
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = '{Q5_REGION}'
      AND o_orderdate >= TIMESTAMP '{Q5_FROM}'
      AND o_orderdate <  TIMESTAMP '{Q5_TO}'
    GROUP BY n_name
"""


def q_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: supplier(s) with the maximum quarter revenue.
    The max is a 1-row aggregate equi-joined back on the EXACT integer
    revenue, so ties all qualify and no global sort/window runs."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(Q15_FROM).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(Q15_TO).cast("timestamp"))
    )
    rev = li.groupBy("l_suppkey").agg(
        F.sum(_cents("l_extendedprice") * _pct("l_discount")).alias("rc")
    )
    mx = rev.agg(F.max("rc").alias("rc"))
    s = table(spark, sf_dir, "supplier")
    return (
        rev.join(F.broadcast(mx), "rc")
        .join(F.broadcast(s), rev.l_suppkey == s.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            (F.col("rc") / 10000.0).alias("total_revenue"),
        )
    )


_Q15_SQL = f"""
    WITH rev AS (
        SELECT l_suppkey,
               sum({_DUCK_CENTS.format(x='l_extendedprice')}
                   * {_DUCK_PCT.format(x='l_discount')}) AS rc
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '{Q15_FROM}'
          AND l_shipdate <  TIMESTAMP '{Q15_TO}'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, rc / 10000.0 AS total_revenue
    FROM rev
    JOIN (SELECT max(rc) AS rc FROM rev) USING (rc)
    JOIN supplier ON l_suppkey = s_suppkey
"""


def q_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: average yearly revenue lost to small-quantity
    orders of one brand — lines with qty < 20% of that part's average
    quantity. The correlated avg decorrelates into one per-part
    aggregate; the 20% threshold compares in integers
    (5·qty·cnt < sum_qty)."""
    p = table(spark, sf_dir, "part").filter(F.col("p_brand") == Q17_BRAND)
    li = table(spark, sf_dir, "lineitem")
    branded = li.join(
        F.broadcast(p.select("p_partkey")), li.l_partkey == p.p_partkey
    )
    qty_c = F.round(F.col("l_quantity") * 100).cast("long")
    stats = branded.groupBy("l_partkey").agg(
        F.sum(qty_c).alias("sum_q"), F.count("*").alias("cnt_q")
    )
    j = branded.join(stats, "l_partkey").filter(
        qty_c * 5 * F.col("cnt_q") < F.col("sum_q")
    )
    return j.agg(
        F.count("*").alias("n_small_lines"),
        (F.sum(_cents("l_extendedprice")) / F.lit(700.0)).alias("avg_yearly"),
    )


_Q17_SQL = f"""
    WITH branded AS (
        SELECT l_partkey, l_quantity, l_extendedprice
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_brand = '{Q17_BRAND}'
    ),
    stats AS (
        SELECT l_partkey,
               sum(CAST(round(l_quantity * 100) AS BIGINT)) AS sum_q,
               count(*) AS cnt_q
        FROM branded GROUP BY l_partkey
    )
    SELECT count(*) AS n_small_lines,
           sum({_DUCK_CENTS.format(x='l_extendedprice')}) / 700.0
               AS avg_yearly
    FROM branded JOIN stats USING (l_partkey)
    WHERE CAST(round(l_quantity * 100) AS BIGINT) * 5 * cnt_q < sum_q
"""


def q_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: orders per priority that had at least one line
    shipped more than 30 days after the order date — EXISTS as a LEFT
    SEMI join (orderkey equi-key + non-equi date residual), so orders
    are never duplicated and no distinct is needed."""
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit(Q4_FROM).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(Q4_TO).cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem")
    late = o.join(
        li,
        (o.o_orderkey == li.l_orderkey)
        & (
            li.l_shipdate
            > o.o_orderdate + F.expr(f"INTERVAL {Q4_LATE_DAYS} DAYS")
        ),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count("*").alias("order_count")
    )


_Q4_SQL = f"""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '{Q4_FROM}'
      AND o_orderdate <  TIMESTAMP '{Q4_TO}'
      AND EXISTS (
          SELECT 1 FROM lineitem
          WHERE l_orderkey = o_orderkey
            AND l_shipdate > o_orderdate + INTERVAL {Q4_LATE_DAYS} DAY
      )
    GROUP BY o_orderpriority
"""


def q_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: monthly share of revenue from promo parts —
    conditional aggregation over one broadcast dim join; the share is
    one IEEE division of two exact integer sums."""
    li = table(spark, sf_dir, "lineitem").filter(
        F.year("l_shipdate") == Q14_YEAR
    )
    p = table(spark, sf_dir, "part").select("p_partkey", "p_type")
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    rc = _cents("l_extendedprice") * _pct("l_discount")
    promo = F.sum(F.when(F.col("p_type") == "PROMO", rc).otherwise(F.lit(0)))
    return (
        j.groupBy(F.date_trunc("month", "l_shipdate").alias("ship_month"))
        .agg(
            promo.alias("pc"),
            F.sum(rc).alias("tc"),
        )
        .select(
            "ship_month",
            (F.col("pc") / 10000.0).alias("promo_revenue"),
            (F.col("tc") / 10000.0).alias("total_revenue"),
            (F.col("pc").cast("double") / F.col("tc")).alias("promo_share"),
        )
    )


_Q14_SQL = f"""
    WITH j AS (
        SELECT date_trunc('month', l_shipdate) AS ship_month,
               {_DUCK_CENTS.format(x='l_extendedprice')}
                   * {_DUCK_PCT.format(x='l_discount')} AS rc,
               p_type
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE year(l_shipdate) = {Q14_YEAR}
    )
    SELECT ship_month,
           sum(CASE WHEN p_type = 'PROMO' THEN rc ELSE 0 END) / 10000.0
               AS promo_revenue,
           sum(rc) / 10000.0 AS total_revenue,
           sum(CASE WHEN p_type = 'PROMO' THEN rc ELSE 0 END)::DOUBLE
               / sum(rc) AS promo_share
    FROM j GROUP BY ship_month
"""


def q_sole_return_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (adapted to this schema's columns): suppliers who
    were the ONLY supplier with a returned line in a multi-supplier
    order — "exactly one offender per group". One per-order aggregate
    (distinct suppliers / distinct returning suppliers) joins the
    distinct (order, returning-supplier) pairs; top suppliers by count
    via TakeOrderedAndProject."""
    li = table(spark, sf_dir, "lineitem")
    per_order = li.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(
            F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))
        ).alias("n_ret_supp"),
    )
    ret = (
        li.filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    blamed = ret.join(
        per_order.filter(
            (F.col("n_supp") >= 2) & (F.col("n_ret_supp") == 1)
        ),
        "l_orderkey",
    )
    s = table(spark, sf_dir, "supplier")
    return (
        blamed.groupBy("l_suppkey")
        .agg(F.count("*").alias("numwait"))
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .select("s_name", "numwait")
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(Q21_TOP)
    )


_Q21_SQL = f"""
    WITH per_order AS (
        SELECT l_orderkey,
               count(DISTINCT l_suppkey) AS n_supp,
               count(DISTINCT CASE WHEN l_returnflag = 'R'
                                   THEN l_suppkey END) AS n_ret_supp
        FROM lineitem GROUP BY l_orderkey
    ),
    ret AS (
        SELECT DISTINCT l_orderkey, l_suppkey
        FROM lineitem WHERE l_returnflag = 'R'
    )
    SELECT s_name, count(*) AS numwait
    FROM ret
    JOIN per_order USING (l_orderkey)
    JOIN supplier ON l_suppkey = s_suppkey
    WHERE n_supp >= 2 AND n_ret_supp = 1
    GROUP BY s_name
    ORDER BY numwait DESC, s_name ASC
    LIMIT {Q21_TOP}
"""


def q_lev_verify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance verification of LSH near-dup candidates: Levenshtein
    over fixed-length document prefixes, computed ONLY for pairs sharing
    a MinHash band bucket (``dedup.q_lsh_pairs``). The quadratic kernel
    never sees the corpus — candidates are LSH-bounded, the distance is
    prefix-bounded (O(LEV_PREFIX²) per pair), and texts join in by
    doc_id equi-key."""
    from .dedup import q_lsh_pairs

    d = table(spark, sf_dir, "documents").select(
        "doc_id", F.substring("text", 1, LEV_PREFIX).alias("prefix")
    )
    pairs = q_lsh_pairs(spark, sf_dir)
    a = d.select(
        F.col("doc_id").alias("doc_a"), F.col("prefix").alias("pa")
    )
    b = d.select(
        F.col("doc_id").alias("doc_b"), F.col("prefix").alias("pb")
    )
    return (
        pairs.join(a, "doc_a")
        .join(b, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.levenshtein("pa", "pb").cast("long").alias("lev"),
            (F.levenshtein("pa", "pb") <= LEV_MAX)
            .cast("int")
            .alias("verified"),
        )
    )


def q_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bilateral shipping volume between two nations by
    ship year — supplier nation and customer nation both join in, the
    (supp_nation, cust_nation) pair restricted to the two names in
    either direction. Revenue in exact integer 1e-4 units; dims
    broadcast; the fact shuffles only on its join keys."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    s = table(spark, sf_dir, "supplier")
    n1 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    a, b = Q7_NATION_A, Q7_NATION_B
    j = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .filter(
            ((F.col("supp_nation") == a) & (F.col("cust_nation") == b))
            | ((F.col("supp_nation") == b) & (F.col("cust_nation") == a))
        )
    )
    return (
        j.groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
        )
        .agg(
            F.sum(_cents("l_extendedprice") * _pct("l_discount")).alias("rc"),
            F.count("*").alias("n_lines"),
        )
        .select(
            "supp_nation",
            "cust_nation",
            "l_year",
            (F.col("rc") / 10000.0).alias("volume"),
            "n_lines",
        )
    )


_Q7_SQL = f"""
    SELECT supp_nation, cust_nation, l_year,
           sum(rc) / 10000.0 AS volume,
           count(*) AS n_lines
    FROM (
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               year(l_shipdate) AS l_year,
               {_DUCK_CENTS.format(x='l_extendedprice')}
                   * {_DUCK_PCT.format(x='l_discount')} AS rc
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE (n1.n_name = '{{a}}' AND n2.n_name = '{{b}}')
           OR (n1.n_name = '{{b}}' AND n2.n_name = '{{a}}')
    )
    GROUP BY supp_nation, cust_nation, l_year
"""


def q_profit_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit per supplier nation per year for parts
    matching a name token — profit = revenue − retail cost·qty, all in
    exact 1e-4-currency integers (the sf schema has no partsupp, so
    p_retailprice stands in for ps_supplycost; the join/agg shape is
    Q9's). Part filter pushes into the broadcast dim before the fact
    join."""
    li = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    p = table(spark, sf_dir, "part").filter(
        F.col("p_name").contains(Q9_TOKEN)
    )
    n = table(spark, sf_dir, "nation")
    qty = F.round(F.col("l_quantity")).cast("long")
    profit = (
        _cents("l_extendedprice") * _pct("l_discount")
        - _cents("p_retailprice") * qty * 100
    )
    j = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
    )
    return (
        j.groupBy(
            F.col("n_name").alias("nation"),
            F.year("l_shipdate").alias("o_year"),
        )
        .agg(F.sum(profit).alias("pc"), F.count("*").alias("n_lines"))
        .select(
            "nation",
            "o_year",
            (F.col("pc") / 10000.0).alias("profit"),
            "n_lines",
        )
    )


_Q9_SQL = f"""
    SELECT nation, o_year, sum(pc) / 10000.0 AS profit,
           count(*) AS n_lines
    FROM (
        SELECT n_name AS nation, year(l_shipdate) AS o_year,
               {_DUCK_CENTS.format(x='l_extendedprice')}
                   * {_DUCK_PCT.format(x='l_discount')}
               - {_DUCK_CENTS.format(x='p_retailprice')}
                   * CAST(round(l_quantity) AS BIGINT) * 100 AS pc
        FROM lineitem
        JOIN part     ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        WHERE p_name LIKE '%{{tok}}%'
    )
    GROUP BY nation, o_year
"""


QUERIES = {
    "local_volume": q_local_volume,
    "top_supplier": q_top_supplier,
    "small_qty_revenue": q_small_qty_revenue,
    "order_priority": q_order_priority,
    "promo_share": q_promo_share,
    "sole_return_supplier": q_sole_return_supplier,
    "lev_verify": q_lev_verify,
    "nation_volume": q_nation_volume,
    "profit_by_nation": q_profit_by_nation,
}

ORACLES = {
    "local_volume": _Q5_SQL,
    "top_supplier": _Q15_SQL,
    "small_qty_revenue": _Q17_SQL,
    "order_priority": _Q4_SQL,
    "promo_share": _Q14_SQL,
    "sole_return_supplier": _Q21_SQL,
    "nation_volume": _Q7_SQL.format(a=Q7_NATION_A, b=Q7_NATION_B),
    "profit_by_nation": _Q9_SQL.format(tok=Q9_TOKEN),
    # lev_verify's oracle is composed in __spark_entry__ from dedup's
    # bucket CTE (same MinHash band construction) + levenshtein.
}


def _lev_verify_sql() -> str:
    from .dedup import ORACLES as DEDUP_ORACLES

    # reuse the exact candidate-pair SQL so the gate checks THE SAME
    # LSH construction, then add the prefix edit distance on top
    pairs_sql = DEDUP_ORACLES["lsh_pairs"]
    return f"""
        WITH pairs AS ({pairs_sql})
        SELECT doc_a, doc_b,
               levenshtein(substr(da.text, 1, {LEV_PREFIX}),
                           substr(db.text, 1, {LEV_PREFIX}))::BIGINT AS lev,
               (levenshtein(substr(da.text, 1, {LEV_PREFIX}),
                            substr(db.text, 1, {LEV_PREFIX}))
                <= {LEV_MAX})::INT AS verified
        FROM pairs
        JOIN documents da ON da.doc_id = doc_a
        JOIN documents db ON db.doc_id = doc_b
    """


ORACLES["lev_verify"] = _lev_verify_sql()
