"""Decision-support join shapes, batch 33: the four TPC-H skeletons
that need the ``partsupp`` table (Q2/Q11/Q16/Q20), which the driver's
synthetic schema does not ship. ``partsupp`` is DERIVED deterministically
from ``lineitem`` — one aggregate, identical in Spark and the DuckDB
oracle — so every join shape is exercised faithfully:

    ps_partkey, ps_suppkey   = the distinct (l_partkey, l_suppkey) pairs
    ps_supplycost_cents      = min(cents(l_extendedprice)) per pair
    ps_availqty              = round(sum(l_quantity)) per pair

With batches 13/19/23 this completes ALL 22 TPC-H query shapes.

Scale design (100 TB):
- The partsupp derivation is ONE map-side-combinable aggregate on
  (partkey, suppkey) — at production scale partsupp is a real table and
  the derivation disappears; every shape below is agnostic to that.
- ``min_cost_supplier`` (Q2): the correlated MIN subquery is
  decorrelated into a (partkey)-grain aggregate joined back on
  (partkey, cost) — two shuffles on the same key, no per-row subquery.
  Region/nation dims broadcast; top-100 is TakeOrderedAndProject.
- ``important_stock`` (Q11): per-part value vs a global-total threshold.
  The total is a 1-row aggregate broadcast against the per-part table
  (documented single-row cross — see tests/test_plan_audit.py);
  the comparison is exact int64 (value·1000 > total), no float drift.
- ``supplier_part_count`` (Q16): the NOT-IN supplier exclusion is a
  broadcast LEFT ANTI join (never a NOT IN scan per row); distinct
  supplier count per (brand, type, size) is a two-level aggregate —
  dedup on the full key first (map-side combinable), then count.
- ``promo_part_suppliers`` (Q20): semi-join chain — parts by name
  prefix → qualifying (part, supp) pairs where stock exceeds twice the
  window's shipped quantity (exact int compare) → LEFT SEMI into
  supplier, nation filter broadcast. Each hop shrinks the data; nothing
  widens. (TPC-H's ``avail > 0.5·shipped`` is vacuous when availqty is
  derived from all-time lineitem sums — all-time ≥ window — so the
  threshold is inverted to the meaningful "excess stock" direction;
  the correlated-half-sum shape is identical.)

Reference parity: the reference has no warehouse layer; these extend
SURVEY.md §2 A/J families exactly as ``tpch.py``/``tpch3.py`` do.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .tpch import _DUCK_CENTS, _cents
from .util import table

Q2_SIZE = 25
Q2_TYPE = "LARGE"
Q2_REGION = "EUROPE"
Q2_TOP = 100
Q11_NATION = "NATION_1"
Q11_SCALE = 1000  # keep parts with value·SCALE > national total
Q16_EXCL_BRAND = "Brand#12"
Q16_EXCL_TYPE = "PROMO"
Q16_SIZES = (1, 7, 14, 21, 28, 35, 42, 49)
Q20_PREFIX = "small"
Q20_NATION = "NATION_2"
Q20_FROM, Q20_TO = "1996-01-01", "1997-01-01"


def _ts(s: str) -> F.Column:
    return F.lit(s).cast("timestamp")


def partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The derived partsupp relation (see module docstring). Exact
    integer cents / quantities so both engines agree bit-for-bit."""
    return (
        table(spark, sf_dir, "lineitem")
        .groupBy(
            F.col("l_partkey").alias("ps_partkey"),
            F.col("l_suppkey").alias("ps_suppkey"),
        )
        .agg(
            F.min(_cents("l_extendedprice")).alias("ps_supplycost_cents"),
            F.round(F.sum("l_quantity")).cast("long").alias("ps_availqty"),
        )
    )


_PS_SQL = f"""
    SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
           min({_DUCK_CENTS.format(x='l_extendedprice')}) AS ps_supplycost_cents,
           CAST(round(sum(l_quantity)) AS BIGINT) AS ps_availqty
    FROM lineitem GROUP BY 1, 2
"""


def q_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2: for each part of one size/type, the supplier(s) in one
    region offering it at that part's regional minimum cost. The
    correlated MIN subquery decorrelates into a partkey-grain aggregate
    joined back on (partkey, cost)."""
    ps = partsupp(spark, sf_dir)
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == Q2_REGION)
    p = table(spark, sf_dir, "part").filter(
        (F.col("p_size") == Q2_SIZE) & (F.col("p_type") == Q2_TYPE)
    )
    # eligible (part, supp, cost) triples: supplier sits in the region
    elig = (
        ps.join(F.broadcast(s), ps.ps_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("ps_partkey", "ps_suppkey", "ps_supplycost_cents",
                "s_name", "s_acctbal", "n_name")
    )
    min_cost = elig.groupBy("ps_partkey").agg(
        F.min("ps_supplycost_cents").alias("min_cost_cents")
    )
    win = elig.join(
        min_cost,
        (elig.ps_partkey == min_cost.ps_partkey)
        & (elig.ps_supplycost_cents == min_cost.min_cost_cents),
    ).drop(min_cost.ps_partkey)
    out = win.join(F.broadcast(p), win.ps_partkey == p.p_partkey).select(
        _cents("s_acctbal").alias("acctbal_cents"),
        "s_name", "n_name",
        F.col("p_partkey").cast("long").alias("p_partkey"),
        "p_name", "ps_supplycost_cents",
    )
    return out.orderBy(
        F.col("acctbal_cents").desc(), F.col("n_name").asc(),
        F.col("s_name").asc(), F.col("p_partkey").asc(),
    ).limit(Q2_TOP)


_Q2_SQL = f"""
    WITH partsupp AS ({_PS_SQL})
    SELECT {_DUCK_CENTS.format(x='s_acctbal')} AS acctbal_cents,
           s_name, n_name, CAST(p_partkey AS BIGINT) AS p_partkey,
           p_name, ps_supplycost_cents
    FROM part, partsupp, supplier, nation, region
    WHERE p_partkey = ps_partkey AND s_suppkey = ps_suppkey
      AND p_size = {Q2_SIZE} AND p_type = '{Q2_TYPE}'
      AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      AND r_name = '{Q2_REGION}'
      AND ps_supplycost_cents = (
          SELECT min(ps2.ps_supplycost_cents)
          FROM partsupp ps2, supplier s2, nation n2, region r2
          WHERE ps2.ps_partkey = p_partkey AND s2.s_suppkey = ps2.ps_suppkey
            AND s2.s_nationkey = n2.n_nationkey
            AND n2.n_regionkey = r2.r_regionkey AND r2.r_name = '{Q2_REGION}'
      )
    ORDER BY acctbal_cents DESC, n_name ASC, s_name ASC, p_partkey ASC
    LIMIT {Q2_TOP}
"""


def q_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11: parts whose stock value within one nation exceeds
    1/Q11_SCALE of that nation's total stock value. Exact integer
    compare (value·SCALE > total) against a broadcast 1-row total."""
    ps = partsupp(spark, sf_dir)
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation").filter(F.col("n_name") == Q11_NATION)
    nat = (
        ps.join(F.broadcast(s), ps.ps_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .select(
            "ps_partkey",
            (F.col("ps_supplycost_cents") * F.col("ps_availqty")).alias("v"),
        )
    )
    per_part = nat.groupBy("ps_partkey").agg(F.sum("v").alias("value_cents"))
    total = nat.agg(F.sum("v").alias("total_cents"))
    return (
        per_part.join(F.broadcast(total))
        .filter(F.col("value_cents") * Q11_SCALE > F.col("total_cents"))
        .select(
            F.col("ps_partkey").cast("long").alias("ps_partkey"),
            "value_cents",
        )
        .orderBy(F.col("value_cents").desc(), F.col("ps_partkey").asc())
    )


_Q11_SQL = f"""
    WITH partsupp AS ({_PS_SQL}),
    nat AS (
        SELECT ps_partkey, ps_supplycost_cents * ps_availqty AS v
        FROM partsupp, supplier, nation
        WHERE ps_suppkey = s_suppkey AND s_nationkey = n_nationkey
          AND n_name = '{Q11_NATION}'
    )
    SELECT CAST(ps_partkey AS BIGINT) AS ps_partkey,
           CAST(sum(v) AS BIGINT) AS value_cents
    FROM nat
    GROUP BY ps_partkey
    HAVING sum(v) * {Q11_SCALE} > (SELECT sum(v) FROM nat)
    ORDER BY value_cents DESC, ps_partkey ASC
"""


def q_supplier_part_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16: how many suppliers can supply parts per
    (brand, type, size), excluding one brand/type, a size IN-list, and
    blacklisted suppliers (negative account balance stands in for
    TPC-H's comment-matched complaints — the schema has no comments).
    NOT IN → broadcast LEFT ANTI; distinct count via two-level agg."""
    ps = partsupp(spark, sf_dir)
    p = table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != Q16_EXCL_BRAND)
        & (F.col("p_type") != Q16_EXCL_TYPE)
        & (F.col("p_size").isin(*Q16_SIZES))
    )
    bad = table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    ok = ps.join(
        F.broadcast(bad), ps.ps_suppkey == bad.s_suppkey, "left_anti"
    )
    pairs = (
        ok.join(F.broadcast(p), ok.ps_partkey == p.p_partkey)
        .select("p_brand", "p_type", "p_size", "ps_suppkey")
        .distinct()
    )
    return (
        pairs.groupBy("p_brand", "p_type", "p_size")
        .agg(F.count("*").alias("supplier_cnt"))
        .select(
            "p_brand", "p_type",
            F.col("p_size").cast("long").alias("p_size"),
            "supplier_cnt",
        )
        .orderBy(
            F.col("supplier_cnt").desc(), F.col("p_brand").asc(),
            F.col("p_type").asc(), F.col("p_size").asc(),
        )
    )


_Q16_SQL = f"""
    WITH partsupp AS ({_PS_SQL})
    SELECT p_brand, p_type, CAST(p_size AS BIGINT) AS p_size,
           count(DISTINCT ps_suppkey) AS supplier_cnt
    FROM partsupp, part
    WHERE p_partkey = ps_partkey
      AND p_brand <> '{Q16_EXCL_BRAND}' AND p_type <> '{Q16_EXCL_TYPE}'
      AND p_size IN {Q16_SIZES}
      AND ps_suppkey NOT IN (
          SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand ASC, p_type ASC, p_size ASC
"""


def q_promo_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20: suppliers in one nation holding excess stock of
    name-prefixed parts — availqty exceeds TWICE the quantity they
    shipped of that part in one year (see module docstring for why the
    threshold direction is inverted vs literal Q20)."""
    ps = partsupp(spark, sf_dir)
    p = table(spark, sf_dir, "part").filter(
        F.col("p_name").startswith(Q20_PREFIX)
    ).select("p_partkey")
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts(Q20_FROM))
        & (F.col("l_shipdate") < _ts(Q20_TO))
    )
    shipped = li.groupBy("l_partkey", "l_suppkey").agg(
        F.round(F.sum("l_quantity")).cast("long").alias("shipped_qty")
    )
    qual = (
        ps.join(F.broadcast(p), ps.ps_partkey == p.p_partkey, "left_semi")
        .join(
            shipped,
            (ps.ps_partkey == shipped.l_partkey)
            & (ps.ps_suppkey == shipped.l_suppkey),
        )
        .filter(F.col("ps_availqty") > F.col("shipped_qty") * 2)
        .select("ps_suppkey")
        .distinct()
    )
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation").filter(F.col("n_name") == Q20_NATION)
    return (
        s.join(qual, s.s_suppkey == qual.ps_suppkey, "left_semi")
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey, "left_semi")
        .select("s_name", _cents("s_acctbal").alias("acctbal_cents"))
        .orderBy(F.col("s_name").asc())
    )


_Q20_SQL = f"""
    WITH partsupp AS ({_PS_SQL})
    SELECT s_name, {_DUCK_CENTS.format(x='s_acctbal')} AS acctbal_cents
    FROM supplier, nation
    WHERE s_nationkey = n_nationkey AND n_name = '{Q20_NATION}'
      AND s_suppkey IN (
          SELECT ps_suppkey FROM partsupp
          WHERE ps_partkey IN (
              SELECT p_partkey FROM part WHERE p_name LIKE '{Q20_PREFIX}%'
          )
          AND ps_availqty > 2 * (
              SELECT CAST(round(sum(l_quantity)) AS BIGINT) FROM lineitem
              WHERE l_partkey = ps_partkey AND l_suppkey = ps_suppkey
                AND l_shipdate >= TIMESTAMP '{Q20_FROM}'
                AND l_shipdate <  TIMESTAMP '{Q20_TO}'
          )
      )
    ORDER BY s_name ASC
"""


QUERIES = {
    "min_cost_supplier": q_min_cost_supplier,
    "important_stock": q_important_stock,
    "supplier_part_count": q_supplier_part_count,
    "promo_part_suppliers": q_promo_part_suppliers,
}

ORACLES = {
    "min_cost_supplier": _Q2_SQL,
    "important_stock": _Q11_SQL,
    "supplier_part_count": _Q16_SQL,
    "promo_part_suppliers": _Q20_SQL,
}
