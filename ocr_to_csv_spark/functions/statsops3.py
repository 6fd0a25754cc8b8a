"""Statistical operators, batch 60: Kendall rank correlation (exact
pair counting) and a Benford first-digit conformance audit.

Scale design (100 TB):
- ``kendall_tau``: Kendall's tau-a between two per-customer metrics
  (order count vs total spend) inside each market segment. The pair
  enumeration is QUADRATIC BY CONSTRUCTION, so — exactly like
  ``semdedup``'s per-cluster scan — it is confined to a bounded group:
  the ``CAP`` lowest-keyed customers per segment (deterministic, no
  RNG), giving ≤ CAP·(CAP-1)/2 pairs per segment regardless of input
  scale. The pair join is an equi-join on the segment key only, so at
  10^12 rows each segment's capped sample co-locates on one reducer
  and nothing quadratic crosses the shuffle. Concordant / discordant /
  tie counts are exact integers; tau-a = (C - D) / (n(n-1)/2) is one
  IEEE division of exact int64s, bit-identical in both engines. (For
  uncapped exact tau at scale the right algorithm is sort + merge
  inversion counting, O(n log n) — noted here, out of scope.)
- ``benford_audit``: first-significant-digit histogram of order totals
  vs the Benford expectation p(d) = log10(1 + 1/d). Digit extraction
  is exact integer/string math (floor to BIGINT, first character of
  the decimal rendering — never float log10), one map-side projection
  plus a 9-group aggregate. The expected probabilities are computed
  ONCE in Python and embedded as identical literals in the Spark plan
  and the DuckDB oracle, so the per-digit deviation
  (obs - n·p)² / (n·p) is a product/division chain over exact inputs —
  deterministic IEEE arithmetic, no cross-engine libm dependence.
  This is the classic fraud/DQ screen for financial columns.

Reference parity: the reference has no stats layer; these extend the
data-quality surface alongside ``statsops2.py`` (KS, chi²) the way a
curation pipeline audits numeric columns before training.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .util import table

CAP = 100  # customers per segment entering the quadratic pair scan

# Benford expected probabilities, one shared literal per digit.
BENFORD_P = {d: repr(math.log10(1.0 + 1.0 / d)) for d in range(1, 10)}


def q_kendall_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall tau-a per market segment between order count and total
    spend of the CAP lowest-keyed customers (see module docstring)."""
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    per_cust = (
        orders.join(
            F.broadcast(cust.select("c_custkey", "c_mktsegment")),
            orders.o_custkey == cust.c_custkey,
        )
        .groupBy("c_mktsegment", "o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            # exact cents so ties are decided in integer space
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
                "cents"
            ),
        )
    )
    capped = (
        per_cust.withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("c_mktsegment").orderBy("o_custkey")
            ),
        )
        .filter(F.col("rk") <= CAP)
        .select(
            F.col("c_mktsegment").alias("seg"),
            F.col("o_custkey").alias("ck"),
            F.col("n_orders").alias("x"),
            F.col("cents").alias("y"),
        )
    )
    a, b = capped.alias("a"), capped.alias("b")
    pairs = a.join(b, "seg").filter(F.col("a.ck") < F.col("b.ck"))
    sx = F.signum((F.col("a.x") - F.col("b.x")).cast("double"))
    sy = F.signum((F.col("a.y") - F.col("b.y")).cast("double"))
    agg = pairs.groupBy("seg").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum((sx * sy > 0).cast("long")).alias("concordant"),
        F.sum((sx * sy < 0).cast("long")).alias("discordant"),
        F.sum(((sx == 0) | (sy == 0)).cast("long")).alias("ties"),
    )
    return agg.select(
        "seg",
        "n_pairs",
        "concordant",
        "discordant",
        "ties",
        (
            (F.col("concordant") - F.col("discordant")).cast("double")
            / F.col("n_pairs").cast("double")
        ).alias("tau_a"),
    ).orderBy("seg")


_KENDALL_SQL = f"""
WITH per_cust AS (
    SELECT c.c_mktsegment AS seg, o.o_custkey AS ck,
           COUNT(*) AS x,
           SUM(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS y
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY 1, 2
),
capped AS (
    SELECT seg, ck, x, y
    FROM (SELECT *, row_number() OVER (PARTITION BY seg ORDER BY ck) AS rk
          FROM per_cust)
    WHERE rk <= {CAP}
),
pairs AS (
    SELECT a.seg,
           sign(CAST(a.x - b.x AS DOUBLE)) AS sx,
           sign(CAST(a.y - b.y AS DOUBLE)) AS sy
    FROM capped a JOIN capped b ON a.seg = b.seg AND a.ck < b.ck
)
SELECT seg,
       COUNT(*) AS n_pairs,
       CAST(SUM(CAST(sx * sy > 0 AS BIGINT)) AS BIGINT) AS concordant,
       CAST(SUM(CAST(sx * sy < 0 AS BIGINT)) AS BIGINT) AS discordant,
       CAST(SUM(CAST(sx = 0 OR sy = 0 AS BIGINT)) AS BIGINT) AS ties,
       CAST(SUM(CAST(sx * sy > 0 AS BIGINT))
            - SUM(CAST(sx * sy < 0 AS BIGINT)) AS DOUBLE)
           / CAST(COUNT(*) AS DOUBLE) AS tau_a
FROM pairs
GROUP BY seg
ORDER BY seg
"""


def q_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-digit Benford conformance of o_totalprice (module doc)."""
    orders = table(spark, sf_dir, "orders")
    digit = F.substring(
        F.floor(F.col("o_totalprice")).cast("long").cast("string"), 1, 1
    ).cast("long")
    obs = (
        orders.filter(F.col("o_totalprice") >= 1.0)
        .select(digit.alias("digit"))
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("obs"))
    )
    p = F.create_map(
        *[
            x
            for d in range(1, 10)
            for x in (F.lit(d), F.lit(float(BENFORD_P[d])))
        ]
    )
    # total from the 9-row aggregate itself (unpartitioned window over 9
    # rows — no second scan, no driver action)
    out = obs.select(
        "digit",
        "obs",
        F.sum("obs").over(Window.partitionBy()).alias("n_total"),
        p[F.col("digit")].alias("expected_p"),
    )
    exp_cnt = F.col("n_total").cast("double") * F.col("expected_p")
    return out.select(
        "digit",
        "obs",
        "n_total",
        "expected_p",
        (
            (F.col("obs").cast("double") - exp_cnt)
            * (F.col("obs").cast("double") - exp_cnt)
            / exp_cnt
        ).alias("dev"),
    ).orderBy("digit")


_BENFORD_CASE = "CASE digit " + " ".join(
    f"WHEN {d} THEN CAST({BENFORD_P[d]} AS DOUBLE)" for d in range(1, 10)
) + " END"

_BENFORD_SQL = f"""
WITH src AS (
    SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR),
                       1, 1) AS BIGINT) AS digit
    FROM orders WHERE o_totalprice >= 1.0
),
obs AS (SELECT digit, COUNT(*) AS obs FROM src GROUP BY digit),
n AS (SELECT COUNT(*) AS n_total FROM src)
SELECT digit, obs, n.n_total AS n_total,
       {_BENFORD_CASE} AS expected_p,
       (CAST(obs AS DOUBLE) - CAST(n.n_total AS DOUBLE) * ({_BENFORD_CASE}))
       * (CAST(obs AS DOUBLE) - CAST(n.n_total AS DOUBLE) * ({_BENFORD_CASE}))
       / (CAST(n.n_total AS DOUBLE) * ({_BENFORD_CASE})) AS dev
FROM obs CROSS JOIN n
ORDER BY digit
"""


# --- Luhn checksum audit (batch 71) ----------------------------------------
# The other classic financial-column DQ screen next to ``benford_audit``:
# validate account-number check digits with the Luhn algorithm. Account
# numbers are synthesized deterministically from the customer key (the
# modular-arithmetic convention of the link graph): a 10-digit body with
# a CORRECT Luhn check digit, except keys ≡ 0 (mod LUHN_BAD_MOD) whose
# check digit is off by one — the planted corruption the audit must
# count. Validation is a pure expression (fixed 11-digit strings →
# digit array → conditional doubling fold → mod 10), fully map-side;
# the only shuffle is the per-segment count aggregate.

LUHN_BAD_MOD = 7


def _luhn_check_digit(body: str) -> int:
    total = 0
    for pos, ch in enumerate(reversed(body)):  # pos 0 = rightmost body
        v = int(ch)
        if pos % 2 == 0:  # doubled positions once the check digit appends
            v *= 2
            if v > 9:
                v -= 9
        total += v
    return (10 - total % 10) % 10


def q_luhn_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-segment Luhn validity counts over synthesized account
    numbers (see block comment above)."""
    c = table(spark, sf_dir, "customer")
    body = F.lpad(
        ((F.col("c_custkey") * 73 + 11) % 10_000_000_000).cast("string"),
        10,
        "0",
    )
    # correct check digit via the same fold the validator uses
    digits = F.transform(
        F.split(body, ""), lambda ch: ch.cast("int")
    )  # 10 entries, left to right
    # body position p (1-based from left); from the right: pos = 10-p.
    # Doubled when pos % 2 == 0 (rightmost body digit doubles).
    body_sum = F.aggregate(
        F.sequence(F.lit(1), F.lit(10)),
        F.lit(0),
        lambda acc, p: acc
        + F.when(
            (F.lit(10) - p) % 2 == 0,
            F.when(
                F.element_at(digits, p) * 2 > 9,
                F.element_at(digits, p) * 2 - 9,
            ).otherwise(F.element_at(digits, p) * 2),
        ).otherwise(F.element_at(digits, p)),
    )
    check = (F.lit(10) - body_sum % 10) % 10
    planted_bad = F.col("c_custkey") % LUHN_BAD_MOD == 0
    emitted = F.when(planted_bad, (check + 1) % 10).otherwise(check)
    acct = F.concat(body, emitted.cast("string"))
    # validator: full 11-digit Luhn (total including check ≡ 0 mod 10)
    all_digits = F.transform(F.split(acct, ""), lambda ch: ch.cast("int"))
    total = F.aggregate(
        F.sequence(F.lit(1), F.lit(11)),
        F.lit(0),
        lambda acc, p: acc
        + F.when(
            (F.lit(11) - p) % 2 == 1,  # odd distance from right → doubled
            F.when(
                F.element_at(all_digits, p) * 2 > 9,
                F.element_at(all_digits, p) * 2 - 9,
            ).otherwise(F.element_at(all_digits, p) * 2),
        ).otherwise(F.element_at(all_digits, p)),
    )
    valid = (total % 10 == 0).cast("long")
    per = c.select(
        F.col("c_mktsegment").alias("seg"), valid.alias("valid")
    ).groupBy("seg").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("valid").alias("n_valid"),
        (F.count(F.lit(1)) - F.sum("valid")).alias("n_invalid"),
    )
    return per.orderBy("seg")


_LUHN_SQL = f"""
WITH acct AS (
    SELECT c_mktsegment AS seg,
           lpad(CAST((c_custkey * 73 + 11) % 10000000000 AS VARCHAR),
                10, '0') AS body,
           c_custkey AS key
    FROM customer
),
withcheck AS (
    SELECT seg, body, key,
           list_reduce(list_prepend(0, list_transform(range(1, 11),
               p -> CASE WHEN (10 - p) % 2 = 0
                    THEN CASE WHEN CAST(body[p] AS INT) * 2 > 9
                         THEN CAST(body[p] AS INT) * 2 - 9
                         ELSE CAST(body[p] AS INT) * 2 END
                    ELSE CAST(body[p] AS INT) END)),
               (a, b) -> a + b) AS body_sum
    FROM acct
),
emitted AS (
    SELECT seg, body, key,
           CASE WHEN key % {LUHN_BAD_MOD} = 0
                THEN ((10 - body_sum % 10) % 10 + 1) % 10
                ELSE (10 - body_sum % 10) % 10 END AS check_digit
    FROM withcheck
),
validated AS (
    SELECT seg,
           (body || CAST(check_digit AS VARCHAR)) AS acct,
           list_reduce(list_prepend(0, list_transform(range(1, 12),
               p -> CASE WHEN (11 - p) % 2 = 1
                    THEN CASE WHEN CAST((body || CAST(check_digit AS VARCHAR))[p]
                                   AS INT) * 2 > 9
                         THEN CAST((body || CAST(check_digit AS VARCHAR))[p]
                              AS INT) * 2 - 9
                         ELSE CAST((body || CAST(check_digit AS VARCHAR))[p]
                              AS INT) * 2 END
                    ELSE CAST((body || CAST(check_digit AS VARCHAR))[p]
                         AS INT) END)),
               (a, b) -> a + b) AS total
    FROM emitted
)
SELECT seg, count(*) AS n,
       CAST(sum(CAST(total % 10 = 0 AS BIGINT)) AS BIGINT) AS n_valid,
       CAST(count(*) - sum(CAST(total % 10 = 0 AS BIGINT)) AS BIGINT)
           AS n_invalid
FROM validated
GROUP BY seg
ORDER BY seg
"""


QUERIES = {
    "kendall_tau": q_kendall_tau,
    "benford_audit": q_benford_audit,
    "luhn_audit": q_luhn_audit,
}

ORACLES = {
    "kendall_tau": _KENDALL_SQL,
    "benford_audit": _BENFORD_SQL,
    "luhn_audit": _LUHN_SQL,
}
