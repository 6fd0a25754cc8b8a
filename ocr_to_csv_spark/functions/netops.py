"""Network / crawl-operations operators, batch 70: longest-prefix-match
IP classification and largest-remainder crawl-budget apportionment.

Scale design (100 TB):
- ``lpm_join``: classify each event's IPv4 address (derived
  deterministically from the event id hash — 32 bits, the synthetic
  stand-in for a real client-IP column) against a routing/geo table of
  CIDR networks with MIXED prefix lengths, longest prefix wins. The
  scale-right plan is the classic LPM-AS-EQUI-JOIN trick: expand each
  IP to one masked candidate per distinct prefix length in the table
  (|lengths| = 3 here, constant fan-out, map-side) and equi-join on
  (masked_prefix, prefixlen) against the broadcast network table —
  NEVER a range/theta join, which is what a naive BETWEEN lo AND hi
  formulation degenerates to. The winner is one (ip → max prefixlen)
  aggregation joined back by key. Everything is exact int64 bit math.
- ``crawl_budget``: apportion a global fetch budget across hosts
  proportionally to their page counts using the largest-remainder
  (Hamilton) method — the standard way a crawl scheduler turns float
  shares into an integer budget that sums EXACTLY to the total. base =
  floor(B·cnt/total) and the remainder numerator B·cnt mod total are
  exact integers; the leftover slots go to the largest remainders
  (ties by host asc) via one window over the HOST-SIZED aggregate —
  the expensive groupBy is the only full-data pass.

Reference parity: no network layer in the reference; extends the
crawl/web family (``url_hosts``, ``warc_hosts``, ``redirect_resolve``,
``ring_assign``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .util import DUCK_HEX32, hex32, table

# network table: (name, prefix_bits_as_int, prefixlen) — mixed /4, /8,
# /12 over the 32-bit hash space so specificity varies (a /12 inside a
# /8 inside a /4). Values are data-independent constants shared
# verbatim with the DuckDB oracle.
NETWORKS = (
    ("wide-0", 0x0 << 28, 4),  # 0.0.0.0/4
    ("wide-2", 0x2 << 28, 4),  # 32.0.0.0/4
    ("wide-7", 0x7 << 28, 4),
    ("wide-a", 0xA << 28, 4),
    ("mid-08", 0x08 << 24, 8),  # 8.0.0.0/8 (inside wide-0)
    ("mid-2f", 0x2F << 24, 8),  # inside wide-2
    ("mid-a3", 0xA3 << 24, 8),
    ("narrow-084", 0x084 << 20, 12),  # inside mid-08
    ("narrow-2f7", 0x2F7 << 20, 12),
    ("narrow-a3c", 0xA3C << 20, 12),
)
PREFIX_LENS = tuple(sorted({p for _, _, p in NETWORKS}))

CRAWL_BUDGET = 1000
N_HOSTS_MOD = 20


def q_lpm_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest-prefix-match network classification of event IPs;
    per-network hit counts. See module docstring."""
    e = table(spark, sf_dir, "events", spread=True)
    ip = hex32(F.col("event_id").cast("string"))  # 32-bit address
    ips = e.select(ip.alias("ip"))
    # constant fan-out: one masked candidate per distinct prefix length
    cands = ips.select(
        "ip",
        F.explode(
            F.array(*[F.lit(p) for p in PREFIX_LENS])
        ).alias("prefixlen"),
    ).withColumn(
        "prefix",
        # mask the low (32 - len) bits: ip >> (32-len) << (32-len)
        F.expr(
            "CAST(shiftleft(shiftright(ip, 32 - prefixlen),"
            " 32 - prefixlen) AS BIGINT)"
        ),
    )
    nets = spark.createDataFrame(
        [(n, p, l) for n, p, l in NETWORKS],
        "net string, prefix long, prefixlen int",
    )
    hits = cands.join(F.broadcast(nets), ["prefix", "prefixlen"])
    best = hits.groupBy("ip").agg(F.max("prefixlen").alias("prefixlen"))
    matched = hits.join(best, ["ip", "prefixlen"])
    return (
        matched.groupBy("net", "prefixlen")
        .agg(F.count(F.lit(1)).alias("n_ips"))
        .select(
            "net",
            F.col("prefixlen").cast("long").alias("prefixlen"),
            "n_ips",
        )
        .orderBy("net")
    )


_NET_VALUES = ", ".join(f"('{n}', {p}, {l})" for n, p, l in NETWORKS)
_LEN_VALUES = ", ".join(f"({p})" for p in PREFIX_LENS)
_IP = DUCK_HEX32.format(x="CAST(event_id AS VARCHAR)")

_LPM_SQL = f"""
WITH ips AS (SELECT {_IP} AS ip FROM events),
lens(prefixlen) AS (VALUES {_LEN_VALUES}),
nets(net, prefix, prefixlen) AS (VALUES {_NET_VALUES}),
cands AS (
    SELECT i.ip, l.prefixlen,
           (i.ip >> (32 - l.prefixlen)) << (32 - l.prefixlen) AS prefix
    FROM ips i CROSS JOIN lens l
),
hits AS (
    SELECT c.ip, n.net, c.prefixlen
    FROM cands c JOIN nets n
      ON n.prefix = c.prefix AND n.prefixlen = c.prefixlen
),
best AS (SELECT ip, max(prefixlen) AS prefixlen FROM hits GROUP BY ip)
SELECT h.net, CAST(h.prefixlen AS BIGINT) AS prefixlen,
       count(*)::BIGINT AS n_ips
FROM hits h JOIN best b ON b.ip = h.ip AND b.prefixlen = h.prefixlen
GROUP BY h.net, h.prefixlen
ORDER BY h.net
"""


def q_crawl_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Largest-remainder apportionment of CRAWL_BUDGET fetch slots
    across synthetic hosts ∝ page counts. See module docstring."""
    d = table(spark, sf_dir, "documents")
    host = F.concat(
        F.lit("h"),
        (hex32(F.col("doc_id").cast("string")) % N_HOSTS_MOD).cast("string"),
    )
    cnt = d.select(host.alias("host")).groupBy("host").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    tot = Window.partitionBy()
    shares = cnt.select(
        "host",
        "cnt",
        F.sum("cnt").over(tot).alias("total"),
    ).select(
        "host",
        "cnt",
        F.expr(f"{CRAWL_BUDGET} * cnt div total").alias("base"),
        F.expr(f"({CRAWL_BUDGET} * cnt) % total").alias("rem_num"),
    )
    w = Window.orderBy(F.desc("rem_num"), F.asc("host"))
    leftover = F.lit(CRAWL_BUDGET) - F.sum("base").over(tot)
    ranked = shares.select(
        "host",
        "cnt",
        "base",
        "rem_num",
        F.row_number().over(w).cast("long").alias("rk"),
        leftover.alias("leftover"),
    )
    return ranked.select(
        "host",
        "cnt",
        "base",
        "rem_num",
        (F.col("base") + (F.col("rk") <= F.col("leftover")).cast("long")).alias(
            "budget"
        ),
    ).orderBy("host")


_HOST = (
    f"('h' || CAST(({DUCK_HEX32.format(x='CAST(doc_id AS VARCHAR)')})"
    f" % {N_HOSTS_MOD} AS VARCHAR))"
)

_BUDGET_SQL = f"""
WITH cnt AS (
    SELECT {_HOST} AS host, count(*)::BIGINT AS cnt
    FROM documents GROUP BY 1
),
shares AS (
    SELECT host, cnt,
           ({CRAWL_BUDGET} * cnt) // (SELECT sum(cnt) FROM cnt) AS base,
           ({CRAWL_BUDGET} * cnt) % (SELECT sum(cnt) FROM cnt) AS rem_num
    FROM cnt
),
ranked AS (
    SELECT *, CAST(row_number() OVER (ORDER BY rem_num DESC, host ASC)
                   AS BIGINT) AS rk,
           {CRAWL_BUDGET} - (SELECT sum(base) FROM shares) AS leftover
    FROM shares
)
SELECT host, cnt, CAST(base AS BIGINT) AS base,
       CAST(rem_num AS BIGINT) AS rem_num,
       CAST(base + CAST(rk <= leftover AS BIGINT) AS BIGINT) AS budget
FROM ranked
ORDER BY host
"""


QUERIES = {
    "lpm_join": q_lpm_join,
    "crawl_budget": q_crawl_budget,
}

ORACLES = {
    "lpm_join": _LPM_SQL,
    "crawl_budget": _BUDGET_SQL,
}
