"""Sequential-pattern mining, batch 95: 2-step pattern support — the
L2 candidate-counting step of GSP/PrefixSpan (which event type is
FOLLOWED BY which, across user journeys), the sequence-aware
counterpart of ``basket_pairs``/``frequent_triples`` (which ignore
order) and ``markov_transitions`` (which only sees ADJACENT steps).

Scale design (100 TB):
- "a then b" for a user ⟺ the user's EARLIEST a precedes their LATEST
  b — so the event stream collapses to ONE (user, type) aggregate of
  (min_pos, max_pos) and the pattern join is a self-equi-join ON
  user_id with a bounded |types|² per-user fan-out (the basket_pairs
  bounded-cart discipline). Support counts are one keyed aggregate;
  nothing quadratic in users or events crosses a shuffle.
- Positions are the (epoch-second, event_id) total order encoded as
  one int64 (sec * 2^20 + event_id — event ids stay < 2^20 per the
  datagen; documented overflow headroom to 2^43 seconds), so the
  precedence test is a single integer comparison, exact in both
  engines.

Reference parity: no sequence-mining layer in the reference; completes
the journey-analytics family (user_paths, markov_transitions,
event_funnel, markov_removal).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .util import table

POS_SHIFT = 1 << 20  # event_id < 2^20 at every sf


def q_seq_patterns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Support of each ordered type pair (a ≠ b): users whose earliest
    a precedes their latest b. Emits (a, b, support, n_users)."""
    e = table(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    pos = (
        F.unix_timestamp("ts").cast("long") * POS_SHIFT
        + F.col("event_id").cast("long")
    )
    per = e.groupBy("user_id", F.col("event_type").alias("typ")).agg(
        F.min(pos).alias("min_pos"), F.max(pos).alias("max_pos")
    )
    n_users = e.select("user_id").distinct().agg(
        F.count(F.lit(1)).alias("n_users")
    )
    a = per.select("user_id", F.col("typ").alias("a"),
                   F.col("min_pos").alias("a_min"))
    b = per.select("user_id", F.col("typ").alias("b"),
                   F.col("max_pos").alias("b_max"))
    pairs = (
        a.join(b, "user_id")
        .filter((F.col("a") != F.col("b")) & (F.col("a_min") < F.col("b_max")))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("support"))
    )
    return pairs.crossJoin(F.broadcast(n_users)).select(
        "a", "b", "support", "n_users"
    )


_SEQ_SQL = f"""
WITH e AS (
    SELECT user_id, event_type,
           CAST(epoch(ts) AS BIGINT) * {POS_SHIFT} + event_id AS pos
    FROM events WHERE user_id IS NOT NULL
),
per AS (
    SELECT user_id, event_type AS typ,
           min(pos) AS min_pos, max(pos) AS max_pos
    FROM e GROUP BY 1, 2
),
nu AS (SELECT count(DISTINCT user_id)::BIGINT AS n_users FROM e),
pairs AS (
    SELECT a.typ AS a, b.typ AS b, count(*)::BIGINT AS support
    FROM per a JOIN per b ON a.user_id = b.user_id
    WHERE a.typ <> b.typ AND a.min_pos < b.max_pos
    GROUP BY 1, 2
)
SELECT a, b, support, n_users FROM pairs CROSS JOIN nu
"""


QUERIES = {
    "seq_patterns": q_seq_patterns,
}

ORACLES = {
    "seq_patterns": _SEQ_SQL,
}
