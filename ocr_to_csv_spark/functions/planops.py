"""Operational planning, batch 105: partition-layout advice from a
query workload, and watermark-delay planning from the arrival-lateness
distribution — the two decisions an Iceberg/streaming platform team
makes with data, not folklore.

Scale design (100 TB):
- ``layout_advisor``: evaluates three candidate partition layouts
  (month(o_orderdate), year(o_orderdate), bucket16(o_custkey)) against
  a fixed representative workload (three date-range scans, three
  custkey point probes). Everything runs on MANIFESTS — one keyed
  aggregate per layout collapses the table to its partition grain
  (≤ ~84 months / 7 years / 16 buckets) — then a bounded
  manifest × 6-row workload cross (allowlisted metadata tier) counts
  partitions/rows a pruning planner would scan: date layouts prune
  date ranges and scan everything for key probes, the bucket layout
  vice-versa — the trade the advisor makes visible. Extends the
  batch-96 family (compaction_plan/manifest_prune) from one layout's
  health to the layout CHOICE.
- ``watermark_plan``: arrival time is synthesized deterministically
  (delay = event_id·37 % 977 seconds — a skewed-ish long tail); for
  each candidate watermark delay δ the query emits events dropped
  (delay > δ) and the milli capture rate, all exact integers from ONE
  conditional aggregate over the events scan, plus the smallest δ
  meeting the 99% capture SLO (min over qualifying candidates) — the
  number you paste into ``withWatermark``. Complements the streaming
  layer (streaming/windows.py) with its sizing analysis.

Reference parity: no ops layer in the reference; these close the loop
on the repo's own storage (sources/catalog.py write_clustered/
write_bucketed) and streaming (streaming/windows.py) levers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .util import table

# (query_id, kind, lo, hi, key) — the representative workload
WORKLOAD: list[tuple[int, str, str, str, int]] = [
    (1, "date", "1994-01-01", "1994-04-01", -1),
    (2, "date", "1996-06-01", "1997-06-01", -1),
    (3, "date", "1998-01-01", "1998-02-01", -1),
    (4, "key", "", "", 37),
    (5, "key", "", "", 412),
    (6, "key", "", "", 1105),
]
N_BUCKETS = 16
WM_CANDIDATES = [0, 60, 300, 900, 3600]  # seconds
WM_SLO_MILLI = 990  # ≥99.0% capture


def q_layout_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per (layout, query): partitions/rows scanned vs total (module
    doc)."""
    o = table(spark, sf_dir, "orders")
    layouts = {
        "month": F.date_trunc("month", "o_orderdate"),
        "year": F.date_trunc("year", "o_orderdate"),
        "bucket": (F.col("o_custkey") % N_BUCKETS).cast("timestamp"),
    }
    mans = {}
    for name, part in layouts.items():
        mans[name] = o.groupBy(part.alias("pk")).agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("o_orderdate").alias("min_d"),
            F.max("o_orderdate").alias("max_d"),
            F.min("o_custkey").alias("min_k"),
            F.max("o_custkey").alias("max_k"),
        ).withColumn("layout", F.lit(name))
    man = mans["month"].unionByName(mans["year"]).unionByName(mans["bucket"])
    wl = spark.createDataFrame(
        WORKLOAD, "query_id long, kind string, lo string, hi string, key long"
    )
    scanned = F.when(
        F.col("kind") == "date",
        F.when(
            F.col("layout") == "bucket", F.lit(True)
        ).otherwise(
            (F.col("max_d") >= F.col("lo").cast("timestamp"))
            & (F.col("min_d") < F.col("hi").cast("timestamp"))
        ),
    ).otherwise(
        F.when(
            F.col("layout") == "bucket",
            (F.col("key") % N_BUCKETS)
            == F.col("pk").cast("long"),
        ).otherwise(F.lit(True))
    )
    j = man.crossJoin(F.broadcast(wl)).withColumn(
        "scanned", scanned.cast("long")
    )
    return (
        j.groupBy("layout", "query_id")
        .agg(
            F.count(F.lit(1)).alias("parts_total"),
            F.sum("scanned").alias("parts_scanned"),
            F.sum(F.col("scanned") * F.col("n_rows")).alias("rows_scanned"),
            F.sum("n_rows").alias("rows_total"),
        )
        .select(
            "layout",
            "query_id",
            "parts_total",
            "parts_scanned",
            "rows_scanned",
            "rows_total",
            F.floor(
                F.col("rows_scanned") * 1000 / F.col("rows_total")
            ).cast("long").alias("scan_milli"),
        )
        .orderBy("layout", "query_id")
    )


def _workload_sql() -> str:
    rows = ", ".join(
        f"({qid}, '{kind}', '{lo}', '{hi}', {key})"
        for qid, kind, lo, hi, key in WORKLOAD
    )
    return (
        "SELECT * FROM (VALUES " + rows + ") "
        "AS t(query_id, kind, lo, hi, key)"
    )


_LAYOUT_SQL = f"""
WITH man AS (
    SELECT 'month' AS layout, date_trunc('month', o_orderdate) AS pk,
           count(*)::BIGINT AS n_rows,
           min(o_orderdate) AS min_d, max(o_orderdate) AS max_d
    FROM orders GROUP BY 2
    UNION ALL
    SELECT 'year', date_trunc('year', o_orderdate),
           count(*)::BIGINT, min(o_orderdate), max(o_orderdate)
    FROM orders GROUP BY 2
    UNION ALL
    SELECT 'bucket', to_timestamp(o_custkey % {N_BUCKETS}),
           count(*)::BIGINT, min(o_orderdate), max(o_orderdate)
    FROM orders GROUP BY 2
),
wl AS ({_workload_sql()}),
j AS (
    SELECT m.layout, w.query_id, m.n_rows,
           CASE WHEN w.kind = 'date' THEN
                    CASE WHEN m.layout = 'bucket' THEN 1
                         WHEN m.max_d >= CAST(w.lo AS TIMESTAMP)
                          AND m.min_d < CAST(w.hi AS TIMESTAMP)
                         THEN 1 ELSE 0 END
                ELSE
                    CASE WHEN m.layout = 'bucket' THEN
                             CASE WHEN w.key % {N_BUCKETS}
                                       = floor(epoch(m.pk))::BIGINT
                                  THEN 1 ELSE 0 END
                         ELSE 1 END
           END AS scanned
    FROM man m CROSS JOIN wl w
)
SELECT layout, query_id,
       count(*)::BIGINT AS parts_total,
       sum(scanned)::BIGINT AS parts_scanned,
       sum(scanned * n_rows)::BIGINT AS rows_scanned,
       sum(n_rows)::BIGINT AS rows_total,
       CAST(floor(sum(scanned * n_rows) * 1000.0 / sum(n_rows)) AS BIGINT)
           AS scan_milli
FROM j
GROUP BY layout, query_id
ORDER BY layout, query_id
"""


def q_watermark_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per candidate watermark δ: dropped events + capture milli; the
    recommended (smallest SLO-meeting) δ rides every row (module doc)."""
    e = table(spark, sf_dir, "events")
    delay = (F.col("event_id") * 37 % 977).cast("long")
    base = e.select(delay.alias("delay"))
    aggs = [F.count(F.lit(1)).alias("n_events")] + [
        F.sum((F.col("delay") > d).cast("long")).alias(f"late_{d}")
        for d in WM_CANDIDATES
    ]
    one = base.agg(*aggs)
    rows = None
    for d in WM_CANDIDATES:
        r = one.select(
            F.lit(d).cast("long").alias("delta_sec"),
            "n_events",
            F.col(f"late_{d}").alias("n_dropped"),
            F.floor(
                (F.col("n_events") - F.col(f"late_{d}"))
                * 1000
                / F.col("n_events")
            ).cast("long").alias("capture_milli"),
        )
        rows = r if rows is None else rows.unionByName(r)
    ok = rows.filter(F.col("capture_milli") >= WM_SLO_MILLI).agg(
        F.min("delta_sec").alias("recommended_sec")
    )
    return (
        rows.crossJoin(F.broadcast(ok))
        .select(
            "delta_sec",
            "n_events",
            "n_dropped",
            "capture_milli",
            F.coalesce("recommended_sec", F.lit(-1)).cast("long").alias(
                "recommended_sec"
            ),
        )
        .orderBy("delta_sec")
    )


_WM_SQL = f"""
WITH d AS (
    SELECT (event_id * 37 % 977)::BIGINT AS delay FROM events
),
one AS (
    SELECT count(*)::BIGINT AS n_events,
           {", ".join(
               f"sum(CASE WHEN delay > {c} THEN 1 ELSE 0 END)::BIGINT "
               f"AS late_{c}"
               for c in WM_CANDIDATES
           )}
    FROM d
),
rows_ AS (
    {" UNION ALL ".join(
        f"SELECT CAST({c} AS BIGINT) AS delta_sec, n_events, "
        f"late_{c} AS n_dropped, "
        f"CAST(floor((n_events - late_{c}) * 1000.0 / n_events) AS BIGINT) "
        f"AS capture_milli FROM one"
        for c in WM_CANDIDATES
    )}
),
ok AS (
    SELECT min(delta_sec) AS recommended_sec FROM rows_
    WHERE capture_milli >= {WM_SLO_MILLI}
)
SELECT delta_sec, n_events, n_dropped, capture_milli,
       COALESCE(recommended_sec, -1)::BIGINT AS recommended_sec
FROM rows_ CROSS JOIN ok
ORDER BY delta_sec
"""


QUERIES = {
    "layout_advisor": q_layout_advisor,
    "watermark_plan": q_watermark_plan,
}

ORACLES = {
    "layout_advisor": _LAYOUT_SQL,
    "watermark_plan": _WM_SQL,
}
