"""Batch 49: XML quarantine semantics (pinned) and the grid radius
join proven equal to its brute-force semantics on a dense synthetic
point set (boundary cells included)."""

from pyspark.sql import functions as F

from ocr_to_csv_spark.functions.geoops import RADIUS2, q_geo_grid_join
from ocr_to_csv_spark.sources.xml_ingest import read_xml_quarantine


def test_xml_quarantine_semantics(spark, tmp_path):
    p = tmp_path / "f.xml"
    p.write_text(
        "<docs>"
        "<doc><id>1</id><title>a</title><score>1.5</score></doc>"
        "<doc><id>2</id><title>b</title></doc>"  # missing elem → null
        "<doc><id>oops</id><title>c</title><score>2.5</score></doc>"
        "</docs>"
    )
    good, bad = read_xml_quarantine(
        spark, str(p), "id bigint, title string, score double", "doc"
    )
    g = {r["id"]: r for r in good.collect()}
    assert set(g) == {1, 2}
    assert g[2]["score"] is None  # missing element is NOT malformed
    assert bad.count() == 1  # the type-mismatched doc quarantines


def test_geo_grid_join_equals_brute_force(spark, tmp_path):
    # dense synthetic keys → points cover cell boundaries
    spark.createDataFrame(
        [(k, f"c{k}", 0, 0.0, "S") for k in range(400)],
        "c_custkey bigint, c_name string, c_nationkey bigint, "
        "c_acctbal double, c_mktsegment string",
    ).write.parquet(str(tmp_path / "customer.parquet"))
    spark.createDataFrame(
        [(k, f"s{k}", 0, 0.0) for k in range(100)],
        "s_suppkey bigint, s_name string, s_nationkey bigint, "
        "s_acctbal double",
    ).write.parquet(str(tmp_path / "supplier.parquet"))

    got = {
        (r["s_suppkey"], r["c_custkey"], r["dist2"])
        for r in q_geo_grid_join(spark, str(tmp_path)).collect()
    }

    c = spark.read.parquet(str(tmp_path / "customer.parquet")).select(
        "c_custkey",
        (F.col("c_custkey") * 37 % 1000).alias("cx"),
        (F.col("c_custkey") * 91 % 1000).alias("cy"),
    )
    s = spark.read.parquet(str(tmp_path / "supplier.parquet")).select(
        "s_suppkey",
        (F.col("s_suppkey") * 53 % 1000).alias("sx"),
        (F.col("s_suppkey") * 17 % 1000).alias("sy"),
    )
    d2 = (
        (F.col("cx") - F.col("sx")) * (F.col("cx") - F.col("sx"))
        + (F.col("cy") - F.col("sy")) * (F.col("cy") - F.col("sy"))
    )
    brute = {
        (r["s_suppkey"], r["c_custkey"], r["dist2"])
        for r in s.crossJoin(c).withColumn("dist2", d2)
        .filter(F.col("dist2") <= RADIUS2)
        .select("s_suppkey", "c_custkey", "dist2").collect()
    }
    assert got == brute and len(got) >= 5
    # neighbor-cell expansion is exercised: some matched pair spans
    # two different grid cells
    pts_c = {r["c_custkey"]: (r["cx"], r["cy"]) for r in c.collect()}
    pts_s = {r["s_suppkey"]: (r["sx"], r["sy"]) for r in s.collect()}
    assert any(
        (pts_s[sk][0] // 16, pts_s[sk][1] // 16)
        != (pts_c[ck][0] // 16, pts_c[ck][1] // 16)
        for sk, ck, _ in got
    )


def test_geo_grid_plan_has_no_cartesian(spark):
    plan = q_geo_grid_join(spark, "/root/testdata/sf0.001") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan