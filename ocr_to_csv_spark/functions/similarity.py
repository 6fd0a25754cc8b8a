"""Embedding similarity search: brute-force cosine top-k (baseline),
random-hyperplane LSH bucketing and IVF-style assignment (scale paths),
plus embedding-cosine near-dup pairs.

Scale design (100 TB): brute-force top-k is the correctness baseline; the
LSH path hashes each vector to a bucket id (8 deterministic hyperplanes →
256 buckets) so candidate search is an equi-join on bucket, and the IVF
path assigns vectors to their nearest centroid so search probes one
(or a few) centroid partitions. Both paths are pure DataFrame ops.

Parity: dot products / norms are sequential left folds (Spark
``F.aggregate`` == DuckDB ``list_reduce``) so doubles are bit-identical
across engines; hyperplane components derive from md5 so both engines
build the same planes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .util import DUCK_HEX32, hex32, table

DIM = 64
N_PLANES = 8
N_QUERIES = 10
TOP_K = 5
N_CENTROIDS = 5


def _dvec(col) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def _fold_dot(a, b) -> Column:
    """Sequential dot product: acc ← acc + a[i]*b[i], i = 1..DIM."""
    return F.aggregate(
        F.sequence(F.lit(1), F.lit(DIM)),
        F.lit(0.0),
        lambda acc, i: acc + F.element_at(a, i) * F.element_at(b, i),
    )


def _fold_norm(a) -> Column:
    return F.sqrt(
        F.aggregate(
            F.sequence(F.lit(1), F.lit(DIM)),
            F.lit(0.0),
            lambda acc, i: acc + F.element_at(a, i) * F.element_at(a, i),
        )
    )


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "embeddings", spread=True)
    return e.select(
        "vec_id", "label", _dvec(F.col("embedding")).alias("v")
    ).withColumn("nrm", _fold_norm(F.col("v")))


def q_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k: queries = vec_id < N_QUERIES, candidates =
    the rest; rank by rounded sim desc, neighbor id asc."""
    e = _emb(spark, sf_dir)
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
    )
    c = e.filter(F.col("vec_id") >= N_QUERIES).select(
        F.col("vec_id").alias("neighbor_id"), F.col("v").alias("cv"),
        F.col("nrm").alias("cn"),
    )
    sims = q.crossJoin(c).select(
        "query_id",
        "neighbor_id",
        F.round(
            _fold_dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")), 4
        ).alias("sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "rank", "sim")
    )


def q_embed_near_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup: top-20 most-similar distinct pairs."""
    e = _emb(spark, sf_dir)
    a = e.select(F.col("vec_id").alias("a"), F.col("v").alias("av"), F.col("nrm").alias("an"))
    b = e.select(F.col("vec_id").alias("b"), F.col("v").alias("bv"), F.col("nrm").alias("bn"))
    pairs = (
        a.crossJoin(b)
        .filter(F.col("a") < F.col("b"))
        .select(
            "a",
            "b",
            F.round(
                _fold_dot(F.col("av"), F.col("bv")) / (F.col("an") * F.col("bn")), 4
            ).alias("sim"),
        )
    )
    return pairs.orderBy(F.desc("sim"), F.asc("a"), F.asc("b")).limit(20)


def _plane_component(j: Column, k: Column) -> Column:
    """Deterministic pseudo-random hyperplane component in [-1, 1):
    (md5-int(j ',' k) mod 2001 - 1000) / 1000."""
    h = hex32(F.concat_ws(",", j.cast("string"), k.cast("string")))
    return (h % 2001 - 1000) / F.lit(1000.0)


def _ann_buckets(e: DataFrame) -> DataFrame:
    """(vec_id, bucket): 8 hyperplane sign bits → bucket id 0..255."""
    planes = e.select(
        "vec_id", "v", F.explode(F.sequence(F.lit(0), F.lit(N_PLANES - 1))).alias("j")
    )
    dots = planes.select(
        "vec_id",
        "j",
        F.aggregate(
            F.sequence(F.lit(1), F.lit(DIM)),
            F.lit(0.0),
            lambda acc, k: acc
            + F.element_at(F.col("v"), k) * _plane_component(F.col("j"), k),
        ).alias("dot"),
    )
    return dots.groupBy("vec_id").agg(
        F.sum(
            F.when(
                F.col("dot") > 0, F.pow(F.lit(2.0), F.col("j")).cast("long")
            ).otherwise(F.lit(0))
        ).alias("bucket")
    )


def q_ann_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH: 8 sign bits → bucket id; bucket histogram.
    At scale, search = equi-join on bucket (q_ann_lsh_search)."""
    return _ann_buckets(_emb(spark, sf_dir)).groupBy("bucket").agg(
        F.count("*").alias("n")
    )


def _lsh_qc(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    """Bucketed (query, candidate) split shared by the single-probe and
    multi-probe LSH search paths."""
    e = _emb(spark, sf_dir)
    b = _ann_buckets(e)
    eb = e.join(b, "vec_id")
    q = eb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv"),
        F.col("nrm").alias("qn"), F.col("bucket").alias("qb"),
    )
    c = eb.filter(F.col("vec_id") >= N_QUERIES).select(
        F.col("vec_id").alias("cand_id"), F.col("v").alias("cv"),
        F.col("nrm").alias("cn"), F.col("bucket").alias("cb"),
    )
    return q, c


def q_ann_lsh_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN search via the LSH buckets — the lookup half of the LSH path
    (mirrors q_ivf_search): each query (vec_id < N_QUERIES) probes ONLY
    the candidates hashed to its own bucket (equi-join on bucket — cost
    O(N/256) per query instead of O(N)), then ranks them by cosine.
    Queries whose bucket holds no candidates return no rows — the recall
    trade single-probe LSH makes; ``q_ann_lsh_multiprobe`` is the tuned
    variant (own bucket + Hamming-1 neighbors)."""
    q, c = _lsh_qc(spark, sf_dir)
    sims = q.join(c, q.qb == c.cb).select(
        "query_id",
        "cand_id",
        F.round(
            _fold_dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")), 4
        ).alias("sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("cand_id"))
    return (
        sims.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("query_id", "cand_id", "rk", "sim")
    )


def q_ann_lsh_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe LSH search: each query probes its own bucket PLUS the
    N_PLANES Hamming-1 neighbor buckets (one sign bit flipped) — the
    standard recall lever that avoids building more hash tables. Still a
    pure equi-join on bucket id (the probe list explodes the QUERY side
    9×, never the candidates), so per-query cost is O(9·N/256) instead
    of O(N); ``q_ann_recall`` measures the recall lift vs single-probe.
    A candidate hashes to exactly one bucket and probe buckets are
    distinct, so no pair dedup is needed."""
    q, c = _lsh_qc(spark, sf_dir)
    probes = q.select(
        "query_id", "qv", "qn",
        F.explode(
            F.array(
                F.col("qb"),
                *[
                    F.col("qb").bitwiseXOR(F.lit(1 << i)).cast("long")
                    for i in range(N_PLANES)
                ],
            )
        ).alias("pb"),
    )
    sims = probes.join(c, probes.pb == c.cb).select(
        "query_id",
        "cand_id",
        F.round(
            _fold_dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")), 4
        ).alias("sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("cand_id"))
    return (
        sims.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("query_id", "cand_id", "rk", "sim")
    )


def q_ivf_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF coarse quantizer: assign every non-centroid vector to its
    nearest of N_CENTROIDS seed centroids (vec_id 0..4) by cosine."""
    e = _emb(spark, sf_dir)
    cent = e.filter(F.col("vec_id") < N_CENTROIDS).select(
        F.col("vec_id").alias("centroid"), F.col("v").alias("cv"),
        F.col("nrm").alias("cn"),
    )
    rest = e.filter(F.col("vec_id") >= N_CENTROIDS).select(
        "vec_id", F.col("v").alias("rv"), F.col("nrm").alias("rn")
    )
    sims = rest.crossJoin(F.broadcast(cent)).select(
        "vec_id",
        "centroid",
        F.round(
            _fold_dot(F.col("rv"), F.col("cv")) / (F.col("rn") * F.col("cn")), 4
        ).alias("sim"),
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("sim"), F.asc("centroid"))
    return (
        sims.withColumn("rn_", F.row_number().over(w))
        .filter(F.col("rn_") == 1)
        .select("vec_id", "centroid", "sim")
    )


def q_embed_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding stats (norm distribution sanity)."""
    e = _emb(spark, sf_dir)
    return e.groupBy("label").agg(
        F.count("*").alias("n"),
        F.round(F.avg(F.round(F.col("nrm"), 6)), 3).alias("avg_norm"),
    )




def q_ivf_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage IVF ANN search: each query probes its nearest centroid,
    then ranks only that centroid's members — the search cost drops from
    O(N) to O(N / n_centroids) per query, the IVF scale path. Candidate
    lists come from q_ivf_assign; queries are vectors 5..14."""
    e = _emb(spark, sf_dir)
    assign = q_ivf_assign(spark, sf_dir).select("vec_id", "centroid")

    queries = (
        e.filter((F.col("vec_id") >= N_CENTROIDS) & (F.col("vec_id") < 15))
        .join(assign, "vec_id")
        .select(
            F.col("vec_id").alias("query_id"), F.col("v").alias("qv"),
            F.col("nrm").alias("qn"), F.col("centroid").alias("qc"),
        )
    )
    cands = (
        e.filter(F.col("vec_id") >= 15)
        .join(assign, "vec_id")
        .select(
            F.col("vec_id").alias("cand_id"), F.col("v").alias("cv"),
            F.col("nrm").alias("cn"), F.col("centroid").alias("cc"),
        )
    )
    sims = queries.join(cands, queries.qc == cands.cc).select(
        "query_id",
        "cand_id",
        F.round(
            _fold_dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")), 4
        ).alias("sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("cand_id"))
    return (
        sims.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("query_id", "cand_id", "rk", "sim")
    )


def q_ivf_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF search with nprobe=2: each query probes its TWO nearest
    centroids' member lists instead of one — the standard IVF recall
    lever (FAISS ``nprobe``), costing 2·O(N/n_centroids) per query.
    Only the 10-row query side explodes to (query, probe-centroid)
    pairs; the candidate assignment stays exactly one centroid per
    vector, so the probe is still a pure equi-join on centroid id."""
    e = _emb(spark, sf_dir)
    assign = q_ivf_assign(spark, sf_dir).select("vec_id", "centroid")

    cent = e.filter(F.col("vec_id") < N_CENTROIDS).select(
        F.col("vec_id").alias("centroid"), F.col("v").alias("cv"),
        F.col("nrm").alias("cn"),
    )
    qside = e.filter(
        (F.col("vec_id") >= N_CENTROIDS) & (F.col("vec_id") < 15)
    ).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
    )
    qc = qside.crossJoin(F.broadcast(cent)).select(
        "query_id", "qv", "qn", "centroid",
        F.round(
            _fold_dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")), 4
        ).alias("csim"),
    )
    wq = Window.partitionBy("query_id").orderBy(F.desc("csim"), F.asc("centroid"))
    probes = (
        qc.withColumn("pn", F.row_number().over(wq))
        .filter(F.col("pn") <= 2)
        .select("query_id", "qv", "qn", F.col("centroid").alias("qc"))
    )
    cands = (
        e.filter(F.col("vec_id") >= 15)
        .join(assign, "vec_id")
        .select(
            F.col("vec_id").alias("cand_id"), F.col("v").alias("cv"),
            F.col("nrm").alias("cn"), F.col("centroid").alias("cc"),
        )
    )
    sims = probes.join(cands, probes.qc == cands.cc).select(
        "query_id",
        "cand_id",
        F.round(
            _fold_dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")), 4
        ).alias("sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("cand_id"))
    return (
        sims.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("query_id", "cand_id", "rk", "sim")
    )


def cosine_topk_fast(spark: SparkSession, sf_dir: str, k: int = TOP_K) -> DataFrame:
    """PRODUCTION cosine top-k kernel: one numpy matmul per Arrow batch.

    The fold-based ``q_cosine_topk`` exists for bit-exact DuckDB oracle
    parity (a 64-term Catalyst expression tree per pair); this is the
    path a 100 TB job runs: the query matrix is broadcast, each
    candidate batch does a single float64 ``Q @ C.T``, and only the
    per-batch top-k survive into the final window — the shuffle carries
    O(n_queries · k · n_batches) rows instead of O(n_queries · n_cands).
    Results match q_cosine_topk (same data, same rounding); summation
    order differs (pairwise vs sequential), so this variant is benched
    and regression-tested rather than hash-compared."""
    import numpy as np
    import pandas as pd

    e = table(spark, sf_dir, "embeddings", spread=True)
    q_rows = (
        e.filter(F.col("vec_id") < N_QUERIES)
        .select("vec_id", "embedding")
        .collect()
    )  # query side is tiny by construction — broadcast it
    qids = np.array([r["vec_id"] for r in q_rows], dtype=np.int64)
    Q = np.array([r["embedding"] for r in q_rows], dtype=np.float64)
    Qn = np.linalg.norm(Q, axis=1)
    bc = spark.sparkContext.broadcast((qids, Q, Qn))

    def batches(it):
        qids, Q, Qn = bc.value
        empty = pd.DataFrame(
            {
                "query_id": pd.Series([], dtype="int64"),
                "neighbor_id": pd.Series([], dtype="int64"),
                "sim": pd.Series([], dtype="float64"),
            }
        )
        for pdf in it:
            pdf = pdf[pdf["vec_id"] >= N_QUERIES]
            if len(pdf) == 0:
                yield empty
                continue
            C = np.array(pdf["embedding"].tolist(), dtype=np.float64)
            cids = pdf["vec_id"].to_numpy(dtype=np.int64)
            Cn = np.linalg.norm(C, axis=1)
            S = (Q @ C.T) / (Qn[:, None] * Cn[None, :])
            kk = min(k, S.shape[1])
            # per-batch partial top-k (map-side combine for the ranking)
            idx = np.argpartition(-S, kk - 1, axis=1)[:, :kk]
            rows_q = np.repeat(qids, kk)
            rows_c = cids[idx].ravel()
            rows_s = np.take_along_axis(S, idx, axis=1).ravel()
            yield pd.DataFrame(
                {"query_id": rows_q, "neighbor_id": rows_c,
                 "sim": np.round(rows_s, 4)}
            )

    part = e.select("vec_id", "embedding").mapInPandas(
        batches, schema="query_id long, neighbor_id long, sim double"
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        part.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "sim")
    )


KM_K = 5
KM_ITERS = 3
KM_SCALE = 1000


def q_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterative Lloyd k-means over INTEGER-quantized embeddings — the
    iterative-algorithm class (MLlib-style driver loop: tiny centroid
    state collected + broadcast each round, assignments stay distributed).

    Oracle-checkable BY CONSTRUCTION, unlike float k-means: vectors are
    quantized to int64 (round(x*1000)), so squared distances are exact
    integer sums (order-independent), and centroid updates use
    floor(int_sum / count) via one IEEE double division (bit-identical
    in any engine). The DuckDB oracle unrolls the same 3 iterations.
    Output: per-centroid member count + exact integer inertia +
    centroid checksum."""
    final, cents = _kmeans_final_assign(spark, sf_dir)
    checksums = {
        cid: sum(abs(x) for x in c) % 1_000_000_007
        for cid, c in cents.items()
    }
    chk = F.create_map(
        *[F.lit(v_) for kv in checksums.items() for v_ in kv]
    )
    return final.groupBy("cid").agg(
        F.count("*").alias("n_members"),
        F.sum("dist").alias("inertia"),
    ).withColumn("centroid_checksum", chk[F.col("cid")]).select(
        "cid", "n_members", "inertia", "centroid_checksum"
    )


def _kmeans_final_assign(spark: SparkSession, sf_dir: str):
    """Shared Lloyd driver loop: returns (final assignment DataFrame
    (vec_id, cid, dist), final centroid dict) — consumed by q_kmeans
    (inertia/checksum rollup) and q_cluster_purity (label eval)."""
    e = table(spark, sf_dir, "embeddings", spread=True)
    v = e.select(
        "vec_id",
        F.transform(
            "embedding", lambda x: F.round(x * KM_SCALE).cast("long")
        ).alias("v"),
    )
    # deterministic init: centroids = vectors 0..K-1
    cents = {
        r["vec_id"]: list(r["v"])
        for r in v.filter(F.col("vec_id") < KM_K).collect()
    }

    def assign(cent_map):
        # broadcast the tiny centroid table; exact integer squared-L2
        # fold; argmin with centroid-id tie-break (ivf_assign idiom)
        cdf = spark.createDataFrame(
            [(int(cid), [int(x) for x in c]) for cid, c in sorted(cent_map.items())],
            "cid int, c array<bigint>",
        )
        diff = lambda i: F.element_at(F.col("v"), i) - F.element_at(F.col("c"), i)
        dist = F.aggregate(
            F.sequence(F.lit(1), F.lit(DIM)),
            F.lit(0).cast("long"),
            lambda acc, i: acc + diff(i) * diff(i),
        )
        d = v.crossJoin(F.broadcast(cdf)).select(
            "vec_id", "v", "cid", dist.alias("dist")
        )
        w = Window.partitionBy("vec_id").orderBy(F.asc("dist"), F.asc("cid"))
        return (
            d.withColumn("rn_", F.row_number().over(w))
            .filter(F.col("rn_") == 1)
            .drop("rn_")
        )

    import math

    for _ in range(KM_ITERS):
        upd = (
            assign(cents)
            .select("cid", F.posexplode("v").alias("d", "x"))
            .groupBy("cid", "d")
            .agg(F.sum("x").alias("s"), F.count("*").alias("n"))
            .collect()
        )
        new_cents = {}
        for r in upd:
            new_cents.setdefault(r["cid"], [0] * DIM)[r["d"]] = int(
                math.floor(r["s"] / r["n"])
            )
        # a centroid that lost every member keeps its previous position
        for cid in cents:
            if cid not in new_cents:
                new_cents[cid] = cents[cid]
        cents = new_cents

    return assign(cents).select("vec_id", "cid", "dist"), cents


SD_K = 8  # semantic-dedup clusters (centroids = vectors 0..SD_K-1)
SD_T = 1_300_000  # integer squared-L2 near-duplicate threshold


def q_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023): cluster
    embeddings, then find near-duplicate pairs ONLY within each cluster
    and drop the pair member farther from its centroid.

    The scale story is the whole point: the pairwise comparison is an
    equi-join on the cluster id, never a corpus crossJoin — quadratic
    cost is confined inside one cluster, and k grows with the corpus so
    cluster sizes stay bounded (at 100 TB: k ~ sqrt(N) k-means via
    q_kmeans's loop, per-cluster pair scan as a chunked numpy matmul in
    applyInPandas if clusters exceed expression-join comfort). Exactness
    by construction, like q_kmeans: integer-quantized vectors, exact
    integer squared-L2 (order-independent sums), deterministic
    keep/drop rule (farther-from-centroid loses; tie → larger vec_id).
    Analogue of the reference's duplicate-name demotion (sanity.py:12-36)
    lifted to embedding space."""
    e = table(spark, sf_dir, "embeddings", spread=True)
    v = e.select(
        "vec_id",
        F.transform(
            "embedding", lambda x: F.round(x * KM_SCALE).cast("long")
        ).alias("v"),
    )
    cdf = (
        v.filter(F.col("vec_id") < SD_K)
        .select(F.col("vec_id").alias("cid"), F.col("v").alias("c"))
    )
    diff = lambda i: F.element_at(F.col("v"), i) - F.element_at(F.col("c"), i)
    dc = F.aggregate(
        F.sequence(F.lit(1), F.lit(DIM)),
        F.lit(0).cast("long"),
        lambda acc, i: acc + diff(i) * diff(i),
    )
    w = Window.partitionBy("vec_id").orderBy(F.asc("dc"), F.asc("cid"))
    assigned = (
        v.crossJoin(F.broadcast(cdf))
        .select("vec_id", "v", "cid", dc.alias("dc"))
        .withColumn("rn_", F.row_number().over(w))
        .filter(F.col("rn_") == 1)
        .drop("rn_")
    )
    a = assigned.select(
        F.col("cid"),
        F.col("vec_id").alias("ia"),
        F.col("v").alias("va"),
        F.col("dc").alias("da"),
    )
    b = assigned.select(
        F.col("cid"),
        F.col("vec_id").alias("ib"),
        F.col("v").alias("vb"),
        F.col("dc").alias("db"),
    )
    pdiff = lambda i: F.element_at(F.col("va"), i) - F.element_at(F.col("vb"), i)
    d2 = F.aggregate(
        F.sequence(F.lit(1), F.lit(DIM)),
        F.lit(0).cast("long"),
        lambda acc, i: acc + pdiff(i) * pdiff(i),
    )
    pairs = (
        a.join(b, "cid")  # equi-join on cluster id: the SemDeDup trick
        .filter(F.col("ia") < F.col("ib"))
        .select("cid", "ia", "ib", "da", "db", d2.alias("d2"))
        .filter(F.col("d2") <= SD_T)
    )
    loser = F.when(
        (F.col("da") > F.col("db"))
        | ((F.col("da") == F.col("db")) & (F.col("ia") > F.col("ib"))),
        F.col("ia"),
    ).otherwise(F.col("ib"))
    dropped = pairs.select("cid", loser.alias("loser")).distinct()
    members = assigned.groupBy("cid").agg(F.count("*").alias("n_members"))
    np_ = pairs.groupBy("cid").agg(F.count("*").alias("n_pairs"))
    nd = dropped.groupBy("cid").agg(F.count("*").alias("n_dropped"))
    return (
        members.join(np_, "cid", "left")
        .join(nd, "cid", "left")
        .select(
            "cid",
            "n_members",
            F.coalesce("n_pairs", F.lit(0)).alias("n_pairs"),
            F.coalesce("n_dropped", F.lit(0)).alias("n_dropped"),
            (F.col("n_members") - F.coalesce("n_dropped", F.lit(0))).alias(
                "n_survivors"
            ),
        )
    )


# --- product quantization (PQ): 64-dim vectors → M=4 subspaces of 16
# dims, K=8 codewords each → a 4-byte code per vector. The memory-
# compression ANN path: at 100 TB the candidate set stores codes, not
# floats, and search is a broadcast lookup-table join (ADC), never a
# per-pair vector fold. Codebooks are init-by-selection (subvectors of
# vec_id 0..K-1, the q_kmeans init idiom) so the whole construction is
# integer-exact and DuckDB-oracle-checkable.
PQ_M = 4
PQ_SUB = 16
PQ_K = 8
PQ_SCALE = 1000


def _pq_subdist(a: Column, b: Column) -> Column:
    """Exact integer squared-L2 over one PQ_SUB-dim subvector."""
    diff = lambda i: F.element_at(a, i) - F.element_at(b, i)
    return F.aggregate(
        F.sequence(F.lit(1), F.lit(PQ_SUB)),
        F.lit(0).cast("long"),
        lambda acc, i: acc + diff(i) * diff(i),
    )


def _pq_subvectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, s, sv): integer-quantized 16-dim subvector per subspace."""
    e = table(spark, sf_dir, "embeddings", spread=True)
    qv = F.transform(
        "embedding", lambda x: F.round(x * PQ_SCALE).cast("long")
    )
    return (
        e.select("vec_id", qv.alias("v"))
        .select(
            "vec_id",
            F.explode(F.sequence(F.lit(0), F.lit(PQ_M - 1))).alias("s"),
            F.col("v"),
        )
        .select(
            "vec_id",
            "s",
            F.slice("v", F.col("s") * PQ_SUB + 1, PQ_SUB).alias("sv"),
        )
    )


def _pq_assign(subs: DataFrame) -> DataFrame:
    """(vec_id, s, code, dist): nearest codeword per subspace, smaller-j
    tie-break. The codebook (M*K = 32 subvectors) is broadcast; the
    argmin is the ivf_assign window idiom."""
    cb = subs.filter(F.col("vec_id") < PQ_K).select(
        F.col("vec_id").cast("int").alias("j"),
        F.col("s").alias("cs"),
        F.col("sv").alias("cv"),
    )
    d = subs.join(F.broadcast(cb), subs.s == cb.cs).select(
        "vec_id", "s", "j", _pq_subdist(F.col("sv"), F.col("cv")).alias("dist")
    )
    w = Window.partitionBy("vec_id", "s").orderBy(F.asc("dist"), F.asc("j"))
    return (
        d.withColumn("rn_", F.row_number().over(w))
        .filter(F.col("rn_") == 1)
        .select("vec_id", "s", F.col("j").alias("code"), "dist")
    )


def q_pq_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ encoding: each vector compressed to PQ_M codebook indices plus
    its total quantization distortion (exact integer). At scale this runs
    once per ingest and shrinks the ANN candidate store by ~64x (4 bytes
    vs 64 floats); the shuffle is only (vec_id, s, int) rows."""
    best = _pq_assign(_pq_subvectors(spark, sf_dir))
    return best.groupBy("vec_id").agg(
        *[
            F.max(F.when(F.col("s") == i, F.col("code")))
            .cast("int")
            .alias(f"code{i}")
            for i in range(PQ_M)
        ],
        F.sum("dist").alias("distortion"),
    )


def q_pq_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ asymmetric-distance (ADC) top-k search: the query keeps its full
    subvectors, candidates keep only their codes, and the per-pair
    distance is a SUM OF TABLE LOOKUPS — a broadcast equi-join on
    (subspace, code) against the query's M*K-entry distance table,
    followed by a keyed sum and per-query top-k window. No per-pair
    vector fold anywhere: at 10^12 candidates the join input is 4 narrow
    integer rows per candidate, which is the entire point of PQ."""
    subs = _pq_subvectors(spark, sf_dir)
    cand = (
        _pq_assign(subs)
        .filter(F.col("vec_id") >= N_QUERIES)
        .select(F.col("vec_id").alias("neighbor_id"), "s", "code")
    )
    qsubs = subs.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("s").alias("qs"), "sv"
    )
    cb = subs.filter(F.col("vec_id") < PQ_K).select(
        F.col("vec_id").cast("int").alias("j"),
        F.col("s").alias("cs"),
        F.col("sv").alias("cv"),
    )
    lut = qsubs.join(F.broadcast(cb), qsubs.qs == cb.cs).select(
        "query_id",
        F.col("qs").alias("s"),
        "j",
        _pq_subdist(F.col("sv"), F.col("cv")).alias("d"),
    )
    adc = (
        cand.join(F.broadcast(lut), ["s"])
        .filter(F.col("code") == F.col("j"))
        .groupBy("query_id", "neighbor_id")
        .agg(F.sum("d").alias("adc_dist"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.asc("adc_dist"), F.asc("neighbor_id")
    )
    return (
        adc.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "rank", "adc_dist")
    )


def q_ivfpq_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ composed index (the FAISS ``IndexIVFPQ`` shape): the IVF
    coarse quantizer restricts each query to its own cluster's members,
    and distance WITHIN the cluster is PQ asymmetric-distance (ADC) over
    4-byte codes — so per-query cost is O(N/n_centroids) lookups of
    integer table entries, never a float fold over 10^12 candidates.
    Composition of the two oracle-checked halves: cluster membership
    from q_ivf_assign, codes/LUT from the q_pq_search machinery, the
    cluster restriction expressed as one extra equi-join key (cc = qc)
    on the already-broadcast LUT. Codes quantize the raw vector rather
    than the residual (FAISS encodes residuals) — the simplification
    that keeps the whole construction integer-exact and
    DuckDB-checkable; the plan shape is identical either way."""
    assign = q_ivf_assign(spark, sf_dir).select("vec_id", "centroid")
    subs = _pq_subvectors(spark, sf_dir)
    cand = (
        _pq_assign(subs)
        .filter(F.col("vec_id") >= 15)
        .join(assign, "vec_id")
        .select(
            F.col("vec_id").alias("neighbor_id"), "s", "code",
            F.col("centroid").alias("cc"),
        )
    )
    qsubs = (
        subs.filter(
            (F.col("vec_id") >= N_CENTROIDS) & (F.col("vec_id") < 15)
        )
        .join(assign, "vec_id")
        .select(
            F.col("vec_id").alias("query_id"), F.col("s").alias("qs"),
            "sv", F.col("centroid").alias("qc"),
        )
    )
    cb = subs.filter(F.col("vec_id") < PQ_K).select(
        F.col("vec_id").cast("int").alias("j"),
        F.col("s").alias("cs"),
        F.col("sv").alias("cv"),
    )
    lut = qsubs.join(F.broadcast(cb), qsubs.qs == cb.cs).select(
        "query_id",
        F.col("qs").alias("ls"),
        "j",
        "qc",
        _pq_subdist(F.col("sv"), F.col("cv")).alias("dq"),
    )
    adc = (
        cand.join(
            F.broadcast(lut),
            (F.col("s") == F.col("ls"))
            & (F.col("code") == F.col("j"))
            & (F.col("cc") == F.col("qc")),
        )
        .groupBy("query_id", "neighbor_id")
        .agg(F.sum("dq").alias("adc_dist"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.asc("adc_dist"), F.asc("neighbor_id")
    )
    return (
        adc.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("query_id", "neighbor_id", "rank", "adc_dist")
    )


def q_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN quality audit: recall of each approximate search path against
    the brute-force cosine ground truth over the same query/candidate
    split — PQ top-5 vs exact top-5, LSH-bucket top-3 vs exact top-3.
    This is the evaluation loop a production ANN deployment runs after
    every index rebuild; low recall says raise nprobe / bands / codebook
    size before shipping. Pure DataFrame composition of the existing
    oracle-checked queries: two semi-joins + tiny aggregates."""
    exact = q_cosine_topk(spark, sf_dir)
    e5 = exact.select("query_id", "neighbor_id")
    e3 = exact.filter(F.col("rank") <= 3).select("query_id", "neighbor_id")
    pq = q_pq_search(spark, sf_dir).select("query_id", "neighbor_id")
    lsh = q_ann_lsh_search(spark, sf_dir).select(
        "query_id", F.col("cand_id").alias("neighbor_id")
    )
    lsh_mp = q_ann_lsh_multiprobe(spark, sf_dir).select(
        "query_id", F.col("cand_id").alias("neighbor_id")
    )

    def row(method: str, approx: DataFrame, truth: DataFrame) -> DataFrame:
        hits = approx.join(
            truth, ["query_id", "neighbor_id"], "left_semi"
        ).agg(F.count("*").alias("n_hits"))
        tot = truth.agg(F.count("*").alias("n_expected"))
        return hits.crossJoin(tot).select(
            F.lit(method).alias("method"),
            "n_hits",
            "n_expected",
            F.round(F.col("n_hits") / F.col("n_expected"), 4).alias("recall"),
        )

    return (
        row("pq_top5", pq, e5)
        .unionByName(row("lsh_top3", lsh, e3))
        .unionByName(row("lsh_mp_top3", lsh_mp, e3))
    )


SQ_LEVELS = 255


def _sq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, dim, code, recon): int8-range scalar quantization of every
    embedding dimension against the corpus-wide per-dimension min/max.

    All math is integer-exact: vectors are first snapped to the PQ_SCALE
    integer grid (the pq_encode idiom), the 64-row (dim, min, range) stats
    table is computed by one tiny groupBy and broadcast back, and the code
    is ``floor((q - mn) * 255 / range)`` — numerator and denominator are
    exact int64 well inside 2^53, so the double division floors
    identically in Spark and DuckDB. ``recon`` is the dequantized value
    scaled by 255 (``mn*255 + code*range``), also exact int64, so ADC
    search never touches floats. At 100 TB the stats pass is one partial
    agg to 64 rows and the encode pass is map-side; codes are 1 byte/dim
    (8x smaller than float32), which is the point."""
    e = table(spark, sf_dir, "embeddings", spread=True)
    qv = F.transform("embedding", lambda x: F.round(x * PQ_SCALE).cast("long"))
    rows = e.select("vec_id", qv.alias("v")).select(
        "vec_id", F.posexplode("v").alias("dim", "q")
    )
    rng = (
        rows.groupBy("dim")
        .agg(F.min("q").alias("mn"), F.max("q").alias("mx"))
        .select(
            "dim", "mn",
            F.greatest(F.col("mx") - F.col("mn"), F.lit(1)).alias("rg"),
        )
    )
    j = rows.join(F.broadcast(rng), "dim")
    code = F.least(
        F.lit(SQ_LEVELS),
        F.floor((F.col("q") - F.col("mn")) * SQ_LEVELS / F.col("rg")),
    ).cast("int")
    return j.select(
        "vec_id", "dim", code.alias("code"),
        (F.col("mn") * SQ_LEVELS + code.cast("long") * F.col("rg")).alias("recon"),
    )


def q_sq_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-quantization encode: one int8-range code per dimension
    (exploded (vec_id, dim, code) rows so the oracle compares every code
    bit-exactly). Production stores the packed 64-byte array; see
    _sq_codes for the scale design."""
    return _sq_codes(spark, sf_dir).select(
        "vec_id", "dim", F.col("code").cast("long").alias("code")
    )


def q_sq_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQ asymmetric-distance top-k search: queries keep their full
    integer-grid vectors (scaled by 255), candidates keep only their
    dequantized-code reconstructions, and the per-pair distance is an
    exact int64 squared-L2 fold. The 10-query side is broadcast; the
    candidate side is one scan of the code table — per-pair work is a
    64-term integer fold with nothing wider than (query, cand, dist)
    crossing the top-k shuffle. The standard memory/recall middle ground
    between full-precision cosine and PQ (8x smaller vectors, far better
    recall than 4-byte PQ codes)."""
    recon = _sq_codes(spark, sf_dir)
    cand = (
        recon.filter(F.col("vec_id") >= N_QUERIES)
        .groupBy("vec_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("dim", "recon"))),
                lambda s: s["recon"],
            ).alias("rv")
        )
        .select(F.col("vec_id").alias("neighbor_id"), "rv")
    )
    e = table(spark, sf_dir, "embeddings")
    qs = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.transform(
            "embedding",
            lambda x: F.round(x * PQ_SCALE).cast("long") * SQ_LEVELS,
        ).alias("qv"),
    )
    diff = lambda q, r, i: F.element_at(q, i) - F.element_at(r, i)
    dist = F.aggregate(
        F.sequence(F.lit(1), F.lit(DIM)),
        F.lit(0).cast("long"),
        lambda acc, i: acc
        + diff(F.col("qv"), F.col("rv"), i) * diff(F.col("qv"), F.col("rv"), i),
    )
    sims = cand.crossJoin(F.broadcast(qs)).select(
        "query_id", "neighbor_id", dist.alias("sq_dist")
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("sq_dist"), F.asc("neighbor_id"))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "rank", "sq_dist")
    )


QUERIES = {
    "cosine_topk": q_cosine_topk,
    "embed_near_pairs": q_embed_near_pairs,
    "ann_lsh_buckets": q_ann_lsh_buckets,
    "ann_lsh_search": q_ann_lsh_search,
    "ann_lsh_multiprobe": q_ann_lsh_multiprobe,
    "ivf_assign": q_ivf_assign,
    "ivf_search": q_ivf_search,
    "ivf_multiprobe": q_ivf_multiprobe,
    "embed_stats": q_embed_stats,
    "kmeans": q_kmeans,
    "semdedup": q_semdedup,
    "pq_encode": q_pq_encode,
    "pq_search": q_pq_search,
    "ivfpq_search": q_ivfpq_search,
    "sq_encode": q_sq_encode,
    "sq_search": q_sq_search,
    "ann_recall": q_ann_recall,
}


def _kmeans_cte_chain() -> str:
    """Shared DuckDB CTE chain for the Lloyd iterations (through the
    ``afinal`` assignment) — composed by the kmeans and cluster_purity
    oracles. Same KM_ITERS unrolled rounds as the Spark driver loop:
    exact integer distances, floor(IEEE-division) centroid updates,
    empty clusters keep their previous position."""
    int_dist = (
        "list_reduce(list_prepend(0::BIGINT, "
        "list_transform(generate_series(1, 64), "
        "i -> (v.v[i] - c.c[i]) * (v.v[i] - c.c[i]))), (x, y) -> x + y)"
    )
    ctes = [
        f"""v AS (
            SELECT vec_id,
                   list_transform(embedding, x -> CAST(round(x::DOUBLE * {KM_SCALE}) AS BIGINT)) AS v
            FROM embeddings
        )""",
        f"c0 AS (SELECT vec_id AS cid, v AS c FROM v WHERE vec_id < {KM_K})",
    ]
    for t in range(KM_ITERS):
        ctes.append(f"""a{t} AS (
            SELECT vec_id, v, cid, dist FROM (
                SELECT vec_id, v, cid, dist,
                       row_number() OVER (PARTITION BY vec_id
                                          ORDER BY dist ASC, cid ASC) AS rn
                FROM (
                    SELECT v.vec_id, v.v, c.cid, {int_dist} AS dist
                    FROM v CROSS JOIN c{t} c
                )
            ) WHERE rn = 1
        )""")
        ctes.append(f"""u{t} AS (
            SELECT cid, d, sum(v[d])::BIGINT AS s, count(*) AS n
            FROM a{t} CROSS JOIN unnest(generate_series(1, 64)) AS t(d)
            GROUP BY cid, d
        )""")
        ctes.append(f"""c{t + 1} AS (
            SELECT p.cid, coalesce(nc.c, p.c) AS c
            FROM c{t} p LEFT JOIN (
                SELECT cid, list(CAST(floor(s / n) AS BIGINT) ORDER BY d) AS c
                FROM u{t} GROUP BY cid
            ) nc ON nc.cid = p.cid
        )""")
    T = KM_ITERS
    return f"""
        WITH {', '.join(ctes)},
        afinal AS (
            SELECT vec_id, cid, dist FROM (
                SELECT vec_id, cid, dist,
                       row_number() OVER (PARTITION BY vec_id
                                          ORDER BY dist ASC, cid ASC) AS rn
                FROM (
                    SELECT v.vec_id, c.cid, {int_dist} AS dist
                    FROM v CROSS JOIN c{T} c
                )
            ) WHERE rn = 1
        )"""


def _kmeans_oracle_sql() -> str:
    """q_kmeans oracle: the shared Lloyd chain + checksum rollup."""
    T = KM_ITERS
    return f"""{_kmeans_cte_chain()},
        chk AS (
            SELECT cid,
                   list_reduce(list_prepend(0::BIGINT,
                       list_transform(c, x -> abs(x))), (a, b) -> a + b)
                       % 1000000007 AS centroid_checksum
            FROM c{T}
        )
        SELECT a.cid, count(*) AS n_members, sum(a.dist)::BIGINT AS inertia,
               any_value(chk.centroid_checksum)::BIGINT AS centroid_checksum
        FROM afinal a JOIN chk ON chk.cid = a.cid
        GROUP BY a.cid
    """

_E_CTE = """
        WITH e AS (
            SELECT vec_id, label, embedding::DOUBLE[] AS v,
                   sqrt(list_reduce(
                       list_prepend(0.0::DOUBLE,
                           list_transform(generate_series(1, 64), i -> embedding[i]::DOUBLE * embedding[i]::DOUBLE)),
                       (x, y) -> x + y)) AS nrm
            FROM embeddings
        )
"""

_DOT = (
    "list_reduce(list_prepend(0.0::DOUBLE, "
    "list_transform(generate_series(1, 64), i -> {a}[i] * {b}[i])), "
    "(x, y) -> x + y)"
)

ORACLES = {
    "cosine_topk": f"""{_E_CTE}
        , sims AS (
            SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                   round({_DOT.format(a="q.v", b="c.v")} / (q.nrm * c.nrm), 4) AS sim
            FROM e q, e c
            WHERE q.vec_id < {N_QUERIES} AND c.vec_id >= {N_QUERIES}
        )
        SELECT query_id, neighbor_id, rank, sim FROM (
            SELECT query_id, neighbor_id, sim,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY sim DESC, neighbor_id ASC) AS rank
            FROM sims
        ) WHERE rank <= {TOP_K}
    """,
    "embed_near_pairs": f"""{_E_CTE}
        SELECT a.vec_id AS a, b.vec_id AS b,
               round({_DOT.format(a="a.v", b="b.v")} / (a.nrm * b.nrm), 4) AS sim
        FROM e a, e b WHERE a.vec_id < b.vec_id
        ORDER BY sim DESC, a ASC, b ASC LIMIT 20
    """,
    "ann_lsh_buckets": f"""{_E_CTE}
        , dots AS (
            SELECT vec_id, j,
                   list_reduce(list_prepend(0.0::DOUBLE,
                       list_transform(generate_series(1, 64),
                           k -> v[k] * (({DUCK_HEX32.format(x="j::VARCHAR || ',' || k::VARCHAR")} % 2001 - 1000) / 1000.0))),
                       (x, y) -> x + y) AS dot
            FROM (SELECT vec_id, v, unnest(generate_series(0, {N_PLANES - 1})) AS j FROM e)
        ),
        buckets AS (
            SELECT vec_id,
                   sum(CASE WHEN dot > 0 THEN CAST(pow(2.0, j) AS BIGINT) ELSE 0 END)::BIGINT AS bucket
            FROM dots GROUP BY vec_id
        )
        SELECT bucket, count(*) AS n FROM buckets GROUP BY bucket
    """,
    "ann_lsh_search": f"""{_E_CTE}
        , dots AS (
            SELECT vec_id, j,
                   list_reduce(list_prepend(0.0::DOUBLE,
                       list_transform(generate_series(1, 64),
                           k -> v[k] * (({DUCK_HEX32.format(x="j::VARCHAR || ',' || k::VARCHAR")} % 2001 - 1000) / 1000.0))),
                       (x, y) -> x + y) AS dot
            FROM (SELECT vec_id, v, unnest(generate_series(0, {N_PLANES - 1})) AS j FROM e)
        ),
        buckets AS (
            SELECT vec_id,
                   sum(CASE WHEN dot > 0 THEN CAST(pow(2.0, j) AS BIGINT) ELSE 0 END)::BIGINT AS bucket
            FROM dots GROUP BY vec_id
        ),
        q AS (
            SELECT e.vec_id AS query_id, e.v AS qv, e.nrm AS qn, b.bucket AS qb
            FROM e JOIN buckets b ON b.vec_id = e.vec_id
            WHERE e.vec_id < {N_QUERIES}
        ),
        cand AS (
            SELECT e.vec_id AS cand_id, e.v AS cv, e.nrm AS cn, b.bucket AS cb
            FROM e JOIN buckets b ON b.vec_id = e.vec_id
            WHERE e.vec_id >= {N_QUERIES}
        ),
        sims AS (
            SELECT query_id, cand_id,
                   round({_DOT.format(a="qv", b="cv")} / (qn * cn), 4) AS sim
            FROM q JOIN cand ON qb = cb
        )
        SELECT query_id, cand_id, rk, sim FROM (
            SELECT query_id, cand_id, sim,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY sim DESC, cand_id ASC) AS rk
            FROM sims
        ) WHERE rk <= 3
    """,
    "ivf_assign": f"""{_E_CTE}
        , sims AS (
            SELECT r.vec_id AS vec_id, c.vec_id AS centroid,
                   round({_DOT.format(a="r.v", b="c.v")} / (r.nrm * c.nrm), 4) AS sim
            FROM e r, e c
            WHERE r.vec_id >= {N_CENTROIDS} AND c.vec_id < {N_CENTROIDS}
        )
        SELECT vec_id, centroid, sim FROM (
            SELECT vec_id, centroid, sim,
                   row_number() OVER (PARTITION BY vec_id
                                      ORDER BY sim DESC, centroid ASC) AS rn_
            FROM sims
        ) WHERE rn_ = 1
    """,
    "embed_stats": f"""{_E_CTE}
        SELECT label, count(*) AS n, round(avg(round(nrm, 6)), 3) AS avg_norm
        FROM e GROUP BY label
    """,
    "ivf_search": f"""{_E_CTE}
        , csims AS (
            SELECT r.vec_id AS vec_id, c.vec_id AS centroid,
                   round({_DOT.format(a="r.v", b="c.v")} / (r.nrm * c.nrm), 4) AS sim
            FROM e r, e c
            WHERE r.vec_id >= {N_CENTROIDS} AND c.vec_id < {N_CENTROIDS}
        ),
        assign AS (
            SELECT vec_id, centroid FROM (
                SELECT vec_id, centroid,
                       row_number() OVER (PARTITION BY vec_id
                                          ORDER BY sim DESC, centroid ASC) AS rn_
                FROM csims
            ) WHERE rn_ = 1
        ),
        q AS (
            SELECT e.vec_id AS query_id, e.v AS qv, e.nrm AS qn, a.centroid AS qc
            FROM e JOIN assign a ON a.vec_id = e.vec_id
            WHERE e.vec_id >= {N_CENTROIDS} AND e.vec_id < 15
        ),
        cand AS (
            SELECT e.vec_id AS cand_id, e.v AS cv, e.nrm AS cn, a.centroid AS cc
            FROM e JOIN assign a ON a.vec_id = e.vec_id
            WHERE e.vec_id >= 15
        ),
        sims AS (
            SELECT query_id, cand_id,
                   round({_DOT.format(a="qv", b="cv")} / (qn * cn), 4) AS sim
            FROM q JOIN cand ON qc = cc
        )
        SELECT query_id, cand_id, rk, sim FROM (
            SELECT query_id, cand_id, sim,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY sim DESC, cand_id ASC) AS rk
            FROM sims
        ) WHERE rk <= 3
    """,
    "ivf_multiprobe": f"""{_E_CTE}
        , csims AS (
            SELECT r.vec_id AS vec_id, c.vec_id AS centroid,
                   round({_DOT.format(a="r.v", b="c.v")} / (r.nrm * c.nrm), 4) AS sim
            FROM e r, e c
            WHERE r.vec_id >= {N_CENTROIDS} AND c.vec_id < {N_CENTROIDS}
        ),
        assign AS (
            SELECT vec_id, centroid FROM (
                SELECT vec_id, centroid,
                       row_number() OVER (PARTITION BY vec_id
                                          ORDER BY sim DESC, centroid ASC) AS rn_
                FROM csims
            ) WHERE rn_ = 1
        ),
        q AS (
            SELECT cs.vec_id AS query_id, e.v AS qv, e.nrm AS qn,
                   cs.centroid AS qc
            FROM (
                SELECT vec_id, centroid FROM (
                    SELECT vec_id, centroid,
                           row_number() OVER (PARTITION BY vec_id
                                              ORDER BY sim DESC, centroid ASC) AS pn
                    FROM csims WHERE vec_id < 15
                ) WHERE pn <= 2
            ) cs JOIN e ON e.vec_id = cs.vec_id
        ),
        cand AS (
            SELECT e.vec_id AS cand_id, e.v AS cv, e.nrm AS cn, a.centroid AS cc
            FROM e JOIN assign a ON a.vec_id = e.vec_id
            WHERE e.vec_id >= 15
        ),
        sims AS (
            SELECT query_id, cand_id,
                   round({_DOT.format(a="qv", b="cv")} / (qn * cn), 4) AS sim
            FROM q JOIN cand ON qc = cc
        )
        SELECT query_id, cand_id, rk, sim FROM (
            SELECT query_id, cand_id, sim,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY sim DESC, cand_id ASC) AS rk
            FROM sims
        ) WHERE rk <= 3
    """,
}

ORACLES["kmeans"] = _kmeans_oracle_sql()

_SD_DIST = (
    "list_reduce(list_prepend(0::BIGINT, "
    "list_transform(generate_series(1, {n}), "
    "i -> ({a}[i] - {b}[i]) * ({a}[i] - {b}[i]))), (x, y) -> x + y)"
)

ORACLES["semdedup"] = f"""
    WITH v AS (
        SELECT vec_id,
               list_transform(embedding, x -> CAST(round(x::DOUBLE * {KM_SCALE}) AS BIGINT)) AS v
        FROM embeddings
    ),
    c AS (SELECT vec_id AS cid, v AS c FROM v WHERE vec_id < {SD_K}),
    asg AS (
        SELECT vec_id, v, cid, dc FROM (
            SELECT v.vec_id, v.v, c.cid,
                   {_SD_DIST.format(n=DIM, a="v.v", b="c.c")} AS dc,
                   row_number() OVER (PARTITION BY v.vec_id ORDER BY
                       {_SD_DIST.format(n=DIM, a="v.v", b="c.c")} ASC, c.cid ASC) AS rn
            FROM v CROSS JOIN c
        ) WHERE rn = 1
    ),
    pairs AS (
        SELECT a.cid, a.vec_id AS ia, b.vec_id AS ib, a.dc AS da, b.dc AS db
        FROM asg a JOIN asg b ON a.cid = b.cid AND a.vec_id < b.vec_id
        WHERE {_SD_DIST.format(n=DIM, a="a.v", b="b.v")} <= {SD_T}
    ),
    dropped AS (
        SELECT DISTINCT cid,
               CASE WHEN (da > db) OR (da = db AND ia > ib) THEN ia ELSE ib END AS loser
        FROM pairs
    ),
    m AS (SELECT cid, count(*) AS n_members FROM asg GROUP BY cid),
    p AS (SELECT cid, count(*) AS n_pairs FROM pairs GROUP BY cid),
    d AS (SELECT cid, count(*) AS n_dropped FROM dropped GROUP BY cid)
    SELECT m.cid, m.n_members,
           coalesce(p.n_pairs, 0) AS n_pairs,
           coalesce(d.n_dropped, 0) AS n_dropped,
           m.n_members - coalesce(d.n_dropped, 0) AS n_survivors
    FROM m LEFT JOIN p ON p.cid = m.cid LEFT JOIN d ON d.cid = m.cid
"""

_PQ_CTE = """
    WITH v AS (
        SELECT vec_id,
               list_transform(embedding, x -> round(x::DOUBLE * 1000)::BIGINT) AS v
        FROM embeddings
    ),
    subs AS (
        SELECT vec_id, s, list_slice(v, s*16 + 1, s*16 + 16) AS sv
        FROM (SELECT vec_id, v, unnest(generate_series(0, 3)) AS s FROM v)
    ),
    cb AS (SELECT vec_id AS j, s AS cs, sv AS cv FROM subs WHERE vec_id < 8),
    d AS (
        SELECT subs.vec_id, subs.s, cb.j,
               list_reduce(list_prepend(0::BIGINT,
                   list_transform(generate_series(1, 16),
                       i -> (subs.sv[i] - cb.cv[i]) * (subs.sv[i] - cb.cv[i]))),
                   (a, b) -> a + b) AS dist
        FROM subs JOIN cb ON subs.s = cb.cs
    ),
    best AS (
        SELECT vec_id, s, j AS code, dist FROM d
        QUALIFY row_number() OVER (PARTITION BY vec_id, s ORDER BY dist, j) = 1
    )
"""

ORACLES["pq_encode"] = _PQ_CTE + """
    SELECT vec_id,
           max(CASE WHEN s = 0 THEN code END)::INT AS code0,
           max(CASE WHEN s = 1 THEN code END)::INT AS code1,
           max(CASE WHEN s = 2 THEN code END)::INT AS code2,
           max(CASE WHEN s = 3 THEN code END)::INT AS code3,
           sum(dist)::BIGINT AS distortion
    FROM best GROUP BY vec_id
"""

ORACLES["pq_search"] = _PQ_CTE + """
    , cand AS (SELECT vec_id AS neighbor_id, s, code FROM best WHERE vec_id >= 10),
    lut AS (
        SELECT q.vec_id AS query_id, q.s, cb.j,
               list_reduce(list_prepend(0::BIGINT,
                   list_transform(generate_series(1, 16),
                       i -> (q.sv[i] - cb.cv[i]) * (q.sv[i] - cb.cv[i]))),
                   (a, b) -> a + b) AS dq
        FROM subs q JOIN cb ON q.s = cb.cs
        WHERE q.vec_id < 10
    ),
    adc AS (
        SELECT lut.query_id, cand.neighbor_id, sum(lut.dq)::BIGINT AS adc_dist
        FROM cand JOIN lut ON cand.s = lut.s AND cand.code = lut.j
        GROUP BY 1, 2
    )
    SELECT query_id, neighbor_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY adc_dist, neighbor_id)::INT AS rank,
           adc_dist
    FROM adc
    QUALIFY rank <= 5
"""

ORACLES["ivfpq_search"] = _PQ_CTE + f"""
    , e AS (
        SELECT vec_id, embedding::DOUBLE[] AS ev,
               sqrt(list_reduce(
                   list_prepend(0.0::DOUBLE,
                       list_transform(generate_series(1, 64),
                           i -> embedding[i]::DOUBLE * embedding[i]::DOUBLE)),
                   (x, y) -> x + y)) AS nrm
        FROM embeddings
    ),
    csims AS (
        SELECT r.vec_id AS vec_id, c.vec_id AS centroid,
               round({_DOT.format(a="r.ev", b="c.ev")} / (r.nrm * c.nrm), 4) AS sim
        FROM e r, e c
        WHERE r.vec_id >= {N_CENTROIDS} AND c.vec_id < {N_CENTROIDS}
    ),
    assign AS (
        SELECT vec_id, centroid FROM (
            SELECT vec_id, centroid,
                   row_number() OVER (PARTITION BY vec_id
                                      ORDER BY sim DESC, centroid ASC) AS rn_
            FROM csims
        ) WHERE rn_ = 1
    ),
    cand AS (
        SELECT b.vec_id AS neighbor_id, b.s, b.code, a.centroid AS cc
        FROM best b JOIN assign a ON a.vec_id = b.vec_id
        WHERE b.vec_id >= 15
    ),
    lut AS (
        SELECT q.vec_id AS query_id, q.s, cb.j, a.centroid AS qc,
               list_reduce(list_prepend(0::BIGINT,
                   list_transform(generate_series(1, 16),
                       i -> (q.sv[i] - cb.cv[i]) * (q.sv[i] - cb.cv[i]))),
                   (x, y) -> x + y) AS dq
        FROM subs q
        JOIN cb ON q.s = cb.cs
        JOIN assign a ON a.vec_id = q.vec_id
        WHERE q.vec_id >= {N_CENTROIDS} AND q.vec_id < 15
    ),
    adc AS (
        SELECT lut.query_id, cand.neighbor_id, sum(lut.dq)::BIGINT AS adc_dist
        FROM cand JOIN lut ON cand.s = lut.s AND cand.code = lut.j
                          AND cand.cc = lut.qc
        GROUP BY 1, 2
    )
    SELECT query_id, neighbor_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY adc_dist, neighbor_id)::INT AS rank,
           adc_dist
    FROM adc
    QUALIFY rank <= 3
"""

# multi-probe oracle: same bucketing, the query side expands to its own
# bucket + the N_PLANES Hamming-1 buckets before the candidate equi-join
ORACLES["ann_lsh_multiprobe"] = ORACLES["ann_lsh_search"].replace(
    "sims AS (",
    f"""probes AS (
            SELECT query_id, qv, qn,
                   unnest(list_prepend(qb,
                       list_transform(generate_series(0, {N_PLANES - 1}),
                                      i -> xor(qb, (1::BIGINT << i))))) AS pb
            FROM q
        ),
        sims AS (""",
).replace("FROM q JOIN cand ON qb = cb", "FROM probes JOIN cand ON pb = cb")

ORACLES["ann_recall"] = f"""
    WITH exact AS ({ORACLES["cosine_topk"]}),
    pq AS ({ORACLES["pq_search"]}),
    lsh AS ({ORACLES["ann_lsh_search"]}),
    lsh_mp AS ({ORACLES["ann_lsh_multiprobe"]})
    SELECT 'pq_top5' AS method,
           (SELECT count(*) FROM pq JOIN exact USING (query_id, neighbor_id))::BIGINT AS n_hits,
           (SELECT count(*) FROM exact)::BIGINT AS n_expected,
           round((SELECT count(*) FROM pq JOIN exact USING (query_id, neighbor_id))
                 / (SELECT count(*) FROM exact)::DOUBLE, 4) AS recall
    UNION ALL
    SELECT 'lsh_top3',
           (SELECT count(*) FROM lsh JOIN exact e ON lsh.query_id = e.query_id
              AND lsh.cand_id = e.neighbor_id WHERE e.rank <= 3)::BIGINT,
           (SELECT count(*) FROM exact WHERE rank <= 3)::BIGINT,
           round((SELECT count(*) FROM lsh JOIN exact e ON lsh.query_id = e.query_id
                    AND lsh.cand_id = e.neighbor_id WHERE e.rank <= 3)
                 / (SELECT count(*) FROM exact WHERE rank <= 3)::DOUBLE, 4)
    UNION ALL
    SELECT 'lsh_mp_top3',
           (SELECT count(*) FROM lsh_mp JOIN exact e ON lsh_mp.query_id = e.query_id
              AND lsh_mp.cand_id = e.neighbor_id WHERE e.rank <= 3)::BIGINT,
           (SELECT count(*) FROM exact WHERE rank <= 3)::BIGINT,
           round((SELECT count(*) FROM lsh_mp JOIN exact e ON lsh_mp.query_id = e.query_id
                    AND lsh_mp.cand_id = e.neighbor_id WHERE e.rank <= 3)
                 / (SELECT count(*) FROM exact WHERE rank <= 3)::DOUBLE, 4)
"""

_SQ_CTE = """
    WITH v AS (
        SELECT vec_id,
               list_transform(embedding, x -> round(x::DOUBLE * 1000)::BIGINT) AS v
        FROM embeddings
    ),
    vrows AS (
        SELECT vec_id, k - 1 AS dim, v[k] AS q
        FROM (SELECT vec_id, v, unnest(generate_series(1, 64)) AS k FROM v)
    ),
    rng AS (
        SELECT dim, min(q) AS mn, greatest(max(q) - min(q), 1) AS rg
        FROM vrows GROUP BY dim
    ),
    codes AS (
        SELECT vec_id, vrows.dim AS dim,
               least(255, floor((q - mn) * 255 / rg))::BIGINT AS code,
               mn * 255 + least(255, floor((q - mn) * 255 / rg))::BIGINT * rg AS recon
        FROM vrows JOIN rng ON vrows.dim = rng.dim
    )
"""

ORACLES["sq_encode"] = _SQ_CTE + """
    SELECT vec_id, dim, code FROM codes
"""

ORACLES["sq_search"] = _SQ_CTE + """
    , cand AS (
        SELECT vec_id AS neighbor_id, list(recon ORDER BY dim) AS rv
        FROM codes WHERE vec_id >= 10 GROUP BY vec_id
    ),
    qs AS (
        SELECT vec_id AS query_id,
               list_transform(embedding, x -> round(x::DOUBLE * 1000)::BIGINT * 255) AS qv
        FROM embeddings WHERE vec_id < 10
    ),
    sims AS (
        SELECT query_id, neighbor_id,
               list_reduce(list_prepend(0::BIGINT,
                   list_transform(generate_series(1, 64),
                       i -> (qv[i] - rv[i]) * (qv[i] - rv[i]))),
                   (a, b) -> a + b) AS sq_dist
        FROM cand, qs
    )
    SELECT query_id, neighbor_id, rank, sq_dist FROM (
        SELECT query_id, neighbor_id, sq_dist,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY sq_dist, neighbor_id) AS rank
        FROM sims
    ) WHERE rank <= 5
"""


# ---------------------------------------------------------------- batch 35


def _bq_masks(df: DataFrame, id_alias: str) -> DataFrame:
    """Binary-quantization encode: the 64-dim float vector collapses to
    64 SIGN BITS packed as two 32-bit words (kept in separate longs so
    no mask ever touches the int64 sign bit — two's-complement parity
    across engines is then irrelevant). 16x smaller than SQ codes,
    512x smaller than the float vector; the encode is one codegen'd
    integer fold per row, no shuffle."""
    word = (
        "aggregate(sequence(1, 32), cast(0 as bigint), (acc, i) -> acc + "
        "if(element_at(embedding, i + {off}) > cast(0 as float), "
        "shiftleft(cast(1 as bigint), i - 1), cast(0 as bigint)))"
    )
    return df.select(
        F.col("vec_id").alias(id_alias),
        F.expr(word.format(off=0)).alias("lo"),
        F.expr(word.format(off=32)).alias("hi"),
    )


def q_bq_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-quantized ANN top-k (Faiss BINARY_FLAT / Milvus BQ idiom,
    completing the quantization family next to pq_search/sq_search):
    both sides collapse to 64 sign bits, distance is Hamming =
    popcount(xor) on the two packed words — exact integers, bit-exact
    across engines. The 10-query side broadcasts (documented cross);
    the candidate scan carries only (vec_id, lo, hi) — at 10^12
    vectors the candidate table is 24 bytes/row, and popcount-xor is
    the cheapest distance any ANN index family offers. Rerank of the
    Hamming top-k with exact cosine (the standard two-stage BQ
    pipeline) is q_cosine_topk run on this output's candidate set."""
    e = table(spark, sf_dir, "embeddings")
    qs = _bq_masks(
        e.filter(F.col("vec_id") < N_QUERIES), "query_id"
    ).withColumnRenamed("lo", "q_lo").withColumnRenamed("hi", "q_hi")
    cand = _bq_masks(e.filter(F.col("vec_id") >= N_QUERIES), "neighbor_id")
    ham = (
        F.bit_count(F.col("q_lo").bitwiseXOR(F.col("lo")))
        + F.bit_count(F.col("q_hi").bitwiseXOR(F.col("hi")))
    ).cast("long")
    sims = cand.crossJoin(F.broadcast(qs)).select(
        "query_id", "neighbor_id", ham.alias("hamming")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.asc("hamming"), F.asc("neighbor_id")
    )
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "rank", "hamming")
    )


_BQ_WORD = (
    "list_reduce(list_prepend(0::BIGINT, list_transform(generate_series(1, 32), "
    "i -> CASE WHEN embedding[i + {off}] > 0 THEN (1::BIGINT << (i - 1)) "
    "ELSE 0::BIGINT END)), (x, y) -> x + y)"
)

ORACLES["bq_search"] = f"""
    WITH masks AS (
        SELECT vec_id, {_BQ_WORD.format(off=0)} AS lo,
               {_BQ_WORD.format(off=32)} AS hi
        FROM embeddings
    ),
    sims AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               CAST(bit_count(xor(q.lo, c.lo))
                    + bit_count(xor(q.hi, c.hi)) AS BIGINT) AS hamming
        FROM masks q, masks c
        WHERE q.vec_id < {N_QUERIES} AND c.vec_id >= {N_QUERIES}
    )
    SELECT query_id, neighbor_id, rank, hamming FROM (
        SELECT query_id, neighbor_id, hamming,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY hamming, neighbor_id) AS rank
        FROM sims
    ) WHERE rank <= {TOP_K}
"""

QUERIES["bq_search"] = q_bq_search


def q_mutual_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-kNN pair filter — the standard semantic-dedup
    refinement over any kNN output: (a, b) survives only if b is in
    a's top-k AND a is in b's top-k. One-sided neighbors (a hub vector
    close to everything) are the classic false-positive source in
    embedding dedup; mutuality suppresses hubs with zero extra
    scoring. Here the kNN table is the labeled brute-force baseline
    (same crossJoin discipline as cosine_topk — at scale the input is
    the LSH/IVF/BQ candidate output instead, and mutuality stays ONE
    self-join of the rank table on the flipped key). Output is the
    undirected survivor set with both ranks as the audit columns."""
    e = _emb(spark, sf_dir)
    a = e.select(F.col("vec_id").alias("src"), F.col("v").alias("av"),
                 F.col("nrm").alias("an"))
    b = e.select(F.col("vec_id").alias("dst"), F.col("v").alias("bv"),
                 F.col("nrm").alias("bn"))
    sims = (
        a.crossJoin(b)
        .filter(F.col("src") != F.col("dst"))
        .select(
            "src", "dst",
            F.round(
                _fold_dot(F.col("av"), F.col("bv")) / (F.col("an") * F.col("bn")), 4
            ).alias("sim"),
        )
    )
    w = Window.partitionBy("src").orderBy(F.desc("sim"), F.asc("dst"))
    ranked = sims.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= TOP_K
    )
    fwd = ranked.select("src", "dst", "sim", F.col("rank").alias("rank_ab"))
    rev = ranked.select(
        F.col("dst").alias("src"), F.col("src").alias("dst"),
        F.col("rank").alias("rank_ba"),
    )
    return (
        fwd.join(rev, ["src", "dst"])
        .filter(F.col("src") < F.col("dst"))
        .select(
            F.col("src").alias("a"), F.col("dst").alias("b"),
            "sim", "rank_ab", "rank_ba",
        )
    )


ORACLES["mutual_knn"] = f"""{_E_CTE}
    , sims AS (
        SELECT a.vec_id AS src, b.vec_id AS dst,
               round({_DOT.format(a="a.v", b="b.v")} / (a.nrm * b.nrm), 4) AS sim
        FROM e a, e b WHERE a.vec_id <> b.vec_id
    ),
    ranked AS (
        SELECT src, dst, sim,
               row_number() OVER (PARTITION BY src
                                  ORDER BY sim DESC, dst ASC) AS rank
        FROM sims
    )
    SELECT f.src AS a, f.dst AS b, f.sim,
           f.rank AS rank_ab, r.rank AS rank_ba
    FROM ranked f JOIN ranked r ON f.src = r.dst AND f.dst = r.src
    WHERE f.rank <= {TOP_K} AND r.rank <= {TOP_K} AND f.src < f.dst
"""

QUERIES["mutual_knn"] = q_mutual_knn


# ---------------------------------------------------------------- batch 41


def q_cluster_purity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clustering-quality eval: per-cluster PURITY of the k-means
    assignment against the embeddings' ground-truth labels — the eval
    step that tells a curation pipeline whether its semantic clusters
    (semdedup buckets, data-mixture domains) actually track the
    latent classes. Reuses the EXACT Lloyd assignment q_kmeans runs
    (shared driver loop / shared unrolled-CTE oracle chain); purity is
    the majority-label share per cluster in integer parts-per-thousand
    (min-label tie-break so both engines pick the same majority).
    Everything after the assignment is two cluster-sized aggregates."""
    final, _ = _kmeans_final_assign(spark, sf_dir)
    lab = table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("label").cast("long").alias("label")
    )
    cl = (
        final.join(lab, "vec_id")
        .groupBy("cid", "label")
        .agg(F.count("*").alias("cnt"))
    )
    w = Window.partitionBy("cid").orderBy(F.desc("cnt"), F.asc("label"))
    top = cl.withColumn("rn_", F.row_number().over(w)).filter(
        F.col("rn_") == 1
    )
    tot = cl.groupBy("cid").agg(F.sum("cnt").alias("n_members"))
    return top.join(tot, "cid").select(
        "cid", "n_members",
        F.col("label").alias("top_label"),
        F.col("cnt").alias("top_label_n"),
        F.floor(F.col("cnt") * 1000 / F.col("n_members"))
        .cast("long").alias("purity_ppk"),
    )


def _purity_oracle_sql() -> str:
    return f"""{_kmeans_cte_chain()},
        cl AS (
            SELECT a.cid, CAST(e.label AS BIGINT) AS label,
                   count(*) AS cnt
            FROM afinal a JOIN embeddings e ON e.vec_id = a.vec_id
            GROUP BY a.cid, e.label
        ),
        top AS (
            SELECT cid, label, cnt FROM (
                SELECT cid, label, cnt,
                       row_number() OVER (PARTITION BY cid
                                          ORDER BY cnt DESC, label ASC) AS rn
                FROM cl
            ) WHERE rn = 1
        ),
        tot AS (SELECT cid, CAST(sum(cnt) AS BIGINT) AS n_members
                FROM cl GROUP BY cid)
        SELECT t.cid, tot.n_members, t.label AS top_label,
               t.cnt AS top_label_n,
               CAST(floor(t.cnt * 1000.0 / tot.n_members) AS BIGINT)
                   AS purity_ppk
        FROM top t JOIN tot ON tot.cid = t.cid
    """


QUERIES["cluster_purity"] = q_cluster_purity
ORACLES["cluster_purity"] = _purity_oracle_sql()
