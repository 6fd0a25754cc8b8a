"""Custom stateful streaming operator: a count-min sketch maintained
across micro-batches via ``applyInPandasWithState``.

The batch side (``textops.q_heavy_hitters``) answers "which tokens are
hot" with a 2x256-cell count-min sketch. On a stream the same question
needs the sketch to OUTLIVE a micro-batch: this operator keys state by
sketch cell ``(r, c)`` — at most ``CM_ROWS * CM_COLS`` = 512 groups, so
state is constant-size no matter how many tokens flow through, and the
groups shard across executors like any other keyed state. Each batch
adds the group's increment count to its cell and emits the cell's new
cumulative value (update semantics; cells are monotone non-decreasing).

Hashing stays JVM-side: tokens are exploded and mapped to (r, c) with
the exact ``_cm_col`` expression the batch sketch uses (md5-derived),
so a stream-fed sketch is cell-for-cell identical to the batch sketch
over the same rows — the equivalence the test asserts. Only (int, int)
pairs ever cross into Python.

Scale note: rows reach the stateful operator un-combined (Spark shuffles
the raw stream on the state key). At 10^12 docs you would pre-shrink
each micro-batch with a JVM-side ``groupBy(r, c).count()`` inside
``foreachBatch`` feeding a keyed upsert instead; the 512-group stateful
operator here is the structured-streaming-native form with the same
constant-state guarantee.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd

CM_OUT_SCHEMA = "r int, c int, cnt long"
CM_STATE_SCHEMA = "cnt long"


def _cm_cell_group(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state,
) -> Iterator[pd.DataFrame]:
    add = sum(len(pdf) for pdf in pdfs)
    total = (state.get[0] if state.exists else 0) + add
    state.update((total,))
    yield pd.DataFrame(
        [(int(key[0]), int(key[1]), int(total))], columns=["r", "c", "cnt"]
    )


def stream_count_min(
    spark,
    docs_stream_dir: str,
    doc_schema: str,
    max_files_per_trigger: int | None = None,
):
    """Streaming DataFrame of count-min cell updates (r, c, cnt): the
    cumulative sketch cell value after each micro-batch that touched
    it. The final sketch is the per-(r, c) max of the emitted rows
    (counts are monotone)."""
    from pyspark.sql import functions as F

    from ..functions.textops import CM_ROWS, _cm_col
    from ..functions.util import tokens

    reader = spark.readStream.schema(doc_schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    docs = reader.parquet(docs_stream_dir)
    toks = docs.select(F.explode(tokens(F.col("text"))).alias("tok"))
    cells = None
    for r in range(CM_ROWS):
        part = toks.select(
            F.lit(r).alias("r"), _cm_col(F.col("tok"), r).cast("int").alias("c")
        )
        cells = part if cells is None else cells.unionByName(part)
    return cells.groupBy("r", "c").applyInPandasWithState(
        _cm_cell_group,
        outputStructType=CM_OUT_SCHEMA,
        stateStructType=CM_STATE_SCHEMA,
        outputMode="update",
        timeoutConf="NoTimeout",
    )


HLL_OUT_SCHEMA = "event_type string, bucket long, rho int"
HLL_STATE_SCHEMA = "rho int"


def _hll_register_group(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state,
) -> Iterator[pd.DataFrame]:
    batch_max = 0
    for pdf in pdfs:
        if len(pdf):
            batch_max = max(batch_max, int(pdf["rho"].max()))
    cur = state.get[0] if state.exists else 0
    new = max(cur, batch_max)
    state.update((new,))
    yield pd.DataFrame(
        [(key[0], int(key[1]), int(new))],
        columns=["event_type", "bucket", "rho"],
    )


def stream_hll(
    spark,
    events_stream_dir: str,
    event_schema: str,
    max_files_per_trigger: int | None = None,
):
    """Streaming HyperLogLog registers per event_type: the distinct-user
    sketch maintained across micro-batches via ``applyInPandasWithState``.

    State is keyed by (event_type, bucket) — at most ``HLL_M`` = 64
    registers per event_type, each holding one int (the max rho seen),
    so state is CONSTANT-SIZE in the number of distinct users: the
    streaming answer to "distinct users so far per type" that exact
    ``count_distinct`` cannot give without unbounded state. Hashing and
    register math stay JVM-side and replicate ``relational.q_hll_distinct``
    exactly (md5-derived hex32, m=64, 26-bit rho domain), so the stream-fed
    register table is register-for-register identical to the batch sketch
    over the same rows — the equivalence the test asserts. Registers are
    monotone (max is associative/idempotent), so the final sketch is the
    per-key max of the emitted updates, and register tables from different
    streams/batches union-merge losslessly."""
    from pyspark.sql import functions as F

    from ..functions.relational import HLL_M
    from ..functions.util import hex32

    reader = spark.readStream.schema(event_schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    events = reader.parquet(events_stream_dir)
    h = hex32(F.concat(F.lit("hll|"), F.col("user_id").cast("string")))
    hashed = events.select(
        "event_type",
        (h % HLL_M).alias("bucket"),
        F.floor(h / HLL_M).cast("long").alias("w"),
    ).select(
        "event_type",
        "bucket",
        F.when(F.col("w") == 0, F.lit(27))
        .otherwise(F.lit(27) - F.length(F.conv(F.col("w"), 10, 2)))
        .cast("int")
        .alias("rho"),
    )
    return hashed.groupBy("event_type", "bucket").applyInPandasWithState(
        _hll_register_group,
        outputStructType=HLL_OUT_SCHEMA,
        stateStructType=HLL_STATE_SCHEMA,
        outputMode="update",
        timeoutConf="NoTimeout",
    )


# ---------------------------------------------------------------------------
# SpaceSaving heavy hitters: the TOP-K sketch next to count-min's
# point-estimate sketch. Count-min answers "how often is token t?"
# but cannot enumerate the hot set without knowing the candidates;
# SpaceSaving maintains the candidate set itself in constant space.

SS_BUCKETS = 16  # state groups: tokens shard by hash(token) % SS_BUCKETS
SS_M = 8  # counters per bucket — total state is SS_BUCKETS * SS_M entries

SS_OUT_SCHEMA = "bucket int, tok string, cnt long, err long, ver long"
SS_STATE_SCHEMA = (
    "keys array<string>, counts array<long>, errs array<long>, ver long"
)


def _ss_apply(table: dict, tok: str, w: int, m: int) -> None:
    """Weighted SpaceSaving update of {tok: (cnt, err)} capped at m."""
    if tok in table:
        c, e = table[tok]
        table[tok] = (c + w, e)
    elif len(table) < m:
        table[tok] = (w, 0)
    else:
        # evict the min-count entry (token tie-break for determinism)
        victim = min(table.items(), key=lambda kv: (kv[1][0], kv[0]))
        vcnt = victim[1][0]
        del table[victim[0]]
        table[tok] = (vcnt + w, vcnt)


def _ss_group(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state,
) -> Iterator[pd.DataFrame]:
    """One SpaceSaving table per bucket group. The micro-batch is
    pre-counted and applied in sorted-token order so the result is a
    deterministic function of the row SET per batch (shuffle order
    within the batch cannot change it) — the property the
    stream-vs-reference test asserts."""
    bucket = int(key[0])
    counts: dict = {}
    for pdf in pdfs:
        for tok in pdf["tok"]:
            counts[tok] = counts.get(tok, 0) + 1
    if state.exists:
        keys, cs, es, ver = state.get
        table = {k: (int(c), int(e)) for k, c, e in zip(keys, cs, es)}
    else:
        table, ver = {}, 0
    for tok in sorted(counts):
        _ss_apply(table, tok, counts[tok], SS_M)
    ver = int(ver) + 1
    items = sorted(table.items())
    state.update((
        [k for k, _ in items],
        [c for _, (c, _) in items],
        [e for _, (_, e) in items],
        ver,
    ))
    yield pd.DataFrame(
        [(bucket, k, int(c), int(e), ver) for k, (c, e) in items],
        columns=["bucket", "tok", "cnt", "err", "ver"],
    )


def stream_space_saving(
    spark,
    docs_stream_dir: str,
    doc_schema: str,
    max_files_per_trigger: int | None = None,
):
    """Streaming SpaceSaving heavy-hitter tables per hash bucket.

    Tokens shard by ``pmod(hex32(tok), SS_BUCKETS)`` so each token is
    owned by exactly ONE bucket and the per-bucket SpaceSaving
    guarantee (cnt - err <= true <= cnt, and any token with true count
    > bucket_stream/SS_M is present) carries over to the union of
    tables. State is SS_M entries per bucket — SS_BUCKETS * SS_M total
    regardless of vocabulary size or stream length, the constant-state
    answer to "what ARE the hot tokens so far" that count-min (point
    estimates only) and an exact groupBy (unbounded state) cannot give.
    Each batch emits the bucket's full table stamped with a state
    version; the final answer is each bucket's max-``ver`` rows.
    Tokenization and bucket hashing stay JVM-side (same ``tokens`` /
    ``hex32`` expressions as the batch queries); only (bucket, token)
    pairs cross into Python."""
    from pyspark.sql import functions as F

    from ..functions.util import hex32, tokens

    reader = spark.readStream.schema(doc_schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    docs = reader.parquet(docs_stream_dir)
    toks = docs.select(F.explode(tokens(F.col("text"))).alias("tok")).select(
        F.pmod(hex32(F.col("tok")), F.lit(SS_BUCKETS)).cast("int").alias("bucket"),
        "tok",
    )
    return toks.groupBy("bucket").applyInPandasWithState(
        _ss_group,
        outputStructType=SS_OUT_SCHEMA,
        stateStructType=SS_STATE_SCHEMA,
        outputMode="update",
        timeoutConf="NoTimeout",
    )


# ---------------------------------------------------------------------------
# Streaming bitmap: EXACT distinct-user sets maintained across
# micro-batches — the exact companion to stream_hll's estimates, viable
# whenever ids are dense integers (the batch twin is
# analytics2.q_bitmap_sets).

BM_WORDS = 64  # 32-bit words per (type, block); block = user_id div 2048

BM_OUT_SCHEMA = "event_type string, blk long, w int, word long"
BM_STATE_SCHEMA = "word long"


def _bm_word_group(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state,
) -> Iterator[pd.DataFrame]:
    acc = 0
    for pdf in pdfs:
        for m in pdf["m"]:
            acc |= int(m)
    word = (state.get[0] if state.exists else 0) | acc
    state.update((word,))
    yield pd.DataFrame(
        [(str(key[0]), int(key[1]), int(key[2]), int(word))],
        columns=["event_type", "blk", "w", "word"],
    )


def stream_bitmap(
    spark,
    events_stream_dir: str,
    event_schema: str,
    max_files_per_trigger: int | None = None,
):
    """Streaming user-set bitmaps per event type: one packed 32-bit
    word of state per (type, block, word-index) group, OR-accumulated
    across micro-batches. Bitmap words are monotone under OR (like HLL
    registers under max), so the final table is the per-key max of the
    emitted updates and unions losslessly with batch-built bitmaps —
    downstream AND+popcount answers exact audience intersections over a
    stream that never stores raw user ids beyond the constant-size word
    table. Bit math stays JVM-side, identical to the batch
    ``bitmap_sets`` expressions; only (blk, w, m) ints cross into
    Python."""
    from pyspark.sql import functions as F

    reader = spark.readStream.schema(event_schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    events = reader.parquet(events_stream_dir)
    pos = events.select(
        "event_type",
        (F.col("user_id") / (BM_WORDS * 32)).cast("long").alias("blk"),
        ((F.col("user_id") % (BM_WORDS * 32)) / 32).cast("int").alias("w"),
        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(user_id % 32 AS INT))").alias("m"),
    )
    return pos.groupBy("event_type", "blk", "w").applyInPandasWithState(
        _bm_word_group,
        outputStructType=BM_OUT_SCHEMA,
        stateStructType=BM_STATE_SCHEMA,
        outputMode="update",
        timeoutConf="NoTimeout",
    )
