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
