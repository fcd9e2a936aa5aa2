"""Custom stateful streaming operator: running per-partition profile
accumulation across micro-batches via applyInPandasWithState.

This is the "custom stateful operator" tier of the streaming surface
(SURVEY §2B): state = running (docs, spans, text nulls, offset max) per
partition_id; every micro-batch folds its Arrow batches into the state
and emits the updated running profile row, so downstream drift checks
can compare a partition's lifetime profile against the baseline without
re-reading history.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = "n_docs LONG, n_spans LONG, n_text LONG, n_text_null LONG, offset_max LONG"
OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("partition_id", T.IntegerType(), False),
        T.StructField("n_docs", T.LongType(), False),
        T.StructField("n_spans", T.LongType(), False),
        T.StructField("text_null_ratio", T.DoubleType(), True),
        T.StructField("offset_max", T.LongType(), True),
    ]
)


def _fold(
    key: Tuple[Any, ...],
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Folds PRE-FLATTENED span rows (partition_id, span_idx, kind,
    text, offset — the explode runs JVM-side in Catalyst before the
    state operator, see running_partition_profiles) with vectorized
    pandas reductions; no per-span Python loop."""
    n_docs, n_spans, n_text, n_text_null, offset_max = (
        state.get if state.exists else (0, 0, 0, 0, None)
    )
    for pdf in pdfs:
        idx = pdf["span_idx"]
        # a doc contributes exactly one row with span_idx 0 (first span)
        # or null (posexplode_outer's row for a null/empty spans array)
        n_docs += int((idx.isna() | (idx == 0)).sum())
        n_spans += int(idx.notna().sum())
        text_mask = pdf["kind"] == "text"
        n_text += int(text_mask.sum())
        n_text_null += int((text_mask & pdf["text"].isna()).sum())
        off_max = pdf["offset"].max()
        if pd.notna(off_max) and (offset_max is None or int(off_max) > offset_max):
            offset_max = int(off_max)
    state.update((n_docs, n_spans, n_text, n_text_null, offset_max))
    yield pd.DataFrame(
        {
            "partition_id": [int(key[0])],
            "n_docs": [n_docs],
            "n_spans": [n_spans],
            # SAME definition as the batch profiler (profile_spans):
            # nulls among TEXT spans / text spans — comparable lifetime
            # vs baseline numbers; offset_max stays null until an offset
            # is actually observed (batch emits null there too)
            "text_null_ratio": [n_text_null / n_text if n_text else None],
            "offset_max": [offset_max],
        }
    )


def running_partition_profiles(docs_stream: DataFrame) -> DataFrame:
    """Streaming DataFrame of running per-partition profiles. Apply to
    a readStream of the documents table; each micro-batch emits one
    updated row per touched partition.

    The spans explode runs in Catalyst (whole-stage-codegen'd,
    posexplode_outer keeps empty/null-span docs as a null-index row so
    the doc count survives); only the already-flat numeric/string
    columns cross the Arrow boundary into the vectorized state fold."""
    from pyspark.sql import functions as F

    flat = docs_stream.select(
        "partition_id", F.posexplode_outer("spans").alias("span_idx", "s")
    ).select(
        "partition_id",
        "span_idx",
        F.col("s.kind").alias("kind"),
        F.col("s.text").alias("text"),
        F.col("s.offset").alias("offset"),
    )
    return flat.groupBy("partition_id").applyInPandasWithState(
        _fold,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
