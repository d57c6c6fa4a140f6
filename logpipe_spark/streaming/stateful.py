"""Custom stateful streaming operator via applyInPandasWithState.

The reference's only cross-event state is the per-file offset/line ledger
(`struct TraceFile`, `src-plugins/logpipe-input-file.c:10-36`) — a running
counter per key that survives across reads. Generalized here: a per-
conversation running state (turns seen, chars seen, last turn index,
monotonicity violations) maintained across micro-batches by the streaming
state store, updated in Arrow batches.

At scale: state is partitioned by conv_id (the natural shuffle key);
GroupStateTimeout.NoTimeout because transcript conversations are bounded;
a production deployment with unbounded keys would use event-time timeout +
watermark to expire idle conversations.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = "turns LONG, chars LONG, last_turn LONG, violations LONG"
OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turns", T.LongType()),
        T.StructField("chars", T.LongType()),
        T.StructField("last_turn", T.LongType()),
        T.StructField("violations", T.LongType()),
    ]
)


def _track_conv(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Update the running ledger for one conversation (the TraceFile
    analogue: trace_offset → chars, trace_line → turns)."""
    if state.exists:
        turns, chars, last_turn, violations = state.get
    else:
        turns, chars, last_turn, violations = 0, 0, -1, 0
    for pdf in pdfs:
        pdf = pdf.sort_values("turn_idx")
        turns += len(pdf)
        chars += int(pdf["text"].str.len().sum())
        idx = pdf["turn_idx"].to_numpy()
        if len(idx):
            # vectorized monotonicity check: each index vs its predecessor
            # (the carried last_turn seeds the first comparison)
            import numpy as np

            prevs = np.concatenate(([last_turn], idx[:-1]))
            violations += int((idx <= prevs).sum())
            last_turn = int(idx[-1])
    state.update((turns, chars, last_turn, violations))
    yield pd.DataFrame(
        {
            "conv_id": [key[0]],
            "turns": [turns],
            "chars": [chars],
            "last_turn": [last_turn],
            "violations": [violations],
        }
    )


def conversation_ledger_stream(stream_df: DataFrame) -> DataFrame:
    """streaming transcripts → running per-conversation ledger rows
    (one row per conv per micro-batch, cumulative)."""
    return stream_df.groupBy("conv_id").applyInPandasWithState(
        _track_conv,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
