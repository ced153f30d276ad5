"""Custom stateful streaming operator: per-conversation cumulative
acceptance stats folded across micro-batches via applyInPandasWithState.

This is the streaming form of the reference's cross-batch incremental
accumulators — cost/CER/WER are folded batch-by-batch through
``previousCost/previousEDabs/previousEDnorm`` placeholder feeds
(/root/reference/Projects/IAM_lines/Structure_006/Structure_006.py:128,147,155-157,
fed back at /root/reference/Modules/tasks.py:162-164): state persists
between batches and each batch emits the updated running aggregate. In
batch Spark that pattern is just partial+final aggregation (SURVEY §1.4);
under an unbounded feed it needs keyed state, which is exactly
``applyInPandasWithState`` (GroupState keyed by conv_id, Arrow-batched
update function — still no per-row Python).

Scale note: state is O(distinct conv_ids in flight) × 3 longs; with
watermark-driven timeout eviction (``timeout='ProcessingTimeTimeout'``
in production) the state store stays bounded no matter how long the
feed runs.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

CONV_STATE_DDL = "n_turns long, n_rejected long, total_chars long"
CONV_STATE_OUT_DDL = (
    "conv_id string, n_turns long, n_rejected long, total_chars long"
)


def _update_conversation(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n_turns, n_rejected, total_chars = state.get if state.exists else (0, 0, 0)
    for pdf in pdfs:
        n_turns += len(pdf)
        n_rejected += int(pdf["reject_reason"].notna().sum())
        total_chars += int(pdf["n_chars"].fillna(0).sum())
    state.update((n_turns, n_rejected, total_chars))
    yield pd.DataFrame(
        {
            "conv_id": [key[0]],
            "n_turns": [n_turns],
            "n_rejected": [n_rejected],
            "total_chars": [total_chars],
        }
    )


def stream_conversation_state(extracted: DataFrame) -> DataFrame:
    """Per-conv_id running (n_turns, n_rejected, total_chars), one updated
    row emitted per conversation per micro-batch it appears in. Input is
    the streaming extraction output (stream_extract)."""
    return extracted.groupBy("conv_id").applyInPandasWithState(
        _update_conversation,
        outputStructType=CONV_STATE_OUT_DDL,
        stateStructType=CONV_STATE_DDL,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
