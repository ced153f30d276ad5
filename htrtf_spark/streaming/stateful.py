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

Bounded state: pass ``idle_timeout_ms`` to evict conversations that
receive no turns for that long (processing-time timeout — each update
re-arms the timer; on expiry the state is removed, so the store size is
O(conversations active within the window), not O(all conv_ids ever
seen). Event-time eviction would instead use GroupStateTimeout
.EventTimeTimeout + withWatermark upstream.)
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

CONV_STATE_DDL = "n_turns long, n_rejected long, total_chars long"
CONV_STATE_OUT_DDL = "conv_id string, " + CONV_STATE_DDL  # derived, drift-proof


def make_conversation_updater(idle_timeout_ms: int | None = None):
    """Build the applyInPandasWithState update function. With a timeout,
    each batch re-arms the idle timer and an expiry invocation removes
    the state and emits nothing (its running totals were already emitted
    on every batch the conversation appeared in — update output mode)."""

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if idle_timeout_ms is not None and state.hasTimedOut:
            state.remove()
            return
        n_turns, n_rejected, total_chars = state.get if state.exists else (0, 0, 0)
        for pdf in pdfs:
            n_turns += len(pdf)
            n_rejected += int(pdf["reject_reason"].notna().sum())
            total_chars += int(pdf["n_chars"].fillna(0).sum())
        state.update((n_turns, n_rejected, total_chars))
        if idle_timeout_ms is not None:
            state.setTimeoutDuration(idle_timeout_ms)
        yield pd.DataFrame(
            {
                "conv_id": [key[0]],
                "n_turns": [n_turns],
                "n_rejected": [n_rejected],
                "total_chars": [total_chars],
            }
        )

    return update


def stream_conversation_state(
    extracted: DataFrame, idle_timeout_ms: int | None = None
) -> DataFrame:
    """Per-conv_id running (n_turns, n_rejected, total_chars), one updated
    row emitted per conversation per micro-batch it appears in. Input is
    the streaming extraction output (stream_extract). Pass
    ``idle_timeout_ms`` in production to bound the state store."""
    return extracted.groupBy("conv_id").applyInPandasWithState(
        make_conversation_updater(idle_timeout_ms),
        outputStructType=CONV_STATE_OUT_DDL,
        stateStructType=CONV_STATE_DDL,
        outputMode="update",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if idle_timeout_ms is not None
            else GroupStateTimeout.NoTimeout
        ),
    )
