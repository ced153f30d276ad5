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

Bounded state, two eviction clocks:

- processing time: pass ``idle_timeout_ms`` — each update re-arms the
  timer; on expiry the state is removed, so the store size is
  O(conversations active within the window), not O(all conv_ids ever
  seen).
- event time: ``stream_conversation_state_event_time`` — the input must
  carry ``withWatermark`` on its ``ts`` column; each update pins the
  timeout at (max event ts seen for the conversation + gap), and Spark
  fires it when the WATERMARK (not the wall clock) passes that point.
  This is the correct clock for replayed/late data: a backfill running
  10× real time evicts at the same logical points as the live run.
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


# ------------------------------------------------------------------ event time

EVENT_STATE_DDL = CONV_STATE_DDL + ", max_ts_ms long"
EVICT_OUT_DDL = CONV_STATE_OUT_DDL + ", closed boolean"


def make_event_time_updater(gap_ms: int):
    """Update function for event-time eviction: the timeout is pinned at
    (max event timestamp seen for this conversation + gap) and fires when
    the stream's WATERMARK passes it — replay-safe, unlike the wall-clock
    variant. On expiry the conversation's final totals are emitted once
    with ``closed=true`` (a session-close record), then the state is
    dropped."""

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        def emit(n_turns, n_rejected, total_chars, closed):
            yield pd.DataFrame(
                {
                    "conv_id": [key[0]],
                    "n_turns": [n_turns],
                    "n_rejected": [n_rejected],
                    "total_chars": [total_chars],
                    "closed": [closed],
                }
            )

        if state.hasTimedOut:
            n_turns, n_rejected, total_chars, _max_ts = state.get
            state.remove()
            yield from emit(n_turns, n_rejected, total_chars, True)
            return
        n_turns, n_rejected, total_chars, max_ts_ms = (
            state.get if state.exists else (0, 0, 0, 0)
        )
        for pdf in pdfs:
            n_turns += len(pdf)
            n_rejected += int(pdf["reject_reason"].notna().sum())
            total_chars += int(pdf["n_chars"].fillna(0).sum())
            batch_max = pdf["ts"].max()
            if pd.notna(batch_max):
                max_ts_ms = max(max_ts_ms, int(batch_max.value // 1_000_000))
        state.update((n_turns, n_rejected, total_chars, max_ts_ms))
        # only arm the timer once a real event timestamp has been seen:
        # with all-NULL ts, max_ts_ms is still 0 and Spark rejects a
        # 1970 timeout as not later than the watermark, killing the query
        if max_ts_ms > 0:
            state.setTimeoutTimestamp(max_ts_ms + gap_ms)
        yield from emit(n_turns, n_rejected, total_chars, False)

    return update


def stream_conversation_state_event_time(
    extracted: DataFrame, gap: str = "30 minutes", watermark: str = "10 minutes"
) -> DataFrame:
    """Event-time-evicted per-conversation running stats. ``extracted``
    must carry the ``ts`` event-time column (stream_extract does); the
    watermark both bounds late data and drives eviction: a conversation
    whose last turn is older than (watermark - gap) emits one final
    ``closed=true`` row and leaves the state store."""
    gap_ms = _duration_ms(gap)
    return (
        extracted.withWatermark("ts", watermark)
        .groupBy("conv_id")
        .applyInPandasWithState(
            make_event_time_updater(gap_ms),
            outputStructType=EVICT_OUT_DDL,
            stateStructType=EVENT_STATE_DDL,
            outputMode="update",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def _duration_ms(spec: str) -> int:
    """'30 minutes' / '90 seconds' / '250 milliseconds' → ms (the tiny
    subset of Spark's CalendarInterval syntax these APIs take)."""
    qty, unit = spec.strip().split()
    unit = unit.rstrip("s")
    scale = {"millisecond": 1, "second": 1000, "minute": 60_000, "hour": 3_600_000}
    if unit not in scale:
        raise ValueError(f"unsupported duration unit in {spec!r}")
    return int(qty) * scale[unit]
