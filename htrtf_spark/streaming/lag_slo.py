"""Lag SLO check over the streaming source's per-batch lag lineage
(sources/iceberg_stream.py ``lagMetricsDir`` → ``batch_lag.jsonl``).

The admission caps (``maxFilesPerTrigger`` / ``maxSnapshotsPerTrigger``
/ ``maxBytesPerTrigger``) bound per-batch work; the failure mode they
introduce is SILENT: an under-provisioned cap keeps every batch green
while the stream falls ever further behind the table head. The signal
is in the lag lineage — ``seq_lag`` (snapshot-sequence distance behind
the head) growing batch over batch means upstream commits outpace
consumption. This module turns that into an explicit alert:

- ``lag_growth``: seq_lag strictly increased over the last
  ``growth_batches`` consecutive batches (the under-provisioned-cap
  shape; a healthy capped drain shows lag falling to 0);
- ``lag_ceiling``: the latest seq_lag exceeds ``max_seq_lag`` (an
  absolute freshness budget, e.g. "never more than 100 commits
  behind").

Driver-side file reads only (the lineage is a bounded JSONL the source
appends one row per planned batch); no Spark job. Wired into
jobs/run_streaming_extraction.py so every drain tick self-reports.
"""

from __future__ import annotations

import json
import os

LAG_FILE = "batch_lag.jsonl"
ALERTS_FILE = "lag_alerts.jsonl"

DEFAULT_GROWTH_BATCHES = 3


def read_lag_rows(lag_metrics_dir: str) -> list[dict]:
    """All recorded batch-lag rows, in append (= batch) order; [] if
    the stream has not planned a batch yet."""
    path = os.path.join(lag_metrics_dir, LAG_FILE)
    if not os.path.exists(path):
        return []
    with open(path) as f:
        return [json.loads(line) for line in f if line.strip()]


def _trailing_growth_streak(lags: list[int]) -> int:
    """Number of consecutive strict increases at the END of the lag
    series (0 = the last step did not grow)."""
    streak = 0
    for prev, cur in zip(reversed(lags[:-1]), reversed(lags[1:])):
        if cur > prev:
            streak += 1
        else:
            break
    return streak


def check_lag_slo(
    lag_metrics_dir: str,
    growth_batches: int = DEFAULT_GROWTH_BATCHES,
    max_seq_lag: int | None = None,
) -> dict:
    """Evaluate the lag SLO. Returns {"ok", "alerts", "last_seq_lag",
    "growth_streak", "n_batches"}; ``alerts`` entries are
    {"kind": "lag_growth"|"lag_ceiling", ...} with the evidence
    inline. ``ok`` is True when there are no rows yet (a stream that
    never planned a batch is not behind)."""
    if growth_batches < 1:
        raise ValueError(f"growth_batches must be >= 1, got {growth_batches}")
    rows = read_lag_rows(lag_metrics_dir)
    # growth is judged over WORK batches only (start != end): restart
    # replans and idle polls log no-op rows (start == end, 0 files)
    # whose lag snapshots would break up a genuine falling-behind run.
    # The absolute ceiling below still sees every row.
    work = [
        r for r in rows
        if "start" not in r or "end" not in r or r["start"] != r["end"]
    ]
    lags = [int(r["seq_lag"]) for r in work]
    all_lags = [int(r["seq_lag"]) for r in rows]
    alerts: list[dict] = []
    streak = _trailing_growth_streak(lags) if lags else 0
    if lags and streak >= growth_batches:
        alerts.append(
            {
                "kind": "lag_growth",
                "streak": streak,
                "lags": lags[-(streak + 1):],
                "hint": "admission caps under-provisioned: upstream "
                        "commits outpace consumption",
            }
        )
    if max_seq_lag is not None and all_lags and all_lags[-1] > max_seq_lag:
        alerts.append(
            {
                "kind": "lag_ceiling",
                "seq_lag": all_lags[-1],
                "max_seq_lag": int(max_seq_lag),
            }
        )
    return {
        "ok": not alerts,
        "alerts": alerts,
        "last_seq_lag": all_lags[-1] if all_lags else 0,
        "growth_streak": streak,
        "n_batches": len(rows),
    }


def record_lag_alerts(lag_metrics_dir: str, result: dict) -> str | None:
    """Append fired alerts to ``lag_alerts.jsonl`` next to the lag
    lineage (one row per alert, stamped with the batch count at firing
    time so repeats are distinguishable). Returns the file path when
    anything was written."""
    if result["ok"]:
        return None
    import time

    path = os.path.join(lag_metrics_dir, ALERTS_FILE)
    os.makedirs(lag_metrics_dir, exist_ok=True)
    with open(path, "a") as f:
        for alert in result["alerts"]:
            f.write(
                json.dumps(
                    {
                        **alert,
                        "n_batches": result["n_batches"],
                        "ts_ms": int(time.time() * 1000),
                    },
                    sort_keys=True,
                )
                + "\n"
            )
    return path
