"""As-of join semantics: strictly-earlier match, per-key isolation,
null when no earlier right row, deterministic under equal timestamps."""

from __future__ import annotations

from datetime import datetime

from htrtf_spark.operators.asof import asof_join


def _ts(s):
    return datetime.fromisoformat(s)


def test_asof_strictly_earlier(spark):
    left = spark.createDataFrame(
        [
            (1, _ts("2025-01-01T10:00:00"), 100, "L1"),
            (1, _ts("2025-01-01T10:05:00"), 101, "L2"),
            (1, _ts("2025-01-01T09:00:00"), 102, "L0"),  # before any right
            (2, _ts("2025-01-01T10:00:00"), 103, "Lx"),  # other key
        ],
        "user_id long, ts timestamp, event_id long, tag string",
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2025-01-01T09:30:00"), 200, 10),
            (1, _ts("2025-01-01T10:00:00"), 201, 20),  # equal ts to L1 → excluded for L1
            (1, _ts("2025-01-01T10:04:00"), 202, 30),
        ],
        "user_id long, ts timestamp, event_id long, v long",
    )
    out = asof_join(
        left, right, key="user_id", ts="ts", right_value_cols=["v"],
        left_tiebreak="event_id", right_tiebreak="event_id",
    )
    got = {r["tag"]: r["v_asof"] for r in out.collect()}
    assert got["L0"] is None          # nothing earlier
    assert got["L1"] == 10            # 09:30 row; the equal-ts 10:00 row excluded
    assert got["L2"] == 30            # latest earlier (10:04)
    assert got["Lx"] is None          # key isolation
    assert out.count() == left.count()  # left rows preserved 1:1


def test_asof_attaches_whole_row_not_stitched_values(spark):
    """The most recent right row is attached AS A UNIT: a genuinely NULL
    value in the latest right row must come through as NULL, never a
    stale value from an older row (and multi-column outputs must never
    mix rows)."""
    from htrtf_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [("k", 3, 30)], "key string, ts int, l_id int"
    )
    right = spark.createDataFrame(
        [("k", 1, 5, "a"), ("k", 2, None, "b")],
        "key string, ts int, v int, tag string",
    )
    out = asof_join(
        left, right, key="key", ts="ts",
        right_value_cols=["v", "tag"],
        left_tiebreak="l_id", right_tiebreak="ts",
    ).collect()[0]
    assert out["v_asof"] is None      # latest right row's v IS null
    assert out["tag_asof"] == "b"     # and both fields come from ts=2
