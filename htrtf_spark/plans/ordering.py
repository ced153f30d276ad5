"""Stable ordering + skew-defeating salted repartition.

North-rule requirements: per-turn output must be reproducible under a
stable (conv_id, turn_idx) ordering, and long conversations must not
create straggler tasks. The reference's analog of the skew problem is
very wide images, solved by width chunking
(/root/reference/Modules/layers.py:345-369); ours is conversation-salted
hash repartitioning: each conversation is spread over at most
``salt_factor`` partitions, so a 10^6-turn whale becomes ``salt_factor``
bounded tasks instead of one straggler, while small conversations stay
collocated.

Ordering NEVER comes from partition/file iteration order (the reference's
shuffle_set, /root/reference/Modules/utils.py:264-307, shows order is an
explicit operation there too) — it comes from a window sort keyed
(conv_id, turn_idx), totally tie-broken.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def salted_repartition(
    df: DataFrame, num_partitions: int, salt_factor: int = 8
) -> DataFrame:
    """Hash-repartition on (conv_id, salt) where salt ∈ [0, salt_factor)
    is derived deterministically from turn_idx — stateless per-row stages
    downstream see balanced partitions even with whale conversations."""
    salt = F.pmod(F.xxhash64("turn_idx"), F.lit(salt_factor))
    return df.repartition(num_partitions, F.col("conv_id"), salt)


def _content_tiebreak(df: DataFrame):
    """Deterministic final tie-break for rows sharing (conv_id, turn_idx,
    role): md5 of the content column (engine-portable — the oracle SQL
    can restate it). Duplicate keys occur in raw un-deduped ingest;
    without this the rank would follow shuffle arrival order."""
    for c in ("extracted_text", "text"):
        if c in df.columns:
            return [F.md5(F.coalesce(F.col(c), F.lit("")))]
    return []


def with_turn_rank(df: DataFrame, col_name: str = "rn") -> DataFrame:
    """Stable per-conversation rank (W3 in SURVEY.md §2.5): window sort on
    (turn_idx, role, md5(content)) — the only order source, totally
    tie-broken even under duplicate (conv_id, turn_idx, role) keys.
    (Rows identical in ALL columns remain interchangeable — any rank
    assignment among them yields the same output multiset.)"""
    w = Window.partitionBy("conv_id").orderBy(
        "turn_idx", "role", *_content_tiebreak(df)
    )
    return df.withColumn(col_name, F.row_number().over(w))


def stable_sorted(df: DataFrame) -> DataFrame:
    """Globally stable presentation order (range shuffle; use only when a
    totally-ordered materialization is required)."""
    return df.orderBy("conv_id", "turn_idx", "role", *_content_tiebreak(df))
