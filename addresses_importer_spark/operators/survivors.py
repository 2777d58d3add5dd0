"""Stage 5 — survivor selection + loser anti-join.

Graft of the reference's rank-sorted greedy representative pick and
mark-then-apply deletion:

- rank sort within pack, deterministic (rank, id) desc tiebreak:
  deduplicator.rs:157-164  →  row_number over (rank desc, clip_id desc);
- losers into ``_to_delete`` then one bulk DELETE:
  deduplicator.rs:228-241 + db_hashes.rs:306-319  →  losers DataFrame +
  LEFT ANTI join. The two stages stay separate (mark, then apply) so a
  resume can re-run `apply` without re-verifying (SURVEY §2.7 C4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def pick_losers(components: DataFrame, ranks: DataFrame) -> DataFrame:
    """(clip_id) rows to delete: every component member that is not its
    component's best (rank desc, clip_id desc) representative.

    ``ranks`` = (clip_id, rank); components = (clip_id, component).
    """
    w = Window.partitionBy("component").orderBy(
        F.desc("rank"), F.desc("clip_id")
    )
    return (
        components.join(ranks, "clip_id", "left")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") > 1)
        .select("clip_id")
    )


def apply_deletions(clips: DataFrame, losers: DataFrame) -> DataFrame:
    """Survivors = clips LEFT ANTI losers (db_hashes.rs:306-319 analog).

    Clips never seen in any verified edge are untouched — they simply
    aren't in ``losers``."""
    return clips.join(losers, "clip_id", "left_anti")


def survivor_table(components: DataFrame, ranks: DataFrame) -> DataFrame:
    """(component, clip_id) — the chosen representative per component
    (diagnostics / recall measurement)."""
    w = Window.partitionBy("component").orderBy(
        F.desc("rank"), F.desc("clip_id")
    )
    return (
        components.join(ranks, "clip_id", "left")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("component", "clip_id")
    )
