"""Lineage materialization with a cluster-safe strategy.

`localCheckpoint` stores blocks on executor local disk/memory: correct
and fast in local mode, but on a real cluster those blocks die with
their executor — a 10^12-row CC run would recompute whole iteration
chains or fail outright on one lost node. The reference's durable stage
boundary is the SQLite file itself (SURVEY §3.1, db_hashes.rs:45-71);
the Spark analog is a RELIABLE checkpoint against a fault-tolerant
filesystem.

Strategy selection is driven by the session's checkpoint dir: when
`spark.sparkContext.setCheckpointDir(<hdfs/object-store path>)` has
been configured (the production spark-submit does this), every lineage
cut in the engine goes through `df.checkpoint()` — replicated, survives
executor loss; otherwise `df.localCheckpoint()` (local mode, tests).
Both paths truncate lineage identically, so plans and results are the
same either way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def materialize(df: DataFrame, eager: bool = True) -> DataFrame:
    """Cut lineage: reliable `checkpoint()` when the session has a
    checkpoint dir configured, `localCheckpoint()` otherwise."""
    if checkpoint_is_reliable(df):
        return df.checkpoint(eager=eager)
    return df.localCheckpoint(eager=eager)


def checkpoint_is_reliable(df: DataFrame) -> bool:
    """True iff materialize() will take the replicated-checkpoint path."""
    return df.sparkSession.sparkContext.getCheckpointDir() is not None
