"""Iteration/reuse state materialization policy, shared by every
operator that truncates lineage (iterative connected components,
multi-consumer aggregates)."""

from __future__ import annotations

from pyspark.sql import DataFrame


def ckpt(df: DataFrame, eager: bool = True) -> DataFrame:
    """Materialize a state relation, truncating lineage.

    Fault-tolerance policy: if the session has a RELIABLE checkpoint
    directory configured (spark.sparkContext.setCheckpointDir — HDFS/S3
    in production), use checkpoint(): state survives executor loss,
    which matters for iterative algorithms at 100 TB where losing one
    executor mid-iteration would otherwise recompute everything
    upstream. Without one (local dev/test), localCheckpoint() keeps the
    blocks on executors — faster, but state dies with the executor and
    the lineage is gone, so a failure means rerunning the query."""
    sc = df.sparkSession.sparkContext
    if sc.getCheckpointDir() is not None:
        return df.checkpoint(eager=eager)
    return df.localCheckpoint(eager=eager)
