"""Iteration/reuse state materialization policy, shared by every
operator that truncates lineage (iterative connected components,
multi-consumer aggregates), plus the session-scoped scratch-dir policy
for operators that materialize to disk (streaming lifecycles,
partitioned-layout demos)."""

from __future__ import annotations

import atexit
import shutil
import tempfile

from pyspark.sql import DataFrame


def workdir(prefix: str) -> str:
    """A scratch directory that lives as long as the PROCESS, not the
    call: the streaming lifecycle queries return DataFrames that lazily
    read from their output dirs, so the dir can't be removed when the
    operator returns — but leaving it behind leaks a dir per invocation
    (a long-lived bench/test host accumulated hundreds). atexit removal
    keeps the contract (readable for the whole session) without the
    leak. Production pipelines would pass explicit durable paths instead."""
    d = tempfile.mkdtemp(prefix=prefix)
    atexit.register(shutil.rmtree, d, ignore_errors=True)
    return d


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
