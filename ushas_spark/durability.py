"""Plan-truncation durability policy for iterative operators.

Iterative DataFrame algorithms (label-propagation connected components,
LSH signature reuse, inverted-index materialization) must truncate the
logical plan every round or the driver dies re-optimizing a plan that
doubles per iteration. Two ways to truncate:

- ``localCheckpoint(eager=True)`` (the default): blocks live on executor
  local storage. Fast -- no DFS write -- and correct on a healthy
  cluster, but executor-LOCAL: lose an executor (preemptible/spot nodes,
  OOM kills) and the blocks are gone AND unrecomputable, failing the job.
  Fine on local[N]; a liability for long 100 TB jobs on flaky fleets.
- reliable ``checkpoint(eager=True)``: writes to the session checkpoint
  directory (HDFS/S3 on a cluster). One extra DFS round-trip per
  iteration buys full executor-loss tolerance -- the same resilience the
  reference gets from shuffle-stage recomputation
  (reference: core/src/main/scala/org/apache/spark/rdd/RDD.scala
  ``checkpoint`` vs ``localCheckpoint`` docs).

Toggle per-session with :func:`set_reliable` (or the
``USHAS_RELIABLE_CHECKPOINT=1`` env var, read at import): the iterative
operators all route through :func:`materialize`, so one switch moves
every truncation point. Default stays local -- identical plans and
timings to previous rounds on local[32].
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame

_RELIABLE = os.environ.get("USHAS_RELIABLE_CHECKPOINT", "") in ("1", "true")


def set_reliable(on: bool) -> None:
    """Switch every subsequent :func:`materialize` call between
    executor-local (fast, not fault-tolerant) and reliable (checkpoint
    dir, executor-loss tolerant) truncation."""
    global _RELIABLE
    _RELIABLE = on


def is_reliable() -> bool:
    return _RELIABLE


def materialize(df: DataFrame, eager: bool = True) -> DataFrame:
    """Materialize ``df`` and TRUNCATE its logical plan.

    Local mode: ``localCheckpoint``. Reliable mode: ``checkpoint`` to the
    session's checkpoint dir (auto-set to a temp dir if the session has
    none -- on a real cluster, point it at DFS via
    ``spark.sparkContext.setCheckpointDir("hdfs://...")`` first).
    """
    if not _RELIABLE:
        return df.localCheckpoint(eager=eager)
    sc = df.sparkSession.sparkContext
    if sc._jsc.sc().getCheckpointDir().isEmpty():
        sc.setCheckpointDir(tempfile.mkdtemp(prefix="ushas_ckpt_"))
    return df.checkpoint(eager=eager)
