"""Releasing localCheckpoint storage when an operator is done with it.

``DataFrame.localCheckpoint`` stores the materialized partitions in
the executors' block managers and TRUNCATES lineage — the blocks are
the only copy, and nothing ever unpersists them. For a one-shot job
that exits, fine; for a long-lived session running many operators
(the bench's ~90 queries × N runs, a notebook, a streaming driver),
every superseded iteration of a label-propagation loop and every
committed MERGE's pinned source stays resident forever. Measured in
the r13 bench session: GBs of dead blocks, and 3-10× inflation of
late queries purely from the resulting memory pressure (guide §5
"unpersist when done").

``unpersist_checkpoint`` frees a checkpointed DataFrame's blocks via
the analyzed plan's LogicalRDD. Callers must only invoke it when the
checkpointed data is provably DEAD — after unpersist the data is
gone (lineage was truncated), so any later action on a plan that
references it fails with CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND. Safe
sites: a loop's round-(i-1) state once round i is materialized, and
an operator's internal pins once its commit has returned.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def unpersist_checkpoint(df: DataFrame | None, blocking: bool = False) -> bool:
    """Free the block-manager storage behind a ``localCheckpoint``'ed
    DataFrame. Returns True when a checkpointed RDD was found and
    unpersisted; False (never raises) otherwise — callers treat this
    as best-effort cleanup, so an unexpected plan shape must degrade
    to the old leak-until-exit behavior, not to a failure."""
    if df is None:
        return False
    try:
        plan = df._jdf.queryExecution().analyzed()
        # the checkpointed frame's analyzed plan is the LogicalRDD
        # itself, possibly under metadata-only nodes (Project of the
        # same columns, SubqueryAlias); walk single-child nodes down
        while True:
            cls = plan.getClass().getSimpleName()
            if cls == "LogicalRDD":
                plan.rdd().unpersist(blocking)
                return True
            children = plan.children()
            if children.size() != 1:
                return False
            plan = children.apply(0)
    except Exception:
        return False
