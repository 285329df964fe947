"""Shared operator helpers."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Vertex-state DataFrames at or below this row count are broadcast in
#: iterative kernels.  Checkpointed state has no Catalyst size stats,
#: so AQE never auto-broadcasts it — without the hint the BIG edge
#: side reshuffles every round.  Above the threshold (billions of
#: vertices at 100 TB scale) state joins fall back to shuffle joins
#: against the edge table's persistent partitioning
#: (:meth:`Graph.canonical`), which shuffles only the O(nv) state.
BROADCAST_STATE_MAX_ROWS = 2_000_000


def state_hint(df: DataFrame, nv: int | None) -> DataFrame:
    """Broadcast-hint a vertex-state DataFrame when it is known-small."""
    if nv is not None and nv <= BROADCAST_STATE_MAX_ROWS:
        return F.broadcast(df)
    return df


#: Target edge rows per task for iterative kernels.  Iteration cost on
#: small inputs is dominated by per-stage task scheduling, so the edge
#: relation is coalesced to ``ceil(ne / EDGE_ROWS_PER_PARTITION)``
#: partitions (bounded below by 1) instead of inheriting the session's
#: shuffle parallelism; on a 100 TB table the same formula yields
#: thousands of partitions, i.e. it *is* the scale path, not a local
#: tweak.
EDGE_ROWS_PER_PARTITION = 250_000


def iter_partitions(ne: int, cap: int = 2048) -> int:
    """Partition count for an ``ne``-row edge relation in an
    iterative kernel: one task per ~250k edge rows."""
    return max(1, min(cap, (ne + EDGE_ROWS_PER_PARTITION - 1) // EDGE_ROWS_PER_PARTITION))
