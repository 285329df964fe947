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
