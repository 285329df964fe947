"""Binary CSR graph file (``.g``) and actions file (``.a``) I/O.

Reference formats (SURVEY.md §1.2), all fields little-endian uint64:

``.g``  (written ``rmatter/src/rmatter.c:317-327``)::

    endian_check = 0x1234ABCD | nv | ne | off[nv+1] | ind[ne] | wgt[ne]

``.a``  (written ``rmatter.c:375-384``)::

    endian_check | num_actions | (i, j) pairs as 2*num_actions int64

Readers honor the byte-swap fallback of the reference's "snarf" loader
(``tests/stinger/src/util/stinger-utils.c:126-151,242-243``): if the
endian check mismatches, the whole file is byte-swapped.

These are driver-side numpy parses by design: the formats are single
binary files (inherently one reader), and the canonical at-scale
storage is the Parquet edge table (:func:`save_graph`) — the binary
formats exist for interchange with the reference tooling.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession

ENDIAN_CHECK = 0x1234ABCD


#: ``write_graph_file`` materializes the edge list on the driver — by
#: design (the ``.g`` format is a single little-endian binary blob the
#: reference mmaps; parallel writers can't produce it).  Guard against
#: accidental use on large graphs: past this row count the driver
#: would need >~4 GB just for Row objects — export Parquet
#: (``save_graph``) instead, the canonical format at scale.
MAX_DRIVER_EXPORT_ROWS = 50_000_000


def write_graph_file(edges: DataFrame, path: str) -> tuple[int, int]:
    """Export a symmetric edge DataFrame to a ``.g`` CSR file.

    Vertices are ``0..max_id``; rows must be the directed (symmetric)
    edge set.  Returns ``(nv, ne)``.

    Driver-side by design (single binary blob): refuses row counts
    past :data:`MAX_DRIVER_EXPORT_ROWS` — at that size the reference's
    own toolchain reads Parquet via ``save_graph`` anyway.
    """
    n = edges.count()
    if n > MAX_DRIVER_EXPORT_ROWS:
        raise ValueError(
            f".g export is a driver-side collect ({n} rows > "
            f"{MAX_DRIVER_EXPORT_ROWS}); use save_graph (Parquet) at this scale"
        )
    rows = edges.select("src", "dst", "wgt").orderBy("src", "dst").collect()
    if rows:
        src = np.fromiter((r.src for r in rows), dtype=np.int64, count=len(rows))
        ind = np.fromiter((r.dst for r in rows), dtype=np.int64, count=len(rows))
        wgt = np.fromiter((r.wgt for r in rows), dtype=np.int64, count=len(rows))
        nv = int(max(src.max(), ind.max())) + 1
        # the .g format stores a dense offsets[0..nv] array — a
        # namespaced/sparse id space (e.g. datasets' high-bit supplier
        # offset) would allocate nv >> ne offsets; remap first
        if nv > 4 * len(rows) + 64:
            raise ValueError(
                f".g export needs dense vertex ids: max id {nv - 1} vs "
                f"{len(rows)} edges — remap via physmap/zipWithIndex first"
            )
    else:
        src = ind = wgt = np.array([], dtype=np.int64)
        nv = 0
    ne = len(ind)
    off = np.zeros(nv + 1, dtype=np.int64)
    np.add.at(off, src + 1, 1)
    off = np.cumsum(off)
    with open(path, "wb") as f:
        np.array([ENDIAN_CHECK, nv, ne], dtype="<u8").tofile(f)
        off.astype("<u8").tofile(f)
        ind.astype("<u8").tofile(f)
        wgt.astype("<u8").tofile(f)
    return nv, ne


def read_graph_file(spark: SparkSession, path: str) -> DataFrame:
    """Parse a ``.g`` CSR file into an ``edges(src, dst, wgt)``
    DataFrame (byte-swap fallback like the reference snarf loader)."""
    raw = np.fromfile(path, dtype="<u8")
    if int(raw[0]) != ENDIAN_CHECK:
        raw = raw.byteswap()
        if int(raw[0]) != ENDIAN_CHECK:
            raise ValueError(f"{path}: bad endian check {raw[0]:#x}")
    nv, ne = int(raw[1]), int(raw[2])
    off = raw[3 : 3 + nv + 1].astype(np.int64)
    ind = raw[3 + nv + 1 : 3 + nv + 1 + ne].astype(np.int64)
    wgt = raw[3 + nv + 1 + ne : 3 + nv + 1 + 2 * ne].astype(np.int64)
    src = np.repeat(np.arange(nv, dtype=np.int64), np.diff(off))
    import pandas as pd

    pdf = pd.DataFrame({"src": src, "dst": ind, "wgt": wgt})
    # explicit schema: an empty .g file has no rows to infer from
    return spark.createDataFrame(pdf, "src long, dst long, wgt long")


def write_actions_file(actions: DataFrame, path: str) -> int:
    """Export complement-encoded actions ``(seq, src, dst)`` to ``.a``
    (pairs in ``seq`` order).  Returns the action count."""
    rows = actions.select("seq", "src", "dst").orderBy("seq").collect()
    pairs = np.empty(2 * len(rows), dtype=np.int64)
    for i, r in enumerate(rows):
        pairs[2 * i] = r.src
        pairs[2 * i + 1] = r.dst
    with open(path, "wb") as f:
        np.array([ENDIAN_CHECK, len(rows)], dtype="<u8").tofile(f)
        pairs.astype("<i8").tofile(f)
    return len(rows)


def read_actions_file(spark: SparkSession, path: str) -> DataFrame:
    """Parse a ``.a`` file into ``actions(seq, src, dst, weight)``
    (still complement-encoded; decode with
    :func:`operators.updates.decode_actions`)."""
    with open(path, "rb") as f:
        head = np.fromfile(f, dtype="<u8", count=2)
        if int(head[0]) != ENDIAN_CHECK:
            head = head.byteswap()
            swap = True
            if int(head[0]) != ENDIAN_CHECK:
                raise ValueError(f"{path}: bad endian check")
        else:
            swap = False
        na = int(head[1])
        pairs = np.fromfile(f, dtype="<i8", count=2 * na)
        if swap:
            pairs = pairs.byteswap()
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "seq": np.arange(na, dtype=np.int64),
            "src": pairs[0::2],
            "dst": pairs[1::2],
            "weight": np.ones(na, dtype=np.int64),
        }
    )
    return spark.createDataFrame(pdf)


# ---------------------------------------------------------------------------
# S8: graph save / restore (parquet checkpoint — the at-scale format)
# ---------------------------------------------------------------------------


def save_graph(edges: DataFrame, directory: str, vertices: DataFrame | None = None) -> None:
    """STINGER save-to-disk analog (``include/stinger.h:34-44``):
    parquet checkpoint of the edge (and optional vertex) tables."""
    edges.write.mode("overwrite").parquet(f"{directory}/edges.parquet")
    if vertices is not None:
        vertices.write.mode("overwrite").parquet(f"{directory}/vertices.parquet")


def restore_graph(spark: SparkSession, directory: str) -> DataFrame:
    return spark.read.parquet(f"{directory}/edges.parquet")
