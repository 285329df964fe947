"""Distributed ``.g`` CSR reader as a Spark Python DataSource.

The round-1 reader (:func:`csr.read_graph_file`) parses the whole
binary on the driver — fine for the reference's test-scale
round-trips, wrong at 267M edges.  This DataSource splits the file
into EDGE-BALANCED vertex ranges (boundaries via ``searchsorted`` on
the offset array, so a hub-heavy prefix doesn't starve the tail) and
each task mmaps only its ``ind``/``wgt`` byte range, yielding Arrow
batches — zero driver materialization, linear scan bandwidth per
task.

Reference format (``tests/stinger/main.c`` snarf loader): little-
endian u64 stream ``[endian_check, nv, ne, off[nv+1], ind[ne],
wgt[ne]]`` with a byteswap fallback when the check word mismatches.

Usage::

    spark.dataSource.register(CSRGraphDataSource)
    df = (spark.read.format("csrg")
          .option("path", "/path/graph.g")
          .option("partitions", "8").load())
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

from .csr import ENDIAN_CHECK


class CSRRangePartition(InputPartition):
    """A contiguous vertex range [v_start, v_end) plus the byte
    geometry needed to slice ``ind``/``wgt`` without re-reading the
    offsets on the executor."""

    def __init__(
        self,
        path: str,
        swap: bool,
        nv: int,
        ne: int,
        v_start: int,
        v_end: int,
        e_start: int,
        e_end: int,
    ):
        self.path = path
        self.swap = swap
        self.nv = nv
        self.ne = ne
        self.v_start = v_start
        self.v_end = v_end
        self.e_start = e_start
        self.e_end = e_end


class CSRGraphReader(DataSourceReader):
    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("csrg source requires .option('path', ...)")
        self.n_partitions = int(options.get("partitions", "8"))
        self.batch_edges = int(options.get("batch_edges", str(self.BATCH_EDGES)))
        if self.batch_edges < 1:
            raise ValueError(
                f"batch_edges must be >= 1, got {self.batch_edges}"
            )

    def partitions(self):
        import numpy as np

        # header + offsets only (8·(nv+2) bytes) — NOT ind/wgt
        head = np.fromfile(self.path, dtype="<u8", count=3)
        swap = False
        if int(head[0]) != ENDIAN_CHECK:
            head = head.byteswap()
            swap = True
            if int(head[0]) != ENDIAN_CHECK:
                raise ValueError(f"{self.path}: bad endian check")
        nv, ne = int(head[1]), int(head[2])
        off = np.fromfile(self.path, dtype="<u8", count=nv + 1, offset=3 * 8)
        if swap:
            off = off.byteswap()
        off = off.astype(np.int64)
        n_parts = max(1, min(self.n_partitions, max(ne, 1)))
        # edge-balanced split: vertex boundary where the edge prefix
        # crosses each 1/n_parts quantile of ne
        targets = [(ne * i) // n_parts for i in range(1, n_parts)]
        bounds = [0]
        for t in targets:
            v = int(np.searchsorted(off, t, side="left"))
            v = min(max(v, bounds[-1]), nv)
            bounds.append(v)
        bounds.append(nv)
        out = []
        for a, b in zip(bounds, bounds[1:]):
            if a == b and not (a == 0 and b == nv):
                continue
            out.append(
                CSRRangePartition(
                    self.path, swap, nv, ne, a, b, int(off[a]), int(off[b])
                )
            )
        return out or [CSRRangePartition(self.path, swap, nv, ne, 0, nv, 0, ne)]

    # Bounded Arrow batch size (edges per yielded record batch).
    # 2M edges × 3 int64 columns ≈ 48 MB per batch — the partition's
    # byte range is streamed through fixed-size batches instead of
    # materialized whole (ADVICE r2: a 267M-edge file over 8
    # partitions would otherwise build multi-hundred-MB batches and
    # lose the linear-scan-bandwidth goal).
    BATCH_EDGES = 2_000_000

    def read(self, partition: CSRRangePartition):
        import numpy as np
        import pyarrow as pa

        p = partition
        n_off = p.v_end - p.v_start + 1
        n_e = p.e_end - p.e_start
        if n_e <= 0:
            return
        base = 3 * 8
        # offsets for this vertex range only: 8·(range+1) bytes, the
        # per-vertex geometry needed to expand src ids chunk-by-chunk
        off = np.fromfile(
            p.path, dtype="<u8", count=n_off, offset=base + 8 * p.v_start
        )
        if p.swap:
            off = off.byteswap()
        off = off.astype(np.int64)  # absolute edge offsets, ascending
        ind_base = base + 8 * (p.nv + 1)
        wgt_base = ind_base + 8 * p.ne
        step = self.batch_edges
        for c0 in range(p.e_start, p.e_end, step):
            c1 = min(c0 + step, p.e_end)
            n = c1 - c0
            ind = np.fromfile(
                p.path, dtype="<u8", count=n, offset=ind_base + 8 * c0
            )
            wgt = np.fromfile(
                p.path, dtype="<u8", count=n, offset=wgt_base + 8 * c0
            )
            if p.swap:
                ind, wgt = ind.byteswap(), wgt.byteswap()
            # vertices whose adjacency intersects [c0, c1): boundary
            # offsets clipped to the chunk give per-vertex run lengths
            i_lo = int(np.searchsorted(off, c0, side="right")) - 1
            i_hi = int(np.searchsorted(off, c1, side="left"))
            counts = np.clip(off[i_lo : i_hi + 1], c0, c1)
            src = np.repeat(
                np.arange(
                    p.v_start + i_lo, p.v_start + i_hi, dtype=np.int64
                ),
                np.diff(counts),
            )
            yield pa.record_batch(
                [
                    pa.array(src, type=pa.int64()),
                    pa.array(ind.astype(np.int64), type=pa.int64()),
                    pa.array(wgt.astype(np.int64), type=pa.int64()),
                ],
                names=["src", "dst", "wgt"],
            )


class CSRGraphDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "csrg"

    def schema(self) -> str:
        return "src long, dst long, wgt long"

    def reader(self, schema) -> CSRGraphReader:
        return CSRGraphReader(self.options)


def read_graph_file_distributed(
    spark, path: str, partitions: int = 8, batch_edges: int | None = None
):
    """Partitioned ``.g`` read — the scale path.  Registers the
    source idempotently and returns ``edges(src, dst, wgt)``.
    ``batch_edges`` bounds the per-yield Arrow batch size (default
    :attr:`CSRGraphReader.BATCH_EDGES`)."""
    spark.dataSource.register(CSRGraphDataSource)
    reader = (
        spark.read.format("csrg")
        .option("path", path)
        .option("partitions", str(partitions))
    )
    if batch_edges is not None:
        reader = reader.option("batch_edges", str(batch_edges))
    return reader.load()


# ---------------------------------------------------------------------------
# Streaming .a action source (replayable offset ranges)
# ---------------------------------------------------------------------------


class ActionStreamReader(SimpleDataSourceStreamReader):
    """Streams a ``.a`` action file in ``batch_size`` chunks.

    Offsets are the absolute action index (``{"pos": n}``), so any
    range is replayable byte-exactly (``readBetweenOffsets`` seeks to
    ``16 + 16·start`` and reads ``2·(end−start)`` i8 words) — the
    property Structured Streaming needs for exactly-once recovery.
    The reference replays these files as timed batches
    (``tests/stinger/main.c:165-204``); here the same file is a
    first-class streaming source feeding ``apply_actions``."""

    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("csra source requires .option('path', ...)")
        self.batch_size = int(options.get("batch_size", "10000"))
        import numpy as np

        head = np.fromfile(self.path, dtype="<u8", count=2)
        self.swap = int(head[0]) != ENDIAN_CHECK
        if self.swap:
            head = head.byteswap()
            if int(head[0]) != ENDIAN_CHECK:
                raise ValueError(f"{self.path}: bad endian check")
        self.na = int(head[1])

    def initialOffset(self) -> dict:
        return {"pos": 0}

    def _slice(self, start: int, end: int):
        import numpy as np

        n = end - start
        if n <= 0:
            return iter([])
        pairs = np.fromfile(
            self.path, dtype="<i8", count=2 * n, offset=16 + 16 * start
        )
        if self.swap:
            pairs = pairs.byteswap()
        # an iterator over a materialized list: the runner calls
        # next() on it (so no bare list) but also pickles the rows it
        # drains (so no numpy scalars / lazy state)
        return iter(
            [
                (start + i, int(pairs[2 * i]), int(pairs[2 * i + 1]))
                for i in range(n)
            ]
        )

    def read(self, start: dict):
        s = int(start["pos"])
        e = min(s + self.batch_size, self.na)
        return self._slice(s, e), {"pos": e}

    def readBetweenOffsets(self, start: dict, end: dict):
        return self._slice(int(start["pos"]), int(end["pos"]))

    def commit(self, end: dict) -> None:
        pass


class ActionStreamDataSource(DataSource):
    """``spark.readStream.format("csra").option("path", f)`` —
    complement-encoded actions ``(seq, src, dst)`` as a stream."""

    @classmethod
    def name(cls) -> str:
        return "csra"

    def schema(self) -> str:
        return "seq long, src long, dst long"

    def simpleStreamReader(self, schema) -> ActionStreamReader:
        return ActionStreamReader(self.options)


def action_stream(spark, path: str, batch_size: int = 10000):
    """Register (idempotent) and open the ``.a`` streaming source."""
    spark.dataSource.register(ActionStreamDataSource)
    return (
        spark.readStream.format("csra")
        .option("path", path)
        .option("batch_size", str(batch_size))
        .load()
    )


# ---------------------------------------------------------------------------
# Distributed .g writer — the inverse of CSRRangePartition
# ---------------------------------------------------------------------------


def write_graph_file_distributed(
    edges, path: str, partitions: int = 8
) -> tuple[int, int]:
    """Export a symmetric edge DataFrame to a ``.g`` CSR file with
    PARALLEL section writers — the scale inverse of the partitioned
    reader (reference writer: ``rmatter/src/rmatter.c:317-327``).

    The ``.g`` layout is three contiguous little-endian uint64
    sections (``off[nv+1] | ind[ne] | wgt[ne]``) after the header.
    Each section is written as range-ordered binary part files by the
    executors — offsets from the two-level distributed prefix sum
    (:func:`operators.prefix.range_prefix_sum`, so zero single-task
    sorts), ind/wgt from the (src, dst)-range-sorted edge slices —
    and the driver streams the parts into the final file with
    bounded-memory ``copyfileobj`` concatenation.  No edge row ever
    reaches the driver, so there is no
    :data:`csr.MAX_DRIVER_EXPORT_ROWS` ceiling.

    Byte-identical to :func:`csr.write_graph_file` on the same edge
    set (asserted in tests).  Requires executors and driver to share
    a filesystem (true in local mode and on NFS/shared volumes; on
    object stores, upload the parts and compose server-side).

    Returns ``(nv, ne)``.
    """
    import glob
    import os
    import re
    import shutil
    import tempfile

    import numpy as np
    from pyspark.sql import functions as F

    from ..operators.prefix import range_prefix_sum

    spark = edges.sparkSession
    e = edges.select("src", "dst", "wgt").localCheckpoint()
    head = e.agg(
        F.greatest(F.max("src"), F.max("dst")).alias("m"),
        F.count(F.lit(1)).alias("ne"),
    ).collect()[0]
    ne = int(head["ne"])
    nv = int(head["m"]) + 1 if ne else 0
    if ne and nv > 4 * ne + 64:
        raise ValueError(
            f".g export needs dense vertex ids: max id {nv - 1} vs "
            f"{ne} edges — remap via physmap/zipWithIndex first"
        )
    tmp = tempfile.mkdtemp(prefix="csrg_write_")

    def _writer(section: str):
        # "off" writes one part file; "edges" writes TWO per partition
        # (ind + wgt).  Output-commit discipline: each task ATTEMPT
        # writes to an attempt-unique temp name and atomically renames
        # into place at the end — overlapping attempts of one task
        # (speculation, zombie tasks after a stage retry) can no longer
        # interleave bytes in a shared file; the last complete rename
        # wins, and a rename is all-or-nothing on POSIX.
        def fn(it):
            import os as _os

            import numpy as _np
            from pyspark import TaskContext as _TC

            tc = _TC.get()
            pid = tc.partitionId()
            att = tc.taskAttemptId()

            def final(sec):
                return _os.path.join(tmp, f"{sec}-{pid:06d}.bin")

            def attempt(sec):
                return _os.path.join(tmp, f"{sec}-{pid:06d}.attempt{att}")

            if section == "off":
                with open(attempt("off"), "wb") as f:
                    for pdf in it:
                        _np.asarray(pdf["off"], dtype="<u8").tofile(f)
                _os.replace(attempt("off"), final("off"))
            else:
                with open(attempt("ind"), "wb") as fi, open(
                    attempt("wgt"), "wb"
                ) as fw:
                    for pdf in it:
                        _np.asarray(pdf["dst"], dtype="<u8").tofile(fi)
                        _np.asarray(pdf["wgt"], dtype="<u8").tofile(fw)
                _os.replace(attempt("ind"), final("ind"))
                _os.replace(attempt("wgt"), final("wgt"))
            yield __import__("pandas").DataFrame({"pid": [pid]})

        return fn

    try:
        # off section: dense 0..nv-1 ids, zero-degree vertices
        # included, exclusive prefix sum of degrees in id order
        if ne:
            deg = e.groupBy(F.col("src").alias("id")).agg(
                F.count(F.lit(1)).alias("deg")
            )
            ids = spark.range(nv).join(deg, "id", "left").select(
                "id", F.coalesce("deg", F.lit(0)).alias("deg")
            )
            offd = (
                range_prefix_sum(
                    ids, "id", "deg", "off", num_partitions=partitions
                )
                .repartitionByRange(partitions, "id")
                .sortWithinPartitions("id")
                .select("id", "off")
            )
            offd.mapInPandas(_writer("off"), "pid long").collect()
            # ind/wgt sections: global (src, dst) order = CSR
            # adjacency order; each range slice is one pair of
            # contiguous byte runs
            ew = (
                e.repartitionByRange(partitions, "src", "dst")
                .sortWithinPartitions("src", "dst")
                .select("dst", "wgt")
            )
            ew.mapInPandas(_writer("edges"), "pid long").collect()
        with open(path, "wb") as out:
            np.array([ENDIAN_CHECK, nv, ne], dtype="<u8").tofile(out)
            for sec in ("off", "ind", "wgt"):
                # sort numerically by parsed pid — lexicographic glob
                # order breaks once a pid overflows the zero-pad
                # (ADVICE r3: '1000000' < '999999' as strings)
                for part in sorted(
                    glob.glob(os.path.join(tmp, f"{sec}-*.bin")),
                    key=lambda p: int(
                        re.search(r"-(\d+)\.bin$", p).group(1)
                    ),
                ):
                    with open(part, "rb") as f:
                        shutil.copyfileobj(f, out)
                if sec == "off":
                    np.array([ne], dtype="<u8").tofile(out)  # off[nv]
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return nv, ne
