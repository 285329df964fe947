"""Guarded exact set-intersection kernel over packed bitmaps.

Several exact set-similarity operators (``containment_join``,
``jaccard_prefix_join``, the ground-truth side of ``minhash_recall`` /
``lsh_s_curve``) reduce to the same primitive: **the exact
intersection size of every pair of small sets drawn from a shared
item universe**.  The join formulation — inverted-index self-join on
the item, then ``groupBy(pair).count()`` — is the right 100 TB shape
(output-bounded, shuffle-bounded), but its cost is ``Σ_item df²``
join-output rows, which on a dense/overlapping corpus explodes far
past the answer size: at sf0.1 the 5,000-document fixture produces
**280 M join rows for 12.3 M distinct pairs** (measured; shingle df
median 22, max 3,859), and the token fixture has a 31-word vocabulary
where every "rare-prefix" filter degenerates (min df 250).

This module provides the measured fast path for exactly that regime:
when the corpus slice is small enough that the *whole* binary
membership matrix fits in a few tens of MB (bounds below), pack each
document's set into a bitmap row, broadcast the packed matrix, and
compute ``popcount(row_a & row_b)`` for all pairs with NumPy inside
Arrow tasks — no join, no shuffle of ``Σ df²`` rows, exact integer
popcounts.  The guards make the choice scale-adaptive:

* it fires on calibration/sample-sized slices (which is what these
  diagnostics are documented to run on at scale) regardless of
  cluster size, and
* it can never fire on an unboundedly large corpus — callers fall
  back to their existing inverted-index / prefix-filter plans, which
  remain the scale path.

Exactness: bit operations and popcounts are integer-exact; the result
is bit-identical to the join formulation (parity-tested in
``tests/test_bitsets.py``), so every oracle hash is unchanged.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: max documents (pair space n²/2 enumerated by the kernel)
MAX_DOCS = 131_072
#: max distinct items (the item index is driver-built — keep the
#: collect explicitly bounded)
MAX_ITEMS = 1 << 21
#: max packed-matrix bytes (collected once to the driver, then
#: broadcast) — keeps the one driver transfer bounded and small
MAX_MATRIX_BYTES = 64 << 20
#: max total word-ops for the all-pairs popcount sweep (n²/2 · words);
#: ~6e9 uint64 ops is a couple of seconds across local[32] tasks and
#: scales linearly with cores on a cluster
MAX_WORD_OPS = 6_000_000_000

#: SWAR popcount constants (NumPy < 2.0 has no bitwise_count)
_M1 = np.uint64(0x5555555555555555)
_M2 = np.uint64(0x3333333333333333)
_M4 = np.uint64(0x0F0F0F0F0F0F0F0F)
_H01 = np.uint64(0x0101010101010101)
_S1, _S2, _S4, _S56 = (np.uint64(s) for s in (1, 2, 4, 56))


def _popcount_rows(words: np.ndarray) -> np.ndarray:
    """Per-row popcount of a 2-D uint64 array — vectorized SWAR
    (round-10: the old 8-bit lookup-table path materialized an 8×
    uint8 view per AND block and dominated the all-pairs sweep;
    measured 14s → ~4s on the 12.5M-pair sf0.1 shingle fixture)."""
    x = words - ((words >> _S1) & _M1)
    x = (x & _M2) + ((x >> _S2) & _M2)
    x = (x + (x >> _S4)) & _M4
    return ((x * _H01) >> _S56).sum(axis=1, dtype=np.int64)


def bitmap_fast_path_ok(n_docs: int, n_items: int) -> bool:
    """True when the packed-bitmap all-pairs kernel is in budget."""
    words = (n_items + 63) // 64
    return (
        0 < n_docs <= MAX_DOCS
        and n_items <= MAX_ITEMS
        and n_docs * words * 8 <= MAX_MATRIX_BYTES
        and (n_docs * (n_docs - 1) // 2) * words <= MAX_WORD_OPS
    )


def _index_map(rel: DataFrame, col: str, idx_col: str) -> DataFrame:
    """``(col, idx_col)`` dense 0-based index over the distinct values
    of ``col``, ordered by value (so index order == value order).
    Built on the driver from a bounded collect — callers guard the
    distinct count first."""
    vals = sorted(
        r[0] for r in rel.select(col).distinct().collect()
    )
    spark = rel.sparkSession
    field = rel.schema[col]
    schema = T.StructType(
        [field, T.StructField(idx_col, T.LongType(), False)]
    )
    return spark.createDataFrame(
        [(v, i) for i, v in enumerate(vals)], schema
    )


def packed_matrix(
    encoded: DataFrame, n_docs: int, n_items: int
) -> np.ndarray:
    """Collect the ``(di, ii)`` encoded membership relation as a packed
    ``n_docs × ceil(n_items/64)`` uint64 bitmap matrix.

    Packing runs distributed (one Arrow task per partition packs its
    documents' rows); only the packed rows — bounded by
    :data:`MAX_MATRIX_BYTES` via the caller's guard — are collected.
    """
    words = (n_items + 63) // 64

    def pack(batches):
        import pandas as pd

        for pdf in batches:
            out = []
            for di, idxs in zip(pdf["di"], pdf["idxs"]):
                row = np.zeros(words, dtype=np.uint64)
                ii = np.asarray(idxs, dtype=np.int64)
                np.bitwise_or.at(
                    row, ii >> 6, np.uint64(1) << (ii & 63).astype(np.uint64)
                )
                out.append((int(di), row.tobytes()))
            yield pd.DataFrame(out, columns=["di", "row"])

    packed = (
        encoded.groupBy("di")
        .agg(F.collect_list("ii").alias("idxs"))
        .mapInPandas(pack, "di long, row binary")
        .collect()
    )
    mat = np.zeros((n_docs, words), dtype=np.uint64)
    for r in packed:
        mat[r["di"]] = np.frombuffer(r["row"], dtype=np.uint64)
    return mat


def pairwise_intersection_counts(
    items: DataFrame,
    id_col: str = "doc_id",
    item_col: str = "item",
    min_count: int = 1,
    min_jaccard_prefilter: float | None = None,
) -> DataFrame | None:
    """Exact ``(a_id, b_id, inter)`` for every unordered pair with
    ``|A ∩ B| ≥ min_count`` (``a_id < b_id`` in the id column's own
    ordering), or ``None`` when the slice is past the fast-path
    bounds and the caller must use its join-based plan.

    ``items`` is a ``(id_col, item_col)`` membership relation;
    duplicates are tolerated (bitmaps are idempotent), so the result
    is always the *distinct*-set intersection — the same convention
    as ``_verify_intersections``.
    """
    spark = items.sparkSession
    rel = items.select(
        F.col(id_col).alias("doc_id"), F.col(item_col).alias("item")
    )
    n_docs, n_items = (
        rel.agg(
            F.countDistinct("doc_id").alias("n"),
            F.countDistinct("item").alias("m"),
        )
        .collect()[0]
    )
    if not bitmap_fast_path_ok(n_docs, n_items):
        return None

    # dense indices ordered like the original ids, so idx order ==
    # id order and a_idx < b_idx ⇒ a_id < b_id.  Index maps are
    # driver-built from bounded collects (n ≤ MAX_DOCS, m ≤ MAX_ITEMS
    # by the guard) — no unpartitioned window, no O(corpus) driver
    # transfer by construction.
    ids = _index_map(rel, "doc_id", "di").localCheckpoint()
    item_ids = _index_map(rel, "item", "ii")
    encoded = rel.join(F.broadcast(ids), "doc_id").join(
        F.broadcast(item_ids), "item"
    ).select("di", "ii")

    mat = packed_matrix(encoded, n_docs, n_items)
    bc = spark.sparkContext.broadcast(mat)
    minc = int(min_count)
    # Jaccard PREFILTER (round-10): when the caller's downstream
    # predicate implies J ≥ t, dropping pairs below t − 1e-9 inside
    # the sweep is a pure row reduction — the caller re-applies its
    # exact Spark-side predicate on the survivors, so boundary
    # rounding cannot change the result, but the 12.3M-pair
    # materialization + size joins shrink to the near-threshold band.
    minj = None if min_jaccard_prefilter is None else (
        float(min_jaccard_prefilter) - 1e-9
    )

    def sweep(batches):
        import pandas as pd

        m = bc.value
        zs = _popcount_rows(m) if minj is not None else None
        for pdf in batches:
            out_a: list[np.ndarray] = []
            out_b: list[np.ndarray] = []
            out_c: list[np.ndarray] = []
            for a in pdf["id"].to_numpy():
                a = int(a)
                if a + 1 >= m.shape[0]:
                    continue
                inter = _popcount_rows(m[a] & m[a + 1 :])
                if minj is not None:
                    union = zs[a] + zs[a + 1 :] - inter
                    ok = inter >= minj * np.maximum(union, 1)
                    hit = np.nonzero((inter >= minc) & ok)[0]
                else:
                    hit = np.nonzero(inter >= minc)[0]
                if hit.size:
                    out_a.append(np.full(hit.size, a, dtype=np.int64))
                    out_b.append((hit + a + 1).astype(np.int64))
                    out_c.append(inter[hit])
            if out_a:
                yield pd.DataFrame(
                    {
                        "ai": np.concatenate(out_a),
                        "bi": np.concatenate(out_b),
                        "inter": np.concatenate(out_c),
                    }
                )

    # interleave a-values across tasks (row a sweeps n-a tails, so
    # contiguous blocks would skew); 64× more key values than
    # partitions so the hash spreads evenly (guide §2.5)
    n_parts = max(1, min(256, int(spark.sparkContext.defaultParallelism)))
    pairs = (
        spark.range(0, n_docs)
        .repartition(n_parts, (F.col("id") % (n_parts * 64)))
        .mapInPandas(sweep, "ai long, bi long, inter long")
    )
    a_ids = ids.select(
        F.col("doc_id").alias("a_id"), F.col("di").alias("ai")
    )
    b_ids = ids.select(
        F.col("doc_id").alias("b_id"), F.col("di").alias("bi")
    )
    return (
        pairs.join(F.broadcast(a_ids), "ai")
        .join(F.broadcast(b_ids), "bi")
        .select("a_id", "b_id", F.col("inter").cast("long").alias("inter"))
    )
