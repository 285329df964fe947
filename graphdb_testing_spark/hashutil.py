"""The ONE portable cross-engine hash used everywhere determinism must
survive a DuckDB oracle comparison.

``hash_prefix(col, hex_chars)`` == Spark
``conv(substr(md5(x), 1, hex_chars), 16, 10)`` == DuckDB
``('0x' || substr(md5(x), 1, hex_chars))::BIGINT``.

Width guidance: 8 hex chars (32 bits) for *selection* decisions
(sampling thresholds, mod-N bucket/shard picks, walk draws) where a
collision only perturbs which row is picked; 15 hex chars (60 bits —
the widest that stays inside a signed BIGINT) for *identity* digests
(n-gram membership, fingerprints) where a collision creates a false
match; never 16 (2^64-1 overflows BIGINT on the DuckDB side).

Any change here must be mirrored in every oracle's SQL idiom — that
is the cross-engine contract, and it is why there is exactly one copy
of this function.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def hash_prefix(col: Column, hex_chars: int = 8) -> Column:
    """Portable md5-prefix hash as a non-negative BIGINT."""
    if not 1 <= hex_chars <= 15:
        raise ValueError("hex_chars must be in [1, 15] to fit a signed BIGINT")
    return F.conv(F.substring(F.md5(col), 1, hex_chars), 16, 10).cast("long")


def hash_mod(salt: str, cols: list, mod_col, hex_chars: int = 8) -> Column:
    """``hash_prefix(salt|c1|c2|...) % mod`` — the deterministic draw."""
    return F.pmod(
        hash_prefix(
            F.concat_ws("|", F.lit(salt), *[c.cast("string") for c in cols]),
            hex_chars,
        ),
        mod_col,
    )
