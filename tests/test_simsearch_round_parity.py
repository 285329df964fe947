"""Rounding-rule parity for the exact all-pairs fast path (round-10
ADVICE): the kernel quantizes the SHORTEST round-trip decimal repr of
the double (``Decimal(repr(float(x)))``), because that is what the JVM
path does — ``F.round`` → ``BigDecimal.valueOf(double)`` =
``Double.toString`` shortest repr → ``setScale(6, HALF_UP)``.

Quantizing the double's exact binary expansion instead diverges on
values whose shortest repr ends in '5' at the 7th decimal while the
binary value sits just below (e.g. 0.1234565 is stored as
0.12345649999…, so binary-HALF_UP rounds DOWN where the JVM rounds
UP).  This suite pins the kernel's rounding expression against Spark's
own ``round(x, 6)`` on exactly such adversarial values.
"""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal

from pyspark.sql import functions as F

#: adversarial + plain values: shortest-repr-ends-in-5 cases whose
#: binary expansion sits below (0.1234565) and above (0.1234575) the
#: half, exact halves, tiny magnitudes, near-1 thresholds
VALS = [
    0.1234565,
    0.1234575,
    0.9999995,
    0.9999985,
    0.0000005,
    0.0000015,
    0.1234564999999,
    0.12345650000001,
    0.95,
    0.9500005,
    0.123456,
    1.0,
    0.0,
]


def _kernel_round(x: float) -> float:
    # the exact expression functions/simsearch.py uses on the
    # near-threshold band
    return float(
        Decimal(repr(float(x))).quantize(Decimal("1E-6"), rounding=ROUND_HALF_UP)
    )


def test_kernel_rounding_matches_spark_round(spark):
    df = spark.createDataFrame([(v,) for v in VALS], "x double").select(
        "x", F.round("x", 6).alias("r")
    )
    got = {r["x"]: r["r"] for r in df.collect()}
    for v in VALS:
        assert got[v] == _kernel_round(v), (
            f"rounding diverges from Spark for {v!r}: "
            f"spark={got[v]!r} kernel={_kernel_round(v)!r}"
        )


def test_binary_expansion_rounding_would_diverge():
    # documents WHY repr is required: the old binary-expansion rule
    # disagrees on the canonical adversarial value
    v = 0.1234565
    binary = float(
        Decimal(v).quantize(Decimal("1E-6"), rounding=ROUND_HALF_UP)
    )
    assert binary == 0.123456  # binary expansion sits below the half
    assert _kernel_round(v) == 0.123457  # shortest repr rounds up
