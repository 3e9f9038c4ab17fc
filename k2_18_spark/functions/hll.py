"""Deterministic HyperLogLog — per-group distinct counting at scale.

The register-sketch sibling of ``functions/bloom.py`` (membership)
and ``graph/anf.py`` (neighborhood sizes): HyperLogLog (Flajolet et
al. 2007) estimates distinct cardinality in O(m) space with ~1.04/√m
relative error — the per-host distinct-URL / per-day distinct-user
counter every crawl dashboard ships. Spark's built-in
``approx_count_distinct`` is HLL++ but its registers are opaque and
engine-specific; this implementation derandomizes the hash the house
way (md5-60) so every REGISTER value — not just the estimate — is
reproducible in DuckDB, which the ``hll_hosts`` oracle checks.

Layout: the 60-bit ``md5`` value splits into a ``b``-bit bucket
index (``h mod m``, m = 2^b) and a (60−b)-bit tail ``v = h div m``;
``rho = (60 − b) − length(bin(v)) + 1`` (leading zeros + 1; v = 0 →
rho = 60 − b + 1). Both engines compute ``bin()`` identically.

Estimator: the classic HLL form — ``E = α_m · m² / Σ 2^{−M_j}``
(absent buckets contribute 2^0 = 1), with the small-range linear-
counting correction ``E = m·ln(m/V)`` when ``E ≤ 2.5m`` and V (empty
buckets) > 0. α_m = 0.7213/(1 + 1.079/m) (m ≥ 128 form, applied
uniformly — a documented simplification).

Scale shape: ONE groupBy((group, bucket)) max(rho) with map-side
partial max (repeats collapse before the shuffle — the whole point
when counting distincts over 10^12 rows), then one m-row-per-group
rollup. Merging sketches = element-wise max (``hll_merge``),
associative like the Bloom OR.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _h60(col: Column) -> Column:
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10).cast(
        "long"
    )


def _alpha(m: int) -> float:
    return 0.7213 / (1 + 1.079 / m)


def hll_sketch(
    items: DataFrame,
    col: str,
    b: int = 10,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """→ (group_cols…, bucket, rho): max-rho register rows per group
    (absent buckets are implicit zeros). m = 2^b registers."""
    m = 1 << b
    h = _h60(F.col(col))
    bucket = F.pmod(h, F.lit(m)).cast("int")
    # exact tail: bit shift, NOT h/m — double division drops mantissa
    # bits beyond 2^53 and h is 60-bit
    v = F.shiftright(h, b).cast("long")
    rho = (
        F.when(v == 0, F.lit(60 - b + 1))
        .otherwise(F.lit(60 - b) - F.length(F.bin(v)) + 1)
        .cast("int")
    )
    gcols = group_cols or []
    return (
        items.select(*gcols, bucket.alias("bucket"), rho.alias("rho"))
        .groupBy(*gcols, "bucket")
        .agg(F.max("rho").alias("rho"))
    )


def hll_merge(sketches: DataFrame, group_cols: list[str] | None = None) -> DataFrame:
    """Union sketches of the same b — element-wise register max."""
    gcols = group_cols or []
    return sketches.groupBy(*gcols, "bucket").agg(F.max("rho").alias("rho"))


def hll_estimate(
    sketch: DataFrame, b: int = 10, group_cols: list[str] | None = None
) -> DataFrame:
    """→ (group_cols…, estimate): the HLL estimator with small-range
    linear counting, rounded to 6 decimals."""
    m = 1 << b
    gcols = group_cols or []
    agg = sketch.groupBy(*gcols).agg(
        F.sum(F.pow(F.lit(2.0), -F.col("rho"))).alias("_present_sum"),
        F.count(F.lit(1)).alias("_present"),
    )
    # absent buckets contribute 2^0 each and are the empty registers
    # (materialized rows always carry rho ≥ 1)
    denom = F.col("_present_sum") + (F.lit(m) - F.col("_present"))
    raw = F.lit(_alpha(m) * m * m) / denom
    empties = F.lit(m) - F.col("_present")
    est = F.when(
        (raw <= 2.5 * m) & (empties > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / empties),
    ).otherwise(raw)
    return agg.select(
        *gcols, F.round(est, 6).alias("estimate")
    )


def hll_error_bound(b: int) -> float:
    """Expected relative standard error ≈ 1.04/√m."""
    return 1.04 / math.sqrt(1 << b)
