"""Mergeable log-linear histogram quantile sketch — bounded
relative-error percentiles over unbounded streams.

The quantile sibling of the sketch family (``bloom.py`` membership,
``hll.py`` distinct, ``cms.py`` frequency): the HdrHistogram /
DDSketch bucket scheme over non-negative integers (byte sizes, token
counts, latencies-in-ms) with ``sub_bits`` mantissa bits per octave —
any quantile answer is within relative error 2^-sub_bits of an exact
one, the sketch is at most ``(64 - sub_bits) * 2^sub_bits`` rows
regardless of input size, and two sketches merge by adding counts
(associative/commutative, like the Bloom OR and the HLL max).

Unlike ``percentile_approx`` (Spark's KLL-ish internal, neither
mergeable across jobs nor reproducible cross-engine), every bucket
index here is INTEGER-ONLY math — bit length via ``length(bin(v))``
and a right shift — so a DuckDB/SQL twin reproduces the register
table bit-for-bit (``hist_sketch_hosts``-style oracles can check
counts register-for-register, not just the estimates).

Bucket rule for value v ≥ 0 with s = sub_bits:
- v < 2^(s+1):  bucket = v                        (exact low range)
- else:         bl = bit_length(v) = length(bin(v))
                bucket = (bl-1)·2^s + (v >> (bl-1-s)) - 2^s
The decoded lower bound is ``(2^s + sub) << shift`` and bucket width
is ``2^shift``, hence the 2^-s relative bound.

Scale shape: build = ONE map-side-combinable groupBy on the bucket
expression (10^12 rows shuffle at most a few thousand (bucket, cnt)
pairs per partition); quantile queries run on the tiny sketch table
with one window cumsum. Zero Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def bucket_sql(col: str, sub_bits: int = 4) -> str:
    """Spark-SQL bucket expression for column ``col``."""
    s = int(sub_bits)
    v = f"CAST({col} AS BIGINT)"
    bl = f"length(bin({v}))"
    return (
        f"(CASE WHEN {v} < {2 ** (s + 1)} THEN {v} "
        f"ELSE CAST(({bl} - 1) AS BIGINT) * {2 ** s} "
        f"+ shiftright({v}, CAST(({bl} - 1 - {s}) AS INT)) - {2 ** s} END)"
    )


def bucket_sql_duckdb(col: str, sub_bits: int = 4) -> str:
    """DuckDB twin of :func:`bucket_sql` (``>>`` instead of
    ``shiftright``) — used by oracles to replay registers exactly."""
    s = int(sub_bits)
    v = f"CAST({col} AS BIGINT)"
    bl = f"length(bin({v}))"
    return (
        f"(CASE WHEN {v} < {2 ** (s + 1)} THEN {v} "
        f"ELSE CAST(({bl} - 1) AS BIGINT) * {2 ** s} "
        f"+ ({v} >> CAST(({bl} - 1 - {s}) AS INT)) - {2 ** s} END)"
    )


def bucket_lo(bucket: Column, sub_bits: int = 4) -> Column:
    """Decoded inclusive lower bound of a bucket index (the
    deterministic quantile representative). shiftleft only takes a
    literal shift in the DataFrame API, so the variable shift is a
    multiply by an exact double power of two (exact for decoded
    values < 2^53 — far above any byte-size/token-count domain)."""
    s = int(sub_bits)
    b = bucket.cast("long")
    bl_minus_1 = F.floor(b / F.lit(2**s)).cast("long")
    sub = b - bl_minus_1 * F.lit(2**s)
    shift = bl_minus_1 - F.lit(s)
    return F.when(b < F.lit(2 ** (s + 1)), b).otherwise(
        ((F.lit(2**s) + sub) * F.pow(F.lit(2.0), shift.cast("double")))
        .cast("long")
    )


def hist_sketch(
    df: DataFrame, value_col: str, sub_bits: int = 4
) -> DataFrame:
    """Build the sketch → (bucket long, cnt long), bucket-ascending
    deterministic content. Values must be non-negative integers
    (negative inputs raise at action time via the ANSI cast if they
    appear as impossible bit lengths; callers should filter)."""
    return (
        df.select(F.expr(bucket_sql(value_col, sub_bits)).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def hist_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merge two sketches built with the same sub_bits."""
    return (
        a.select("bucket", "cnt")
        .unionByName(b.select("bucket", "cnt"))
        .groupBy("bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )


def hist_quantiles(
    sketch: DataFrame, qs: list[float], sub_bits: int = 4
) -> DataFrame:
    """Quantile lookups → (q double, value long, rank long, n long).

    Deterministic rank rule: rank_q = max(1, ceil(q·N)); the answer is
    the lower bound of the first bucket whose cumulative count reaches
    rank_q (within relative error 2^-sub_bits of the exact order
    statistic). One window cumsum over the tiny sketch table."""
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    cum = sketch.select(
        "bucket", "cnt", F.sum("cnt").over(w).alias("cum")
    )
    n = cum.agg(F.sum("cnt").alias("n"))
    qdf = cum.sparkSession.createDataFrame(
        [(float(q),) for q in qs], "q double"
    )
    ranks = qdf.crossJoin(F.broadcast(n)).select(
        "q",
        "n",
        F.greatest(F.lit(1), F.ceil(F.col("q") * F.col("n"))).cast("long").alias(
            "rank"
        ),
    )
    hit = (
        ranks.join(cum, cum["cum"] >= ranks["rank"])
        .groupBy("q", "n", "rank")
        .agg(F.min("bucket").alias("bucket"))
    )
    return hit.select(
        "q",
        bucket_lo(F.col("bucket"), sub_bits).alias("value"),
        "rank",
        F.col("n").cast("long").alias("n"),
    )
