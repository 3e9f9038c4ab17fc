"""Deterministic Count-Min sketch — heavy-hitter frequency estimation
at scale.

The frequency-sketch sibling of ``functions/bloom.py`` (membership)
and ``functions/hll.py`` (distinct counting): Count-Min (Cormode &
Muthukrishnan 2005) estimates per-key counts in O(d·w) space with
one-sided error — ``est ≥ true`` always, ``est ≤ true + εN`` with
probability 1−δ for w = ⌈e/ε⌉, d = ⌈ln 1/δ⌉. The crawl-side use is
heavy-hitter detection over unbounded key domains (hot hosts, hot
URLs, hot query grams) without materializing the full count table.

Hashing is the house md5-60 derandomization: row ``i`` of the sketch
places key ``k`` at column ``md5(seed|i|k) mod w`` — every COUNTER
value, not just the estimates, is reproducible in any engine with
md5, which the ``cms_hosts`` oracle checks register-for-register.

Scale shape: building is ONE ``d``-way explode (a literal 0..d−1
sequence — d is 3–5, so the blow-up is a small constant) + ONE
map-side-combinable (row, col) groupBy — identical repeated keys
collapse BEFORE the shuffle, so 10^12 rows with 10^6 distinct keys
shuffle O(d · 10^6), and the sketch table itself is at most d·w rows.
Merging two sketches is an element-wise add on the same layout
(``cms_merge``, associative/commutative like the Bloom OR and the
HLL max). Point queries join the probe keys against the d·w table
(broadcast — the sketch is tiny by construction) and take the
per-key min over the d rows. Zero Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _h60(col: Column) -> Column:
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def _col_for(seed: str, row: Column, key: Column, w: int) -> Column:
    """Column index of ``key`` in sketch row ``row``: md5-60 mod w."""
    return F.pmod(
        _h60(F.concat_ws("|", F.lit(seed), row.cast("string"), key)),
        F.lit(w),
    ).cast("int")


def cms_build(
    items: DataFrame,
    key_col: str,
    d: int = 4,
    w: int = 256,
    seed: str = "cms",
    weight_col: str | None = None,
) -> DataFrame:
    """→ (row, col, cnt): the non-zero counters of a d×w Count-Min
    sketch over ``key_col`` (absent (row, col) pairs are implicit
    zeros). ``weight_col`` switches from occurrence counting to
    weighted sums (e.g. bytes per host)."""
    val = (
        F.col(weight_col).cast("long")
        if weight_col
        else F.lit(1).cast("long")
    )
    row = F.explode(F.sequence(F.lit(0), F.lit(d - 1))).alias("row")
    return (
        items.select(
            F.col(key_col).cast("string").alias("_k"), val.alias("_v")
        )
        .select("_k", "_v", row)
        .select(
            "row",
            _col_for(seed, F.col("row"), F.col("_k"), w).alias("col"),
            "_v",
        )
        .groupBy("row", "col")
        .agg(F.sum("_v").alias("cnt"))
    )


def cms_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Element-wise sum of two sketches built with the same
    (d, w, seed) — the associative union that lets per-partition /
    per-day sketches roll up without touching raw data."""
    return (
        a.unionByName(b)
        .groupBy("row", "col")
        .agg(F.sum("cnt").alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    key_col: str,
    d: int = 4,
    w: int = 256,
    seed: str = "cms",
) -> DataFrame:
    """→ (key_col, est): the Count-Min point estimate min_i
    counter[i, h_i(key)] for every probe key. The sketch side is
    broadcast (≤ d·w rows by construction); missing counters read 0."""
    row = F.explode(F.sequence(F.lit(0), F.lit(d - 1))).alias("row")
    probed = (
        probes.select(F.col(key_col).cast("string").alias("_k"))
        .distinct()
        .select("_k", row)
        .select(
            "_k",
            "row",
            _col_for(seed, F.col("row"), F.col("_k"), w).alias("col"),
        )
    )
    return (
        probed.join(F.broadcast(sketch), ["row", "col"], "left")
        .groupBy("_k")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est"))
        .select(F.col("_k").alias(key_col), "est")
    )
