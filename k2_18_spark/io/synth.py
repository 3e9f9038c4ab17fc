"""Deterministic synthetic inputs (FIXTURES.md §1/§8) — no external data.

Everything derives from ``F.range`` + xxhash64-seeded uniforms, so the
same (V, E, seed) always yields the same table on any cluster size —
the property the two-parallelism scaling benchmark relies on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_U_MOD = 1_000_000_007


def _u(col, salt: int):
    """Deterministic uniform [0,1) from a long column + salt."""
    return F.pmod(F.xxhash64(col, F.lit(salt)), F.lit(_U_MOD)) / float(_U_MOD)


def powerlaw_edges(
    spark: SparkSession,
    num_vertices: int,
    num_edges: int,
    seed: int = 42,
    skew: float = 1.5,
    num_partitions: int | None = None,
) -> DataFrame:
    """Seeded power-law edge table → (src_id, dst_id, edge_type, weight).

    Endpoint draw: v = floor(V · u^skew) concentrates mass at low ids —
    Zipf-ish degree tails on BOTH ends (hub sources stress the rank
    join, hub destinations stress the contribution aggregate). Weights
    Uniform(0.05, 1.0]. Self-loops are rewired (+1 mod V) rather than
    filtered so |E| is exact.
    """
    e = spark.range(0, num_edges, 1, num_partitions or spark.sparkContext.defaultParallelism)
    src = F.floor(num_vertices * F.pow(_u(F.col("id"), seed), F.lit(skew)))
    dst = F.floor(num_vertices * F.pow(_u(F.col("id"), seed + 1), F.lit(skew)))
    dst = F.when(dst == src, F.pmod(dst + 1, F.lit(num_vertices))).otherwise(dst)
    w = 0.05 + 0.95 * _u(F.col("id"), seed + 2)
    return e.select(
        F.concat(F.lit("v"), src.cast("long")).alias("src_id"),
        F.concat(F.lit("v"), dst.cast("long")).alias("dst_id"),
        F.lit("LINKS_TO").alias("edge_type"),
        F.round(w, 6).alias("weight"),
    )


def vertex_table(spark: SparkSession, num_vertices: int) -> DataFrame:
    """Matching vertex table with node_order = vertex index."""
    return spark.range(0, num_vertices).select(
        F.concat(F.lit("v"), F.col("id")).alias("id"),
        F.col("id").alias("node_order"),
    )


def embedding_table(
    spark: SparkSession,
    num_vectors: int,
    dim: int = 64,
    cluster_size: int = 10,
    eps: float = 0.1,
    seed: int = 42,
    num_partitions: int | None = None,
) -> DataFrame:
    """Deterministic clustered unit vectors → (node_id, vector) with
    PLANTED near-duplicates: members of cluster ``id // cluster_size``
    share a random center plus ``eps``-scaled noise, giving
    within-cluster cosine ≈ 1/(1+eps²) (~0.99 at eps=0.1) and
    cross-cluster cosine ≈ 0 — the structure embedding-dedup benchmarks
    need (the sf parquet embeddings have no pairs above cosine 0.6).
    Pure column expressions over ``range``; same (n, dim, seed) →
    identical table at any parallelism."""

    def unit(*cols):  # uniform [-1, 1)
        return (
            F.pmod(F.xxhash64(*cols), F.lit(_U_MOD)) / float(_U_MOD)
        ) * 2.0 - 1.0

    base = spark.range(
        0, num_vectors, 1, num_partitions or spark.sparkContext.defaultParallelism
    )
    c = (F.col("id") / cluster_size).cast("long")
    js = F.sequence(F.lit(0), F.lit(dim - 1))
    raw = F.transform(
        js,
        lambda j: unit(c, j, F.lit(seed)) + eps * unit(F.col("id"), j, F.lit(seed + 1)),
    )
    stepped = base.withColumn("raw", raw).withColumn(
        "norm", F.sqrt(F.aggregate("raw", F.lit(0.0), lambda a, x: a + x * x))
    )
    return stepped.select(
        F.concat(F.lit("e:c:"), F.col("id")).alias("node_id"),
        F.transform("raw", lambda x: x / F.col("norm")).alias("vector"),
    )


# -- Common-Crawl-style pages (FIXTURES.md §1) --------------------------------

_WORDS_EN = (
    "graph spark data query node edge rank cluster shuffle join scan "
    "filter merge sort window batch stream table column row"
).split()
_WORDS_RU = "граф узел ребро данные запрос таблица строка столбец поток окно".split()


def _page_html(i: int) -> tuple[str, str]:
    """Deterministic HTML for page i → (html, expected_extracted_text).

    Exercises the reference extractor paths: <script>/<style> blocks
    (removed with content), nested markup, headers, Cyrillic (NFC),
    markdown-ish fences. Expected text is computed with the SAME
    semantics the engine UDF implements (span-cut removal + NFC)."""
    import random

    rng = random.Random(1000 + i)
    parts = [f"<h1>Page {i} {' '.join(rng.choices(_WORDS_EN, k=3))}</h1>\n"]
    if i % 3 == 0:
        parts.append(f"<script type='text/javascript'>var x = {i}; alert(x);</script>\n")
    if i % 5 == 0:
        parts.append("<style>body { color: red; }</style>\n")
    for p in range(2 + i % 3):
        words = rng.choices(_WORDS_EN, k=12)
        if i % 4 == 0:
            words += rng.choices(_WORDS_RU, k=4)
        parts.append(f"<p>{' '.join(words)}.</p>\n")
    if i % 7 == 0:
        parts.append("<pre><code>SELECT * FROM t; -- кода блок</code></pre>\n")
    html = "<html><body>\n" + "".join(parts) + "</body></html>\n"
    from k2_18_spark.functions.text import preprocess_text

    return html, preprocess_text(html)


def pages_table(spark: SparkSession, num_pages: int = 200) -> DataFrame:
    """Deterministic pages table (url, warc_ts, html, text, lang) per the
    driver input_hint; `text` = expected extractor output. A few rows
    are cp1251-encoded to exercise the decode fallback."""
    import datetime

    rows = []
    for i in range(num_pages):
        html, text = _page_html(i)
        if i % 11 == 0 and i % 4 == 0:
            raw = html.encode("cp1251", errors="ignore")
            # expected text reflects the decode chain's actual result
            from k2_18_spark.functions.text import decode_bytes, preprocess_text

            text = preprocess_text(decode_bytes(raw))
        else:
            raw = html.encode("utf-8")
        rows.append(
            (
                f"https://example.org/page/{i:05d}",
                datetime.datetime(2026, 1, 1) + datetime.timedelta(minutes=i),
                raw,
                text,
                "ru" if i % 4 == 0 else "en",
            )
        )
    from k2_18_spark.schemas import PAGES

    return spark.createDataFrame(rows, PAGES)
