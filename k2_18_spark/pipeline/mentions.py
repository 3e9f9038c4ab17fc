"""Concept-mention mining (SURVEY.md J6/F10) + final ID assignment (F9).

Reference semantics (src/itext2kg_graph.py:611-680): for every Chunk ×
concept, search lowercased chunk text for the primary term or any
alias with a word-boundary regex; hits get a MENTIONS edge
(chunk → concept, weight 0.35, conditions='auto_generated') unless a
MENTIONS edge for that pair already exists.

Spark realization: broadcast nested-loop join — the concept dictionary
is small relative to the chunk corpus (reference holds it in memory),
so ``chunks ⋈ broadcast(terms)`` with a JVM-side ``regexp_like``
predicate; no Python in the hot path. At 100 TB the same shape holds:
the dictionary broadcast is a few MB while chunks stream through.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

AUTO_MENTIONS_WEIGHT = 0.35  # reference src/config.toml:82

# auto method tier boundary: term tables at or below this row count use
# the broadcast-regex path (one broadcast, zero extra shuffles); larger
# dictionaries switch to the inverted-index equi-join, which never
# broadcasts the terms. ~100k terms ≈ a few MB broadcast — comfortably
# inside Spark's 8 MB-ish broadcast sweet spot, far below the 1 GB cap.
BROADCAST_MAX_TERMS = 100_000


def _regex_escape(col):
    """Escape regex metacharacters (re.escape equivalent, JVM-side)."""
    return F.regexp_replace(col, r"([\\.\[\]{}()*+?^$|])", r"\\$1")


def concept_terms(concepts: DataFrame) -> DataFrame:
    """Explode concept dict → (concept_id, term) rows, primary first."""
    prim = concepts.select(
        "concept_id", F.lower(F.col("term.primary")).alias("term")
    )
    alias = concepts.select(
        "concept_id",
        F.explode_outer(F.col("term.aliases")).alias("a"),
    ).select("concept_id", F.lower(F.col("a")).alias("term")).filter(
        F.col("term").isNotNull()
    )
    return prim.unionByName(alias).distinct()


def mine_mentions(
    chunks: DataFrame,
    concepts: DataFrame,
    existing_edges: DataFrame | None = None,
    weight: float = AUTO_MENTIONS_WEIGHT,
    method: str = "auto",
    broadcast_max_terms: int = BROADCAST_MAX_TERMS,
) -> DataFrame:
    """→ MENTIONS edge table (src_id, dst_id, edge_type, weight,
    conditions). ``chunks`` needs (id, type, text).

    ``method``: ``"auto"`` (default) counts the exploded term table
    once and picks ``"broadcast"`` at or below ``broadcast_max_terms``
    rows, ``"indexed"`` (mine_mentions_indexed, tested output-equal)
    above — same idiom as dedup's candidate_fn="auto"."""
    if method == "auto":
        n_terms = concept_terms(concepts).count()
        method = "broadcast" if n_terms <= broadcast_max_terms else "indexed"
    if method == "indexed":
        return mine_mentions_indexed(chunks, concepts, existing_edges, weight)
    if method != "broadcast":
        raise ValueError(f"unknown mentions method: {method!r}")
    terms = concept_terms(concepts).withColumn(
        "pattern", F.concat(F.lit(r"\b"), _regex_escape(F.col("term")), F.lit(r"\b"))
    )
    c = chunks.filter(F.col("type") == "Chunk").select(
        F.col("id").alias("src_id"), F.lower(F.col("text")).alias("lc_text")
    )
    hits = (
        c.join(F.broadcast(terms), F.expr("regexp_like(lc_text, pattern)"))
        .select("src_id", F.col("concept_id").alias("dst_id"))
        .distinct()
    )
    if existing_edges is not None:
        existing = existing_edges.filter(
            F.col("edge_type") == "MENTIONS"
        ).select("src_id", "dst_id")
        hits = hits.join(existing, ["src_id", "dst_id"], "left_anti")
    return hits.select(
        "src_id",
        "dst_id",
        F.lit("MENTIONS").alias("edge_type"),
        F.lit(float(weight)).alias("weight"),
        F.lit("auto_generated").alias("conditions"),
    )


def mine_mentions_indexed(
    chunks: DataFrame,
    concepts: DataFrame,
    existing_edges: DataFrame | None = None,
    weight: float = AUTO_MENTIONS_WEIGHT,
) -> DataFrame:
    """Inverted-index scale path for ``mine_mentions`` — same output
    (tested equal), different join shape for dictionaries too big to
    broadcast:

    1. tokenize chunk text into distinct unicode word runs (JVM split)
    2. key every term by its FIRST token
    3. equi-join chunk-tokens ⋈ term-index on the token → candidate
       (chunk, term) pairs — only chunks that contain the term's first
       word, instead of |chunks|·|terms| regex evaluations
    4. word-boundary regexp verify on the candidates only

    Any ``\\bterm\\b`` match implies the term's first word run appears
    as a full token of the chunk (the boundary makes it maximal), so
    the candidate set is a superset of the matches and step 4 restores
    exactness. Terms with no leading word run (pure punctuation —
    vanishingly rare) fall back to the broadcast path and union in.
    """
    term_rows = concept_terms(concepts).withColumn(
        "pattern",
        F.concat(F.lit(r"\b"), _regex_escape(F.col("term")), F.lit(r"\b")),
    ).withColumn(
        "first_tok", F.regexp_extract(F.col("term"), r"[\p{L}\p{N}_]+", 0)
    )
    indexed_terms = term_rows.filter(F.col("first_tok") != "")
    residue_terms = term_rows.filter(F.col("first_tok") == "")

    c = chunks.filter(F.col("type") == "Chunk").select(
        F.col("id").alias("src_id"), F.lower(F.col("text")).alias("lc_text")
    )
    toks = (
        c.select(
            "src_id",
            F.explode(F.split("lc_text", r"[^\p{L}\p{N}_]+")).alias("first_tok"),
        )
        .filter(F.col("first_tok") != "")
        .distinct()
    )
    cand = (
        toks.join(
            indexed_terms.select("first_tok", "concept_id", "pattern"),
            "first_tok",
        )
        .select("src_id", "concept_id", "pattern")
        .distinct()
    )
    hits = (
        cand.join(c, "src_id")
        .filter(F.expr("regexp_like(lc_text, pattern)"))
        .select("src_id", F.col("concept_id").alias("dst_id"))
        .distinct()
    )
    # punctuation-leading terms (no token key): broadcast regex path
    res_hits = (
        c.join(
            F.broadcast(residue_terms.select("concept_id", "pattern")),
            F.expr("regexp_like(lc_text, pattern)"),
        )
        .select("src_id", F.col("concept_id").alias("dst_id"))
        .distinct()
    )
    hits = hits.unionByName(res_hits).distinct()
    if existing_edges is not None:
        existing = existing_edges.filter(
            F.col("edge_type") == "MENTIONS"
        ).select("src_id", "dst_id")
        hits = hits.join(existing, ["src_id", "dst_id"], "left_anti")
    return hits.select(
        "src_id",
        "dst_id",
        F.lit("MENTIONS").alias("edge_type"),
        F.lit(float(weight)).alias("weight"),
        F.lit("auto_generated").alias("conditions"),
    )


# -- F9: final ID assignment ---------------------------------------------------

def assign_final_ids(
    nodes: DataFrame,
    slice_token_start_col: str = "slice_token_start",
    slug_col: str = "slug",
) -> DataFrame:
    """Temporary → positional ids (reference src/itext2kg_graph.py:682-750):
    Chunk ``{slug}:c:{slice_token_start + node_offset}``; Assessment
    ``{slug}:q:{slice_token_start}:{k}`` (k = per-slice index).
    Adds ``final_id``; join it back onto edges to remap endpoints."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(slug_col, slice_token_start_col, "type").orderBy("id")
    pos = F.col(slice_token_start_col) + F.coalesce(F.col("node_offset"), F.lit(0))
    return nodes.withColumn(
        "final_id",
        F.when(
            F.col("type") == "Chunk",
            F.concat_ws(":", F.col(slug_col), F.lit("c"), pos.cast("string")),
        )
        .when(
            F.col("type") == "Assessment",
            F.concat_ws(
                ":",
                F.col(slug_col),
                F.lit("q"),
                F.col(slice_token_start_col).cast("string"),
                (F.row_number().over(w) - 1).cast("string"),
            ),
        )
        .otherwise(F.col("id")),
    )
