"""k2_18_spark — a PySpark-native link-graph analytics engine.

Brand-new engine with the query/data-processing capabilities of the
reference (zebrr/k2-18, surveyed in SURVEY.md): HTML text extraction,
windowed slicing, concept-edge mining, similarity dedup, and the full
12-node/4-edge graph-metric suite (PageRank, connected components,
label propagation, triangle count, SCC depth/effort, centralities),
re-expressed as DataFrame-only Spark programs with explicit
partitioning, skew handling, superstep checkpointing and lineage.
"""

__version__ = "0.1.0"
