"""Fixed schemas for every table in the engine.

Mirrors the reference's JSON-Schema-validated data model
(reference: src/schemas/LearningChunkGraph.schema.json:6-104,
src/schemas/ConceptDictionary.schema.json:7-42) plus the driver's
input_hint pages shape and the north_rule lineage table.
"""

from __future__ import annotations

from pyspark.sql import types as T

# 9 edge types — reference LearningChunkGraph.schema.json:82-87.
EDGE_TYPES = [
    "PREREQUISITE",
    "ELABORATES",
    "EXAMPLE_OF",
    "HINT_FORWARD",
    "REFER_BACK",
    "PARALLEL",
    "TESTS",
    "REVISION_OF",
    "MENTIONS",
]

# PageRank subgraph for educational importance —
# reference viz/graph2metrics.py:636-641.
EDUCATIONAL_EDGE_TYPES = ["PREREQUISITE", "ELABORATES", "TESTS", "EXAMPLE_OF"]

NODE_TYPES = ["Chunk", "Concept", "Assessment"]

# Common-Crawl-style input pages (driver input_hint).
PAGES = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
    ]
)

# Slicer output — reference src/slicer.py:470-478.
SLICES = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("order", T.LongType(), False),
        T.StructField("source_file", T.StringType(), False),
        T.StructField("slug", T.StringType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("slice_token_start", T.LongType(), False),
        T.StructField("slice_token_end", T.LongType(), False),
    ]
)

# Graph nodes — reference LearningChunkGraph.schema.json:7-64.
NODES = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("type", T.StringType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("node_offset", T.LongType(), True),
        T.StructField("definition", T.StringType(), True),
        T.StructField("difficulty", T.IntegerType(), True),
        T.StructField("concepts", T.ArrayType(T.StringType()), True),
        T.StructField("tags", T.ArrayType(T.StringType()), True),
        T.StructField("language", T.StringType(), True),
        T.StructField("metadata", T.MapType(T.StringType(), T.StringType()), True),
        # original row position — drives deterministic component
        # renumbering (reference viz/graph2metrics.py:277-285).
        T.StructField("node_order", T.LongType(), True),
    ]
)

# The edge table ≡ driver (src_id, dst_id, edge_type, weight) —
# reference LearningChunkGraph.schema.json:66-101.
EDGES = T.StructType(
    [
        T.StructField("src_id", T.StringType(), False),
        T.StructField("dst_id", T.StringType(), False),
        T.StructField("edge_type", T.StringType(), False),
        T.StructField("weight", T.DoubleType(), True),
        T.StructField("conditions", T.StringType(), True),
        # original row position — the NetworkX DiGraph collapses parallel
        # (src,dst) edges last-writer-wins (reference
        # viz/graph2metrics.py:163-170); edge_order reproduces that.
        T.StructField("edge_order", T.LongType(), True),
    ]
)

# Concept dictionary — reference ConceptDictionary.schema.json:7-42.
CONCEPTS = T.StructType(
    [
        T.StructField("concept_id", T.StringType(), False),
        T.StructField(
            "term",
            T.StructType(
                [
                    T.StructField("primary", T.StringType(), False),
                    T.StructField("aliases", T.ArrayType(T.StringType()), True),
                ]
            ),
            False,
        ),
        T.StructField("definition", T.StringType(), True),
    ]
)

EMBEDDINGS = T.StructType(
    [
        T.StructField("node_id", T.StringType(), False),
        T.StructField("vector", T.ArrayType(T.FloatType()), False),
    ]
)

# Per-partition superstep lineage (north_rule).
LINEAGE = T.StructType(
    [
        T.StructField("job", T.StringType(), False),
        T.StructField("iteration", T.IntegerType(), False),
        T.StructField("partition_id", T.IntegerType(), False),
        T.StructField("rows_in", T.LongType(), False),
        T.StructField("rows_out", T.LongType(), False),
        T.StructField("checksum", T.LongType(), False),
        T.StructField("wall_ms", T.DoubleType(), False),
    ]
)

RANKS = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("rank", T.DoubleType(), False),
    ]
)
