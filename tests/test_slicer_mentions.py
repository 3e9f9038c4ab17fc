"""Slicer windowing + MENTIONS mining tests."""

from pyspark.sql import functions as F

from k2_18_spark import schemas
from k2_18_spark.pipeline.mentions import assign_final_ids, mine_mentions
from k2_18_spark.pipeline.slicer import slice_documents, slice_text


def test_slice_text_single_slice():
    out = slice_text("one two three.", max_tokens=100)
    assert len(out) == 1
    assert out[0][0] == "one two three."
    assert out[0][1] == 0 and out[0][2] == 4  # 3 words + '.'


def test_slice_text_windows_cover_document():
    text = ". ".join(f"sentence number {i} has some words" for i in range(200)) + "."
    slices = slice_text(text, max_tokens=100, soft_boundary_max_shift=20)
    assert len(slices) > 5
    # coverage: token ranges contiguous from 0 to n
    assert slices[0][1] == 0
    for prev, cur in zip(slices, slices[1:]):
        assert cur[1] == prev[2]
    # boundary preference: cuts land after sentence ends (text ends with .)
    for stext, _, _ in slices[:-1]:
        assert stext.rstrip().endswith("."), stext[-40:]


def test_slice_text_hard_cut_without_boundaries():
    text = " ".join(["word"] * 500)
    slices = slice_text(text, max_tokens=100, soft_boundary_max_shift=10)
    assert all(s[2] - s[1] <= 110 for s in slices)
    assert sum(s[2] - s[1] for s in slices) == 500


def test_slice_documents_deterministic_ids(spark):
    rows = [
        (f"https://x.org/doc{i}", None, None, "para one. " * 300, "en")
        for i in range(4)
    ]
    pages = spark.createDataFrame(rows, schemas.PAGES)
    slices = slice_documents(pages, max_tokens=200, soft_boundary_max_shift=30)
    got = slices.orderBy("order").collect()
    assert got[0]["id"] == "slice_001"
    assert [r["order"] for r in got] == list(range(1, len(got) + 1))
    # lexicographic url order drives numbering
    assert got[0]["source_file"] == "https://x.org/doc0"
    # slug derived from url tail
    assert got[0]["slug"] == "doc0"


def test_mine_mentions(spark):
    chunks = spark.createDataFrame(
        [
            ("c1", "Chunk", "We study graph algorithms and sorting."),
            ("c2", "Chunk", "Nothing relevant here."),
            ("c3", "Chunk", "Subgraphs are not whole-word matches."),
            ("c4", "Assessment", "graph appears but wrong node type."),
        ],
        "id string, type string, text string",
    )
    concepts = spark.createDataFrame(
        [
            ("p:graph", ("Graph", ["graphs"]), "d"),
            ("p:sort", ("Sorting", ["sort algorithm"]), "d"),
            ("p:zzz", ("Zebra", None), "d"),
        ],
        schemas.CONCEPTS,
    )
    got = {
        (r["src_id"], r["dst_id"]): r
        for r in mine_mentions(chunks, concepts).collect()
    }
    assert ("c1", "p:graph") in got
    assert ("c1", "p:sort") in got
    assert ("c3", "p:graph") not in got  # 'Subgraphs' is not \bgraph\b
    assert ("c4", "p:graph") not in got  # Assessments excluded
    assert all(r["weight"] == 0.35 for r in got.values())
    assert all(r["conditions"] == "auto_generated" for r in got.values())


def test_mine_mentions_skips_existing(spark):
    chunks = spark.createDataFrame(
        [("c1", "Chunk", "graph text")], "id string, type string, text string"
    )
    concepts = spark.createDataFrame(
        [("p:graph", ("graph", None), "d")], schemas.CONCEPTS
    )
    existing = spark.createDataFrame(
        [("c1", "p:graph", "MENTIONS", 0.9, None, 0)], schemas.EDGES
    )
    got = mine_mentions(chunks, concepts, existing_edges=existing).collect()
    assert got == []


def test_assign_final_ids(spark):
    nodes = spark.createDataFrame(
        [
            ("tmp1", "Chunk", "t", 5, "alg", 100),
            ("tmp2", "Assessment", "q", 0, "alg", 100),
            ("tmp3", "Assessment", "q", 0, "alg", 100),
            ("tmp4", "Concept", "c", 0, "alg", 100),
        ],
        "id string, type string, text string, node_offset long, slug string, "
        "slice_token_start long",
    )
    got = {r["id"]: r["final_id"] for r in assign_final_ids(nodes).collect()}
    assert got["tmp1"] == "alg:c:105"
    assert got["tmp2"] == "alg:q:100:0"
    assert got["tmp3"] == "alg:q:100:1"
    assert got["tmp4"] == "tmp4"


def test_mentions_indexed_equals_broadcast(spark):
    """The inverted-index scale path produces the identical MENTIONS
    edge set as the broadcast nested-loop path on a corpus with
    multiword terms, aliases, hyphen boundaries and Cyrillic."""
    from k2_18_spark.pipeline.mentions import (
        mine_mentions,
        mine_mentions_indexed,
    )

    chunks = spark.createDataFrame(
        [
            ("c1", "Chunk", "The binary tree holds sorted keys."),
            ("c2", "Chunk", "A cat-alog of cat pictures."),
            ("c3", "Chunk", "catalog entries only"),
            ("c4", "Chunk", "Текст про код и кодекс."),
            ("c5", "Chunk", "binary star, not a tree"),
            ("c6", "Concept", "binary tree"),  # non-Chunk ignored
        ],
        "id string, type string, text string",
    )
    concepts = spark.createDataFrame(
        [
            ("p1", ("binary tree", ["search tree"]), ""),
            ("p2", ("cat", None), ""),
            ("p3", ("код", None), ""),
        ],
        "concept_id string, term struct<primary string, aliases array<string>>, definition string",
    )
    existing = spark.createDataFrame(
        [("c1", "p1", "MENTIONS", 0.35)],
        "src_id string, dst_id string, edge_type string, weight double",
    )
    for ex in (None, existing):
        a = sorted(map(tuple, mine_mentions(chunks, concepts, ex).collect()))
        b = sorted(
            map(tuple, mine_mentions_indexed(chunks, concepts, ex).collect())
        )
        assert a == b, (ex is not None, a, b)
    # sanity: the hyphen-delimited 'cat' matched, the 'catalog' one not
    got = {
        (r["src_id"], r["dst_id"])
        for r in mine_mentions(chunks, concepts).collect()
    }
    assert ("c2", "p2") in got and ("c3", "p2") not in got
