"""Multimodal metadata extractors (stubbed codecs, real plumbing) +
graph splitter + JSON interop tests."""

import json

import pytest

from k2_18_spark.io import fixtures
from k2_18_spark.operators.multimodal import (
    CodecUnavailable,
    audio_metadata,
    frame_sample,
    image_metadata,
)
from k2_18_spark.pipeline.split import cluster_concepts, split_edges


@pytest.fixture()
def media(spark):
    rows = [(i, bytes([i % 256]) * (100 + i)) for i in range(10)] + [(99, None)]
    return spark.createDataFrame(rows, "doc_id long, media binary")


def test_image_metadata_deterministic(media):
    a = {r["doc_id"]: r.asDict() for r in image_metadata(media).collect()}
    b = {r["doc_id"]: r.asDict() for r in image_metadata(media).collect()}
    assert a == b
    assert a[0]["n_bytes"] == 100 and a[0]["media_sha256"] is not None
    assert a[0]["width"] >= 64 and a[0]["mode"] == "RGB"
    assert a[99]["media_sha256"] is None  # null media row survives


def test_audio_and_frames(media):
    au = {r["doc_id"]: r.asDict() for r in audio_metadata(media).collect()}
    assert au[1]["sample_rate"] == 16000
    assert abs(au[1]["duration_s"] - au[1]["n_samples"] / 16000) < 1e-9
    fr = frame_sample(media, every_s=1.0, max_frames=4).collect()
    assert len(fr) > 0
    by_doc = {}
    for r in fr:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_rows in by_doc.values():
        assert [r["frame_index"] for r in sorted(doc_rows, key=lambda x: x["frame_index"])] == list(
            range(len(doc_rows))
        )
        assert len(doc_rows) <= 4


def test_strict_mode_raises(media):
    with pytest.raises(Exception) as exc:
        image_metadata(media, fake_decode=False).collect()
    assert "CodecUnavailable" in str(exc.value) or "codec" in str(exc.value)


def test_split_edges_and_inter_counts(spark):
    edges = spark.createDataFrame(
        [("a", "b", "MENTIONS", 1.0), ("b", "c", "MENTIONS", 1.0), ("c", "d", "MENTIONS", 1.0)],
        "src_id string, dst_id string, edge_type string, weight double",
    )
    clusters = spark.createDataFrame(
        [("a", 0), ("b", 0), ("c", 1), ("d", 1)], "id string, cluster_id int"
    )
    intra, inter = split_edges(edges, clusters)
    got = {(r["src_id"], r["dst_id"]): r["cluster_id"] for r in intra.collect()}
    assert got == {("a", "b"): 0, ("c", "d"): 1}
    counts = {r["cluster_id"]: r["inter_cluster_edges"] for r in inter.collect()}
    assert counts == {0: 1, 1: 1}  # the b→c edge counts once per side


def test_cluster_concepts_join(spark):
    from k2_18_spark import schemas

    nodes = spark.createDataFrame(
        [("p:1", "Concept", "t"), ("c:1", "Chunk", "t")],
        "id string, type string, text string",
    )
    clusters = spark.createDataFrame(
        [("p:1", 3), ("c:1", 0)], "id string, cluster_id int"
    )
    concepts = spark.createDataFrame(
        [("p:1", ("term", None), "def")], schemas.CONCEPTS
    )
    got = cluster_concepts(nodes, clusters, concepts).collect()
    assert got[0]["cluster_id"] == 3


def test_graph_json_roundtrip(spark, tmp_path):
    from k2_18_spark.io.graph_json import read_graph_json, write_graph_json

    nodes, edges, data = fixtures.load_fixture(spark, "test_weighted_triangle")
    out = tmp_path / "g.json"
    write_graph_json(nodes, edges, str(out), meta={"source": "roundtrip"})
    doc = json.loads(out.read_text())
    assert [n["id"] for n in doc["nodes"]] == [n["id"] for n in data["nodes"]]
    assert [e["source"] for e in doc["edges"]] == [e["source"] for e in data["edges"]]
    assert doc["_meta"]["source"] == "roundtrip"
    n2, e2, meta = read_graph_json(spark, str(out))
    assert n2.count() == nodes.count() and e2.count() == edges.count()
    assert meta["source"] == "roundtrip"
