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


def _box(t: bytes, payload: bytes) -> bytes:
    import struct

    return struct.pack(">I", 8 + len(payload)) + t + payload


def _ebml(eid: bytes, payload: bytes) -> bytes:
    assert len(payload) < 127
    return eid + bytes([0x80 | len(payload)]) + payload


def _mp4_fixture() -> bytes:
    import struct

    mvhd = _box(
        b"mvhd",
        bytes(4)  # version 0 + flags
        + struct.pack(">II", 0, 0)  # creation/modification
        + struct.pack(">I", 1000)  # timescale
        + struct.pack(">I", 12500)  # duration → 12.5 s
        + bytes(80),
    )
    moov = _box(b"moov", mvhd + _box(b"trak", b"") + _box(b"trak", b""))
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2")
    return ftyp + moov + _box(b"mdat", bytes(32))


def _mkv_fixture() -> bytes:
    import struct

    header = _ebml(b"\x1a\x45\xdf\xa3", _ebml(b"\x42\x82", b"matroska"))
    info = _ebml(
        b"\x15\x49\xa9\x66",
        _ebml(b"\x2a\xd7\xb1", struct.pack(">I", 1_000_000))
        + _ebml(b"\x44\x89", struct.pack(">d", 20000.0)),  # 20 s
    )
    tracks = _ebml(
        b"\x16\x54\xae\x6b", _ebml(b"\xae", b"") + _ebml(b"\xae", b"")
    )
    return header + _ebml(b"\x18\x53\x80\x67", info + tracks)


def test_video_container_metadata(spark):
    from k2_18_spark.operators.multimodal import video_metadata

    media = spark.createDataFrame(
        [(1, _mp4_fixture()), (2, _mkv_fixture())], "doc_id long, media binary"
    )
    m = {
        r["doc_id"]: r.asDict()
        for r in video_metadata(media, fake_decode=False).collect()
    }
    assert m[1]["container"] == "mp4/isom"
    assert abs(m[1]["duration_s"] - 12.5) < 1e-9
    assert m[1]["timescale"] == 1000 and m[1]["n_tracks"] == 2
    assert m[2]["container"] == "matroska"
    assert abs(m[2]["duration_s"] - 20.0) < 1e-9
    assert m[2]["timescale"] == 1_000_000 and m[2]["n_tracks"] == 2
    # frame timing follows the REAL container duration in strict mode
    fr = frame_sample(
        spark.createDataFrame([(1, _mp4_fixture())], "doc_id long, media binary"),
        every_s=1.0,
        max_frames=100,
        fake_decode=False,
    ).collect()
    assert len(fr) == 12  # int(12.5 / 1.0)
    # junk bytes keep the strict contract
    junk = spark.createDataFrame(
        [(3, b"notavideo" * 10)], "doc_id long, media binary"
    )
    with pytest.raises(Exception) as exc:
        video_metadata(junk, fake_decode=False).collect()
    assert "CodecUnavailable" in str(exc.value) or "container" in str(exc.value)


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


# -- real stdlib codecs (round 2) --------------------------------------------

import struct
import zlib


def _png_chunk(typ, data):
    return (
        struct.pack(">I", len(data)) + typ + data
        + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
    )


def make_png(w, h, pixel_fn, color_type=2, row_filter=0):
    """Minimal real PNG encoder (8-bit, no interlace). row_filter 0 or 2
    (Up) to exercise the decoder's filter reversal."""
    ch = {0: 1, 2: 3, 6: 4}[color_type]
    rows = [
        bytes(v for x in range(w) for v in pixel_fn(x, y)[:ch])
        for y in range(h)
    ]
    raw = b""
    prev = bytes(w * ch)
    for line in rows:
        if row_filter == 2:
            raw += b"\x02" + bytes((c - p) & 0xFF for c, p in zip(line, prev))
        else:
            raw += b"\x00" + line
        prev = line
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw))
        + _png_chunk(b"IEND", b"")
    )


def make_wav(sample_rate=8000, n=4000):
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(sample_rate)
        wf.writeframes(b"\x00\x01" * n)
    return buf.getvalue()


def make_jpeg(w, h):
    sof = struct.pack(">HBHHB", 17, 8, h, w, 3) + b"\x01\x11\x00\x02\x11\x01\x03\x11\x01"
    return b"\xff\xd8\xff\xc0" + sof + b"\xff\xd9"


def test_real_image_metadata_formats(spark):
    from k2_18_spark.operators.multimodal import image_metadata

    png = make_png(20, 10, lambda x, y: (x * 12 % 256, 0, 0))
    gif = b"GIF89a" + struct.pack("<HH", 33, 44) + b"\x00" * 10
    bmp = b"BM" + b"\x00" * 16 + struct.pack("<ii", 55, -66) + b"\x00" * 10
    jpg = make_jpeg(77, 88)
    media = spark.createDataFrame(
        [(1, bytearray(png)), (2, bytearray(gif)), (3, bytearray(bmp)),
         (4, bytearray(jpg))],
        "doc_id long, media binary",
    )
    got = {r["doc_id"]: (r["width"], r["height"], r["mode"])
           for r in image_metadata(media, fake_decode=False).collect()}
    assert got[1] == (20, 10, "RGB")
    assert got[2] == (33, 44, "P")
    assert got[3] == (55, 66, "RGB")
    assert got[4] == (77, 88, "RGB")


def test_real_wav_metadata(spark):
    from k2_18_spark.operators.multimodal import audio_metadata

    media = spark.createDataFrame(
        [(1, bytearray(make_wav(8000, 4000)))], "doc_id long, media binary"
    )
    r = audio_metadata(media, fake_decode=False).collect()[0]
    assert (r["sample_rate"], r["n_samples"]) == (8000, 4000)
    assert abs(r["duration_s"] - 0.5) < 1e-9


def test_image_features_real_pixels(spark):
    from k2_18_spark.operators.multimodal import image_features

    grad = make_png(32, 32, lambda x, y: (x * 255 // 31,) * 3)
    grad_up = make_png(32, 32, lambda x, y: (x * 255 // 31,) * 3, row_filter=2)
    inv = make_png(32, 32, lambda x, y: (255 - x * 255 // 31,) * 3)
    dark = make_png(16, 16, lambda x, y: (10 + (x + y) % 3, 10, 10))
    media = spark.createDataFrame(
        [(1, bytearray(grad)), (2, bytearray(inv)), (3, bytearray(dark)),
         (4, bytearray(grad_up)), (5, bytearray(b"not a png"))],
        "doc_id long, media binary",
    )
    got = {r["doc_id"]: r for r in image_features(media).collect()}
    # real dims and channels from the pixel decoder
    assert (got[1]["width"], got[1]["height"], got[1]["channels"]) == (32, 32, 3)
    # filter-2 (Up) encoding decodes to the same pixels → same ahash
    assert got[4]["ahash"] == got[1]["ahash"]
    # gradient vs inverted gradient: different fingerprints
    assert got[1]["ahash"] != got[2]["ahash"]
    # dark image has lower mean luma than the gradient
    assert got[3]["mean_luma"] < got[1]["mean_luma"]
    # undecodable bytes → null features, row preserved
    assert got[5]["ahash"] is None and got[5]["width"] is None
