"""Multimodal plumbing: decode / resize / feature-extract / frame-sample
over binary payloads (stubs behind real Arrow mapInPandas shapes)."""

from reactivedb_spark.functions import multimodal
from reactivedb_spark.sources import read_fixture

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return multimodal.with_payload(read_fixture(spark, SF, "documents").limit(20), "text")


def test_decode_metadata(spark):
    out = multimodal.decode_metadata(_docs(spark), "doc_id").collect()
    assert len(out) == 20
    r = out[0]
    assert 64 <= r["width"] < 576 and r["format"] in ("png", "jpeg", "webp")
    assert r["n_bytes"] > 0


def test_resize_bounds_payload(spark):
    out = multimodal.resize(_docs(spark), "doc_id", target=8).collect()
    assert all(0 < len(r["payload"]) <= 64 for r in out)


def test_extract_features_deterministic(spark):
    a = {r["doc_id"]: r["features"] for r in
         multimodal.extract_features(_docs(spark), "doc_id").collect()}
    b = {r["doc_id"]: r["features"] for r in
         multimodal.extract_features(_docs(spark), "doc_id").collect()}
    assert a == b
    assert all(len(v) == 8 and all(0.0 <= x <= 1.0 for x in v) for v in a.values())


def test_sample_frames_one_to_many(spark):
    frames = multimodal.sample_frames(_docs(spark), "doc_id", every_n=50).collect()
    by_doc = {}
    for r in frames:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert all(
        sorted(x["frame_no"] for x in rows) == list(range(len(rows)))
        for rows in by_doc.values()
    )
    assert sum(len(r["frame"]) for r in frames) == sum(
        r["n_bytes"] for r in multimodal.decode_metadata(_docs(spark), "doc_id").collect()
    )
