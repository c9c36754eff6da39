"""Multimodal plumbing: schema, decode stage, frame sampling, stubs."""

import pytest

from neuscraper_spark.operators import multimodal as M


@pytest.fixture(scope="module")
def media(spark):
    return M.media_table(spark, n=60, partitions=4).cache()


def test_schema_and_determinism(spark, media):
    pdf = media.toPandas()
    assert len(pdf) == 60
    assert set(pdf["kind"]) == {"image", "audio", "video"}
    again = M.media_table(spark, n=60, partitions=2).toPandas()
    a = pdf.sort_values("media_id")["payload"].map(bytes).tolist()
    b = again.sort_values("media_id")["payload"].map(bytes).tolist()
    assert a == b  # payloads independent of partitioning


def test_decode_features(spark, media):
    out = M.decode_features(media).toPandas()
    for kind in ("image", "audio"):
        rows = out[out["kind"] == kind]
        assert len(rows) == 20
        assert all(len(f) == 4 for f in rows["features"])
    assert all(f is None for f in out[out["kind"] == "video"]["features"])


def test_frame_sample(spark, media):
    frames = M.frame_sample(media, every_n=4).toPandas()
    vids = media.filter("kind = 'video'").toPandas()
    import math

    want = sum(math.ceil(m["n_frames"] / 4) for m in vids["meta"])
    assert len(frames) == want
    assert (frames["frame_idx"] % 4 == 0).all()


def test_resize_is_stubbed(spark, media):
    with pytest.raises(Exception, match="NotImplementedError|resize requires"):
        M.resize_stub(media, 32, 32).count()


def test_decode_rejects_real_payload():
    with pytest.raises(NotImplementedError):
        M._decode_image_stub(b"\xff\xd8\xff\xe0 fake jpeg header")
