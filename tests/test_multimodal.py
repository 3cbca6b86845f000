import hashlib

import pytest

from distributed_graph_analytics_spark.functions.multimodal import (
    decode_image,
    extract_features,
    frame_sample,
    synthesize_media_table,
)


def _has_pil():
    from distributed_graph_analytics_spark.functions.multimodal import _pil

    return _pil() is not None


@pytest.mark.skipif(_has_pil(), reason="Pillow installed: real path active")
def test_decode_raises_without_codec():
    """Without Pillow the real path is an honest NotImplementedError
    gate, never a silent fake."""
    with pytest.raises(NotImplementedError):
        decode_image(b"abc")


@pytest.mark.skipif(not _has_pil(), reason="Pillow not installed")
def test_decode_and_resize_real_roundtrip():
    """With Pillow present, the real path decodes and resizes actual
    image bytes (deterministic 2x2 PNG built through Pillow itself)."""
    import io

    from PIL import Image

    from distributed_graph_analytics_spark.functions.multimodal import (
        resize_image,
    )

    im = Image.new("RGB", (2, 2), color=(255, 0, 0))
    buf = io.BytesIO()
    im.save(buf, format="PNG")
    png = buf.getvalue()
    feat = decode_image(png)
    assert len(feat) == 8
    assert feat[0] == 2.0 and feat[1] == 2.0  # width, height
    assert abs(feat[2] - 1.0) < 1e-6  # mean R of a pure-red image
    resized = resize_image(png, 4, 3)
    with Image.open(io.BytesIO(resized)) as back:
        assert back.size == (4, 3)


def test_extract_features_deterministic_and_schema(spark):
    media = synthesize_media_table(spark, n=12)
    out = extract_features(media, fake=True).collect()
    assert len(out) == 12
    for r in out:
        assert len(r["feature"]) == 8
        assert all(0.0 <= x <= 1.0 for x in r["feature"])
    # sha256 invariant survives the Arrow round-trip
    payloads = {r["media_id"]: bytes(r["payload"]) for r in media.collect()}
    for r in out:
        assert r["payload_sha256"] == hashlib.sha256(payloads[r["media_id"]]).hexdigest()
        assert r["n_bytes"] == len(payloads[r["media_id"]])


def test_frame_sample_counts(spark):
    media = synthesize_media_table(spark, n=9)
    frames = frame_sample(media, every_ms=500).collect()
    videos = {r["media_id"]: r["duration_ms"] for r in media.collect() if r["kind"] == "video"}
    per_video = {}
    for r in frames:
        per_video[r["media_id"]] = per_video.get(r["media_id"], 0) + 1
    assert set(per_video) == set(videos)
    for mid, n in per_video.items():
        assert n == videos[mid] // 500 + 1


def test_resize_images_fake_plumbing(spark):
    from distributed_graph_analytics_spark.functions.multimodal import (
        resize_image,
        resize_images,
        synthesize_media_table,
    )

    media = synthesize_media_table(spark, n=32)
    out = resize_images(media, 16, 9).collect()
    n_images = media.where("kind = 'image'").count()
    assert len(out) == n_images > 0
    for r in out:
        assert r["width"] == 16 and r["height"] == 9
        assert len(r["payload"]) == 16 * 9
    # deterministic: same input -> same stand-in bytes
    again = resize_images(media, 16, 9).collect()
    assert {bytes(r["payload"]) for r in out} == {
        bytes(r["payload"]) for r in again
    }
    # without Pillow the real path is an honest gate, not a silent fake
    if not _has_pil():
        import pytest as _pytest

        with _pytest.raises(NotImplementedError, match="Pillow"):
            resize_image(b"\x00", 4, 4)
