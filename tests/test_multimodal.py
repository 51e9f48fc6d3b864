"""Multimodal decode gating: real PIL path when available, deterministic
stub parity always (VERDICT r2 ask #5)."""

import pytest

from adding_datasets_to_kg_spark.operators import multimodal as mm


def test_stub_parity_on_undecodable_payloads():
    """Non-image bytes (every synthetic fixture payload) must take the
    deterministic stub path REGARDLESS of whether Pillow is installed —
    that is what keeps the mm_* oracles engine-reproducible."""
    payload = "some transcript text".encode()
    assert mm.decode_image(payload) is None  # utf-8 text never decodes
    assert mm._decode_features(payload, "image") == mm._fake_decode(payload, "image")
    assert mm._decode_features(payload, "audio") == mm._fake_decode(payload, "audio")


def test_stub_decode_null_payload_raises():
    with pytest.raises(NotImplementedError):
        mm._fake_decode(None, "image")


@pytest.mark.skipif(not mm.HAS_PIL, reason="Pillow not installed")
def test_real_decode_roundtrip_when_pil_present():
    """With Pillow present, a genuine PNG decodes, resizes to target dims,
    and the feature vector carries the decoded-for-real marker."""
    import io

    import numpy as np
    from PIL import Image

    arr = np.zeros((8, 6, 3), dtype=np.uint8)
    arr[:, :, 0] = 200  # red-ish so channel means are distinguishable
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    png = buf.getvalue()

    decoded = mm.decode_image(png)
    assert decoded is not None and decoded.shape == (8, 6, 3)

    feats = mm._decode_features(png, "image")
    assert feats[0] == 8.0 and feats[1] == 6.0  # height, width
    assert feats[6] == 1.0  # decoded-for-real marker
    assert feats[2] > feats[3]  # red mean dominates


@pytest.mark.skipif(not mm.HAS_PIL, reason="Pillow not installed")
def test_real_resize_when_pil_present(spark):
    """resize_images re-encodes decodable images at the target dims; the
    mapInPandas contract (schema, originals kept) is unchanged."""
    import io

    import numpy as np
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(np.zeros((16, 16, 3), dtype=np.uint8)).save(buf, format="PNG")
    png = buf.getvalue()
    media = spark.createDataFrame(
        [(1, "image", bytearray(png), "image/png", 16, 16, None)],
        mm.MEDIA_SCHEMA,
    )
    row = mm.resize_images(media, target_w=4, target_h=4).collect()[0]
    assert (row.width, row.height, row.orig_width, row.orig_height) == (4, 4, 16, 16)
    out = Image.open(io.BytesIO(bytes(row.payload)))
    assert out.size == (4, 4)
