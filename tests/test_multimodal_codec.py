"""The multimodal codec seam: real branch when a library is present,
loud NotImplementedError when not, fake codec always available."""

from __future__ import annotations

import base64

import pytest

from nutdb_spark.operators.multimodal import (
    decode_media,
    extract_image_features,
    has_real_codec,
)

# a valid 1x1 PNG (RGBA), embedded so no codec is needed to CREATE it
_PNG_1x1 = base64.b64decode(
    "iVBORw0KGgoAAAANSUhEUgAAAAEAAAABCAYAAAAfFcSJAAAADUlEQVR42mP8"
    "z8BQDwAEhQGAhKmMIQAAAABJRU5ErkJggg=="
)

_HAS_PIL = has_real_codec("image/png")


@pytest.mark.skipif(not _HAS_PIL, reason="Pillow not installed")
def test_real_image_decode_direct():
    img = decode_media(_PNG_1x1, "image/png")
    assert img.size == (1, 1)


@pytest.mark.skipif(not _HAS_PIL, reason="Pillow not installed")
def test_real_image_features_through_spark(spark):
    df = spark.createDataFrame(
        [(1, bytearray(_PNG_1x1), "image/png")],
        "doc_id long, payload binary, media_type string",
    )
    rows = extract_image_features(df).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["doc_id"], r["width"], r["height"]) == (1, 1, 1)


@pytest.mark.skipif(_HAS_PIL, reason="Pillow installed: seam is live")
def test_seam_raises_without_codec():
    with pytest.raises(NotImplementedError, match="image/png"):
        decode_media(_PNG_1x1, "image/png")


def test_fake_codec_always_available():
    assert decode_media(b"abc", "image/png", fake=True) == b"abc"
