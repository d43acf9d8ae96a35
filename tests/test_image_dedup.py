"""Perceptual-hash image dedup armor (operators/image_dedup.py).

The oracled entry (q_dedup_image) pins DuckDB bit-identity against the
brute-force all-pairs scan; these pin the packing against a Python
replay, the banding-completeness property, the plan shape (no
cartesian), and exercise the real Pillow branch when installed.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from nutdb_spark.operators.image_dedup import (
    AHASH_BAND_BITS,
    AHASH_BANDS,
    AHASH_MAX_HAMMING,
    AHASH_PIXELS,
    ahash_pack,
    dedup_image_pairs,
    fake_pixels,
    image_ahash,
)
from nutdb_spark.operators.multimodal import with_binary_payload


def test_ahash_pack_replay():
    rng = random.Random(13)
    for _ in range(50):
        px = [rng.randrange(0, 256) for _ in range(AHASH_PIXELS)]
        bands = ahash_pack(px)
        avg = sum(px) // AHASH_PIXELS
        want = [0] * AHASH_BANDS
        for i, p in enumerate(px):
            if p > avg:
                want[i // AHASH_BAND_BITS] |= 1 << (i % AHASH_BAND_BITS)
        assert list(bands) == want
        assert all(0 <= b < (1 << AHASH_BAND_BITS) for b in bands)


def test_fake_pixels_sampling():
    assert fake_pixels(b"") == [0] * AHASH_PIXELS
    data = bytes(range(200))
    px = fake_pixels(data)
    assert len(px) == AHASH_PIXELS
    assert px == [data[(i * 200) // 64] for i in range(64)]
    # short blobs repeat samples but never index out of range
    assert len(fake_pixels(b"ab")) == AHASH_PIXELS


def test_banding_complete_at_threshold():
    """Pigeonhole: flipping ≤ AHASH_MAX_HAMMING bits of a 4-band hash
    leaves at least one band bit-identical — the property that makes
    the band join lossless at the default radius."""
    rng = random.Random(7)
    for _ in range(200):
        bands = [rng.randrange(0, 1 << 16) for _ in range(AHASH_BANDS)]
        flipped = list(bands)
        for bit in rng.sample(range(64), rng.randint(0, AHASH_MAX_HAMMING)):
            flipped[bit // 16] ^= 1 << (bit % 16)
        assert any(a == b for a, b in zip(bands, flipped))


def test_pairs_match_bruteforce(spark):
    rng = random.Random(42)
    base = "".join(rng.choice("abcdef ") for _ in range(128))
    texts = {0: base, 1: base[:50] + "z" + base[51:], 2: base[::-1],
             3: "".join(rng.choice("xyz ") for _ in range(90))}
    df = with_binary_payload(
        spark.createDataFrame(
            [(i, t) for i, t in texts.items()], "doc_id long, text string"
        )
    )
    h = image_ahash(df)
    rows = {r["doc_id"]: (r["h0"], r["h1"], r["h2"], r["h3"])
            for r in h.collect()}
    # python brute force over the collected hashes
    want = set()
    ids = sorted(rows)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            d = sum(
                bin(x ^ y).count("1")
                for x, y in zip(rows[a], rows[b])
            )
            if d <= AHASH_MAX_HAMMING:
                want.add((a, b, d))
    got = {(r["a"], r["b"], r["dist"]) for r in dedup_image_pairs(h).collect()}
    assert got == want
    assert (0, 1, 0) in got or any(p[:2] == (0, 1) for p in got)


def test_plan_has_no_cartesian(spark):
    df = with_binary_payload(
        spark.range(0, 50).selectExpr("id AS doc_id", "'abc def' AS text")
    )
    plan = (
        dedup_image_pairs(image_ahash(df))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_real_codec_branch():
    """Exercise the Pillow branch when installed; otherwise assert the
    loud NotImplementedError seam (the documented pair)."""
    from nutdb_spark.operators.image_dedup import real_pixels
    from nutdb_spark.operators.multimodal import has_real_codec

    if not has_real_codec("image/png"):
        from nutdb_spark.operators.multimodal import decode_media

        with pytest.raises(NotImplementedError):
            decode_media(b"\x89PNG", "image/png")
        pytest.skip("Pillow not installed — seam asserted instead")
    from PIL import Image

    img = Image.new("RGB", (32, 24))
    for x in range(32):
        for y in range(24):
            img.putpixel((x, y), (8 * x, 10 * y, 0))
    px = real_pixels(img)
    assert len(px) == AHASH_PIXELS
    assert all(0 <= p <= 255 for p in px)
    g = img.convert("L")
    assert px[0] == g.getpixel((0, 0))
    bands = ahash_pack(px)
    assert all(0 <= b < (1 << 16) for b in bands)


# --- audio crossing (shared band machinery) -----------------------------------


def test_audio_pcm_pixels_replay():
    from nutdb_spark.operators.image_dedup import fake_pcm_pixels

    assert fake_pcm_pixels(b"") == [0] * AHASH_PIXELS
    assert fake_pcm_pixels(b"\x01") == [0] * AHASH_PIXELS  # odd byte trunc
    data = bytes(range(200))
    px = fake_pcm_pixels(data)
    smp = [data[2 * k] + 256 * data[2 * k + 1] for k in range(100)]
    assert px == [smp[(i * 100) // 64] for i in range(64)]
    assert all(0 <= p <= 65535 for p in px)


def test_audio_pairs_match_bruteforce(spark):
    from nutdb_spark.operators.image_dedup import audio_ahash

    rng = random.Random(99)
    base = "".join(rng.choice("abcdef gh") for _ in range(160))
    texts = {0: base, 1: base[:80] + "z" + base[81:], 2: base[::-1]}
    df = with_binary_payload(
        spark.createDataFrame(
            [(i, t) for i, t in texts.items()], "doc_id long, text string"
        )
    )
    h = audio_ahash(df)
    rows = {r["doc_id"]: (r["h0"], r["h1"], r["h2"], r["h3"])
            for r in h.collect()}
    want = set()
    ids = sorted(rows)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            d = sum(bin(x ^ y).count("1") for x, y in zip(rows[a], rows[b]))
            if d <= AHASH_MAX_HAMMING:
                want.add((a, b, d))
    got = {(r["a"], r["b"], r["dist"])
           for r in dedup_image_pairs(h).collect()}
    assert got == want


def test_incremental_replay_equals_one_shot(spark):
    from nutdb_spark.operators.image_dedup import (
        audio_ahash,  # noqa: F401 — keep import surface warm
        image_ahash,
        incremental_image_pairs,
    )

    rng = random.Random(5)
    texts = {}
    base = "".join(rng.choice("abcdefg ") for _ in range(128))
    for i in range(20):
        if i % 4 == 0:
            t = base[: 6 * i % 90] + "q" + base[6 * i % 90 + 1 :]
        else:
            t = "".join(rng.choice("xyzw ") for _ in range(100))
        texts[i] = t

    def hashes(ids):
        df = with_binary_payload(
            spark.createDataFrame(
                [(i, texts[i]) for i in ids], "doc_id long, text string"
            )
        )
        return image_ahash(df)

    one_shot, _ = incremental_image_pairs(hashes(range(20)), None)
    want = sorted(tuple(r) for r in one_shot.collect())
    got = []
    idx = None
    for batch in (range(0, 7), range(7, 15), range(15, 20)):
        p, idx = incremental_image_pairs(hashes(batch), idx)
        got.extend(tuple(r) for r in p.collect())
        idx = idx.localCheckpoint()
    assert sorted(got) == want
    # no pair emitted twice across batches
    assert len(got) == len({(a, b) for a, b, _ in got})
