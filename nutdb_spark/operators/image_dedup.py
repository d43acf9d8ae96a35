"""[EXT] Perceptual-hash image deduplication.

Crosses the dedup ladder into the multimodal family: a 64-bit integer
average-hash (aHash) over each payload's pixel stream, band-bucketed
pairing (the SimHash k+1-table precedent from operators/dedup.py),
and an exact ``bit_count(xor)`` Hamming verify.

The hash is packed as FOUR 16-bit band integers (h0..h3) rather than
one int64 — the bands are exactly the LSH bucket keys the pairing
stage needs, and staying ≤ 2^16 keeps every value positive and
sign-free in any engine. With 4 bands, any pair within Hamming
distance ≤ 3 shares at least one untouched band (pigeonhole), so the
band join is COMPLETE for the default threshold — no candidate is
ever lost, the property the brute-force oracle proves.

Codec seam (operators/multimodal.py decode_media): the deterministic
fake codec treats the payload bytes as the pixel stream and samples
64 evenly-spaced "pixels" (byte at position ``i·n div 64``); the real
branch (Pillow, when installed) decodes, grayscales and resamples to
the same 8×8 = 64 pixels, feeding the identical packing — swapping
codecs changes which bytes become pixels, never the dedup plan.

Scale design: hashing is one Arrow-batched mapInPandas projection
(payloads never leave the stage — downstream shuffles carry 4 small
ints per image); pairing is an equi-join on (band_idx, band_value)
buckets with a < b — never a cross join (plan-pinned); the verify is
a pure integer expression. At 100 TB of images the band tables are
the only shuffle, exactly the MinHash-LSH shape.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

AHASH_PIXELS = 64
AHASH_BANDS = 4
AHASH_BAND_BITS = 16
# 4 bands tolerate ≤ 3 differing bits with a guaranteed shared band
AHASH_MAX_HAMMING = AHASH_BANDS - 1

AHASH_SCHEMA = "doc_id long, h0 long, h1 long, h2 long, h3 long"


def ahash_pack(pixels: list[int]) -> tuple[int, int, int, int]:
    """Pack 64 integer pixels into the 4 band ints: bit i of the hash
    is 1 iff pixel_i > floor(mean); band j holds bits [16j, 16j+16)."""
    assert len(pixels) == AHASH_PIXELS
    avg = sum(pixels) // AHASH_PIXELS
    bands = [0] * AHASH_BANDS
    for i, p in enumerate(pixels):
        if p > avg:
            bands[i // AHASH_BAND_BITS] |= 1 << (i % AHASH_BAND_BITS)
    return tuple(bands)


def fake_pixels(data: bytes) -> list[int]:
    """The deterministic fake codec's pixel stream: 64 evenly-spaced
    byte samples (position ``i·n div 64``), zeros for an empty blob."""
    n = len(data)
    if n == 0:
        return [0] * AHASH_PIXELS
    return [data[(i * n) // AHASH_PIXELS] for i in range(AHASH_PIXELS)]


def real_pixels(img) -> list[int]:
    """The real-codec branch: grayscale + nearest-neighbour resample
    to 8×8 via the same evenly-spaced sampling rule applied to the 2-D
    grid (row ``(r·H) div 8``, col ``(c·W) div 8``) — deterministic,
    no float filtering, so the committed packing stays exact."""
    g = img.convert("L")
    w, h = g.size
    px = g.load()
    out = []
    for r in range(8):
        for c in range(8):
            out.append(int(px[(c * w) // 8, (r * h) // 8]))
    return out


def image_ahash(
    df: DataFrame, id_col: str = "doc_id", *, fake: bool = True
) -> DataFrame:
    """Per-payload perceptual hash: (doc_id, h0..h3). ``fake=True``
    samples pixels straight from the payload bytes (the deterministic
    codec — what the oracle replays); ``fake=False`` decodes through
    the real-codec seam (Pillow) and raises the documented
    ``NotImplementedError`` when no codec is installed."""
    from nutdb_spark.operators.multimodal import decode_media

    def batches(it: Iterator) -> Iterator:
        import pandas as pd

        for pdf in it:
            rows = []
            for i, b, t in zip(
                pdf[id_col], pdf["payload"], pdf["media_type"]
            ):
                if fake:
                    pixels = fake_pixels(decode_media(bytes(b), t, fake=True))
                else:
                    pixels = real_pixels(decode_media(bytes(b), t))
                rows.append((int(i), *ahash_pack(pixels)))
            yield pd.DataFrame(
                rows, columns=["doc_id", "h0", "h1", "h2", "h3"]
            )

    return df.select(id_col, "payload", "media_type").mapInPandas(
        batches, AHASH_SCHEMA
    )


def dedup_image_pairs(
    hashes: DataFrame, *, max_hamming: int = AHASH_MAX_HAMMING
) -> DataFrame:
    """Near-duplicate image pairs from the (doc_id, h0..h3) hash frame:
    band-bucket candidate join + exact Hamming verify.

    Returns (a, b, dist) with a < b, dist = popcount of the 64-bit
    xor, dist ≤ max_hamming. For ``max_hamming ≤ 3`` the 4-band join
    is provably complete (some band matches exactly); larger
    thresholds keep the same plan but trade completeness — the
    documented LSH knob, same as the SimHash tables."""
    bands = hashes.select(
        "doc_id",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(j).alias("bi"), F.col(f"h{j}").alias("bv")
                )
                for j in range(AHASH_BANDS)
            ])
        ).alias("band"),
    ).select("doc_id", F.col("band.bi").alias("bi"), F.col("band.bv").alias("bv"))
    pairs = (
        bands.alias("l")
        .join(
            bands.alias("r"),
            (F.col("l.bi") == F.col("r.bi"))
            & (F.col("l.bv") == F.col("r.bv"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(
            F.col("l.doc_id").alias("a"), F.col("r.doc_id").alias("b")
        )
        .distinct()
    )
    ha = hashes.select(
        F.col("doc_id").alias("a"),
        *[F.col(f"h{j}").alias(f"la{j}") for j in range(AHASH_BANDS)],
    )
    hb = hashes.select(
        F.col("doc_id").alias("b"),
        *[F.col(f"h{j}").alias(f"lb{j}") for j in range(AHASH_BANDS)],
    )
    dist = None
    for j in range(AHASH_BANDS):
        d = F.bit_count(
            F.col(f"la{j}").bitwiseXOR(F.col(f"lb{j}"))
        ).cast("long")
        dist = d if dist is None else dist + d
    return (
        pairs.join(ha, "a")
        .join(hb, "b")
        .select("a", "b", dist.alias("dist"))
        .filter(F.col("dist") <= max_hamming)
    )


def oracle_image_ahash(
    *,
    source: str = "documents",
    id_expr: str = "doc_id",
    text_expr: str = "text",
    where: str = "TRUE",
) -> str:
    """DuckDB replay of the fake-codec aHash over ``source``'s ASCII
    text (byte i == codepoint i on the fixture): a full SELECT
    yielding (doc_id, h0..h3)."""
    px = (
        f"list_transform(range(0, {AHASH_PIXELS}), i -> CASE "
        f"WHEN length({text_expr}) = 0 THEN 0 ELSE "
        f"unicode(substring({text_expr}, "
        f"1 + (i * length({text_expr})) // {AHASH_PIXELS}, 1)) END)"
    )
    band_cols = ", ".join(
        "CAST(coalesce(list_sum(list_transform("
        f"range({j * AHASH_BAND_BITS}, {(j + 1) * AHASH_BAND_BITS}), "
        f"i -> CASE WHEN px[i + 1] > avg THEN 1 << (i % {AHASH_BAND_BITS}) "
        "ELSE 0 END)), 0) AS BIGINT) AS h" + str(j)
        for j in range(AHASH_BANDS)
    )
    return f"""
SELECT {id_expr} AS doc_id, {band_cols}
FROM (SELECT {id_expr}, px, list_sum(px) // {AHASH_PIXELS} AS avg
      FROM (SELECT {id_expr}, {px} AS px
            FROM {source} WHERE {where}))"""


def oracle_dedup_image_pairs(
    hashes_sql: str, *, max_hamming: int = AHASH_MAX_HAMMING
) -> str:
    """DuckDB replay of dedup_image_pairs over a hash subquery — the
    BRUTE-FORCE all-pairs form (the oracle proves the band join loses
    nothing: for dist ≤ 3 the two must agree bit-for-bit on some
    band, so every brute-force survivor is a band-join candidate)."""
    dist = " + ".join(
        f"bit_count(xor(l.h{j}, r.h{j}))" for j in range(AHASH_BANDS)
    )
    return f"""
WITH h AS ({hashes_sql})
SELECT l.doc_id AS a, r.doc_id AS b, CAST({dist} AS BIGINT) AS dist
FROM h l JOIN h r ON l.doc_id < r.doc_id
WHERE {dist} <= {max_hamming}"""


# --- [EXT] audio crossing: the same band machinery over PCM samples ----------


def fake_pcm_pixels(data: bytes) -> list[int]:
    """The audio fake codec's sample stream (the audio_stats
    convention: consecutive byte PAIRS as little-endian unsigned
    16-bit PCM), resampled to 64 evenly-spaced samples — the same
    evenly-spaced rule as :func:`fake_pixels`, over samples instead
    of bytes. ahash_pack is value-scale-agnostic (it compares against
    the integer mean), so the identical packing and band join apply."""
    n = len(data) // 2
    if n == 0:
        return [0] * AHASH_PIXELS
    smp = [
        data[2 * k] + 256 * data[2 * k + 1] for k in range(n)
    ]
    return [smp[(i * n) // AHASH_PIXELS] for i in range(AHASH_PIXELS)]


def audio_ahash(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Per-payload acoustic fingerprint: (doc_id, h0..h3) — the
    average-hash of the fake-PCM energy profile. A real audio codec
    (soundfile) slots into the decode seam and feeds the same
    packing; the dedup plan (band join + Hamming verify,
    :func:`dedup_image_pairs`) is shared unchanged — the fingerprint
    family is one machine with per-modality extractors."""
    from nutdb_spark.operators.multimodal import decode_media

    def batches(it):
        import pandas as pd

        for pdf in it:
            rows = []
            for i, b in zip(pdf[id_col], pdf["payload"]):
                raw = decode_media(bytes(b), "audio/pcm16", fake=True)
                rows.append((int(i), *ahash_pack(fake_pcm_pixels(raw))))
            yield pd.DataFrame(
                rows, columns=["doc_id", "h0", "h1", "h2", "h3"]
            )

    return df.select(id_col, "payload").mapInPandas(batches, AHASH_SCHEMA)


def oracle_audio_ahash(
    *,
    source: str = "documents",
    id_expr: str = "doc_id",
    text_expr: str = "text",
    where: str = "TRUE",
) -> str:
    """DuckDB replay of the fake-PCM aHash over ASCII text (byte 2k ==
    codepoint 2k+1 in 1-indexed SQL): a full SELECT yielding
    (doc_id, h0..h3)."""
    smp = (
        f"list_transform(range(1, length({text_expr}) // 2 + 1), "
        f"k -> CAST(unicode(substring({text_expr}, 2*k - 1, 1)) "
        f"+ 256 * unicode(substring({text_expr}, 2*k, 1)) AS BIGINT))"
    )
    px = (
        f"CASE WHEN len(smp) = 0 THEN "
        f"list_transform(range(0, {AHASH_PIXELS}), i -> CAST(0 AS BIGINT)) "
        f"ELSE list_transform(range(0, {AHASH_PIXELS}), "
        f"i -> smp[1 + (i * len(smp)) // {AHASH_PIXELS}]) END"
    )
    band_cols = ", ".join(
        "CAST(coalesce(list_sum(list_transform("
        f"range({j * AHASH_BAND_BITS}, {(j + 1) * AHASH_BAND_BITS}), "
        f"i -> CASE WHEN px[i + 1] > avg THEN 1 << (i % {AHASH_BAND_BITS}) "
        "ELSE 0 END)), 0) AS BIGINT) AS h" + str(j)
        for j in range(AHASH_BANDS)
    )
    return f"""
SELECT {id_expr} AS doc_id, {band_cols}
FROM (SELECT {id_expr}, px, list_sum(px) // {AHASH_PIXELS} AS avg
      FROM (SELECT {id_expr}, {px} AS px
            FROM (SELECT {id_expr}, {smp} AS smp
                  FROM {source} WHERE {where})))"""


def incremental_image_pairs(
    delta_hashes: DataFrame,
    index: "DataFrame | None",
    *,
    max_hamming: int = AHASH_MAX_HAMMING,
) -> tuple[DataFrame, DataFrame]:
    """Corpus-delta form of :func:`dedup_image_pairs` — the nightly
    image-ingest pattern: ``index`` is the persisted hash frame
    (doc_id, h0..h3) of everything already ingested; the delta's
    hashes pair against (index ∪ delta) and the union becomes the new
    index. A pair {x, y} is emitted exactly once, by the batch that
    ingests the LATER of the two — so the union of every batch's
    pairs replays the one-shot operator row-for-row (pinned).

    Scale shape: the band join is DELTA-bounded on one side (the
    existing corpus only ever contributes rows whose band value
    collides with a delta row), which is what makes nightly ingest
    cheap against a corpus-sized index — the MinHash band-index
    ingest precedent (q_stream_dedup_neardup)."""
    new_index = (
        index.unionByName(delta_hashes) if index is not None else delta_hashes
    )

    def explode_bands(h: DataFrame) -> DataFrame:
        return h.select(
            "doc_id",
            F.explode(
                F.array(*[
                    F.struct(
                        F.lit(j).alias("bi"), F.col(f"h{j}").alias("bv")
                    )
                    for j in range(AHASH_BANDS)
                ])
            ).alias("band"),
        ).select(
            "doc_id",
            F.col("band.bi").alias("bi"),
            F.col("band.bv").alias("bv"),
        )

    bd = explode_bands(delta_hashes)
    ba = explode_bands(new_index)
    pairs = (
        bd.alias("l")
        .join(
            ba.alias("r"),
            (F.col("l.bi") == F.col("r.bi"))
            & (F.col("l.bv") == F.col("r.bv"))
            & (F.col("l.doc_id") != F.col("r.doc_id")),
        )
        .select(
            F.least(F.col("l.doc_id"), F.col("r.doc_id")).alias("a"),
            F.greatest(F.col("l.doc_id"), F.col("r.doc_id")).alias("b"),
        )
        .distinct()
    )
    ha = new_index.select(
        F.col("doc_id").alias("a"),
        *[F.col(f"h{j}").alias(f"la{j}") for j in range(AHASH_BANDS)],
    )
    hb = new_index.select(
        F.col("doc_id").alias("b"),
        *[F.col(f"h{j}").alias(f"lb{j}") for j in range(AHASH_BANDS)],
    )
    dist = None
    for j in range(AHASH_BANDS):
        d = F.bit_count(
            F.col(f"la{j}").bitwiseXOR(F.col(f"lb{j}"))
        ).cast("long")
        dist = d if dist is None else dist + d
    out = (
        pairs.join(ha, "a")
        .join(hb, "b")
        .select("a", "b", dist.alias("dist"))
        .filter(F.col("dist") <= max_hamming)
    )
    return out, new_index
