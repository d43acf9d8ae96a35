"""[EXT] Multimodal column plumbing (image/audio/video as binary).

Design per SURVEY.md north star: media payloads are opaque ``binary``
columns with typed metadata; decode / feature-extract / resize /
frame-sample run as Arrow-batched Pandas UDFs over ``mapInPandas`` —
the Spark-side contract (schema, batch shape, partitioning) is real and
tested, while the codec step itself is STUBBED: the image/audio
libraries are not in this container, so ``decode_media`` raises
``NotImplementedError`` unless the deterministic fake codec is
requested. Swapping in a real codec changes one function body, not the
pipeline.

Scale notes: mapInPandas streams Arrow batches — no per-row Python
overhead; payload columns should be pruned before any wide shuffle
(extract features first, carry only features + keys downstream).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("byte_sum", LongType()),
        StructField("content_md5", StringType()),
    ]
)


def with_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach an opaque binary payload column (UTF-8 bytes of the text
    fixture stand in for a media blob) plus typed metadata."""
    return df.withColumn("payload", F.encode(F.col(text_col), "UTF-8")).withColumn(
        "media_type", F.lit("text/plain")
    )


def _find_real_codec(media_type: str):
    """Probe for an installed decoder for ``media_type``. Returns a
    ``bytes -> decoded`` callable or None. Import is attempted lazily
    per media family so adding a library (Pillow, soundfile, av) makes
    the real branch live with zero code changes here."""
    family = (media_type or "").split("/", 1)[0]
    if family == "image":
        try:
            import io

            from PIL import Image  # optional dependency

            return lambda b: Image.open(io.BytesIO(b))
        except ImportError:
            return None
    if family == "audio":
        try:
            import io

            import soundfile  # optional dependency

            return lambda b: soundfile.read(io.BytesIO(b))
        except ImportError:
            return None
    if family == "video":
        try:
            import av  # optional dependency  # noqa: F401

            import io

            return lambda b: av.open(io.BytesIO(b))
        except ImportError:
            return None
    return None


def decode_media(payload: bytes, media_type: str, *, fake: bool = False):
    """Decode a media payload.

    With ``fake=True`` returns the raw bytes (a deterministic stand-in
    a test can assert on). Otherwise a real decoder is looked up by
    media family via try-import (`_find_real_codec`) and used when
    present; when the environment has no codec for the type this raises
    ``NotImplementedError`` — the documented seam, not silent garbage."""
    if fake:
        return payload
    codec = _find_real_codec(media_type)
    if codec is not None:
        return codec(payload)
    raise NotImplementedError(
        f"no codec for {media_type!r} in this environment; "
        "install Pillow / soundfile / av to activate the real branch"
    )


def extract_features(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Feature extraction over binary payloads via mapInPandas.

    Computes (n_bytes, byte_sum, md5) per payload from the *actual
    bytes* — i.e. the real UDF plumbing — using the fake codec. Batch
    shape: one Arrow batch in, one feature frame out; payload column is
    dropped on output so downstream stages never shuffle blobs."""

    def batches(it: Iterator) -> Iterator:
        import hashlib

        import pandas as pd

        for pdf in it:
            blobs = [
                decode_media(b, t, fake=True)
                for b, t in zip(pdf["payload"], pdf["media_type"])
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "n_bytes": [len(b) for b in blobs],
                    "byte_sum": [int(sum(b)) for b in blobs],
                    "content_md5": [hashlib.md5(b).hexdigest() for b in blobs],
                }
            )

    return df.select(id_col, "payload", "media_type").mapInPandas(
        batches, FEATURE_SCHEMA
    )


IMAGE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("mode", StringType()),
    ]
)


def has_real_codec(media_type: str) -> bool:
    """True when an installed library can decode this media family."""
    return _find_real_codec(media_type) is not None


def extract_image_features(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """REAL-codec image feature extraction: decode each payload through
    the `decode_media` seam (Pillow when installed — this is the live
    real branch, not the fake codec) and emit (width, height, mode) per
    image. Same Arrow-batched mapInPandas contract as the fake-codec
    operators: payload never leaves the stage, downstream shuffles
    carry only scalar features. In an environment without Pillow the
    task raises the documented ``NotImplementedError`` — loud, never
    silent garbage."""

    def batches(it: Iterator) -> Iterator:
        import pandas as pd

        for pdf in it:
            rows = []
            for i, b, t in zip(pdf[id_col], pdf["payload"], pdf["media_type"]):
                img = decode_media(bytes(b), t)
                rows.append((int(i), int(img.size[0]), int(img.size[1]), str(img.mode)))
            yield pd.DataFrame(
                rows, columns=["doc_id", "width", "height", "mode"]
            )

    return df.select(id_col, "payload", "media_type").mapInPandas(
        batches, IMAGE_SCHEMA
    )


FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("frame_md5", StringType()),
        StructField("frame_chars", LongType()),
    ]
)


def sample_frames(
    df: DataFrame,
    id_col: str = "doc_id",
    *,
    frame_size: int = 64,
    stride: int = 4,
) -> DataFrame:
    """Frame-sampling plumbing over binary payloads via mapInPandas.

    The deterministic fake codec treats the payload as a "video" whose
    frames are consecutive ``frame_size``-character chunks of the
    UTF-8-decoded bytes; sampling keeps every ``stride``-th full frame
    (the real seam — keyframe extraction via a media library — slots
    into `decode_media` without touching this batch shape). Output is
    one row per sampled frame (id, frame index, md5 of the frame's
    UTF-8 bytes, char count): frames fan OUT of the UDF as rows, the
    payload itself never leaves the stage — downstream shuffles carry
    only per-frame features, the contract that matters at 100 TB of
    video."""

    def batches(it: Iterator) -> Iterator:
        import hashlib

        import pandas as pd

        for pdf in it:
            out = {
                "doc_id": [],
                "frame_idx": [],
                "frame_md5": [],
                "frame_chars": [],
            }
            for i, b, t in zip(
                pdf[id_col], pdf["payload"], pdf["media_type"]
            ):
                s = decode_media(bytes(b), t, fake=True).decode("utf-8")
                n_frames = len(s) // frame_size
                for k in range(0, n_frames, stride):
                    chunk = s[k * frame_size : (k + 1) * frame_size]
                    out["doc_id"].append(int(i))
                    out["frame_idx"].append(k)
                    out["frame_md5"].append(
                        hashlib.md5(chunk.encode("utf-8")).hexdigest()
                    )
                    out["frame_chars"].append(len(chunk))
            yield pd.DataFrame(out).astype(
                {
                    "doc_id": "int64",
                    "frame_idx": "int64",
                    "frame_chars": "int64",
                }
            )

    return df.select(id_col, "payload", "media_type").mapInPandas(
        batches, FRAME_SCHEMA
    )


def resize_media(
    df: DataFrame, *, target_bytes: int, id_col: str = "doc_id"
) -> DataFrame:
    """Resize/downsample plumbing: payload in → smaller payload out,
    schema and metadata preserved (media_type, plus the old/new sizes)
    — the transform-in-place shape (image resize, audio downsample)
    as opposed to `extract_features`' payload-dropping shape.

    Fake codec: truncate the payload to ``target_bytes`` (a real codec
    re-encodes at a lower resolution through the `decode_media` seam).
    The output payload column stays binary so a downstream stage can
    chain decode → resize → extract without leaving Arrow."""

    def batches(it: Iterator) -> Iterator:
        import pandas as pd

        for pdf in it:
            blobs = [
                decode_media(bytes(b), t, fake=True)[:target_bytes]
                for b, t in zip(pdf["payload"], pdf["media_type"])
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "payload": blobs,
                    "media_type": pdf["media_type"],
                    "n_bytes_in": [len(bytes(b)) for b in pdf["payload"]],
                    "n_bytes_out": [len(b) for b in blobs],
                }
            )

    return df.select(id_col, "payload", "media_type").mapInPandas(
        batches,
        "doc_id long, payload binary, media_type string, "
        "n_bytes_in long, n_bytes_out long",
    )


AUDIO_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_samples", LongType()),
        StructField("duration_ms", LongType()),
        StructField("peak", LongType()),
        StructField("energy", LongType()),
    ]
)


def audio_stats(
    df: DataFrame, id_col: str = "doc_id", *, sample_rate: int = 16000
) -> DataFrame:
    """Audio-shaped feature extraction over opaque payloads: the fake
    decode interprets consecutive byte PAIRS as little-endian unsigned
    16-bit PCM samples (a real soundfile decode slots into the same
    seam via `_find_real_codec('audio/...')`), then per-clip
    n_samples / duration / peak / energy — all exact integers, so the
    Arrow-batch plumbing is value-verifiable. Payloads never leave the
    stage; odd trailing bytes are truncated (len // 2 samples)."""

    def batches(it: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in it:
            rows = {"doc_id": [], "n_samples": [], "duration_ms": [],
                    "peak": [], "energy": []}
            for i, b in zip(pdf[id_col], pdf["payload"]):
                raw = decode_media(bytes(b), "audio/pcm16", fake=True)
                smp = np.frombuffer(
                    raw, dtype="<u2", count=len(raw) // 2
                ).astype(np.int64)
                rows["doc_id"].append(int(i))
                rows["n_samples"].append(len(smp))
                rows["duration_ms"].append(len(smp) * 1000 // sample_rate)
                rows["peak"].append(int(smp.max()) if len(smp) else 0)
                rows["energy"].append(int(smp.sum()))
            yield pd.DataFrame(rows)

    return df.select(id_col, "payload").mapInPandas(batches, AUDIO_SCHEMA)
