"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing (schema, partitioning, Arrow batch shape, UDF
signatures) is real and tested.  Codecs are OPTIONAL dependencies resolved
at runtime:

* ``fake=True`` -- deterministic decode (payload bytes -> 16-bin byte
  histogram as the 'features'), DuckDB-oracle-checked end to end; the
  distributed path and downstream operators (ANN over the feature column,
  dedup over payload hashes) run on real inputs.
* ``fake=False`` -- REAL decode where the library exists: images via PIL
  (16x16 grayscale resize -> normalized 16-bin intensity histogram); audio/
  video need torchaudio/ffmpeg and raise NotImplementedError with setup
  guidance when absent.  Detection happens per executor at first batch, so
  the same code runs in this container (PIL absent -> clear error) and on a
  cluster with the libs installed.

Schema convention (training-data-pipeline standard):
    media(doc_id long, modality string, payload binary,
          meta map<string,string>)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

MEDIA_SCHEMA = (
    "doc_id long, modality string, payload binary, meta map<string,string>"
)
FEATURE_SCHEMA = (
    "doc_id long, modality string, n_bytes long, features array<double>"
)

N_FEATURES = 16


def _pil_or_none():
    try:
        from PIL import Image  # optional dependency

        return Image
    except ImportError:
        return None


def decode_image_real(data: bytes) -> list[float]:
    """PIL decode: 16x16 grayscale thumbnail -> normalized 16-bin intensity
    histogram (same feature width as the fake path, so downstream schemas
    are identical either way)."""
    import io

    import numpy as np

    Image = _pil_or_none()
    if Image is None:
        raise NotImplementedError(
            "real image decode requires Pillow (pip install pillow); "
            "pass fake=True for the deterministic oracle-checked stand-in"
        )
    with Image.open(io.BytesIO(data)) as img:
        arr = np.asarray(
            img.convert("L").resize((16, 16)), dtype=np.uint8
        )
    hist = np.bincount(
        (arr >> 4).ravel(), minlength=N_FEATURES
    ).astype(np.float64)
    return (hist / hist.sum()).tolist()


def decode_audio_real(data: bytes) -> list[float]:
    """WAV decode via the stdlib ``wave`` module (no external dependency):
    normalized 16-bin histogram of the first channel's absolute amplitude.
    Non-WAV containers (mp3/ogg/flac) need torchaudio/ffmpeg and raise."""
    import io
    import wave

    import numpy as np

    try:
        with wave.open(io.BytesIO(data)) as w:
            width = w.getsampwidth()
            ch = w.getnchannels()
            raw = w.readframes(w.getnframes())
    except (wave.Error, EOFError) as e:
        raise NotImplementedError(
            f"non-WAV audio requires torchaudio/ffmpeg ({e}); pass "
            "fake=True for the deterministic oracle-checked stand-in"
        ) from e
    dtype = {1: np.uint8, 2: np.dtype("<i2"), 4: np.dtype("<i4")}.get(width)
    if dtype is None:
        raise NotImplementedError(f"unsupported WAV sample width {width}")
    arr = np.frombuffer(raw, dtype=dtype)
    if ch > 1:
        arr = arr[: len(arr) - len(arr) % ch].reshape(-1, ch)[:, 0]
    arr = arr.astype(np.float64)
    if width == 1:
        arr = arr - 128.0  # 8-bit WAV is unsigned
    if not len(arr):
        return [0.0] * N_FEATURES
    amp = np.minimum(np.abs(arr) / float(1 << (8 * width - 1)), 1.0 - 1e-12)
    hist = np.bincount(
        (amp * N_FEATURES).astype(np.int64), minlength=N_FEATURES
    ).astype(np.float64)
    return (hist / hist.sum()).tolist()


def decode_media_batch(payloads, modalities, fake: bool):
    """The codec kernel: bytes -> fixed-length feature vector."""
    import numpy as np

    feats, sizes = [], []
    for payload, modality in zip(payloads, modalities):
        data = bytes(payload) if payload is not None else b""
        sizes.append(len(data))
        if not data:
            feats.append([0.0] * N_FEATURES)
            continue
        if not fake:
            if modality == "image":
                feats.append(decode_image_real(data))
                continue
            if modality == "audio":
                feats.append(decode_audio_real(data))
                continue
            raise NotImplementedError(
                f"real {modality} decode requires ffmpeg -- not available "
                "in this environment; pass fake=True for the deterministic "
                "stand-in"
            )
        arr = np.frombuffer(data, dtype=np.uint8)
        hist = np.bincount(arr >> 4, minlength=N_FEATURES).astype(np.float64)
        feats.append((hist / hist.sum()).tolist())
    return sizes, feats


def decode_media_df(media: DataFrame, fake: bool = False) -> DataFrame:
    """Distributed decode/feature-extract over Arrow batches (map-only)."""

    def run(batches):
        import pandas as pd

        for pdf in batches:
            sizes, feats = decode_media_batch(
                pdf["payload"], pdf["modality"], fake
            )
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "modality": pdf["modality"],
                "n_bytes": sizes,
                "features": feats,
            })

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def frame_sample_df(media: DataFrame, every_n_bytes: int = 1024,
                    fake: bool = False) -> DataFrame:
    """Video frame sampling stub: emits one row per sampled 'frame' offset.
    Real implementation would demux with ffmpeg; the fake samples byte
    offsets deterministically so the explode/partition shape is real."""

    def run(batches):
        import pandas as pd

        for pdf in batches:
            rows = {"doc_id": [], "frame_idx": [], "offset": []}
            for doc_id, payload, modality in zip(
                pdf["doc_id"], pdf["payload"], pdf["modality"]
            ):
                if not fake:
                    raise NotImplementedError(
                        "real frame sampling requires ffmpeg; pass fake=True"
                    )
                n = len(bytes(payload) if payload is not None else b"")
                for i, off in enumerate(range(0, n, every_n_bytes)):
                    rows["doc_id"].append(doc_id)
                    rows["frame_idx"].append(i)
                    rows["offset"].append(off)
            yield pd.DataFrame(rows)

    return media.mapInPandas(
        run, schema="doc_id long, frame_idx int, offset long"
    )


def synthesize_media(spark, docs: DataFrame) -> DataFrame:
    """Deterministic fake media table from the documents table: payload =
    utf-8 text bytes, modality round-robins image/audio/video."""
    return docs.select(
        "doc_id",
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("modality"),
        F.encode("text", "utf-8").alias("payload"),
        F.create_map(
            F.lit("source"), F.col("source"), F.lit("lang"), F.col("lang")
        ).alias("meta"),
    )
