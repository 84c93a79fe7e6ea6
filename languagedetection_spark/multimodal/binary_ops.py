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


def probe_avi_container(data: bytes) -> dict:
    """REAL video-container probe: parse a RIFF-AVI header and its ``idx1``
    frame index with stdlib ``struct`` only (same spirit as the stdlib-wave
    audio path -- no ffmpeg needed for DEMUX metadata, only for pixel
    decode).  Returns main-header fields plus the absolute payload offset
    of every indexed video frame ('##db'/'##dc' entries, offsets resolved
    against the ``movi`` list per the AVI 1.0 convention).

    Non-AVI containers (mp4/mkv/webm) raise NotImplementedError with
    setup guidance -- those demux formats genuinely need ffmpeg."""
    import struct

    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise NotImplementedError(
            "non-AVI video container requires ffmpeg (mp4/mkv/webm demux); "
            "pass fake=True for the deterministic oracle-checked stand-in"
        )
    info: dict = {"frames": []}
    movi_base = None
    idx_entries: list[tuple[bytes, int, int]] = []
    pos = 12
    while pos + 8 <= len(data):
        ckid = data[pos:pos + 4]
        (sz,) = struct.unpack("<I", data[pos + 4:pos + 8])
        body = data[pos + 8:pos + 8 + sz]
        if ckid == b"LIST" and body[:4] == b"movi":
            movi_base = pos + 8  # idx1 offsets count from the movi fourcc
        elif ckid == b"LIST" and body[:4] == b"hdrl":
            sub, end = pos + 12, pos + 8 + sz
            while sub + 8 <= end:
                sid = data[sub:sub + 4]
                (ssz,) = struct.unpack("<I", data[sub + 4:sub + 8])
                if sid == b"avih" and ssz >= 40:
                    a = data[sub + 8:sub + 8 + ssz]
                    info["usec_per_frame"] = struct.unpack("<I", a[0:4])[0]
                    info["total_frames"] = struct.unpack("<I", a[16:20])[0]
                    info["n_streams"] = struct.unpack("<I", a[24:28])[0]
                    info["width"], info["height"] = struct.unpack(
                        "<II", a[32:40]
                    )
                sub += 8 + ssz + (ssz & 1)
        elif ckid == b"idx1":
            for off in range(0, sz - sz % 16, 16):
                fourcc = body[off:off + 4]
                _flags, offset, size = struct.unpack(
                    "<III", body[off + 4:off + 16]
                )
                idx_entries.append((fourcc, offset, size))
        pos += 8 + sz + (sz & 1)
    if movi_base is None or not idx_entries:
        raise NotImplementedError(
            "AVI without an idx1 index (streaming AVI) requires ffmpeg; "
            "pass fake=True for the deterministic stand-in"
        )
    for fourcc, offset, size in idx_entries:
        if fourcc[2:4] in (b"db", b"dc"):  # video frame entries
            # offset points at the chunk fourcc, +8 = frame payload start
            info["frames"].append(movi_base + offset + 8)
    return info


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
    """Video frame sampling: one row per frame offset.  ``fake=False``
    REALLY demuxes RIFF-AVI payloads via ``probe_avi_container`` (stdlib
    struct; true idx1 frame offsets) and raises with ffmpeg guidance for
    other containers; ``fake=True`` samples byte offsets deterministically
    (the DuckDB-oracle-checked stand-in with the same explode shape)."""

    def run(batches):
        import pandas as pd

        for pdf in batches:
            rows = {"doc_id": [], "frame_idx": [], "offset": []}
            for doc_id, payload, modality in zip(
                pdf["doc_id"], pdf["payload"], pdf["modality"]
            ):
                data = bytes(payload) if payload is not None else b""
                if not fake:
                    # REAL path: AVI demux via the stdlib RIFF/idx1 probe
                    # (true per-frame offsets); other containers raise
                    # with ffmpeg guidance inside the probe
                    for i, off in enumerate(probe_avi_container(data)["frames"]):
                        rows["doc_id"].append(doc_id)
                        rows["frame_idx"].append(i)
                        rows["offset"].append(off)
                    continue
                for i, off in enumerate(range(0, len(data), every_n_bytes)):
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
