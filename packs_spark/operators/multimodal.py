"""Multimodal columns: image/audio/video as opaque ``binary`` + typed
metadata, processed with Arrow-batched ``mapInPandas``.

The decode step needs codec libraries this container doesn't ship
(Pillow/ffmpeg/soundfile), so decoding is STUBBED two ways:

* ``decode_image``/``decode_audio`` raise ``NotImplementedError`` with the
  exact dependency to install — the real integration point;
* ``fake_decode_features`` is a deterministic stand-in (byte histogram +
  moments) so the Spark-side plumbing — schema, batch shapes, partitioning,
  UDF signatures — is fully real and tested end-to-end.

At scale the pattern is the one that matters: binary payloads NEVER pass
through Python row-at-a-time; ``mapInPandas`` streams Arrow record batches
whose binary columns are zero-copy buffers, and per-batch numpy does the
feature math.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# magic-byte sniffing for common containers (public file signatures)
MAGIC = [
    ("png", b"\x89PNG"),
    ("jpeg", b"\xff\xd8\xff"),
    ("gif", b"GIF8"),
    ("riff", b"RIFF"),  # wav/avi/webp container
    ("pdf", b"%PDF"),
    ("html", b"<htm"),
    ("html", b"<!do"),
]

FEATURE_DIM = 16  # byte-histogram buckets of the fake decoder


def sniff_format(payload: bytes | None) -> str:
    if not payload:
        return "empty"
    head = payload[:8].lower() if payload[:1] in (b"<",) else payload[:8]
    for name, magic in MAGIC:
        if payload[: len(magic)] == magic or head[: len(magic)] == magic:
            return name
    return "unknown"


def decode_image(payload: bytes):  # pragma: no cover - stub
    """Real decode requires Pillow; see fake_decode_features for the
    deterministic test stand-in."""
    raise NotImplementedError(
        "image decode requires Pillow (PIL.Image.open on io.BytesIO); "
        "not available in this container — wire it here"
    )


def decode_audio(payload: bytes):  # pragma: no cover - stub
    raise NotImplementedError(
        "audio decode requires soundfile/ffmpeg; wire it here"
    )


def fake_decode_features(batch: pd.Series) -> np.ndarray:
    """Deterministic per-payload features: 16-bucket byte histogram
    (L1-normalized).  Vectorized per batch; stands in for a real
    decode→embed step with identical shapes."""
    out = np.zeros((len(batch), FEATURE_DIM), dtype=np.float32)
    for i, payload in enumerate(batch):
        if payload is None or len(payload) == 0:
            continue
        arr = np.frombuffer(payload, dtype=np.uint8)
        hist = np.bincount(arr >> 4, minlength=FEATURE_DIM).astype(np.float32)
        out[i] = hist / max(len(arr), 1)
    return out


def extract_metadata(
    df: DataFrame, binary_col: str = "html", id_col: str = "url"
) -> DataFrame:
    """(id, n_bytes, format, features[16]) via mapInPandas — one Arrow pass,
    binary stays batched, output schema typed."""
    schema = (
        f"{id_col} string, n_bytes long, format string, "
        f"features array<float>"
    )

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[binary_col]
            feats = fake_decode_features(payloads)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "n_bytes": [
                        len(p) if p is not None else 0 for p in payloads
                    ],
                    "format": [sniff_format(p) for p in payloads],
                    "features": [f.tolist() for f in feats],
                }
            )

    return df.select(id_col, binary_col).mapInPandas(op, schema=schema)


def frame_sample(
    df: DataFrame,
    binary_col: str = "payload",
    id_col: str = "url",
    every_n: int = 30,
    max_frames: int = 10,
) -> DataFrame:
    """Video frame-sampling plumbing: explode each payload into
    (id, frame_idx, frame_bytes) rows — the 1→N row shape a real
    ffmpeg-backed sampler produces.  Decode is stubbed deterministically
    (frame count from byte length, frame bytes = a slice) so the
    explode/partitioning/schema shape is tested without codecs; wire a
    real decoder at the marked line."""
    schema = f"{id_col} string, frame_idx int, frame_bytes binary"

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rid, p in zip(pdf[id_col], pdf[binary_col]):
                # REAL DECODER GOES HERE (ffmpeg: demux, take every_n-th
                # frame); the stand-in derives frames from byte length
                n_frames = (len(p) if p else 0) // every_n
                rows.extend(
                    (rid, i, bytes(p[i : i + 16]))
                    for i in range(min(n_frames, max_frames))
                )
            yield pd.DataFrame(
                rows, columns=[id_col, "frame_idx", "frame_bytes"]
            )

    return df.select(id_col, binary_col).mapInPandas(op, schema=schema)


def resize_images(
    df: DataFrame,
    binary_col: str = "payload",
    id_col: str = "url",
    target: tuple[int, int] = (64, 64),
) -> DataFrame:
    """Image-resize plumbing: (id, width, height, resized binary) per row —
    the 1→1 map shape of a Pillow thumbnail pass.  The stand-in treats the
    payload as raw bytes and 'resizes' by deterministic strided sampling to
    exactly width×height bytes, preserving the real operator's contract:
    fixed output size, binary in → binary out, one Arrow round-trip."""
    w, h = target
    schema = f"{id_col} string, width int, height int, resized binary"

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for rid, p in zip(pdf[id_col], pdf[binary_col]):
                if not p:
                    out.append((rid, w, h, b"\x00" * (w * h)))
                    continue
                # REAL DECODER GOES HERE (PIL.Image.open → .resize(target))
                arr = np.frombuffer(p, dtype=np.uint8)
                idx = np.linspace(0, len(arr) - 1, w * h).astype(np.int64)
                out.append((rid, w, h, arr[idx].tobytes()))
            yield pd.DataFrame(
                out, columns=[id_col, "width", "height", "resized"]
            )

    return df.select(id_col, binary_col).mapInPandas(op, schema=schema)
