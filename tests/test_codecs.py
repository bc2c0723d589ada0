"""Pure-stdlib PNG/WAV codecs + the real-decode multimodal operators.

The PNG decoder is validated against hand-filtered images for every
filter type (the encoder only emits filter 0, so round-trip alone would
not cover Sub/Up/Average/Paeth), then driven end-to-end through the
mapInPandas operators on a Spark DataFrame of real PNG/WAV payloads.
"""

import struct
import zlib

import numpy as np
import pytest

from packs_spark.operators.codecs import (
    PNG_MAGIC,
    decode_png,
    decode_wav,
    encode_png,
    encode_wav,
    resize_nearest,
)


def _ref_image(h=13, w=17, ch=3):
    rng = np.random.default_rng(42)
    return rng.integers(0, 256, size=(h, w, ch), dtype=np.uint8)


def _png_with_filter(img: np.ndarray, ftype: int) -> bytes:
    """Assemble a PNG whose every scanline uses the given filter type —
    the forward filter transform applied here is the spec's inverse of
    the decoder's unfilter step."""
    h, w, ch = img.shape
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    body = img.astype(np.int64).reshape(h, w * ch)
    stride = w * ch
    raw = b""
    prev = np.zeros(stride, dtype=np.int64)
    for y in range(h):
        cur = body[y]
        filt = np.empty(stride, dtype=np.int64)
        for i in range(stride):
            a = cur[i - ch] if i >= ch else 0
            b = prev[i]
            c = prev[i - ch] if i >= ch else 0
            if ftype == 0:
                pred = 0
            elif ftype == 1:
                pred = a
            elif ftype == 2:
                pred = b
            elif ftype == 3:
                pred = (a + b) >> 1
            else:  # Paeth
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            filt[i] = (cur[i] - pred) & 0xFF
        raw += bytes([ftype]) + filt.astype(np.uint8).tobytes()
        prev = cur

    def chunk(typ, data):
        return (
            struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (
        PNG_MAGIC + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b"")
    )


def test_png_roundtrip_gray_rgb_rgba():
    for ch in (1, 3, 4):
        img = _ref_image(ch=ch)
        out = decode_png(encode_png(img))
        assert out.shape == img.shape
        assert np.array_equal(out, img)


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
def test_png_decode_every_filter_type(ftype):
    img = _ref_image()
    assert np.array_equal(decode_png(_png_with_filter(img, ftype)), img)


def test_png_palette():
    plte = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255]], dtype=np.uint8)
    idx = np.array([[0, 1], [2, 0]], dtype=np.uint8)

    def chunk(typ, data):
        return (
            struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0)
    raw = b"".join(b"\x00" + idx[y].tobytes() for y in range(2))
    png = (
        PNG_MAGIC + chunk(b"IHDR", ihdr) + chunk(b"PLTE", plte.tobytes())
        + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b"")
    )
    assert np.array_equal(decode_png(png), plte[idx])


def test_wav_roundtrip():
    t = np.arange(8000)
    sig = (np.sin(2 * np.pi * 440 * t / 8000) * 20000).astype(np.int16)
    stereo = np.stack([sig, -sig], axis=1)
    samples, sr = decode_wav(encode_wav(stereo, 8000))
    assert sr == 8000
    assert samples.shape == (8000, 2)
    assert np.array_equal(samples, stereo.astype(np.int32))


def test_resize_nearest_exact_downscale():
    img = _ref_image(h=32, w=32)
    out = resize_nearest(img, (8, 16))
    assert out.shape == (16, 8, 3)
    assert np.array_equal(out, img[::2][:, ::4])


def test_decode_image_jpeg_requires_pillow_or_raises():
    from packs_spark.operators.multimodal import decode_image

    try:
        import PIL  # noqa: F401

        pytest.skip("Pillow installed; stdlib fallback not reachable")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError, match="jpeg"):
        decode_image(b"\xff\xd8\xff\xe0" + b"\x00" * 64)


def test_image_features_end_to_end(spark):
    from packs_spark.operators.multimodal import image_features

    img_a = _ref_image(h=9, w=11)
    img_b = np.full((4, 4, 3), 200, dtype=np.uint8)
    rows = [
        ("a", bytearray(encode_png(img_a))),
        ("b", bytearray(encode_png(img_b))),
        ("bad", bytearray(b"\xff\xd8\xffnot-a-png")),
    ]
    df = spark.createDataFrame(rows, "url string, payload binary")
    out = {r["url"]: r for r in image_features(df, "payload").collect()}
    assert (out["a"]["width"], out["a"]["height"]) == (11, 9)
    assert out["a"]["channels"] == 3
    assert out["b"]["mean_luma"] == pytest.approx(200.0)
    assert len(out["b"]["features"]) == 16
    # luma 200 lands in histogram bin 6 (range 0..256, 8 bins)
    assert out["b"]["features"][6] == pytest.approx(1.0)
    assert out["bad"]["width"] is None and out["bad"]["features"] == []


def test_audio_features_end_to_end(spark):
    from packs_spark.operators.multimodal import audio_features

    t = np.arange(4000)
    sig = (np.sin(2 * np.pi * 100 * t / 8000) * 10000).astype(np.int16)
    rows = [
        ("w", bytearray(encode_wav(sig, 8000))),
        ("bad", bytearray(b"OggS" + b"\x00" * 32)),
    ]
    df = spark.createDataFrame(rows, "url string, payload binary")
    out = {r["url"]: r for r in audio_features(df, "payload").collect()}
    assert out["w"]["sample_rate"] == 8000
    assert out["w"]["n_frames"] == 4000
    assert out["w"]["duration_sec"] == pytest.approx(0.5)
    # 100 Hz for 0.5 s → ~100 sign flips / 4000 samples
    assert out["w"]["zero_cross_rate"] == pytest.approx(0.025, rel=0.2)
    assert out["bad"]["sample_rate"] is None


def test_resize_images_real_png_path(spark):
    from packs_spark.operators.multimodal import resize_images

    img = _ref_image(h=32, w=32)
    df = spark.createDataFrame(
        [("p", bytearray(encode_png(img))), ("raw", bytearray(b"\x01" * 999))],
        "url string, payload binary",
    )
    out = {
        r["url"]: r
        for r in resize_images(df, "payload", target=(8, 8)).collect()
    }
    resized = decode_png(bytes(out["p"]["resized"]))
    assert resized.shape == (8, 8, 3)
    assert np.array_equal(resized, resize_nearest(img, (8, 8)))
    assert len(out["raw"]["resized"]) == 64  # strided fallback contract
