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


def _jpeg_bytes(width, height, ncomp=3, sof=0xC0, extras=True):
    """Structurally valid JPEG marker stream (ITU-T T.81 §B.2) with a real
    SOF frame header — entropy data is a stub (header parsing never reads
    it), so this exercises exactly the metadata-tier contract."""

    def seg(marker, payload):
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    out = b"\xff\xd8"  # SOI
    if extras:
        out += seg(0xE0, b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00")  # APP0
        out += seg(0xFE, b"a comment segment")  # COM
        out += seg(0xDB, b"\x00" + bytes(64))  # DQT
    sof_payload = struct.pack(">BHHB", 8, height, width, ncomp) + bytes(3 * ncomp)
    out += seg(sof, sof_payload)
    out += seg(0xC4, b"\x00" + bytes(16))  # DHT stub
    out += seg(0xDA, b"\x01\x01\x00\x00\x3f\x00")  # SOS
    return out + b"\xab\xcd\xef" + b"\xff\xd9"  # entropy stub + EOI


def test_jpeg_header_baseline_and_progressive():
    from packs_spark.operators.codecs import parse_jpeg_header

    assert parse_jpeg_header(_jpeg_bytes(320, 240, ncomp=3)) == (320, 240, 3)
    # progressive (SOF2) grayscale, no APPn/DQT segments before the frame
    assert parse_jpeg_header(
        _jpeg_bytes(17, 4000, ncomp=1, sof=0xC2, extras=False)
    ) == (17, 4000, 1)


def test_jpeg_header_rejects_frameless_and_non_jpeg():
    from packs_spark.operators.codecs import parse_jpeg_header

    with pytest.raises(ValueError, match="SOI"):
        parse_jpeg_header(b"\x89PNG\r\n\x1a\n")
    # SOI + APP0 + EOI, never a SOF
    frameless = (
        b"\xff\xd8"
        + b"\xff\xe0" + struct.pack(">H", 6) + b"JF\x00\x00"
        + b"\xff\xd9"
    )
    with pytest.raises(ValueError, match="no SOF"):
        parse_jpeg_header(frameless)
    with pytest.raises(ValueError, match="no SOF"):
        parse_jpeg_header(b"\xff\xd8\xff")  # truncated after magic


def test_image_features_jpeg_header_dims_without_pillow(spark):
    """The metadata tier is Pillow-free: a JPEG payload yields real
    (width, height, channels) from the SOF parse even when pixel decode
    is unavailable (pixel-derived columns stay NULL)."""
    from packs_spark.operators.multimodal import image_features

    rows = [("j", bytearray(_jpeg_bytes(64, 48, ncomp=3)))]
    df = spark.createDataFrame(rows, "url string, payload binary")
    out = image_features(df, "payload").collect()[0]
    assert (out["width"], out["height"], out["channels"]) == (64, 48, 3)
    try:
        import PIL  # noqa: F401
    except ImportError:
        # stub entropy data is undecodable → luma/features must be NULL/empty
        assert out["mean_luma"] is None and out["features"] == []


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


# ---------------------------------------------------------------------------
# GIF (real multi-frame decode: LZW + compositing)
# ---------------------------------------------------------------------------

from packs_spark.operators.codecs import (  # noqa: E402
    _lzw_decode,
    _lzw_encode_literal,
    decode_gif_frames,
    encode_gif,
)


def test_lzw_literal_roundtrip():
    rng = np.random.default_rng(7)
    data = bytes(rng.integers(0, 256, size=5000, dtype=np.uint8))
    assert _lzw_decode(8, _lzw_encode_literal(data)) == data


def test_lzw_kwkwk_case():
    """The code-equals-next_code special case: codes CLEAR, 'a', 258, END
    with min_code_size 8 — 258 is the just-being-created 'aa' entry,
    referenced before it is finished, decoding to 'a' + 'aa' = 'aaa'."""
    codes = [256, 97, 258, 257]
    acc = nbits = 0
    out = bytearray()
    for c in codes:
        acc |= c << nbits
        nbits += 9
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        out.append(acc & 0xFF)
    assert _lzw_decode(8, bytes(out)) == b"aaa"


def test_gif_multiframe_roundtrip():
    rng = np.random.default_rng(9)
    frames = [
        rng.integers(0, 256, size=(11, 7), dtype=np.uint8) for _ in range(5)
    ]
    decoded = decode_gif_frames(encode_gif(frames))
    assert len(decoded) == 5
    for fr, dec in zip(frames, decoded):
        assert dec.shape == (11, 7, 3)
        # grayscale identity palette: every channel equals the index
        assert np.array_equal(dec[:, :, 0], fr)
        assert np.array_equal(dec[:, :, 1], fr)


def test_gif_transparency_composites_over_previous_frame():
    """Hand-build frame 2 as a partial patch with a transparent index —
    the composited frame must show frame 1 underneath."""
    import struct as _s

    base = np.full((4, 4), 10, dtype=np.uint8)
    gif = bytearray(encode_gif([base])[:-1])  # drop trailer
    # graphic control: transparency on, transparent index 0
    gif += b"\x21\xf9\x04\x01\x00\x00\x00\x00"
    # 2x2 patch at (1,1): indices [[0, 20], [20, 0]] (0 = transparent)
    patch = np.array([[0, 20], [20, 0]], dtype=np.uint8)
    gif += b"\x2c" + _s.pack("<HHHH", 1, 1, 2, 2) + b"\x00" + bytes([8])
    stream = _lzw_encode_literal(patch.tobytes())
    gif += bytes([len(stream)]) + stream + b"\x00"
    gif += b"\x3b"
    frames = decode_gif_frames(bytes(gif))
    assert len(frames) == 2
    f2 = frames[1][:, :, 0]
    assert f2[1, 1] == 10 and f2[2, 2] == 10  # transparent → base shows
    assert f2[1, 2] == 20 and f2[2, 1] == 20  # opaque patch pixels
    assert f2[0, 0] == 10  # outside the patch untouched


def test_frame_sample_real_gif(spark):
    from packs_spark.operators.multimodal import frame_sample

    frames = [np.full((6, 6), i * 10, dtype=np.uint8) for i in range(8)]
    rows = [
        ("g", bytearray(encode_gif(frames))),
        ("raw", bytearray(bytes(90))),  # stand-in path: 90 // 2 capped at 3
    ]
    df = spark.createDataFrame(rows, "url string, payload binary")
    out = frame_sample(df, "payload", "url", every_n=2, max_frames=3).collect()
    by_url = {}
    for r in out:
        by_url.setdefault(r["url"], []).append(r)
    g = sorted(by_url["g"], key=lambda r: r["frame_idx"])
    assert [r["frame_idx"] for r in g] == [0, 1, 2]
    # every_n=2 → composited frames 0, 2, 4, PNG-encoded
    for r, want in zip(g, (0, 20, 40)):
        img = decode_png(bytes(r["frame_bytes"]))
        assert img.shape == (6, 6, 3)
        assert int(img[0, 0, 0]) == want
    assert len(by_url["raw"]) == 3


def test_frame_sample_and_resize_tolerate_corrupt_payloads(spark):
    """A payload with valid magic but corrupt body must fall back to the
    stand-in path, not kill the task (dirty-corpus contract)."""
    from pyspark.sql import functions as F

    from packs_spark.operators.multimodal import frame_sample, resize_images

    bad_gif = b"GIF89a" + b"\x01\x02\x03" * 40
    bad_png = PNG_MAGIC + b"\x00\x01\x02" * 40
    df = spark.createDataFrame(
        [("g", bytearray(bad_gif)), ("p", bytearray(bad_png))],
        "url string, payload binary",
    )
    frames = frame_sample(df, "payload", "url", every_n=30, max_frames=3)
    assert frames.where(F.col("url") == "g").count() >= 1  # stand-in rows
    out = {r["url"]: r for r in resize_images(df, "payload",
                                              target=(4, 4)).collect()}
    assert len(out["p"]["resized"]) == 16  # strided fallback contract


# --- ISO BMFF (MP4) container parsing -------------------------------------


def _box(btype: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + btype + payload


def _full(btype: bytes, version: int, payload: bytes) -> bytes:
    return _box(btype, struct.pack(">I", version << 24) + payload)


def _mp4_fixture():
    """Two-track (video+audio) minimal BMFF file: 4 video samples in 2
    chunks (samples 1 and 3 are sync), mdat carrying distinct payloads so
    byte ranges are checkable."""
    samples = [b"AAAA", b"BBBBBB", b"CC", b"DDDDD"]  # sizes 4,6,2,5
    # layout: chunk1 = samples 0,1  chunk2 = samples 2,3
    mdat_payload = b"".join(samples)

    def stbl_boxes(chunk1_off, chunk2_off):
        stsd = _full(
            b"stsd", 0,
            struct.pack(">I", 1)
            + _box(b"avc1", b"\x00" * 8),  # fourcc is all the parser reads
        )
        stsz = _full(
            b"stsz", 0,
            struct.pack(">II", 0, 4)
            + struct.pack(">4I", *[len(s) for s in samples]),
        )
        stsc = _full(
            b"stsc", 0,
            struct.pack(">I", 1) + struct.pack(">III", 1, 2, 1),
        )
        stco = _full(
            b"stco", 0,
            struct.pack(">I", 2) + struct.pack(">II", chunk1_off, chunk2_off),
        )
        stss = _full(
            b"stss", 0, struct.pack(">I", 2) + struct.pack(">II", 1, 3)
        )
        return _box(b"stbl", stsd + stsz + stsc + stco + stss)

    def trak(handler: bytes, width: int, height: int, stbl: bytes) -> bytes:
        tkhd = _full(
            b"tkhd", 0,
            b"\x00" * 72 + struct.pack(">II", width << 16, height << 16),
        )
        hdlr = _full(b"hdlr", 0, b"\x00" * 4 + handler + b"\x00" * 12)
        minf = _box(b"minf", stbl)
        mdia = _box(b"mdia", hdlr + minf)
        return _box(b"trak", tkhd + mdia)

    ftyp = _box(b"ftyp", b"isom" + b"\x00" * 4 + b"isomiso2")
    # mvhd v0: creation/modification (8) + timescale + duration + rest
    mvhd = _full(
        b"mvhd", 0,
        b"\x00" * 8 + struct.pack(">II", 1000, 2500) + b"\x00" * 80,
    )

    # assemble with a placeholder to learn mdat's file offset, then patch
    audio_stbl = _box(
        b"stbl",
        _full(b"stsd", 0, struct.pack(">I", 1) + _box(b"mp4a", b"\x00" * 8))
        + _full(b"stsz", 0, struct.pack(">II", 3, 2))
        + _full(b"stsc", 0, struct.pack(">I", 1) + struct.pack(">III", 1, 2, 1))
        + _full(b"stco", 0, struct.pack(">I", 1) + struct.pack(">I", 0)),
    )
    for _ in range(2):  # second pass uses the real offsets
        off1 = len(ftyp) + len(
            _box(
                b"moov",
                mvhd
                + trak(b"vide", 640, 360, stbl_boxes(0, 0))
                + trak(b"soun", 0, 0, audio_stbl),
            )
        ) + 8  # + mdat header
        off2 = off1 + len(samples[0]) + len(samples[1])
        moov = _box(
            b"moov",
            mvhd
            + trak(b"vide", 640, 360, stbl_boxes(off1, off2))
            + trak(b"soun", 0, 0, audio_stbl),
        )
    return ftyp + moov + _box(b"mdat", mdat_payload), samples, off1


def test_mp4_metadata():
    from packs_spark.operators.codecs import parse_mp4_metadata

    blob, _, _ = _mp4_fixture()
    meta = parse_mp4_metadata(blob)
    assert meta["brand"] == "isom"
    assert meta["duration_s"] == 2.5
    assert len(meta["tracks"]) == 2
    vid = meta["tracks"][0]
    assert vid == {
        "handler": "vide", "codec": "avc1", "width": 640, "height": 360,
        "n_samples": 4, "n_keyframes": 2,
    }
    assert meta["tracks"][1]["handler"] == "soun"
    assert meta["tracks"][1]["codec"] == "mp4a"


def test_mp4_sample_ranges_and_slicing():
    from packs_spark.operators.codecs import mp4_sample_ranges

    blob, samples, off1 = _mp4_fixture()
    ranges = mp4_sample_ranges(blob)
    assert [r[1] for r in ranges] == [4, 6, 2, 5]
    assert [r[2] for r in ranges] == [True, False, True, False]
    # byte ranges slice the exact coded payloads back out of the file
    assert [blob[o : o + s] for o, s, _ in ranges] == samples
    assert ranges[0][0] == off1


def test_mp4_malformed_raises_valueerror():
    from packs_spark.operators.codecs import (
        mp4_sample_ranges,
        parse_mp4_metadata,
    )

    for bad in [b"", b"\x00\x00\x00\x08ftyp", b"not a container at all"]:
        with pytest.raises(ValueError):
            parse_mp4_metadata(bad)
    blob, _, _ = _mp4_fixture()
    # box whose declared size overruns the buffer
    truncated = blob[: len(blob) // 2]
    with pytest.raises(ValueError):
        mp4_sample_ranges(truncated)


def test_video_metadata_operator(spark):
    from packs_spark.operators.multimodal import sniff_format, video_metadata

    blob, _, _ = _mp4_fixture()
    assert sniff_format(blob) == "mp4"
    rows = [("v", bytearray(blob)), ("junk", bytearray(b"not video"))]
    df = spark.createDataFrame(rows, "url string, payload binary")
    out = {r["url"]: r for r in video_metadata(df).collect()}
    v = out["v"]
    assert (v["brand"], v["duration_sec"], v["n_tracks"]) == ("isom", 2.5, 2)
    assert (v["width"], v["height"]) == (640, 360)
    assert (v["n_samples"], v["n_keyframes"]) == (4, 2)
    j = out["junk"]
    assert j["brand"] is None and j["n_tracks"] is None


def test_frame_sample_real_mp4_keyframes(spark):
    """MP4 payloads yield the CODED BYTES of the sync samples, sliced via
    the stdlib sample-table join — no ffmpeg, no stand-in."""
    from packs_spark.operators.multimodal import frame_sample

    blob, samples, _ = _mp4_fixture()
    df = spark.createDataFrame(
        [("v", bytearray(blob))], "url string, payload binary"
    )
    out = sorted(
        frame_sample(df, "payload", "url", every_n=1, max_frames=10).collect(),
        key=lambda r: r["frame_idx"],
    )
    # sync samples are 1 and 3 (1-based): payloads AAAA and CC
    assert [bytes(r["frame_bytes"]) for r in out] == [samples[0], samples[2]]
