"""Real-format multimodal decode (round-2): pure-python BMP / netpbm /
WAV decoders must recover exactly the pixel/sample data the test
encodes from scratch, end-to-end through the Spark operators."""

import struct

import numpy as np
import pytest

from pandarus_spark.operators import multimodal as M


from pandarus_spark.operators.multimodal import (  # noqa: E402
    encode_bmp24, encode_pgm, encode_wav16,
)


def encode_bmp8(idx: np.ndarray, palette_gray: np.ndarray) -> bytes:
    """8-bit palettized BMP; palette entries are gray (B=G=R)."""
    h, w = idx.shape
    row_bytes = (w + 3) & ~3
    body = bytearray()
    for r in range(h - 1, -1, -1):
        body += bytes(idx[r].tolist()) + b"\x00" * (row_bytes - w)
    pal = bytearray()
    for v in palette_gray:
        pal += bytes([int(v), int(v), int(v), 0])
    off = 14 + 40 + 256 * 4
    hdr = b"BM" + struct.pack("<IHHI", off + len(body), 0, 0, off)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 8, 0, len(body), 0, 0, 256, 0)
    return hdr + dib + bytes(pal) + bytes(body)




def test_bmp24_roundtrip():
    rng = np.random.default_rng(1)
    gray = rng.integers(0, 256, (7, 5), dtype=np.uint8)  # odd width -> row padding
    fmt, px = M.decode_pixels(encode_bmp24(gray))
    assert fmt == "bmp"
    np.testing.assert_array_equal(px, gray)


def test_bmp8_palette_roundtrip():
    rng = np.random.default_rng(2)
    idx = rng.integers(0, 256, (6, 6), dtype=np.uint8)
    pal = np.arange(256, dtype=np.uint8)  # identity gray palette
    fmt, px = M.decode_pixels(encode_bmp8(idx, pal))
    assert fmt == "bmp"
    np.testing.assert_array_equal(px, idx)


def test_pgm_roundtrip_with_comment():
    rng = np.random.default_rng(3)
    gray = rng.integers(0, 256, (4, 9), dtype=np.uint8)
    fmt, px = M.decode_pixels(encode_pgm(gray))
    assert fmt == "pgm"
    np.testing.assert_array_equal(px, gray)
    # header comments must be skipped by the parser
    commented = b"P5\n# a comment\n9 4\n# another\n255\n" + gray.tobytes()
    fmt2, px2 = M.decode_pixels(commented)
    assert fmt2 == "pgm"
    np.testing.assert_array_equal(px2, gray)


def test_wav16_samples():
    t = np.arange(256) / 16000.0
    mono = 0.5 * np.sin(2 * np.pi * 440 * t)
    fmt, frames, channels, s = M._decode_wav_samples(encode_wav16(mono))
    assert (fmt, frames, channels) == ("wav", 256, 1)
    np.testing.assert_allclose(s[:, 0], np.clip(mono * 32768, -32768, 32767).astype("<i2") / 32768.0)
    # stereo: frames halve, channel mix in decode_samples
    stereo = np.column_stack([mono, -mono]).ravel()
    fmt, frames, channels, s2 = M._decode_wav_samples(encode_wav16(stereo, channels=2))
    assert (frames, channels) == (256, 2)
    _, mixed = M.decode_samples(encode_wav16(stereo, channels=2))
    np.testing.assert_allclose(mixed, s2.mean(axis=1))


def test_decode_media_operator_on_real_formats(spark):
    rng = np.random.default_rng(4)
    gray = rng.integers(0, 256, (8, 8), dtype=np.uint8)
    wav = encode_wav16(0.25 * np.sin(np.arange(64) / 3.0))
    rows = [(0, "image", encode_bmp24(gray)),
            (1, "image", encode_pgm(gray)),
            (2, "audio", wav),
            (3, "image", M.encode_fake(8, 8, seed=3))]
    df = spark.createDataFrame(rows, M.MEDIA_SCHEMA)
    got = {r["media_id"]: r for r in M.decode_media(df).collect()}
    assert got[0]["format"] == "bmp" and got[0]["mean_value"] == pytest.approx(gray.mean())
    assert got[1]["format"] == "pgm" and (got[1]["width"], got[1]["height"]) == (8, 8)
    assert got[2]["format"] == "wav" and got[2]["width"] == 64 and got[2]["height"] == 1
    assert got[3]["format"] == "fake"


def test_resize_and_frames_on_bmp(spark):
    rng = np.random.default_rng(5)
    gray = rng.integers(0, 256, (8, 8), dtype=np.uint8)
    df = spark.createDataFrame([(0, "image", encode_bmp24(gray))], M.MEDIA_SCHEMA)
    out = M.resize_stub(df, 4, 4).collect()[0]
    _, px = M.decode_pixels(bytes(out["data"]))
    np.testing.assert_array_equal(px, gray[np.ix_([0, 2, 4, 6], [0, 2, 4, 6])])
    frames = M.frame_sample_stub(df, every_n=4).collect()
    assert [f["frame_no"] for f in frames] == [0, 4]


def test_audio_features_on_wav(spark):
    mono = 0.5 * np.sin(np.arange(64) / 2.0)
    df = spark.createDataFrame([(0, "audio", encode_wav16(mono))], M.MEDIA_SCHEMA)
    rows = {r["window_no"]: r for r in M.audio_features_stub(df, window=16).collect()}
    assert len(rows) == 4
    q = np.clip(mono * 32768, -32768, 32767).astype("<i2") / 32768.0
    for wno in range(4):
        seg = q[wno * 16:(wno + 1) * 16]
        assert rows[wno]["rms"] == pytest.approx(np.sqrt(np.mean(seg ** 2)), abs=1e-6)
        assert rows[wno]["peak"] == pytest.approx(seg.max())


def test_compressed_formats_still_guided():
    with pytest.raises(NotImplementedError, match="register_codec"):
        M.decode_pixels(b"\xff\xd8\xff\xe0rest")
    with pytest.raises(NotImplementedError, match="register_codec"):
        M.decode_pixels(b"\x89PNG\r\n\x1a\nrest")
    with pytest.raises(ValueError):
        M.decode_pixels(b"garbage")


def test_register_codec_seam():
    sniff = lambda b: b[:4] == b"XYZ1"  # noqa: E731
    decode = lambda b: ("xyz", np.zeros((2, 3), dtype=np.uint8))  # noqa: E731
    M.register_codec("xyz", sniff, "image", decode)
    try:
        fmt, px = M.decode_pixels(b"XYZ1whatever")
        assert fmt == "xyz" and px.shape == (2, 3)
        fmt, w, h, mean = M._decode_one(b"XYZ1whatever")
        assert (fmt, w, h, mean) == ("xyz", 3, 2, 0.0)
    finally:
        M.CODECS.pop(0)


def test_bmp8_short_palette_biclrused():
    """biClrUsed < 256: pixel data starts right after the short palette
    (review finding #2)."""
    rng = np.random.default_rng(6)
    idx = rng.integers(0, 64, (5, 5), dtype=np.uint8)
    pal = np.arange(64, dtype=np.uint8) * 4
    h, w = idx.shape
    row_bytes = (w + 3) & ~3
    body = bytearray()
    for r in range(h - 1, -1, -1):
        body += bytes(idx[r].tolist()) + b"\x00" * (row_bytes - w)
    palette = bytearray()
    for v in pal:
        palette += bytes([int(v), int(v), int(v), 0])
    off = 14 + 40 + 64 * 4
    hdr = b"BM" + struct.pack("<IHHI", off + len(body), 0, 0, off)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 8, 0, len(body), 0, 0, 64, 0)
    fmt, px = M.decode_pixels(hdr + dib + bytes(palette) + bytes(body))
    assert fmt == "bmp"
    np.testing.assert_array_equal(px, pal[idx])


def test_decode_samples_uses_registry():
    """An audio codec registered via register_codec must work in
    decode_samples / audio_features too (review finding #3)."""
    sniff = lambda b: b[:4] == b"AUD1"  # noqa: E731
    decode = lambda b: ("aud", 4, 2, np.arange(8, dtype=float).reshape(4, 2))  # noqa: E731
    M.register_codec("aud", sniff, "audio", decode)
    try:
        fmt, mono = M.decode_samples(b"AUD1xxxx")
        assert fmt == "aud"
        np.testing.assert_allclose(mono, [0.5, 2.5, 4.5, 6.5])
    finally:
        M.CODECS.pop(0)


def test_register_default_codecs_both_environments():
    """The PIL/soundfile on-ramp (round-2 verdict #7) must register
    decoders when the libraries exist and skip cleanly when they don't
    — green in BOTH environments, and idempotent either way."""
    import importlib.util

    from pandarus_spark.operators import multimodal as M

    have_pil = importlib.util.find_spec("PIL") is not None
    have_sf = importlib.util.find_spec("soundfile") is not None
    before = list(M.CODECS)
    try:
        got = M.register_default_codecs()
        assert got == {"pillow": have_pil, "soundfile": have_sf}
        names = [c[0] for c in M.CODECS]
        if have_pil:
            assert "pil-jpeg" in names and "pil-png" in names
            # a real JPEG magic now routes to the registered decoder
            assert any(s(b"\xff\xd8rest") for n, s, k, _ in M.CODECS
                       if n == "pil-jpeg")
        else:
            # absent: the guidance error is unchanged
            with pytest.raises(NotImplementedError, match="register_codec"):
                M.decode_pixels(b"\xff\xd8\xff\xe0fakejpeg")
            with pytest.raises(NotImplementedError, match="register_codec"):
                M.decode_pixels(b"\x89PNG\r\n\x1a\nfakepng")
        if have_sf:
            assert "sf-flac" in names and "sf-ogg" in names
        # idempotent: second call does not duplicate registry entries
        n1 = len(M.CODECS)
        got2 = M.register_default_codecs()
        assert got2 == got and len(M.CODECS) == n1
    finally:
        M.CODECS[:] = before


def test_register_default_codecs_decoder_contract(monkeypatch):
    """When a PIL-like module IS importable, the registered decoder
    must normalize to the registry contract (2-D uint8 grayscale) so
    decode_media/resize run unchanged — proven with a stub 'PIL'."""
    import sys
    import types

    import numpy as np

    from pandarus_spark.operators import multimodal as M

    class _FakeImg:
        format = "JPEG"

        def convert(self, mode):
            assert mode == "L"
            return np.full((3, 4), 7, dtype=np.uint8)

    fake_pil = types.ModuleType("PIL")
    fake_image_mod = types.ModuleType("PIL.Image")
    fake_image_mod.open = lambda fp: _FakeImg()
    fake_pil.Image = fake_image_mod
    before = list(M.CODECS)
    monkeypatch.setitem(sys.modules, "PIL", fake_pil)
    monkeypatch.setitem(sys.modules, "PIL.Image", fake_image_mod)
    try:
        got = M.register_default_codecs()
        assert got["pillow"] is True
        fmt, px = M.decode_pixels(b"\xff\xd8somejpegbytes")
        assert fmt == "jpeg" and px.shape == (3, 4) and px.dtype == np.uint8
        # downstream kernel contract: _decode_one works through it
        fmt2, w, h, mean = M._decode_one(b"\xff\xd8somejpegbytes")
        assert (fmt2, w, h, mean) == ("jpeg", 4, 3, 7.0)
    finally:
        M.CODECS[:] = before


def test_registered_codecs_ship_to_executors(spark):
    """register_codec mutates DRIVER module state; executors re-import
    the module fresh.  The operators must close over a registry
    snapshot and install it per batch — simulated here by resetting
    CODECS to the pristine built-ins AFTER the plan is built (what an
    executor process would see) and checking the custom codec still
    decodes."""
    import struct as _struct

    from pandarus_spark.operators import multimodal as M

    def _decode_xyz(b: bytes):
        h, w = _struct.unpack(">II", b[4:12])
        return "xyz", np.frombuffer(b[12:12 + h * w], dtype=np.uint8).reshape(h, w)

    payload = b"XYZ0" + _struct.pack(">II", 2, 3) + bytes(range(6))
    before = list(M.CODECS)
    try:
        M.register_codec("xyz", lambda b: b[:4] == b"XYZ0", "image", _decode_xyz)
        media = spark.createDataFrame([(1, "image", bytearray(payload))],
                                      M.MEDIA_SCHEMA)
        out = M.decode_media(media)              # snapshot taken HERE
        M.CODECS[:] = before                     # executor's fresh module
        rows = out.collect()
        assert rows[0]["format"] == "xyz"
        assert (rows[0]["width"], rows[0]["height"]) == (3, 2)
    finally:
        M.CODECS[:] = before
