"""Multimodal (image/audio/video) column plumbing for training-data
pipelines (graft addition).

Media payloads are opaque ``binary`` columns with typed metadata
structs.  The Spark-side plumbing — schema, partition-preserving
``mapInPandas`` transforms, Arrow batch shapes — is real and tested.

Codec layer (round-2): a pluggable registry (:data:`CODECS`) with
pure-python/numpy decoders for REAL uncompressed formats —

* **BMP** (Windows bitmap, BI_RGB 8/24-bit),
* **PGM/PPM** (netpbm P5/P6 binary),
* **WAV** (RIFF PCM, 8/16-bit, any channel count),

plus the deterministic synthetic ``FAKE`` container used by tests and
benchmarks.  Compressed formats (JPEG/PNG/MP3/MP4) still raise
``NotImplementedError`` with guidance — decoding them needs a codec
library this environment does not ship; register one via
:func:`register_codec` when available.

FAKE container layout (big-endian):
    magic   4 bytes  b"FAK1"
    width   4 bytes  uint32
    height  4 bytes  uint32
    payload width*height bytes (grayscale)
"""

from __future__ import annotations

import struct

import numpy as np
from pyspark.sql import DataFrame, functions as F

MEDIA_SCHEMA = "media_id bigint, kind string, data binary"
META_SCHEMA = ("media_id bigint, kind string, format string, width int, height int, "
               "n_bytes int, mean_value double")

MAGIC = b"FAK1"


def encode_fake(width: int, height: int, seed: int) -> bytes:
    rng = np.random.default_rng(seed)
    payload = rng.integers(0, 256, width * height, dtype=np.uint8).tobytes()
    return MAGIC + struct.pack(">II", width, height) + payload


# ---------------------------------------------------------------------------
# Real-format decoders (pure numpy)
# ---------------------------------------------------------------------------

def _decode_fake_pixels(b: bytes) -> tuple[str, np.ndarray]:
    w, h = struct.unpack(">II", b[4:12])
    return "fake", np.frombuffer(b, dtype=np.uint8, offset=12, count=w * h).reshape(h, w)


def _decode_bmp_pixels(b: bytes) -> tuple[str, np.ndarray]:
    """Uncompressed (BI_RGB) 8-bit-palette / 24-bit BMP → grayscale
    array (BT.601 luma for color; palette luma for indexed)."""
    data_off, = struct.unpack_from("<I", b, 10)
    hdr_size, = struct.unpack_from("<I", b, 14)
    w, h = struct.unpack_from("<ii", b, 18)
    bpp, = struct.unpack_from("<H", b, 28)
    comp, = struct.unpack_from("<I", b, 30)
    if comp != 0:
        raise NotImplementedError(f"compressed BMP (method {comp}) is not supported")
    top_down = h < 0
    h = abs(h)
    row_bytes = (w * bpp // 8 + 3) & ~3
    raw = np.frombuffer(b, dtype=np.uint8, offset=data_off,
                        count=row_bytes * h).reshape(h, row_bytes)
    if bpp == 24:
        px = raw[:, :w * 3].reshape(h, w, 3).astype(np.float64)
        gray = 0.114 * px[..., 0] + 0.587 * px[..., 1] + 0.299 * px[..., 2]  # BGR order
        gray = np.round(gray).astype(np.uint8)
    elif bpp == 8:
        # biClrUsed (offset 46): 0 means a full 256-entry palette;
        # shorter palettes shift the pixel data start accordingly
        n_colors, = struct.unpack_from("<I", b, 46)
        n_colors = n_colors or 256
        pal_off = 14 + hdr_size
        pal = np.frombuffer(b, dtype=np.uint8, offset=pal_off,
                            count=n_colors * 4).reshape(n_colors, 4).astype(np.float64)
        luma = np.zeros(256, dtype=np.uint8)
        luma[:n_colors] = np.round(0.114 * pal[:, 0] + 0.587 * pal[:, 1]
                                   + 0.299 * pal[:, 2]).astype(np.uint8)
        gray = luma[raw[:, :w]]  # out-of-palette indexes map to 0
    else:
        raise NotImplementedError(f"{bpp}-bit BMP is not supported (8/24 only)")
    return "bmp", gray if top_down else gray[::-1]


def _decode_netpbm_pixels(b: bytes) -> tuple[str, np.ndarray]:
    """Binary PGM (P5) / PPM (P6) → grayscale array."""
    fmt = b[:2].decode()
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(b) and b[pos:pos + 1].isspace():
            pos += 1
        if b[pos:pos + 1] == b"#":  # comment to end of line
            pos = b.index(b"\n", pos) + 1
            continue
        start = pos
        while pos < len(b) and not b[pos:pos + 1].isspace():
            pos += 1
        fields.append(int(b[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval > 255:
        raise NotImplementedError("16-bit netpbm is not supported")
    if fmt == "P5":
        px = np.frombuffer(b, dtype=np.uint8, offset=pos, count=w * h).reshape(h, w)
        return "pgm", px
    px = np.frombuffer(b, dtype=np.uint8, offset=pos, count=w * h * 3) \
        .reshape(h, w, 3).astype(np.float64)
    gray = np.round(0.299 * px[..., 0] + 0.587 * px[..., 1] + 0.114 * px[..., 2]).astype(np.uint8)
    return "ppm", gray


def _decode_wav_samples(b: bytes) -> tuple[str, int, int, np.ndarray]:
    """RIFF/WAVE PCM → (format, n_frames, n_channels, float64 samples
    in [-1, 1), shape (frames, channels))."""
    if b[8:12] != b"WAVE":
        raise ValueError("RIFF container is not WAVE")
    pos, fmt_chunk, data = 12, None, None
    while pos + 8 <= len(b):
        cid = b[pos:pos + 4]
        size, = struct.unpack_from("<I", b, pos + 4)
        if cid == b"fmt ":
            fmt_chunk = b[pos + 8:pos + 8 + size]
        elif cid == b"data":
            data = b[pos + 8:pos + 8 + size]
        pos += 8 + size + (size & 1)
    if fmt_chunk is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_fmt, channels, _rate = struct.unpack_from("<HHI", fmt_chunk, 0)
    bits, = struct.unpack_from("<H", fmt_chunk, 14)
    if audio_fmt != 1:
        raise NotImplementedError(f"non-PCM WAV (format {audio_fmt}) is not supported")
    if bits == 8:
        s = (np.frombuffer(data, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    elif bits == 16:
        s = np.frombuffer(data, dtype="<i2").astype(np.float64) / 32768.0
    else:
        raise NotImplementedError(f"{bits}-bit WAV is not supported (8/16 only)")
    frames = len(s) // channels
    return "wav", frames, channels, s[:frames * channels].reshape(frames, channels)


# --- matching pure-python encoders (synthetic data + tests) ---------------

def encode_bmp24(gray: np.ndarray) -> bytes:
    """Minimal 24-bit BI_RGB BMP (bottom-up), R=G=B=gray — decodes back
    to exactly ``gray``."""
    gray = np.asarray(gray, dtype=np.uint8)
    h, w = gray.shape
    row_bytes = (w * 3 + 3) & ~3
    rows = np.zeros((h, row_bytes), dtype=np.uint8)
    rows[:, :w * 3] = np.repeat(gray, 3, axis=1)
    body = rows[::-1].tobytes()  # bottom-up
    off = 14 + 40
    hdr = b"BM" + struct.pack("<IHHI", off + len(body), 0, 0, off)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    return hdr + dib + body


def encode_pgm(gray: np.ndarray) -> bytes:
    gray = np.asarray(gray, dtype=np.uint8)
    h, w = gray.shape
    return f"P5\n{w} {h}\n255\n".encode() + gray.tobytes()


def encode_wav16(samples: np.ndarray, channels: int = 1, rate: int = 16000) -> bytes:
    """float [-1, 1] samples → 16-bit PCM RIFF/WAVE."""
    pcm = np.clip(np.asarray(samples) * 32768.0, -32768, 32767).astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, channels, rate, rate * channels * 2, channels * 2, 16)
    body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(pcm)) + pcm)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def real_media_payload(i: int) -> tuple[str, bytes, np.ndarray]:
    """Deterministic real-format sample #i: (kind, bytes, source array)
    cycling bmp24 / pgm / wav — shared by the synthetic DF builder and
    the driver-gate oracle (which computes expectations from the SOURCE
    array, not the decoder)."""
    rng = np.random.default_rng(7000 + i)
    which = i % 3
    if which == 0:
        gray = rng.integers(0, 256, (6 + i % 4, 5 + i % 3), dtype=np.uint8)
        return "image", encode_bmp24(gray), gray
    if which == 1:
        gray = rng.integers(0, 256, (4 + i % 5, 7 + i % 2), dtype=np.uint8)
        return "image", encode_pgm(gray), gray
    mono = 0.4 * np.sin(np.arange(48 + 8 * (i % 4)) / (2.0 + i % 3))
    q = np.clip(mono * 32768.0, -32768, 32767).astype("<i2").astype(np.float64) / 32768.0
    return "audio", encode_wav16(mono), q[:, None]


def synthetic_real_media_df(spark, n: int = 12, partitions: int = 2) -> DataFrame:
    """Media table of REAL container bytes (BMP/PGM/WAV), deterministic."""
    rows = [(i, real_media_payload(i)[0], real_media_payload(i)[1]) for i in range(n)]
    return spark.createDataFrame(rows, MEDIA_SCHEMA).repartition(partitions)


#: codec registry: (name, sniff(bytes)->bool, kind 'image'|'audio',
#: pixels fn | samples fn).  Extend with register_codec().
CODECS: list[tuple] = [
    ("fake", lambda b: b[:4] == MAGIC, "image", _decode_fake_pixels),
    ("bmp", lambda b: b[:2] == b"BM", "image", _decode_bmp_pixels),
    ("netpbm", lambda b: b[:2] in (b"P5", b"P6"), "image", _decode_netpbm_pixels),
    ("wav", lambda b: b[:4] == b"RIFF", "audio", _decode_wav_samples),
]


def register_codec(name: str, sniff, kind: str, decode) -> None:
    """Plug a real codec in (e.g. a Pillow-backed JPEG decoder where
    the library exists).  ``decode``: image → (fmt, 2-D uint8 array);
    audio → (fmt, frames, channels, float array).  Re-registering a
    name replaces the earlier entry (idempotent)."""
    CODECS[:] = [c for c in CODECS if c[0] != name]
    CODECS.insert(0, (name, sniff, kind, decode))


def register_default_codecs() -> dict[str, bool]:
    """Import-guarded on-ramp for COMPRESSED media (round-2 verdict
    #7): registers a Pillow-backed JPEG/PNG decoder and a
    soundfile-backed FLAC/OGG decoder when those libraries are
    importable, and skips cleanly when they are not (this container
    has neither — the registry seam is what's tested in both
    environments).  Returns ``{"pillow": bool, "soundfile": bool}``.

    Decoders normalize exactly like the built-ins: images to a 2-D
    uint8 grayscale plane (Pillow mode 'L'), audio to float64 frames x
    channels in [-1, 1] — so every downstream operator (decode_media /
    resize / frame-sample / audio features) works unchanged on JPEG,
    PNG, FLAC and OGG inputs."""
    out = {"pillow": False, "soundfile": False}
    try:
        import io

        from PIL import Image

        def _pil_decode(b: bytes):
            img = Image.open(io.BytesIO(b))
            fmt = (img.format or "pil").lower()
            return fmt, np.asarray(img.convert("L"), dtype=np.uint8)

        register_codec("pil-jpeg", lambda b: b[:2] == b"\xff\xd8",
                       "image", _pil_decode)
        register_codec("pil-png", lambda b: b[:8] == b"\x89PNG\r\n\x1a\n",
                       "image", _pil_decode)
        out["pillow"] = True
    except ImportError:
        pass
    try:
        import io

        import soundfile as sf

        def _sf_decode(fmt):
            def decode(b: bytes):
                data, _rate = sf.read(io.BytesIO(b), dtype="float64",
                                      always_2d=True)
                return fmt, data.shape[0], data.shape[1], data
            return decode

        register_codec("sf-flac", lambda b: b[:4] == b"fLaC", "audio",
                       _sf_decode("flac"))
        register_codec("sf-ogg", lambda b: b[:4] == b"OggS", "audio",
                       _sf_decode("ogg"))
        out["soundfile"] = True
    except ImportError:
        pass
    return out



def _registry_snapshot():
    """Driver-side snapshot of CODECS for executor installs.

    ``register_codec`` mutates DRIVER-local module state; executors
    re-import this module fresh, so without shipping the snapshot in
    the UDF closure a registered JPEG/soundfile decoder would work in
    local mode and raise 'unknown media container' on a real cluster.
    Each operator closes over the snapshot and installs it per batch
    (idempotent list assignment)."""
    return list(CODECS)


def _install_registry(snap) -> None:
    """Executor-side install of a driver registry snapshot.  MUST be a
    module-level function: cloudpickle ships nested UDF closures with
    a synthetic globals dict holding a COPY of referenced globals, so
    a bare ``CODECS[:] = snap`` inside the closure would mutate that
    copy, never the module list ``_decode_one``/``decode_pixels``
    consult.  This function is pickled by reference and executes in
    the worker's real module globals."""
    CODECS[:] = snap


def decode_pixels(b: bytes) -> tuple[str, np.ndarray]:
    """bytes → (format, grayscale 2-D array) via the codec registry."""
    for name, sniff, kind, fn in CODECS:
        if kind == "image" and sniff(b):
            return fn(b)
    if b[:2] == b"\xff\xd8":
        raise NotImplementedError("JPEG decode needs a codec library "
                                  "(register one via register_codec)")
    if b[:8] == b"\x89PNG\r\n\x1a\n":
        raise NotImplementedError("PNG decode needs a codec library "
                                  "(register one via register_codec)")
    raise ValueError("unknown media container")


def synthetic_media_df(spark, n: int = 64, partitions: int = 4) -> DataFrame:
    rows = [(i, "image", encode_fake(8 + i % 8, 8 + (i * 3) % 8, seed=i)) for i in range(n)]
    return spark.createDataFrame(rows, MEDIA_SCHEMA).repartition(partitions)


def decode_media(media: DataFrame) -> DataFrame:
    """binary → typed metadata + cheap features, in Arrow batches.

    Real codecs (JPEG/PNG/WAV/MP4) would slot into ``_decode_one``;
    they are NOT available in this environment and raise."""
    snap = _registry_snapshot()

    def gen(batches):
        import pandas as pd
        _install_registry(snap)  # driver registrations, executor-safe
        for pdf in batches:
            out = {k: [] for k in ("media_id", "kind", "format", "width", "height",
                                   "n_bytes", "mean_value")}
            for mid, kind, data in zip(pdf["media_id"], pdf["kind"], pdf["data"]):
                b = bytes(data)
                fmt, w, h, mean = _decode_one(b)
                out["media_id"].append(mid); out["kind"].append(kind)
                out["format"].append(fmt); out["width"].append(w); out["height"].append(h)
                out["n_bytes"].append(len(b)); out["mean_value"].append(mean)
            yield pd.DataFrame(out)

    return media.mapInPandas(gen, schema=META_SCHEMA)


def _decode_one(b: bytes) -> tuple[str, int, int, float]:
    """bytes → (format, width, height, mean) for ANY registered codec.
    Images: width/height in pixels, mean of the grayscale plane.
    Audio: width = frames, height = channels, mean of the normalized
    float samples."""
    for name, sniff, kind, fn in CODECS:
        if sniff(b):
            if kind == "audio":
                fmt, frames, channels, s = fn(b)
                return fmt, int(frames), int(channels), float(s.mean())
            fmt, px = fn(b)
            return fmt, int(px.shape[1]), int(px.shape[0]), float(px.mean())
    return decode_pixels(b)  # raises the right NotImplementedError/ValueError


def resize_stub(media: DataFrame, width: int, height: int) -> DataFrame:
    """Nearest-neighbour resize over any registered image codec
    (FAKE/BMP/PGM/PPM); output is the FAKE grayscale container — the
    pipeline's canonical normalized form (real pipelines emit a raw
    tensor container after decode too)."""
    snap = _registry_snapshot()

    def gen(batches):
        import pandas as pd
        _install_registry(snap)
        for pdf in batches:
            datas = []
            for data in pdf["data"]:
                _, payload = decode_pixels(bytes(data))
                h, w = payload.shape
                yi = (np.arange(height) * h // height)
                xi = (np.arange(width) * w // width)
                resized = payload[np.ix_(yi, xi)]
                datas.append(MAGIC + struct.pack(">II", width, height) + resized.tobytes())
            yield pd.DataFrame({"media_id": pdf["media_id"], "kind": pdf["kind"], "data": datas})

    return media.mapInPandas(gen, schema=MEDIA_SCHEMA)


def synthetic_audio_df(spark, n: int = 16, seconds_scale: int = 64,
                       partitions: int = 4) -> DataFrame:
    """Deterministic fake mono-PCM clips in the FAKE container
    (width = sample count, height = 1)."""
    rows = [(i, "audio", encode_fake(seconds_scale + (i * 7) % 64, 1, seed=1000 + i))
            for i in range(n)]
    return spark.createDataFrame(rows, MEDIA_SCHEMA).repartition(partitions)


def decode_samples(b: bytes) -> tuple[str, np.ndarray]:
    """bytes → (format, mono float sample vector) via the codec
    registry (audio codecs channel-mix; a registered plug-in codec,
    e.g. MP3, works here exactly as in decode_media).  FAKE payloads
    keep the legacy uint8-as-float semantics, pinned by the
    driver-gate oracle."""
    if b[:4] == MAGIC:
        _, px = _decode_fake_pixels(b)
        return "fake", px.ravel().astype(np.float64)
    for name, sniff, kind, fn in CODECS:
        if kind == "audio" and sniff(b):
            fmt, _, _, s = fn(b)
            return fmt, s.mean(axis=1)
    raise ValueError("unknown audio container")


def audio_features_stub(media: DataFrame, window: int = 16) -> DataFrame:
    """Windowed RMS + peak audio features — the explode-shaped
    (clip → windows) output a real librosa/torchaudio extractor needs;
    vectorized numpy per Arrow batch.  Decodes real PCM WAV (8/16-bit,
    channel-mixed) and the FAKE synthetic container; compressed audio
    (MP3/AAC) needs a registered codec."""
    snap = _registry_snapshot()

    def gen(batches):
        import pandas as pd
        _install_registry(snap)
        for pdf in batches:
            out = {"media_id": [], "window_no": [], "n_samples": [], "rms": [], "peak": []}
            for mid, data in zip(pdf["media_id"], pdf["data"]):
                _, pcm = decode_samples(bytes(data))
                for wno, start in enumerate(range(0, len(pcm), window)):
                    seg = pcm[start:start + window]
                    out["media_id"].append(mid)
                    out["window_no"].append(wno)
                    out["n_samples"].append(len(seg))
                    out["rms"].append(round(float(np.sqrt(np.mean(seg ** 2))), 6))
                    out["peak"].append(float(seg.max()))
            yield pd.DataFrame(out)

    return media.mapInPandas(
        gen, schema="media_id bigint, window_no int, n_samples int, rms double, peak double")


def frame_sample_stub(media: DataFrame, every_n: int = 2) -> DataFrame:
    """Video frame-sampling plumbing: treats each row of the FAKE image
    as a 'frame', keeps every n-th — exercises the explode-shaped
    output schema a real sampler needs."""
    snap = _registry_snapshot()

    def gen(batches):
        import pandas as pd
        _install_registry(snap)
        for pdf in batches:
            out = {"media_id": [], "frame_no": [], "data": []}
            for mid, data in zip(pdf["media_id"], pdf["data"]):
                _, payload = decode_pixels(bytes(data))
                h, w = payload.shape
                for fno in range(0, h, every_n):
                    out["media_id"].append(mid)
                    out["frame_no"].append(fno)
                    out["data"].append(MAGIC + struct.pack(">II", w, 1) + payload[fno].tobytes())
            yield pd.DataFrame(out)

    return media.mapInPandas(gen, schema="media_id bigint, frame_no int, data binary")
