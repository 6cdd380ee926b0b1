"""Multimodal (image/audio/video) column plumbing for training-data
pipelines (graft addition).

Media payloads are opaque ``binary`` columns with typed metadata
structs.  The Spark-side plumbing — schema, partition-preserving
``mapInPandas`` transforms, Arrow batch shapes — is real and tested;
the actual codec work is STUBBED: the container ships no image/audio
libraries, so :func:`decode_media` raises ``NotImplementedError`` for
real formats and supports a deterministic synthetic container
(``FAKE``) used by tests and benchmarks.

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


def synthetic_media_df(spark, n: int = 64, partitions: int = 4) -> DataFrame:
    rows = [(i, "image", encode_fake(8 + i % 8, 8 + (i * 3) % 8, seed=i)) for i in range(n)]
    return spark.createDataFrame(rows, MEDIA_SCHEMA).repartition(partitions)


def decode_media(media: DataFrame) -> DataFrame:
    """binary → typed metadata + cheap features, in Arrow batches.

    Real codecs (JPEG/PNG/WAV/MP4) would slot into ``_decode_one``;
    they are NOT available in this environment and raise."""

    def gen(batches):
        import pandas as pd
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
    if b[:4] == MAGIC:
        w, h = struct.unpack(">II", b[4:12])
        payload = np.frombuffer(b, dtype=np.uint8, offset=12, count=w * h)
        return "fake", int(w), int(h), float(payload.mean())
    if b[:2] == b"\xff\xd8":
        raise NotImplementedError("JPEG decode requires an image library "
                                  "(not available in this environment)")
    if b[:8] == b"\x89PNG\r\n\x1a\n":
        raise NotImplementedError("PNG decode requires an image library")
    raise ValueError("unknown media container")


def resize_stub(media: DataFrame, width: int, height: int) -> DataFrame:
    """Resize plumbing: nearest-neighbour over the FAKE container
    (deterministic stand-in for a real resampler; same partitioning,
    same Arrow batch shape a real implementation would use)."""

    def gen(batches):
        import pandas as pd
        for pdf in batches:
            datas = []
            for data in pdf["data"]:
                b = bytes(data)
                fmt, w, h, _ = _decode_one(b)
                payload = np.frombuffer(b, dtype=np.uint8, offset=12, count=w * h).reshape(h, w)
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


def audio_features_stub(media: DataFrame, window: int = 16) -> DataFrame:
    """Audio feature-extraction plumbing: windowed RMS + peak over the
    FAKE payload treated as uint8 mono PCM — the explode-shaped
    (clip → windows) output a real librosa/torchaudio extractor needs;
    vectorized numpy per Arrow batch.  Real WAV/MP3 decode would slot
    into ``_decode_one`` and is NotImplemented here (no audio libs in
    this environment)."""

    def gen(batches):
        import pandas as pd
        for pdf in batches:
            out = {"media_id": [], "window_no": [], "n_samples": [], "rms": [], "peak": []}
            for mid, data in zip(pdf["media_id"], pdf["data"]):
                b = bytes(data)
                _, w, h, _ = _decode_one(b)
                pcm = np.frombuffer(b, dtype=np.uint8, offset=12,
                                    count=w * h).astype(np.float64)
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

    def gen(batches):
        import pandas as pd
        for pdf in batches:
            out = {"media_id": [], "frame_no": [], "data": []}
            for mid, data in zip(pdf["media_id"], pdf["data"]):
                b = bytes(data)
                _, w, h, _ = _decode_one(b)
                payload = np.frombuffer(b, dtype=np.uint8, offset=12, count=w * h).reshape(h, w)
                for fno in range(0, h, every_n):
                    out["media_id"].append(mid)
                    out["frame_no"].append(fno)
                    out["data"].append(MAGIC + struct.pack(">II", w, 1) + payload[fno].tobytes())
            yield pd.DataFrame(out)

    return media.mapInPandas(gen, schema="media_id bigint, frame_no int, data binary")
