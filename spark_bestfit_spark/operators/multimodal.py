"""Multimodal (image/audio/video) column plumbing for training pipelines.

Media payloads are opaque ``binary`` columns with typed metadata structs.
All Spark-side plumbing — schemas, batch iteration, partition sizing,
output shapes — is real and tested. Codec status: AUDIO decode is
stdlib-real everywhere (``wave``-backed PCM, with ``synthetic_wav``
test vectors); IMAGE decode is real behind the optional pillow gate
(with stdlib-generated ``synthetic_png`` vectors); VIDEO decode stays a
documented ``NotImplementedError`` seam (needs pyav/ffmpeg) with a
deterministic fake for plumbing tests.

Scale notes: decode/feature-extract are ``mapInPandas`` stages (Arrow
batches, one Python worker per core); ``media_repartition`` sizes
partitions by estimated payload bytes so a 100 TB corpus of mixed blob
sizes does not produce 4 GB Arrow batches or thousand-task skew.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField("mime", StringType()),
        StructField("n_bytes", LongType()),
    ]
)

IMAGE_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("channels", LongType()),
        StructField("embedding", ArrayType(FloatType())),
    ]
)

FRAME_SAMPLE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("frame_payload", BinaryType()),
    ]
)

AUDIO_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("sample_rate", LongType()),
        StructField("n_channels", LongType()),
        StructField("n_samples", LongType()),
        StructField("duration_sec", DoubleType()),
        StructField("rms", DoubleType()),
        StructField("peak", LongType()),
    ]
)


def media_repartition(
    df: DataFrame, target_bytes_per_partition: int = 128 << 20
) -> DataFrame:
    """Partition by payload volume, not row count — blob tables have
    orders-of-magnitude row-size skew."""
    total = df.agg(F.sum(F.length("payload"))).first()[0] or 0
    n = max(1, int(total / target_bytes_per_partition))
    return df.repartition(n)


def _decode_image(payload: bytes) -> np.ndarray:
    """Decode an image payload to an HxWxC uint8 array.

    Uses pillow when installed (optional extra); without it, raises the
    documented NotImplementedError so the pipeline seam stays explicit —
    use ``fake_decoder=True`` for plumbing tests in minimal containers."""
    try:
        import io

        import PIL.Image
    except ImportError:
        raise NotImplementedError(
            "image decoding requires pillow; not available in this "
            "container — use fake_decoder=True for pipeline testing"
        )
    img = PIL.Image.open(io.BytesIO(payload))
    arr = np.asarray(img.convert("RGB"), dtype=np.uint8)
    return arr


def synthetic_png(
    width: int, height: int, rgb: tuple = (128, 64, 32)
) -> bytes:
    """A minimal VALID solid-color PNG, written with the stdlib only
    (struct + zlib — no pillow needed to GENERATE test vectors). Any
    conformant decoder reads it back as an (height, width, 3) uint8
    array of ``rgb`` — so the REAL ``_decode_image`` seam can be
    exercised end-to-end wherever pillow is installed, with vectors
    produced in minimal containers that lack it."""
    import struct
    import zlib

    if width < 1 or height < 1:
        raise ValueError("width and height must be >= 1")
    r, g, b = (int(v) & 0xFF for v in rgb)

    def chunk(typ: bytes, data: bytes) -> bytes:
        out = struct.pack(">I", len(data)) + typ + data
        return out + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    # each scanline: filter byte 0 + width RGB triples
    raw = (b"\x00" + bytes((r, g, b)) * width) * height
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _fake_decode_image(payload: bytes) -> np.ndarray:
    """Deterministic fake: payload bytes seed a tiny 'image'. Keeps the
    full pipeline (schema, batching, feature shapes) testable."""
    seed = int.from_bytes(payload[:8].ljust(8, b"\0"), "little") % (2**32)
    rng = np.random.default_rng(seed)
    h, w = 4 + seed % 8, 4 + (seed >> 4) % 8
    return rng.integers(0, 255, size=(h, w, 3), dtype=np.uint8)


def extract_image_features(
    df: DataFrame,
    embedding_dim: int = 8,
    fake_decoder: bool = False,
) -> DataFrame:
    """mapInPandas decode + feature-extract stage.

    Output: (media_id, width, height, channels, embedding). The
    embedding here is a deterministic channel-statistics vector — the
    seam where a real vision encoder plugs in."""
    decode = _fake_decode_image if fake_decoder else _decode_image

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                img = decode(bytes(payload))
                h, w, c = img.shape
                flat = img.astype(np.float64)
                feats = [
                    flat.mean(),
                    flat.std(),
                    *[flat[..., ch].mean() for ch in range(c)],
                ]
                feats = (feats + [0.0] * embedding_dim)[:embedding_dim]
                rows.append(
                    {
                        "media_id": int(media_id),
                        "width": w,
                        "height": h,
                        "channels": c,
                        "embedding": [float(v) for v in feats],
                    }
                )
            yield pd.DataFrame(rows)

    return df.select("media_id", "payload").mapInPandas(
        batches, schema=IMAGE_FEATURES_SCHEMA
    )


def sample_frames(
    df: DataFrame, every_nth: int = 10, fake_decoder: bool = False
) -> DataFrame:
    """Video frame sampling stage (mapInPandas): emits one row per
    sampled frame (``frame_payload`` = raw top-down RGB bytes).

    The real path decodes uncompressed RIFF/AVI with the stdlib
    :func:`_decode_avi` walker — live in every container, like the WAV
    path; compressed codecs raise the documented NotImplementedError
    seam (pyav/ffmpeg). With ``fake_decoder=True``, 'frames' are
    deterministic byte slices — same pipeline shape, no container
    parse."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                data = bytes(payload)
                if fake_decoder:
                    n_frames = max(1, len(data) // 16)
                    for idx in range(0, n_frames, every_nth):
                        rows.append(
                            {
                                "media_id": int(media_id),
                                "frame_idx": idx,
                                "frame_payload": data[
                                    idx * 16 : (idx + 1) * 16
                                ],
                            }
                        )
                    continue
                _, frames = _decode_avi(data)
                for idx in range(0, len(frames), every_nth):
                    rows.append(
                        {
                            "media_id": int(media_id),
                            "frame_idx": idx,
                            "frame_payload": frames[idx].tobytes(),
                        }
                    )
            yield pd.DataFrame(rows)

    return df.select("media_id", "payload").mapInPandas(
        batches, schema=FRAME_SAMPLE_SCHEMA
    )


def synthetic_avi(
    n_frames: int,
    width: int = 8,
    height: int = 6,
    fps: int = 10,
) -> bytes:
    """A VALID uncompressed AVI (RIFF container, DIB/BI_RGB video
    stream, BMP row-padding and bottom-up row order per the format) —
    the video analog of :func:`synthetic_png`/:func:`synthetic_wav`,
    written with stdlib ``struct`` only. Frame ``i`` is a solid fill
    of ``(i % 256, 2*i % 256, 3*i % 256)`` RGB, so any conformant
    decoder (including :func:`_decode_avi` below) recovers the frame
    index from the pixels."""
    import struct

    if n_frames < 1:
        raise ValueError("n_frames must be >= 1")
    if width < 1 or height < 1:
        raise ValueError("width and height must be >= 1")

    def chunk(fourcc: bytes, data: bytes) -> bytes:
        pad = b"\x00" if len(data) % 2 else b""
        return fourcc + struct.pack("<I", len(data)) + data + pad

    def lst(fourcc: bytes, data: bytes) -> bytes:
        return chunk(b"LIST", fourcc + data)

    stride = (width * 3 + 3) & ~3
    frame_bytes = stride * height
    avih = struct.pack(
        "<14I",
        1_000_000 // fps,  # microseconds per frame
        frame_bytes * fps,  # max bytes per second
        0,  # padding granularity
        0x10,  # AVIF_HASINDEX off; 0x10 = AVIF_WASCAPTUREFILE-ish flags
        n_frames, 0, 1, frame_bytes, width, height, 0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIIIhhhh",
        b"vids", b"DIB ", 0, 0, 0, 0,
        1, fps,  # scale, rate -> fps = rate/scale
        0, n_frames, frame_bytes, 0, frame_bytes // 1,
        0, 0, width, height,
    )
    strf = struct.pack(
        "<IiiHHIIiiII",
        40, width, height, 1, 24, 0,  # BITMAPINFOHEADER, BI_RGB
        frame_bytes, 0, 0, 0, 0,
    )
    frames = b""
    for i in range(n_frames):
        r, g, b = i % 256, (2 * i) % 256, (3 * i) % 256
        row = (bytes((b, g, r)) * width).ljust(stride, b"\x00")
        frames += chunk(b"00db", row * height)  # bottom-up BGR rows
    body = (
        lst(
            b"hdrl",
            chunk(b"avih", avih)
            + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
        )
        + lst(b"movi", frames)
    )
    return b"RIFF" + struct.pack("<I", len(b"AVI ") + len(body)) + b"AVI " + body


def _decode_video_av(payload: bytes, cause: Exception | None = None):
    """pyav/ffmpeg plug-in for compressed video containers (mp4/webm/
    mkv and compressed AVI streams) — the gated sibling of the pillow
    image gate (:func:`_decode_image`): live wherever the optional
    ``av`` extra is installed, the documented NotImplementedError seam
    otherwise. Returns the same ``(fps, [HxWx3 uint8 RGB frames])``
    contract as the stdlib AVI path, so downstream mapInPandas stages
    never see which decoder ran."""
    try:
        import av
    except ImportError:
        detail = str(cause) if cause is not None else "compressed video payload"
        raise NotImplementedError(
            f"{detail}; needs a pyav/ffmpeg-backed decoder (install "
            "the optional 'av' extra to enable it)"
        ) from cause
    import io

    with av.open(io.BytesIO(payload)) as container:
        stream = next(
            (s for s in container.streams if s.type == "video"), None
        )
        if stream is None:
            raise ValueError("payload has no video stream")
        rate = stream.average_rate
        fps = int(rate) if rate else 0
        frames = [
            f.to_ndarray(format="rgb24") for f in container.decode(stream)
        ]
    if not frames:
        raise ValueError("video stream decoded to zero frames")
    return fps, frames


def _decode_avi(payload: bytes):
    """Decode a video payload to ``(fps, [HxWx3 uint8 RGB frames])``:
    uncompressed (DIB/BI_RGB) AVI decodes with the stdlib RIFF walker
    in every container; anything the walker rejects (compressed '00dc'
    streams, non-zero biCompression, mp4/webm/mkv containers) falls
    through to the pyav gate — real decode when the optional ``av``
    extra is installed, the documented NotImplementedError otherwise."""
    try:
        return _decode_avi_stdlib(payload)
    except NotImplementedError as exc:
        return _decode_video_av(payload, cause=exc)


def _decode_avi_stdlib(payload: bytes):
    """Stdlib-only decode of uncompressed (DIB/BI_RGB) AVI payloads —
    a real RIFF chunk walker, live in every container. Compressed
    streams and non-AVI containers raise NotImplementedError; the
    public :func:`_decode_avi` catches that and tries the pyav gate."""
    import struct

    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise NotImplementedError(
            "non-AVI video payload; compressed containers (mp4/webm/"
            "mkv) need a pyav/ffmpeg-backed decoder"
        )

    width = height = None
    scale, rate = 1, 0
    compression = 0
    raw_frames: list = []

    def walk(buf: bytes, pos: int, end: int):
        nonlocal width, height, scale, rate, compression
        while pos + 8 <= end:
            fourcc = buf[pos : pos + 4]
            (size,) = struct.unpack("<I", buf[pos + 4 : pos + 8])
            data_start = pos + 8
            if fourcc == b"LIST":
                walk(buf, data_start + 4, data_start + size)
            elif fourcc == b"avih":
                hdr = struct.unpack(
                    "<14I", buf[data_start : data_start + 56]
                )
                width, height = hdr[8], hdr[9]
            elif fourcc == b"strh":
                s = buf[data_start : data_start + 56]
                if s[:4] == b"vids":
                    scale, rate = struct.unpack("<II", s[20:28])
            elif fourcc == b"strf":
                compression = struct.unpack(
                    "<I", buf[data_start + 16 : data_start + 20]
                )[0]
            elif fourcc == b"00dc":
                raise NotImplementedError(
                    "compressed AVI stream ('00dc'); needs a "
                    "pyav/ffmpeg-backed decoder"
                )
            elif fourcc == b"00db":
                raw_frames.append(buf[data_start : data_start + size])
            pos = data_start + size + (size % 2)  # chunks are word-aligned

    walk(payload, 12, len(payload))
    if width is None or not raw_frames:
        raise NotImplementedError(
            "AVI payload carries no uncompressed video frames this "
            "stdlib decoder understands"
        )
    if compression != 0:
        raise NotImplementedError(
            f"compressed DIB stream (biCompression={compression}); "
            "needs a pyav/ffmpeg-backed decoder"
        )
    stride = (width * 3 + 3) & ~3
    frames = []
    for raw in raw_frames:
        a = np.frombuffer(raw, dtype=np.uint8)[: stride * height]
        rows = a.reshape(height, stride)[:, : width * 3]
        bgr = rows.reshape(height, width, 3)[::-1]  # bottom-up -> top-down
        frames.append(bgr[..., ::-1].copy())  # BGR -> RGB
    fps = (rate // scale) if scale else 0
    return fps, frames


def synthetic_wav(
    n_samples: int,
    sample_rate: int = 16_000,
    freq_hz: float = 440.0,
    amplitude: float = 0.5,
    channels: int = 1,
) -> bytes:
    """A VALID 16-bit PCM WAV (sine tone), written with the stdlib
    ``wave`` module only — the audio analog of :func:`synthetic_png`:
    test vectors are generated in minimal containers, and any
    conformant decoder (including :func:`_decode_audio` below, which
    is itself stdlib-only and therefore REAL everywhere) reads back
    the exact (sample_rate, channels, n_samples) written here."""
    import io
    import wave

    if n_samples < 1:
        raise ValueError("n_samples must be >= 1")
    if channels < 1:
        raise ValueError("channels must be >= 1")
    if not 0.0 <= amplitude <= 1.0:
        raise ValueError("amplitude must be in [0, 1]")
    t = np.arange(n_samples, dtype=np.float64) / sample_rate
    mono = amplitude * np.sin(2.0 * np.pi * freq_hz * t)
    pcm = np.clip(np.round(mono * 32767.0), -32768, 32767).astype("<i2")
    frames = np.repeat(pcm[:, None], channels, axis=1).tobytes()
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(frames)
    return buf.getvalue()


def _decode_audio_av(payload: bytes, cause: Exception | None = None):
    """pyav/ffmpeg plug-in for compressed audio (mp3/ogg/flac) and
    non-16-bit PCM — the gated sibling of the pillow image gate: live
    wherever the optional ``av`` extra is installed, the documented
    NotImplementedError seam otherwise. Returns the same
    ``(sample_rate, int16 (n_samples, n_channels))`` contract as the
    stdlib WAV path (resampled to packed s16), so downstream stages
    never see which decoder ran."""
    try:
        import av
    except ImportError:
        detail = str(cause) if cause is not None else "compressed audio payload"
        raise NotImplementedError(
            f"{detail}; needs a pyav/ffmpeg-backed decoder (install "
            "the optional 'av' extra to enable it)"
        ) from cause
    import io

    with av.open(io.BytesIO(payload)) as container:
        stream = next(
            (s for s in container.streams if s.type == "audio"), None
        )
        if stream is None:
            raise ValueError("payload has no audio stream")
        rate = int(stream.rate or 0)
        resampler = av.AudioResampler(
            format="s16", layout=stream.layout, rate=rate or None
        )
        chunks = []
        nch = 0
        for frame in container.decode(stream):
            out = resampler.resample(frame)
            for rf in out if isinstance(out, list) else [out]:
                if rf is None:
                    continue
                a = rf.to_ndarray()  # packed s16: (1, samples*channels)
                ch = len(rf.layout.channels)
                nch = nch or ch
                chunks.append(a.reshape(-1, ch).astype(np.int16))
            if not rate:
                rate = int(frame.sample_rate or 0)
    if not chunks:
        raise ValueError("audio stream decoded to zero samples")
    return rate, np.concatenate(chunks)


def _decode_audio(payload: bytes):
    """Decode an audio payload to ``(sample_rate, int16 array of shape
    (n_samples, n_channels))``: 16-bit PCM WAV decodes with ONLY the
    stdlib ``wave`` module (real in every container); anything the
    stdlib path rejects (mp3/ogg/flac containers, non-16-bit PCM)
    falls through to the pyav gate — real decode when the optional
    ``av`` extra is installed, the documented NotImplementedError
    otherwise."""
    try:
        return _decode_audio_stdlib(payload)
    except NotImplementedError as exc:
        return _decode_audio_av(payload, cause=exc)


def _decode_audio_stdlib(payload: bytes):
    """Stdlib-only decode of 16-bit PCM WAV payloads. Non-WAV
    containers and other sample widths raise NotImplementedError; the
    public :func:`_decode_audio` catches that and tries the pyav
    gate."""
    import io
    import wave

    try:
        with wave.open(io.BytesIO(payload), "rb") as w:
            sampwidth = w.getsampwidth()
            if sampwidth != 2:
                raise NotImplementedError(
                    f"only 16-bit PCM WAV is decoded stdlib-side "
                    f"(got sample width {sampwidth}); other widths "
                    "need an ffmpeg-backed decoder"
                )
            rate = w.getframerate()
            nch = w.getnchannels()
            raw = w.readframes(w.getnframes())
    except wave.Error as exc:
        raise NotImplementedError(
            f"non-WAV audio payload ({exc}); compressed containers "
            "(mp3/ogg/flac) need an ffmpeg-backed decoder"
        ) from exc
    arr = np.frombuffer(raw, dtype="<i2").reshape(-1, nch)
    return rate, arr


def extract_audio_features(df: DataFrame) -> DataFrame:
    """mapInPandas decode + feature-extract stage for audio payloads —
    the audio sibling of :func:`extract_image_features`, except the
    decoder is stdlib-real (no optional extra): WAV bytes in, typed
    features out.

    Output: (media_id, sample_rate, n_channels, n_samples,
    duration_sec, rms, peak). ``rms``/``peak`` are computed over the
    normalized [-1, 1] float samples across all channels; this is the
    seam where a real audio encoder (log-mel, wav2vec) plugs in, with
    the same Arrow batch shape."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                rate, arr = _decode_audio(bytes(payload))
                x = arr.astype(np.float64) / 32768.0
                n = arr.shape[0]
                rows.append(
                    {
                        "media_id": int(media_id),
                        "sample_rate": int(rate),
                        "n_channels": int(arr.shape[1]),
                        "n_samples": int(n),
                        "duration_sec": round(n / rate, 6),
                        "rms": float(np.sqrt(np.mean(x * x))) if n else 0.0,
                        "peak": int(np.max(np.abs(arr))) if n else 0,
                    }
                )
            yield pd.DataFrame(rows)

    return df.select("media_id", "payload").mapInPandas(
        batches, schema=AUDIO_FEATURES_SCHEMA
    )
