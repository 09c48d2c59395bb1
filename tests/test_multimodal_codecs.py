"""Compressed-codec seam contract for the multimodal decode gates.

The image decode gate (pillow) set the pattern: real decode wherever
the optional extra is installed, a documented NotImplementedError seam
otherwise, with BOTH sides pinned by environment-gated tests. This
module applies the same pattern to the video/audio pyav gate
(`operators/multimodal.py` `_decode_video_av` / `_decode_audio_av`):

* the without-pyav tests run in containers lacking ``av`` (this one)
  and pin the seam contract — compressed payloads raise
  NotImplementedError naming the pyav plug-in, and the stdlib
  uncompressed paths stay live;
* the with-pyav tests skip here and pin the plug-in contract — an
  av-encoded mp4/mp3 round-trips through the SAME public decode
  functions with the same return shape the stdlib paths produce.

Reference parity: dwsmith1983/spark-bestfit has no media decode at
all; this seam exists for the LLM-pipeline multimodal columns.
"""
from __future__ import annotations

import io
import wave

import numpy as np
import pytest

from spark_bestfit_spark.operators import multimodal


def _has_av() -> bool:
    try:
        import av  # noqa: F401

        return True
    except ImportError:
        return False


def _wav_bytes(sampwidth: int, nframes: int = 64, rate: int = 8000) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(sampwidth)
        w.setframerate(rate)
        w.writeframes(b"\x01" * (nframes * sampwidth))
    return buf.getvalue()


def _compressed_avi() -> bytes:
    """A synthetic AVI whose frame chunks are '00dc' (compressed) —
    built by re-tagging the generator's uncompressed '00db' chunks."""
    avi = multimodal.synthetic_avi(2, width=4, height=3, fps=10)
    assert b"00db" in avi
    return avi.replace(b"00db", b"00dc")


class TestSeamWithoutPyav:
    """Pins the NotImplementedError contract in av-less containers."""

    pytestmark = pytest.mark.skipif(
        _has_av(), reason="pyav installed — the decode path is live"
    )

    def test_non_avi_video_names_the_plugin(self):
        with pytest.raises(NotImplementedError, match="pyav/ffmpeg"):
            multimodal._decode_avi(b"\x00\x01\x02not-a-riff-container")

    def test_compressed_avi_stream_names_the_plugin(self):
        with pytest.raises(NotImplementedError, match="pyav/ffmpeg"):
            multimodal._decode_avi(_compressed_avi())

    def test_non_wav_audio_names_the_plugin(self):
        with pytest.raises(NotImplementedError, match="pyav/ffmpeg"):
            multimodal._decode_audio(b"ID3\x04mp3-ish-payload" + b"\xff" * 64)

    def test_24bit_wav_names_the_plugin(self):
        with pytest.raises(NotImplementedError, match="pyav/ffmpeg"):
            multimodal._decode_audio(_wav_bytes(sampwidth=3))

    def test_stdlib_paths_stay_live(self):
        # the gate must NOT swallow the uncompressed fast paths
        fps, frames = multimodal._decode_avi(
            multimodal.synthetic_avi(2, width=4, height=3, fps=10)
        )
        assert fps == 10 and len(frames) == 2
        rate, arr = multimodal._decode_audio(_wav_bytes(sampwidth=2))
        assert rate == 8000 and arr.dtype == np.int16


class TestSeamWithPyav:
    """Pins the plug-in contract wherever the optional extra exists:
    av-encoded compressed containers round-trip through the SAME
    public functions with the stdlib paths' return shapes."""

    pytestmark = pytest.mark.skipif(
        not _has_av(), reason="pyav not installed (optional extra)"
    )

    def _encode_mp4(self, w=32, h=24, n=5, fps=10) -> bytes:
        import av

        buf = io.BytesIO()
        with av.open(buf, mode="w", format="mp4") as container:
            stream = container.add_stream("mpeg4", rate=fps)
            stream.width, stream.height = w, h
            stream.pix_fmt = "yuv420p"
            for i in range(n):
                img = np.full((h, w, 3), 40 * (i + 1), dtype=np.uint8)
                frame = av.VideoFrame.from_ndarray(img, format="rgb24")
                for pkt in stream.encode(frame):
                    container.mux(pkt)
            for pkt in stream.encode():
                container.mux(pkt)
        return buf.getvalue()

    def _encode_mp3(self, rate=44100, n=44100) -> tuple[bytes, np.ndarray]:
        import av

        t = np.arange(n, dtype=np.float64)
        sine = (0.5 * np.sin(2 * np.pi * 440.0 * t / rate) * 32767).astype(
            np.int16
        )
        buf = io.BytesIO()
        with av.open(buf, mode="w", format="mp3") as container:
            stream = container.add_stream("mp3", rate=rate)
            frame = av.AudioFrame.from_ndarray(
                sine.reshape(1, -1), format="s16", layout="mono"
            )
            frame.sample_rate = rate
            for pkt in stream.encode(frame):
                container.mux(pkt)
            for pkt in stream.encode():
                container.mux(pkt)
        return buf.getvalue(), sine

    def test_mp4_round_trip(self):
        payload = self._encode_mp4()
        fps, frames = multimodal._decode_avi(payload)
        assert fps == 10
        assert len(frames) >= 1
        for f in frames:
            assert f.shape == (24, 32, 3) and f.dtype == np.uint8
        # lossy codec: solid fills survive within a loose tolerance
        first = frames[0].astype(np.float64)
        assert abs(first.mean() - 40.0) < 12.0

    def test_mp3_round_trip(self):
        payload, sine = self._encode_mp3()
        rate, arr = multimodal._decode_audio(payload)
        assert rate == 44100
        assert arr.dtype == np.int16 and arr.ndim == 2 and arr.shape[1] == 1
        # mp3 pads with encoder delay; length within 10%
        assert abs(arr.shape[0] - sine.shape[0]) < sine.shape[0] * 0.1
        # the 440 Hz tone dominates the decoded spectrum
        x = arr[: sine.shape[0], 0].astype(np.float64)
        spec = np.abs(np.fft.rfft(x))
        peak_hz = np.argmax(spec) * rate / (2 * (spec.size - 1))
        assert abs(peak_hz - 440.0) < 5.0

    def test_extract_audio_features_on_mp3(self, spark):
        payload, _ = self._encode_mp3()
        df = spark.createDataFrame(
            [(1, "audio", bytearray(payload), "audio/mpeg", len(payload))],
            schema=multimodal.MEDIA_SCHEMA,
        )
        rows = multimodal.extract_audio_features(df).collect()
        assert len(rows) == 1
        assert rows[0].sample_rate == 44100
        assert 0.2 < rows[0].rms < 0.5  # 0.5-amplitude sine -> rms ~0.35
