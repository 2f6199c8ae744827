"""Pure-stdlib PCM WAV codec (``wave`` + numpy buffer views).

Closes the multimodal AUDIO decode seam the same way functions/png_codec.py
closed the image seam: this container ships no audio libraries, but
16-bit PCM RIFF/WAVE needs none — the stdlib ``wave`` module parses the
chunk layout and the samples are a raw little-endian int16 buffer.
Compressed audio (mp3/ogg/flac) genuinely needs external decoders and
still raises NotImplementedError at the operator seam.

Reference disposition: the reference engine (MIT 6.5840 MapReduce lab)
has no media surface at all; this exists for the north-star multimodal
pipeline (SURVEY.md LLM-data extension set).
"""

from __future__ import annotations

import io
import wave

import numpy as np


def is_wav(data: bytes) -> bool:
    """RIFF/WAVE container sniff — the cheap dispatch test the operator
    runs before committing to a decode."""
    return len(data) >= 12 and data[:4] == b"RIFF" and data[8:12] == b"WAVE"


def encode_wav(samples: np.ndarray, rate: int = 16_000) -> bytes:
    """Encode int16 samples of shape (n_frames,) or (n_frames, n_channels)
    as a 16-bit PCM WAV blob."""
    arr = np.asarray(samples, dtype="<i2")
    if arr.ndim == 1:
        arr = arr[:, None]
    if arr.ndim != 2:
        raise ValueError(f"expected 1-D or 2-D samples, got shape {arr.shape}")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(arr.shape[1])
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(arr.tobytes())
    return buf.getvalue()


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """Decode a 16-bit PCM WAV blob to (int16 array of shape
    (n_frames, n_channels), sample_rate). Raises on non-PCM / non-16-bit
    payloads — the honest boundary of a stdlib decode."""
    if not is_wav(data):
        raise ValueError("not a RIFF/WAVE blob")
    with wave.open(io.BytesIO(data), "rb") as w:
        if w.getcomptype() != "NONE":  # pragma: no cover - wave raises first
            raise NotImplementedError("compressed WAV needs external codecs")
        if w.getsampwidth() != 2:
            raise NotImplementedError(
                f"only 16-bit PCM supported, got {8 * w.getsampwidth()}-bit"
            )
        n_ch = w.getnchannels()
        rate = w.getframerate()
        frames = w.readframes(w.getnframes())
    arr = np.frombuffer(frames, dtype="<i2").reshape(-1, n_ch)
    return arr, rate
