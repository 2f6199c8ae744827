"""Minimal pure-Python PNG codec (encode + decode) on stdlib zlib.

The container ships no image libraries (PIL/imageio), but PNG is a public
format (RFC 2083 / ISO 15948) whose only heavy dependency is DEFLATE —
which the Python stdlib provides. This module implements exactly enough
of it to make the multimodal operators' ``decode_mode="real"`` branches
EXECUTE on real, spec-conformant image bytes:

- ``encode_png``: 8-bit grayscale (color type 0) or RGB (color type 2),
  filter type 0 (None) per scanline — the simplest valid encoder; its
  output opens in any viewer.
- ``decode_png``: 8-bit grayscale/RGB, non-interlaced, ALL five scanline
  filters (None/Sub/Up/Average/Paeth) — so it also decodes PNGs produced
  by real encoders that choose per-row filters, not just our own.

Deliberately out of scope (raise ValueError): palette/alpha color types,
bit depths other than 8, interlacing. Those need no new dependencies,
just code — the seam documents what a full codec would add. JPEG/audio/
video stay NotImplementedError in the operators: those genuinely require
external libraries.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIGNATURE = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png(img: np.ndarray, filter_type: int = 0) -> bytes:
    """Encode an (H, W) grayscale or (H, W, 3) RGB uint8 array as PNG.

    ``filter_type`` applies one filter to every scanline (0..4); non-zero
    values exist so tests can exercise the decoder's unfilter paths with
    spec-valid input.
    """
    arr = np.asarray(img)
    if arr.dtype != np.uint8:
        raise ValueError("encode_png expects uint8")
    if arr.ndim == 2:
        color_type, channels = 0, 1
        arr = arr[:, :, None]
    elif arr.ndim == 3 and arr.shape[2] == 3:
        color_type, channels = 2, 3
    else:
        raise ValueError("encode_png expects (H,W) or (H,W,3)")
    if not 0 <= filter_type <= 4:
        raise ValueError("filter_type must be 0..4")
    h, w = arr.shape[:2]
    bpp = channels  # bytes per pixel at bit depth 8
    raw = bytearray()
    prev = np.zeros(w * bpp, dtype=np.uint8)
    for y in range(h):
        line = arr[y].reshape(-1)
        filt = _apply_filter(filter_type, line, prev, bpp)
        raw.append(filter_type)
        raw.extend(filt.tobytes())
        prev = line
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        _SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )


def _apply_filter(ft: int, line: np.ndarray, prev: np.ndarray, bpp: int) -> np.ndarray:
    if ft == 0:
        return line
    a = np.zeros_like(line)
    a[bpp:] = line[:-bpp]  # left neighbor (same channel)
    b = prev  # up
    c = np.zeros_like(prev)
    c[bpp:] = prev[:-bpp]  # upper-left
    if ft == 1:
        return (line.astype(np.int16) - a).astype(np.uint8)
    if ft == 2:
        return (line.astype(np.int16) - b).astype(np.uint8)
    if ft == 3:
        return (line.astype(np.int16) - ((a.astype(np.int16) + b) // 2)).astype(
            np.uint8
        )
    return (line.astype(np.int16) - _paeth(a, b, c)).astype(np.uint8)


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    a16, b16, c16 = (x.astype(np.int16) for x in (a, b, c))
    p = a16 + b16 - c16
    pa, pb, pc = np.abs(p - a16), np.abs(p - b16), np.abs(p - c16)
    out = np.where((pa <= pb) & (pa <= pc), a16, np.where(pb <= pc, b16, c16))
    return out


def is_png(data: bytes) -> bool:
    return bytes(data[:8]) == _SIGNATURE


def png_stream_offsets(data: bytes) -> list[int]:
    """Split a concatenated-PNG stream structurally: return the byte
    offsets ``[f0, f1, ..., end]`` such that frame k is
    ``data[offs[k]:offs[k+1]]``.

    Walks each frame chunk-by-chunk (4-byte length + 4-byte tag +
    payload + 4-byte CRC) until its IEND chunk; the next frame must
    begin immediately after. Searching for the 8-byte signature instead
    (``data.find(sig)``) is WRONG: that byte pattern can legally occur
    inside zlib-compressed IDAT payload and would mis-split frames —
    the chunk walk never looks inside payloads, so embedded signatures
    are harmless.
    """
    data = bytes(data)
    offs: list[int] = []
    pos = 0
    n = len(data)
    while pos < n:
        if data[pos : pos + 8] != _SIGNATURE:
            raise ValueError(f"frame at offset {pos} lacks PNG signature")
        offs.append(pos)
        pos += 8
        while True:
            if pos + 8 > n:
                raise ValueError("truncated chunk header")
            (length,) = struct.unpack(">I", data[pos : pos + 4])
            tag = data[pos + 4 : pos + 8]
            end = pos + 12 + length  # header + payload + CRC
            if end > n:
                raise ValueError("truncated chunk payload")
            pos = end
            if tag == b"IEND":
                break
    offs.append(n)
    return offs


def decode_png(data: bytes) -> np.ndarray:
    """Decode a PNG to an (H, W) uint8 array (grayscale) or (H, W, 3)
    (RGB). Supports bit depth 8, color types 0/2, no interlace, all five
    scanline filters."""
    data = bytes(data)
    if not is_png(data):
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    width = height = None
    color_type = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        if len(payload) != length:
            raise ValueError("truncated chunk")
        if tag == b"IHDR":
            width, height, depth, color_type, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", payload
            )
            if depth != 8:
                raise ValueError(f"unsupported bit depth {depth}")
            if color_type not in (0, 2):
                raise ValueError(f"unsupported color type {color_type}")
            if interlace:
                raise ValueError("interlaced PNG unsupported")
            if comp or filt:
                raise ValueError("nonstandard compression/filter method")
        elif tag == b"IDAT":
            idat.extend(payload)
        elif tag == b"IEND":
            break
        pos += 12 + length
    if width is None:
        raise ValueError("missing IHDR")
    channels = 1 if color_type == 0 else 3
    bpp = channels
    stride = width * bpp
    raw = zlib.decompress(bytes(idat))
    if len(raw) != height * (stride + 1):
        raise ValueError("IDAT size mismatch")
    out = np.zeros((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(height):
        ft = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).copy()
        out[y] = _unfilter(ft, line, prev, bpp)
        prev = out[y]
    if channels == 1:
        return out
    return out.reshape(height, width, 3)


def _unfilter(ft: int, line: np.ndarray, prev: np.ndarray, bpp: int) -> np.ndarray:
    if ft == 0:
        return line
    if ft == 2:
        return (line.astype(np.int16) + prev).astype(np.uint8)
    # Sub/Average/Paeth need the already-reconstructed left neighbor —
    # sequential per pixel group (scanlines are short; this is test-path
    # code, the operators batch via Arrow).
    out = line.astype(np.int16)
    if ft == 1:
        for i in range(bpp, len(out)):
            out[i] = (out[i] + out[i - bpp]) & 0xFF
    elif ft == 3:
        for i in range(len(out)):
            a = out[i - bpp] if i >= bpp else 0
            out[i] = (out[i] + (a + int(prev[i])) // 2) & 0xFF
    elif ft == 4:
        for i in range(len(out)):
            a = out[i - bpp] if i >= bpp else 0
            c = int(prev[i - bpp]) if i >= bpp else 0
            b = int(prev[i])
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            out[i] = (out[i] + pred) & 0xFF
    else:
        raise ValueError(f"unknown filter type {ft}")
    return out.astype(np.uint8)
