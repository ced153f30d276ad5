"""Stdlib-only PNG codec (zlib + struct + numpy) for the multimodal
decode stage — this container has no image library, and the PNG format
(https://www.w3.org/TR/png-3/) is small enough to implement directly for
the subset a normalized-image pipeline needs:

- decode: 8-bit non-interlaced greyscale (color type 0) and truecolor
  (color type 2), all five scanline filters (None/Sub/Up/Average/Paeth),
  multi-IDAT, CRC-verified chunks. Anything else raises ValueError — a
  data error the decode stage maps to ``decode_ok=False``.
- encode: 8-bit greyscale, filter 0, one IDAT — enough to synthesize
  deterministic test corpora that any external PNG reader also accepts.

Reference analog: the per-record PIL image load + ``(255-img)/255``
normalize at /root/reference/Modules/utils.py:154-186; ``normalize``
reproduces that arithmetic exactly.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def encode_png(gray: np.ndarray) -> bytes:
    """8-bit greyscale [H, W] uint8 → PNG bytes (filter 0 rows)."""
    img = np.asarray(gray)
    if img.ndim != 2 or img.dtype != np.uint8:
        raise ValueError("encode_png expects a 2-D uint8 array")
    h, w = img.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    raw = b"".join(b"\x00" + img[r].tobytes() for r in range(h))
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )


def _unfilter(raw: bytes, h: int, w: int, channels: int) -> np.ndarray:
    bpp = channels
    stride = w * channels
    out = np.zeros((h, stride), dtype=np.uint8)
    pos = 0
    for r in range(h):
        ft = raw[pos]
        pos += 1
        line = np.frombuffer(raw[pos : pos + stride], dtype=np.uint8).astype(
            np.int32
        )
        pos += stride
        prev = out[r - 1].astype(np.int32) if r else np.zeros(stride, np.int32)
        if ft == 0:  # None
            cur = line
        elif ft == 2:  # Up
            cur = (line + prev) & 0xFF
        elif ft in (1, 3, 4):  # Sub / Average / Paeth need a left scan
            cur = np.zeros(stride, np.int32)
            for i in range(stride):
                a = cur[i - bpp] if i >= bpp else 0
                b = prev[i]
                if ft == 1:
                    cur[i] = (line[i] + a) & 0xFF
                elif ft == 3:
                    cur[i] = (line[i] + ((a + b) >> 1)) & 0xFF
                else:
                    c = prev[i - bpp] if i >= bpp else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    cur[i] = (line[i] + pr) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {ft}")
        out[r] = cur.astype(np.uint8)
    if channels == 1:
        return out
    return out.reshape(h, w, channels)


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes → uint8 array [H, W] (grey) or [H, W, 3] (RGB)."""
    if not data.startswith(_SIG):
        raise ValueError("not a PNG (bad signature)")
    pos = len(_SIG)
    ihdr = None
    idat = bytearray()
    while pos < len(data):
        if pos + 8 > len(data):
            raise ValueError("truncated PNG chunk header")
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if len(body) != length:
            raise ValueError("truncated PNG chunk body")
        (crc,) = struct.unpack(
            ">I", data[pos + 8 + length : pos + 12 + length]
        )
        if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {tag!r} CRC mismatch")
        pos += 12 + length
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif tag == b"IDAT":
            idat.extend(body)
        elif tag == b"IEND":
            break
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, ctype, comp, filt, interlace = ihdr
    if depth != 8:
        raise ValueError(f"unsupported PNG bit depth {depth}")
    if interlace:
        raise ValueError("interlaced PNG not supported")
    if ctype == 0:
        channels = 1
    elif ctype == 2:
        channels = 3
    else:
        raise ValueError(f"unsupported PNG color type {ctype}")
    raw = zlib.decompress(bytes(idat))
    if len(raw) != h * (1 + w * channels):
        raise ValueError("PNG pixel data length mismatch")
    return _unfilter(raw, h, w, channels)


def to_gray(img: np.ndarray) -> np.ndarray:
    """Fold an RGB [H, W, C] image to grey [H, W] by integer channel
    mean (exact-integer arithmetic so SQL oracles can recompute it);
    already-grey input passes through. The ONE definition every stage
    must use — decode_png can return either shape."""
    arr = np.asarray(img, dtype=np.int64)
    if arr.ndim == 3:
        arr = arr.sum(axis=2) // arr.shape[2]
    return arr


def normalize(img: np.ndarray) -> np.ndarray:
    """Reference normalization: ``(255 - img) / 255`` (ink=1, paper=0),
    exactly /root/reference/Modules/utils.py:184-186. RGB is folded to
    grey first by integer mean."""
    return ((255 - to_gray(img)) / 255.0).astype(np.float32)
