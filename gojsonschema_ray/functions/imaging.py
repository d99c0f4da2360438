"""Pure-numpy image codecs for the multimodal stages — REAL decoders for the
uncompressed formats (binary PPM/PGM, uncompressed 24/32-bit BMP), no
external imaging libraries required. Compressed codecs (JPEG/PNG) still need
Pillow and stay behind the CodecUnavailable guard in stages/multimodal.py.

Encoders are provided too so datagen/tests can synthesize deterministic
payloads without any library round-trip.
"""

from __future__ import annotations

import struct

import numpy as np

from ..stages.audio import CodecUnavailable


# ---------------------------------------------------------------------------
# PPM (P6) / PGM (P5) — netpbm binary formats
# ---------------------------------------------------------------------------
def _pnm_tokens(blob: bytes, n: int) -> tuple[list[int], int]:
    """First n ASCII integer tokens after the magic, honoring '#' comments.
    Returns (values, offset_of_binary_payload)."""
    vals: list[int] = []
    i = 2  # past magic
    cur = b""
    while len(vals) < n:
        if i >= len(blob):
            raise CodecUnavailable("truncated PNM header")
        c = blob[i:i + 1]
        if c == b"#":  # comment to end of line (also terminates a token)
            if cur:
                vals.append(int(cur))
                cur = b""
            while i < len(blob) and blob[i:i + 1] not in (b"\n", b"\r"):
                i += 1
            if len(vals) >= n:
                # comment directly after the last header token: its
                # terminating line end is the single separator — consume a
                # CRLF pair as ONE unit so the payload isn't shifted a byte
                if blob[i:i + 2] == b"\r\n":
                    return vals, i + 2
                return vals, i + 1
            continue
        if c in b" \t\r\n":
            if cur:
                vals.append(int(cur))
                cur = b""
            i += 1
            continue
        if not c.isdigit():
            raise CodecUnavailable(f"bad PNM header byte {c!r}")
        cur += c
        i += 1
    # exactly ONE whitespace byte separates the last header token from data
    return vals, i


def decode_pnm(blob: bytes) -> np.ndarray:
    """P6 (RGB) / P5 (gray) → (h, w, 3) / (h, w, 1) uint8."""
    magic = blob[:2]
    if magic not in (b"P6", b"P5"):
        raise CodecUnavailable(f"not a binary PNM: magic {magic!r}")
    channels = 3 if magic == b"P6" else 1
    (w, h, maxval), off = _pnm_tokens(blob, 3)
    if maxval <= 0 or maxval > 255:
        raise CodecUnavailable(f"unsupported PNM maxval {maxval}")
    need = h * w * channels
    if len(blob) - off < need:
        raise CodecUnavailable("truncated PNM payload")
    data = np.frombuffer(blob, dtype=np.uint8, count=need, offset=off)
    return data.reshape(h, w, channels)


def encode_pnm(img: np.ndarray) -> bytes:
    """(h, w, 1|3) uint8 → binary PGM/PPM."""
    h, w, c = img.shape
    magic = b"P6" if c == 3 else b"P5"
    header = magic + b"\n%d %d\n255\n" % (w, h)
    return header + np.ascontiguousarray(img, dtype=np.uint8).tobytes()


# ---------------------------------------------------------------------------
# BMP — uncompressed (BI_RGB) 24/32-bit, BITMAPINFOHEADER
# ---------------------------------------------------------------------------
def decode_bmp(blob: bytes) -> np.ndarray:
    """Uncompressed 24/32-bit BMP → (h, w, 3) uint8 RGB (bottom-up rows
    flipped, BGR→RGB, 4-byte row padding stripped)."""
    if blob[:2] != b"BM" or len(blob) < 54:
        raise CodecUnavailable("not a BMP")
    data_off = struct.unpack_from("<I", blob, 10)[0]
    hdr_size = struct.unpack_from("<I", blob, 14)[0]
    if hdr_size < 40:
        raise CodecUnavailable(f"unsupported BMP header size {hdr_size}")
    w, h_raw = struct.unpack_from("<ii", blob, 18)
    bpp = struct.unpack_from("<H", blob, 28)[0]
    compression = struct.unpack_from("<I", blob, 30)[0]
    if compression != 0 or bpp not in (24, 32):
        raise CodecUnavailable(
            f"unsupported BMP: {bpp} bpp, compression {compression}")
    bottom_up = h_raw > 0
    h = abs(h_raw)
    bytes_pp = bpp // 8
    stride = (w * bytes_pp + 3) & ~3
    need = data_off + stride * h
    if len(blob) < need:
        raise CodecUnavailable("truncated BMP payload")
    rows = np.frombuffer(blob, dtype=np.uint8, count=stride * h,
                         offset=data_off).reshape(h, stride)
    px = rows[:, :w * bytes_pp].reshape(h, w, bytes_pp)
    rgb = px[:, :, 2::-1]  # BGR(A) → RGB
    if bottom_up:
        rgb = rgb[::-1]
    return np.ascontiguousarray(rgb)


def encode_bmp(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB → 24-bit bottom-up BI_RGB BMP."""
    h, w, c = img.shape
    assert c == 3
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, :w * 3] = img[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up, BGR
    data = rows.tobytes()
    file_size = 54 + len(data)
    header = (b"BM" + struct.pack("<IHHI", file_size, 0, 0, 54)
              + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data),
                            2835, 2835, 0, 0))
    return header + data


def decode_image(blob: bytes) -> np.ndarray:
    """Magic-sniffing decode: PPM/PGM/BMP natively; anything else raises
    CodecUnavailable (JPEG/PNG need Pillow)."""
    if not blob or len(blob) < 2:
        raise CodecUnavailable("empty image payload")
    if blob[:2] in (b"P6", b"P5"):
        return decode_pnm(blob)
    if blob[:2] == b"BM":
        return decode_bmp(blob)
    raise CodecUnavailable(f"unsupported image magic {blob[:2]!r}")
