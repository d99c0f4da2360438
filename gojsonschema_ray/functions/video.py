"""Pure-python RIFF/AVI demuxing for the multimodal video stages — REAL
container parsing (chunk walk, nested LISTs, even-byte padding) with no
external media libraries. Frame PAYLOADS stay opaque bytes: decoding MJPEG
or other codecs inside the frames needs libjpeg/ffmpeg, which this container
does not ship (CodecUnavailable guards stay in stages/multimodal.py).

A minimal AVI writer is included so datagen/tests can synthesize
deterministic containers without any library round-trip.
"""

from __future__ import annotations

import struct

from ..stages.audio import CodecUnavailable


def _walk_chunks(blob: bytes, start: int, end: int):
    """Yield (fourcc, payload_start, payload_size) for chunks in
    [start, end); chunks are padded to even sizes."""
    i = start
    while i + 8 <= end:
        fourcc = blob[i:i + 4]
        size = struct.unpack_from("<I", blob, i + 4)[0]
        payload = i + 8
        if payload + size > end:
            raise CodecUnavailable("truncated AVI chunk")
        yield fourcc, payload, size
        i = payload + size + (size & 1)  # even-byte padding


def demux_avi_frames(blob: bytes, stream: int = 0) -> list[bytes]:
    """Video frames of `stream` from an AVI container: walks the RIFF tree,
    recurses into LIST chunks (movi may nest 'rec ' groups), and collects
    '##dc'/'##db' chunk payloads for the given stream number."""
    if len(blob) < 12 or blob[:4] != b"RIFF" or blob[8:12] != b"AVI ":
        raise CodecUnavailable("not an AVI (RIFF/'AVI ') container")
    total = struct.unpack_from("<I", blob, 4)[0]
    end = min(len(blob), 8 + total)
    want = (b"%02ddc" % stream, b"%02ddb" % stream)
    frames: list[bytes] = []

    def walk(lo: int, hi: int):
        for fourcc, off, size in _walk_chunks(blob, lo, hi):
            if fourcc == b"LIST":
                walk(off + 4, off + size)  # skip the 4-byte list type
            elif fourcc in want:
                frames.append(blob[off:off + size])

    walk(12, end)
    return frames


def encode_avi(frames: list[bytes], stream: int = 0) -> bytes:
    """Minimal AVI: RIFF('AVI ') containing a LIST('movi') of '##dc' chunks
    (no hdrl — enough for demuxers that walk chunks, incl. ours)."""
    body = b""
    fourcc = b"%02ddc" % stream
    for f in frames:
        body += fourcc + struct.pack("<I", len(f)) + f
        if len(f) & 1:
            body += b"\0"
    movi = b"LIST" + struct.pack("<I", 4 + len(body)) + b"movi" + body
    return b"RIFF" + struct.pack("<I", 4 + len(movi)) + b"AVI " + movi
