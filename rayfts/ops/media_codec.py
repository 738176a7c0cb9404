"""Pure-stdlib media codecs (PNG via zlib, WAV via struct) so the
multimodal stages have a REAL decode path in environments without
PIL/soundfile — which is what lets the driver hash-check decoded
dimensions and pixel/sample sums against a SQL oracle instead of
trusting a deterministic fake.

Scope (deliberately minimal, documented):

- PNG: 8-bit depth, color types 0 (gray), 2 (RGB), 6 (RGBA);
  non-interlaced; all five scanline filters on decode (our own encoder
  writes filter 0, so the vectorized fast path covers round-trips);
  ancillary chunks skipped. Anything else raises ``ValueError``.
- WAV: PCM 16-bit via the stdlib ``wave`` module (any rate/channels).
- resize: nearest-neighbor with ``src_index = (dst_index * src) // dst``
  — integer floor arithmetic, chosen precisely because a SQL oracle can
  reproduce it exactly with ``generate_series``.

PNG layout follows the public specification (RFC 2083); this is an
independent implementation, not derived from any codec library.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 6: 4}


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))


def encode_png(arr: np.ndarray) -> bytes:
    """uint8 array of shape (h, w) | (h, w, 3) | (h, w, 4) -> PNG bytes
    (filter 0 scanlines, one zlib stream)."""
    a = np.ascontiguousarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        ct, ch = 0, 1
        a = a[:, :, None]
    elif a.ndim == 3 and a.shape[2] == 3:
        ct, ch = 2, 3
    elif a.ndim == 3 and a.shape[2] == 4:
        ct, ch = 6, 4
    else:
        raise ValueError(f"unsupported image shape {arr.shape}")
    h, w = a.shape[:2]
    raw = np.empty((h, 1 + w * ch), dtype=np.uint8)
    raw[:, 0] = 0  # filter type 0 per scanline
    raw[:, 1:] = a.reshape(h, w * ch)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ct, 0, 0, 0)
    return (_PNG_SIG + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(raw.tobytes(), 6))
            + _chunk(b"IEND", b""))


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa_, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa_ <= pb and pa_ <= pc:
        return a
    return b if pb <= pc else c


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes -> uint8 array (h, w, channels). See module scope."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos, w = 8, None
    idat = []
    while pos + 8 <= len(data):
        (length,), tag = struct.unpack(">I", data[pos:pos + 4]), data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, depth, ct, comp, filt, interlace = struct.unpack(">IIBBBBB", body)
            if depth != 8 or ct not in _CHANNELS or interlace or comp or filt:
                raise ValueError(
                    f"unsupported PNG (depth={depth} color={ct} "
                    f"interlace={interlace})")
            ch = _CHANNELS[ct]
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"IEND":
            break
    if w is None or not idat:
        raise ValueError("truncated PNG (missing IHDR/IDAT)")
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), dtype=np.uint8)
    stride = 1 + w * ch
    if raw.size != h * stride:
        raise ValueError("PNG payload size mismatch")
    raw = raw.reshape(h, stride)
    filters = raw[:, 0]
    out = np.zeros((h, w * ch), dtype=np.uint8)
    if not filters.any():  # all filter 0 — vectorized fast path
        out[:] = raw[:, 1:]
        return out.reshape(h, w, ch)
    for y in range(h):
        line = raw[y, 1:].astype(np.int64)
        f = int(filters[y])
        prev = out[y - 1].astype(np.int64) if y else np.zeros(w * ch, np.int64)
        if f == 0:
            cur = line
        elif f == 2:  # Up — vectorized
            cur = (line + prev) & 0xFF
        elif f in (1, 3, 4):  # Sub/Average/Paeth — sequential in x
            cur = np.zeros(w * ch, dtype=np.int64)
            for x in range(w * ch):
                a = cur[x - ch] if x >= ch else 0
                b = prev[x]
                c = prev[x - ch] if x >= ch else 0
                if f == 1:
                    cur[x] = (line[x] + a) & 0xFF
                elif f == 3:
                    cur[x] = (line[x] + (a + b) // 2) & 0xFF
                else:
                    cur[x] = (line[x] + _paeth(int(a), int(b), int(c))) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {f}")
        out[y] = cur.astype(np.uint8)
    return out.reshape(h, w, ch)


def resize_nearest(arr: np.ndarray, tw: int, th: int) -> np.ndarray:
    """Nearest-neighbor resize with floor index mapping
    ``src = (dst * src_size) // dst_size`` — SQL-reproducible."""
    h, w = arr.shape[:2]
    ys = (np.arange(th, dtype=np.int64) * h) // th
    xs = (np.arange(tw, dtype=np.int64) * w) // tw
    return arr[ys][:, xs]


def encode_wav(samples: np.ndarray, sample_rate: int,
               n_channels: int = 1) -> bytes:
    """int16 sample array -> PCM-16 WAV bytes (stdlib ``wave``)."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(n_channels)
        f.setsampwidth(2)
        f.setframerate(sample_rate)
        f.writeframes(np.ascontiguousarray(samples, dtype="<i2").tobytes())
    return buf.getvalue()


def decode_wav(data: bytes) -> tuple[np.ndarray, int, int]:
    """WAV bytes -> (int16 samples [n_frames * n_channels], rate,
    n_channels)."""
    with wave.open(io.BytesIO(data), "rb") as f:
        if f.getsampwidth() != 2:
            raise ValueError(
                f"only PCM-16 supported (width {f.getsampwidth()})")
        frames = f.readframes(f.getnframes())
        return (np.frombuffer(frames, dtype="<i2"),
                f.getframerate(), f.getnchannels())


# ---------------------------------------------------------------------------
# AVI (RIFF, uncompressed RGB24 'DIB ') — the video analogue of the PNG
# path: a REAL container format written and parsed with stdlib struct
# only, so the video stage can decode genuine bytes in this environment.
# Layout follows the public AVI RIFF specification (msdn AVI RIFF File
# Reference): BITMAPINFOHEADER frames are stored bottom-up, BGR byte
# order, rows padded to 4 bytes. Scope: one 24-bit uncompressed video
# stream ('00db' chunks); anything else raises ValueError.
# ---------------------------------------------------------------------------


def encode_avi(frames: np.ndarray, fps: int = 10) -> bytes:
    """``frames``: (n, h, w, 3) uint8 RGB -> uncompressed AVI bytes."""
    frames = np.asarray(frames, dtype=np.uint8)
    if frames.ndim != 4 or frames.shape[3] != 3:
        raise ValueError(f"expected (n, h, w, 3) RGB frames, got {frames.shape}")
    n, h, w, _ = frames.shape
    row_bytes = (w * 3 + 3) & ~3
    frame_bytes = row_bytes * h

    # RGB top-down -> BGR bottom-up with row padding
    def dib(f: np.ndarray) -> bytes:
        rows = np.zeros((h, row_bytes), dtype=np.uint8)
        rows[:, : w * 3] = f[::-1, :, ::-1].reshape(h, w * 3)
        return rows.tobytes()

    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        1_000_000 // fps, frame_bytes * fps, 0, 0x10,  # AVIF_HASINDEX
        n, 0, 1, frame_bytes, w, h, 0, 0, 0, 0)
    strh = struct.pack(
        "<4s4sIHHIIIIIIIIhhhh",
        b"vids", b"DIB ", 0, 0, 0, 0, 1, fps, 0, n,
        frame_bytes, 0xFFFFFFFF, 0, 0, 0, w, h)
    strf = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, frame_bytes, 0, 0, 0, 0)

    def chunk(tag: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) % 2 else b""
        return tag + struct.pack("<I", len(body)) + body + pad

    def lst(kind: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", kind + body)

    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi_body = b"".join(chunk(b"00db", dib(f)) for f in frames)
    movi = lst(b"movi", movi_body)
    idx = b"".join(
        struct.pack("<4sIII", b"00db", 0x10,
                    4 + i * (8 + frame_bytes + (frame_bytes % 2)),
                    frame_bytes)
        for i in range(n))
    body = b"AVI " + hdrl + movi + chunk(b"idx1", idx)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_avi(data: bytes) -> np.ndarray:
    """AVI bytes -> (n, h, w, 3) uint8 RGB frames."""
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not an AVI RIFF file")

    def chunks(buf: bytes, pos: int, end: int):
        while pos + 8 <= end:
            tag = buf[pos:pos + 4]
            (size,) = struct.unpack_from("<I", buf, pos + 4)
            yield tag, pos + 8, size
            pos += 8 + size + (size % 2)

    w = h = bitcount = None
    vids_stream = None  # stream index of the FIRST 'vids' strl
    frames = []
    for tag, off, size in chunks(data, 12, len(data)):
        if tag != b"LIST":
            continue
        kind = data[off:off + 4]
        if kind == b"hdrl":
            stream_idx = -1
            for t2, o2, s2 in chunks(data, off + 4, off + size):
                if t2 == b"LIST" and data[o2:o2 + 4] == b"strl":
                    stream_idx += 1
                    is_vids = False
                    for t3, o3, s3 in chunks(data, o2 + 4, o2 + s2):
                        if t3 == b"strh":
                            is_vids = data[o3:o3 + 4] == b"vids"
                        elif (t3 == b"strf" and is_vids
                              and vids_stream is None):
                            (_sz, w, h, _planes, bitcount) = struct.unpack_from(
                                "<IiiHH", data, o3)
                            vids_stream = stream_idx
        elif kind == b"movi":
            if vids_stream is None:
                raise ValueError("no video ('vids') stream in AVI header")
            want = (b"%02ddb" % vids_stream, b"%02ddc" % vids_stream)
            for t2, o2, s2 in chunks(data, off + 4, off + size):
                if t2 in want:
                    frames.append((o2, s2))
    if w is None or not frames:
        raise ValueError("no video stream found")
    if bitcount != 24:
        raise ValueError(f"only 24-bit uncompressed AVI supported, got {bitcount}")
    row_bytes = (w * 3 + 3) & ~3
    out = np.empty((len(frames), h, w, 3), dtype=np.uint8)
    for i, (o, s) in enumerate(frames):
        if s < row_bytes * h:
            raise ValueError("truncated frame")
        rows = np.frombuffer(data, dtype=np.uint8, count=row_bytes * h,
                             offset=o).reshape(h, row_bytes)
        out[i] = rows[:, : w * 3].reshape(h, w, 3)[::-1, :, ::-1]
    return out
