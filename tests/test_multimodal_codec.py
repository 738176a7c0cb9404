"""Pure-stdlib media codecs (rayfts/ops/media_codec.py) and the real
stdlib decode branches of the multimodal stages: PNG/WAV round trips,
scanline unfiltering, nearest-resize floor mapping, and the
closed-form fixtures the driver oracles recompute in SQL."""

import struct
import zlib

import numpy as np
import pyarrow as pa
import pytest

from rayfts.ops.media_codec import (decode_png, decode_wav, encode_png,
                                    encode_wav, resize_nearest)


def test_png_round_trip_all_color_types():
    rng = np.random.default_rng(7)
    for shape in [(17, 23), (9, 5, 3), (12, 8, 4), (1, 1, 3), (2, 300, 3)]:
        a = rng.integers(0, 256, shape, dtype=np.uint8)
        b = decode_png(encode_png(a))
        assert b.shape[:2] == a.shape[:2]
        assert (b.squeeze() == a.squeeze()).all()


def _hand_png(w, h, ch, scanlines):
    """Assemble a PNG from pre-filtered scanlines (filter_byte, data)."""
    ct = {1: 0, 3: 2, 4: 6}[ch]
    raw = b"".join(bytes([f]) + bytes(d) for f, d in scanlines)
    sig = b"\x89PNG\r\n\x1a\n"

    def chunk(tag, body):
        return (struct.pack(">I", len(body)) + tag + body
                + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ct, 0, 0, 0)
    return (sig + chunk(b"IHDR", ihdr) + chunk(b"IDAT", zlib.compress(raw))
            + chunk(b"IEND", b""))


def test_png_unfilter_sub_up_avg_paeth():
    # 2x3 grayscale, target pixel rows [10,20,30] then [40,50,60]
    want = np.array([[10, 20, 30], [40, 50, 60]], dtype=np.uint8)
    cases = [
        # Sub: raw = cur - left
        [(1, [10, 10, 10]), (1, [40, 10, 10])],
        # Up (row 2): raw = cur - above
        [(0, [10, 20, 30]), (2, [30, 30, 30])],
        # Average: raw = cur - (left + above)//2
        [(3, [10, 15, 20]), (3, [35, 20, 20])],
        # Paeth: predictor of (left, above, upper-left)
        [(4, [10, 10, 10]), (4, [30, 10, 10])],
    ]
    for scanlines in cases:
        got = decode_png(_hand_png(3, 2, 1, scanlines))
        assert (got.squeeze() == want).all(), scanlines


def test_png_rejects_garbage_and_unsupported():
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"JFIF not a png")
    # 16-bit depth header
    bad = bytearray(encode_png(np.zeros((2, 2), np.uint8)))
    bad[24] = 16  # depth byte inside IHDR
    with pytest.raises(ValueError):
        decode_png(bytes(bad))


def test_wav_round_trip_and_props():
    rng = np.random.default_rng(3)
    s = rng.integers(-32768, 32768, 1234).astype(np.int16)
    d, sr, ch = decode_wav(encode_wav(s, 22050))
    assert sr == 22050 and ch == 1 and (d == s).all()


def test_resize_floor_mapping():
    rng = np.random.default_rng(5)
    a = rng.integers(0, 256, (10, 14, 3), dtype=np.uint8)
    r = resize_nearest(a, 8, 6)
    assert r.shape == (6, 8, 3)
    for y in range(6):
        for x in range(8):
            assert (r[y, x] == a[(y * 10) // 6, (x * 14) // 8]).all()


def test_stdlib_stages_real_decode(ray_session):
    """DecodeImage / ResizeImage / DecodeAudio with fake=False and no
    PIL/soundfile: the stdlib codec path must report exactly the
    closed-form dims and pixel/sample sums of the synthetic fixtures."""
    import ray

    from rayfts.ops.multimodal import (DecodeAudio, DecodeImage,
                                       ResizeImage, decode_pipeline,
                                       synth_png_table, synth_wav_table)

    n = 12
    ds = ray.data.from_arrow(synth_png_table(n))
    out = sorted(decode_pipeline(ds, DecodeImage, fake=False).take_all(),
                 key=lambda r: r["media_id"])
    for i, r in enumerate(out):
        w, h = 16 + i % 13, 16 + (i * 7) % 11
        assert (r["width"], r["height"], r["channels"]) == (w, h, 3)
        x, y, c = np.arange(w), np.arange(h), np.arange(3)
        exp = ((x[None, :, None] * 3 + y[:, None, None] * 5
                + c[None, None, :] * 7 + i) % 256).sum()
        assert r["pixel_sum"] == exp

    # resize -> decode chain: 8x8 nearest with floor mapping
    resized = decode_pipeline(ray.data.from_arrow(synth_png_table(n)),
                              ResizeImage, fake=False, target=8)
    out2 = sorted(decode_pipeline(resized, DecodeImage, fake=False).take_all(),
                  key=lambda r: r["media_id"])
    for i, r in enumerate(out2):
        w, h = 16 + i % 13, 16 + (i * 7) % 11
        xs = (np.arange(8) * w) // 8
        ys = (np.arange(8) * h) // 8
        c = np.arange(3)
        exp = ((xs[None, :, None] * 3 + ys[:, None, None] * 5
                + c[None, None, :] * 7 + i) % 256).sum()
        assert (r["width"], r["height"]) == (8, 8)
        assert r["pixel_sum"] == exp

    audio = sorted(
        decode_pipeline(ray.data.from_arrow(synth_wav_table(n)),
                        DecodeAudio, fake=False).take_all(),
        key=lambda r: r["media_id"])
    for i, r in enumerate(audio):
        cnt = 500 + (i * 13) % 300
        t = np.arange(cnt, dtype=np.int64)
        assert r["n_samples"] == cnt
        assert r["sample_rate"] == 8000 + 100 * (i % 8)
        assert r["n_channels"] == 1
        assert r["sample_sum"] == int((((t * 31 + i * 17) % 65536) - 32768).sum())


def test_avi_round_trip_with_padding():
    """Odd widths exercise the 4-byte row padding and BGR bottom-up
    conversion both ways."""
    from rayfts.ops.media_codec import decode_avi, encode_avi

    rng = np.random.default_rng(7)
    for n, h, w in [(1, 16, 16), (4, 17, 21), (6, 9, 13)]:
        frames = rng.integers(0, 256, (n, h, w, 3), dtype=np.uint8)
        rt = decode_avi(encode_avi(frames))
        assert rt.shape == frames.shape
        assert (rt == frames).all()


def test_avi_rejects_non_avi_and_wrong_depth():
    from rayfts.ops.media_codec import decode_avi, encode_avi

    with pytest.raises(ValueError):
        decode_avi(b"RIFF\x00\x00\x00\x00WAVE")
    with pytest.raises(ValueError):
        encode_avi(np.zeros((2, 4, 4), dtype=np.uint8))  # missing channels


def test_video_frame_sums_stage_real_bytes(ray_session):
    """The stage decodes genuine AVI containers and reports exact
    per-frame pixel sums matching the closed-form fixture."""
    import ray.data

    from rayfts.ops.multimodal import (VideoFrameSums, decode_pipeline,
                                       synth_avi_table)

    t = synth_avi_table(6)
    out = decode_pipeline(ray.data.from_arrow(t), VideoFrameSums,
                          fake=False, n_frames=3).take_all()
    assert len(out) == 6
    for r in out:
        i = r["media_id"]
        nf, w, h = 4 + i % 3, 16 + i % 5, 16 + (i * 3) % 7
        assert r["n_frames_total"] == nf
        assert (r["width"], r["height"]) == (w, h)
        step = max(1, nf // 3)
        for j, got in enumerate(r["frame_sums"]):
            f = min(j * step, nf - 1)
            xs = np.arange(w)[None, :, None]
            ys = np.arange(h)[:, None, None]
            cs = np.arange(3)[None, None, :]
            want = int(((xs * 3 + ys * 5 + cs * 7 + f * 11 + i) % 256).sum())
            assert got == want, (i, j)


def test_avi_multi_stream_selects_vids():
    """A non-video strl before the video stream must not confuse the
    decoder: frames come from the 'vids' stream's chunk id only."""
    import struct

    from rayfts.ops.media_codec import decode_avi, encode_avi

    rng = np.random.default_rng(3)
    frames = rng.integers(0, 256, (2, 16, 16, 3), dtype=np.uint8)
    avi = bytearray(encode_avi(frames))

    # splice a fake AUDIO strl BEFORE the video strl inside hdrl and
    # '01wb' junk chunks into movi, renumbering the video stream to 01
    def chunk(tag, body):
        pad = b"\x00" if len(body) % 2 else b""
        return tag + struct.pack("<I", len(body)) + body + pad

    auds_strh = struct.pack("<4s4sIHHIIIIIIIIhhhh", b"auds", b"\x00" * 4,
                            0, 0, 0, 0, 1, 8000, 0, 100, 0, 0, 0, 0, 0, 0, 0)
    auds_strl = chunk(b"LIST", b"strl" + chunk(b"strh", auds_strh)
                      + chunk(b"strf", b"\x01\x00\x01\x00" * 4))
    raw = bytes(avi)
    # stream renumber: video chunks become 01db
    raw = raw.replace(b"00db", b"01db")
    i = raw.index(b"strl")  # first (video) strl body start
    # insert the audio strl LIST right before the video one
    lst_start = raw.rindex(b"LIST", 0, i)
    patched = raw[:lst_start] + auds_strl + raw[lst_start:]
    # grow the enclosing hdrl LIST and RIFF sizes
    patched = bytearray(patched)
    (riff_sz,) = struct.unpack_from("<I", patched, 4)
    struct.pack_into("<I", patched, 4, riff_sz + len(auds_strl))
    hdrl_at = bytes(patched).index(b"hdrl")
    (hdrl_sz,) = struct.unpack_from("<I", patched, hdrl_at - 4)
    struct.pack_into("<I", patched, hdrl_at - 4, hdrl_sz + len(auds_strl))
    out = decode_avi(bytes(patched))
    assert out.shape == frames.shape
    assert (out == frames).all()
