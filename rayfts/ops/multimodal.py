"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by actor-pool ``map_batches``
stages.

Each stage loads its decoder library once per actor in ``__init__``:
with the library present (and ``fake=False``) the REAL kernel runs
(PIL decode/resize, soundfile frames, av key frames). Image, audio AND
video stages additionally carry a REAL pure-stdlib codec path
(``rayfts.ops.media_codec``: PNG via zlib, WAV via the ``wave``
module, uncompressed RIFF/AVI via struct) used when the library is
absent — so ``fake=False`` genuinely decodes bytes even in
library-less environments like this one, and the driver hash-checks
decoded dims + pixel/sample/frame sums against SQL oracles.
``VideoFrameSample`` digests real stdlib-decoded AVI frames too (the
``frame_digest`` hex convention keeps even digests SQL-checkable);
``VideoFrameSums`` is the sums flavor. No stage requires the fake path
in this environment. Real library branches are covered by
``pytest.importorskip``-guarded tests that activate wherever the
libraries exist.

At 100 TB the shapes matter: binary payloads make wide rows, so these
stages run with small ``batch_size`` and bounded ``concurrency`` and emit
fixed-size feature columns (never re-emitting the payload unless asked).
"""

from __future__ import annotations

import hashlib
import io

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("media_type", pa.string()),  # "image" | "audio" | "video"
    ("payload", pa.binary()),
    ("meta_json", pa.string()),
])


def synth_media_table(n: int, kind: str = "image", seed: int = 42) -> pa.Table:
    """Deterministic fake payloads for tests/benches (seed-fixed bytes)."""
    rng = np.random.default_rng(seed)
    payloads = [rng.integers(0, 256, size=int(rng.integers(256, 2048)),
                             dtype=np.uint8).tobytes() for _ in range(n)]
    return pa.table({
        "media_id": pa.array(range(n), type=pa.int64()),
        "media_type": pa.array([kind] * n, type=pa.string()),
        "payload": pa.array(payloads, type=pa.binary()),
        "meta_json": pa.array(["{}"] * n, type=pa.string()),
    })


def synth_png_table(n: int) -> pa.Table:
    """REAL PNG payloads with closed-form pixels, so a SQL oracle can
    recompute what a correct decode must report: image ``i`` is
    ``w = 16 + i % 13``, ``h = 16 + (i*7) % 11``, RGB with
    ``pixel[y, x, c] = (x*3 + y*5 + c*7 + i) % 256``."""
    from rayfts.ops.media_codec import encode_png

    payloads = []
    for i in range(n):
        w, h = 16 + i % 13, 16 + (i * 7) % 11
        x = np.arange(w, dtype=np.int64)
        y = np.arange(h, dtype=np.int64)
        c = np.arange(3, dtype=np.int64)
        px = (x[None, :, None] * 3 + y[:, None, None] * 5
              + c[None, None, :] * 7 + i) % 256
        payloads.append(encode_png(px.astype(np.uint8)))
    return pa.table({
        "media_id": pa.array(range(n), type=pa.int64()),
        "media_type": pa.array(["image"] * n, type=pa.string()),
        "payload": pa.array(payloads, type=pa.binary()),
        "meta_json": pa.array(["{}"] * n, type=pa.string()),
    })


def synth_wav_table(n: int) -> pa.Table:
    """REAL PCM-16 WAV payloads with closed-form samples: clip ``i`` is
    mono, ``rate = 8000 + 100*(i % 8)``, ``n = 500 + (i*13) % 300``
    samples of ``s[t] = ((t*31 + i*17) % 65536) - 32768``."""
    from rayfts.ops.media_codec import encode_wav

    payloads = []
    for i in range(n):
        t = np.arange(500 + (i * 13) % 300, dtype=np.int64)
        s = ((t * 31 + i * 17) % 65536) - 32768
        payloads.append(encode_wav(s.astype(np.int16), 8000 + 100 * (i % 8)))
    return pa.table({
        "media_id": pa.array(range(n), type=pa.int64()),
        "media_type": pa.array(["audio"] * n, type=pa.string()),
        "payload": pa.array(payloads, type=pa.binary()),
        "meta_json": pa.array(["{}"] * n, type=pa.string()),
    })


def synth_avi_table(n: int) -> pa.Table:
    """REAL uncompressed-AVI payloads with closed-form pixels: clip ``i``
    has ``nf = 4 + i % 3`` frames of ``w = 16 + i % 5``,
    ``h = 16 + (i*3) % 7``, RGB with
    ``pixel[f][y, x, c] = (x*3 + y*5 + c*7 + f*11 + i) % 256``."""
    from rayfts.ops.media_codec import encode_avi

    payloads = []
    for i in range(n):
        nf, w, h = 4 + i % 3, 16 + i % 5, 16 + (i * 3) % 7
        f = np.arange(nf, dtype=np.int64)
        x = np.arange(w, dtype=np.int64)
        y = np.arange(h, dtype=np.int64)
        c = np.arange(3, dtype=np.int64)
        px = (x[None, None, :, None] * 3 + y[None, :, None, None] * 5
              + c[None, None, None, :] * 7 + f[:, None, None, None] * 11
              + i) % 256
        payloads.append(encode_avi(px.astype(np.uint8)))
    return pa.table({
        "media_id": pa.array(range(n), type=pa.int64()),
        "media_type": pa.array(["video"] * n, type=pa.string()),
        "payload": pa.array(payloads, type=pa.binary()),
        "meta_json": pa.array(["{}"] * n, type=pa.string()),
    })


class _MediaStage:
    """Base actor-pool stage: real decoder loaded once per actor in
    __init__ when available; stdlib codec real path where one exists
    (``has_stdlib_codec``); deterministic fake only on request."""

    lib_name: str | None = None
    has_stdlib_codec: bool = False

    def __init__(self, fake: bool = False, drop_payload: bool = True):
        self.fake = fake
        self.drop_payload = drop_payload
        self.lib = None
        if self.lib_name:
            try:
                self.lib = __import__(self.lib_name)
            except ImportError:
                self.lib = None
        if self.lib is None and not fake and not self.has_stdlib_codec:
            raise NotImplementedError(
                f"{type(self).__name__}: {self.lib_name!r} not available in this "
                "environment; pass fake=True for the deterministic stub"
            )

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.fake:
            return self._call_fake(batch)
        if self.lib is not None:
            return self._call_real(batch)
        return self._call_stdlib(batch)

    def _call_real(self, batch: pa.Table) -> pa.Table:  # pragma: no cover - lib-gated
        raise NotImplementedError

    def _call_stdlib(self, batch: pa.Table) -> pa.Table:
        raise NotImplementedError

    def _call_fake(self, batch: pa.Table) -> pa.Table:
        raise NotImplementedError

    def _finish(self, batch: pa.Table, cols: dict[str, pa.Array]) -> pa.Table:
        for name, arr in cols.items():
            if name in batch.column_names:  # chained stages overwrite
                batch = batch.drop_columns([name])
            batch = batch.append_column(name, arr)
        if self.drop_payload and "payload" in batch.column_names:
            batch = batch.drop_columns(["payload"])
        return batch


def _pil_image(lib):  # pragma: no cover - lib-gated
    import importlib

    return importlib.import_module("PIL.Image")


class DecodeImage(_MediaStage):
    """payload -> (width, height, channels, pixel_sum). Real path
    decodes with PIL; stdlib path decodes PNG bytes with
    ``media_codec.decode_png`` (zlib — a genuine decode, so the driver
    oracle on pixel_sum proves the codec); FAKE path derives everything
    from a payload digest."""

    lib_name = "PIL"
    has_stdlib_codec = True

    def _out(self, batch, ws, hs, cs, sums):
        return self._finish(batch, {
            "width": pa.array(ws, type=pa.int32()),
            "height": pa.array(hs, type=pa.int32()),
            "channels": pa.array(cs, type=pa.int32()),
            "pixel_sum": pa.array(sums, type=pa.int64()),
        })

    def _call_real(self, batch: pa.Table) -> pa.Table:  # pragma: no cover - lib-gated
        Image = _pil_image(self.lib)
        ws, hs, cs, sums = [], [], [], []
        for payload in batch["payload"].to_pylist():
            with Image.open(io.BytesIO(payload)) as im:
                ws.append(im.width)
                hs.append(im.height)
                cs.append(len(im.getbands()))
                sums.append(int(np.asarray(im, dtype=np.int64).sum()))
        return self._out(batch, ws, hs, cs, sums)

    def _call_stdlib(self, batch: pa.Table) -> pa.Table:
        from rayfts.ops.media_codec import decode_png

        ws, hs, cs, sums = [], [], [], []
        for payload in batch["payload"].to_pylist():
            arr = decode_png(payload)
            hs.append(arr.shape[0])
            ws.append(arr.shape[1])
            cs.append(arr.shape[2])
            sums.append(int(arr.astype(np.int64).sum()))
        return self._out(batch, ws, hs, cs, sums)

    def _call_fake(self, batch: pa.Table) -> pa.Table:
        ws, hs, cs, sums = [], [], [], []
        for payload in batch["payload"].to_pylist():
            d = hashlib.sha256(payload or b"").digest()
            ws.append(64 + d[0] % 192)
            hs.append(64 + d[1] % 192)
            cs.append(3)
            sums.append(int.from_bytes(d[2:6], "big"))
        return self._out(batch, ws, hs, cs, sums)


class ImageFeatures(_MediaStage):
    """payload -> fixed 16-dim feature vector. Real path: grayscale 4x4
    thumbnail, normalized pixels; FAKE path: normalized sha256 bytes."""

    lib_name = "PIL"
    has_stdlib_codec = True
    DIM = 16

    def _call_real(self, batch: pa.Table) -> pa.Table:  # pragma: no cover - lib-gated
        Image = _pil_image(self.lib)
        feats = []
        for payload in batch["payload"].to_pylist():
            with Image.open(io.BytesIO(payload)) as im:
                small = im.convert("L").resize((4, 4))
                v = np.asarray(small, dtype=np.float32).reshape(self.DIM)
            v = v / (np.linalg.norm(v) or 1.0)
            feats.append(v.tolist())
        return self._finish(batch, {
            "features": pa.array(feats, type=pa.list_(pa.float32(), self.DIM)),
        })

    def _call_stdlib(self, batch: pa.Table) -> pa.Table:
        """PNG decode -> integer BT.601 luma -> nearest 4x4 -> L2 norm.
        Real pixels end-to-end; only the resample kernel differs from
        the PIL branch."""
        from rayfts.ops.media_codec import decode_png, resize_nearest

        feats = []
        for payload in batch["payload"].to_pylist():
            arr = decode_png(payload).astype(np.int64)
            if arr.shape[2] >= 3:
                luma = (299 * arr[:, :, 0] + 587 * arr[:, :, 1]
                        + 114 * arr[:, :, 2]) // 1000
            else:
                luma = arr[:, :, 0]
            v = resize_nearest(luma, 4, 4).astype(np.float32).reshape(self.DIM)
            v = v / (np.linalg.norm(v) or 1.0)
            feats.append(v.tolist())
        return self._finish(batch, {
            "features": pa.array(feats, type=pa.list_(pa.float32(), self.DIM)),
        })

    def _call_fake(self, batch: pa.Table) -> pa.Table:
        feats = []
        for payload in batch["payload"].to_pylist():
            d = hashlib.sha256(payload or b"").digest()
            v = np.frombuffer(d[: self.DIM], dtype=np.uint8).astype(np.float32)
            v = v / (np.linalg.norm(v) or 1.0)
            feats.append(v.tolist())
        return self._finish(batch, {
            "features": pa.array(feats, type=pa.list_(pa.float32(), self.DIM)),
        })


class AudioFrameSample(_MediaStage):
    """payload -> sampled frame offsets. Real path reads with soundfile
    and reports sample indices; FAKE path uses byte offsets."""

    lib_name = "soundfile"

    def __init__(self, stride: int = 512, n_frames: int = 4, **kw):
        super().__init__(**kw)
        self.stride = stride
        self.n_frames = n_frames

    def _call_real(self, batch: pa.Table) -> pa.Table:  # pragma: no cover - lib-gated
        offs = []
        for payload in batch["payload"].to_pylist():
            data, _sr = self.lib.read(io.BytesIO(payload))
            n = len(data)
            offs.append([min(i * self.stride, max(n - 1, 0)) for i in range(self.n_frames)])
        return self._finish(batch, {
            "frame_offsets": pa.array(offs, type=pa.list_(pa.int64())),
        })

    def _call_fake(self, batch: pa.Table) -> pa.Table:
        offs = []
        for payload in batch["payload"].to_pylist():
            ln = len(payload or b"")
            offs.append([min(i * self.stride, max(ln - 1, 0)) for i in range(self.n_frames)])
        return self._finish(batch, {
            "frame_offsets": pa.array(offs, type=pa.list_(pa.int64())),
        })


class ResizeImage(_MediaStage):
    """payload -> resized payload + new dims. Real path decodes, resizes
    with PIL and re-encodes PNG; FAKE path re-digests the payload down to
    ``target*target*3`` deterministic bytes. Emits the payload because
    resize is a payload TRANSFORM — callers chain ``drop_payload`` stages
    after it; batch sizing stays small for the wide rows."""

    lib_name = "PIL"
    has_stdlib_codec = True

    def __init__(self, target: int = 64, **kw):
        kw.setdefault("drop_payload", False)
        super().__init__(**kw)
        self.target = target

    def _call_stdlib(self, batch: pa.Table) -> pa.Table:
        """Real PNG -> nearest-neighbor resize -> real PNG re-encode
        (floor index mapping; see media_codec.resize_nearest)."""
        from rayfts.ops.media_codec import (decode_png, encode_png,
                                            resize_nearest)

        out = []
        for payload in batch["payload"].to_pylist():
            arr = resize_nearest(decode_png(payload), self.target, self.target)
            out.append(encode_png(arr))
        batch = batch.drop_columns(["payload"])
        return self._finish(batch, {
            "payload": pa.array(out, type=pa.binary()),
            "width": pa.array([self.target] * batch.num_rows, type=pa.int32()),
            "height": pa.array([self.target] * batch.num_rows, type=pa.int32()),
        })

    def _call_real(self, batch: pa.Table) -> pa.Table:  # pragma: no cover - lib-gated
        Image = _pil_image(self.lib)
        out = []
        for payload in batch["payload"].to_pylist():
            with Image.open(io.BytesIO(payload)) as im:
                small = im.resize((self.target, self.target))
                buf = io.BytesIO()
                small.save(buf, format="PNG")
                out.append(buf.getvalue())
        batch = batch.drop_columns(["payload"])
        return self._finish(batch, {
            "payload": pa.array(out, type=pa.binary()),
            "width": pa.array([self.target] * batch.num_rows, type=pa.int32()),
            "height": pa.array([self.target] * batch.num_rows, type=pa.int32()),
        })

    def _call_fake(self, batch: pa.Table) -> pa.Table:
        out = []
        need = self.target * self.target * 3
        for payload in batch["payload"].to_pylist():
            seed = hashlib.sha256(payload or b"").digest()
            reps = -(-need // len(seed))
            out.append((seed * reps)[:need])
        batch = batch.drop_columns(["payload"])
        return self._finish(batch, {
            "payload": pa.array(out, type=pa.binary()),
            "width": pa.array([self.target] * batch.num_rows, type=pa.int32()),
            "height": pa.array([self.target] * batch.num_rows, type=pa.int32()),
        })


class DecodeAudio(_MediaStage):
    """payload -> (n_samples, sample_rate, n_channels, sample_sum).
    Real path reads with soundfile; stdlib path decodes PCM-16 WAV with
    the ``wave`` module (a genuine decode — the driver oracle on
    sample_sum proves it); FAKE path digests."""

    lib_name = "soundfile"
    has_stdlib_codec = True

    def _out(self, batch, ns, srs, chs, sums):
        return self._finish(batch, {
            "n_samples": pa.array(ns, type=pa.int64()),
            "sample_rate": pa.array(srs, type=pa.int32()),
            "n_channels": pa.array(chs, type=pa.int32()),
            "sample_sum": pa.array(sums, type=pa.int64()),
        })

    def _call_real(self, batch: pa.Table) -> pa.Table:  # pragma: no cover - lib-gated
        ns, srs, chs, sums = [], [], [], []
        for payload in batch["payload"].to_pylist():
            data, sr = self.lib.read(io.BytesIO(payload), dtype="int16",
                                     always_2d=True)
            ns.append(int(data.size))
            srs.append(int(sr))
            chs.append(int(data.shape[1]))
            sums.append(int(data.astype(np.int64).sum()))
        return self._out(batch, ns, srs, chs, sums)

    def _call_stdlib(self, batch: pa.Table) -> pa.Table:
        from rayfts.ops.media_codec import decode_wav

        ns, srs, chs, sums = [], [], [], []
        for payload in batch["payload"].to_pylist():
            samples, sr, ch = decode_wav(payload)
            ns.append(int(samples.size))
            srs.append(sr)
            chs.append(ch)
            sums.append(int(samples.astype(np.int64).sum()))
        return self._out(batch, ns, srs, chs, sums)

    def _call_fake(self, batch: pa.Table) -> pa.Table:
        ns, srs, chs, sums = [], [], [], []
        for payload in batch["payload"].to_pylist():
            d = hashlib.sha256(payload or b"").digest()
            ns.append(256 + d[0])
            srs.append(8000)
            chs.append(1)
            sums.append(int.from_bytes(d[1:5], "big") - (1 << 31))
        return self._out(batch, ns, srs, chs, sums)


def frame_digest(frame_bytes: bytes) -> str:
    """Digest convention for sampled video frames: sha256 of the
    HEX-encoded raw frame bytes, truncated to 16 hex chars. Hex-encoding
    first (instead of digesting the raw bytes) keeps the digest
    SQL-checkable — DuckDB's ``sha256`` accepts only VARCHAR, and the
    oracle reconstructs the same hex string with
    ``string_agg(printf('%02x', v))`` — while still binding the digest
    to every byte of the genuinely decoded frame."""
    return hashlib.sha256(frame_bytes.hex().encode("ascii")).hexdigest()[:16]


class VideoFrameSample(_MediaStage):
    """payload -> n uniformly-spaced frame digests (``frame_digest``
    convention). Real path decodes with av when present; the DEFAULT
    library-less path decodes genuine uncompressed RIFF/AVI bytes with
    the stdlib codec (``media_codec.decode_avi``) and digests real frame
    bytes — same sampling convention as ``VideoFrameSums``. FAKE path
    (explicit opt-in only) digests payload windows."""

    lib_name = "av"
    has_stdlib_codec = True

    def __init__(self, n_frames: int = 4, **kw):
        super().__init__(**kw)
        self.n_frames = n_frames

    def _digest_rows(self, decode):
        def run(batch: pa.Table) -> pa.Table:
            frames = []
            for payload in batch["payload"].to_pylist():
                arr = decode(payload)  # (n, h, w, 3) uint8
                total = arr.shape[0]
                step = max(1, total // self.n_frames)
                frames.append([
                    frame_digest(arr[min(i * step, total - 1)].tobytes())
                    for i in range(self.n_frames)
                ])
            return self._finish(batch, {
                "frame_digests": pa.array(frames, type=pa.list_(pa.string())),
            })
        return run

    def _call_stdlib(self, batch: pa.Table) -> pa.Table:
        from rayfts.ops.media_codec import decode_avi

        return self._digest_rows(decode_avi)(batch)

    def _call_real(self, batch: pa.Table) -> pa.Table:  # pragma: no cover - lib-gated
        def decode(payload):
            with self.lib.open(io.BytesIO(payload)) as container:
                return np.stack([f.to_ndarray(format="rgb24")
                                 for f in container.decode(video=0)])
        return self._digest_rows(decode)(batch)

    def _call_fake(self, batch: pa.Table) -> pa.Table:
        frames = []
        for payload in batch["payload"].to_pylist():
            p = payload or b"\x00"
            step = max(1, len(p) // self.n_frames)
            frames.append([
                hashlib.sha256(p[i * step:(i + 1) * step]).hexdigest()[:16]
                for i in range(self.n_frames)
            ])
        return self._finish(batch, {
            "frame_digests": pa.array(frames, type=pa.list_(pa.string())),
        })


class VideoFrameSums(_MediaStage):
    """payload -> exact per-sampled-frame pixel sums + dims (REAL decode
    via the stdlib AVI codec — SQL-checkable, unlike digests). Sampling
    convention matches VideoFrameSample: ``n_frames`` indices
    ``min(i * step, total - 1)`` with ``step = max(1, total //
    n_frames)``. The av path computes the same sums from decoded
    ndarray frames."""

    lib_name = "av"
    has_stdlib_codec = True

    def __init__(self, n_frames: int = 4, **kw):
        super().__init__(**kw)
        self.n_frames = n_frames

    def _sums_rows(self, decode):
        def run(batch: pa.Table) -> pa.Table:
            sums, nf_tot, ws, hs = [], [], [], []
            for payload in batch["payload"].to_pylist():
                frames = decode(payload)  # (n, h, w, 3) uint8
                total = frames.shape[0]
                step = max(1, total // self.n_frames)
                idx = [min(i * step, total - 1) for i in range(self.n_frames)]
                sums.append([int(frames[j].astype(np.int64).sum()) for j in idx])
                nf_tot.append(total)
                hs.append(int(frames.shape[1]))
                ws.append(int(frames.shape[2]))
            return self._finish(batch, {
                "n_frames_total": pa.array(nf_tot, type=pa.int64()),
                "width": pa.array(ws, type=pa.int64()),
                "height": pa.array(hs, type=pa.int64()),
                "frame_sums": pa.array(sums, type=pa.list_(pa.int64())),
            })
        return run

    def _call_stdlib(self, batch: pa.Table) -> pa.Table:
        from rayfts.ops.media_codec import decode_avi

        return self._sums_rows(decode_avi)(batch)

    def _call_real(self, batch: pa.Table) -> pa.Table:  # pragma: no cover - lib-gated
        def decode(payload):
            with self.lib.open(io.BytesIO(payload)) as container:
                return np.stack([f.to_ndarray(format="rgb24")
                                 for f in container.decode(video=0)])
        return self._sums_rows(decode)(batch)

    def _call_fake(self, batch: pa.Table) -> pa.Table:
        # deterministic byte-window sums (same shape, honest fake)
        def decode(payload):
            p = np.frombuffer(payload or b"\x00", dtype=np.uint8)
            side = max(1, int(p.size ** 0.5) // 2)
            need = 4 * side * side * 3
            rep = np.resize(p, need)
            return rep.reshape(4, side, side, 3)
        return self._sums_rows(decode)(batch)


def decode_pipeline(ds, stage_cls=DecodeImage, fake: bool = True,
                    concurrency: int = 2, batch_size: int = 64, **stage_kw):
    """Canonical wiring: actor pool, small batches for wide binary rows."""
    return ds.map_batches(
        stage_cls,
        fn_constructor_kwargs={"fake": fake, **stage_kw},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )
