"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by actor-pool map_batches
stages.

The usual decode libraries (PIL/ffmpeg) are NOT in this container, so
decode is a REAL pure-NumPy codec path (:mod:`raystat.dataops.imagecodec`:
PPM / 24-bit BMP / 8-bit-RGB PNG) — synthetic fixtures plant known
pixels and the stages recover them byte-exactly.  Payloads that are
none of those formats fall back to a clearly-marked deterministic
digest stub (kept so arbitrary binary columns still flow end-to-end).

Stage shapes (the part that must be right at 100 TB):
- stateful setup (codec dispatch table, resize grids) happens once per
  actor in ``__init__``; per-batch work in ``__call__``
- small ``batch_size`` (payloads are large), ``concurrency`` sized by
  the caller, ``num_cpus=1`` per actor
- outputs are fixed-schema Arrow tables; pixel arrays never leave the
  stage — only features/resized payloads do.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from raystat.dataops.imagecodec import (
    decode_image,
    encode_bmp,
    encode_png,
    encode_ppm,
    sniff_format,
)

__all__ = [
    "attach_image_payload",
    "attach_fake_payload",
    "ImageFeatureStage",
    "ImageResizeStage",
    "FrameSampleStage",
    "image_features",
    "synth_audio_wav",
    "AudioFeatureStage",
    "audio_features",
]

_ENCODERS = (encode_png, encode_bmp, encode_ppm)
_MEDIA = ("image/png", "image/bmp", "image/x-portable-pixmap")


def synth_image(seed: int, h: int = 24, w: int = 32) -> np.ndarray:
    """Deterministic small RGB test image from a seed (gradient +
    seeded noise) — stands in for real payload bytes in fixtures."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    base = np.stack(
        [
            (xx * 255 // max(w - 1, 1)),
            (yy * 255 // max(h - 1, 1)),
            ((xx + yy) * 255 // max(h + w - 2, 1)),
        ],
        axis=-1,
    ).astype(np.int32)
    noise = rng.integers(-20, 21, size=(h, w, 3), dtype=np.int32)
    return np.clip(base + noise, 0, 255).astype(np.uint8)


def attach_image_payload(batch: pa.Table, id_col: str = "doc_id") -> pa.Table:
    """Derive a REAL encoded image payload per row (format rotates
    through PNG/BMP/PPM by id) + typed metadata columns."""
    ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    payloads, media = [], []
    for i in ids:
        k = int(i) % len(_ENCODERS)
        payloads.append(_ENCODERS[k](synth_image(int(i))))
        media.append(_MEDIA[k])
    return pa.table(
        {
            "doc_id": batch[id_col],
            "payload": pa.array(payloads, pa.binary()),
            "media_type": pa.array(media, pa.string()),
        }
    )


def attach_fake_payload(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Opaque non-image binary payload (digest-stub path)."""
    payloads = [(t or "").encode() * 3 for t in batch[text_col].to_pylist()]
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "payload": pa.array(payloads, pa.binary()),
            "media_type": pa.array(["application/octet-stream"] * batch.num_rows),
        }
    )


class ImageFeatureStage:
    """Actor-pool stage: decode + feature-extract image payloads.

    __init__ runs once per actor; __call__ per batch.  Use with::

        ds.map_batches(ImageFeatureStage, batch_format="pyarrow",
                       batch_size=256,     # small: payloads are large
                       concurrency=4, num_cpus=1)

    Features (8): width, height, mean R/G/B, std of luminance,
    4-bin luminance-histogram entropy, edge energy (mean |dx|+|dy|).
    Non-image payloads get the digest stub (decoded=false).
    """

    def __init__(self, fake_ok: bool = True):
        self.fake_ok = fake_ok

    @staticmethod
    def _features(img: np.ndarray) -> np.ndarray:
        h, w, _ = img.shape
        f = np.empty(8, dtype=np.float64)
        f[0], f[1] = w, h
        ch = img.reshape(-1, 3).astype(np.float64)
        f[2:5] = ch.mean(axis=0)
        lum = img.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
        f[5] = lum.std()
        hist, _ = np.histogram(lum, bins=4, range=(0.0, 255.0))
        p = hist / max(lum.size, 1)
        nz = p[p > 0]
        f[6] = float(-(nz * np.log2(nz)).sum())
        f[7] = float(
            np.abs(np.diff(lum, axis=0)).mean() + np.abs(np.diff(lum, axis=1)).mean()
        ) if h > 1 and w > 1 else 0.0
        return f

    @staticmethod
    def _digest_stub(p: bytes) -> np.ndarray:
        """Deterministic fallback for non-image binary (CLEARLY A STUB:
        length + digest bytes, no pixel semantics)."""
        d = hashlib.sha256(p).digest()
        out = np.empty(8, dtype=np.float64)
        out[0] = len(p)
        out[1:] = np.frombuffer(d[:7], dtype=np.uint8).astype(np.float64)
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        feats = np.zeros((len(payloads), 8), dtype=np.float64)
        decoded = np.zeros(len(payloads), dtype=bool)
        for i, p in enumerate(payloads):
            if sniff_format(p) is not None:
                feats[i] = self._features(decode_image(p))
                decoded[i] = True
            elif self.fake_ok:
                feats[i] = self._digest_stub(p)
            else:
                raise ValueError("unrecognized image payload and fake_ok=False")
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "decoded": pa.array(decoded),
                "width": pa.array(feats[:, 0].astype(np.int64)),
                "height": pa.array(feats[:, 1].astype(np.int64)),
                "features": pa.array(list(feats), type=pa.list_(pa.float64())),
            }
        )


class ImageResizeStage:
    """Actor-pool stage: decode -> nearest-neighbor resize to
    (out_h, out_w) -> re-encode as PNG.  The index grids are built once
    per actor (setup), reused every batch."""

    def __init__(self, out_h: int = 16, out_w: int = 16):
        self.out_h, self.out_w = int(out_h), int(out_w)
        self._grid_cache: dict[tuple[int, int], tuple[np.ndarray, np.ndarray]] = {}

    def _grid(self, h: int, w: int) -> tuple[np.ndarray, np.ndarray]:
        g = self._grid_cache.get((h, w))
        if g is None:
            ys = (np.arange(self.out_h) * h) // self.out_h
            xs = (np.arange(self.out_w) * w) // self.out_w
            g = (ys, xs)
            self._grid_cache[(h, w)] = g
        return g

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = []
        for p in batch["payload"].to_pylist():
            img = decode_image(p)
            ys, xs = self._grid(img.shape[0], img.shape[1])
            out.append(encode_png(img[np.ix_(ys, xs)]))
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "payload": pa.array(out, pa.binary()),
                "media_type": pa.array(["image/png"] * batch.num_rows),
            }
        )


class FrameSampleStage:
    """Actor-pool stage for 'video' columns modelled as
    ``list<binary>`` frame sequences: keep every ``stride``-th frame
    (deterministic temporal subsampling), emit one row per kept frame
    with (doc_id, frame_index, payload)."""

    def __init__(self, stride: int = 2):
        self.stride = max(1, int(stride))

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, idxs, frames = [], [], []
        doc_ids = batch["doc_id"].to_pylist()
        for d, seq in zip(doc_ids, batch["frames"].to_pylist()):
            for j in range(0, len(seq), self.stride):
                ids.append(d)
                idxs.append(j)
                frames.append(seq[j])
        return pa.table(
            {
                "doc_id": pa.array(ids),
                "frame_index": pa.array(idxs, pa.int64()),
                "payload": pa.array(frames, pa.binary()),
            }
        )


def image_features(ds, concurrency: int = 2, batch_size: int = 256):
    """documents -> synthetic real-codec payloads -> actor-pool
    feature extraction."""
    return ds.map_batches(attach_image_payload, batch_format="pyarrow").map_batches(
        ImageFeatureStage,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


# -- audio (WAV PCM16 — decoded with the stdlib wave module) ----------------


def synth_audio_wav(seed: int, sr: int = 8000, dur_s: float = 0.25) -> bytes:
    """Deterministic mono PCM16 WAV: seeded tone + noise."""
    import io
    import wave

    rng = np.random.default_rng(seed)
    n = int(sr * dur_s)
    t = np.arange(n) / sr
    freq = 200.0 + (seed % 20) * 50.0
    x = 0.6 * np.sin(2 * np.pi * freq * t) + 0.01 * rng.standard_normal(n)
    pcm = np.clip(x * 32767.0, -32768, 32767).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm.tobytes())
    return buf.getvalue()


class AudioFeatureStage:
    """Actor-pool stage: REAL WAV PCM16 decode (stdlib ``wave``) +
    vectorized features: duration, RMS, zero-crossing rate, spectral
    centroid & rolloff (one rFFT per clip), peak amplitude."""

    def __init__(self, fake_ok: bool = True):
        self.fake_ok = fake_ok

    @staticmethod
    def _features(pcm: np.ndarray, sr: int) -> np.ndarray:
        x = pcm.astype(np.float64) / 32768.0
        n = x.size
        f = np.zeros(6, dtype=np.float64)
        f[0] = n / sr
        if n == 0:
            return f
        f[1] = float(np.sqrt((x * x).mean()))
        f[2] = float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1])))
        spec = np.abs(np.fft.rfft(x)) ** 2  # power spectrum
        freqs = np.fft.rfftfreq(n, 1.0 / sr)
        tot = spec.sum()
        if tot > 0:
            f[3] = float((spec * freqs).sum() / tot)
            cum = np.cumsum(spec)
            f[4] = float(freqs[np.searchsorted(cum, 0.85 * tot)])
        f[5] = float(np.abs(x).max())
        return f

    def __call__(self, batch: pa.Table) -> pa.Table:
        import io
        import wave

        feats = np.zeros((batch.num_rows, 6), dtype=np.float64)
        decoded = np.zeros(batch.num_rows, dtype=bool)
        srs = np.zeros(batch.num_rows, dtype=np.int64)
        for i, p in enumerate(batch["payload"].to_pylist()):
            if p[:4] == b"RIFF" and p[8:12] == b"WAVE":
                with wave.open(io.BytesIO(p), "rb") as w:
                    sr = w.getframerate()
                    nch = w.getnchannels()
                    raw = w.readframes(w.getnframes())
                pcm = np.frombuffer(raw, dtype="<i2")
                if nch > 1:
                    pcm = pcm.reshape(-1, nch).mean(axis=1)
                feats[i] = self._features(pcm, sr)
                decoded[i] = True
                srs[i] = sr
            elif self.fake_ok:
                feats[i] = ImageFeatureStage._digest_stub(p)[:6]
            else:
                raise ValueError("unrecognized audio payload and fake_ok=False")
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "decoded": pa.array(decoded),
                "sample_rate": pa.array(srs),
                "features": pa.array(list(feats), type=pa.list_(pa.float64())),
            }
        )


def audio_features(ds, concurrency: int = 2, batch_size: int = 256):
    """documents -> synthetic WAV payloads -> actor-pool audio
    feature extraction."""

    def attach(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "payload": pa.array(
                    [synth_audio_wav(int(i)) for i in ids], pa.binary()
                ),
                "media_type": pa.array(["audio/wav"] * batch.num_rows),
            }
        )

    return ds.map_batches(attach, batch_format="pyarrow").map_batches(
        AudioFeatureStage,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )
