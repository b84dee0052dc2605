"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by actor-pool map_batches
stages.

The decode libraries (PIL/torchaudio/ffmpeg) are NOT in this
container, so the decode kernels are gated behind import-try with a
deterministic fake fallback (clearly marked).  The Ray-side plumbing —
schema, actor lifecycle (setup once in ``__init__``), batch sizing for
large binary payloads, output layout — is real and tested.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

__all__ = ["attach_fake_payload", "ImageFeatureStage", "image_features"]


def attach_fake_payload(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Testdata has no binary columns; derive a deterministic binary
    payload (stand-in for image bytes) + typed metadata."""
    payloads = [(t or "").encode() * 3 for t in batch[text_col].to_pylist()]
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "payload": pa.array(payloads, pa.binary()),
            "media_type": pa.array(["image/fake"] * batch.num_rows, pa.string()),
        }
    )


class ImageFeatureStage:
    """Actor-pool stage: decode + feature-extract image payloads.

    __init__ runs once per actor (library probe / model load);
    __call__ per batch.  Use with::

        ds.map_batches(ImageFeatureStage, batch_format="pyarrow",
                       batch_size=256,     # small: payloads are large
                       concurrency=4, num_cpus=1)
    """

    def __init__(self, fake_ok: bool = True):
        try:  # real decoder if the library exists (not in this container)
            from PIL import Image  # noqa: F401

            self._real = True
        except ImportError:
            if not fake_ok:
                raise NotImplementedError(
                    "image decode requires PIL; not available in this container"
                )
            self._real = False

    def _decode_fake(self, payloads: list[bytes]) -> np.ndarray:
        """Deterministic fake 'decode': 8 features from a content
        digest (byte length, digest bytes).  CLEARLY A STUB — replaces
        pixel decoding only; shapes/flow match the real path."""
        out = np.zeros((len(payloads), 8), dtype=np.float64)
        for i, p in enumerate(payloads):
            d = hashlib.sha256(p).digest()
            out[i, 0] = len(p)
            out[i, 1:] = np.frombuffer(d[:7], dtype=np.uint8).astype(np.float64)
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        if self._real:  # pragma: no cover - library absent here
            raise NotImplementedError("real PIL decode path not exercised in sandbox")
        feats = self._decode_fake(payloads)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "width": pa.array(feats[:, 0].astype(np.int64)),
                "features": pa.array(list(feats), type=pa.list_(pa.float64())),
            }
        )


def image_features(ds, concurrency: int = 2, batch_size: int = 256):
    """documents -> fake payloads -> actor-pool feature extraction."""
    return ds.map_batches(attach_fake_payload, batch_format="pyarrow").map_batches(
        ImageFeatureStage,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )
