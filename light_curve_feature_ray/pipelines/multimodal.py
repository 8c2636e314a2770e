"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are carried as Arrow ``binary`` columns with metadata
columns alongside. The decode / feature-extract stages are actor-pool
``map_batches`` classes whose Ray-side plumbing (schema, batch sizing,
actor signature, output layout) is real and tested; the actual codec calls
are STUBBED because no image/audio libraries exist in this container:

- with ``decoder="stub"`` (default) a deterministic fake decode derives
  (width, height, embedding) from the payload bytes;
- with ``decoder="pil"`` the stage raises NotImplementedError at
  construction unless PIL is importable (clearly-marked gate).

Binary columns stay in ``batch_format="pyarrow"`` end-to-end (they don't
round-trip pandas cleanly).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

IMAGE_SCHEMA = pa.schema(
    [
        ("item_id", pa.int64()),
        ("payload", pa.binary()),
        ("media_type", pa.string()),
    ]
)


def attach_fake_payloads(docs_ds):
    """Turn the documents table into a multimodal-shaped table: the utf-8
    text bytes stand in for an encoded image payload."""

    def f(batch: pa.Table) -> pa.Table:
        payload = batch["text"].cast(pa.binary())
        return pa.table(
            {
                "item_id": batch["doc_id"],
                "payload": payload,
                "media_type": pa.array(
                    ["image/fake"] * batch.num_rows, type=pa.string()
                ),
            }
        )

    return docs_ds.map_batches(f, batch_format="pyarrow")


class DecodeImage:
    """Actor-pool decode stage. Setup (codec/model load) happens once per
    actor in __init__; __call__ handles one Arrow batch."""

    def __init__(self, decoder: str = "stub", embedding_dim: int = 8):
        self.embedding_dim = embedding_dim
        if decoder == "stub":
            self.decode = self._decode_stub
        elif decoder == "pil":
            try:
                from PIL import Image  # noqa: F401
            except ImportError as e:  # pragma: no cover - env has no PIL
                raise NotImplementedError(
                    "real image decode requires PIL, which is not available "
                    "in this environment; use decoder='stub'"
                ) from e
            raise NotImplementedError("wire PIL decode here when available")
        else:
            raise ValueError(f"unknown decoder {decoder!r}")

    def _decode_stub(self, payload: bytes):
        """Deterministic fake: dimensions + unit-norm embedding derived from
        the payload digest."""
        digest = hashlib.sha256(payload).digest()
        width = 1 + digest[0] % 64
        height = 1 + digest[1] % 64
        raw = np.frombuffer(digest, dtype=np.uint8)[: self.embedding_dim]
        emb = raw.astype(np.float64)
        norm = np.linalg.norm(emb)
        emb = emb / norm if norm else emb
        return width, height, emb

    def __call__(self, batch: pa.Table) -> pa.Table:
        widths = np.empty(batch.num_rows, dtype=np.int32)
        heights = np.empty(batch.num_rows, dtype=np.int32)
        embs = np.empty((batch.num_rows, self.embedding_dim), dtype=np.float64)
        for i, payload in enumerate(batch["payload"]):
            w, h, e = self.decode(payload.as_py())
            widths[i], heights[i] = w, h
            embs[i] = e
        return pa.table(
            {
                "item_id": batch["item_id"],
                "width": pa.array(widths, type=pa.int32()),
                "height": pa.array(heights, type=pa.int32()),
                "embedding": pa.array(
                    list(embs), type=pa.list_(pa.float64())
                ),
            }
        )


def decode_images(items_ds, concurrency=(1, 4), batch_size: int = 256):
    """Large binary payloads => small batches, actor pool for codec state."""
    return items_ds.map_batches(
        DecodeImage,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
