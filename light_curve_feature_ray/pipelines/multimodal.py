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
        the payload digest (per-item scalar form, kept for tests; the batch
        path below is the vectorized equivalent)."""
        digest = hashlib.sha256(payload).digest()
        width = 1 + digest[0] % 64
        height = 1 + digest[1] % 64
        raw = np.frombuffer(digest, dtype=np.uint8)[: self.embedding_dim]
        emb = raw.astype(np.float64)
        norm = np.linalg.norm(emb)
        emb = emb / norm if norm else emb
        return width, height, emb

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        dim = self.embedding_dim
        if n == 0:
            return pa.table(
                {
                    "item_id": pa.array([], type=pa.int64()),
                    "width": pa.array([], type=pa.int32()),
                    "height": pa.array([], type=pa.int32()),
                    "embedding": pa.array([], type=pa.list_(pa.float64())),
                }
            )
        # digesting is per-item by necessity (hashlib); everything after
        # the digest is one vectorized pass over the (n, 32) byte matrix,
        # and the list column is built zero-copy from offsets + flat values
        payloads = batch["payload"].to_pylist()
        digests = np.frombuffer(
            b"".join(
                hashlib.sha256(b"" if p is None else p).digest()
                for p in payloads
            ),
            dtype=np.uint8,
        ).reshape(n, 32)
        widths = (1 + digests[:, 0] % 64).astype(np.int32)
        heights = (1 + digests[:, 1] % 64).astype(np.int32)
        raw = digests[:, :dim].astype(np.float64)
        norms = np.linalg.norm(raw, axis=1)
        embs = np.where(norms[:, None] > 0, raw / np.maximum(norms, 1e-300)[:, None], raw)
        offsets = pa.array(
            np.arange(0, (n + 1) * dim, dim, dtype=np.int32)
        )
        emb_col = pa.ListArray.from_arrays(offsets, pa.array(embs.ravel()))
        return pa.table(
            {
                "item_id": batch["item_id"],
                "width": pa.array(widths, type=pa.int32()),
                "height": pa.array(heights, type=pa.int32()),
                "embedding": emb_col,
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


class ResizeImage:
    """Actor-pool resize stage (aspect-preserving bound to ``target`` px).

    Stub codec: original dims derive from the payload sha256 (same rule
    as DecodeImage), the resize itself is INTEGER-ONLY math
    (``out = max(1, side*target // max(w, h))`` when the larger side
    exceeds ``target``) so a SQL oracle reproduces it exactly, and the
    "resized payload" identity is the sha256 of
    ``"{digest_hex}-{out_w}x{out_h}"`` — a string chain both engines can
    compute. A real codec drops in behind the same signature."""

    def __init__(self, target: int = 32, decoder: str = "stub"):
        if decoder != "stub":  # pragma: no cover - no codec libs here
            raise NotImplementedError(
                "real image resize requires an image library not present "
                "in this environment; use decoder='stub'"
            )
        self.target = int(target)

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        t = self.target
        if n == 0:
            return pa.table(
                {
                    "item_id": pa.array([], type=pa.int64()),
                    "width": pa.array([], type=pa.int32()),
                    "height": pa.array([], type=pa.int32()),
                    "resized_sha": pa.array([], type=pa.string()),
                }
            )
        payloads = batch["payload"].to_pylist()
        hexes = [
            hashlib.sha256(b"" if p is None else p).hexdigest()
            for p in payloads
        ]
        digests = np.frombuffer(
            bytes.fromhex("".join(hexes)), dtype=np.uint8
        ).reshape(n, 32)
        w = (1 + digests[:, 0] % 64).astype(np.int64)
        h = (1 + digests[:, 1] % 64).astype(np.int64)
        m = np.maximum(w, h)
        scale = m > t
        out_w = np.where(scale, np.maximum(1, w * t // m), w)
        out_h = np.where(scale, np.maximum(1, h * t // m), h)
        sha = [
            hashlib.sha256(f"{hx}-{ww}x{hh}".encode()).hexdigest()
            for hx, ww, hh in zip(hexes, out_w, out_h)
        ]
        return pa.table(
            {
                "item_id": batch["item_id"],
                "width": pa.array(out_w.astype(np.int32)),
                "height": pa.array(out_h.astype(np.int32)),
                "resized_sha": pa.array(sha, type=pa.string()),
            }
        )


def resize_images(items_ds, target: int = 32, concurrency=(1, 4),
                  batch_size: int = 256):
    return items_ds.map_batches(
        ResizeImage,
        fn_constructor_args=(target,),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


class SampleFrames:
    """Actor-pool video frame-sampling stage: each payload explodes into
    ``<= k`` evenly-spaced frame rows (one output row per sampled frame —
    the 1->N batch explosion is the real plumbing under any codec).

    Stub codec: the frame count is ``1 + digest[2] % 16``; sampled
    indices are ``i*(n_frames-1) // (k-1)`` (distinct, order kept) and
    each frame's identity is ``sha256("{digest_hex}-frame-{idx}")`` —
    all integer/string arithmetic a SQL oracle reproduces exactly."""

    def __init__(self, k: int = 3, decoder: str = "stub"):
        if decoder != "stub":  # pragma: no cover - no codec libs here
            raise NotImplementedError(
                "real frame sampling requires a video library not present "
                "in this environment; use decoder='stub'"
            )
        if k < 1:
            raise ValueError("k must be >= 1")
        self.k = int(k)

    def __call__(self, batch: pa.Table) -> pa.Table:
        k = self.k
        ids, fidx, fsha, nframes = [], [], [], []
        for item_id, payload in zip(
            batch["item_id"].to_pylist(), batch["payload"].to_pylist()
        ):
            hx = hashlib.sha256(
                b"" if payload is None else payload
            ).hexdigest()
            n_frames = 1 + bytes.fromhex(hx)[2] % 16
            seen = []
            for i in range(k):
                idx = i * (n_frames - 1) // (k - 1) if k > 1 else 0
                if idx not in seen:
                    seen.append(idx)
            for idx in seen:
                ids.append(item_id)
                fidx.append(idx)
                nframes.append(n_frames)
                fsha.append(
                    hashlib.sha256(f"{hx}-frame-{idx}".encode()).hexdigest()
                )
        return pa.table(
            {
                "item_id": pa.array(ids, type=pa.int64()),
                "n_frames": pa.array(nframes, type=pa.int32()),
                "frame_idx": pa.array(fidx, type=pa.int32()),
                "frame_sha": pa.array(fsha, type=pa.string()),
            }
        )


def sample_frames(items_ds, k: int = 3, concurrency=(1, 4),
                  batch_size: int = 256):
    return items_ds.map_batches(
        SampleFrames,
        fn_constructor_args=(k,),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
