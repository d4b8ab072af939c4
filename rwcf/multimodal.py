"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata.

The container ships no image/audio libraries, so the *decode kernels* are
stubbed exactly as the brief prescribes: a real-library path is attempted
(``PIL`` for images) and, when absent, a clearly-marked deterministic fake
format ("RWIM": ``b'RWIM' + u32le(width) + u32le(height) + payload``) stands
in. Everything Ray-side is real and tested: binary column schema, actor-pool
``map_batches`` stages with per-actor setup in ``__init__``, small
``batch_size`` for large payloads, and typed metadata output layout.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

MAGIC = b"RWIM"
_W_MOD = 199


def make_blob_batch(t: pa.Table, text_col: str = "text") -> pa.Table:
    """Deterministic synthetic image blobs derived from document text:
    width/height are pure functions of the byte length (SQL-checkable), the
    payload is the UTF-8 text. Vectorized assembly, no per-row encode."""
    from . import format as fmt
    lengths, payload = fmt.chunk_from_arrow(t.column(text_col))
    n = lengths.size
    widths = (lengths % _W_MOD + 1).astype(np.uint32)
    heights = (lengths // _W_MOD + 1).astype(np.uint32)
    header = np.zeros((n, 12), dtype=np.uint8)
    header[:, 0:4] = np.frombuffer(MAGIC, dtype=np.uint8)
    for i in range(4):
        header[:, 4 + i] = (widths >> (8 * i)).astype(np.uint8)
        header[:, 8 + i] = (heights >> (8 * i)).astype(np.uint8)
    blob_lens = lengths + 12
    total = int(blob_lens.sum())
    out = np.empty(total, dtype=np.uint8)
    dst = np.cumsum(blob_lens) - blob_lens
    for i in range(12):  # 12 vectorized scatters, not n Python rows
        out[dst + i] = header[:, i]
    if payload.size:
        body_dst = np.arange(payload.size, dtype=np.int64) + \
            np.repeat(dst + 12 - (np.cumsum(lengths) - lengths), lengths)
        out[body_dst] = payload
    offsets = np.concatenate(([0], np.cumsum(blob_lens))).astype(np.int64)
    blobs = pa.Array.from_buffers(
        pa.large_binary(), n,
        [None, pa.py_buffer(offsets.tobytes()), pa.py_buffer(out.tobytes())])
    return pa.table({"doc_id": t.column("doc_id"), "blob": blobs})


class ImageDecodeStage:
    """Actor-pool stage: binary blobs in, typed image metadata + features
    out. Library/codec setup happens ONCE per actor in ``__init__``."""

    def __init__(self):
        try:  # real decoder if the environment has one
            from PIL import Image  # noqa: F401
            self._pil = Image
        except ImportError:
            self._pil = None  # deterministic RWIM fallback (see module doc)

    def _decode_rwim(self, t: pa.Table) -> pa.Table:
        from . import format as fmt
        lengths, payload = fmt.chunk_from_arrow(
            t.column("blob").combine_chunks().cast(pa.large_binary()))
        starts = np.cumsum(lengths) - lengths
        n = lengths.size
        w = np.zeros(n, dtype=np.int64)
        h = np.zeros(n, dtype=np.int64)
        for i in range(4):
            w |= payload[starts + 4 + i].astype(np.int64) << (8 * i)
            h |= payload[starts + 8 + i].astype(np.int64) << (8 * i)
        magic_ok = np.ones(n, dtype=bool)
        for i, m in enumerate(MAGIC):
            magic_ok &= payload[starts + i] == m
        if not magic_ok.all():
            raise ValueError("bad RWIM magic")
        return pa.table({
            "doc_id": t.column("doc_id"),
            "width": pa.array(w), "height": pa.array(h),
            "n_bytes": pa.array(lengths.astype(np.int64)),
        })

    def __call__(self, t: pa.Table) -> pa.Table:
        if self._pil is not None:
            # Real path: PIL decode per blob (absent in this container).
            raise NotImplementedError(
                "real image decoding is stubbed in this environment")
        return self._decode_rwim(t)


class FrameSampleStage:
    """Audio/video analog: sample every ``stride``-th payload byte as a
    'frame' and emit a fixed-length int32 summary vector per row."""

    def __init__(self, stride: int = 64, frames: int = 8):
        self.stride = stride
        self.frames = frames

    def __call__(self, t: pa.Table) -> pa.Table:
        from . import format as fmt
        lengths, payload = fmt.chunk_from_arrow(
            t.column("blob").combine_chunks().cast(pa.large_binary()))
        starts = np.cumsum(lengths) - lengths
        n = lengths.size
        out = np.zeros((n, self.frames), dtype=np.int32)
        for f in range(self.frames):
            pos = starts + 12 + f * self.stride
            valid = pos < starts + lengths
            out[valid, f] = payload[pos[valid]]
        offsets = np.arange(0, (n + 1) * self.frames, self.frames, dtype=np.int64)
        frames = pa.LargeListArray.from_arrays(
            offsets, pa.array(out.reshape(-1), type=pa.int32()))
        return pa.table({"doc_id": t.column("doc_id"),
                         "frames": frames.cast(pa.list_(pa.int32()))})


def image_metadata_ds(sf_dir: str, concurrency: int = 4):
    """documents -> synthetic blobs -> actor-pool decode -> metadata."""
    import os

    import ray.data as rd

    from . import rayenv
    ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                         columns=["doc_id", "text"])
    blobs = ds.map_batches(make_blob_batch, batch_format="pyarrow",
                           **rayenv.remote_args())
    return blobs.map_batches(ImageDecodeStage, batch_format="pyarrow",
                             batch_size=256,  # small batches: binary payloads
                             concurrency=concurrency, num_cpus=1,
                             **rayenv.remote_args())


class ImageResizeStage:
    """Actor-pool resize stage: blobs in, resized blobs + new typed
    dims out. Real decoder path (PIL thumbnail) is attempted per actor
    in ``__init__`` and stubbed with ``NotImplementedError`` when the
    library is absent (this container); the RWIM fallback "resizes"
    deterministically — output dims are ceil(w/k) x ceil(h/k) and the
    payload keeps every (k*k)-th byte — so the full Ray plumbing
    (actor pool, small batches, binary in/binary out) runs and the
    output layout is SQL-checkable."""

    def __init__(self, factor: int = 4):
        if factor < 1:
            raise ValueError("factor must be >= 1")
        self.factor = factor
        try:
            from PIL import Image  # noqa: F401
            self._pil = Image
        except ImportError:
            self._pil = None

    def __call__(self, t: pa.Table) -> pa.Table:
        if self._pil is not None:
            raise NotImplementedError(
                "real image resizing is stubbed in this environment")
        from . import format as fmt
        k = self.factor
        lengths, payload = fmt.chunk_from_arrow(
            t.column("blob").combine_chunks().cast(pa.large_binary()))
        starts = np.cumsum(lengths) - lengths
        n = lengths.size
        w = np.zeros(n, dtype=np.int64)
        h = np.zeros(n, dtype=np.int64)
        for i in range(4):
            w |= payload[starts + 4 + i].astype(np.int64) << (8 * i)
            h |= payload[starts + 8 + i].astype(np.int64) << (8 * i)
        w2 = (w + k - 1) // k
        h2 = (h + k - 1) // k
        body = lengths - 12
        n_keep = (body + k * k - 1) // (k * k)  # every (k*k)-th byte
        out_lens = n_keep + 12
        total = int(out_lens.sum())
        out = np.empty(total, dtype=np.uint8)
        dst = np.cumsum(out_lens) - out_lens
        header = np.zeros((n, 12), dtype=np.uint8)
        header[:, 0:4] = np.frombuffer(MAGIC, dtype=np.uint8)
        for i in range(4):
            header[:, 4 + i] = (w2 >> (8 * i)).astype(np.uint8)
            header[:, 8 + i] = (h2 >> (8 * i)).astype(np.uint8)
        for i in range(12):
            out[dst + i] = header[:, i]
        if int(n_keep.sum()):
            rel = np.arange(int(n_keep.sum()), dtype=np.int64) \
                - np.repeat(np.cumsum(n_keep) - n_keep, n_keep)
            src = np.repeat(starts + 12, n_keep) + rel * (k * k)
            out[np.repeat(dst + 12, n_keep) + rel] = payload[src]
        offsets = np.concatenate(([0], np.cumsum(out_lens))) \
            .astype(np.int64)
        blobs = pa.Array.from_buffers(
            pa.large_binary(), n,
            [None, pa.py_buffer(offsets.tobytes()),
             pa.py_buffer(out.tobytes())])
        return pa.table({"doc_id": t.column("doc_id"),
                         "blob": blobs,
                         "width": pa.array(w2),
                         "height": pa.array(h2),
                         "n_bytes": pa.array(out_lens.astype(np.int64))})


def image_resize_ds(sf_dir: str, factor: int = 4, concurrency: int = 4):
    """documents -> synthetic blobs -> actor-pool resize -> dims layout
    (the blob column is dropped for the metadata view the oracle
    checks; the full blob output is exercised in tests)."""
    import os

    import ray.data as rd

    from . import rayenv
    ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                         columns=["doc_id", "text"])
    blobs = ds.map_batches(make_blob_batch, batch_format="pyarrow",
                           **rayenv.remote_args())
    resized = blobs.map_batches(
        ImageResizeStage, fn_constructor_kwargs={"factor": factor},
        batch_format="pyarrow", batch_size=256,
        concurrency=concurrency, num_cpus=1, **rayenv.remote_args())
    return resized.map_batches(
        lambda t: t.select(["doc_id", "width", "height", "n_bytes"]),
        batch_format="pyarrow", **rayenv.remote_args())
