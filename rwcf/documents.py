"""Bridge from the driver's ``documents`` table to the engine's input shape.

Tokenization here is deliberately trivial and exactly invertible — token ids
are the UTF-8 bytes of ``text`` as int32 — so every engine pipeline over the
tokenized table has an ANSI-SQL oracle on the raw ``documents`` view
(``octet_length(text)`` = n_tok; reconstructing text from decoded tokens
proves bit-identical decode end-to-end). All stages are vectorized
``map_batches`` over zero-copy Arrow; no Python per-row loops.
"""

from __future__ import annotations

import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from . import pipeline, rayenv


def tokenize_batch(t: pa.Table) -> pa.Table:
    """(doc_id:int64, text, source) -> TOKENS_SCHEMA row batch."""
    text = t.column("text").combine_chunks()
    if pa.types.is_string(text.type):
        text = text.cast(pa.large_utf8())
    raw = np.frombuffer(text.buffers()[1], dtype=np.int64)
    offsets = raw[text.offset: text.offset + len(text) + 1]
    data_buf = text.buffers()[2]
    payload = (np.frombuffer(data_buf, dtype=np.uint8)[offsets[0]:offsets[-1]]
               if data_buf is not None else np.empty(0, dtype=np.uint8))
    lengths = np.diff(offsets)
    rel_offsets = np.concatenate(([0], np.cumsum(lengths)))
    tokens = pa.LargeListArray.from_arrays(
        rel_offsets.astype(np.int64),
        pa.array(payload.astype(np.int32), type=pa.int32())).cast(pa.list_(pa.int32()))
    return pa.table({
        "doc_id": pc.cast(t.column("doc_id"), pa.string()),
        "tokens": tokens,
        "n_tok": pa.array(lengths.astype(np.int32), type=pa.int32()),
        "source": t.column("source").combine_chunks().cast(pa.string()),
    })


def detokenize_batch(t: pa.Table) -> pa.Table:
    """Decoded TOKENS_SCHEMA rows -> (doc_id:int64, text) — inverse of
    tokenize_batch; proves the per-row token-array equality invariant."""
    la = t.column("tokens").combine_chunks()
    lengths = pc.list_value_length(la).to_numpy().astype(np.int64)
    flat = la.flatten().to_numpy(zero_copy_only=False).astype(np.uint8)
    offsets = np.concatenate(([0], np.cumsum(lengths)))
    text = pa.Array.from_buffers(
        pa.large_utf8(), len(lengths),
        [None, pa.py_buffer(offsets.astype(np.int64).tobytes()),
         pa.py_buffer(flat.tobytes())]).cast(pa.string())
    return pa.table({
        "doc_id": pc.cast(t.column("doc_id"), pa.int64()),
        "text": text,
    })


def tokenized_documents(sf_dir: str):
    """Ray Dataset of the tokenized documents table (column-pruned read)."""
    import ray.data as rd
    ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                         columns=["doc_id", "text", "source"])
    return ds.map_batches(tokenize_batch, batch_format="pyarrow",
                          **rayenv.remote_args())


def tokens_parquet_for(sf_dir: str, work_dir: str) -> str:
    """Materialize the tokenized table as parquet (engine input). Fresh per
    work_dir; callers pick a per-run directory."""
    out = os.path.join(work_dir, "tokens_in")
    if os.path.isdir(out):
        shutil.rmtree(out)
    tokenized_documents(sf_dir).write_parquet(out)
    return out


def parquet_files(path: str) -> list[str]:
    if os.path.isfile(path):
        return [path]
    return sorted(os.path.join(path, f) for f in os.listdir(path)
                  if f.endswith(".parquet"))
