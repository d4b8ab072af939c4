"""Persistent exact-dedup index for INCREMENTAL ingestion.

The streaming-crawl problem: each day's dump must drop documents already
accepted on ANY previous day, without re-shuffling the historical corpus.
This module keeps the accepted set as an on-disk index of 128-bit content
keys (two decorrelated 64-bit polynomial hashes — collision odds ~n^2/2^128,
so key equality IS content equality at any realistic corpus size) stored as
immutable parquet shards, one per committed run:

- :func:`filter_seen` — drop a Dataset's rows whose content key is already
  in the index. The index is read once and broadcast via ``ray.put``
  (8+8 bytes per historical doc); at a scale where the index outgrows
  worker memory, range-partition the shards by ``h1`` and route batches to
  the matching partition (same bucketing the dedup pipelines use) — the
  shard layout already supports that split.
- :func:`commit_new` — append the run's distinct content keys as ONE new
  shard via tmp-dir + atomic rename, keyed by the caller's ``run_id``:
  recommitting the same run_id is a no-op (idempotent resume, same
  contract as the encode manifest, pipeline.py).

Within-run duplicates are the job of :func:`rwcf.dedup.dedup_exact` —
compose ``dedup_exact -> filter_seen -> commit_new`` for the full
incremental pipeline (test_state.py pins that composition).
"""

from __future__ import annotations

import glob
import os
import shutil

import numpy as np
import pyarrow as pa

from . import rayenv, textops

#: second decorrelated polynomial base; together with textops._FP_BASE it
#: forms the 128-bit composite key. MUST be odd: an even base b makes
#: b^i ≡ 0 (mod 2^64) for i >= 64, so h2 would depend only on a document's
#: first 64 bytes and the 128-bit key would collapse to 64 bits for any
#: documents sharing a 64-byte prefix (templated crawl headers do).
#: Index shards committed before 2026-08-18 used the old even base and
#: must be rebuilt (the shard schema is unchanged).
_BASE2 = np.uint64((0x100000001B3 ^ 0xDEADBEEF12345677) | 1)
assert int(_BASE2) % 2 == 1, "_BASE2 must be odd (see comment above)"


def doc_keys(t: pa.Table, text_col: str = "text"):
    """(h1, h2) uint64 content keys for each row — two independent
    polynomial hash streams over the same bytes."""
    lengths, payload = textops._text_chunks(t, text_col)
    h1 = textops.segment_poly_hash(lengths, payload)
    h2 = textops.segment_poly_hash(lengths, payload, base=_BASE2)
    return h1, h2


def _shards(index_dir: str) -> list[str]:
    return sorted(glob.glob(os.path.join(index_dir, "shard-*.parquet")))


def load_index(index_dir: str):
    """All committed keys, lexsorted by (h1, h2). Returns (h1, h2)."""
    import pyarrow.parquet as pq
    hs1, hs2 = [], []
    for p in _shards(index_dir):
        t = pq.read_table(p, columns=["h1", "h2"])
        hs1.append(t.column("h1").to_numpy().view(np.uint64))
        hs2.append(t.column("h2").to_numpy().view(np.uint64))
    if not hs1:
        e = np.empty(0, np.uint64)
        return e, e.copy()
    h1 = np.concatenate(hs1)
    h2 = np.concatenate(hs2)
    order = np.lexsort((h2, h1))
    return h1[order], h2[order]


def pair_member(idx_h1: np.ndarray, idx_h2: np.ndarray,
                h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
    """Membership mask of (h1, h2) pairs in the lexsorted index — exact on
    BOTH halves: an h1 collision with a different h2 is not a member.
    Vectorized: one isin prefilter on h1, then a searchsorted walk of each
    candidate's h1-run checking h2 (runs are ~1 long absent collisions)."""
    out = np.zeros(h1.size, dtype=bool)
    if idx_h1.size == 0 or h1.size == 0:
        return out
    cand = np.isin(h1, idx_h1)
    ci = np.nonzero(cand)[0]
    lo = np.searchsorted(idx_h1, h1[ci], side="left")
    hi = np.searchsorted(idx_h1, h1[ci], side="right")
    # h1-runs in the index are sorted by h2: binary-search h2 within each
    for k in range(ci.size):  # touches only h1-matching rows (dups + rare
        s, e = lo[k], hi[k]   # collisions), never the whole batch
        p = np.searchsorted(idx_h2[s:e], h2[ci[k]])
        out[ci[k]] = p < (e - s) and idx_h2[s + p] == h2[ci[k]]
    return out


def filter_seen(ds, index_dir: str, text_col: str = "text"):
    """Drop rows whose content key is already committed to the index.
    Streaming filter: the index broadcast happens once, every batch
    checks locally, no shuffle."""
    import ray

    ref = ray.put(load_index(index_dir))

    def filt(t: pa.Table) -> pa.Table:
        idx_h1, idx_h2 = ray.get(ref)
        h1, h2 = doc_keys(t, text_col)
        return t.filter(pa.array(~pair_member(idx_h1, idx_h2, h1, h2)))

    return ds.map_batches(filt, batch_format="pyarrow",
                          **rayenv.remote_args())


def commit_new(ds, index_dir: str, run_id: str,
               text_col: str = "text") -> int:
    """Append the Dataset's DISTINCT content keys as shard ``run_id``.
    Atomic (tmp dir + rename of the finished file) and idempotent: an
    existing shard for ``run_id`` short-circuits, so a resumed job cannot
    double-commit. Returns the number of keys in the shard (0 when
    short-circuited). Only THIS run's leftover tmp dir is swept — a
    concurrent commit of a different run_id keeps its in-flight dir."""
    os.makedirs(index_dir, exist_ok=True)
    final = os.path.join(index_dir, f"shard-{run_id}.parquet")
    if os.path.exists(final):
        return 0
    shutil.rmtree(os.path.join(index_dir, f".tmp-{run_id}"),
                  ignore_errors=True)
    # per-batch keys -> driver-side distinct: 16 B/doc for THIS RUN only
    # (the historical corpus never re-materializes); a run too large for
    # that writes per-partition distinct shards instead (sinks.py layout)
    return _write_shard(ds, index_dir, run_id, final, text_col)


def _write_shard(ds, index_dir: str, run_id: str, final: str,
                 text_col: str) -> int:
    """Distinct keys of ``ds`` -> shard file, committed by atomic
    ``os.replace`` (any prior shard stays readable until the swap
    instant)."""
    import pyarrow.parquet as pq

    def keys(t: pa.Table) -> pa.Table:
        h1, h2 = doc_keys(t, text_col)
        return pa.table({"h1": pa.array(h1.view(np.int64)),
                         "h2": pa.array(h2.view(np.int64))})

    kt = ds.map_batches(keys, batch_format="pyarrow",
                        **rayenv.remote_args()).to_pandas()
    pairs = np.stack([kt["h1"].to_numpy(), kt["h2"].to_numpy()], axis=1)
    pairs = np.unique(pairs, axis=0)
    tmp = os.path.join(index_dir, f".tmp-{run_id}")
    os.makedirs(tmp, exist_ok=True)
    tmp_file = os.path.join(tmp, "shard.parquet")
    pq.write_table(pa.table({"h1": pa.array(pairs[:, 0]),
                             "h2": pa.array(pairs[:, 1])}), tmp_file)
    os.replace(tmp_file, final)
    shutil.rmtree(tmp, ignore_errors=True)
    return int(pairs.shape[0])


def rebuild_shard(index_dir: str, run_id: str, input_paths,
                  text_col: str = "text") -> int:
    """Recompute shard ``run_id``'s content keys from its SOURCE rows
    under the CURRENT hash bases and atomically replace the committed
    shard (the old shard stays readable until the ``os.replace``
    instant — a crashed rebuild loses nothing). The migration tool for
    shards committed before 2026-08-18 with the old even ``_BASE2``
    (see the module comment): shards store only (h1, h2) keys, never
    content, so a base change can only be repaired from the run's
    source data."""
    import ray.data as rd

    final = os.path.join(index_dir, f"shard-{run_id}.parquet")
    if not os.path.exists(final):
        raise FileNotFoundError(f"no committed shard for run {run_id!r} "
                                f"at {final}")
    ds = rd.read_parquet(input_paths) \
        if isinstance(input_paths, (str, list)) else input_paths
    return _write_shard(ds, index_dir, run_id, final, text_col)
