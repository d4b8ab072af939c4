"""Deterministic synthetic fixtures (FIXTURES.md).

F1 ``tokens_table`` is the flagship input shape from BASELINE.json's
``input_hint``: ``(doc_id:string, tokens:list<int32>, n_tok:int32,
source:string)``. Pure function of (seed, n_rows) — no wall clock, no
external data. Heavy-tailed ``n_tok`` with a planted 0.1% skew tail of
64k–256k-token rows (drives size-aware partitioning + salting), Zipfian
token ids over a 50257 vocab, ~10% of rows sorted so RLE/dict-friendly
pages exist, and an 8-value Zipf-skewed ``source`` (one source ≈ 55%).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = 50257
SOURCES = ["web-common", "web-books", "wiki", "code", "news", "forums",
           "papers", "legal"]
SOURCE_PROBS = [0.55, 0.18, 0.10, 0.06, 0.04, 0.03, 0.02, 0.02]


def tokens_table(n_rows: int, seed: int = 42) -> pa.Table:
    rng = np.random.default_rng([seed, n_rows])

    # heavy-tailed lengths + planted skew tail
    n_tok = np.clip(rng.lognormal(5.0, 1.0, n_rows), 1, 8192).astype(np.int64)
    n_skew = max(1, n_rows // 1000) if n_rows >= 200 else 0
    if n_skew:
        skew_rows = rng.choice(n_rows, n_skew, replace=False)
        n_tok[skew_rows] = rng.integers(64_000, 256_000, n_skew)

    total = int(n_tok.sum())
    flat = ((rng.zipf(1.1, total) - 1) % VOCAB).astype(np.int32)

    # ~10% of rows: sort their token segment (creates runs/low-entropy pages)
    sorted_mask = rng.random(n_rows) < 0.10
    if sorted_mask.any():
        row_of_value = np.repeat(np.arange(n_rows), n_tok)
        sel = np.flatnonzero(sorted_mask[row_of_value])
        seg = row_of_value[sel]
        vals = flat[sel]
        order = np.lexsort((vals, seg))
        flat[sel] = vals[order]

    offsets = np.concatenate(([0], np.cumsum(n_tok))).astype(np.int64)
    tokens = pa.LargeListArray.from_arrays(offsets, pa.array(flat, type=pa.int32())) \
        .cast(pa.list_(pa.int32()))
    doc_id = pa.array([f"doc-{i:012d}" for i in range(n_rows)], type=pa.string())
    source = pa.array(rng.choice(SOURCES, n_rows, p=SOURCE_PROBS), type=pa.string())
    return pa.table({
        "doc_id": doc_id,
        "tokens": tokens,
        "n_tok": pa.array(n_tok.astype(np.int32), type=pa.int32()),
        "source": source,
    })


def tokens_parquet(n_rows: int, seed: int = 42,
                   cache_dir: str = "/tmp/rwcf_data",
                   row_group_size: int = 2500) -> str:
    """Materialize (once) the F1 table as parquet; returns the path.

    Small row groups on purpose: a fragment (row group) is the unit of
    encode parallelism, and at the 100TB design point fragments vastly
    outnumber cores — the bench input must reproduce that, not starve a
    32-cpu pool with 10 giant row groups."""
    os.makedirs(cache_dir, exist_ok=True)
    path = os.path.join(cache_dir, f"tokens_n{n_rows}_s{seed}_rg{row_group_size}.parquet")
    if not os.path.exists(path):
        tbl = tokens_table(n_rows, seed)
        tmp = path + f".tmp{os.getpid()}"
        pq.write_table(tbl, tmp, row_group_size=row_group_size)
        os.replace(tmp, path)
    return path


def rows_for_sf(sf: float) -> int:
    """FIXTURES.md F1 scales: smoke≈2k (sf0.001), correctness≈20k (sf0.01),
    bench≈200k (sf0.1). Rows scale, token skew tail survives."""
    return max(200, int(round(2_000_000 * sf)))


def plant_copies(t: pa.Table, modulus: int, offset: int,
                 id_col: str = "doc_id") -> pa.Table:
    """Append exact copies of every ``modulus``-th row (by id) under
    ``id + offset`` — THE deterministic planted-duplicate ground truth.
    One implementation shared by the dedup/prep oracle queries and the
    bench dedup stage: the SQL oracles pin the same (modulus, offset)
    arithmetic, so a drift in any one copy would silently break oracle
    parity (round-3 review finding)."""
    import pyarrow.compute as pc
    ids = t.column(id_col).combine_chunks()
    if ids.type != pa.int64():
        ids = pc.cast(ids, pa.int64())
        t = t.set_column(t.schema.get_field_index(id_col), id_col, ids)
    mask = pa.array(ids.to_numpy(zero_copy_only=False) % modulus == 0)
    copies = t.filter(mask)
    copies = copies.set_column(
        copies.schema.get_field_index(id_col), id_col,
        pc.add(copies.column(id_col), offset))
    return pa.concat_tables([t, copies])
