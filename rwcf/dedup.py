"""Deduplication operators for training-data pipelines.

Five dedup families, each Ray-Data-native (vectorized ``map_batches`` for
signatures, one ``groupby`` shuffle for bucketing, exact verification before
any pair is emitted):

- exact: content hash -> hash-partitioned groupby -> min-doc_id survivor
- MinHash + LSH: char-5-gram shingles -> 64-perm minhash -> banded LSH
  buckets (groupby) -> candidate pairs -> exact Jaccard verify
- SimHash: 64-bit sign-of-weighted-bits signature -> 4x16-bit band buckets
  (pigeonhole-exact for hamming<=3) -> exact hamming verify
- n-gram Jaccard: cheap blocking (byte length) -> exact 3-gram Jaccard
- embedding cosine: normalized matmul against a broadcast matrix
  (``ray.put`` once, read per batch — no shuffle join)

Candidate verification is always exact, so LSH/banding false positives are
filtered deterministically; recall for *identical* documents is certain
(identical signatures), which is what the SQL oracles pin (planted exact
copies). Probabilistic near-dup recall is exercised in pytest instead.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from . import rayenv, textops

SHINGLE_LEN = 5
NUM_PERM = 64
BANDS = 16  # 16 bands x 4 rows
_MERSENNE = np.uint64((1 << 61) - 1)


def _perm_params(num_perm: int = NUM_PERM, seed: int = 42):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, 1 << 61, num_perm, dtype=np.uint64) | np.uint64(1)
    b = rng.integers(0, 1 << 61, num_perm, dtype=np.uint64)
    return a, b


def doc_shingles(t: pa.Table, text_col: str = "text"):
    """Per-doc char-ngram window keys; returns (keys, doc_starts, counts)."""
    lengths, payload = textops._text_chunks(t, text_col)
    n = lengths.size
    win = textops.window_hashes(payload, SHINGLE_LEN)
    starts = np.cumsum(lengths) - lengths
    counts = np.maximum(lengths - SHINGLE_LEN + 1, 0)
    # windows crossing doc boundaries are excluded by per-doc slicing below
    keys = win
    doc_starts = starts
    return keys, doc_starts.astype(np.int64), counts.astype(np.int64)


def minhash_signatures(t: pa.Table, text_col: str = "text",
                       num_perm: int = NUM_PERM, seed: int = 42) -> np.ndarray:
    """(n_docs, num_perm) uint64 minhash matrix, fully vectorized
    (segmented minimum.reduceat per permutation)."""
    keys, doc_starts, counts = doc_shingles(t, text_col)
    n = doc_starts.size
    a, b = _perm_params(num_perm, seed)
    sig = np.full((n, num_perm), np.iinfo(np.uint64).max, dtype=np.uint64)
    if keys.size == 0 or n == 0:
        return sig
    nonempty = counts > 0
    bounds = _segment_bounds(doc_starts[nonempty], counts[nonempty], keys.size)
    for j in range(num_perm):
        h = keys * a[j] + b[j]  # mod 2^64 wraparound universal-ish hash
        mins = np.minimum.reduceat(h, bounds)
        sig[nonempty, j] = mins[::2]
    return sig


def _segment_bounds(starts: np.ndarray, counts: np.ndarray, total: int) -> np.ndarray:
    """Interleaved [start, end) reduceat bounds so each doc's reduction stops
    at its own last valid window (boundary-crossing windows excluded)."""
    ends = starts + counts
    bounds = np.column_stack([starts, ends]).ravel()
    if bounds.size and bounds[-1] >= total:
        bounds = bounds[:-1]  # reduceat forbids index == len; last span runs out
    return bounds


def _exact_doc_shingle_sets(texts: list[str]) -> list[np.ndarray]:
    out = []
    for s in texts:
        b = np.frombuffer(s.encode(), dtype=np.uint8)
        out.append(np.unique(textops.window_hashes(b, SHINGLE_LEN)))
    return out


def jaccard(a: np.ndarray, b: np.ndarray) -> float:
    """Shingle-set Jaccard. Empty-vs-anything is 0.0: two sub-shingle-length
    texts share no evidence of similarity, so they must not be emitted as
    verified duplicates (verify paths short-circuit exact byte equality
    FIRST, which keeps identical short texts at similarity 1.0)."""
    if a.size == 0 or b.size == 0:
        return 0.0
    inter = np.intersect1d(a, b, assume_unique=True).size
    return inter / (a.size + b.size - inter)


# ---------------------------------------------------------------------------
# pipelines
# ---------------------------------------------------------------------------

def dedup_exact(ds, text_col: str = "text"):
    """Exact dedup: content-hash partitioning + per-group min-id survivor.
    The groupby key is a 64-bit content hash (cheap to shuffle); the
    in-group first() is taken after an in-group sort by doc_id, and the
    text itself rides along so hash collisions cannot merge distinct docs
    (groups verify equality before collapsing)."""

    def add_hash(t: pa.Table) -> pa.Table:
        fp = textops.fingerprint_batch(t, text_col)
        return t.append_column("_h", fp.column("fingerprint"))

    def first_per_group(g: pd.DataFrame) -> pd.DataFrame:
        out = (g.sort_values("doc_id").groupby(text_col, as_index=False)
               .first())  # collision-safe: group by actual content
        return out[["doc_id", text_col]]

    return (ds.map_batches(add_hash, batch_format="pyarrow",
                           **rayenv.remote_args())
            .groupby("_h")
            .map_groups(first_per_group, batch_format="pandas",
                        **rayenv.remote_args()))


def _band_rows(t: pa.Table, text_col: str, num_perm: int, bands: int,
               seed: int) -> pa.Table:
    sig = minhash_signatures(t, text_col, num_perm, seed)
    n, _ = sig.shape
    r = num_perm // bands
    doc_ids = t.column("doc_id").combine_chunks().to_numpy(zero_copy_only=False)
    band_keys = np.empty((n, bands), dtype=np.uint64)
    for bi in range(bands):
        block = sig[:, bi * r:(bi + 1) * r]
        key = np.zeros(n, dtype=np.uint64)
        for c in range(r):
            key = key * textops._FP_BASE + block[:, c]
        band_keys[:, bi] = key
    return pa.table({
        "doc_id": pa.array(np.repeat(doc_ids, bands)),
        "band": pa.array(np.tile(np.arange(bands, dtype=np.int32), n)),
        "key": pa.array(band_keys.reshape(-1).astype(np.int64)),
    })


def minhash_lsh_candidates(ds, text_col: str = "text",
                           num_perm: int = NUM_PERM, bands: int = BANDS,
                           seed: int = 42) -> pd.DataFrame:
    """(a_id, b_id) candidate pairs from banded minhash buckets. One
    groupby shuffle of (doc_id, band, key) rows — signatures stay in the
    tasks, only 3-column rows move."""
    import functools

    fn = functools.partial(_band_rows, text_col=text_col, num_perm=num_perm,
                           bands=bands, seed=seed)

    def pairs_per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.sort(g["doc_id"].to_numpy())
        if ids.size < 2:
            return pd.DataFrame({"a_id": [], "b_id": []})
        ai, bi = np.triu_indices(ids.size, k=1)
        return pd.DataFrame({"a_id": ids[ai], "b_id": ids[bi]})

    cand = (ds.map_batches(fn, batch_format="pyarrow", **rayenv.remote_args())
            .groupby(["band", "key"])
            .map_groups(pairs_per_bucket, batch_format="pandas",
                        **rayenv.remote_args())
            .to_pandas())
    return cand.drop_duplicates().reset_index(drop=True)


def verify_pairs_jaccard(texts_by_id: dict, pairs: pd.DataFrame,
                         threshold: float) -> pd.DataFrame:
    """Exact shingle-set Jaccard for each candidate pair (driver-side for
    the small verified set; the scale path joins texts by id in a bucketed
    map_groups)."""
    keep_a, keep_b, sims = [], [], []
    cache: dict = {}

    def shingles(i):
        if i not in cache:
            b = np.frombuffer(str(texts_by_id[i]).encode(), dtype=np.uint8)
            cache[i] = np.unique(textops.window_hashes(b, SHINGLE_LEN))
        return cache[i]

    for a, b in zip(pairs["a_id"], pairs["b_id"]):
        # exact byte equality first: identical texts are dups at sim 1.0
        # even when shorter than the shingle length (empty shingle sets)
        if str(texts_by_id[a]) == str(texts_by_id[b]):
            j = 1.0
        else:
            j = jaccard(shingles(a), shingles(b))
        if j >= threshold:
            keep_a.append(int(a))
            keep_b.append(int(b))
            sims.append(j)
    return pd.DataFrame({"a_id": keep_a, "b_id": keep_b, "jaccard": sims})


def minhash_tokens_batch(t: pa.Table, num_perm: int = NUM_PERM,
                         seed: int = 42) -> pa.Table:
    """Per-row minhash over the *token id* sequence of a tokens table —
    near-dup detection for pre-tokenized corpora. Emits (doc_id,
    sig_hash): the 64-perm signature folded to one u64 (band keys would be
    emitted the same way for LSH). Compute-dense: num_perm multiply+min
    passes over the flattened token stream."""
    import pyarrow.compute as pc
    la = t.column("tokens").combine_chunks()
    lengths = pc.list_value_length(la).to_numpy().astype(np.int64)
    flat = la.flatten().to_numpy(zero_copy_only=False).astype(np.uint64)
    n = lengths.size
    starts = np.cumsum(lengths) - lengths
    a, b = _perm_params(num_perm, seed)
    bounds = _segment_bounds(starts[lengths > 0], lengths[lengths > 0], flat.size)
    sig = np.full((n, num_perm), np.iinfo(np.uint64).max, dtype=np.uint64)
    ne = lengths > 0
    if flat.size:
        h = np.empty_like(flat)  # one reused buffer: 64 fresh 8MB allocations
        # per batch would thrash mmap/TLB under high worker concurrency
        for j in range(num_perm):
            np.multiply(flat, a[j], out=h)
            np.add(h, b[j], out=h)
            sig[ne, j] = np.minimum.reduceat(h, bounds)[::2]
    folded = np.zeros(n, dtype=np.uint64)
    for j in range(num_perm):
        folded = folded * textops._FP_BASE + sig[:, j]
    return pa.table({"doc_id": t.column("doc_id"),
                     "sig_hash": pa.array(folded.astype(np.int64))})


def simhash_signatures(t: pa.Table, text_col: str = "text") -> np.ndarray:
    """64-bit simhash per doc: sign of summed ±1 bit weights over char-4-gram
    feature hashes; vectorized via unpackbits + add.reduceat."""
    lengths, payload = textops._text_chunks(t, text_col)
    n = lengths.size
    L = 4
    win = textops.window_hashes(payload, L)
    starts = np.cumsum(lengths) - lengths
    counts = np.maximum(lengths - L + 1, 0)
    # mix bits so the LE-packed ngram key behaves hash-like
    keys = win * np.uint64(0x9E3779B97F4A7C15)
    keys ^= keys >> np.uint64(29)
    bits = np.unpackbits(keys.view(np.uint8).reshape(-1, 8), axis=1,
                         bitorder="little").astype(np.int32)  # (W, 64)
    weights = bits * 2 - 1
    sig = np.zeros(n, dtype=np.uint64)
    nonempty = counts > 0
    if win.size:
        bounds = _segment_bounds(starts[nonempty], counts[nonempty], win.size)
        sums = np.add.reduceat(weights, bounds, axis=0)[::2]
        bitvals = (sums > 0).astype(np.uint64)
        packed = np.zeros(bitvals.shape[0], dtype=np.uint64)
        for j in range(64):
            packed |= bitvals[:, j] << np.uint64(j)
        sig[nonempty] = packed
    return sig


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    x = (a ^ b).view(np.uint8).reshape(-1, 8)
    return np.unpackbits(x, axis=1).sum(axis=1)


def simhash_candidates(ds, text_col: str = "text") -> pd.DataFrame:
    """Bucket by 4x16-bit simhash bands: any pair with hamming<=3 shares at
    least one identical band (pigeonhole), so recall at that radius is
    exact, not probabilistic."""

    def band_rows(t: pa.Table) -> pa.Table:
        sig = simhash_signatures(t, text_col)
        doc_ids = t.column("doc_id").combine_chunks().to_numpy(zero_copy_only=False)
        n = sig.size
        bands = np.empty((n, 4), dtype=np.uint64)
        for bi in range(4):
            bands[:, bi] = (sig >> np.uint64(16 * bi)) & np.uint64(0xFFFF)
        return pa.table({
            "doc_id": pa.array(np.repeat(doc_ids, 4)),
            "sig": pa.array(np.repeat(sig.astype(np.int64), 4)),
            "band": pa.array(np.tile(np.arange(4, dtype=np.int32), n)),
            "key": pa.array(bands.reshape(-1).astype(np.int64)),
        })

    def pairs_per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id")
        ids = g["doc_id"].to_numpy()
        sigs = g["sig"].to_numpy().astype(np.int64).view(np.uint64)
        if ids.size < 2:
            return pd.DataFrame({"a_id": [], "b_id": [], "hamming": []})
        ai, bi = np.triu_indices(ids.size, k=1)
        ham = hamming64(sigs[ai], sigs[bi])
        keep = ham <= 3
        return pd.DataFrame({"a_id": ids[ai][keep], "b_id": ids[bi][keep],
                             "hamming": ham[keep]})

    cand = (ds.map_batches(band_rows, batch_format="pyarrow",
                           **rayenv.remote_args())
            .groupby(["band", "key"])
            .map_groups(pairs_per_bucket, batch_format="pandas",
                        **rayenv.remote_args())
            .to_pandas())
    return cand.drop_duplicates(subset=["a_id", "b_id"]).reset_index(drop=True)


def cluster_pairs(pairs: pd.DataFrame, ids=None) -> pd.DataFrame:
    """Connected components over verified duplicate pairs -> (doc_id,
    cluster_id) with cluster_id = min doc_id of the component. Union-find on
    the driver — valid because the verified pair set is small relative to
    the corpus (candidates were already banded + verified); the at-scale
    alternative is a few rounds of min-label propagation via groupby."""
    parent: dict = {}

    def find(x):
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo

    for a, b in zip(pairs["a_id"], pairs["b_id"]):
        union(a, b)
    members = set(pairs["a_id"]) | set(pairs["b_id"])
    if ids is not None:
        members |= set(ids)
    rows = sorted((m, find(m)) for m in members)
    return pd.DataFrame(rows, columns=["doc_id", "cluster_id"])


def dedup_survivors(pairs: pd.DataFrame, ids) -> pd.DataFrame:
    """Keep-one-per-cluster policy: survivor = min doc_id of each duplicate
    cluster; singletons survive unchanged."""
    cl = cluster_pairs(pairs, ids)
    return (cl.groupby("cluster_id", as_index=False)
              .agg(doc_id=("doc_id", "min"))[["doc_id"]])


def embedding_near_dups_lsh(ds, threshold: float = 0.95, n_planes: int = 16,
                            bands: int = 4, id_col: str = "vec_id",
                            vec_col: str = "embedding", seed: int = 42):
    """Scale path for embedding near-dup: random-hyperplane sign signatures
    -> banded buckets (one groupby of (id, band, key) rows) -> exact cosine
    verify inside each bucket. Nothing is broadcast; only 3-column rows
    shuffle. Recall is probabilistic (tested vs the brute-force baseline);
    emitted pairs are exactly verified."""
    rng = np.random.default_rng(seed)
    planes_by_dim: dict[int, np.ndarray] = {}

    def band_rows(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).combine_chunks().to_numpy(zero_copy_only=False)
        la = t.column(vec_col).combine_chunks()
        if len(la) == 0:
            return pa.table({"vid": pa.array([], pa.int64()),
                             "band": pa.array([], pa.int32()),
                             "key": pa.array([], pa.int64()),
                             "vec": pa.array([], pa.list_(pa.float32()))})
        m = la.flatten().to_numpy(zero_copy_only=False).reshape(len(la), -1)
        m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        dim = m.shape[1]
        if dim not in planes_by_dim:
            planes_by_dim[dim] = np.random.default_rng(seed).normal(
                size=(dim, n_planes))
        bits = (m @ planes_by_dim[dim]) > 0  # (n, n_planes)
        r = n_planes // bands
        n = ids.size
        keys = np.zeros((n, bands), dtype=np.int64)
        for bi in range(bands):
            for c in range(r):
                keys[:, bi] = keys[:, bi] * 2 + bits[:, bi * r + c]
        flat_vec = np.repeat(np.arange(n), bands)
        return pa.table({
            "vid": pa.array(np.repeat(ids, bands)),
            "band": pa.array(np.tile(np.arange(bands, dtype=np.int32), n)),
            "key": pa.array(keys.reshape(-1)),
            "vec": pa.array(list(m[flat_vec].astype(np.float32)),
                            pa.list_(pa.float32())),
        })

    def pairs_per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"a_id": pd.Series([], dtype="int64"),
                                 "b_id": pd.Series([], dtype="int64")})
        g = g.sort_values("vid")
        ids = g["vid"].to_numpy()
        m = np.stack(g["vec"].to_numpy()).astype(np.float64)
        sims = m @ m.T
        ai, bi = np.nonzero(np.triu(sims >= threshold, k=1))
        return pd.DataFrame({"a_id": ids[ai], "b_id": ids[bi]})

    out = (ds.map_batches(band_rows, batch_format="pyarrow",
                          **rayenv.remote_args())
           .groupby(["band", "key"])
           .map_groups(pairs_per_bucket, batch_format="pandas",
                       **rayenv.remote_args())
           .to_pandas())
    del rng
    return out.drop_duplicates().reset_index(drop=True)


def embedding_near_dups(ds, threshold: float = 0.95,
                        id_col: str = "vec_id", vec_col: str = "embedding"):
    """Cosine near-dup pairs. The (normalized) full matrix is broadcast once
    with ray.put and each batch matmuls against it — no shuffle join. At
    10^12 scale the broadcast side becomes the sign-LSH buckets of
    similarity.py; same verify-then-emit contract."""
    import ray

    full = ds.to_pandas()
    mat = np.stack(full[vec_col].to_numpy()).astype(np.float64)
    mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    ids = full[id_col].to_numpy()
    ref = ray.put((ids, mat))

    def pairs(t: pa.Table) -> pa.Table:
        all_ids, all_mat = ray.get(ref)
        import pyarrow.compute as pc  # noqa: F401
        b_ids = t.column(id_col).combine_chunks().to_numpy(zero_copy_only=False)
        la = t.column(vec_col).combine_chunks()
        if len(la) == 0:
            return pa.table({"a_id": pa.array([], pa.int64()),
                             "b_id": pa.array([], pa.int64())})
        bm = la.flatten().to_numpy(zero_copy_only=False).reshape(
            len(la), -1).astype(np.float64)
        bm /= np.maximum(np.linalg.norm(bm, axis=1, keepdims=True), 1e-12)
        sims = bm @ all_mat.T
        bi, ai = np.nonzero(sims >= threshold)
        a = b_ids[bi]
        b = all_ids[ai]
        keep = a < b
        return pa.table({"a_id": pa.array(a[keep]), "b_id": pa.array(b[keep])})

    return ds.map_batches(pairs, batch_format="pyarrow", **rayenv.remote_args())
