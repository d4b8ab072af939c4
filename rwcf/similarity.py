"""Similarity search over an embedding column (``list<float>``).

- ``cosine_topk``: brute-force cosine top-k — the exactness baseline. The
  query matrix is broadcast once (``ray.put``), every batch does one numpy
  matmul and emits only its local top-k candidates, and the tiny candidate
  union is reduced to the global top-k. No shuffle of the corpus.
- ``cosine_topk_ivf``: the scale path — a fixed-seed k-means-lite coarse
  quantizer (trained on a sample), vectors assigned to their nearest
  centroid, queries probing only their ``nprobe`` closest centroid lists.
  Approximate by design -> rows-only checked; recall vs the brute-force
  baseline is asserted in pytest.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from . import rayenv


def _batch_matrix(t: pa.Table, vec_col: str) -> np.ndarray:
    la = t.column(vec_col).combine_chunks()
    if len(la) == 0:
        return np.empty((0, 1), dtype=np.float64)
    m = la.flatten().to_numpy(zero_copy_only=False).reshape(len(la), -1)
    return m.astype(np.float64)


def _normalize(m: np.ndarray) -> np.ndarray:
    return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)


def cosine_topk(ds, query_ids: list[int], k: int = 10,
                id_col: str = "vec_id", vec_col: str = "embedding",
                query_ds=None) -> pd.DataFrame:
    """Exact top-k by cosine for each query id. Returns (qid, vec_id, rank)
    with deterministic tie-breaks (sim desc, vec_id asc).

    ``query_ds`` (default: ``ds``) is where query vectors are looked up —
    pass the UNFILTERED table when ``ds`` is a predicate-filtered corpus
    (filtered vector search: restrict candidates, not queries)."""
    import ray

    q = (query_ds if query_ds is not None else ds).map_batches(
        lambda t: t.filter(pa.compute.is_in(t[id_col],
                                            value_set=pa.array(query_ids))),
        batch_format="pyarrow", **rayenv.remote_args()).to_pandas()
    q = q.sort_values(id_col)
    qm = _normalize(np.stack(q[vec_col].to_numpy()).astype(np.float64))
    qids = q[id_col].to_numpy()
    ref = ray.put((qids, qm))

    def local_topk(t: pa.Table) -> pa.Table:
        qi, qmat = ray.get(ref)
        ids = t.column(id_col).combine_chunks().to_numpy(zero_copy_only=False)
        bm = _normalize(_batch_matrix(t, vec_col))
        # quantize BEFORE the per-batch cut: selecting on raw floats could
        # drop the oracle's tie-break winner (lower vec_id at equal rounded
        # sim) at the local top-k boundary before _rank_topk ever sees it
        sims = np.round(qmat @ bm.T, 6)  # (Q, B)
        kk = min(k, ids.size)
        out_q, out_v, out_s = [], [], []
        for r in range(qi.size):
            order = np.lexsort((ids, -sims[r]))[:kk]
            out_q.extend([qi[r]] * kk)
            out_v.extend(ids[order])
            out_s.extend(sims[r, order])
        return pa.table({"qid": pa.array(out_q), "vec_id": pa.array(out_v),
                         "sim": pa.array(np.asarray(out_s, dtype=np.float64))})

    cand = ds.map_batches(local_topk, batch_format="pyarrow",
                          **rayenv.remote_args()).to_pandas()
    return _rank_topk(cand, k)


def _rank_topk(cand: pd.DataFrame, k: int) -> pd.DataFrame:
    """Global top-k from per-batch candidates with tie-stable ranking:
    similarities are quantized to 1e-6 before ordering (the SQL oracle
    quantizes identically) so a near-tie computed in a different float
    summation order cannot flip a rank; exact ties break by vec_id."""
    cand = cand.copy()
    cand["sim"] = cand["sim"].round(6)
    cand = cand.sort_values(["qid", "sim", "vec_id"],
                            ascending=[True, False, True])
    top = cand.groupby("qid", as_index=False).head(k).reset_index(drop=True)
    top["rank"] = top.groupby("qid").cumcount() + 1
    return top[["qid", "vec_id", "rank"]]


def kmeans_lite(mat: np.ndarray, n_clusters: int, iters: int = 5,
                seed: int = 42) -> np.ndarray:
    """Deterministic small k-means (the IVF coarse quantizer)."""
    rng = np.random.default_rng(seed)
    centroids = mat[rng.choice(mat.shape[0], n_clusters, replace=False)].copy()
    for _ in range(iters):
        d = mat @ centroids.T
        assign = d.argmax(axis=1)  # cosine on normalized vectors
        for c in range(n_clusters):
            members = mat[assign == c]
            if members.size:
                v = members.mean(axis=0)
                centroids[c] = v / max(np.linalg.norm(v), 1e-12)
    return centroids


def _kmeans_l2(mat: np.ndarray, n_clusters: int, iters: int = 8,
               seed: int = 42) -> np.ndarray:
    """Deterministic small L2 k-means (the PQ sub-quantizer trainer)."""
    rng = np.random.default_rng(seed)
    cents = mat[rng.choice(mat.shape[0], min(n_clusters, mat.shape[0]),
                           replace=False)].copy()
    for _ in range(iters):
        d2 = (-2.0 * mat @ cents.T
              + (cents * cents).sum(axis=1)[None, :])  # + |x|^2 const
        assign = d2.argmin(axis=1)
        for c in range(cents.shape[0]):
            members = mat[assign == c]
            if members.size:
                cents[c] = members.mean(axis=0)
    return cents


def train_pq(ds, m: int = 4, ks: int = 16, seed: int = 42,
             train_rows: int = 4096, vec_col: str = "embedding") -> np.ndarray:
    """Train product-quantization codebooks: split the (normalized)
    vector into ``m`` subvectors, L2-k-means each subspace to ``ks``
    centroids on a seeded RANDOM sample (head sampling degenerates on
    cluster-sorted corpora — same lesson as the IVF quantizer). Returns
    ``(m, ks, dim/m)`` float64 codebooks."""
    n_total = ds.count()
    if n_total > train_rows:
        frac = min(1.0, 1.25 * train_rows / n_total)
        sample = ds.random_sample(frac, seed=seed).limit(train_rows) \
            .to_pandas()
    else:
        sample = ds.to_pandas()
    smat = _normalize(np.stack(sample[vec_col].to_numpy()).astype(np.float64))
    dim = smat.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    return np.stack([
        _kmeans_l2(smat[:, j * dsub:(j + 1) * dsub], ks, seed=seed + j)
        for j in range(m)])


def _pq_codes(bm: np.ndarray, codebooks: np.ndarray) -> np.ndarray:
    """(n, m) uint8 codes: nearest sub-centroid per subspace, vectorized
    (one -2x@c.T + |c|^2 distance matrix per subspace)."""
    m, ks, dsub = codebooks.shape
    codes = np.empty((bm.shape[0], m), dtype=np.uint8)
    for j in range(m):
        sub = bm[:, j * dsub:(j + 1) * dsub]
        cb = codebooks[j]
        d2 = -2.0 * sub @ cb.T + (cb * cb).sum(axis=1)[None, :]
        codes[:, j] = d2.argmin(axis=1)
    return codes


def pq_encode_ds(ds, codebooks: np.ndarray, id_col: str = "vec_id",
                 vec_col: str = "embedding"):
    """Compress an embedding Dataset to PQ codes: each vector becomes
    ``m`` uint8 centroid ids (``dim*4 -> m`` bytes, e.g. 16x at dim=16,
    m=4). The codes Dataset is what the search pass reads — the
    compression IS the IO win at scale. Codebooks broadcast once."""
    import ray
    ref = ray.put(codebooks)

    def enc(t: pa.Table) -> pa.Table:
        cb = ray.get(ref)
        ids = t.column(id_col).combine_chunks()
        if t.num_rows == 0:  # empty block: typed empty, don't matmul (0,1)
            return pa.table({id_col: ids,
                             "pq_code": pa.array([], pa.binary(cb.shape[0]))})
        bm = _normalize(_batch_matrix(t, vec_col))
        codes = _pq_codes(bm, cb)
        # zero-copy fixed-size-binary column straight from the (n, m)
        # uint8 buffer — no per-row bytes objects
        col = pa.Array.from_buffers(
            pa.binary(codes.shape[1]), codes.shape[0],
            [None, pa.py_buffer(np.ascontiguousarray(codes).tobytes())])
        return pa.table({id_col: ids, "pq_code": col})

    return ds.map_batches(enc, batch_format="pyarrow",
                          **rayenv.remote_args())


def cosine_topk_pq(ds, query_ids: list[int], k: int = 10, m: int = 4,
                   ks: int = 16, id_col: str = "vec_id",
                   vec_col: str = "embedding", seed: int = 42,
                   rerank: int = 20) -> pd.DataFrame:
    """Approximate top-k by cosine over PQ-COMPRESSED vectors, the
    production two-stage shape (scan codes, re-rank a pool):

    1. train codebooks (seeded sample), compress the corpus
       (``pq_encode_ds``), and scan ONLY the codes — per query an
       asymmetric-distance lookup table ``lut[j, c] = q_j .
       codebook[j][c]`` turns scoring into ``sum_j lut[j, code_j]``
       (pure numpy gathers; no float vectors move) — keeping each
       query's top ``rerank*k`` pool;
    2. re-rank: fetch the FULL vectors of only the pooled ids (a
       broadcast id filter, Q*rerank*k ids) and compute exact cosine for
       the final top-k. PQ codes rank clusters well but not last-ulp
       neighbor order; the re-rank pass restores exactness for
       everything the pool caught.

    Same output shape as cosine_topk; rows-only (pool recall pinned in
    tests)."""
    import ray

    codebooks = train_pq(ds, m=m, ks=ks, seed=seed, vec_col=vec_col)
    codes_ds = pq_encode_ds(ds, codebooks, id_col=id_col, vec_col=vec_col)

    q = ds.map_batches(
        lambda t: t.filter(pa.compute.is_in(t[id_col],
                                            value_set=pa.array(query_ids))),
        batch_format="pyarrow", **rayenv.remote_args()).to_pandas()
    q = q.sort_values(id_col)
    qm = _normalize(np.stack(q[vec_col].to_numpy()).astype(np.float64))
    qids = q[id_col].to_numpy()
    dsub = qm.shape[1] // m
    # (Q, m, ks) inner-product lookup tables
    luts = np.stack([qm[:, j * dsub:(j + 1) * dsub] @ codebooks[j].T
                     for j in range(m)], axis=1)
    ref = ray.put((qids, luts))
    pool = rerank * k

    def local_pool(t: pa.Table) -> pa.Table:
        qi, lt = ray.get(ref)
        ids = t.column(id_col).combine_chunks().to_numpy(zero_copy_only=False)
        if ids.size == 0:  # empty block: argpartition(kth=-1) would raise
            return pa.table({"qid": pa.array([], pa.int64()),
                             "vec_id": pa.array([], pa.int64()),
                             "sim": pa.array([], pa.float64())})
        blob = t.column("pq_code").combine_chunks()
        width = blob.type.byte_width
        # fixed-size-binary data buffer is the flat (n, m) uint8 matrix
        # (respect a possible array offset from upstream slicing)
        flat = np.frombuffer(blob.buffers()[1], dtype=np.uint8)
        codes = flat.reshape(-1, width)[blob.offset:blob.offset + len(blob)]
        out_q, out_v, out_s = [], [], []
        kk = min(pool, ids.size)
        for r in range(qi.size):
            sims = np.zeros(ids.size, dtype=np.float64)
            for j in range(codes.shape[1]):
                sims += lt[r, j, codes[:, j]]
            order = np.argpartition(-sims, kk - 1)[:kk]
            out_q.extend([qi[r]] * kk)
            out_v.extend(ids[order])
            out_s.extend(sims[order])
        return pa.table({"qid": pa.array(out_q), "vec_id": pa.array(out_v),
                         "sim": pa.array(np.asarray(out_s, dtype=np.float64))})

    cand = codes_ds.map_batches(local_pool, batch_format="pyarrow",
                                **rayenv.remote_args()).to_pandas()
    cand = cand.sort_values(["qid", "sim"], ascending=[True, False])
    pooled = cand.groupby("qid").head(pool)
    per_q = {int(g): set(v["vec_id"]) for g, v in pooled.groupby("qid")}
    all_ids = sorted(set().union(*per_q.values()))
    pref = ray.put((qids, qm, per_q, all_ids))

    def exact_rerank(t: pa.Table) -> pa.Table:
        qi, qmat, pq, allv = ray.get(pref)
        keep = pa.compute.is_in(t[id_col], value_set=pa.array(allv))
        t = t.filter(keep)
        if t.num_rows == 0:
            return pa.table({"qid": pa.array([], pa.int64()),
                             "vec_id": pa.array([], pa.int64()),
                             "sim": pa.array([], pa.float64())})
        ids = t.column(id_col).combine_chunks().to_numpy(zero_copy_only=False)
        bm = _normalize(_batch_matrix(t, vec_col))
        sims = np.round(qmat @ bm.T, 6)
        out_q, out_v, out_s = [], [], []
        for r in range(qi.size):
            mask = np.isin(ids, list(pq[int(qi[r])]))
            sel = np.flatnonzero(mask)[:]
            out_q.extend([qi[r]] * sel.size)
            out_v.extend(ids[sel])
            out_s.extend(sims[r, sel])
        return pa.table({"qid": pa.array(out_q), "vec_id": pa.array(out_v),
                         "sim": pa.array(np.asarray(out_s, dtype=np.float64))})

    final = ds.map_batches(exact_rerank, batch_format="pyarrow",
                           **rayenv.remote_args()).to_pandas()
    return _rank_topk(final, k)


def cosine_topk_ivf(ds, query_ids: list[int], k: int = 10, n_clusters: int = 16,
                    nprobe: int = 4, id_col: str = "vec_id",
                    vec_col: str = "embedding", seed: int = 42,
                    train_rows: int = 4096) -> pd.DataFrame:
    """IVF-style approximate top-k: probe only nprobe centroid lists per
    query. Same output shape as cosine_topk; rows-only correctness (recall
    asserted in tests against the brute-force baseline).

    The coarse quantizer trains on a seeded RANDOM sample (round-2 fix): a
    head-of-dataset sample (``ds.limit``) sees only the first blocks, so on
    a corpus sorted/sharded by cluster the centroids would all land in the
    head's clusters and recall for tail clusters collapses (pinned by
    tests/test_similarity.py::test_ivf_random_sample_beats_head_sample)."""
    import ray

    n_total = ds.count()
    if n_total > train_rows:
        # oversample slightly, then trim — random_sample is per-row i.i.d.
        frac = min(1.0, 1.25 * train_rows / n_total)
        sample = ds.random_sample(frac, seed=seed).limit(train_rows).to_pandas()
    else:
        sample = ds.to_pandas()
    smat = _normalize(np.stack(sample[vec_col].to_numpy()).astype(np.float64))
    centroids = kmeans_lite(smat, min(n_clusters, smat.shape[0]), seed=seed)

    q = sample[sample[id_col].isin(query_ids)]
    missing = set(query_ids) - set(q[id_col])
    if missing:
        extra = ds.map_batches(
            lambda t: t.filter(pa.compute.is_in(
                t[id_col], value_set=pa.array(sorted(missing)))),
            batch_format="pyarrow", **rayenv.remote_args()).to_pandas()
        q = pd.concat([q, extra])
    q = q.sort_values(id_col)
    qm = _normalize(np.stack(q[vec_col].to_numpy()).astype(np.float64))
    qids = q[id_col].to_numpy()
    probes = np.argsort(-(qm @ centroids.T), axis=1)[:, :nprobe]  # (Q, nprobe)
    ref = ray.put((qids, qm, centroids, probes))

    def local_topk(t: pa.Table) -> pa.Table:
        qi, qmat, cents, pr = ray.get(ref)
        ids = t.column(id_col).combine_chunks().to_numpy(zero_copy_only=False)
        bm = _normalize(_batch_matrix(t, vec_col))
        assign = (bm @ cents.T).argmax(axis=1)
        out_q, out_v, out_s = [], [], []
        for r in range(qi.size):
            mask = np.isin(assign, pr[r])
            if not mask.any():
                continue
            # quantized + id-tie-broken BEFORE the local cut (see
            # cosine_topk.local_topk)
            sims = np.round(bm[mask] @ qmat[r], 6)
            sel_ids = ids[mask]
            kk = min(k, sel_ids.size)
            order = np.lexsort((sel_ids, -sims))[:kk]
            out_q.extend([qi[r]] * kk)
            out_v.extend(sel_ids[order])
            out_s.extend(sims[order])
        return pa.table({"qid": pa.array(out_q), "vec_id": pa.array(out_v),
                         "sim": pa.array(np.asarray(out_s, dtype=np.float64))})

    cand = ds.map_batches(local_topk, batch_format="pyarrow",
                          **rayenv.remote_args()).to_pandas()
    return _rank_topk(cand, k)


def group_centroids_ds(emb_ds, labels_ds, group_col: str = "source",
                       id_col: str = "doc_id", vec_id_col: str = "vec_id",
                       vec_col: str = "embedding"):
    """Per-group embedding centroids — the embedding-column aggregate of a
    curation pipeline (cluster balance checks, per-source drift, coarse
    quantizer seeds). Returns exploded ``(group, dim, mean_v)`` rows
    (1-based dim; means rounded to 4dp for cross-engine float stability).

    Scale shape: group labels join onto vectors with ONE bucketed shuffle
    (:func:`rwcf.joins.hash_join` — vectors move at most once); per-batch
    partials reduce each batch to (group, n, sum-vector) rows, so the
    final ``groupby(group)`` shuffles only ``groups x dim`` doubles, never
    vectors."""
    import pyarrow.compute as pc

    from .joins import hash_join

    joined = hash_join(emb_ds, labels_ds, on=vec_id_col, right_on=id_col,
                       how="inner")

    def partial(t: pa.Table) -> pa.Table:
        mat = _batch_matrix(t, vec_col)  # float64 BEFORE any summation
        groups = t.column(group_col).to_numpy(zero_copy_only=False)
        if mat.shape[0] == 0:
            return pa.table({
                group_col: pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
                "s": pa.array([], pa.list_(pa.float64()))})
        ug, inv = np.unique(groups, return_inverse=True)
        acc = np.zeros((ug.size, mat.shape[1]), dtype=np.float64)
        np.add.at(acc, inv, mat)
        n = np.bincount(inv, minlength=ug.size).astype(np.int64)
        return pa.table({
            group_col: pa.array(ug.astype(object), pa.string()),
            "n": pa.array(n),
            "s": pa.array(list(acc), pa.list_(pa.float64()))})

    def final(g: pa.Table) -> pa.Table:
        key = g.column(group_col)[0].as_py()
        n = int(pc.sum(g.column("n")).as_py())
        sl = g.column("s").combine_chunks()
        mat = sl.flatten().to_numpy(zero_copy_only=False) \
            .reshape(len(sl), -1)
        mean = np.round(mat.sum(axis=0) / n, 4)
        d = mean.size
        return pa.table({
            group_col: pa.array([key] * d, pa.string()),
            "dim": pa.array(np.arange(1, d + 1, dtype=np.int64)),
            "mean_v": pa.array(mean, pa.float64())})

    return (joined.map_batches(partial, batch_format="pyarrow",
                               **rayenv.remote_args())
            .groupby(group_col)
            .map_groups(final, batch_format="pyarrow",
                        **rayenv.remote_args()))


def kmeans_ds(emb_ds, k: int = 8, iters: int = 5, id_col: str = "vec_id",
              vec_col: str = "embedding", return_stats: bool = False,
              spill_dir: str | None = None):
    """Distributed Lloyd k-means over an embedding column — the iterative
    clustering pass a curation pipeline runs for topic balancing, coarse
    semantic dedup buckets, and IVF/PQ quantizer seeding at corpus scale.

    Deterministic seeding by construction: initial centroids are the
    vectors of the k ids with the SMALLEST shared-LCG id-hash
    (rwcf.analytics sample hash) — an order-free, cluster-size-free
    choice, so every run starts from identical seeds. Reruns on the
    same block layout are bit-identical; across DIFFERENT parallelism
    levels the centroid partial sums accumulate in a different block
    order, so clusters agree up to float64 last-ulp effects (a point
    exactly equidistant between centroids could flip — the usual
    distributed-kmeans caveat, not hidden by this operator). Each iteration:

      broadcast centroids (ray.put, k x dim — KBs)
        -> map_batches: argmin ||x - c||^2 assignment (one GEMM per
           batch), pre-reduced to per-batch (cluster, n, sum-vec) rows
        -> driver reduce of the k*blocks tiny partials (k x dim floats;
           corpus-size-independent, the legitimate driver-side footprint)

    so vectors never shuffle — only centroid-sized partials move, the
    same partial-then-final shape as group_centroids_ds. Lloyd's makes
    ``iters + 2`` full passes over the (column-pruned) input; the input
    is NEVER pinned in the object store — each pass streams by
    re-executing the lazy Dataset (for a parquet-sourced table that is a
    column-pruned re-read, the scale-correct default at 100 TB, where
    the embedding table can exceed cluster object-store capacity). When
    the upstream pipeline is expensive to recompute, pass ``spill_dir``:
    the projection is checkpointed to partitioned parquet ONCE and the
    passes stream from that checkpoint instead.

    Empty clusters keep their previous centroid (deterministic, no
    reseed). Returns the assignment Dataset ``(id, cluster, dist2)``;
    with ``return_stats`` also the final centroids and per-iteration
    inertia (exact float64 partial sums).
    """
    import ray

    from . import rayenv
    from .analytics import _SAMPLE_A, _SAMPLE_C, _SAMPLE_M

    if k <= 0 or iters <= 0:
        raise ValueError("k and iters must be positive")
    base = emb_ds.select_columns([id_col, vec_col])
    if spill_dir is not None:
        import ray.data as rd
        base.write_parquet(spill_dir)
        base = rd.read_parquet(spill_dir)

    # --- deterministic seed selection: k smallest LCG id-hashes ---------
    def seed_part(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        h = (ids.astype(np.int64) * _SAMPLE_A + _SAMPLE_C) % _SAMPLE_M
        cut = np.argsort(h, kind="stable")[:k]
        return pa.table({id_col: pa.array(ids[cut]),
                         "_h": pa.array(h[cut]),
                         vec_col: t.column(vec_col).take(pa.array(cut))})

    seeds = base.map_batches(seed_part, batch_format="pyarrow",
                             **rayenv.remote_args()).to_pandas()
    if len(seeds) < k:
        raise ValueError(f"k={k} exceeds row count {len(seeds)}")
    seeds = seeds.sort_values(["_h", id_col], kind="stable").head(k)
    cent = np.stack([np.asarray(v, dtype=np.float64)
                     for v in seeds[vec_col]])

    # --- Lloyd iterations ------------------------------------------------
    inertia_per_iter: list[float] = []
    for _ in range(iters):
        cref = ray.put(cent)

        def partial(t: pa.Table, _cref=cref) -> pa.Table:
            c = ray.get(_cref)
            mat = _batch_matrix(t, vec_col)
            if mat.shape[0] == 0:
                return pa.table({"cluster": pa.array([], pa.int64()),
                                 "n": pa.array([], pa.int64()),
                                 "d2": pa.array([], pa.float64()),
                                 "s": pa.array([], pa.list_(pa.float64()))})
            d2 = (mat * mat).sum(1)[:, None] - 2.0 * (mat @ c.T) \
                + (c * c).sum(1)[None, :]
            a = np.argmin(d2, axis=1)
            acc = np.zeros((k, mat.shape[1]), dtype=np.float64)
            np.add.at(acc, a, mat)
            n = np.bincount(a, minlength=k).astype(np.int64)
            dmin = np.maximum(d2[np.arange(a.size), a], 0.0)
            dsum = np.bincount(a, weights=dmin, minlength=k)
            keep = n > 0
            return pa.table({
                "cluster": pa.array(np.nonzero(keep)[0].astype(np.int64)),
                "n": pa.array(n[keep]),
                "d2": pa.array(dsum[keep]),
                "s": pa.array(list(acc[keep]), pa.list_(pa.float64()))})

        parts = base.map_batches(partial, batch_format="pyarrow",
                                 **rayenv.remote_args()).to_pandas()
        n_tot = np.zeros(k, dtype=np.int64)
        s_tot = np.zeros_like(cent)
        d_tot = 0.0
        for c_id, n_, d_, s_ in zip(parts["cluster"], parts["n"],
                                    parts["d2"], parts["s"]):
            n_tot[c_id] += n_
            d_tot += d_
            s_tot[c_id] += np.asarray(s_, dtype=np.float64)
        inertia_per_iter.append(float(d_tot))
        nz = n_tot > 0
        cent[nz] = s_tot[nz] / n_tot[nz, None]

    # --- final assignment pass (streaming, no driver materialization) ---
    cref = ray.put(cent)

    def assign(t: pa.Table, _cref=cref) -> pa.Table:
        c = ray.get(_cref)
        mat = _batch_matrix(t, vec_col)
        ids = t.column(id_col)
        if mat.shape[0] == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "cluster": pa.array([], pa.int64()),
                             "dist2": pa.array([], pa.float64())})
        d2 = (mat * mat).sum(1)[:, None] - 2.0 * (mat @ c.T) \
            + (c * c).sum(1)[None, :]
        a = np.argmin(d2, axis=1)
        return pa.table({
            id_col: ids,
            "cluster": pa.array(a.astype(np.int64)),
            "dist2": pa.array(np.maximum(d2[np.arange(a.size), a], 0.0))})

    out = base.map_batches(assign, batch_format="pyarrow",
                           **rayenv.remote_args())
    if return_stats:
        return out, cent, inertia_per_iter
    return out


def quantize_embeddings_ds(ds, id_col: str = "vec_id",
                           vec_col: str = "embedding"):
    """Per-vector symmetric int8 quantization — the 4x embedding-column
    compressor (float32 -> int8 + one scale) a retrieval pipeline applies
    before the ANN index. Emits per-vector audit rows
    ``(id, scale4, code_sum, code_min, code_max)`` so the layout is
    SQL-checkable end to end.

    Cross-engine exactness: scale = max|v|/127 with v widened
    float32->float64 BEFORE the division on both sides, and codes use
    ``floor(v/scale + 0.5)`` (round-half-up) instead of banker's
    rounding — the identical expression DuckDB evaluates, so every code
    is bit-equal, not approximately equal. Zero vectors quantize to
    scale 0 / all-zero codes.

    Scale shape: stateless vectorized map_batches (one abs-max + one
    fused divide-floor per batch matrix), zero shuffles; int8 codes are
    what ships downstream, 4 bytes/dim -> 1.
    """

    def quant(t: pa.Table) -> pa.Table:
        mat = _batch_matrix(t, vec_col)
        ids = t.column(id_col)
        if mat.shape[0] == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "scale4": pa.array([], pa.float64()),
                             "code_sum": pa.array([], pa.int64()),
                             "code_min": pa.array([], pa.int64()),
                             "code_max": pa.array([], pa.int64())})
        maxabs = np.abs(mat).max(axis=1)
        scale = maxabs / 127.0
        safe = np.where(scale > 0, scale, 1.0)
        codes = np.floor(mat / safe[:, None] + 0.5).astype(np.int64)
        codes[scale <= 0] = 0
        return pa.table({
            id_col: ids,
            "scale4": pa.array(np.round(scale, 4)),
            "code_sum": pa.array(codes.sum(axis=1)),
            "code_min": pa.array(codes.min(axis=1)),
            "code_max": pa.array(codes.max(axis=1))})

    from . import rayenv
    return ds.map_batches(quant, batch_format="pyarrow",
                          **rayenv.remote_args())


def embedding_dim_profile(ds, vec_col: str = "embedding",
                          scale: int = 1_000_000):
    """Per-dimension profile of an embedding column — count, quantized
    sum / min / max per coordinate (``floor(x * scale)`` int64, so the
    sums are bit-exact across engines and batch orders; float32 -> double
    widening is exact on both sides).  The sanity-audit step before any
    ANN / clustering stage: dead dimensions, scale drift, outlier
    coordinates.

    Scale shape: each batch reduces to ONE (dim, n, sum, min, max) row
    per dimension (a dim-sized partial, rows never leave the worker);
    the final groupby is dimension-domain-sized."""
    from ray.data.aggregate import Max, Min, Sum

    def partial(t: pa.Table) -> pa.Table:
        m = _batch_matrix(t, vec_col).astype(np.float64)
        q = np.floor(m * scale).astype(np.int64)
        d = m.shape[1] if m.size else 0
        dims = np.arange(d, dtype=np.int64)
        return pa.table({
            "dim": pa.array(dims),
            "n": pa.array(np.full(d, m.shape[0], dtype=np.int64)),
            "sum_q": pa.array(q.sum(axis=0, dtype=np.int64)
                              if d else np.empty(0, np.int64)),
            "min_q": pa.array(q.min(axis=0) if d else
                              np.empty(0, np.int64)),
            "max_q": pa.array(q.max(axis=0) if d else
                              np.empty(0, np.int64))})

    return (ds.map_batches(partial, batch_format="pyarrow",
                           **rayenv.remote_args())
            .groupby("dim")
            .aggregate(Sum("n", alias_name="n"),
                       Sum("sum_q", alias_name="sum_q"),
                       Min("min_q", alias_name="min_q"),
                       Max("max_q", alias_name="max_q")))


def embedding_gram(ds, vec_col: str = "embedding", scale: int = 10_000):
    """Distributed Gram matrix (X^T X) of the quantized embedding column —
    the sufficient statistic for PCA / covariance / whitening: per batch
    one int64 matmul reduces B rows to a single d x d partial (plus a row
    count); the exchange ships d*(d+1)/2 ints per batch regardless of
    corpus size. Quantization is ``floor(x * scale)`` int64 with exact
    float32 -> double widening, so the sums are bit-exact across engines
    and batch orders (the embedding_dim_profile trick, applied to second
    moments; scale=1e4 keeps sum(q_i * q_j) far inside int64 at 1e9 rows).
    Returns (i, j, n, sum_xy) rows for the upper triangle, 1-based dims
    to mirror SQL generate_subscripts."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        m = _batch_matrix(t, vec_col).astype(np.float64)
        if not m.size:
            return pa.table({"i": pa.array([], pa.int64()),
                             "j": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64()),
                             "sum_xy": pa.array([], pa.int64())})
        q = np.floor(m * scale).astype(np.int64)
        g = q.T @ q
        d = g.shape[0]
        iu, ju = np.triu_indices(d)
        return pa.table({
            "i": pa.array(iu.astype(np.int64) + 1),
            "j": pa.array(ju.astype(np.int64) + 1),
            "n": pa.array(np.full(iu.size, m.shape[0], dtype=np.int64)),
            "sum_xy": pa.array(g[iu, ju])})

    return (ds.map_batches(partial, batch_format="pyarrow",
                           **rayenv.remote_args())
            .groupby(["i", "j"])
            .aggregate(Sum("n", alias_name="n"),
                       Sum("sum_xy", alias_name="sum_xy")))
