"""Similarity search: brute-force cosine top-k + IVF approximate variant."""

import numpy as np
import pyarrow as pa
import pytest

from rwcf import similarity


@pytest.fixture(scope="module")
def emb_table():
    rng = np.random.default_rng(11)
    vecs = rng.normal(size=(200, 32)).astype(np.float32)
    return pa.table({"vec_id": pa.array(range(200), pa.int64()),
                     "embedding": pa.array(list(vecs), pa.list_(pa.float32()))})


def brute_force(t, qids, k):
    df = t.to_pandas()
    mat = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    ids = df["vec_id"].to_numpy()
    out = {}
    for q in qids:
        sims = mat @ mat[list(ids).index(q)]
        order = np.lexsort((ids, -sims))
        out[q] = list(ids[order][:k])
    return out


def test_cosine_topk_exact(ray_session, emb_table):
    import ray.data as rd
    ds = rd.from_arrow(emb_table).repartition(8)
    top = similarity.cosine_topk(ds, query_ids=[0, 5, 9], k=10)
    expect = brute_force(emb_table, [0, 5, 9], 10)
    for q in [0, 5, 9]:
        got = top[top["qid"] == q].sort_values("rank")["vec_id"].tolist()
        assert got == expect[q]
        assert got[0] == q  # self-similarity is rank 1


def test_cosine_topk_ivf_recall(ray_session, emb_table):
    import ray.data as rd
    ds = rd.from_arrow(emb_table).repartition(4)
    qids = [0, 5, 9]
    approx = similarity.cosine_topk_ivf(ds, query_ids=qids, k=10,
                                        n_clusters=8, nprobe=4)
    expect = brute_force(emb_table, qids, 10)
    recalls = []
    for q in qids:
        got = set(approx[approx["qid"] == q]["vec_id"])
        recalls.append(len(got & set(expect[q])) / 10)
    assert np.mean(recalls) >= 0.5  # nprobe=4/8 on random data
    # rank-1 must always be the query itself (its own cluster is probed)
    for q in qids:
        assert approx[(approx["qid"] == q) & (approx["rank"] == 1)]["vec_id"].iloc[0] == q


def test_kmeans_lite_deterministic():
    rng = np.random.default_rng(2)
    m = rng.normal(size=(100, 8))
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    c1 = similarity.kmeans_lite(m, 4, seed=7)
    c2 = similarity.kmeans_lite(m, 4, seed=7)
    assert np.array_equal(c1, c2)


def _two_cluster_table(n=1200, dim=16, seed=5):
    """Sorted-by-cluster corpus: first half tight around +c, second half
    around -c — the adversarial layout for head-of-dataset sampling."""
    rng = np.random.default_rng(seed)
    c = rng.normal(size=dim)
    c /= np.linalg.norm(c)
    half = n // 2
    a = c + 0.05 * rng.normal(size=(half, dim))
    b = -c + 0.05 * rng.normal(size=(half, dim))
    vecs = np.concatenate([a, b]).astype(np.float32)  # sorted by cluster
    return pa.table({"vec_id": pa.array(range(n), pa.int64()),
                     "embedding": pa.array(list(vecs), pa.list_(pa.float32()))})


def test_ivf_random_sample_beats_head_sample(ray_session):
    """On a cluster-sorted corpus, a head-trained quantizer never sees the
    second cluster (its queries land on degenerate far centroids), while
    the seeded random sample covers both — the round-2 sampling fix."""
    import ray.data as rd
    t = _two_cluster_table()
    ds = rd.from_arrow(t).repartition(8)
    qids = [700, 900, 1100]  # all from the UNSEEN (second) cluster
    expect = brute_force(t, qids, 10)

    # head-sample quantizer (the old behavior, reconstructed):
    head = t.to_pandas().head(128)
    hm = np.stack(head["embedding"].to_numpy()).astype(np.float64)
    hm /= np.linalg.norm(hm, axis=1, keepdims=True)
    head_cents = similarity.kmeans_lite(hm, 8)
    full = np.stack(t.to_pandas()["embedding"].to_numpy()).astype(np.float64)
    full /= np.linalg.norm(full, axis=1, keepdims=True)
    # with all centroids inside cluster A, every vector of cluster B maps
    # to one arbitrary nearest centroid => probing is uninformative; the
    # planted geometry makes every head centroid ~orthogonal-to-opposite
    # for cluster B, so the assignment is degenerate:
    spread = (full[600:] @ head_cents.T).max(axis=1)
    assert spread.mean() < 0  # cluster B is on the wrong side of every centroid

    # random-sample quantizer (current code): healthy recall on cluster B
    approx = similarity.cosine_topk_ivf(ds, query_ids=qids, k=10,
                                        n_clusters=2, nprobe=1,
                                        train_rows=128)
    recalls = []
    for q in qids:
        got = set(approx[approx["qid"] == q]["vec_id"])
        recalls.append(len(got & set(expect[q])) / 10)
    assert np.mean(recalls) >= 0.8


def test_pq_encode_compression_and_roundtrip_score(ray_session, emb_table):
    import ray.data as rd
    ds = rd.from_arrow(emb_table).repartition(4)
    cb = similarity.train_pq(ds, m=4, ks=16, seed=3)
    assert cb.shape == (4, 16, 8)  # dim 32 -> 4 subspaces of 8
    codes = similarity.pq_encode_ds(ds, cb).to_pandas()
    assert len(codes) == 200
    # 32 float32 (128 B) -> 4 bytes per vector: 32x compression
    assert all(len(c) == 4 for c in codes["pq_code"])
    # codes are deterministic across batchings
    codes2 = similarity.pq_encode_ds(rd.from_arrow(emb_table), cb).to_pandas()
    a = codes.sort_values("vec_id").reset_index(drop=True)
    b = codes2.sort_values("vec_id").reset_index(drop=True)
    assert (a["pq_code"] == b["pq_code"]).all()


def test_cosine_topk_pq_recall_on_clustered_data(ray_session):
    """On cluster-structured data (the realistic regime) PQ search over
    4-byte codes must place most of the exact top-10 in its top-10."""
    import ray.data as rd
    t = _two_cluster_table(n=800, dim=16, seed=9)
    ds = rd.from_arrow(t).repartition(4)
    qids = [0, 1, 400, 401]
    expect = brute_force(t, qids, 10)
    got_df = similarity.cosine_topk_pq(ds, qids, k=10, m=4, ks=32, seed=3)
    recalls = []
    for q in qids:
        got = set(got_df.loc[got_df["qid"] == q, "vec_id"])
        recalls.append(len(got & set(expect[q])) / 10)
    assert np.mean(recalls) >= 0.8, recalls


def test_group_centroids(ray_session):
    import pandas as pd
    import ray.data as rd
    rng = np.random.default_rng(3)
    n, d = 60, 5
    vecs = [rng.normal(size=d).astype(np.float32) for _ in range(n)]
    emb = pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.array([v.tolist() for v in vecs],
                              pa.list_(pa.float32()))})
    labels = pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "source": np.where(np.arange(n) % 3 == 0, "a", "b")})
    out = similarity.group_centroids_ds(
        rd.from_arrow(emb).repartition(4),
        rd.from_pandas(labels).repartition(3)).to_pandas() \
        .sort_values(["source", "dim"], ignore_index=True)
    mat = np.stack(vecs).astype(np.float64)
    for src, mask in (("a", np.arange(n) % 3 == 0),
                      ("b", np.arange(n) % 3 != 0)):
        want = np.round(mat[mask].mean(axis=0), 4)
        got = out[out.source == src].sort_values("dim")["mean_v"].to_numpy()
        np.testing.assert_allclose(got, want, atol=1e-12)
    assert out["dim"].min() == 1 and out["dim"].max() == d


def _local_lloyd(vecs_f32: np.ndarray, k: int, iters: int) -> tuple:
    """Single-process reference with the engine's exact init + update."""
    ids = np.arange(vecs_f32.shape[0], dtype=np.int64)
    h = (ids * 1103515245 + 12345) % (2 ** 31)
    order = np.lexsort((ids, h))
    cent = vecs_f32[order[:k]].astype(np.float64)
    x = vecs_f32.astype(np.float64)
    for _ in range(iters):
        d2 = (x * x).sum(1)[:, None] - 2 * x @ cent.T \
            + (cent * cent).sum(1)[None, :]
        a = np.argmin(d2, 1)
        for j in range(k):
            if (a == j).any():
                cent[j] = x[a == j].mean(0)
    d2 = (x * x).sum(1)[:, None] - 2 * x @ cent.T \
        + (cent * cent).sum(1)[None, :]
    return np.argmin(d2, 1), cent


def test_kmeans_ds_matches_local_reference(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(5)
    centers = rng.normal(size=(4, 16)) * 8.0
    lab = rng.integers(0, 4, 400)
    vecs = (centers[lab] + rng.normal(0, 0.4, (400, 16))).astype(np.float32)
    t = pa.table({"vec_id": pa.array(range(400), pa.int64()),
                  "embedding": pa.array(list(vecs), pa.list_(pa.float32()))})
    ds = rd.from_arrow(t).repartition(7)
    out, cent, inertia = similarity.kmeans_ds(ds, k=4, iters=4,
                                              return_stats=True)
    df = out.to_pandas().sort_values("vec_id")
    a_ref, c_ref = _local_lloyd(vecs, 4, 4)
    # well-separated blobs: distributed assignments == the local
    # reference's (partial-sum order cannot flip an argmin here)
    assert (df["cluster"].to_numpy() == a_ref).all()
    assert np.allclose(cent, c_ref, atol=1e-8)
    # inertia monotone non-increasing (Lloyd invariant)
    assert all(b <= a + 1e-9 for a, b in zip(inertia, inertia[1:]))
    # determinism across runs (same blocks, same seeds)
    out2 = similarity.kmeans_ds(ds, k=4, iters=4)
    df2 = out2.to_pandas().sort_values("vec_id")
    assert (df["cluster"].to_numpy() == df2["cluster"].to_numpy()).all()


def test_kmeans_ds_empty_cluster_keeps_centroid(ray_session):
    import ray.data as rd

    # two identical points and k=2: one cluster must go empty after the
    # first update and the op must neither crash nor emit NaNs
    t = pa.table({"vec_id": pa.array([0, 1], pa.int64()),
                  "embedding": pa.array([[1.0, 1.0], [1.0, 1.0]],
                                        pa.list_(pa.float32()))})
    out, cent, _ = similarity.kmeans_ds(rd.from_arrow(t), k=2, iters=3,
                                        return_stats=True)
    assert np.isfinite(cent).all()
    assert len(out.to_pandas()) == 2


def test_kmeans_ds_rejects_bad_params(ray_session):
    import ray.data as rd

    t = pa.table({"vec_id": pa.array([0], pa.int64()),
                  "embedding": pa.array([[1.0]], pa.list_(pa.float32()))})
    with pytest.raises(ValueError):
        similarity.kmeans_ds(rd.from_arrow(t), k=0)
    with pytest.raises(ValueError):
        similarity.kmeans_ds(rd.from_arrow(t), k=5, iters=2)


def test_quantize_embeddings(ray_session):
    import ray.data as rd

    t = pa.table({
        "vec_id": pa.array([0, 1, 2], pa.int64()),
        "embedding": pa.array([
            [1.0, -0.5, 0.25, -1.0],   # maxabs 1.0 -> scale 1/127
            [0.0, 0.0, 0.0, 0.0],      # zero vector -> scale 0, codes 0
            [2.54, -2.54, 1.27, 0.0],  # maxabs 2.54 -> scale 0.02
        ], pa.list_(pa.float32()))})
    out = similarity.quantize_embeddings_ds(rd.from_arrow(t)) \
        .to_pandas().sort_values("vec_id", ignore_index=True)
    # vec 0: codes are floor(v*127 + .5) = [127, -63, 32, -127]
    assert out.loc[0, "code_max"] == 127 and out.loc[0, "code_min"] == -127
    assert out.loc[0, "code_sum"] == 127 - 63 + 32 - 127
    # zero vector: all zero, scale 0
    assert out.loc[1, ["scale4", "code_sum", "code_min",
                       "code_max"]].tolist() == [0.0, 0, 0, 0]
    # the abs-max element always maps to +/-127 (symmetric scheme)
    assert out.loc[2, "code_max"] == 127 and out.loc[2, "code_min"] == -127
    assert abs(out.loc[2, "scale4"] - 0.02) < 1e-9


def test_cosine_topk_filtered_corpus(ray_session, emb_table):
    import ray.data as rd

    # corpus restricted to even ids, queries from the FULL table
    full = rd.from_arrow(emb_table)

    def keep_even(t):
        ids = t.column("vec_id").to_numpy(zero_copy_only=False)
        return t.filter(pa.array(ids % 2 == 0))

    corpus = full.map_batches(keep_even, batch_format="pyarrow")
    got = similarity.cosine_topk(corpus, query_ids=[1, 3], k=5,
                                 query_ds=full)
    # queries 1 and 3 are odd -> absent from the corpus, yet still
    # resolvable because query_ds is the unfiltered table
    assert set(got["qid"]) == {1, 3}
    assert (got["vec_id"].to_numpy() % 2 == 0).all()
    # parity vs the local filtered reference
    ref = brute_force(emb_table, [1, 3], 200)
    for q in (1, 3):
        want = [v for v in ref[q] if v % 2 == 0][:5]
        have = got.loc[got["qid"] == q].sort_values("rank")["vec_id"] \
            .tolist()
        assert have == want
