"""Near-dup-aware leakage-safe split: cluster labels from any upstream
clustering route every member of a near-duplicate cluster to one split;
with exact-dup clusters the result equals the exact variant.
"""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from rwcf import dedup
from rwcf.curation import (leakage_safe_split_counts,
                           leakage_safe_split_counts_clustered)


def _docs():
    rng = np.random.default_rng(11)
    texts = ["document number %d body %s" % (i, "y" * int(rng.integers(5, 40)))
             for i in range(150)]
    texts[120] = texts[3]          # exact dup pair
    texts[77] = texts[20]
    return pa.table({
        "doc_id": pa.array(np.arange(150, dtype=np.int64)),
        "text": pa.array(texts),
        "source": pa.array(["s%d" % (i % 2) for i in range(150)]),
    })


def _canon(df):
    return df.sort_values(["source", "split"], ignore_index=True) \
        .astype({"n_docs": "int64"})


def test_clustered_split_equals_exact_variant_on_exact_clusters(ray_session):
    t = _docs()
    ds = rd.from_arrow(t)
    pairs = rd.from_arrow(pa.table({   # the two exact-dup pairs
        "a_id": pa.array([3, 20], pa.int64()),
        "b_id": pa.array([120, 77], pa.int64()),
    }))
    clusters = dedup.cluster_pairs_ds(pairs, buckets=4)
    got = _canon(leakage_safe_split_counts_clustered(
        rd.from_arrow(t), clusters).to_pandas())
    exp = _canon(leakage_safe_split_counts(ds).to_pandas())
    assert got.equals(exp)


def test_clustered_split_keeps_near_dups_together(ray_session):
    # a NEAR-dup pair (not byte-identical -> invisible to the exact
    # variant) whose member ids hash to different splits on their own
    base = "the quick brown fox jumps over the lazy dog " * 4
    ids = np.arange(60, dtype=np.int64)
    h = ((ids * 1103515245 + 12345) % 2147483648) % 100
    # pick two ids landing in different plain-hash splits
    a = int(ids[h < 80][0])            # train on its own
    b = int(ids[h >= 90][0])           # test on its own
    rng = np.random.default_rng(13)
    alpha = np.array(list("abcdefghijklmnopqrstuvwxyz "))
    texts = ["".join(rng.choice(alpha, size=120))
             for _ in range(60)]  # mutually dissimilar random strings
    texts[a] = base + "tail-a"
    texts[b] = base + "tail-b"
    t = pa.table({
        "doc_id": pa.array(ids),
        "text": pa.array(texts),
        "source": pa.array(["s"] * 60),
    })
    cands = dedup.minhash_lsh_candidates_ds(rd.from_arrow(t))
    verified = dedup.verify_pairs_distributed(
        cands, rd.from_arrow(t), threshold=0.7, buckets=4)
    clusters = dedup.cluster_pairs_ds(verified, buckets=4)
    cl = clusters.to_pandas()
    assert set(cl["doc_id"]) == {a, b}  # only the planted near-dup pair
    out = leakage_safe_split_counts_clustered(
        rd.from_arrow(t), clusters).to_pandas()
    # both members take the cluster rep's (min id = a) split: the split
    # that would have held b alone lost one doc vs the plain id-hash
    split_of = {}
    for i in range(60):
        rep = min(a, b) if i in (a, b) else i
        hh = ((rep * 1103515245 + 12345) % 2147483648) % 100
        split_of[i] = "train" if hh < 80 else ("val" if hh < 90 else "test")
    import collections
    exp = collections.Counter(split_of.values())
    got = dict(zip(out["split"], out["n_docs"].astype(int)))
    assert got == dict(exp)
    assert split_of[a] == split_of[b]
