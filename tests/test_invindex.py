"""Inverted token index: partition-level posting shards make
needle-in-haystack token search decode only admitting partitions;
build is incremental/idempotent; results are exact vs brute force.
"""

import os

import numpy as np
import pyarrow.parquet as pq
import pytest

from rwcf import fixtures, invindex, pipeline


@pytest.fixture(scope="module")
def store(tmp_path_factory, ray_session):
    d = tmp_path_factory.mktemp("invidx")
    path = fixtures.tokens_parquet(600, seed=47, cache_dir=str(d / "tok"),
                                   row_group_size=100)
    out = str(d / "out")
    cfg = pipeline.EncodeConfig(out_dir=out, partition_token_budget=15_000)
    pipeline.encode_job(path, cfg, concurrency=2).materialize()
    res = invindex.build_token_index(out, concurrency=2)
    assert res["indexed"] == len(pipeline.load_manifest(out))
    return {"out": out, "src": pq.read_table(path)}


def _brute(src, tokens):
    ids = []
    for d, toks in zip(src.column("doc_id").to_pylist(),
                       src.column("tokens").to_pylist()):
        s = set(toks)
        if all(t in s for t in tokens):
            ids.append(d)
    return sorted(ids)


def _rare_tokens(src, k=2):
    """Needle tokens each present in only a few documents (Zipf tail)."""
    flat = np.concatenate([np.asarray(t) for t in
                           src.column("tokens").to_pylist()])
    vals, counts = np.unique(flat, return_counts=True)
    few = vals[(counts >= 2) & (counts <= 6)]
    assert len(few) >= k
    return [int(t) for t in few[:k]]


def test_needle_search_exact_and_pruned(store):
    out, src = store["out"], store["src"]
    tok = _rare_tokens(src, 1)
    admitted = invindex.token_partitions(out, tok, concurrency=2)
    total = len(pipeline.load_manifest(out))
    assert total > 4
    # a Zipf-tail token lives in few partitions: the index must prune
    assert 0 < len(admitted) < total

    got = invindex.scan_docs_with_tokens(out, tok, concurrency=2) \
        .to_pandas()
    assert sorted(got["doc_id"]) == _brute(src, tok)


def test_conjunctive_needle(store):
    out, src = store["out"], store["src"]
    toks = _rare_tokens(src, 2)
    got = invindex.scan_docs_with_tokens(out, toks, concurrency=2) \
        .to_pandas()
    assert sorted(got["doc_id"]) == _brute(src, toks)
    # common tokens hit everywhere but stay exact
    common = [0, 1]
    got = invindex.scan_docs_with_tokens(out, common, concurrency=2) \
        .to_pandas()
    assert sorted(got["doc_id"]) == _brute(src, common)


def test_build_incremental_and_stale_guard(store, tmp_path):
    out = store["out"]
    # rebuild: every shard already committed -> all skipped
    res = invindex.build_token_index(out, concurrency=2)
    assert res["indexed"] == 0 and res["skipped"] > 0

    # delete one shard: the query path must refuse (stale index), and an
    # incremental rebuild must restore ONLY that shard
    rows = pipeline.load_manifest(out)
    victim = rows[0]["pid"]
    shard = os.path.join(out, "index", "tokens", f"{victim}.parquet")
    os.remove(shard)
    with pytest.raises(FileNotFoundError, match="token index missing"):
        invindex.token_partitions(out, [1], concurrency=2)
    res = invindex.build_token_index(out, concurrency=2)
    assert res["indexed"] == 1
    assert os.path.exists(shard)


def test_multi_needle_batch_matches_single(store):
    out, src = store["out"], store["src"]
    toks = _rare_tokens(src, 4)
    queries = {"q1": toks[:1], "q2": toks[1:3], "q3": toks[3:4],
               "q_all": toks}  # incl. a probably-empty conjunction
    adm = invindex.token_partitions_multi(out, queries, concurrency=2)
    got = invindex.scan_docs_with_tokens_multi(out, queries,
                                               concurrency=2).to_pandas()
    for qid, need in queries.items():
        # per-query admitted set == the single-query path's
        assert adm[qid] == invindex.token_partitions(out, need,
                                                     concurrency=2)
        mine = sorted(got.loc[got["qid"] == qid, "doc_id"])
        assert mine == _brute(src, need), qid
