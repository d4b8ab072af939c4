"""Index-style access paths over the encoded store: late-materialized
predicate-driven page fetch, stats-only MIN/MAX, and doc_id point lookup
via truncated string zone maps (the reference's "efficient row skipping"
roadmap, wills-columnar-format.org:187-194, at row granularity)."""

import numpy as np
import pyarrow as pa
import pytest

from rwcf import fixtures, pipeline
from rwcf import format as fmt


@pytest.fixture(scope="module")
def sorted_store(tmp_path_factory, ray_session):
    """A source-clustered, small-page store: rows sorted by source so the
    predicate column's pages are prunable; page_target=512 bytes forces
    many zone-mapped pages per partition."""
    import pyarrow.parquet as pq
    d = tmp_path_factory.mktemp("latemat")
    tbl = fixtures.tokens_table(1500, seed=7)
    order = pa.compute.sort_indices(tbl, sort_keys=[("source", "ascending")])
    pq.write_table(tbl.take(order), str(d / "tokens.parquet"),
                   row_group_size=500)
    cfg = pipeline.EncodeConfig(out_dir=str(d / "out"),
                                partition_token_budget=50_000,
                                page_target=512)
    pipeline.encode_job(str(d / "tokens.parquet"), cfg).materialize()
    return cfg.out_dir, tbl.take(order)


def test_string_page_stats_bounds():
    """String zone maps are genuine lexicographic bounds even after
    truncation: max rounds UP, so no stored value can escape [lo, hi]."""
    vals = ["a" * 40, "zebra", "m" * 20, "aardvark", "zz"]
    lens = np.array([len(v) for v in vals], dtype=np.int64)
    payload = np.frombuffer("".join(vals).encode(), dtype=np.uint8)
    enc = fmt.encode_chunk((lens, payload), "str", "plain", page_target=16)
    stats = fmt.page_value_stats((lens, payload), "str", enc.pages)
    assert stats is not None and len(stats) == len(enc.pages)
    pos = 0
    for (lo, hi), p in zip(stats, enc.pages):
        seg = vals[pos:pos + p.values_count]
        pos += p.values_count
        for v in seg:
            assert lo <= v <= hi
        assert len(lo) <= fmt.STR_STAT_PREFIX
        assert len(hi) <= fmt.STR_STAT_PREFIX + 1


def test_late_materialized_sum_matches_and_prunes(sorted_store):
    out, tbl = sorted_store
    src = tbl.column("source").to_pylist()
    ntok = np.asarray(tbl.column("n_tok"))
    want_val = sorted(set(src))[0]
    exp_mask = np.array([s == want_val for s in src])
    res = pipeline.late_materialized_sum(out, "source", want_val, "n_tok") \
        .iloc[0]
    assert res["n_rows"] == int(exp_mask.sum())
    assert res["sum_val"] == int(ntok[exp_mask].astype(np.int64).sum())
    # the whole point: the source-clustered store skips value pages
    assert res["pages_kept"] < res["pages_total"]
    assert res["bytes_read"] < res["bytes_total"]


def test_late_materialized_range_sum(sorted_store):
    """Inclusive BETWEEN predicate pushed into the compressed domain:
    correct totals, value pages outside the source range never read, and
    wholly-disjoint partitions pruned by the zone-map overlap test."""
    out, tbl = sorted_store
    src = np.array(tbl.column("source").to_pylist())
    ntok = np.asarray(tbl.column("n_tok"), dtype=np.int64)
    uniq = sorted(set(src))
    lo, hi = uniq[1], uniq[min(3, len(uniq) - 1)]
    exp = (src >= lo) & (src <= hi)
    res = pipeline.late_materialized_sum(
        out, "source", val_col="n_tok", pred_between=(lo, hi)).iloc[0]
    assert res["n_rows"] == int(exp.sum())
    assert res["sum_val"] == int(ntok[exp].sum())
    assert 0 < res["pages_kept"] < res["pages_total"]
    assert res["bytes_read"] < res["bytes_total"]
    # a range covering nothing prunes every partition with zero IO
    none = pipeline.late_materialized_sum(
        out, "source", val_col="n_tok",
        pred_between=("\x00a", "\x00b")).iloc[0]
    assert none["n_rows"] == 0 and none["pages_kept"] == 0 \
        and none["bytes_read"] == 0


def test_late_materialized_sum_absent_value_zero_io(sorted_store):
    out, _tbl = sorted_store
    res = pipeline.late_materialized_sum(out, "source", "\x00nope",
                                         "n_tok").iloc[0]
    assert res["n_rows"] == 0 and res["sum_val"] == 0
    # partition-level stats prune every partition before any page read
    assert res["pages_kept"] == 0 and res["bytes_read"] == 0


def test_stats_only_minmax(sorted_store):
    out, tbl = sorted_store
    ntok = np.asarray(tbl.column("n_tok"), dtype=np.int64)
    res = pipeline.stats_only_minmax(out, "n_tok").iloc[0]
    assert res["lo"] == int(ntok.min()) and res["hi"] == int(ntok.max())


def test_lookup_docs_exact_and_pruned(sorted_store):
    out, tbl = sorted_store
    ids = tbl.column("doc_id").to_pylist()
    toks = tbl.column("tokens").to_pylist()
    probe = [ids[3], ids[700], ids[1499]]
    got = pipeline.lookup_docs(out, probe).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert sorted(got["doc_id"]) == sorted(probe)
    for _, row in got.iterrows():
        assert list(row["tokens"]) == toks[ids.index(row["doc_id"])]


def test_lookup_docs_missing_key_empty(sorted_store):
    out, _tbl = sorted_store
    ds = pipeline.lookup_docs(out, ["no-such-doc"])
    # blocks stay typed even when every partition prunes (Ray's to_pandas
    # drops columns on all-empty datasets, so assert on the Dataset schema)
    assert set(ds.schema().names) == {"doc_id", "tokens"}
    assert ds.count() == 0


def test_range_scan_docs(sorted_store):
    out, tbl = sorted_store
    ids = np.array(tbl.column("doc_id").to_pylist())
    ntok = np.asarray(tbl.column("n_tok"), dtype=np.int64)
    lo, hi = "doc-000000000100", "doc-000000000199"
    got = pipeline.range_scan_docs(out, lo, hi).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    mask = (ids >= lo) & (ids <= hi)
    assert list(got["doc_id"]) == sorted(ids[mask])
    exp = dict(zip(ids[mask], ntok[mask]))
    for _, row in got.iterrows():
        assert row["n_tok"] == exp[row["doc_id"]]


def test_range_scan_empty_range(sorted_store):
    out, _tbl = sorted_store
    ds = pipeline.range_scan_docs(out, "zzz", "zzzz")
    assert ds.count() == 0


def _group_expect(tbl, live_mask=None):
    import pandas as pd
    src = np.array(tbl.column("source").to_pylist())
    ntok = np.asarray(tbl.column("n_tok"), dtype=np.int64)
    if live_mask is not None:
        src, ntok = src[live_mask], ntok[live_mask]
    return pd.DataFrame({"source": src, "v": ntok}) \
        .groupby("source", as_index=False) \
        .agg(n_rows=("v", "size"), sum_val=("v", "sum")) \
        .sort_values("source").reset_index(drop=True)


def _group_assert(got, exp):
    got = got.sort_values("source").reset_index(drop=True)
    assert got["source"].tolist() == exp["source"].tolist()
    assert got["n_rows"].tolist() == exp["n_rows"].tolist()
    assert got["sum_val"].tolist() == exp["sum_val"].tolist()


def test_compressed_group_sum_rle_store(sorted_store):
    """Source-sorted store: the group column stores as RLE and the grouped
    aggregate reduces once per RUN (np.add.reduceat), never per row."""
    out, tbl = sorted_store
    _group_assert(pipeline.compressed_group_sum(out), _group_expect(tbl))


def test_compressed_group_sum_dict_plain_and_tombstones(tmp_path,
                                                        ray_session):
    """Dict stores aggregate via two bincounts over the codes; plain falls
    back to a vectorized Arrow group_by; tombstoned rows drop out."""
    import pyarrow.parquet as pq
    tbl = fixtures.tokens_table(300, seed=11)
    p = str(tmp_path / "t.parquet")
    pq.write_table(tbl, p)
    exp = _group_expect(tbl)
    outs = {}
    for codec in ("dict", "plain"):
        cfg = pipeline.EncodeConfig(out_dir=str(tmp_path / f"out-{codec}"),
                                    codecs=[codec],
                                    partition_token_budget=20_000)
        pipeline.encode_job(p, cfg).materialize()
        outs[codec] = cfg.out_dir
        _group_assert(pipeline.compressed_group_sum(cfg.out_dir), exp)
    ids = tbl.column("doc_id").to_pylist()
    dead = set(ids[:7])
    pipeline.delete_docs(outs["dict"], sorted(dead), concurrency=2)
    live = np.array([d not in dead for d in ids])
    _group_assert(pipeline.compressed_group_sum(outs["dict"]),
                  _group_expect(tbl, live))
