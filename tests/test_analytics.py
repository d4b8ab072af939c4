"""Unit tests for rwcf.analytics (heavy hitters, grouped top-k, exact
quantiles, distinct counts, deterministic sampling) and the as-of join,
each against an independent pandas/numpy ground truth."""

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from rwcf.analytics import (distinct_token_count, exact_quantiles,
                            grouped_topk, hash_sample, sample_hash_ok,
                            top_tokens)
from rwcf.joins import asof_join


@pytest.fixture()
def docs_frame():
    rng = np.random.default_rng(7)
    vocab = [f"w{i:02d}" for i in range(40)]
    # Zipf-ish draw so the top-k cut boundary has real competition
    p = 1.0 / np.arange(1, len(vocab) + 1)
    p /= p.sum()
    texts = ["  ".join(rng.choice(vocab, size=rng.integers(3, 30), p=p))
             for _ in range(300)]
    return pd.DataFrame({
        "doc_id": np.arange(300, dtype=np.int64),
        "text": texts,
        "source": rng.choice(["crawl", "wiki", "books"], 300),
        "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
    })


def _word_counts(texts) -> pd.Series:
    allw = [w for t in texts for w in t.split()]
    return pd.Series(allw).value_counts()


def test_top_tokens_matches_ground_truth(ray_session, docs_frame):
    import ray.data as rd
    k = 10
    got = top_tokens(rd.from_pandas(docs_frame).repartition(6),
                     k=k).to_pandas()
    vc = _word_counts(docs_frame["text"])
    want = (vc.rename_axis("token").reset_index(name="n")
            .sort_values(["n", "token"], ascending=[False, True])
            .head(k).reset_index(drop=True))
    got = got.sort_values(["n", "token"],
                          ascending=[False, True]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got[["token", "n"]],
                                  want[["token", "n"]],
                                  check_dtype=False)


def test_top_tokens_boundary_tie_is_deterministic(ray_session):
    """Four tokens with identical counts straddling the k=2 cut: the
    winners must be the lexicographically smallest, on every run."""
    import ray.data as rd
    df = pd.DataFrame({"text": ["d c b a", "a b c d", "b a d c"]})
    got = top_tokens(rd.from_pandas(df).repartition(3), k=2).to_pandas()
    assert sorted(got["token"]) == ["a", "b"]
    assert (got["n"] == 3).all()


def test_grouped_topk_matches_window_function(ray_session, docs_frame):
    import ray.data as rd
    got = grouped_topk(rd.from_pandas(docs_frame).repartition(6),
                       key_col="source", order_col="n_chars",
                       id_col="doc_id", k=5).to_pandas()
    df = docs_frame.copy()
    df["rank"] = (df.sort_values(["n_chars", "doc_id"],
                                 ascending=[False, True])
                  .groupby("source").cumcount() + 1)
    want = df[df["rank"] <= 5]
    cols = ["source", "doc_id", "n_chars", "rank"]
    got = got[cols].sort_values(cols).reset_index(drop=True)
    want = want[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_exact_quantiles_rank_semantics(ray_session, docs_frame):
    import ray.data as rd
    qs = (0.25, 0.5, 0.9, 0.99)
    got = exact_quantiles(rd.from_pandas(docs_frame).repartition(6),
                          "n_chars", qs=qs)
    v = np.sort(docs_frame["n_chars"].to_numpy())
    for q, row_v in zip(qs, got["v"]):
        r = max(1, math.ceil(q * v.size))
        assert row_v == v[r - 1], (q, row_v, v[r - 1])


def test_exact_quantiles_single_value(ray_session):
    import ray.data as rd
    df = pd.DataFrame({"x": np.full(10, 42, dtype=np.int64)})
    got = exact_quantiles(rd.from_pandas(df), "x", qs=(0.01, 0.99))
    assert (got["v"] == 42).all()


def test_distinct_token_count(ray_session, docs_frame):
    import ray.data as rd
    got = distinct_token_count(rd.from_pandas(docs_frame).repartition(6))
    want = len({w for t in docs_frame["text"] for w in t.split()})
    assert got["n_distinct"].iloc[0] == want


def test_hash_sample_deterministic_and_matches_mask(ray_session, docs_frame):
    import ray.data as rd
    a = hash_sample(rd.from_pandas(docs_frame).repartition(6), "doc_id",
                    pct=20, columns=["doc_id"]).to_pandas()
    b = hash_sample(rd.from_pandas(docs_frame).repartition(3), "doc_id",
                    pct=20, columns=["doc_id"]).to_pandas()
    ids = docs_frame["doc_id"].to_numpy()
    want = np.sort(ids[sample_hash_ok(ids, 20)])
    assert np.array_equal(np.sort(a["doc_id"].to_numpy()), want)
    # partitioning must not change the sample
    assert np.array_equal(np.sort(b["doc_id"].to_numpy()), want)


def test_hash_sample_pct_monotone():
    ids = np.arange(100_000, dtype=np.int64)
    k10 = sample_hash_ok(ids, 10)
    k50 = sample_hash_ok(ids, 50)
    # a row kept at 10% must be kept at 50% (nested samples)
    assert not np.any(k10 & ~k50)
    assert 0.08 < k10.mean() < 0.12
    assert 0.47 < k50.mean() < 0.53


@pytest.fixture()
def asof_frames():
    rng = np.random.default_rng(3)
    n_l, n_r = 400, 150
    left = pd.DataFrame({
        "k": rng.integers(0, 25, n_l).astype(np.int64),
        "ts": rng.integers(0, 10_000, n_l).astype(np.int64),
        "lx": np.arange(n_l, dtype=np.int64),
    })
    right = pd.DataFrame({
        "rk": rng.integers(0, 30, n_r).astype(np.int64),
        "rts": rng.integers(0, 10_000, n_r).astype(np.int64),
        "ry": np.arange(n_r, dtype=np.int64),
    })
    # determinism precondition: unique (key, ts) on the right
    right = right.drop_duplicates(["rk", "rts"]).reset_index(drop=True)
    return left, right


def test_asof_join_matches_merge_asof(ray_session, asof_frames):
    import ray.data as rd
    left, right = asof_frames
    got = asof_join(rd.from_pandas(left).repartition(5),
                    rd.from_pandas(right).repartition(3),
                    on="k", right_on="rk", left_ts="ts", right_ts="rts",
                    buckets=8).to_pandas()
    want = pd.merge_asof(left.sort_values("ts"), right.sort_values("rts"),
                         left_on="ts", right_on="rts", left_by="k",
                         right_by="rk", direction="backward")
    cols = ["k", "ts", "lx", "rk", "rts", "ry"]
    got = got[cols].sort_values(["lx"]).reset_index(drop=True)
    want = want[cols].sort_values(["lx"]).reset_index(drop=True)
    for c in ("rk", "rts", "ry"):
        got[c] = got[c].astype("Int64")
        want[c] = want[c].astype("Int64")
    pd.testing.assert_frame_equal(got, want)
    # every left row survives (left-join semantics)
    assert len(got) == len(left)


def test_asof_join_exact_match_and_no_match(ray_session):
    import ray.data as rd
    left = pd.DataFrame({"k": [1, 1, 2], "ts": [100, 50, 7],
                         "lx": [0, 1, 2]})
    left = left.astype(np.int64)
    right = pd.DataFrame({"k": [1, 1], "rts": [100, 60], "ry": [10, 11]})
    right = right.astype(np.int64)
    got = asof_join(rd.from_pandas(left), rd.from_pandas(right),
                    on="k", left_ts="ts", right_ts="rts",
                    buckets=4).to_pandas().sort_values("lx")
    # ts=100 takes the exact rts=100 match; ts=50 precedes every right
    # row; key 2 has no right rows at all
    assert got["ry"].tolist()[0] == 10
    assert pd.isna(got["ry"].tolist()[1])
    assert pd.isna(got["ry"].tolist()[2])


def test_asof_join_timestamp_columns(ray_session):
    """Timestamp[us] as-of columns (the events x orders shape) work
    end-to-end through the Arrow<->pandas boundary."""
    import ray.data as rd
    base = pd.Timestamp("2024-01-01")
    left = pd.DataFrame({
        "k": np.array([1, 1, 2], dtype=np.int64),
        "ts": [base + pd.Timedelta(minutes=m) for m in (5, 1, 9)],
        "lx": np.arange(3, dtype=np.int64)})
    right = pd.DataFrame({
        "k": np.array([1, 2], dtype=np.int64),
        "rts": [base + pd.Timedelta(minutes=m) for m in (2, 100)],
        "ry": np.array([7, 8], dtype=np.int64)})
    got = asof_join(rd.from_pandas(left), rd.from_pandas(right),
                    on="k", left_ts="ts", right_ts="rts",
                    buckets=4).to_pandas().sort_values("lx")
    assert got["ry"].astype("Int64").tolist() == [7, pd.NA, pd.NA]


def test_tfidf_scores_hand_computed(ray_session):
    import math

    import ray.data as rd

    from rwcf import analytics

    docs = pd.DataFrame({
        "doc_id": np.array([1, 2, 3, 4], dtype=np.int64),
        "text": ["a a b", "b c", "a c c d", "   "]})
    got = (analytics.tfidf_scores(rd.from_pandas(docs).repartition(3))
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    # df: a->2 docs, b->2, c->2, d->1 ; N=4
    ln2, ln4 = math.log(4 / 2), math.log(4 / 1)
    want = {
        1: (2, round(2 * ln2 + 1 * ln2, 4)),          # a a b
        2: (2, round(1 * ln2 + 1 * ln2, 4)),          # b c
        3: (3, round(1 * ln2 + 2 * ln2 + 1 * ln4, 4)),  # a c c d
    }
    # doc 4 is whitespace-only -> no terms -> absent (matches SQL oracle)
    assert got["doc_id"].tolist() == [1, 2, 3]
    for _, row in got.iterrows():
        n_terms, tfidf = want[int(row["doc_id"])]
        assert int(row["n_terms"]) == n_terms
        assert abs(float(row["tfidf"]) - tfidf) < 1e-9


def test_hll_distinct_accuracy_and_determinism(ray_session):
    import ray.data as rd

    from rwcf import analytics

    rng = np.random.default_rng(7)
    # ~8k distinct words, Zipf-ish repetition across 400 docs
    vocab = np.array([f"w{i}" for i in range(8000)], dtype=object)
    docs = pd.DataFrame({"doc_id": np.arange(400, dtype=np.int64),
                         "text": [" ".join(rng.choice(
                             vocab, size=120, p=None)) for _ in range(400)]})
    exact_words = set()
    for t in docs["text"]:
        exact_words.update(t.split())
    exact = len(exact_words)

    got = analytics.distinct_token_count_approx(
        rd.from_pandas(docs).repartition(7))
    est = int(got["n_distinct_approx"].iloc[0])
    # p=12 -> ~1.6% std error; pin at 5%
    assert abs(est - exact) / exact < 0.05

    # register merge is max -> the distributed estimate is DETERMINISTIC:
    # independent of batching
    got2 = analytics.distinct_token_count_approx(
        rd.from_pandas(docs).repartition(2))
    assert int(got2["n_distinct_approx"].iloc[0]) == est


def test_exact_quantiles_float_matches_sorted_rank(ray_session):
    import math

    import ray.data as rd

    from rwcf import analytics

    rng = np.random.default_rng(13)
    # mixed sign, heavy ties, and a huge-magnitude tail
    v = np.concatenate([rng.normal(0, 1, 5000),
                        np.full(500, 3.25),
                        rng.uniform(-1e12, 1e12, 300),
                        np.array([0.0, -0.0, 1e-300])])
    rng.shuffle(v)
    ds = rd.from_pandas(pd.DataFrame({"x": v})).repartition(6)
    qs = (0.01, 0.25, 0.5, 0.9, 0.999)
    got = analytics.exact_quantiles_float(ds, "x", qs=qs)
    sv = np.sort(v)
    n = v.size
    for _, row in got.iterrows():
        r = max(1, math.ceil(row["q"] * n))
        assert row["v"] == sv[r - 1], (row["q"], row["v"], sv[r - 1])


def test_exact_quantiles_float_nulls_and_empty(ray_session):
    import ray.data as rd

    from rwcf import analytics

    ds = rd.from_pandas(pd.DataFrame(
        {"x": pd.array([1.0, None, 2.0, np.nan, 3.0], dtype="Float64")}))
    got = analytics.exact_quantiles_float(ds, "x", qs=(0.5,))
    assert got["v"].tolist() == [2.0]

    empty = rd.from_pandas(pd.DataFrame({"x": pd.Series([], dtype="float64")}))
    got = analytics.exact_quantiles_float(empty, "x", qs=(0.5,))
    assert len(got) == 0


def test_grouped_quantiles_matches_sorted_rank(ray_session):
    import math

    import ray.data as rd

    from rwcf import analytics

    rng = np.random.default_rng(17)
    keys = rng.choice(np.array(["a", "b", "c", "d"], dtype=object), 3000)
    vals = rng.integers(0, 50, 3000).astype(np.int64)  # heavy ties
    df = pd.DataFrame({"src": keys, "x": vals})
    qs = (0.25, 0.5, 0.9)
    got = (analytics.grouped_quantiles(
        rd.from_pandas(df).repartition(5), "src", "x", qs=qs)
        .to_pandas().sort_values(["src", "q"]).reset_index(drop=True))
    for (k, q), grp in got.groupby(["src", "q"]):
        sv = np.sort(df.loc[df["src"] == k, "x"].to_numpy())
        r = max(1, math.ceil(q * sv.size))
        assert grp["v"].iloc[0] == sv[r - 1], (k, q)
    assert len(got) == 4 * len(qs)


def test_grouped_quantiles_wide_domain_key_routes_to_sample(ray_session):
    # a key whose distinct-value domain exceeds max_distinct_per_key must
    # not need a worker-sized histogram: it routes to the bounded per-key
    # bottom-k sample (~1/sqrt(k) rank error); narrow keys stay EXACT in
    # the same call
    import math

    import ray.data as rd

    from rwcf import analytics

    rng = np.random.default_rng(41)
    n_wide = 60_000
    wide_vals = rng.integers(0, 10_000_000, n_wide).astype(np.int64)
    narrow_vals = rng.integers(0, 20, 2000).astype(np.int64)
    df = pd.DataFrame({
        "src": np.concatenate([np.full(n_wide, "wide", dtype=object),
                               np.full(2000, "narrow", dtype=object)]),
        "x": np.concatenate([wide_vals, narrow_vals])})
    qs = (0.25, 0.5, 0.9)
    got = (analytics.grouped_quantiles(
        rd.from_pandas(df).repartition(4), "src", "x", qs=qs,
        max_distinct_per_key=1000, sample_k=4096)
        .to_pandas().sort_values(["src", "q"]).reset_index(drop=True))
    assert len(got) == 2 * len(qs)
    # narrow key: exact SQL row_number semantics
    sv = np.sort(narrow_vals)
    for q in qs:
        r = max(1, math.ceil(q * sv.size))
        v = got[(got["src"] == "narrow") & (got["q"] == q)]["v"].iloc[0]
        assert v == sv[r - 1], q
    # wide key: sampled — true rank of the reported value within
    # 3/sqrt(k) of the requested quantile
    svw = np.sort(wide_vals)
    tol = 3.0 / math.sqrt(4096)
    for q in qs:
        v = got[(got["src"] == "wide") & (got["q"] == q)]["v"].iloc[0]
        rank = np.searchsorted(svw, v, side="right") / svw.size
        assert abs(rank - q) < tol, (q, rank)


def test_cms_top_tokens_matches_exact_on_zipf(ray_session):
    import ray.data as rd

    from rwcf import analytics

    rng = np.random.default_rng(23)
    vocab = np.array([f"tok{i}" for i in range(3000)], dtype=object)
    p = 1.0 / np.arange(1, vocab.size + 1) ** 1.3
    p /= p.sum()
    docs = pd.DataFrame({
        "doc_id": np.arange(300, dtype=np.int64),
        "text": [" ".join(rng.choice(vocab, size=150, p=p))
                 for _ in range(300)]})
    exact = {}
    for t in docs["text"]:
        for w in t.split():
            exact[w] = exact.get(w, 0) + 1

    got = analytics.cms_top_tokens(rd.from_pandas(docs).repartition(6),
                                   k=20)
    # CMS never underestimates; with width >> heavy-hitter count the
    # estimates are exact and the top-k matches the true top-k
    want = sorted(exact.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    assert got["token"].tolist() == [w for w, _ in want]
    for _, row in got.iterrows():
        assert row["n_est"] >= exact[row["token"]]
    # exactness at this width (no collisions among heavy cells expected)
    assert (got["n_est"].to_numpy()
            == np.array([n for _, n in want])).mean() > 0.9


def test_exact_quantiles_nulls_and_empty(ray_session):
    import ray.data as rd

    from rwcf import analytics

    ds = rd.from_pandas(pd.DataFrame(
        {"x": pd.array([1, None, 2, None, 3], dtype="Int64")}))
    got = analytics.exact_quantiles(ds, "x", qs=(0.5, 0.99))
    # nulls excluded (SQL semantics): median of [1,2,3] is 2
    assert got["v"].tolist() == [2, 3]

    empty = rd.from_pandas(pd.DataFrame({"x": pd.Series([], dtype="int64")}))
    assert len(analytics.exact_quantiles(empty, "x")) == 0


def test_sketches_tolerate_empty_corpus(ray_session):
    import ray.data as rd

    from rwcf import analytics

    empty = rd.from_pandas(pd.DataFrame({"text": pd.Series([], dtype="object"),
                                         "doc_id": pd.Series([], dtype="int64")}))
    assert int(analytics.distinct_token_count(empty)["n_distinct"].iloc[0]) == 0
    assert int(analytics.distinct_token_count_approx(empty)
               ["n_distinct_approx"].iloc[0]) == 0
    assert len(analytics.cms_top_tokens(empty)) == 0


def test_stratified_sample_rates_and_determinism(ray_session):
    import ray.data as rd

    from rwcf import analytics

    n = 20_000
    df = pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "source": np.where(np.arange(n) % 2 == 0, "big", "small")})
    got = analytics.stratified_sample(
        rd.from_pandas(df).repartition(5), "doc_id", "source",
        {"big": 10, "small": 80}).to_pandas()
    big = got[got["source"] == "big"]
    small = got[got["source"] == "small"]
    assert abs(len(big) / (n / 2) - 0.10) < 0.02
    assert abs(len(small) / (n / 2) - 0.80) < 0.02
    # deterministic: same rows regardless of batching
    got2 = analytics.stratified_sample(
        rd.from_pandas(df), "doc_id", "source",
        {"big": 10, "small": 80}).to_pandas()
    assert sorted(got2["doc_id"]) == sorted(got["doc_id"])
    # unknown keys use default_pct=0 -> dropped entirely
    got3 = analytics.stratified_sample(
        rd.from_pandas(df), "doc_id", "source", {"other": 50}).to_pandas()
    assert len(got3) == 0


def test_deterministic_shuffle_order(ray_session):
    import ray.data as rd

    from rwcf import analytics
    n = 5000
    df = pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64),
                       "source": ["s"] * n})
    out = analytics.deterministic_shuffle(
        rd.from_pandas(df).repartition(7)).to_pandas()
    # full order = numpy-computed LCG order with id tie-break
    h = (np.arange(n, dtype=np.int64) * 1103515245 + 12345) % (2 ** 31)
    expect = np.arange(n)[np.lexsort((np.arange(n), h))]
    assert out["doc_id"].tolist() == expect.tolist()
    # deterministic across partitionings
    out2 = analytics.deterministic_shuffle(
        rd.from_pandas(df).repartition(3)).to_pandas()
    assert out2["doc_id"].tolist() == out["doc_id"].tolist()


def test_shuffle_head_is_prefix(ray_session):
    import ray.data as rd

    from rwcf import analytics
    df = pd.DataFrame({"doc_id": np.arange(1000, dtype=np.int64)})
    full = analytics.deterministic_shuffle(rd.from_pandas(df)).to_pandas()
    head = analytics.shuffle_head(rd.from_pandas(df), k=50).to_pandas()
    assert head["doc_id"].tolist() == full["doc_id"].tolist()[:50]


def test_unigram_logprob_scores(ray_session):
    import ray.data as rd

    from rwcf import analytics
    # corpus: 6 tokens total; p(a)=3/6, p(b)=2/6, p(c)=1/6
    df = pd.DataFrame({"doc_id": [0, 1], "text": ["a a b", "b c a"]})
    out = analytics.unigram_logprob_scores(rd.from_pandas(df)) \
        .to_pandas().sort_values("doc_id", ignore_index=True)
    pa_, pb, pc_ = math.log(3 / 6), math.log(2 / 6), math.log(1 / 6)
    assert out["n_tokens"].tolist() == [3, 3]
    assert out["avg_logprob"][0] == round((2 * pa_ + pb) / 3, 4)
    assert out["avg_logprob"][1] == round((pb + pc_ + pa_) / 3, 4)
    # a rare-token doc scores lower than a common-token doc
    df2 = pd.DataFrame({"doc_id": [0, 1, 2],
                        "text": ["x x x x", "x x x x", "q"]})
    out2 = analytics.unigram_logprob_scores(rd.from_pandas(df2)) \
        .to_pandas().sort_values("doc_id", ignore_index=True)
    assert out2["avg_logprob"][2] < out2["avg_logprob"][0]


def test_zscore_by_group(ray_session):
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from rwcf.analytics import zscore_by_group

    rng = np.random.default_rng(9)
    df = pd.DataFrame({
        "doc_id": np.arange(300, dtype=np.int64),
        "source": np.array(["a", "b", "c"])[rng.integers(0, 3, 300)],
        "n_chars": rng.integers(10, 900, 300).astype(np.int64),
    })
    # one constant group: zero variance must yield z=0, not NaN/inf
    df.loc[df["source"] == "c", "n_chars"] = 77
    out = zscore_by_group(rd.from_pandas(df).repartition(4)) \
        .to_pandas().sort_values("doc_id", ignore_index=True)
    ref = df.sort_values("doc_id", ignore_index=True)
    for g, sub in ref.groupby("source"):
        x = sub["n_chars"].to_numpy(dtype=np.int64)
        n, s, ssq = len(x), int(x.sum()), int((x * x).sum())
        den2 = n * ssq - s * s
        z = np.zeros(len(x)) if den2 <= 0 else \
            np.round((n * x - s) / np.sqrt(float(den2)), 4)
        got = out.loc[out["source"] == g, "zscore"].to_numpy()
        assert np.array_equal(np.asarray(z, dtype=np.float64), got)
    # z-scores within a group are standardized up to the sqrt(n) factor:
    # mean exactly 0 after the shared scaling
    for g in ["a", "b"]:
        zg = out.loc[out["source"] == g, "zscore"]
        assert abs(zg.mean()) < 1e-3


def test_bigram_logprob_scores(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from rwcf.analytics import bigram_logprob_scores

    docs = pd.DataFrame({
        "doc_id": np.arange(5, dtype=np.int64),
        "text": ["a b a b c",      # bigrams: ab, ba, ab, bc
                 "a b",            # ab
                 "c c c",          # cc, cc
                 "solo",           # no bigram -> no output row
                 "b c"],           # bc
    })
    out = bigram_logprob_scores(rd.from_pandas(docs).repartition(3)) \
        .to_pandas().sort_values("doc_id", ignore_index=True)
    # corpus bigram counts: ab=3, ba=1, bc=2, cc=2; contexts:
    # c(a,*)=3, c(b,*)=3, c(c,*)=2
    lp = {"a b": np.log(3 / 3), "b a": np.log(1 / 3),
          "b c": np.log(2 / 3), "c c": np.log(2 / 2)}
    exp = {
        0: round((lp["a b"] + lp["b a"] + lp["a b"] + lp["b c"]) / 4, 4),
        1: round(lp["a b"], 4),
        2: round((lp["c c"] + lp["c c"]) / 2, 4),
        4: round(lp["b c"], 4),
    }
    assert out["doc_id"].tolist() == [0, 1, 2, 4]  # doc 3 has no bigrams
    assert out["n_bigrams"].tolist() == [4, 1, 2, 1]
    got = dict(zip(out["doc_id"], out["avg_bigram_logprob"]))
    for d, v in exp.items():
        assert abs(got[d] - v) < 1e-9


def test_sample_k_per_group_exact_quota_and_append_stability(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from rwcf.analytics import sample_k_per_group

    rng = np.random.default_rng(4)
    df = pd.DataFrame({
        "doc_id": np.arange(200, dtype=np.int64),
        "source": np.array(["a", "b", "c", "d"])[rng.integers(0, 4, 200)],
    })
    out = sample_k_per_group(rd.from_pandas(df).repartition(5), k=7) \
        .to_pandas()
    # exact quota per group (every group here has > 7 members)
    assert (out.groupby("source").size() == 7).all()
    # matches the local rank-by-hash reference
    h = (df["doc_id"] * 1103515245 + 12345) % 2 ** 31
    ref = df.assign(h=h).sort_values(["source", "h", "doc_id"])
    ref["sample_rank"] = ref.groupby("source").cumcount() + 1
    ref = ref[ref["sample_rank"] <= 7]
    got = out.sort_values(["source", "sample_rank"], ignore_index=True)
    exp = ref.sort_values(["source", "sample_rank"],
                          ignore_index=True)
    assert (got["doc_id"].to_numpy() == exp["doc_id"].to_numpy()).all()
    # reservoir property: appending rows only displaces, never reshuffles
    df2 = pd.concat([df, pd.DataFrame({
        "doc_id": np.arange(200, 260, dtype=np.int64),
        "source": ["a"] * 60})], ignore_index=True)
    out2 = sample_k_per_group(rd.from_pandas(df2).repartition(5), k=7) \
        .to_pandas()
    for g in ["b", "c", "d"]:  # untouched groups identical
        a = set(out.loc[out["source"] == g, "doc_id"])
        b = set(out2.loc[out2["source"] == g, "doc_id"])
        assert a == b
    # the grown group keeps every old member whose hash still ranks <= 7
    old_a = out.loc[out["source"] == "a"].set_index("doc_id")["sample_rank"]
    new_a = out2.loc[out2["source"] == "a"].set_index("doc_id")
    for d in new_a.index:
        if d < 200:
            assert d in old_a.index  # survivors were already sampled


def test_bottomk_sample_quantiles(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from rwcf.analytics import bottomk_sample_quantiles

    rng = np.random.default_rng(7)
    n = 100_000
    df = pd.DataFrame({"event_id": np.arange(n, dtype=np.int64),
                       "value": rng.normal(0, 10, n)})
    out = bottomk_sample_quantiles(rd.from_pandas(df).repartition(8),
                                   k=4096)
    assert (out["n_total"] == n).all()
    # rank error ~1/sqrt(k): the sample quantile's true rank must be
    # within 3.5/sqrt(k) of q (a ~3.5-sigma bound -> deterministic here
    # since the sample is a fixed LCG selection)
    vals = np.sort(df["value"].to_numpy())
    for _, r in out.iterrows():
        true_rank = np.searchsorted(vals, r["v"]) / n
        assert abs(true_rank - r["q"]) < 3.5 / np.sqrt(4096)
    # determinism + mergeability: a different partitioning gives the
    # IDENTICAL sketch (bottom-k is partition-invariant)
    out2 = bottomk_sample_quantiles(rd.from_pandas(df).repartition(31),
                                    k=4096)
    assert (out["v"].to_numpy() == out2["v"].to_numpy()).all()
    # all-NaN input -> empty frame, no crash
    df3 = pd.DataFrame({"event_id": np.arange(10, dtype=np.int64),
                        "value": np.full(10, np.nan)})
    out3 = bottomk_sample_quantiles(rd.from_pandas(df3), k=64)
    assert out3.empty


def test_grouped_distinct_count(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from rwcf.analytics import grouped_distinct_count

    df = pd.DataFrame({
        "doc_id": np.arange(6, dtype=np.int64),
        "source": ["a", "a", "b", "b", "b", "c"],
        "text": ["x y z", "y z w", "x x x", "x y", "  ", "q"],
    })
    out = grouped_distinct_count(rd.from_pandas(df).repartition(3)) \
        .to_pandas().sort_values("source", ignore_index=True)
    # a: {x,y,z,w}=4; b: {x,y}=2 (whitespace-only doc contributes none);
    # c: {q}=1
    assert out["source"].tolist() == ["a", "b", "c"]
    assert out["n_distinct"].tolist() == [4, 2, 1]


def test_grouped_distinct_count_approx(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from rwcf.analytics import grouped_distinct_count_approx

    rng = np.random.default_rng(13)
    # two groups with known vocabulary sizes (2000 and 400 words)
    rows = []
    for i in range(3000):
        g = "big" if i % 2 == 0 else "small"
        vocab = 2000 if g == "big" else 400
        rows.append({"doc_id": i, "source": g,
                     "text": " ".join(f"w{g}{rng.integers(0, vocab)}"
                                      for _ in range(20))})
    df = pd.DataFrame(rows)
    out = grouped_distinct_count_approx(rd.from_pandas(df).repartition(5)) \
        .to_pandas().set_index("source")["n_distinct_est"]
    exact = (df.assign(w=df["text"].str.split())
             .explode("w").groupby("source")["w"].nunique())
    for g in ("big", "small"):
        err = abs(out[g] - exact[g]) / exact[g]
        assert err < 0.05, (g, out[g], exact[g])
    # partition-invariance of the merged sketch
    out2 = grouped_distinct_count_approx(
        rd.from_pandas(df).repartition(17)).to_pandas() \
        .set_index("source")["n_distinct_est"]
    assert (out.sort_index() == out2.sort_index()).all()


def test_value_histogram(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from rwcf.analytics import value_histogram

    df = pd.DataFrame({"event_id": np.arange(7, dtype=np.int64),
                       "value": [-30.0, -0.1, 0.0, 24.9, 25.0, 60.0,
                                 np.nan]})
    out = value_histogram(rd.from_pandas(df).repartition(3), width=25.0) \
        .to_pandas().sort_values("bin_start", ignore_index=True)
    # floor toward -inf: -30 -> bin -50, -0.1 -> bin -25 (NOT 0)
    got = dict(zip(out["bin_start"], out["n"]))
    assert got == {-50.0: 1, -25.0: 1, 0.0: 2, 25.0: 1, 50.0: 1}


def test_mix_sources(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from rwcf.analytics import mix_sources

    df = pd.DataFrame({
        "doc_id": np.arange(3000, dtype=np.int64),
        "source": np.array(["heavy", "light", "tiny"])[
            np.r_[np.zeros(2000, int), np.ones(990, int),
                  np.full(10, 2)]],
    })
    out = mix_sources(rd.from_pandas(df).repartition(4),
                      weights={"heavy": 1, "light": 1, "tiny": 1},
                      target_rows=300).to_pandas()
    got = out.groupby("source").size()
    # equal weights -> ~100 rows per source quota; 'tiny' has only 10
    # rows, quota caps at keep-all (p=1000)
    assert got["tiny"] == 10
    assert abs(got["heavy"] - 100) < 35   # hash-uniform tolerance
    assert abs(got["light"] - 100) < 35
    # deterministic: rerun selects the identical ids
    out2 = mix_sources(rd.from_pandas(df).repartition(9),
                       weights={"heavy": 1, "light": 1, "tiny": 1},
                       target_rows=300).to_pandas()
    assert set(out["doc_id"]) == set(out2["doc_id"])
    # weighting shifts the mix: heavy at weight 4 takes ~4x light's share
    out3 = mix_sources(rd.from_pandas(df).repartition(4),
                       weights={"heavy": 4, "light": 1, "tiny": 1},
                       target_rows=300).to_pandas()
    g3 = out3.groupby("source").size()
    assert g3["heavy"] > 2.5 * g3["light"]


def test_top_words_per_group(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from rwcf.analytics import top_words_per_group

    df = pd.DataFrame({
        "doc_id": np.arange(4, dtype=np.int64),
        "source": ["a", "a", "b", "b"],
        "text": ["x x x y y z", "y z", "p q", "q q p  "],
    })
    out = top_words_per_group(rd.from_pandas(df).repartition(2), k=2) \
        .to_pandas().sort_values(["source", "rank"], ignore_index=True)
    # a: x=3, y=3 -> tie broken by word asc (x first); b: q=3, p=2
    assert out.values.tolist() == [
        ["a", "x", 3, 1], ["a", "y", 3, 2],
        ["b", "q", 3, 1], ["b", "p", 2, 2]]


def test_grouped_ntile(ray_session):
    # NTILE fill rule (first count%n tiles one row larger) vs pandas qcut-
    # free reference, incl. a group SMALLER than n (tiles 1..size, one row
    # each) and deterministic (order, id) tie-breaks
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from rwcf.analytics import grouped_ntile

    rng = np.random.default_rng(7)
    sizes = {"a": 10, "b": 7, "c": 2, "d": 4}   # c: group < n
    rows = []
    i = 0
    for k, sz in sizes.items():
        for _ in range(sz):
            rows.append((i, k, int(rng.integers(0, 5))))  # heavy ties
            i += 1
    df = pd.DataFrame(rows, columns=["doc_id", "source", "n_chars"])
    out = grouped_ntile(rd.from_pandas(df).repartition(3),
                        key_col="source", order_col="n_chars",
                        id_col="doc_id", n=4) \
        .to_pandas().sort_values("doc_id", ignore_index=True)

    def ref_ntile(g, n=4):
        g = g.sort_values(["n_chars", "doc_id"], ignore_index=True)
        m = len(g)
        big, small = m % n, m // n
        tiles = []
        for t in range(1, n + 1):
            tiles += [t] * (small + (1 if t <= big else 0))
        g["tile"] = tiles[:m]
        return g

    ref = (df.groupby("source", group_keys=False)[df.columns]
           .apply(ref_ntile).sort_values("doc_id", ignore_index=True))
    assert out["tile"].tolist() == ref["tile"].tolist()
    assert len(out) == len(df)
    # every group's tile counts obey the fill rule
    cnt = out.groupby(["source", "tile"]).size()
    for k, sz in sizes.items():
        per = cnt[k]
        assert per.max() - per.min() <= 1
        assert per.sum() == sz


def test_grouped_rank(ray_session):
    # RANK gaps after ties, DENSE_RANK doesn't; vs pandas rank methods
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from rwcf.analytics import grouped_rank

    rng = np.random.default_rng(5)
    n = 200
    df = pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "source": [f"s{int(x)}" for x in rng.integers(0, 6, n)],
        "n_chars": rng.integers(0, 9, n),   # heavy ties
    })
    out = grouped_rank(rd.from_pandas(df).repartition(3),
                       key_col="source", order_col="n_chars",
                       id_col="doc_id") \
        .to_pandas().sort_values("doc_id", ignore_index=True)
    g = df.groupby("source")["n_chars"]
    exp_rnk = g.rank(method="min").astype(np.int64)
    exp_dense = g.rank(method="dense").astype(np.int64)
    assert out["rnk"].tolist() == exp_rnk.tolist()
    assert out["dense_rnk"].tolist() == exp_dense.tolist()
    assert len(out) == n


def test_grouped_corr(ray_session):
    # exact-integer-moment Pearson corr vs numpy corrcoef (4dp), with a
    # constant-column group and a single-row group emitting NULL
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from rwcf.analytics import grouped_corr

    rng = np.random.default_rng(23)
    frames = []
    for k, sz in (("a", 50), ("b", 80)):
        x = rng.integers(10, 500, sz)
        y = (x * 0.2 + rng.integers(0, 40, sz)).astype(np.int64)
        frames.append(pd.DataFrame(
            {"source": k, "n_chars": x, "n_words": y}))
    frames.append(pd.DataFrame(
        {"source": "const", "n_chars": [5, 5, 5], "n_words": [1, 2, 3]}))
    frames.append(pd.DataFrame(
        {"source": "single", "n_chars": [9], "n_words": [4]}))
    df = pd.concat(frames, ignore_index=True)
    out = grouped_corr(rd.from_pandas(df).repartition(3)) \
        .to_pandas().set_index("source")
    for k in ("a", "b"):
        sub = df[df["source"] == k]
        exp = round(float(np.corrcoef(sub["n_chars"], sub["n_words"])[0, 1]), 4)
        assert abs(out.loc[k, "corr"] - exp) <= 1e-4
        assert out.loc[k, "n"] == len(sub)
    assert pd.isna(out.loc["const", "corr"])
    assert pd.isna(out.loc["single", "corr"])


def test_grouped_percent_rank(ray_session):
    # exact basis points vs pandas rank arithmetic, incl. a single-row
    # group (pct 0, cume 10000)
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from rwcf.analytics import grouped_percent_rank

    rng = np.random.default_rng(31)
    df = pd.DataFrame({
        "doc_id": np.arange(150, dtype=np.int64),
        "source": [f"s{int(x)}" for x in rng.integers(0, 5, 150)],
        "n_chars": rng.integers(0, 12, 150),
    })
    df = pd.concat([df, pd.DataFrame(
        {"doc_id": [999], "source": ["lone"], "n_chars": [7]})],
        ignore_index=True)
    out = grouped_percent_rank(rd.from_pandas(df).repartition(3)) \
        .to_pandas().sort_values("doc_id", ignore_index=True)
    g = df.groupby("source")["n_chars"]
    rnk = g.rank(method="min").astype(np.int64)
    n = df.groupby("source")["n_chars"].transform("size").astype(np.int64)
    le = g.rank(method="max").astype(np.int64)
    exp_pct = (rnk - 1) * 10000 // np.maximum(n - 1, 1)
    exp_cume = le * 10000 // n
    assert out["pct_rank_bp"].tolist() == exp_pct.tolist()
    assert out["cume_bp"].tolist() == exp_cume.tolist()
    lone = out[out["doc_id"] == 999].iloc[0]
    assert lone["pct_rank_bp"] == 0 and lone["cume_bp"] == 10000


def test_grouped_mode(ray_session):
    # highest count wins; count ties break to the SMALLEST value
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from rwcf.analytics import grouped_mode

    df = pd.DataFrame({
        "source": ["a"] * 6 + ["b"] * 4,
        "n_chars": [5, 5, 9, 9, 3, 1,      # a: tie 5 vs 9 -> 5
                    7, 7, 7, 2],           # b: clear 7
    })
    out = grouped_mode(rd.from_pandas(df).repartition(3)) \
        .to_pandas().set_index("source")
    assert out.loc["a", "mode_n_chars"] == 5 and out.loc["a", "n_mode"] == 2
    assert out.loc["b", "mode_n_chars"] == 7 and out.loc["b", "n_mode"] == 3


def test_rollup_counts(ray_session):
    # leaves + per-key1 subtotals + grand total, exact sums
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from rwcf.analytics import rollup_counts

    rng = np.random.default_rng(53)
    n = 120
    df = pd.DataFrame({
        "source": [f"s{int(x)}" for x in rng.integers(0, 3, n)],
        "lang": [f"l{int(x)}" for x in rng.integers(0, 2, n)],
        "n_chars": rng.integers(1, 100, n).astype(np.int64),
    })
    out = rollup_counts(rd.from_pandas(df).repartition(4)).to_pandas()
    leaves = out[out["lang"].notna()]
    subs = out[out["lang"].isna() & out["source"].notna()]
    tot = out[out["source"].isna()]
    exp_leaf = df.groupby(["source", "lang"], as_index=False).agg(
        n_rows=("n_chars", "size"), val_sum=("n_chars", "sum"))
    a = leaves.sort_values(["source", "lang"], ignore_index=True)
    b = exp_leaf.sort_values(["source", "lang"], ignore_index=True)
    assert a["n_rows"].tolist() == b["n_rows"].tolist()
    assert a["val_sum"].tolist() == b["val_sum"].tolist()
    assert len(subs) == df["source"].nunique()
    assert subs["n_rows"].sum() == n
    assert len(tot) == 1
    assert tot.iloc[0]["n_rows"] == n
    assert tot.iloc[0]["val_sum"] == df["n_chars"].sum()


def test_ratio_to_group_total(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from rwcf.analytics import ratio_to_group_total

    rng = np.random.default_rng(61)
    df = pd.DataFrame({
        "doc_id": np.arange(90, dtype=np.int64),
        "source": [f"s{int(x)}" for x in rng.integers(0, 4, 90)],
        "n_chars": rng.integers(1, 500, 90).astype(np.int64),
    })
    out = ratio_to_group_total(rd.from_pandas(df).repartition(3)) \
        .to_pandas().sort_values("doc_id", ignore_index=True)
    tot = df.groupby("source")["n_chars"].transform("sum")
    exp = (df["n_chars"] * 10000 // tot).astype(np.int64)
    assert out["share_bp"].tolist() == exp.tolist()
    # shares of a group sum to <= 10000 and within group-size of it
    g = out.merge(df, on=["doc_id", "source"]).groupby("source")["share_bp"]
    for k, s in g.sum().items():
        assert s <= 10000


def test_cube_counts(ray_session):
    # ROLLUP levels + the per-key2 (key1 NULL) subtotal level
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from rwcf.analytics import cube_counts

    rng = np.random.default_rng(54)
    n = 150
    df = pd.DataFrame({
        "source": [f"s{int(x)}" for x in rng.integers(0, 3, n)],
        "lang": [f"l{int(x)}" for x in rng.integers(0, 4, n)],
        "n_chars": rng.integers(1, 100, n).astype(np.int64),
    })
    out = cube_counts(rd.from_pandas(df).repartition(4)).to_pandas()
    sub2 = out[out["source"].isna() & out["lang"].notna()]
    exp2 = df.groupby("lang", as_index=False).agg(
        n_rows=("n_chars", "size"), val_sum=("n_chars", "sum"))
    a = sub2.sort_values("lang", ignore_index=True)
    b = exp2.sort_values("lang", ignore_index=True)
    assert a["n_rows"].tolist() == b["n_rows"].tolist()
    assert a["val_sum"].tolist() == b["val_sum"].tolist()
    # total row count = leaves + |k1| + |k2| + 1
    nl = df.groupby(["source", "lang"]).ngroups
    assert len(out) == nl + df["source"].nunique() \
        + df["lang"].nunique() + 1


def test_pivot_counts(ray_session):
    import numpy as np
    import pandas as pd
    import pytest
    import ray.data as rd

    from rwcf.analytics import pivot_counts

    rng = np.random.default_rng(55)
    n = 200
    dom = ("de", "en", "zh")
    df = pd.DataFrame({
        "source": [f"s{int(x)}" for x in rng.integers(0, 4, n)],
        "lang": [dom[int(x)] for x in rng.integers(0, 3, n)],
    })
    out = pivot_counts(rd.from_pandas(df).repartition(5), domain=dom) \
        .to_pandas().set_index("source").sort_index()
    exp = pd.crosstab(df["source"], df["lang"])
    for v in dom:
        assert out[f"n_{v}"].tolist() == exp[v].tolist()
    assert out["n_rows"].tolist() == df.groupby("source").size().tolist()
    # out-of-domain value raises instead of silently vanishing
    bad = rd.from_pandas(pd.DataFrame({"source": ["s0"], "lang": ["xx"]}))
    with pytest.raises(Exception, match="outside declared domain"):
        pivot_counts(bad, domain=dom).to_pandas()


def test_iqr_outliers(ray_session):
    # exact discrete q1/q3 (rank ceil(q*n)), integer fences
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from rwcf.analytics import iqr_outliers

    rng = np.random.default_rng(56)
    n = 400
    df = pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "source": [f"s{int(x)}" for x in rng.integers(0, 3, n)],
        "n_chars": rng.integers(50, 150, n).astype(np.int64),
    })
    # plant unmistakable outliers
    df.loc[0, "n_chars"] = 10_000
    df.loc[1, "n_chars"] = 1
    out = iqr_outliers(rd.from_pandas(df).repartition(4), fence_half=3) \
        .to_pandas()
    got = set(out["doc_id"])
    assert {0, 1} <= got
    # oracle replay in pandas with identical rank semantics
    import math
    exp = set()
    for k, sub in df.groupby("source"):
        v = np.sort(sub["n_chars"].to_numpy())
        q1 = v[max(1, math.ceil(0.25 * len(v))) - 1]
        q3 = v[max(1, math.ceil(0.75 * len(v))) - 1]
        lo, hi = 2 * q1 - 3 * (q3 - q1), 2 * q3 + 3 * (q3 - q1)
        m = (2 * sub["n_chars"] < lo) | (2 * sub["n_chars"] > hi)
        exp |= set(sub.loc[m, "doc_id"])
    assert got == exp


def test_vocab_except(ray_session):
    import pandas as pd
    import ray.data as rd

    from rwcf.analytics import vocab_except

    df = pd.DataFrame({
        "source": ["a", "a", "b", "b", "c"],
        "text": ["x y z", "z q", "x y", "y  z", "only c words"],
    })
    ds = rd.from_pandas(df).repartition(3)
    out = set(vocab_except(ds, "a", "b")
              .to_pandas()["word"])
    assert out == {"q"}  # a has {x,y,z,q}; b has {x,y,z}
    # bigrams: within-doc pairs only, never across documents
    # a: {x y, y z, z q}; b: {x y, y z} (double space = one separator)
    out2 = set(vocab_except(ds, "a", "b", ngram=2)
               .to_pandas()["word"])
    assert out2 == {"z q"}


def test_id_islands(ray_session):
    # islands survive arbitrary batch splits (adjacent-interval merge)
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from rwcf.analytics import id_islands

    ids_a = [1, 2, 3, 7, 8, 20]          # islands [1,3] [7,8] [20,20]
    ids_b = [4, 5, 6, 100]               # islands [4,6] [100,100]
    df = pd.DataFrame({
        "doc_id": np.array(ids_a + ids_b, dtype=np.int64),
        "source": ["a"] * len(ids_a) + ["b"] * len(ids_b),
    }).sample(frac=1.0, random_state=7).reset_index(drop=True)
    out = id_islands(rd.from_pandas(df).repartition(5)).to_pandas()
    got = {(r.source, r.island_start, r.island_end, r.n_docs)
           for r in out.itertuples()}
    assert got == {("a", 1, 3, 3), ("a", 7, 8, 2), ("a", 20, 20, 1),
                   ("b", 4, 6, 3), ("b", 100, 100, 1)}


def test_mad_by_group(ray_session):
    import math

    import numpy as np
    import pandas as pd
    import ray.data as rd

    from rwcf.analytics import mad_by_group

    rng = np.random.default_rng(58)
    n = 300
    df = pd.DataFrame({
        "source": [f"s{int(x)}" for x in rng.integers(0, 3, n)],
        "n_chars": rng.integers(10, 500, n).astype(np.int64),
    })
    out = mad_by_group(rd.from_pandas(df).repartition(4)) \
        .set_index("source")
    for k, sub in df.groupby("source"):
        v = np.sort(sub["n_chars"].to_numpy())
        med = v[max(1, math.ceil(0.5 * len(v))) - 1]
        av = np.sort(np.abs(sub["n_chars"].to_numpy() - med))
        mad = av[max(1, math.ceil(0.5 * len(av))) - 1]
        assert out.loc[k, "med"] == med
        assert out.loc[k, "mad"] == mad


def test_vocab_intersect(ray_session):
    import pandas as pd
    import ray.data as rd

    from rwcf.analytics import vocab_except

    df = pd.DataFrame({
        "source": ["a", "a", "b", "c"],
        "text": ["x y z", "z q", "x y q", "noise"],
    })
    ds = rd.from_pandas(df).repartition(2)
    # unigrams: a={x,y,z,q}, b={x,y,q} -> intersect {x,y,q}
    got = set(vocab_except(ds, "a", "b", op="intersect")
              .to_pandas()["word"])
    assert got == {"x", "y", "q"}
    # except + intersect partition a's vocabulary
    exc = set(vocab_except(ds, "a", "b").to_pandas()["word"])
    assert exc == {"z"} and not (got & exc)


def test_skyline_2d(ray_session):
    # brute-force dominance oracle incl. duplicate frontier points
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from rwcf.analytics import skyline_2d

    rng = np.random.default_rng(59)
    n = 300
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "ts": rng.integers(0, 1000, n).astype(np.int64),
        "value": np.round(rng.uniform(0, 10, n), 3),
    })
    # plant a duplicated frontier point: both copies must survive
    df.loc[0, ["ts", "value"]] = [999, 99.0]
    df.loc[1, ["ts", "value"]] = [999, 99.0]
    out = skyline_2d(rd.from_pandas(df).repartition(6)).to_pandas()
    x = df["ts"].to_numpy()
    y = np.floor(df["value"].to_numpy() * 1000).astype(np.int64)
    keep = []
    for i in range(n):
        dom = (x >= x[i]) & (y >= y[i]) & ((x > x[i]) | (y > y[i]))
        if not dom.any():
            keep.append(i)
    assert sorted(out["event_id"]) == keep
    assert {0, 1} <= set(out["event_id"])


def test_pivot_counts_null_raises(ray_session):
    import pandas as pd
    import pytest
    import ray.data as rd

    from rwcf.analytics import pivot_counts

    bad = rd.from_pandas(pd.DataFrame({"source": ["s0"], "lang": [None]}))
    with pytest.raises(Exception, match="NULL key/pivot"):
        pivot_counts(bad, domain=("de",)).to_pandas()


def test_grouped_topk_ties(ray_session):
    # every row tying the k-th value survives; gap-style rank
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from rwcf.analytics import grouped_topk_ties

    df = pd.DataFrame({
        "doc_id": np.arange(8, dtype=np.int64),
        "source": ["a"] * 6 + ["b"] * 2,
        "n_chars": [9, 9, 9, 5, 5, 1,     # a, k=2: all three 9s, no 5s
                    7, 7],                # b: both 7s (rank 1)
    })
    out = grouped_topk_ties(rd.from_pandas(df).repartition(4),
                            key_col="source", order_col="n_chars",
                            id_col="doc_id", k=2).to_pandas()
    a = out[out["source"] == "a"]
    assert sorted(a["doc_id"]) == [0, 1, 2]
    assert (a["rank"] == 1).all()
    b = out[out["source"] == "b"]
    assert sorted(b["doc_id"]) == [6, 7] and (b["rank"] == 1).all()


def test_grouped_distinct_pairs(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from rwcf.analytics import grouped_distinct_pairs

    rng = np.random.default_rng(63)
    df = pd.DataFrame({
        "event_type": rng.choice(["x", "y", "z"], 400),
        "user_id": rng.integers(0, 37, 400).astype(np.int64),
    })
    out = grouped_distinct_pairs(rd.from_pandas(df).repartition(5),
                                 "event_type", "user_id") \
        .to_pandas().set_index("event_type").sort_index()
    exp = df.groupby("event_type")["user_id"].nunique()
    assert out["n_distinct"].tolist() == exp.tolist()


def test_melt_counts_closure(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from rwcf.analytics import melt_counts

    rng = np.random.default_rng(64)
    dom = ("de", "en")
    df = pd.DataFrame({
        "source": [f"s{int(x)}" for x in rng.integers(0, 3, 120)],
        "lang": [dom[int(x)] for x in rng.integers(0, 2, 120)],
    })
    out = melt_counts(rd.from_pandas(df).repartition(4), domain=dom) \
        .to_pandas().sort_values(["source", "lang"], ignore_index=True)
    exp = df.groupby(["source", "lang"], as_index=False).size() \
        .rename(columns={"size": "n"}) \
        .sort_values(["source", "lang"], ignore_index=True)
    assert out["source"].tolist() == exp["source"].tolist()
    assert out["lang"].tolist() == exp["lang"].tolist()
    assert out["n"].tolist() == exp["n"].tolist()


def test_vocab_overlap_oracle(ray_session):
    import duckdb
    import ray.data as rd

    from rwcf.analytics import vocab_overlap
    sf = "/root/testdata/sf0.001"
    ds = rd.read_parquet(f"{sf}/documents.parquet",
                         columns=["source", "text"])
    out = vocab_overlap(ds, buckets=8).to_pandas() \
        .sort_values(["group_a", "group_b"], ignore_index=True)
    exp = duckdb.sql(
        f"WITH v AS (SELECT DISTINCT source AS g, word AS i FROM "
        f"(SELECT source, unnest(regexp_extract_all(text, '\\S+')) "
        f"AS word FROM read_parquet('{sf}/documents.parquet'))), "
        f"c AS (SELECT g, count(*) AS n FROM v GROUP BY g) "
        f"SELECT a.g AS ga, b.g AS gb, count(*) AS nc, "
        f"any_value(ca.n) + any_value(cb.n) - count(*) AS nu "
        f"FROM v a JOIN v b ON a.i = b.i AND a.g < b.g "
        f"JOIN c ca ON ca.g = a.g JOIN c cb ON cb.g = b.g "
        f"GROUP BY 1, 2 ORDER BY 1, 2").df()
    assert out["group_a"].tolist() == exp["ga"].tolist()
    assert out["group_b"].tolist() == exp["gb"].tolist()
    assert out["n_common"].tolist() == exp["nc"].astype("int64").tolist()
    assert out["n_union"].tolist() == exp["nu"].astype("int64").tolist()


def test_cooccurrence_pairs_oracle(ray_session):
    import duckdb
    import ray.data as rd

    from rwcf.analytics import cooccurrence_pairs
    sf = "/root/testdata/sf0.001"
    ev = rd.read_parquet(f"{sf}/events.parquet",
                         columns=["event_type", "user_id"])
    out = cooccurrence_pairs(ev, "event_type", "user_id",
                             buckets=8).to_pandas() \
        .sort_values(["group_a", "group_b"], ignore_index=True)
    exp = duckdb.sql(
        f"WITH v AS (SELECT DISTINCT event_type AS g, user_id AS i "
        f"FROM read_parquet('{sf}/events.parquet')), "
        f"c AS (SELECT g, count(*) AS n FROM v GROUP BY g) "
        f"SELECT a.g AS ga, b.g AS gb, count(*) AS nc, "
        f"any_value(ca.n) + any_value(cb.n) - count(*) AS nu "
        f"FROM v a JOIN v b ON a.i = b.i AND a.g < b.g "
        f"JOIN c ca ON ca.g = a.g JOIN c cb ON cb.g = b.g "
        f"GROUP BY 1, 2 ORDER BY 1, 2").df()
    assert out["group_a"].tolist() == exp["ga"].tolist()
    assert out["group_b"].tolist() == exp["gb"].tolist()
    assert out["n_common"].tolist() == exp["nc"].astype("int64").tolist()
    assert out["n_union"].tolist() == exp["nu"].astype("int64").tolist()


def test_cooccurrence_wide_domain_raises(ray_session):
    import ray.data as rd

    from rwcf.analytics import cooccurrence_pairs
    t = pa.table({"g": pa.array([f"g{i}" for i in range(40)]),
                  "i": pa.array(np.arange(40, dtype=np.int64))})
    with pytest.raises(ValueError, match="small group domain"):
        cooccurrence_pairs(rd.from_arrow(t), "g", "i")


def test_cooccurrence_disjoint_groups_drop(ray_session):
    # groups that share no items must NOT appear (inner semantics)
    import ray.data as rd

    t = pa.table({"g": pa.array(["a", "a", "b", "c"]),
                  "i": pa.array([1, 2, 2, 9], pa.int64())})
    from rwcf.analytics import cooccurrence_pairs
    out = cooccurrence_pairs(rd.from_arrow(t), "g", "i",
                             buckets=4).to_pandas()
    assert out["group_a"].tolist() == ["a"]
    assert out["group_b"].tolist() == ["b"]
    assert out["n_common"].tolist() == [1]
    assert out["n_union"].tolist() == [2]


def test_hourly_activity_oracle(ray_session):
    import duckdb
    import ray.data as rd

    from rwcf.analytics import hourly_activity
    sf = "/root/testdata/sf0.001"
    ev = rd.read_parquet(f"{sf}/events.parquet",
                         columns=["ts", "event_type", "value"])
    out = hourly_activity(ev).to_pandas() \
        .sort_values(["hr", "event_type"], ignore_index=True)
    exp = duckdb.sql(
        f"SELECT CAST(hour(ts) AS BIGINT) AS hr, event_type, "
        f"count(*) AS n, sum(CAST(floor(value*1000) AS BIGINT)) AS v "
        f"FROM read_parquet('{sf}/events.parquet') "
        f"GROUP BY 1, 2 ORDER BY 1, 2").df()
    assert out["hr"].tolist() == exp["hr"].astype("int64").tolist()
    assert out["event_type"].tolist() == exp["event_type"].tolist()
    assert out["n_events"].tolist() == exp["n"].astype("int64").tolist()
    assert out["value_sum1000"].tolist() == \
        exp["v"].astype("int64").tolist()


def test_gap_histogram_oracle(ray_session):
    import duckdb
    import ray.data as rd

    from rwcf.analytics import inter_event_gap_histogram
    sf = "/root/testdata/sf0.001"
    ev = rd.read_parquet(f"{sf}/events.parquet",
                         columns=["user_id", "ts", "event_id"])
    out = inter_event_gap_histogram(ev, buckets=8).to_pandas() \
        .sort_values("gap_bucket", ignore_index=True)
    exp = duckdb.sql(
        f"WITH d AS (SELECT CAST(floor(epoch(ts)) AS BIGINT) - "
        f"CAST(floor(epoch(lag(ts) OVER (PARTITION BY user_id "
        f"ORDER BY ts, event_id))) AS BIGINT) AS g "
        f"FROM read_parquet('{sf}/events.parquet')) "
        f"SELECT CASE WHEN g = 0 THEN 0 ELSE CAST(strlen(bin(g)) "
        f"AS BIGINT) END AS b, count(*) AS n FROM d "
        f"WHERE g IS NOT NULL GROUP BY 1 ORDER BY 1").df()
    assert out["gap_bucket"].tolist() == exp["b"].astype("int64").tolist()
    assert out["n"].tolist() == exp["n"].astype("int64").tolist()


def test_gap_histogram_power_of_two_boundaries(ray_session):
    # gaps 0,1,2,3,4 -> buckets 0,1,2,2,3: bit_length exactness at the
    # power-of-two edges where float log2 could round either way
    import ray.data as rd

    from rwcf.analytics import inter_event_gap_histogram
    base = 1_700_000_000
    times = [0, 0, 1, 3, 6, 10]  # gaps 0,1,2,3,4
    t = pa.table({
        "user_id": pa.array([7] * len(times), pa.int64()),
        "ts": pa.array([(base + s) * 1_000_000 for s in times],
                       pa.timestamp("us"))})
    out = inter_event_gap_histogram(rd.from_arrow(t),
                                    buckets=4).to_pandas() \
        .sort_values("gap_bucket", ignore_index=True)
    assert out["gap_bucket"].tolist() == [0, 1, 2, 3]
    assert out["n"].tolist() == [1, 1, 2, 1]


def test_global_ntile_oracle(ray_session):
    import duckdb
    import ray.data as rd

    from rwcf.analytics import global_ntile
    sf = "/root/testdata/sf0.001"
    ds = rd.read_parquet(f"{sf}/documents.parquet",
                         columns=["doc_id", "n_chars"])
    out = global_ntile(ds, k=10, buckets=8).to_pandas() \
        .sort_values("doc_id", ignore_index=True)
    exp = duckdb.sql(
        f"SELECT doc_id, CAST(ntile(10) OVER "
        f"(ORDER BY n_chars, doc_id) AS BIGINT) AS tile "
        f"FROM read_parquet('{sf}/documents.parquet') "
        f"ORDER BY doc_id").df()
    assert out["doc_id"].tolist() == exp["doc_id"].astype("int64").tolist()
    assert out["tile"].tolist() == exp["tile"].astype("int64").tolist()


def test_global_ntile_fill_rule(ray_session):
    # 7 rows, k=3 -> tile sizes 3,2,2 (first n%k tiles take the extra)
    import ray.data as rd

    from rwcf.analytics import global_ntile
    t = pa.table({"doc_id": pa.array(np.arange(7), pa.int64()),
                  "n_chars": pa.array([5, 1, 4, 1, 3, 2, 2], pa.int64())})
    out = global_ntile(rd.from_arrow(t), k=3, buckets=4).to_pandas()
    order = out.sort_values("doc_id")["tile"].tolist()
    # sorted by (n_chars, doc_id): ids 1,3,5,6,4,2,0
    # ranks:                            0 1 2 3 4 5 6
    # tiles (3,2,2):                    1 1 1 2 2 3 3
    assert order == [3, 1, 3, 1, 2, 1, 2]


def test_robust_outliers_oracle(ray_session):
    import duckdb
    import ray.data as rd

    from rwcf.analytics import robust_outliers
    sf = "/root/testdata/sf0.001"
    ds = rd.read_parquet(f"{sf}/documents.parquet",
                         columns=["doc_id", "source", "n_chars"])
    out = robust_outliers(ds).to_pandas() \
        .sort_values("doc_id", ignore_index=True)
    exp = duckdb.sql(
        f"WITH m AS (SELECT source, v AS med FROM "
        f"(SELECT source, n_chars AS v, row_number() OVER "
        f"(PARTITION BY source ORDER BY n_chars) AS rn, "
        f"count(*) OVER (PARTITION BY source) AS n "
        f"FROM read_parquet('{sf}/documents.parquet')) "
        f"WHERE rn = greatest(1, CAST(ceil(0.5 * n) AS BIGINT))), "
        f"x AS (SELECT a.source, a.av, row_number() OVER "
        f"(PARTITION BY a.source ORDER BY a.av) AS rn, "
        f"count(*) OVER (PARTITION BY a.source) AS n FROM "
        f"(SELECT d.source, abs(d.n_chars - m.med) AS av "
        f"FROM read_parquet('{sf}/documents.parquet') d "
        f"JOIN m ON d.source = m.source) a), "
        f"mm AS (SELECT x.source, CAST(m.med AS BIGINT) AS med, "
        f"CAST(x.av AS BIGINT) AS mad FROM x "
        f"JOIN m ON x.source = m.source "
        f"WHERE x.rn = greatest(1, CAST(ceil(0.5 * x.n) AS BIGINT))) "
        f"SELECT d.doc_id FROM read_parquet('{sf}/documents.parquet') d "
        f"JOIN mm ON d.source = mm.source "
        f"WHERE abs(d.n_chars - mm.med) > 3 * mm.mad ORDER BY 1").df()
    assert out["doc_id"].tolist() == exp["doc_id"].astype("int64").tolist()


def test_decile_stats_oracle(ray_session):
    import duckdb
    import ray.data as rd

    from rwcf.analytics import decile_stats
    sf = "/root/testdata/sf0.001"
    ds = rd.read_parquet(f"{sf}/documents.parquet",
                         columns=["doc_id", "n_chars"])
    out = decile_stats(ds, k=10, buckets=8).to_pandas() \
        .sort_values("tile", ignore_index=True)
    exp = duckdb.sql(
        f"SELECT tile, count(*) AS n, min(n_chars) AS lo, "
        f"max(n_chars) AS hi, sum(n_chars) AS s FROM "
        f"(SELECT n_chars, ntile(10) OVER (ORDER BY n_chars, doc_id) "
        f"AS tile FROM read_parquet('{sf}/documents.parquet')) "
        f"GROUP BY tile ORDER BY tile").df()
    assert out["tile"].tolist() == exp["tile"].astype("int64").tolist()
    assert out["n_rows"].tolist() == exp["n"].astype("int64").tolist()
    assert out["min_val"].tolist() == exp["lo"].astype("int64").tolist()
    assert out["max_val"].tolist() == exp["hi"].astype("int64").tolist()
    assert out["sum_val"].tolist() == exp["s"].astype("int64").tolist()


def test_mass_quantiles_oracle(ray_session):
    import duckdb
    import ray.data as rd

    from rwcf.analytics import mass_quantiles
    sf = "/root/testdata/sf0.001"
    ds = rd.read_parquet(f"{sf}/documents.parquet", columns=["n_chars"])
    out = mass_quantiles(ds).sort_values("q_pct", ignore_index=True)
    exp = duckdb.sql(
        f"WITH h AS (SELECT n_chars AS v, sum(n_chars) AS m "
        f"FROM read_parquet('{sf}/documents.parquet') GROUP BY 1), "
        f"r AS (SELECT v, sum(m) OVER (ORDER BY v) AS cum FROM h), "
        f"t AS (SELECT sum(n_chars) AS total FROM "
        f"read_parquet('{sf}/documents.parquet')), "
        f"picked AS (SELECT q.q_pct, min(r.v) AS v FROM r, t, "
        f"(VALUES (25), (50), (75), (90)) q(q_pct) "
        f"WHERE r.cum * 100 >= q.q_pct * t.total GROUP BY q.q_pct) "
        f"SELECT p.q_pct, p.v, r.cum FROM picked p "
        f"JOIN r ON r.v = p.v ORDER BY 1").df()
    assert out["q_pct"].tolist() == exp["q_pct"].astype("int64").tolist()
    assert out["v"].tolist() == exp["v"].astype("int64").tolist()
    assert out["cum_mass"].tolist() == exp["cum"].astype("int64").tolist()


def test_mass_quantiles_skew(ray_session):
    # one huge doc holds >75% of the mass: q25/q50/q75 all land on it
    import ray.data as rd

    from rwcf.analytics import mass_quantiles
    t = pa.table({"n_chars": pa.array([1, 2, 3, 100], pa.int64())})
    out = mass_quantiles(rd.from_arrow(t))
    assert out["v"].tolist() == [100, 100, 100, 100]
    assert out["cum_mass"].tolist() == [106, 106, 106, 106]


def test_grouped_string_agg_oracle(ray_session):
    import duckdb
    import ray.data as rd

    from rwcf.analytics import grouped_string_agg
    sf = "/root/testdata/sf0.001"
    ds = rd.read_parquet(f"{sf}/documents.parquet",
                         columns=["source", "lang"])
    out = grouped_string_agg(ds, buckets=8).to_pandas() \
        .sort_values("source", ignore_index=True)
    exp = duckdb.sql(
        f"SELECT source, string_agg(DISTINCT lang, ',' ORDER BY lang) "
        f"AS vals, count(DISTINCT lang) AS n "
        f"FROM read_parquet('{sf}/documents.parquet') "
        f"GROUP BY 1 ORDER BY 1").df()
    assert out["source"].tolist() == exp["source"].tolist()
    assert out["vals"].tolist() == exp["vals"].tolist()
    assert out["n_vals"].tolist() == exp["n"].astype("int64").tolist()


def test_hapax_per_source_oracle(ray_session):
    import duckdb
    import ray.data as rd

    from rwcf.analytics import hapax_per_source
    sf = "/root/testdata/sf0.001"
    ds = rd.read_parquet(f"{sf}/documents.parquet",
                         columns=["source", "text"])
    out = hapax_per_source(ds, buckets=8).to_pandas() \
        .sort_values("source", ignore_index=True)
    exp = duckdb.sql(
        f"WITH wc AS (SELECT source, word, count(*) AS c FROM "
        f"(SELECT source, unnest(regexp_extract_all(text, '\\S+')) "
        f"AS word FROM read_parquet('{sf}/documents.parquet')) "
        f"GROUP BY 1, 2) "
        f"SELECT source, sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS h, "
        f"count(*) AS nd FROM wc GROUP BY 1 ORDER BY 1").df()
    assert out["source"].tolist() == exp["source"].tolist()
    assert out["n_hapax"].tolist() == exp["h"].astype("int64").tolist()
    assert out["n_distinct"].tolist() == exp["nd"].astype("int64").tolist()
    bp = (exp["h"].astype("int64") * 10000) // exp["nd"].astype("int64")
    assert out["hapax_bp"].tolist() == bp.tolist()


def test_daily_new_vs_returning_oracle(ray_session):
    import duckdb
    import ray.data as rd

    from rwcf.analytics import daily_new_vs_returning
    sf = "/root/testdata/sf0.001"
    ev = rd.read_parquet(f"{sf}/events.parquet",
                         columns=["user_id", "ts"])
    out = daily_new_vs_returning(ev, buckets=8).to_pandas() \
        .sort_values("day", ignore_index=True)
    exp = duckdb.sql(
        f"WITH ud AS (SELECT DISTINCT user_id, "
        f"CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day "
        f"FROM read_parquet('{sf}/events.parquet')), "
        f"f AS (SELECT user_id, min(day) AS fday FROM ud GROUP BY 1) "
        f"SELECT day, sum(CASE WHEN day = fday THEN 1 ELSE 0 END) "
        f"AS nn, sum(CASE WHEN day > fday THEN 1 ELSE 0 END) AS nr "
        f"FROM ud JOIN f USING (user_id) GROUP BY 1 ORDER BY 1").df()
    assert out["day"].tolist() == exp["day"].astype("int64").tolist()
    assert out["n_new"].tolist() == exp["nn"].astype("int64").tolist()
    assert out["n_returning"].tolist() == \
        exp["nr"].astype("int64").tolist()


def test_grouped_gini_oracle(ray_session):
    import duckdb
    import ray.data as rd

    from rwcf.analytics import grouped_gini
    sf = "/root/testdata/sf0.001"
    ds = rd.read_parquet(f"{sf}/documents.parquet",
                         columns=["source", "n_chars"])
    out = grouped_gini(ds, buckets=8).to_pandas() \
        .sort_values("source", ignore_index=True)
    exp = duckdb.sql(
        f"SELECT source, count(*) AS n_rows, "
        f"sum((2 * rn - n - 1) * v) AS num, any_value(n) * sum(v) "
        f"AS den FROM (SELECT source, n_chars AS v, row_number() OVER "
        f"(PARTITION BY source ORDER BY n_chars) AS rn, count(*) OVER "
        f"(PARTITION BY source) AS n "
        f"FROM read_parquet('{sf}/documents.parquet')) "
        f"GROUP BY 1 ORDER BY 1").df()
    assert out["source"].tolist() == exp["source"].tolist()
    assert out["n_rows"].tolist() == exp["n_rows"].astype("int64").tolist()
    assert out["gini_num"].tolist() == exp["num"].astype("int64").tolist()
    assert out["gini_den"].tolist() == exp["den"].astype("int64").tolist()


def test_grouped_gini_known_values(ray_session):
    # uniform values -> gini_num 0; one-hot [0,0,0,9] at n=4 ->
    # num = (2*4-5)*9 = 27, den = 4*9 = 36 -> gini (n-1)/n = 0.75
    import ray.data as rd

    from rwcf.analytics import grouped_gini
    t = pa.table({"source": pa.array(["u"] * 3 + ["h"] * 4),
                  "n_chars": pa.array([5, 5, 5, 0, 0, 0, 9], pa.int64())})
    out = grouped_gini(rd.from_arrow(t), buckets=4).to_pandas() \
        .sort_values("source", ignore_index=True)
    assert out["source"].tolist() == ["h", "u"]
    assert out["gini_num"].tolist() == [27, 0]
    assert out["gini_den"].tolist() == [36, 45]


def test_segment_value_quantiles_query(ray_session):
    import duckdb

    import __ray_entry__ as entry_mod
    sf = "/root/testdata/sf0.001"
    out = entry_mod.queries()["segment_value_quantiles"](sf) \
        .to_pandas().sort_values(["c_mktsegment", "q"],
                                 ignore_index=True)
    exp = duckdb.sql(
        f"WITH s AS (SELECT c_mktsegment, "
        f"CAST(round(o_totalprice*100) AS BIGINT) AS v, "
        f"row_number() OVER (PARTITION BY c_mktsegment ORDER BY "
        f"CAST(round(o_totalprice*100) AS BIGINT)) AS rn, "
        f"count(*) OVER (PARTITION BY c_mktsegment) AS n "
        f"FROM read_parquet('{sf}/orders.parquet') o "
        f"JOIN read_parquet('{sf}/customer.parquet') c "
        f"ON o_custkey = c_custkey), "
        f"qs AS (SELECT unnest([0.5, 0.95]) AS q) "
        f"SELECT s.c_mktsegment, qs.q, s.v FROM s JOIN qs "
        f"ON s.rn = greatest(1, CAST(ceil(qs.q * s.n) AS BIGINT)) "
        f"ORDER BY 1, 2").df()
    assert out["c_mktsegment"].tolist() == exp["c_mktsegment"].tolist()
    assert out["q"].tolist() == exp["q"].tolist()
    assert out["v"].tolist() == exp["v"].astype("int64").tolist()


def test_moments_per_source_query(ray_session):
    import duckdb

    import __ray_entry__ as entry_mod
    sf = "/root/testdata/sf0.001"
    out = entry_mod.queries()["moments_per_source"](sf).to_pandas() \
        .sort_values("source", ignore_index=True)
    exp = duckdb.sql(
        f"SELECT source, count(*) AS n, sum(n_chars) AS s, "
        f"sum(n_chars * n_chars) AS s2 "
        f"FROM read_parquet('{sf}/documents.parquet') "
        f"GROUP BY 1 ORDER BY 1").df()
    assert out["source"].tolist() == exp["source"].tolist()
    assert out["n_rows"].tolist() == exp["n"].astype("int64").tolist()
    assert out["sum_v"].tolist() == exp["s"].astype("int64").tolist()
    assert out["sum_v2"].tolist() == exp["s2"].astype("int64").tolist()


def test_distinct_sketch_sidecars(tmp_path, ray_session):
    """Round-5 sketch sidecars: per-partition HLL registers persist
    once, COUNT DISTINCT answers from metadata alone (zero data IO),
    incremental build touches only new/stale partitions, and tombstones
    flag staleness."""
    import os

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from rwcf import analytics, fixtures, pipeline
    path = fixtures.tokens_parquet(500, seed=91, cache_dir=str(tmp_path),
                                   row_group_size=125)
    out = str(tmp_path / "enc")
    cfg = pipeline.EncodeConfig(out_dir=out, partition_token_budget=40_000)
    pipeline.encode_job(path, cfg).materialize()

    r = analytics.build_distinct_sketches(out, "doc_id")
    assert r["built"] == r["partitions"] > 1
    est = analytics.approx_distinct_from_sketches(out, "doc_id")
    exact = 500  # doc_ids unique
    assert abs(est["n_distinct_est"] - exact) / exact < 0.05
    # idempotent: nothing rebuilds
    r2 = analytics.build_distinct_sketches(out, "doc_id")
    assert r2["built"] == 0

    # append: only the new partitions' sketches build
    t = pq.read_table(path).slice(0, 40)
    ids = [f"zz-{i:04d}" for i in range(40)]
    t = t.set_column(t.schema.get_field_index("doc_id"), "doc_id",
                     pa.array(ids, pa.string()))
    newp = str(tmp_path / "new.parquet")
    pq.write_table(t, newp)
    pipeline.encode_job(newp, cfg).materialize()
    r3 = analytics.build_distinct_sketches(out, "doc_id")
    assert 0 < r3["built"] < r3["partitions"]
    est2 = analytics.approx_distinct_from_sketches(out, "doc_id")
    assert abs(est2["n_distinct_est"] - 540) / 540 < 0.05

    # tombstones flag the touched partition stale
    pipeline.delete_docs(out, ["zz-0000", "zz-0001"])
    import pytest as _pytest
    with _pytest.raises(ValueError, match="stale|fresh"):
        analytics.approx_distinct_from_sketches(out, "doc_id")
    r4 = analytics.build_distinct_sketches(out, "doc_id")
    assert r4["built"] >= 1
    est3 = analytics.approx_distinct_from_sketches(out, "doc_id")
    assert abs(est3["n_distinct_est"] - 538) / 538 < 0.05


def test_fsck_flags_stale_sketches(tmp_path, ray_session):
    from rwcf import analytics, fixtures, pipeline
    path = fixtures.tokens_parquet(300, seed=92, cache_dir=str(tmp_path),
                                   row_group_size=150)
    out = str(tmp_path / "enc")
    cfg = pipeline.EncodeConfig(out_dir=out, partition_token_budget=40_000)
    pipeline.encode_job(path, cfg).materialize()
    analytics.build_distinct_sketches(out, "source")
    ok = pipeline.fsck_store(out, concurrency=2).to_pandas()
    sk = ok[ok["check"] == "sketch_fresh"]
    assert len(sk) and bool(sk["ok"].all())
    # a delete makes the touched partition's sketch stale
    first = pipeline.decode_job(out, columns=["doc_id"]).take(1)
    pipeline.delete_docs(out, [first[0]["doc_id"]])
    bad = pipeline.fsck_store(out, concurrency=2).to_pandas()
    skb = bad[bad["check"] == "sketch_fresh"]
    assert not bool(skb["ok"].all())
    # rebuild restores green
    analytics.build_distinct_sketches(out, "source")
    again = pipeline.fsck_store(out, concurrency=2).to_pandas()
    assert bool(again[again["check"] == "sketch_fresh"]["ok"].all())


def test_sketch_merge_distributed_parity(tmp_path, ray_session,
                                         monkeypatch):
    """The distributed register merge (forced via threshold=0) returns
    the identical estimate as the driver-side loop."""
    from rwcf import analytics, fixtures, pipeline
    path = fixtures.tokens_parquet(400, seed=93, cache_dir=str(tmp_path),
                                   row_group_size=100)
    out = str(tmp_path / "enc")
    cfg = pipeline.EncodeConfig(out_dir=out, partition_token_budget=30_000)
    pipeline.encode_job(path, cfg).materialize()
    analytics.build_distinct_sketches(out, "doc_id")
    a = analytics.approx_distinct_from_sketches(out, "doc_id")
    monkeypatch.setattr(analytics, "_SKETCH_MERGE_DISTRIBUTED_MIN", 0)
    b = analytics.approx_distinct_from_sketches(out, "doc_id")
    assert a["n_distinct_est"] == b["n_distinct_est"]
    assert a["sidecar_bytes"] == b["sidecar_bytes"]
