"""Round-4 third-wave operators: fuzzy edit-distance join, compressed-domain
bitmap algebra, streaks, winsorized stats, posting lists, column profile."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from rwcf import analytics, bitmap, fuzzy, windows


# ---------- Levenshtein kernel ----------

def _lev_ref(a: str, b: str) -> int:
    la, lb = len(a), len(b)
    d = list(range(lb + 1))
    for i in range(1, la + 1):
        prev, d[0] = d[0], i
        for j in range(1, lb + 1):
            prev, d[j] = d[j], min(d[j] + 1, d[j - 1] + 1,
                                   prev + (a[i - 1] != b[j - 1]))
    return d[lb]


def test_levenshtein_kernel_matches_reference():
    rng = np.random.default_rng(4)
    words = ["".join(rng.choice(list("abcde"), rng.integers(0, 9)))
             for _ in range(40)]
    arr = pa.array(words, pa.string())
    m, lens = fuzzy._pad_matrix(arr)
    ia, ib = np.triu_indices(len(words), 1)
    got = fuzzy.levenshtein_pairs(m, lens, ia.astype(np.int64),
                                  ib.astype(np.int64))
    want = np.array([_lev_ref(words[i], words[j])
                     for i, j in zip(ia, ib)])
    np.testing.assert_array_equal(got, want)


def test_levenshtein_empty_strings():
    arr = pa.array(["", "abc", ""], pa.string())
    m, lens = fuzzy._pad_matrix(arr)
    ia = np.array([0, 0, 1], dtype=np.int64)
    ib = np.array([1, 2, 2], dtype=np.int64)
    got = fuzzy.levenshtein_pairs(m, lens, ia, ib)
    np.testing.assert_array_equal(got, [3, 0, 3])


def test_fuzzy_pairs_vs_bruteforce(ray_session):
    import ray.data as rd
    rng = np.random.default_rng(7)
    n = 300
    names = ["".join(rng.choice(list("xyz"), 6)) for _ in range(n)]
    blocks = rng.integers(0, 5, n)
    t = pa.table({"p_partkey": pa.array(np.arange(n, dtype=np.int64)),
                  "p_name": pa.array(names, pa.string()),
                  "p_size": pa.array(blocks.astype(np.int32))})
    out = fuzzy.fuzzy_pairs(rd.from_arrow(t).repartition(4),
                            max_dist=2).to_pandas()
    want = []
    for i in range(n):
        for j in range(i + 1, n):
            if blocks[i] == blocks[j]:
                d = _lev_ref(names[i], names[j])
                if d <= 2:
                    want.append((i, j, d))
    want_df = pd.DataFrame(want, columns=["a_key", "b_key", "dist"])
    a = out.sort_values(["a_key", "b_key"]).reset_index(drop=True)
    b = want_df.sort_values(["a_key", "b_key"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


# ---------- bitmap algebra ----------

def test_interval_overlap_exact():
    sa = np.array([0, 10, 20])
    ea = np.array([5, 15, 30])
    sb = np.array([3, 12, 25])
    eb = np.array([11, 13, 40])
    # overlaps: [3,5)=2, [10,11)=1, [12,13)=1, [25,30)=5 -> 9
    assert bitmap.interval_overlap(sa, ea, sb, eb) == 9
    assert bitmap.interval_overlap(sa, ea, np.array([]), np.array([])) == 0


def test_bitmap_predicate_counts(ray_session):
    import ray.data as rd
    rng = np.random.default_rng(11)
    n = 5000
    lang = rng.choice(["en", "fr", "de"], n, p=[0.5, 0.3, 0.2])
    src = rng.choice(["s1", "s2"], n)
    t = pa.table({"lang": pa.array(lang, pa.string()),
                  "source": pa.array(src, pa.string())})
    out = bitmap.bitmap_predicate_counts(
        rd.from_arrow(t).repartition(4), val_a="en", val_b="s1")
    a = (lang == "en")
    b = (src == "s1")
    assert out.iloc[0]["n_rows"] == n
    assert out.iloc[0]["n_a"] == a.sum()
    assert out.iloc[0]["n_b"] == b.sum()
    assert out.iloc[0]["n_and"] == (a & b).sum()
    assert out.iloc[0]["n_or"] == (a | b).sum()


# ---------- streaks ----------

def test_longest_streak(ray_session):
    import ray.data as rd
    rng = np.random.default_rng(3)
    n = 3000
    users = rng.integers(0, 25, n)
    ts = (1_700_000_000 + rng.integers(0, 100_000, n)).astype(
        "datetime64[s]").astype("datetime64[us]")
    et = rng.choice(["a", "b", "c"], n)
    t = pa.table({"user_id": pa.array(users.astype(np.int64)),
                  "ts": pa.array(ts),
                  "event_type": pa.array(et, pa.string()),
                  "event_id": pa.array(np.arange(n, dtype=np.int64))})
    out = windows.longest_streak_per_user(
        rd.from_arrow(t).repartition(4)).to_pandas()
    df = t.to_pandas().sort_values(["user_id", "ts", "event_id"])
    want = {}
    for u, g in df.groupby("user_id"):
        best = cur = 0
        last = None
        for e in g["event_type"]:
            cur = cur + 1 if e == last else 1
            last = e
            best = max(best, cur)
        want[u] = (len(g), best)
    got = {r.user_id: (r.n_events, r.max_streak)
           for r in out.itertuples()}
    assert got == want


# ---------- winsorized stats ----------

def test_winsorized_stats(ray_session):
    import ray.data as rd
    rng = np.random.default_rng(5)
    n = 4000
    src = rng.choice(["a", "b", "c"], n)
    v = rng.integers(0, 500, n)
    t = pa.table({"source": pa.array(src, pa.string()),
                  "n_chars": pa.array(v.astype(np.int64))})
    out = analytics.winsorized_stats(
        rd.from_arrow(t).repartition(4)).to_pandas()
    for s in ["a", "b", "c"]:
        vals = np.sort(v[src == s])
        nk = vals.size
        lo = vals[max(1, int(np.ceil(0.1 * nk))) - 1]
        hi = vals[max(1, int(np.ceil(0.9 * nk))) - 1]
        w = np.clip(v[src == s], lo, hi)
        row = out[out["source"] == s].iloc[0]
        assert row["lo"] == lo and row["hi"] == hi
        assert row["n"] == nk and row["sum_w"] == w.sum()
        assert row["mean1000"] == (1000 * int(w.sum())) // nk


# ---------- posting lists ----------

def test_posting_lists(ray_session):
    import ray.data as rd
    docs = ["the cat sat", "the dog ran", "a cat ran the mile",
            "the the the", "dog cat"] * 4
    ids = np.arange(len(docs), dtype=np.int64)
    t = pa.table({"doc_id": pa.array(ids),
                  "text": pa.array(docs, pa.string())})
    out = analytics.posting_lists(rd.from_arrow(t).repartition(3),
                                  min_df=4, cap=3).to_pandas()
    df = {}
    posts = {}
    for i, d in zip(ids, docs):
        for w in set(d.split()):
            df[w] = df.get(w, 0) + 1
            posts.setdefault(w, []).append(int(i))
    want = {w: (c, ",".join(map(str, sorted(posts[w])[:3])))
            for w, c in df.items() if c >= 4}
    got = {r.token: (r.df, r.postings) for r in out.itertuples()}
    assert got == want


# ---------- column profile ----------

def test_column_profile(ray_session):
    import ray.data as rd
    t = pa.table({"doc_id": pa.array([3, 1, 2], pa.int64()),
                  "n_chars": pa.array([10, 30, 20], pa.int64()),
                  "lang": pa.array(["fr", "en", "fr"], pa.string()),
                  "source": pa.array(["s2", "s1", "s2"], pa.string())})
    out = analytics.column_profile(rd.from_arrow(t))
    rows = {r["column"]: r for _, r in out.iterrows()}
    assert rows["doc_id"]["min_v"] == "1" and rows["doc_id"]["max_v"] == "3"
    assert rows["doc_id"]["n_distinct"] == 3
    assert rows["n_chars"]["max_v"] == "30"
    assert rows["lang"]["n_distinct"] == 2
    assert rows["lang"]["min_v"] == "en" and rows["lang"]["max_v"] == "fr"
    assert (out["n_nulls"] == 0).all()
