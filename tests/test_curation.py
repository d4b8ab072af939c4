"""Curation operators: redaction, repetition stats, decontamination,
budget selection, sequence packing."""

import numpy as np
import pyarrow as pa
import pytest

from rwcf import curation


def tbl(texts, ids=None):
    ids = list(range(len(texts))) if ids is None else ids
    return pa.table({"doc_id": pa.array(ids, pa.int64()),
                     "text": pa.array(texts, pa.string())})


# ---------------------------------------------------------------- redact


def test_redact_email_and_blocklist():
    t = tbl(["mail me at bob@example.com now",
             "customer data at 10.0.0.1",
             "clean text"])
    out = curation.redact_batch(
        t, patterns=(curation.EMAIL_RE, curation.IPV4_RE,
                     r"\bcustomer\b")).to_pandas()
    assert out["text_red"][0] == "mail me at [REDACTED] now"
    assert out["text_red"][1] == "[REDACTED] data at [REDACTED]"
    assert out["text_red"][2] == "clean text"
    assert out["n_hits"].tolist() == [1, 2, 0]


def test_redact_phone():
    t = tbl(["call 555-123-4567 or 555 123 4567", "v1.2.3.4567 is a version"])
    out = curation.redact_batch(t, patterns=(curation.PHONE_RE,)).to_pandas()
    assert out["n_hits"].tolist() == [2, 0]
    assert "[REDACTED]" not in out["text_red"][1]


# ------------------------------------------------------- repetition stats


def test_repetition_stats_exact():
    t = tbl(["a b a b a",          # words: a=3 b=2; bigrams: "a b"x2 "b a"x2
             "x y z",              # all distinct
             "solo"])              # 1 word -> no bigrams -> dropped
    out = curation.repetition_stats_batch(t).to_pandas().set_index("doc_id")
    assert list(out.index) == [0, 1]  # "solo" dropped like the SQL join
    r = out.loc[0]
    assert r["n_words"] == 5 and r["n_distinct_words"] == 2
    assert r["dup_word_frac"] == pytest.approx(1 - 2 / 5)
    assert r["top_word_frac"] == pytest.approx(3 / 5)
    assert r["top_bigram_frac"] == pytest.approx(2 / 4)
    r = out.loc[1]
    assert r["dup_word_frac"] == 0.0
    assert r["top_bigram_frac"] == pytest.approx(1 / 2)


def test_repetition_stats_highly_repetitive_doc():
    t = tbl(["spam spam spam spam"])
    out = curation.repetition_stats_batch(t).to_pandas()
    assert out["dup_word_frac"][0] == pytest.approx(0.75)
    assert out["top_word_frac"][0] == 1.0
    assert out["top_bigram_frac"][0] == 1.0


def test_repetition_stats_matches_duckdb():
    import duckdb
    rng = np.random.default_rng(7)
    vocab = ["alpha", "beta", "gamma", "delta", "eps"]
    texts = [" ".join(rng.choice(vocab, size=rng.integers(2, 30)))
             for _ in range(50)]
    t = tbl(texts)
    mine = curation.repetition_stats_batch(t).to_pandas() \
        .sort_values("doc_id", ignore_index=True)
    con = duckdb.connect()
    con.register("documents", t.to_pandas())
    want = con.execute("""
        WITH w AS (
          SELECT doc_id, unnest(string_split(text, ' ')) AS word,
                 unnest(generate_series(1, len(string_split(text, ' ')))) AS k
          FROM documents),
        wc AS (SELECT doc_id, word, count(*) AS c FROM w GROUP BY 1, 2),
        ws AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_words,
                      CAST(count(*) AS BIGINT) AS n_distinct_words,
                      CAST(max(c) AS BIGINT) AS max_wc
               FROM wc GROUP BY doc_id),
        bg AS (SELECT doc_id, word || ' ' ||
                      lead(word) OVER (PARTITION BY doc_id ORDER BY k)
                      AS bigram FROM w),
        bgc AS (SELECT doc_id, bigram, count(*) AS c FROM bg
                WHERE bigram IS NOT NULL GROUP BY 1, 2),
        bs AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bigrams,
                      CAST(max(c) AS BIGINT) AS max_bc FROM bgc
               GROUP BY doc_id)
        SELECT ws.doc_id, ws.n_words, ws.n_distinct_words,
               1.0 - CAST(ws.n_distinct_words AS DOUBLE) / ws.n_words
                   AS dup_word_frac,
               CAST(ws.max_wc AS DOUBLE) / ws.n_words AS top_word_frac,
               CAST(bs.max_bc AS DOUBLE) / bs.n_bigrams AS top_bigram_frac
        FROM ws JOIN bs USING (doc_id) ORDER BY doc_id
    """).fetchdf()
    assert mine["n_words"].tolist() == want["n_words"].tolist()
    assert mine["n_distinct_words"].tolist() == \
        want["n_distinct_words"].tolist()
    np.testing.assert_allclose(mine["dup_word_frac"], want["dup_word_frac"])
    np.testing.assert_allclose(mine["top_word_frac"], want["top_word_frac"])
    np.testing.assert_allclose(mine["top_bigram_frac"],
                               want["top_bigram_frac"])


# ------------------------------------------------------- decontaminate


def test_decontaminate_flags_probe_carriers(ray_session):
    import ray.data as rd
    texts = ["the secret benchmark question lives here ok",
             "nothing to see",
             "prefix then the secret benchmark question lives here too",
             "another clean doc"]
    ds = rd.from_arrow(tbl(texts))
    out = curation.decontaminate(
        ds, probes=["the secret benchmark question"]).to_pandas() \
        .sort_values("doc_id", ignore_index=True)
    assert out["contaminated"].tolist() == [1, 0, 1, 0]


def test_decontaminate_empty_probes(ray_session):
    import ray.data as rd
    ds = rd.from_arrow(tbl(["a", "b"]))
    out = curation.decontaminate(ds, probes=[]).to_pandas()
    assert out["contaminated"].tolist() == [0, 0]


def test_decontaminate_drops_empty_probe_strings(ray_session):
    # an accidental '' probe must not flag the whole corpus (SQL's
    # contains(text, '') is true everywhere — the engine drops empties
    # and oracles mirror that with WHERE p <> '')
    import ray.data as rd
    ds = rd.from_arrow(tbl(["carrier probe text", "clean"]))
    out = curation.decontaminate(ds, probes=["", "probe"]).to_pandas() \
        .sort_values("doc_id", ignore_index=True)
    assert out["contaminated"].tolist() == [1, 0]


def test_probe_strings_derivation(ray_session):
    import ray.data as rd
    texts = [f"document number {i} " + "w " * 40 for i in range(10)]
    ds = rd.from_arrow(tbl(texts))
    probes = curation.probe_strings(ds, every=4, head_chars=12)
    assert sorted(probes) == ["document num"] * 3  # ids 0, 4, 8


# ------------------------------------------------------- budget_select


def test_budget_select_largest_first(ray_session):
    import ray.data as rd
    t = pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
        "source": pa.array(["a", "a", "a", "b", "b", "b"]),
        "n_chars": pa.array([100, 300, 200, 50, 50, 50], pa.int64())})
    ds = rd.from_arrow(t)
    out = curation.budget_select(ds, budget=500).to_pandas() \
        .sort_values(["source", "cum_chars"], ignore_index=True)
    # a: 300 (id2) + 200 (id3) = 500 fits; +100 would exceed
    # b: all three 50s fit (150 <= 500)
    assert out[out.source == "a"]["doc_id"].tolist() == [2, 3]
    assert out[out.source == "a"]["cum_chars"].tolist() == [300, 500]
    assert out[out.source == "b"]["doc_id"].tolist() == [4, 5, 6]


def test_budget_select_ties_break_by_id(ray_session):
    import ray.data as rd
    t = pa.table({
        "doc_id": pa.array([9, 3, 7], pa.int64()),
        "source": pa.array(["s", "s", "s"]),
        "n_chars": pa.array([10, 10, 10], pa.int64())})
    out = curation.budget_select(rd.from_arrow(t), budget=20).to_pandas() \
        .sort_values("cum_chars", ignore_index=True)
    assert out["doc_id"].tolist() == [3, 7]


# ------------------------------------------------------- pack_sequences


def test_pack_single_bucket_layout(ray_session):
    import ray.data as rd
    # bytes: "ab"(2)+EOS, "c"(1)+EOS, "defg"(4)+EOS -> total 10 -> L=4 -> 3 seqs
    ds = rd.from_arrow(tbl(["ab", "c", "defg"]))
    out = curation.pack_sequences_ds(ds, seq_len=4, n_buckets=1) \
        .to_pandas().sort_values("seq_idx", ignore_index=True)
    assert len(out) == 3
    flat = np.concatenate([np.asarray(x) for x in out["tokens"]])
    E, P = curation.EOS_TOKEN, curation.PAD_TOKEN
    expect = [ord("a"), ord("b"), E, ord("c"), E,
              ord("d"), ord("e"), ord("f"), ord("g"), E, P, P]
    assert flat.tolist() == expect
    assert out["n_real"].tolist() == [4, 4, 2]
    assert out["n_eos"].tolist() == [1, 1, 1]


def test_pack_roundtrip_reconstructs_corpus(ray_session):
    import ray.data as rd
    texts = [f"doc {i} body " + "z" * (i % 7) for i in range(20)]
    ds = rd.from_arrow(tbl(texts))
    out = curation.pack_sequences_ds(ds, seq_len=16, n_buckets=4) \
        .to_pandas().sort_values(["part", "seq_idx"], ignore_index=True)
    for part in range(4):
        rows = out[out.part == part]
        flat = np.concatenate([np.asarray(x) for x in rows["tokens"]])
        flat = flat[flat != curation.PAD_TOKEN]
        docs, cur = [], []
        for tok in flat:
            if tok == curation.EOS_TOKEN:
                docs.append(bytes(cur).decode())
                cur = []
            else:
                cur.append(tok)
        assert not cur  # every doc EOS-terminated
        assert docs == [texts[i] for i in range(part, 20, 4)]


def test_pack_stats_match_arithmetic(ray_session):
    import ray.data as rd
    texts = [f"payload {i} " + "x" * (3 * i) for i in range(30)]
    ds = rd.from_arrow(tbl(texts))
    out = curation.pack_stats_ds(ds, seq_len=32, n_buckets=4).to_pandas() \
        .sort_values("part", ignore_index=True)
    for part in range(4):
        ids = list(range(part, 30, 4))
        total = sum(len(texts[i]) + 1 for i in ids)
        r = out[out.part == part].iloc[0]
        assert r["n_docs"] == len(ids)
        assert r["n_tokens"] == total
        assert r["n_sequences"] == (total + 31) // 32


def test_probe_ngram_contamination_oracle(ray_session):
    import duckdb
    import ray.data as rd

    from rwcf.curation import probe_ngram_contamination
    sf = "/root/testdata/sf0.001"
    ds = rd.read_parquet(f"{sf}/documents.parquet",
                         columns=["doc_id", "text"])
    out = probe_ngram_contamination(ds, ngram=2).to_pandas() \
        .sort_values("doc_id", ignore_index=True)
    exp = duckdb.sql(
        f"WITH pw AS (SELECT regexp_extract_all(text, '\\S+') AS ws "
        f"FROM read_parquet('{sf}/documents.parquet') "
        f"WHERE doc_id % 97 = 0), "
        f"probes AS (SELECT DISTINCT ws[i] || ' ' || ws[i + 1] AS bg "
        f"FROM pw, unnest(generate_series(1, len(ws) - 1)) AS t(i)), "
        f"dw AS (SELECT doc_id, regexp_extract_all(text, '\\S+') AS ws "
        f"FROM read_parquet('{sf}/documents.parquet')), "
        f"d AS (SELECT doc_id, ws[i] || ' ' || ws[i + 1] AS bg "
        f"FROM dw, unnest(generate_series(1, len(ws) - 1)) AS t(i)) "
        f"SELECT doc_id, count(*) AS n, "
        f"sum(CASE WHEN bg IN (SELECT bg FROM probes) THEN 1 ELSE 0 "
        f"END) AS h FROM d GROUP BY 1 ORDER BY 1").df()
    assert out["doc_id"].tolist() == exp["doc_id"].astype("int64").tolist()
    assert out["n_ngrams"].tolist() == exp["n"].astype("int64").tolist()
    assert out["n_contaminated"].tolist() == \
        exp["h"].astype("int64").tolist()
    bp = (exp["h"].astype("int64") * 10000) // exp["n"].astype("int64")
    assert out["contaminated_bp"].tolist() == bp.tolist()


def test_probe_ngram_contamination_probe_is_full_hit(ray_session):
    # a probe document's own bigrams are all in the probe set -> 10000bp
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from rwcf.curation import probe_ngram_contamination
    t = pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),  # 0 is the probe
        "text": pa.array(["a b c", "a b x", "zz yy"])})
    out = probe_ngram_contamination(rd.from_arrow(t), ngram=2) \
        .to_pandas().sort_values("doc_id", ignore_index=True)
    assert out["doc_id"].tolist() == [0, 1, 2]
    assert out["n_ngrams"].tolist() == [2, 2, 1]
    # doc1: "a b" hits, "b x" misses -> 5000bp; doc2: nothing
    assert out["n_contaminated"].tolist() == [2, 1, 0]
    assert out["contaminated_bp"].tolist() == [10000, 5000, 0]


def test_leakage_safe_split_groups_duplicates(ray_session):
    # duplicates of one content must share a split: ids 0 and 91 are
    # copies, and the plain id-hash split WOULD separate them (their own
    # LCG hashes land in different buckets); the cluster-rep hash keeps
    # them together
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from rwcf.curation import leakage_safe_split_counts

    rng = np.random.default_rng(7)
    texts = [f"unique document {i} " + "x" * int(rng.integers(1, 30))
             for i in range(120)]
    texts[91] = texts[0]   # exact duplicate pair straddling the id space
    texts[55] = texts[10]
    t = pa.table({
        "doc_id": pa.array(np.arange(120, dtype=np.int64)),
        "text": pa.array(texts),
        "source": pa.array(["s%d" % (i % 3) for i in range(120)]),
    })
    out = leakage_safe_split_counts(rd.from_arrow(t)).to_pandas()

    # oracle: every row hashes its content-cluster min id
    rep = {}
    for i, txt in enumerate(texts):
        rep.setdefault(txt, i)
    h = np.array([((rep[txt] * 1103515245 + 12345) % 2147483648) % 100
                  for txt in texts])
    split = np.where(h < 80, "train", np.where(h < 90, "val", "test"))
    import pandas as pd
    exp = pd.DataFrame({"source": ["s%d" % (i % 3) for i in range(120)],
                        "split": split}) \
        .groupby(["source", "split"]).size().rename("n_docs").reset_index()
    got = out.sort_values(["source", "split"], ignore_index=True)
    exp = exp.sort_values(["source", "split"], ignore_index=True)
    assert got["n_docs"].astype(int).tolist() == \
        exp["n_docs"].astype(int).tolist()
    assert got["source"].tolist() == exp["source"].tolist()
    assert got["split"].tolist() == exp["split"].tolist()
    # the guard property itself: duplicate members never straddle splits
    assert split[0] == split[91] and split[10] == split[55]


def test_contamination_scores_match_bruteforce(ray_session):
    import numpy as np
    import ray.data as rd
    texts = ["alpha beta gamma delta",
             "beta only here",
             "alpha beta and also gamma here",
             "nothing matching at all",
             "gamma gamma gamma"]
    probes = ["alpha beta", "gamma", ""]  # empty probe must be dropped
    ds = rd.from_arrow(tbl(texts))
    got = curation.contamination_scores(ds, probes).to_pandas() \
        .sort_values("doc_id", ignore_index=True)
    kept = [p for p in probes if p]
    exp = np.array([sum(p in t for p in kept) for t in texts],
                   dtype=np.int64)
    assert got["n_hit"].tolist() == exp.tolist()
    assert got["score1000"].tolist() == (exp * 1000 // len(kept)).tolist()
