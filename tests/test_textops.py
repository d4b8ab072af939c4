"""Text-analysis kernels (token counting, quality, fingerprint, lang-id)."""

import numpy as np
import pyarrow as pa

from rwcf import textops


def tbl(texts):
    return pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                     "text": pa.array(texts, pa.string())})


def test_token_count():
    t = tbl(["a b  c", "", "one-word", "x, y; z!"])
    out = textops.token_count_batch(t).to_pandas()
    assert out["n_words"].tolist() == [3, 0, 1, 3]
    # bpe-ish: word runs + single punct: "one-word" -> one,-,word = 3
    assert out["n_bpeish"].tolist() == [3, 0, 3, 6]


def test_quality_counters():
    t = tbl(["The quick Brown fox 42!", "aaaa"])
    out = textops.quality_batch(t).to_pandas()
    r = out.iloc[0]
    assert r["n_bytes"] == 23
    assert r["n_words"] == 5
    assert r["n_upper"] == 2  # T, B
    assert r["n_digit"] == 2
    assert r["n_punct"] == 1  # !
    assert out.iloc[1]["n_stop"] == 0


def test_fingerprint_deterministic_and_distinct():
    t = tbl(["hello", "hello", "hellp", ""])
    out = textops.fingerprint_batch(t).to_pandas()
    fp = out["fingerprint"].tolist()
    assert fp[0] == fp[1]
    assert fp[0] != fp[2]
    assert fp[3] == 0
    # pure function of content
    out2 = textops.fingerprint_batch(t).to_pandas()
    assert out2["fingerprint"].tolist() == fp


def test_segment_poly_hash_matches_scalar():
    texts = ["abc", "", "a", "abcd" * 100]
    payload = np.frombuffer("".join(texts).encode(), dtype=np.uint8)
    lengths = np.array([len(s) for s in texts], dtype=np.int64)
    out = textops.segment_poly_hash(lengths, payload)
    for s, h in zip(texts, out):
        ref = np.uint64(0)
        p = np.uint64(1)
        for ch in s.encode():
            ref = ref + np.uint64(ch) * p
            p = p * textops._FP_BASE
        assert h == ref


def test_lang_id_markers():
    t = tbl(["the cat and the dog is here",
             "el perro es que la casa y",
             "der hund und die katze ist",
             "完全に日本語ではない中文文本"])
    out = textops.lang_id_batch(t).to_pandas()
    assert out["lang_pred"].tolist()[:3] == ["en", "es", "de"]
    assert out["lang_pred"].iloc[3] == "zh"


def test_window_hashes():
    b = np.frombuffer(b"abcdef", dtype=np.uint8)
    w = textops.window_hashes(b, 3)
    assert w.size == 4
    # first window = 'abc' LE-packed
    assert w[0] == (ord('a') | ord('b') << 8 | ord('c') << 16)
    assert textops.window_hashes(b, 8).size == 0  # shorter than window


def test_json_field_int_extraction():
    import pyarrow as pa

    from rwcf.textops import json_field_int

    col = pa.array(['{"k": 69}', '{"k": -3, "x": 1}', '{"x": 5}',
                    '{"k": "str"}', None, '{ "k" :  42 }'])
    got = json_field_int(col, "k")
    assert got.to_pylist() == [69, -3, None, None, None, 42]


def test_normalize_text_batch():
    import pyarrow as pa

    from rwcf.textops import normalize_text_batch

    t = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                  "text": ["  Hello\t WORLD \n", "a  b", ""]})
    out = normalize_text_batch(t)
    assert out.column("text_norm").to_pylist() == ["hello world", "a b", ""]
    assert out.column("n_chars_norm").to_pylist() == [11, 3, 0]


def test_chunk_docs_batch_layout():
    import numpy as np
    import pyarrow as pa

    from rwcf.textops import chunk_docs_batch

    t = pa.table({"doc_id": pa.array([1, 2, 3, 4], pa.int64()),
                  "text": ["abcdefghij", "xy", "", "a" * 25]})
    out = chunk_docs_batch(t, width=8, stride=6)
    # doc 1 (len 10): chunks at 0,6 -> "abcdefgh","ghij"
    # doc 2 (len 2): one short chunk; doc 3 (len 0): one empty chunk
    # doc 4 (len 25): ceil(17/6)+1 = 4 chunks at 0,6,12,18
    assert out.column("doc_id").to_pylist() == [1, 1, 2, 3, 4, 4, 4, 4]
    assert out.column("chunk_id").to_pylist() == [0, 1, 0, 0, 0, 1, 2, 3]
    assert out.column("chunk_text").to_pylist() == [
        "abcdefgh", "ghij", "xy", "", "aaaaaaaa", "aaaaaaaa", "aaaaaaaa",
        "aaaaaaa"]
    assert out.column("chunk_len").to_pylist() == [8, 4, 2, 0, 8, 8, 8, 7]
    # every byte covered: union of [k*s, k*s+w) per doc is [0, len)
    # exact-boundary case: len - width divisible by stride -> full last
    t2 = pa.table({"doc_id": pa.array([7], pa.int64()),
                   "text": ["x" * 20]})  # w=8 s=6: 20-8=12 = 2*6 -> 3 chunks
    out2 = chunk_docs_batch(t2, width=8, stride=6)
    assert out2.column("chunk_len").to_pylist() == [8, 8, 8]
    # reconstruction: non-overlap prefix of each chunk re-concatenates
    txt = "abcdefghijklmnopqrstuvwxyz0123456789"
    t3 = pa.table({"doc_id": pa.array([9], pa.int64()), "text": [txt]})
    o3 = chunk_docs_batch(t3, width=10, stride=7).to_pandas()
    rebuilt = "".join(c[:7] for c in o3["chunk_text"][:-1]) \
        + o3["chunk_text"].iloc[-1]
    assert rebuilt == txt


def test_chunk_docs_rejects_non_ascii_and_bad_params():
    import pyarrow as pa
    import pytest

    from rwcf.textops import chunk_docs_batch

    t = pa.table({"doc_id": pa.array([1], pa.int64()), "text": ["héllo"]})
    with pytest.raises(ValueError, match="ASCII"):
        chunk_docs_batch(t, width=4, stride=2)
    ok = pa.table({"doc_id": pa.array([1], pa.int64()), "text": ["hello"]})
    with pytest.raises(ValueError):
        chunk_docs_batch(ok, width=0, stride=2)
    with pytest.raises(ValueError):
        chunk_docs_batch(ok, width=4, stride=-1)


def test_quality_by_group_oracle(ray_session):
    import duckdb
    import ray.data as rd

    from rwcf.textops import quality_by_group
    sf = "/root/testdata/sf0.001"
    ds = rd.read_parquet(f"{sf}/documents.parquet",
                         columns=["lang", "text"])
    out = quality_by_group(ds, key_col="lang").to_pandas() \
        .sort_values("lang", ignore_index=True)
    exp = duckdb.sql(
        f"SELECT lang, count(*) AS n_docs, "
        f"sum(length(regexp_extract_all(text, '\\S+'))) AS w, "
        f"sum(length(regexp_extract_all(text, '[^\\w\\s]'))) AS p, "
        f"sum(length(regexp_extract_all(text, '[0-9]'))) AS d, "
        f"sum(length(regexp_extract_all(text, "
        f"'\\b(the|a|and|of|to|in|is|it|that|for)\\b'))) AS s "
        f"FROM read_parquet('{sf}/documents.parquet') "
        f"GROUP BY 1 ORDER BY 1").df()
    assert out["lang"].tolist() == exp["lang"].tolist()
    assert out["n_docs"].tolist() == exp["n_docs"].astype("int64").tolist()
    assert out["n_words"].tolist() == exp["w"].astype("int64").tolist()
    assert out["n_punct"].tolist() == exp["p"].astype("int64").tolist()
    assert out["n_digit"].tolist() == exp["d"].astype("int64").tolist()
    assert out["n_stop"].tolist() == exp["s"].astype("int64").tolist()
