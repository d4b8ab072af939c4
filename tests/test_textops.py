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
