"""Composed corpus-prep pipeline (rwcf.prep): language gate + word-count
window + exact dedup in one streaming pipeline with a single shuffle."""

import numpy as np
import pandas as pd

from rwcf import prep


def _run(docs, **kw):
    import ray.data as rd
    return (prep.prep_corpus(rd.from_pandas(docs).repartition(3), **kw)
            .to_pandas().sort_values("doc_id").reset_index(drop=True))


def test_prep_corpus_filters_and_dedups(ray_session):
    long = "w " * 30  # 30 words, inside [20, 2000]
    docs = pd.DataFrame({
        "doc_id": np.arange(1, 8, dtype=np.int64),
        "text": [long, long,            # dup pair: min id 1 survives
                 "short text",           # under min_words
                 long + "unique tail",   # passes
                 long,                   # third copy of the dup text
                 long + "x " * 2500,     # over max_words
                 long + "zz"],           # passes
        "lang": ["en", "en", "en", "es", "en", "en", "de"],
        "source": [f"s{i}" for i in range(7)]})
    got = _run(docs)
    # doc 3 (short), 6 (too long), 7 (lang de) filtered; 2,5 deduped to 1
    assert got["doc_id"].tolist() == [1, 4]
    assert got.columns.tolist() == ["doc_id", "source", "lang", "n_words"]
    assert got["n_words"].tolist() == [30, 32]


def test_prep_corpus_dedup_after_filter(ray_session):
    # the duplicate with the SMALLER id fails the lang gate, so the
    # surviving copy is the min id among FILTERED rows (SQL semantics:
    # dedup runs over the filtered set)
    long = "w " * 25
    docs = pd.DataFrame({
        "doc_id": np.array([1, 2, 3], dtype=np.int64),
        "text": [long, long, long],
        "lang": ["zh", "en", "en"],
        "source": ["a", "b", "c"]})
    got = _run(docs)
    assert got["doc_id"].tolist() == [2]
    assert got["source"].tolist() == ["b"]


def test_prep_corpus_word_count_boundaries(ray_session):
    docs = pd.DataFrame({
        "doc_id": np.array([1, 2, 3, 4], dtype=np.int64),
        "text": ["w " * 19, "w " * 20, "w " * 40, "w " * 41],
        "lang": ["en"] * 4,
        "source": ["s"] * 4})
    got = _run(docs, min_words=20, max_words=40)
    assert got["doc_id"].tolist() == [2, 3]


def test_chunk_dedup_stats(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from rwcf.prep import chunk_dedup_stats

    # doc 0 and doc 1 are byte-identical -> every doc-1 chunk loses to
    # doc 0; doc 2 shares no chunks; doc 3 is short (single chunk).
    # base must be aperiodic: repeated phrases shorter than the stride
    # create WITHIN-doc duplicate chunks (a real effect this operator
    # detects — but not what this test pins)
    base = " ".join(f"word{i:03d}" for i in range(30))   # 209 chars, unique
    df = pd.DataFrame({
        "doc_id": np.array([0, 1, 2, 3], dtype=np.int64),
        "text": [base, base, "completely different content here " * 6,
                 "tiny"],
    })
    out = chunk_dedup_stats(rd.from_pandas(df).repartition(3),
                            width=64, stride=48) \
        .to_pandas().sort_values("doc_id", ignore_index=True)
    # doc 0: all its chunks survive (lexicographic-min winner)
    r0 = out.loc[out["doc_id"] == 0].iloc[0]
    assert r0["n_surviving"] == r0["n_chunks"]
    # doc 1: identical text, higher id -> zero survivors
    r1 = out.loc[out["doc_id"] == 1].iloc[0]
    assert r1["n_chunks"] == r0["n_chunks"] and r1["n_surviving"] == 0
    # docs 2, 3: unique content -> full survival
    for d in (2, 3):
        r = out.loc[out["doc_id"] == d].iloc[0]
        assert r["n_surviving"] == r["n_chunks"]
    assert out.loc[out["doc_id"] == 3, "n_chunks"].iloc[0] == 1
