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
