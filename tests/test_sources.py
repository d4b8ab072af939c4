"""JSONL / CSV ingestion sources: normalization, strict n_chars guard,
parity with the parquet-born pipeline."""

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from rwcf import sources


@pytest.fixture()
def doc_rows(tmp_path):
    df = pd.DataFrame({
        "doc_id": np.arange(40, dtype=np.int64),
        "text": [f"doc {i} body with words " * (i % 4 + 1) for i in range(40)],
        "lang": ["en", "es"] * 20,
        "source": [f"s{i % 3}" for i in range(40)],
    })
    df["n_chars"] = df["text"].str.len()
    return df


def _write_jsonl_shards(df, d, shards=3):
    os.makedirs(d, exist_ok=True)
    for s in range(shards):
        part = df.iloc[s::shards]
        with open(os.path.join(d, f"part-{s}.jsonl"), "w") as f:
            for _, r in part.iterrows():
                f.write(json.dumps(r.to_dict()) + "\n")


def test_read_jsonl_docs_roundtrip(ray_session, tmp_path, doc_rows):
    d = str(tmp_path / "jsonl")
    _write_jsonl_shards(doc_rows, d)
    out = sources.read_jsonl_docs(d).to_pandas() \
        .sort_values("doc_id", ignore_index=True)
    exp = doc_rows.sort_values("doc_id", ignore_index=True)
    assert out["text"].tolist() == exp["text"].tolist()
    assert out["n_chars"].tolist() == exp["n_chars"].tolist()
    assert list(out.columns) == ["doc_id", "text", "lang", "source",
                                 "n_chars"]
    # downstream op composes directly on the ingested Dataset
    from rwcf.textops import chunk_docs_ds
    ch = chunk_docs_ds(sources.read_jsonl_docs(d), width=16, stride=12) \
        .to_pandas()
    got = ch.groupby("doc_id").size().sort_index()
    lens = exp.set_index("doc_id")["n_chars"].sort_index()
    want = np.where(lens <= 16, 1, np.ceil((lens - 16) / 12) + 1)
    assert (got.to_numpy() == want.astype(int)).all()


def test_read_csv_docs_and_strict_guard(ray_session, tmp_path, doc_rows):
    # CSV path (no n_chars column -> derived)
    p = str(tmp_path / "docs.csv")
    doc_rows.drop(columns=["n_chars"]).to_csv(p, index=False)
    out = sources.read_csv_docs(p).to_pandas() \
        .sort_values("doc_id", ignore_index=True)
    assert out["n_chars"].tolist() == doc_rows.sort_values("doc_id")[
        "n_chars"].tolist()
    # strict guard: corrupted shipped n_chars must fail loudly
    bad = doc_rows.copy()
    bad.loc[5, "n_chars"] += 3
    d = str(tmp_path / "bad")
    _write_jsonl_shards(bad, d, shards=1)
    with pytest.raises(Exception, match="contradicts"):
        sources.read_jsonl_docs(d).materialize()
    # strict=False rederives instead
    ok = sources.read_jsonl_docs(d, strict=False).to_pandas()
    assert ok.loc[ok["doc_id"] == 5, "n_chars"].iloc[0] == \
        len(bad.loc[5, "text"])


def test_normalize_rejects_missing_required():
    t = pa.table({"text": pa.array(["x"])})
    with pytest.raises(ValueError, match="doc_id"):
        sources.normalize_docs_batch(t)
