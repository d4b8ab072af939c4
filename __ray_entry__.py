"""Driver contract for the rwcf engine (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported; nothing
here (or in the rwcf library) calls ray.init()/ray.shutdown().

The SQL-checkable queries run the real engine over a *tokenized* view of the
driver's ``documents`` table: token ids are the UTF-8 bytes of ``text`` as
int32 (exactly invertible), so ``n_tok = strlen(text)`` and decoded
tokens reconstruct ``text`` bit-identically — every encode→decode pipeline
below therefore has an ANSI-SQL oracle on the raw view. Non-SQL-expressible
operators (codec selection lineage, the synthetic flagship round trip)
return rows-only entries.
"""

from __future__ import annotations

import os
import shutil
import sys
from collections.abc import Callable
from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# Make rwcf importable regardless of the driver's cwd, and ship it to Ray
# workers by value (workers may not have /root/repo on sys.path).
_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

import rwcf  # noqa: E402
import rwcf.codecs  # noqa: E402  (ensure submodules are loaded)
import rwcf.documents  # noqa: E402
import rwcf.fixtures  # noqa: E402
import rwcf.grouped  # noqa: E402
import rwcf.pipeline  # noqa: E402
import rwcf.selector  # noqa: E402

try:
    from ray import cloudpickle as _rcp
    for _name, _mod in list(sys.modules.items()):
        if _name == "rwcf" or _name.startswith("rwcf."):
            _rcp.register_pickle_by_value(_mod)
except Exception:  # registration is best-effort; same-cwd drivers don't need it
    pass

_RUN_BASE = "/tmp/rwcf_runs"
_ENCODED_RUNS: dict[str, str] = {}


def _workdir(name: str, sf_dir: str, fresh: bool = True) -> str:
    tag = os.path.basename(os.path.normpath(sf_dir))
    d = os.path.join(_RUN_BASE, f"{name}-{tag}")
    if fresh and os.path.isdir(d):
        shutil.rmtree(d)
    os.makedirs(d, exist_ok=True)
    return d


def _encoded_run(sf_dir: str) -> str:
    """Tokenize documents -> parquet -> encode_job; one run per sf_dir per
    process (queries share it). Returns the encode out_dir."""
    if sf_dir in _ENCODED_RUNS:
        return _ENCODED_RUNS[sf_dir]
    from rwcf import documents, pipeline
    work = _workdir("encode", sf_dir)
    tokens_dir = documents.tokens_parquet_for(sf_dir, work)
    cfg = pipeline.EncodeConfig(out_dir=os.path.join(work, "out"),
                                partition_token_budget=1_000_000)
    pipeline.encode_job(documents.parquet_files(tokens_dir), cfg) \
        .materialize()  # run to completion; manifest rows are tiny
    _ENCODED_RUNS[sf_dir] = cfg.out_dir
    return cfg.out_dir


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------

def _q_roundtrip_docs(sf_dir: str):
    """Full engine loop: tokenize -> encode -> decode -> detokenize."""
    from rwcf import documents, pipeline
    out = _encoded_run(sf_dir)
    dec = pipeline.decode_job(out)
    from rwcf import rayenv
    return dec.map_batches(documents.detokenize_batch, batch_format="pyarrow",
                           **rayenv.remote_args())


def _q_decode_project(sf_dir: str):
    """Column-pruned decode: only (doc_id, n_tok) sections leave disk."""
    from rwcf import pipeline
    out = _encoded_run(sf_dir)
    dec = pipeline.decode_job(out, columns=["doc_id", "n_tok"])

    def cast(t: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": pc.cast(t.column("doc_id"), pa.int64()),
            "n_tok": pc.cast(t.column("n_tok"), pa.int64()),
        })
    from rwcf import rayenv
    return dec.map_batches(cast, batch_format="pyarrow", **rayenv.remote_args())


def _q_source_stats(sf_dir: str):
    """Grouped-by-source (salted shuffle) encode; stats from lineage alone —
    compressed-domain aggregation, zero payload decoded."""
    from rwcf import documents, grouped, pipeline
    work = _workdir("grouped", sf_dir)
    tokens_dir = documents.tokens_parquet_for(sf_dir, work)
    cfg = pipeline.EncodeConfig(out_dir=os.path.join(work, "out"),
                                partition_token_budget=1_000_000)
    grouped.encode_grouped_by_source(
        documents.parquet_files(tokens_dir), cfg).materialize()
    df = grouped.per_source_manifest_stats(cfg.out_dir)
    return df[["source", "n_rows", "n_tokens"]]


def _q_total_tokens(sf_dir: str):
    """Global manifest roll-up via Dataset.aggregate (tree reduce)."""
    from ray.data.aggregate import Sum
    from rwcf import pipeline
    out = _encoded_run(sf_dir)
    total = pipeline.manifest_dataset(out).aggregate(Sum("n_tokens",
                                                         alias_name="n_tokens"))
    import pandas as pd
    return pd.DataFrame([{"n_tokens": int(total["n_tokens"])}])


def _rt_query(col: str, codec_id: str | None) -> Callable[[str], Any]:
    """Distributed per-batch codec round-trip over one documents column.
    codec_id None = auto-selector."""

    def run(sf_dir: str):
        import ray.data as rd
        from rwcf import format as fmt
        from rwcf import selector
        ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                             columns=[col])

        def rt(t: pa.Table) -> pa.Table:
            arr = t.column(col).combine_chunks()
            dtype = fmt.dtype_code_for_arrow(arr.type)
            chunk = fmt.chunk_from_arrow(arr)
            if codec_id is None:
                enc, _ = selector.encode_auto(chunk, dtype)
            else:
                enc = fmt.encode_chunk(chunk, dtype, codec_id)
            blob = fmt.write_column_file(enc)
            rt_enc = fmt.read_column_file(blob)
            rt_enc.dtype = dtype
            out = fmt.decode_chunk(rt_enc)
            return pa.table({col: fmt.chunk_to_arrow(out, dtype).cast(arr.type)})

        from rwcf import rayenv
        return ds.map_batches(rt, batch_format="pyarrow",
                              **rayenv.remote_args())

    return run


def _q_compressed_sum_nchars(sf_dir: str):
    """Sum computed in the compressed domain: sum(value*run_length) over RLE
    runs, never expanding (the src/test_rle.rs:8-17 pattern), partial per
    batch then a global aggregate."""
    import ray.data as rd
    from ray.data.aggregate import Sum
    from rwcf import format as fmt
    from rwcf.codecs import REGISTRY
    ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                         columns=["n_chars"])

    def partial(t: pa.Table) -> pa.Table:
        vals = t.column("n_chars").combine_chunks().to_numpy().astype(np.int64)
        enc = fmt.encode_chunk(vals, "i64", "rle")
        rv, lens = REGISTRY["rle"].decode_runs(enc.payload, enc.pages, enc.meta,
                                               "i64")
        return pa.table({"partial": pa.array([int((rv * lens).sum())],
                                             type=pa.int64())})

    from rwcf import rayenv
    total = ds.map_batches(partial, batch_format="pyarrow",
                           **rayenv.remote_args()) \
        .aggregate(Sum("partial", alias_name="total_nchars"))
    import pandas as pd
    return pd.DataFrame([{"total_nchars": int(total["total_nchars"])}])


def _q_codec_selection(sf_dir: str):
    """Lineage: chosen codec + byte counts per (partition, column). Not
    SQL-expressible (selector internals) — rows-only check."""
    import pandas as pd
    from rwcf import pipeline
    out = _encoded_run(sf_dir)
    rows = []
    for r in pipeline.load_manifest(out):
        for c in r["columns"]:
            rows.append({"pid": r["pid"], "column": c["column"],
                         "codec": c["codec"], "encoded_bytes": c["length"],
                         "decoded_bytes": c["decoded_bytes"]})
    return pd.DataFrame(rows)


def _q_flagship_synthetic(sf_dir: str):
    """F1 synthetic tokens table (input_hint shape, with planted skew) ->
    size-aware encode -> per-partition bit-exact verify. Rows-only."""
    from rwcf import fixtures, pipeline
    tag = os.path.basename(os.path.normpath(sf_dir))
    sf = {"sf0.001": 0.001, "sf0.01": 0.01, "sf0.1": 0.1}.get(tag, 0.001)
    path = fixtures.tokens_parquet(fixtures.rows_for_sf(sf))
    work = _workdir("flagship", sf_dir)
    cfg = pipeline.EncodeConfig(out_dir=os.path.join(work, "out"))
    pipeline.encode_job(path, cfg).materialize()
    return pipeline.verify_job(cfg.out_dir)


def entry() -> Any:
    """Flagship on sf0.001: tokenize documents -> encode (size-aware
    partitions, auto codecs, lineage manifest) -> decode -> detokenize."""
    sf_dir = "/root/testdata/sf0.001"
    _ENCODED_RUNS.pop(sf_dir, None)  # fresh smoke run
    return _q_roundtrip_docs(sf_dir)


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        "roundtrip_docs": _q_roundtrip_docs,
        "decode_project": _q_decode_project,
        "source_stats": _q_source_stats,
        "total_tokens": _q_total_tokens,
        "rt_plain_source": _rt_query("source", "plain"),
        "rt_rle_lang": _rt_query("lang", "rle"),
        "rt_dict_source": _rt_query("source", "dict"),
        "rt_fsst_text": _rt_query("text", "fsst"),
        "rt_bitpack_nchars": _rt_query("n_chars", "bitpack"),
        "rt_for_docid": _rt_query("doc_id", "for"),
        "rt_auto_nchars": _rt_query("n_chars", None),
        "compressed_sum_nchars": _q_compressed_sum_nchars,
        "codec_selection": _q_codec_selection,
        "flagship_synthetic": _q_flagship_synthetic,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "roundtrip_docs": "SELECT doc_id, text FROM documents",
        "decode_project": ("SELECT doc_id, CAST(strlen(text) AS BIGINT)"
                           " AS n_tok FROM documents"),
        "source_stats": ("SELECT source, CAST(count(*) AS BIGINT) AS n_rows, "
                         "CAST(sum(strlen(text)) AS BIGINT) AS n_tokens "
                         "FROM documents GROUP BY source"),
        "total_tokens": ("SELECT CAST(sum(strlen(text)) AS BIGINT) "
                         "AS n_tokens FROM documents"),
        "rt_plain_source": "SELECT source FROM documents",
        "rt_rle_lang": "SELECT lang FROM documents",
        "rt_dict_source": "SELECT source FROM documents",
        "rt_fsst_text": "SELECT text FROM documents",
        "rt_bitpack_nchars": "SELECT n_chars FROM documents",
        "rt_for_docid": "SELECT doc_id FROM documents",
        "rt_auto_nchars": "SELECT n_chars FROM documents",
        "compressed_sum_nchars": ("SELECT CAST(sum(n_chars) AS BIGINT) "
                                  "AS total_nchars FROM documents"),
        # codec_selection, flagship_synthetic: rows-only (not SQL-expressible)
    }
