"""Ingestion sources beyond parquet: JSONL (NDJSON) and CSV document
tables, normalized to the engine's canonical documents schema.

Raw crawls and annotation dumps arrive as JSONL/CSV far more often than
parquet; these readers front-load the two things every downstream rwcf
operator assumes: (1) canonical column types (int64 ids, string text) and
(2) a validated/derived ``n_chars`` so length-based stages (zone maps,
chunking, quality windows) never recompute it. Both delegate the actual
IO to Ray Data's native readers (``read_json`` / ``read_csv``), which
parallelize per file and stream blocks — the normalization is one
stateless ``map_batches`` stage on top, zero shuffles.

Scale notes: point these at a DIRECTORY of shard files (the standard
crawl layout) so Ray fans out one read task per file; a single giant
JSONL file serializes into one task — reshard upstream, or convert to
parquet with :func:`rwcf.sinks.write_partitioned` after first ingest
(columnar + row groups beat line-delimited text for every later pass).

Reference scope note: the reference engine reads only in-memory byte
streams (SURVEY.md §2.2 "Sources"); file-format ingestion is part of the
brief's pipeline mandate.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from . import rayenv

__all__ = ["read_jsonl_docs", "read_csv_docs", "normalize_docs_batch"]


def normalize_docs_batch(t: pa.Table, strict: bool = True) -> pa.Table:
    """Normalize one ingested batch to the canonical documents schema:
    cast ids/strings, derive ``n_chars`` from the text when absent, and
    (strict mode) REJECT rows whose shipped ``n_chars`` disagrees with
    the text — silent metadata drift is how a 100-TB ingest poisons
    every later zone-map prune."""
    cols = {}
    if "doc_id" not in t.column_names or "text" not in t.column_names:
        raise ValueError("documents ingest requires doc_id and text")
    cols["doc_id"] = pc.cast(t.column("doc_id"), pa.int64())
    cols["text"] = pc.cast(t.column("text"), pa.large_string())
    for opt in ("lang", "source"):
        if opt in t.column_names:
            cols[opt] = pc.cast(t.column(opt), pa.large_string())
    derived = pc.cast(pc.utf8_length(cols["text"]), pa.int64())
    if "n_chars" in t.column_names:
        shipped = pc.cast(t.column("n_chars"), pa.int64())
        if strict:
            bad = pc.sum(pc.cast(pc.not_equal(shipped, derived),
                                 pa.int64())).as_py() or 0
            if bad:
                raise ValueError(
                    f"{bad} rows ship an n_chars that contradicts the "
                    "text (strict ingest); pass strict=False to rederive")
    cols["n_chars"] = derived
    return pa.table(cols)


def _normalized(ds, strict: bool):
    import functools
    fn = functools.partial(normalize_docs_batch, strict=strict)
    return ds.map_batches(fn, batch_format="pyarrow",
                          **rayenv.remote_args())


def read_jsonl_docs(path: str, strict: bool = True):
    """Read a JSONL (NDJSON) documents table — one JSON object per line,
    one read task per shard file — and normalize it. ``path`` may be a
    file or a directory of shards."""
    import ray.data as rd
    return _normalized(rd.read_json(path), strict)


def read_csv_docs(path: str, strict: bool = True):
    """Read a CSV documents table (header row required) and normalize
    it. ``path`` may be a file or a directory of shards."""
    import ray.data as rd
    return _normalized(rd.read_csv(path), strict)
