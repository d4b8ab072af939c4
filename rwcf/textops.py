"""Text-analysis operators for large-scale training-data pipelines.

All operators are vectorized ``map_batches`` kernels over Arrow batches —
``pyarrow.compute`` regex counting and numpy segmented reductions; no
Python-per-row loops in any hot path. Each has a ``queries()`` entry; the
integer-exact ones (token counts, quality counters) carry ANSI-SQL oracles
on the ``documents`` view, while heuristics (language id) and hashes
(fingerprints) are rows-only checked.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# GPT-2-flavoured pretokenizer, simplified to what pyarrow's RE2 supports:
# a "token" is a run of word chars or a run of non-space punctuation.
BPEISH_PATTERN = r"[A-Za-z0-9_]+|[^\sA-Za-z0-9_]"
WORD_PATTERN = r"\S+"

_PUNCT = r"[^\w\s]"
_UPPER = r"[A-Z]"
_DIGIT = r"[0-9]"

_STOPWORDS = ("the", "a", "and", "of", "to", "in", "is", "it", "that", "for")

#: tiny per-language marker-word profiles (public-knowledge function words)
LANG_MARKERS = {
    "en": r"\b(the|and|of|is|that|with)\b",
    "es": r"\b(el|la|los|las|es|que|y)\b",
    "de": r"\b(der|die|das|und|ist|nicht)\b",
    "fr": r"\b(le|la|les|est|que|et|une)\b",
    "zh": r"[一-鿿]",
}


def token_count_batch(t: pa.Table, text_col: str = "text") -> pa.Table:
    """Whitespace word count + BPE-ish subtoken count per document."""
    text = t.column(text_col)
    return pa.table({
        "doc_id": t.column("doc_id"),
        "n_words": pc.cast(pc.count_substring_regex(text, WORD_PATTERN), pa.int64()),
        "n_bpeish": pc.cast(pc.count_substring_regex(text, BPEISH_PATTERN), pa.int64()),
    })


def quality_batch(t: pa.Table, text_col: str = "text") -> pa.Table:
    """Quality-scoring counters: exact integers (SQL-checkable) plus derived
    ratios for filtering."""
    text = t.column(text_col)
    n_bytes = pc.cast(pc.binary_length(pc.cast(text, pa.binary())), pa.int64())
    n_words = pc.cast(pc.count_substring_regex(text, WORD_PATTERN), pa.int64())
    n_punct = pc.cast(pc.count_substring_regex(text, _PUNCT), pa.int64())
    n_upper = pc.cast(pc.count_substring_regex(text, _UPPER), pa.int64())
    n_digit = pc.cast(pc.count_substring_regex(text, _DIGIT), pa.int64())
    n_stop = pc.cast(pc.count_substring_regex(
        text, r"\b(" + "|".join(_STOPWORDS) + r")\b"), pa.int64())
    words = np.maximum(n_words.combine_chunks().to_numpy(zero_copy_only=False), 1)
    stop_ratio = n_stop.combine_chunks().to_numpy(zero_copy_only=False) / words
    return pa.table({
        "doc_id": t.column("doc_id"),
        "n_bytes": n_bytes, "n_words": n_words, "n_punct": n_punct,
        "n_upper": n_upper, "n_digit": n_digit, "n_stop": n_stop,
        "stop_ratio": pa.array(stop_ratio, type=pa.float64()),
    })


def lang_id_batch(t: pa.Table, text_col: str = "text") -> pa.Table:
    """Marker-based language id (n-gram/function-word heuristic).
    Rows-only: a heuristic has no SQL oracle."""
    text = t.column(text_col)
    scores = []
    langs = list(LANG_MARKERS)
    for lang in langs:
        c = pc.count_substring_regex(text, LANG_MARKERS[lang])
        scores.append(c.combine_chunks().to_numpy(zero_copy_only=False).astype(np.float64))
    m = np.stack(scores, axis=1)
    pred = np.array(langs, dtype=object)[m.argmax(axis=1)]
    pred[m.max(axis=1) == 0] = "unk"
    return pa.table({
        "doc_id": t.column("doc_id"),
        "lang_pred": pa.array(pred, type=pa.string()),
        "marker_hits": pa.array(m.max(axis=1).astype(np.int64)),
    })


_FP_BASE = np.uint64(1099511628211)


def normalize_text_batch(t: pa.Table, text_col: str = "text") -> pa.Table:
    """Canonical text normalization for dedup/quality pipelines:
    lowercase, collapse every whitespace run to one space, trim the
    edges. All three steps are single pyarrow kernels (utf8_lower, one
    RE2 replace, space-trim) — no row loop — and each is expressible in
    ANSI SQL (lower / regexp_replace 'g' / trim), so the oracle is
    exact."""
    low = pc.utf8_lower(t.column(text_col))
    one = pc.replace_substring_regex(low, r"\s+", " ")
    norm = pc.utf8_trim(one, " ")
    return pa.table({
        "doc_id": t.column("doc_id"),
        "text_norm": norm,
        "n_chars_norm": pc.cast(pc.utf8_length(norm), pa.int64())})


def json_field_int(col, key: str) -> pa.Array:
    """Vectorized integer field extraction from a FLAT-JSON string column
    (`{"k": 69, ...}`) — one RE2 pass via ``pc.extract_regex``, no
    per-row json.loads. Rows without the key (or with a non-integer
    value) yield null, matching SQL ``json_extract`` semantics for the
    integer cast. Scoped to flat objects: a nested object containing the
    same key inside a sub-object would also match — the documented
    limit of the regex fast path (use a real JSON kernel off the hot
    path if the schema nests)."""
    import re as _re
    pat = rf'"{_re.escape(key)}"\s*:\s*(?P<v>-?\d+)'
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    m = pc.extract_regex(col, pat)
    return pc.cast(pc.struct_field(m, "v"), pa.int64())


def _text_chunks(t: pa.Table, text_col: str):
    from . import format as fmt
    return fmt.chunk_from_arrow(t.column(text_col))


def fingerprint_batch(t: pa.Table, text_col: str = "text") -> pa.Table:
    """Polynomial rolling-hash fingerprint of each document's bytes
    (FNV-prime base, mod 2^64) — segmented numpy reduction, no row loop."""
    lengths, payload = _text_chunks(t, text_col)
    fp = segment_poly_hash(lengths, payload)
    return pa.table({
        "doc_id": t.column("doc_id"),
        "fingerprint": pa.array(fp.astype(np.int64)),  # two's complement view
    })


def segment_poly_hash(lengths: np.ndarray, payload: np.ndarray,
                      base: np.uint64 = _FP_BASE,
                      tile: int = 1 << 21) -> np.ndarray:
    """hash(s) = sum(byte_i * base^i) mod 2^64 per segment, vectorized.
    A second decorrelated ``base`` yields an independent hash stream
    (used by rwcf.state for 128-bit composite index keys).

    Cache-tiled like :func:`rwcf.dedup.token_minhash_matrix`: the flat
    stream is processed in ``tile``-sized chunks so every temporary
    (indices, positions, terms) is L3-resident, instead of three
    stream-length 8-byte arrays — the whole-stream variant allocated
    ~24 bytes/element of DRAM traffic and collapsed ~50x under the
    host's memory-bandwidth throttle waves while the tiled minhash
    kernel kept running. A segment split across tiles combines exactly:
    hash(s1 ++ s2) = hash(s1) + base^len(s1) * hash(s2), accumulated via
    the same positional ``pows`` table (maxlen-sized, shared by tiles).
    """
    n = lengths.size
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    lengths = np.asarray(lengths, dtype=np.int64)
    maxlen = int(lengths.max()) if n else 0
    pows = np.ones(max(maxlen, 1), dtype=np.uint64)
    np.multiply.accumulate(np.full(maxlen - 1, base, dtype=np.uint64),
                           out=pows[1:]) if maxlen > 1 else None
    starts = np.cumsum(lengths) - lengths
    out = np.zeros(n, dtype=np.uint64)
    total = payload.size
    for a in range(0, total, tile):
        b = min(a + tile, total)
        # segment id of each element in the tile (tile-sized temporaries)
        idx = np.arange(a, b, dtype=np.int64)
        seg_of = np.searchsorted(starts, idx, side="right") - 1
        pos = idx - starts[seg_of]
        terms = payload[a:b].astype(np.uint64) * pows[pos]
        # contiguous runs of seg_of -> one reduceat per run
        first = np.concatenate(([True], seg_of[1:] != seg_of[:-1]))
        run_start = np.flatnonzero(first)
        segs = seg_of[run_start]
        out[segs] += np.add.reduceat(terms, run_start, dtype=np.uint64)
    return out


def window_hashes(payload: np.ndarray, L: int) -> np.ndarray:
    """Rolling L-byte window keys (LE-packed for L<=8) over a byte buffer."""
    n = payload.size
    if n < L:
        return np.empty(0, dtype=np.uint64)
    padded = np.zeros(n + 8, dtype=np.uint8)
    padded[:n] = payload
    w = np.zeros(n, dtype=np.uint64)
    for j in range(min(L, 8)):
        w |= padded[j:j + n].astype(np.uint64) << np.uint64(8 * j)
    if L < 8:
        w &= np.uint64((1 << (8 * L)) - 1)
    return w[: n - L + 1]


def chunk_docs_batch(t: pa.Table, width: int = 128, stride: int = 96,
                     text_col: str = "text",
                     id_col: str = "doc_id") -> pa.Table:
    """Split each document into fixed-width character chunks advancing by
    ``stride`` (overlap = width - stride) — the long-document splitter a
    training pipeline runs before tokenization/packing. Emits one row per
    chunk: ``(doc_id, chunk_id, chunk_text, chunk_len)``.

    Chunk k covers ``[k*stride, k*stride + width)``; a document of length
    L yields ``max(1, ceil((L - width) / stride) + 1)`` chunks, so the
    final chunk may be short but every byte is covered and an empty/short
    doc still yields exactly one chunk. The SAME arithmetic is the SQL
    oracle (generate_series + substr), so the layout is engine-checkable.

    Scale shape: stateless vectorized ``map_batches`` kernel, zero
    shuffles. The chunk texts are materialized with ONE flat-buffer
    gather (segmented arange -> np.take on the batch's concatenated
    UTF-8 payload) — no per-row Python slicing. Slicing is byte-based;
    for multi-byte UTF-8 corpora route through a codepoint index first
    (the synthetic corpus is ASCII, asserted cheap per batch via
    binary==utf8 length).
    """
    if width <= 0 or stride <= 0:
        raise ValueError("width and stride must be positive")
    lens, payload = _text_chunks(t, text_col)
    lens = lens.astype(np.int64)
    n = lens.size
    ids = t.column(id_col).combine_chunks().to_numpy(zero_copy_only=False)
    if n == 0:
        return pa.table({id_col: pa.array([], pa.int64()),
                         "chunk_id": pa.array([], pa.int64()),
                         "chunk_text": pa.array([], pa.large_string()),
                         "chunk_len": pa.array([], pa.int64())})
    # byte slicing == char slicing only for ASCII; guard, don't corrupt
    if int(lens.sum()) != int(pc.sum(pc.utf8_length(
            t.column(text_col))).as_py() or 0):
        raise ValueError("chunk_docs_batch requires ASCII text "
                         "(byte-based slicing)")
    w, s = np.int64(width), np.int64(stride)
    n_chunks = np.where(lens <= w, np.int64(1), (lens - w + s - 1) // s + 1)
    total = int(n_chunks.sum())
    row = np.repeat(np.arange(n, dtype=np.int64), n_chunks)
    first = np.cumsum(n_chunks) - n_chunks
    k = np.arange(total, dtype=np.int64) - np.repeat(first, n_chunks)
    doc_starts = np.cumsum(lens) - lens
    cstart = k * s
    clen = np.minimum(w, lens[row] - cstart)
    np.maximum(clen, 0, out=clen)  # zero-length docs -> one empty chunk
    abs_start = doc_starts[row] + cstart
    out_total = int(clen.sum())
    o_start = np.cumsum(clen) - clen
    pos = np.arange(out_total, dtype=np.int64) - np.repeat(o_start, clen)
    data = payload[np.repeat(abs_start, clen) + pos]
    offsets = np.zeros(total + 1, dtype=np.int64)
    np.cumsum(clen, out=offsets[1:])
    chunk_arr = pa.Array.from_buffers(
        pa.large_string(), total,
        [None, pa.py_buffer(offsets.tobytes()),
         pa.py_buffer(data.tobytes())])
    return pa.table({id_col: pa.array(ids[row]),
                     "chunk_id": pa.array(k),
                     "chunk_text": chunk_arr,
                     "chunk_len": pa.array(clen)})


def chunk_docs_ds(ds, width: int = 128, stride: int = 96,
                  text_col: str = "text", id_col: str = "doc_id"):
    """Dataset wrapper for :func:`chunk_docs_batch` — one streaming
    map_batches stage, no shuffle; output row count is input-length-
    proportional so downstream block sizing is unchanged."""
    import functools
    from . import rayenv
    fn = functools.partial(chunk_docs_batch, width=width, stride=stride,
                           text_col=text_col, id_col=id_col)
    return ds.map_batches(fn, batch_format="pyarrow",
                          **rayenv.remote_args())


def quality_by_group(ds, key_col: str = "lang", text_col: str = "text"):
    """Per-group quality rollup — the slice-level view of
    :func:`quality_batch` (which lang/source ships the punctuation
    soup): exact integer totals per group. Output ``(key, n_docs,
    n_words, n_punct, n_digit, n_stop)``.

    Scale shape: the per-doc counters are the same vectorized RE2
    kernels; each batch collapses to |group domain| partial rows via
    an Arrow group_by, then one domain-sized groupby — no text ever
    reshuffles."""
    from ray.data.aggregate import Sum

    from . import rayenv

    def part(t: pa.Table) -> pa.Table:
        text = t.column(text_col)
        n_words = pc.cast(pc.count_substring_regex(text, WORD_PATTERN),
                          pa.int64())
        n_punct = pc.cast(pc.count_substring_regex(text, _PUNCT),
                          pa.int64())
        n_digit = pc.cast(pc.count_substring_regex(text, _DIGIT),
                          pa.int64())
        n_stop = pc.cast(pc.count_substring_regex(
            text, r"\b(" + "|".join(_STOPWORDS) + r")\b"), pa.int64())
        g = pa.table({
            key_col: t.column(key_col),
            "n_docs": pa.array(np.ones(t.num_rows, np.int64)),
            "n_words": n_words, "n_punct": n_punct,
            "n_digit": n_digit, "n_stop": n_stop,
        }).group_by(key_col).aggregate(
            [("n_docs", "sum"), ("n_words", "sum"), ("n_punct", "sum"),
             ("n_digit", "sum"), ("n_stop", "sum")])
        return pa.table({key_col: g.column(key_col),
                         **{c: g.column(f"{c}_sum")
                            for c in ("n_docs", "n_words", "n_punct",
                                      "n_digit", "n_stop")}})

    cols = ("n_docs", "n_words", "n_punct", "n_digit", "n_stop")
    return (ds.map_batches(part, batch_format="pyarrow",
                           **rayenv.remote_args())
            .groupby(key_col)
            .aggregate(*[Sum(c, alias_name=c) for c in cols]))
