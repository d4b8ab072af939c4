"""Dictionary codec (north-rule extension; anticipated by the reference's own
roadmap — "Dictionary encoding for better string compression",
wills-columnar-format.org:196-204): distinct chunk values stored once in the
codec metadata blob, the column stored as bit-packed indices.

meta layout: ``[n_uniq:uvarint][dict payload]`` where the dict payload is the
plain codec's encoding of the unique values (varints / len-prefixed strings).
Pages are bit-packed index pages (``[width:u8][packed]``)."""

from __future__ import annotations

import math

import numpy as np

from .. import format as fmt
from .. import varint
from . import base
from .bitpack import _decode_packed_pages, _encode_packed_pages


class DictCodec(base.Codec):
    id = "dict"

    def supports(self, dtype: str) -> bool:
        return True

    def encode(self, chunk, dtype: str, page_target: int):
        if fmt.is_string(dtype):
            lengths, payload = chunk
            uniq_chunk, codes = _unique_str(lengths, payload)
            dict_payload = varint.encode_str_column(*uniq_chunk)
            n_uniq = uniq_chunk[0].size
        else:
            vals = np.asarray(chunk)
            uniq, codes = np.unique(vals, return_inverse=True)
            if dtype in ("u8", "i8"):
                dict_payload = np.ascontiguousarray(uniq).view(np.uint8)
            else:
                dict_payload = varint.encode_uvarint(base.to_unsigned_stream(uniq, dtype))
            n_uniq = uniq.size
        meta = varint.encode_uvarint(np.array([n_uniq], dtype=np.uint64)).tobytes() \
            + dict_payload.tobytes()
        code_dt = np.uint32 if n_uniq <= (1 << 32) else np.uint64
        payload_out, pages = _encode_packed_pages(codes.astype(code_dt), page_target)
        return meta, payload_out, pages

    def decode_codes(self, payload, pages, meta, dtype: str):
        """Compressed-domain accessor (the dict analogue of
        ``rle.decode_runs``): returns ``(dict_values, codes)`` WITHOUT
        expanding values per row — a predicate over the column can be
        evaluated once per DISTINCT value (dict-cardinality work) and
        then counted/gathered over the int codes. ``dict_values`` is a
        string chunk ``(lengths, payload)`` for string dtypes, else an
        ndarray. NOTE: the string dict is in first-occurrence order, the
        numeric dict is sorted (np.unique)."""
        mbuf = np.frombuffer(meta, dtype=np.uint8)
        r = fmt._Reader(mbuf)
        n_uniq = r.uvarint()
        dict_buf = mbuf[r.pos:]
        n = sum(p.encoded_values_count for p in pages)
        codes = _decode_packed_pages(payload, pages, np.int64)[:n]
        if fmt.is_string(dtype):
            return varint.decode_str_column(dict_buf, n_uniq), codes
        if dtype in ("u8", "i8"):
            return dict_buf[:n_uniq].view(fmt.DTYPES[dtype][2]), codes
        return base.from_unsigned_stream(
            varint.decode_uvarint(dict_buf, n_uniq), dtype), codes

    def decode(self, payload, pages, meta, dtype: str, n: int):
        mbuf = np.frombuffer(meta, dtype=np.uint8)
        r = fmt._Reader(mbuf)
        n_uniq = r.uvarint()
        dict_buf = mbuf[r.pos:]
        codes = _decode_packed_pages(payload, pages, np.int64)[:n]
        if fmt.is_string(dtype):
            ulens, upayload = varint.decode_str_column(dict_buf, n_uniq)
            out_lens = ulens[codes]
            src_starts = (np.cumsum(ulens) - ulens)[codes]
            from .rle import _gather_segments
            return out_lens, _gather_segments(upayload, src_starts, out_lens)
        if dtype in ("u8", "i8"):
            uniq = dict_buf[:n_uniq].view(fmt.DTYPES[dtype][2])
        else:
            uniq = base.from_unsigned_stream(varint.decode_uvarint(dict_buf, n_uniq), dtype)
        return uniq[codes]

    def estimate_size(self, sample, dtype: str, n_total: int,
                      payload_total: int) -> float:
        if fmt.is_string(dtype):
            lengths, payload = sample
            n_s = lengths.size
            if n_s == 0:
                return 11.0
            uniq_chunk, _ = _unique_str(lengths, payload)
            n_uniq = uniq_chunk[0].size
            dict_bytes = float(uniq_chunk[0].sum()) + n_uniq
        else:
            vals = np.asarray(sample)
            n_s = vals.size
            if n_s == 0:
                return 11.0
            uniq = np.unique(vals)
            n_uniq = uniq.size
            dict_bytes = float(varint.uvarint_width(
                base.to_unsigned_stream(uniq, dtype)).sum())
        if n_uniq > 0.5 * n_s:
            return math.inf  # high cardinality in sample: dict is a bad bet
        w = max(1, base.bit_width(max(n_uniq - 1, 0)))
        return w / 8.0 * n_total + dict_bytes


def _unique_str(lengths: np.ndarray, payload: np.ndarray):
    """Unique values of a string chunk via pyarrow dictionary_encode —
    FIRST-OCCURRENCE order, not sorted (the numeric path's np.unique IS
    sorted); returns ((uniq_lengths, uniq_payload), codes:int64)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    arr = fmt.chunk_to_arrow((lengths, payload), "str")
    denc = pc.dictionary_encode(arr)
    if isinstance(denc, pa.ChunkedArray):
        denc = denc.combine_chunks()
    codes = np.asarray(denc.indices, dtype=np.int64)
    uniq_arr = denc.dictionary
    ulens, upayload = fmt.chunk_from_arrow(uniq_arr)
    return (ulens, upayload), codes
