"""Dict->RLE cascade codec (lightweight-codec composition): dictionary-
encode the chunk, then run-length-encode the CODE stream. Wins where
neither parent wins alone — low-cardinality values arriving in long
clustered runs (a ``lang`` or ``source`` column after a sort or a
groupby-keyed write): dict removes the value width, RLE removes the
repetition, and the payload collapses to runs-many small tuples.

meta layout: ``[n_uniq:uvarint][dict payload]`` (identical to the dict
codec, so the dictionary is decoded by the same reader); pages are the
RLE codec's code-stream pages verbatim — the cascade holds no page
state of its own. Decode expands the RLE code stream and gathers
through the dictionary.
"""

from __future__ import annotations

import math

import numpy as np

from .. import format as fmt
from .. import oracle, varint
from . import base
from .dictionary import _unique_str
from .rle import RleCodec


class CascadeCodec(base.Codec):
    id = "dictrle"

    def supports(self, dtype: str) -> bool:
        return True

    def _split(self, chunk, dtype: str):
        """Returns (uniq_store, codes:int64, n_uniq, dict_payload_bytes)."""
        if fmt.is_string(dtype):
            uniq_chunk, codes = _unique_str(*chunk)
            dict_payload = varint.encode_str_column(*uniq_chunk)
            return uniq_chunk, codes.astype(np.int64), \
                uniq_chunk[0].size, dict_payload
        vals = np.asarray(chunk)
        uniq, codes = np.unique(vals, return_inverse=True)
        dict_payload = varint.encode_uvarint(
            base.to_unsigned_stream(uniq, dtype))
        return uniq, codes.astype(np.int64), uniq.size, dict_payload

    def encode(self, chunk, dtype: str, page_target: int):
        _, codes, n_uniq, dict_payload = self._split(chunk, dtype)
        meta = varint.encode_uvarint(
            np.array([n_uniq], dtype=np.uint64)).tobytes() \
            + dict_payload.tobytes()
        _, payload, pages = RleCodec().encode(
            codes.astype(np.uint64), "u64", page_target)
        return meta, payload, pages

    def decode(self, payload, pages, meta, dtype: str, n: int):
        mbuf = np.frombuffer(meta, dtype=np.uint8)
        r = fmt._Reader(mbuf)
        n_uniq = r.uvarint()
        dict_buf = mbuf[r.pos:]
        codes = RleCodec().decode(payload, pages, b"", "u64", n) \
            .astype(np.int64)
        if fmt.is_string(dtype):
            ulens, upayload = varint.decode_str_column(dict_buf, n_uniq)
            out_lens = ulens[codes]
            src_starts = (np.cumsum(ulens) - ulens)[codes]
            from .rle import _gather_segments
            return out_lens, _gather_segments(upayload, src_starts,
                                              out_lens)
        uniq = base.from_unsigned_stream(
            varint.decode_uvarint(dict_buf, n_uniq), dtype)
        return uniq[codes]

    def estimate_size(self, sample, dtype: str, n_total: int,
                      payload_total: int) -> float:
        if fmt.is_string(dtype):
            lengths, payload = sample
            n_s = lengths.size
            if n_s == 0:
                return 12.0
            uniq_chunk, codes = _unique_str(lengths, payload)
            n_uniq = uniq_chunk[0].size
            dict_bytes = float(uniq_chunk[0].sum()) + n_uniq
        else:
            vals = np.asarray(sample)
            n_s = vals.size
            if n_s == 0:
                return 12.0
            uniq, codes = np.unique(vals, return_inverse=True)
            n_uniq = uniq.size
            dict_bytes = float(varint.uvarint_width(
                base.to_unsigned_stream(uniq, dtype)).sum())
        if n_uniq > 0.5 * n_s:
            return math.inf  # high cardinality: no dict is a good dict
        starts, lens = oracle.run_lengths(codes.astype(np.int64))
        if starts.size > 0.5 * n_s:
            return math.inf  # unclustered: plain dict already covers this
        # per surviving run: one code varint + one run-length varint; the
        # selector's concatenated-slice sampling only SPLITS runs, so this
        # over-counts runs slightly — a conservative (never-underselling)
        # estimate
        u = codes[starts].astype(np.uint64) if starts.size \
            else np.empty(0, np.uint64)
        run_bytes = float(varint.uvarint_width(u).sum()
                          + varint.uvarint_width(
                              lens.astype(np.uint64)).sum())
        return run_bytes * (n_total / max(n_s, 1)) + dict_bytes + 12
