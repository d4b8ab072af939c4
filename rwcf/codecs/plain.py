"""Plain codec: byte-exact reimplementation of the reference's no-RLE value
encoding (bincode-standard varints, src/encode.rs:84-89; sizes pinned by
src/test_bincode.rs:14-53). The fallback codec — applicable to everything,
so the selector is never left without a choice."""

from __future__ import annotations

import numpy as np

from .. import format as fmt
from .. import varint
from . import base


class PlainCodec(base.Codec):
    id = "plain"

    def supports(self, dtype: str) -> bool:
        return True

    def encode(self, chunk, dtype: str, page_target: int):
        if fmt.is_string(dtype):
            lengths, payload = chunk
            widths = varint.uvarint_width(lengths.astype(np.uint64)) + lengths
            out = varint.encode_str_column(lengths, payload)
        elif dtype in ("u8", "i8"):
            vals = np.ascontiguousarray(chunk)
            out = vals.view(np.uint8).copy()
            widths = np.ones(vals.size, dtype=np.int64)
        else:
            u = base.to_unsigned_stream(np.asarray(chunk), dtype)
            widths = varint.uvarint_width(u)
            out = varint.encode_uvarint(u)
        pages = base.paginate_widths(widths, np.ones(widths.size, dtype=np.int64),
                                     page_target)
        return b"", out, pages

    def decode(self, payload, pages, meta, dtype: str, n: int):
        if fmt.is_string(dtype):
            return varint.decode_str_column(payload, n)
        if dtype in ("u8", "i8"):
            return payload[:n].view(fmt.DTYPES[dtype][2]).copy()
        u = varint.decode_uvarint(payload, n)
        return base.from_unsigned_stream(u, dtype)

    def estimate_size(self, sample, dtype: str, n_total: int,
                      payload_total: int) -> float:
        if fmt.is_string(dtype):
            lengths, _ = sample
            if lengths.size == 0:
                return 11.0
            hw = varint.uvarint_width(lengths.astype(np.uint64))
            return float(hw.mean()) * n_total + payload_total
        vals = np.asarray(sample)
        if vals.size == 0:
            return 11.0
        if dtype in ("u8", "i8"):
            return float(n_total)
        w = varint.uvarint_width(base.to_unsigned_stream(vals, dtype))
        return float(w.mean()) * n_total
