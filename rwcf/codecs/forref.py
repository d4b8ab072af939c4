"""Frame-of-reference codec (north-rule extension): per page, subtract the
page minimum and bit-pack the non-negative deltas. Page layout:
``[min:svarint][width:u8][packed deltas]``. Wins over raw bit-packing when
values are large but clustered (timestamps, monotone ids)."""

from __future__ import annotations

import math

import numpy as np

from .. import format as fmt
from .. import varint
from . import base
from .bitpack import _plan_values_per_page


class ForCodec(base.Codec):
    id = "for"

    def supports(self, dtype: str) -> bool:
        return not fmt.is_string(dtype)

    def encode(self, chunk, dtype: str, page_target: int):
        vals = np.asarray(chunk)
        # work in int64 for signed, uint64 for unsigned; deltas are uint64
        signed = fmt.is_signed(dtype)
        work = vals.astype(np.int64 if signed else np.uint64, copy=False)
        n = work.size
        if n:
            span = int(work.max()) - int(work.min())
            gw = base.bit_width(span)
        else:
            gw = 0
        vpp = _plan_values_per_page(gw, page_target)
        chunks = []
        byte_lengths = []
        for s in range(0, max(n, 1), vpp):
            pv = work[s:s + vpp]
            if pv.size == 0:
                break
            mn = int(pv.min())
            deltas = (pv.astype(np.int64) - mn).view(np.uint64) if signed \
                else pv - np.uint64(mn)
            w = base.bit_width(int(deltas.max()))
            header = varint.encode_svarint(np.array([mn], dtype=np.int64))
            body = base.pack_bits(deltas, w)
            chunks.append(np.concatenate((header, [np.uint8(w)], body)))
            byte_lengths.append(header.size + 1 + body.size)
        payload = np.concatenate(chunks) if chunks else np.empty(0, dtype=np.uint8)
        pages = base.fixed_count_pages(n, vpp, byte_lengths)
        return b"", payload, pages

    def decode(self, payload, pages, meta, dtype: str, n: int):
        signed = fmt.is_signed(dtype)
        outs = []
        bufp = varint._padded(payload)
        for p in pages:
            s = p.file_offset
            mn = int(varint._value_at(bufp, np.array([s], dtype=np.int64))[0])
            mn = (mn >> 1) ^ -(mn & 1)  # unzigzag
            hw = int(varint._width_at(payload[s:s + 1])[0])
            w = int(payload[s + hw])
            body = payload[s + hw + 1: s + p.byte_length]
            deltas = base.unpack_bits(body, w, p.values_count)
            if signed:
                outs.append(deltas.view(np.int64) + mn)
            else:
                outs.append(deltas + np.uint64(mn))
        if not outs:
            return np.empty(0, dtype=fmt.DTYPES[dtype][2])
        return np.concatenate(outs)[:n].astype(fmt.DTYPES[dtype][2], copy=False)

    def estimate_size(self, sample, dtype: str, n_total: int,
                      payload_total: int) -> float:
        if fmt.is_string(dtype):
            return math.inf
        vals = np.asarray(sample)
        if vals.size == 0:
            return 11.0
        work = vals.astype(np.int64 if fmt.is_signed(dtype) else np.uint64, copy=False)
        span = int(work.max()) - int(work.min())
        w = base.bit_width(span)
        return w / 8.0 * n_total + 10
