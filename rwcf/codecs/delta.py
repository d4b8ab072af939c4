"""Delta codec (lightweight-codec family completion): per page, store the
first value as a base and bit-pack zigzag-encoded consecutive differences.
Beats frame-of-reference on monotone or slowly-drifting sequences (sorted
ids, cumulative counters, timestamps) where |v_i - v_{i-1}| << (max - min).

Differences are taken modulo 2**64 and viewed as two's-complement int64, so
reconstruction (base + cumulative modular sum) is exact for every dtype
including full-range u64/i64. Page layout:
``[base:svarint(int64 view)][width:u8][packed zigzag deltas]`` with delta_0
fixed to 0."""

from __future__ import annotations

import math

import numpy as np

from .. import format as fmt
from .. import varint
from . import base as cbase
from .bitpack import _UNSIGNED, _plan_values_per_page


def _zigzag64(d: np.ndarray) -> np.ndarray:
    v = d.view(np.int64)
    return ((v << 1) ^ (v >> 63)).view(np.uint64)


def _unzigzag64(u: np.ndarray) -> np.ndarray:
    return (((u >> np.uint64(1)).view(np.int64))
            ^ -((u & np.uint64(1)).view(np.int64))).view(np.uint64)


class DeltaCodec(cbase.Codec):
    id = "delta"

    def supports(self, dtype: str) -> bool:
        return not fmt.is_string(dtype)

    def encode(self, chunk, dtype: str, page_target: int):
        np_t = fmt.DTYPES[dtype][2]
        u = np.ascontiguousarray(chunk, dtype=np_t).view(_UNSIGNED[dtype]) \
            .astype(np.uint64)
        n = u.size
        if n:
            d = np.empty(n, dtype=np.uint64)
            d[0] = 0
            d[1:] = u[1:] - u[:-1]  # modular difference, shared by all pages
            gw = cbase.bit_width(int(_zigzag64(d).max()))
        else:
            d = np.empty(0, dtype=np.uint64)
            gw = 0
        vpp = _plan_values_per_page(gw, page_target)
        chunks = []
        byte_lengths = []
        for s in range(0, max(n, 1), vpp):
            pv = u[s:s + vpp]
            if pv.size == 0:
                break
            pd = d[s:s + pv.size].copy()
            pd[0] = 0  # page base replaces the cross-page delta
            pz = _zigzag64(pd)
            w = cbase.bit_width(int(pz.max()))
            base_store = int(np.uint64(pv[0]).view(np.int64))
            header = varint.encode_svarint(np.array([base_store],
                                                    dtype=np.int64))
            body = cbase.pack_bits(pz, w)
            chunks.append(np.concatenate((header, [np.uint8(w)], body)))
            byte_lengths.append(header.size + 1 + body.size)
        payload = np.concatenate(chunks) if chunks else np.empty(0, dtype=np.uint8)
        pages = cbase.fixed_count_pages(n, vpp, byte_lengths)
        return b"", payload, pages

    def decode(self, payload, pages, meta, dtype: str, n: int):
        np_t = fmt.DTYPES[dtype][2]
        outs = []
        bufp = varint._padded(payload)
        for p in pages:
            s = p.file_offset
            base_u = int(varint._value_at(bufp, np.array([s], dtype=np.int64))[0])
            base_v = (base_u >> 1) ^ -(base_u & 1)  # unzigzag -> int64 view
            hw = int(varint._width_at(payload[s:s + 1])[0])
            w = int(payload[s + hw])
            body = payload[s + hw + 1: s + p.byte_length]
            zz = cbase.unpack_bits(body, w, p.values_count, np.uint64)
            d = _unzigzag64(zz)
            d[0] = np.uint64(base_v & ((1 << 64) - 1))
            u = np.cumsum(d, dtype=np.uint64)  # modular prefix sum
            outs.append(u)
        if not outs:
            return np.empty(0, dtype=np_t)
        u = np.concatenate(outs)[:n]
        ut = _UNSIGNED[dtype]
        return u.astype(ut, copy=False).view(np_t)

    def estimate_size(self, sample, dtype: str, n_total: int,
                      payload_total: int) -> float:
        if fmt.is_string(dtype):
            return math.inf
        vals = np.asarray(sample)
        if vals.size < 2:
            return 11.0
        np_t = fmt.DTYPES[dtype][2]
        u = np.ascontiguousarray(vals, dtype=np_t).view(_UNSIGNED[dtype]) \
            .astype(np.uint64)
        d = u[1:] - u[:-1]
        zz = _zigzag64(d)
        # the selector samples CONCATENATED disjoint slices, whose boundary
        # jumps are artifacts — drop the few largest deltas so a monotone
        # column's width estimate reflects its true step size
        if zz.size > 8:
            zz = np.partition(zz, zz.size - 4)[:-4]
        # floor at 1 bit: an all-zero trimmed sample must not estimate a
        # free ride (constant runs belong to RLE, which estimates honestly)
        w = max(1, cbase.bit_width(int(zz.max()))) if zz.size else 1
        return w / 8.0 * n_total + 10
