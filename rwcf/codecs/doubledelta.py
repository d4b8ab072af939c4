"""Double-delta codec (lightweight-codec family extension): per page,
store the first value and the first delta as varint headers and bit-pack
zigzag-encoded SECOND-order differences. Beats delta on regular-cadence
sequences (timestamps on a tick, evenly spaced ids, linear counters)
where consecutive deltas are nearly constant, so dd ~ 0 and the packed
width collapses toward 1 bit — the Gorilla/time-series trick in the
fixed-width-page style of this stack.

All arithmetic is modulo 2**64 on the unsigned view (same exactness
contract as :mod:`rwcf.codecs.delta`), so reconstruction — two modular
prefix sums with the page header substituted into slots 0 and 1 — is
bit-exact for every supported dtype. Page layout:
``[base:svarint(int64 view)][d1:svarint(int64 view)][width:u8]
[packed zigzag dd]`` with dd_0 = dd_1 = 0 fixed.
"""

from __future__ import annotations

import math

import numpy as np

from .. import format as fmt
from .. import varint
from . import base as cbase
from .bitpack import _UNSIGNED, _plan_values_per_page
from .delta import _unzigzag64, _zigzag64


def _second_diff(u: np.ndarray) -> np.ndarray:
    """Modular second-order differences with dd[0] = dd[1] = 0."""
    dd = np.zeros(u.size, dtype=np.uint64)
    if u.size > 2:
        d = u[1:] - u[:-1]
        dd[2:] = d[1:] - d[:-1]
    return dd


class DoubleDeltaCodec(cbase.Codec):
    id = "dd"

    def supports(self, dtype: str) -> bool:
        return not fmt.is_string(dtype)

    def encode(self, chunk, dtype: str, page_target: int):
        np_t = fmt.DTYPES[dtype][2]
        u = np.ascontiguousarray(chunk, dtype=np_t).view(_UNSIGNED[dtype]) \
            .astype(np.uint64)
        n = u.size
        gw = cbase.bit_width(int(_zigzag64(_second_diff(u)).max())) \
            if n else 0
        vpp = _plan_values_per_page(gw, page_target)
        chunks = []
        byte_lengths = []
        for s in range(0, max(n, 1), vpp):
            pv = u[s:s + vpp]
            if pv.size == 0:
                break
            pz = _zigzag64(_second_diff(pv))
            w = cbase.bit_width(int(pz.max()))
            base_store = int(np.uint64(pv[0]).view(np.int64))
            d1 = int((pv[1:2] - pv[0:1]).view(np.int64)[0]) \
                if pv.size > 1 else 0
            header = varint.encode_svarint(
                np.array([base_store, d1], dtype=np.int64))
            body = cbase.pack_bits(pz, w)
            chunks.append(np.concatenate((header, [np.uint8(w)], body)))
            byte_lengths.append(header.size + 1 + body.size)
        payload = np.concatenate(chunks) if chunks \
            else np.empty(0, dtype=np.uint8)
        pages = cbase.fixed_count_pages(n, vpp, byte_lengths)
        return b"", payload, pages

    def decode(self, payload, pages, meta, dtype: str, n: int):
        np_t = fmt.DTYPES[dtype][2]
        outs = []
        bufp = varint._padded(payload)
        for p in pages:
            s = p.file_offset
            hw1 = int(varint._width_at(payload[s:s + 1])[0])
            raw = varint._value_at(bufp, np.array([s, s + hw1],
                                                  dtype=np.int64))
            base_v = (int(raw[0]) >> 1) ^ -(int(raw[0]) & 1)
            d1_v = (int(raw[1]) >> 1) ^ -(int(raw[1]) & 1)
            hw2 = int(varint._width_at(payload[s + hw1:s + hw1 + 1])[0])
            hoff = s + hw1 + hw2
            w = int(payload[hoff])
            body = payload[hoff + 1: s + p.byte_length]
            zz = cbase.unpack_bits(body, w, p.values_count, np.uint64)
            dd = _unzigzag64(zz)
            mask = np.uint64((1 << 64) - 1)
            if dd.size:
                dd[0] = np.uint64(0)
            if dd.size > 1:
                dd[1] = np.uint64(d1_v & ((1 << 64) - 1))
            d = np.cumsum(dd, dtype=np.uint64)  # modular: d[0]=0, d[1]=d1
            if d.size:
                d[0] = np.uint64(base_v & int(mask))
            outs.append(np.cumsum(d, dtype=np.uint64))
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
        if vals.size < 3:
            return 12.0
        np_t = fmt.DTYPES[dtype][2]
        u = np.ascontiguousarray(vals, dtype=np_t).view(_UNSIGNED[dtype]) \
            .astype(np.uint64)
        zz = _zigzag64(_second_diff(u))[2:]
        # the selector samples concatenated disjoint slices; each slice
        # boundary corrupts TWO second-order diffs — trim a few maxima so a
        # regular-cadence column estimates its true (near-zero) width
        if zz.size > 16:
            zz = np.partition(zz, zz.size - 8)[:-8]
        w = max(1, cbase.bit_width(int(zz.max()))) if zz.size else 1
        return w / 8.0 * n_total + 12
