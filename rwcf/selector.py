"""Sampling-based per-chunk codec auto-selector (north-rule component).

Generalizes the reference's guidance that "the most surefire way to
determine if RLE has benefits is to test it in practice"
(wills-columnar-format.org:958-963): sample the chunk, ask every applicable
codec for an estimated total encoded size, pick the minimum. Plain is always
applicable, so selection never fails. Samples are *contiguous slices* (not
strided rows) so run structure survives into the RLE estimate.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np

from . import format as fmt
from .codecs import REGISTRY

_SAMPLE_SLICES = 4
_SAMPLE_VALUES = 4096  # total sampled values across slices


@dataclass
class Choice:
    codec: str
    estimate: int
    estimates: dict[str, float]


def _sample_slices(n: int, total_sample: int = _SAMPLE_VALUES,
                   k: int = _SAMPLE_SLICES) -> list[tuple[int, int]]:
    if n <= total_sample:
        return [(0, n)]
    per = total_sample // k
    # deterministic, evenly spread slice starts
    step = (n - per) // (k - 1)
    return [(i * step, i * step + per) for i in range(k)]


def sample_chunk(chunk, dtype: str):
    if fmt.is_string(dtype):
        lengths, payload = chunk
        n = lengths.size
        spans = _sample_slices(n)
        if len(spans) == 1:
            return chunk
        starts = np.cumsum(lengths) - lengths
        ls, ps = [], []
        for a, b in spans:
            ls.append(lengths[a:b])
            lo = int(starts[a])
            hi = int(starts[b - 1] + lengths[b - 1]) if b > a else lo
            ps.append(payload[lo:hi])
        return np.concatenate(ls), np.concatenate(ps)
    vals = np.asarray(chunk)
    spans = _sample_slices(vals.size)
    if len(spans) == 1:
        return vals
    return np.concatenate([vals[a:b] for a, b in spans])


def choose_codec(chunk, dtype: str,
                 candidates: list[str] | None = None) -> Choice:
    n_total = fmt.chunk_len(chunk, dtype)
    payload_total = int(chunk[1].size) if fmt.is_string(dtype) else 0
    sample = sample_chunk(chunk, dtype)
    estimates: dict[str, float] = {}
    for cid in (candidates or list(REGISTRY)):
        codec = REGISTRY[cid]
        if not codec.supports(dtype):
            continue
        try:
            estimates[cid] = codec.estimate_size(sample, dtype, n_total, payload_total)
        except Exception:
            estimates[cid] = math.inf
    best = min(estimates, key=lambda c: (estimates[c], c))
    return Choice(codec=best, estimate=int(estimates[best])
                  if math.isfinite(estimates[best]) else -1,
                  estimates=estimates)


def encode_auto(chunk, dtype: str, page_target: int = fmt.ENGINE_PAGE_SIZE,
                candidates: list[str] | None = None):
    """Select + encode; returns (EncodedColumn, Choice)."""
    choice = choose_codec(chunk, dtype, candidates)
    enc = fmt.encode_chunk(chunk, dtype, choice.codec, page_target)
    return enc, choice
