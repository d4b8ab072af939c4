"""Compressed-domain bitmap-index algebra over RLE runs — the classic
columnar-store trick: a low-cardinality column's RLE encoding IS a bitmap
index (each run of value v is an interval of the row space), so conjunctive
/ disjunctive predicate COUNTs reduce to interval-set intersections computed
directly on the run tuples, never expanding a single value.

This extends the reference's compressed-domain aggregation idea (operating
on ``rle::Values`` (value, run_length) tuples without decompression —
src/test_rle.rs:8-17) from SUM/GROUP BY to boolean predicate algebra:
``count(a AND b)`` is the total overlap length of two interval sets over
the same row ordering, computed per batch with a vectorized
prefix-coverage merge (searchsorted on run boundaries), then globally
summed.  Per-batch partials are 5 ints, so the "shuffle" is a scalar
aggregate — nothing but counters leaves the workers.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from . import format as fmt
from . import rayenv
from .codecs import REGISTRY


def _match_intervals(runs_vals, run_lens: np.ndarray, value, dtype: str):
    """[start, end) row intervals of the runs equal to ``value``."""
    ends = np.cumsum(run_lens.astype(np.int64))
    starts = ends - run_lens
    if fmt.is_string(dtype):
        import pyarrow.compute as pc
        arr = fmt.chunk_to_arrow(runs_vals, dtype).cast(pa.string())
        mask = pc.equal(arr, value).to_numpy(zero_copy_only=False)
    else:
        mask = np.asarray(runs_vals) == value
    return starts[mask], ends[mask]


def interval_overlap(sa: np.ndarray, ea: np.ndarray,
                     sb: np.ndarray, eb: np.ndarray) -> int:
    """Total overlap length of two sorted disjoint interval sets, via the
    prefix-coverage function of B evaluated at A's endpoints — O((|A|+|B|)
    log |B|) and fully vectorized (no sweep loop)."""
    if not sa.size or not sb.size:
        return 0
    cum = np.concatenate(([0], np.cumsum(eb - sb)))

    def cover(x: np.ndarray) -> np.ndarray:
        idx = np.searchsorted(sb, x, side="right")
        c = cum[idx]
        last = np.maximum(idx - 1, 0)
        trailing = np.where((idx > 0) & (eb[last] > x),
                            eb[last] - np.maximum(x, sb[last]), 0)
        return c - trailing

    return int((cover(ea) - cover(sa)).sum())


def _rle_runs(t: pa.Table, col: str, dtype: str):
    chunk = fmt.chunk_from_arrow(t.column(col).combine_chunks())
    enc = fmt.encode_chunk(chunk, dtype, "rle")
    return REGISTRY["rle"].decode_runs(enc.payload, enc.pages, enc.meta,
                                       dtype)


def bitmap_predicate_counts(ds, col_a: str = "lang", val_a: str = "en",
                            col_b: str = "source", val_b: str = "src1",
                            dtype_a: str = "str", dtype_b: str = "str"):
    """One-row table ``(n_rows, n_a, n_b, n_and, n_or)``: predicate counts
    for ``col_a == val_a`` / ``col_b == val_b`` computed entirely in the
    compressed domain from each batch's RLE runs (both columns encode over
    the SAME in-batch row order, so their interval sets share a row space
    and AND = interval intersection; OR falls out by inclusion-exclusion).
    """
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        va, la = _rle_runs(t, col_a, dtype_a)
        vb, lb = _rle_runs(t, col_b, dtype_b)
        sa, ea = _match_intervals(va, la, val_a, dtype_a)
        sb, eb = _match_intervals(vb, lb, val_b, dtype_b)
        n_a = int((ea - sa).sum())
        n_b = int((eb - sb).sum())
        n_and = interval_overlap(sa, ea, sb, eb)
        return pa.table({"n_rows": pa.array([t.num_rows], pa.int64()),
                         "n_a": pa.array([n_a], pa.int64()),
                         "n_b": pa.array([n_b], pa.int64()),
                         "n_and": pa.array([n_and], pa.int64())})

    agg = (ds.map_batches(partial, batch_format="pyarrow",
                          **rayenv.remote_args())
           .aggregate(Sum("n_rows", alias_name="n_rows"),
                      Sum("n_a", alias_name="n_a"),
                      Sum("n_b", alias_name="n_b"),
                      Sum("n_and", alias_name="n_and")))
    import pandas as pd
    n_a, n_b, n_and = int(agg["n_a"]), int(agg["n_b"]), int(agg["n_and"])
    return pd.DataFrame([{"n_rows": int(agg["n_rows"]), "n_a": n_a,
                          "n_b": n_b, "n_and": n_and,
                          "n_or": n_a + n_b - n_and}])


def compressed_range_count(ds, col: str = "source", lo: str = "src2",
                           hi: str = "src5"):
    """``count(lo <= col <= hi)`` evaluated in the dictionary's compressed
    domain: per batch the column dict-encodes once, the range predicate is
    evaluated ONCE PER DISTINCT VALUE on the (tiny) dictionary, and the
    count is a vectorized gather over the int codes
    (``mask[codes].sum()``) — per-row string comparisons never happen
    (``DictCodec.decode_codes``, the dict analogue of the reference's RLE
    run-tuple aggregation, src/test_rle.rs:8-17).  Partials are one int
    per batch; the aggregate is scalar."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        chunk = fmt.chunk_from_arrow(t.column(col).combine_chunks())
        enc = fmt.encode_chunk(chunk, "str", "dict")
        (ulens, upay), codes = REGISTRY["dict"].decode_codes(
            enc.payload, enc.pages, enc.meta, "str")
        vals = fmt.chunk_to_arrow((ulens, upay), "str").cast(pa.string()) \
            .to_pylist()
        mask = np.array([lo <= v <= hi for v in vals], dtype=bool)
        n = int(mask[codes].sum()) if codes.size else 0
        return pa.table({"n_in_range": pa.array([n], pa.int64())})

    agg = (ds.map_batches(partial, batch_format="pyarrow",
                          **rayenv.remote_args())
           .aggregate(Sum("n_in_range", alias_name="n_in_range")))
    import pandas as pd
    return pd.DataFrame([{"n_in_range": int(agg["n_in_range"])}])
