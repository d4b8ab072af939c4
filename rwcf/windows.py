"""Windowed aggregates over event streams (custom-operator family).

Ray Data has no event-time windowing; per the composition rule these are
built from what it does have: tumbling windows are a pure per-batch
projection (window id = ts // size) followed by a partial-then-final
aggregation (the only shuffle carries (key, window, partials) rows, never
events); sliding (hopping) windows explode each event into its ~width/hop
member windows inside the batch and reuse the same partial-then-final
shape; session windows sort each key's group once inside ``map_groups``.
Ordering assumption: windows are keyed, so no global order is required —
each group sorts its own events.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from . import rayenv

_UNIT_FACTOR = {"s": 1, "ms": 1_000, "us": 1_000_000, "ns": 1_000_000_000}


def _epoch_seconds_floor(ts: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Epoch seconds with explicit FLOOR semantics (matching SQL
    floor(epoch(ts))): read the int64 ticks at the column's native unit and
    floor-divide. A cast to timestamp[s] would truncate toward zero, which
    differs by one for pre-1970 timestamps with sub-second precision.
    Plain integer columns are accepted as epoch seconds (unit factor 1) —
    a pre-round-3 regression raised AttributeError on them."""
    unit = getattr(ts.type, "unit", None)
    ticks = pc.cast(ts, pa.int64()).to_numpy(zero_copy_only=False)
    if unit is None:
        return ticks
    return ticks // np.int64(_UNIT_FACTOR[unit])  # numpy //: floor toward -inf


def _epoch_micros(ts: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Epoch MICROSECOND ticks regardless of the column's native unit
    (s/ms/us upscale exactly; ns floor-divides; plain ints are epoch
    seconds) — funnel windows must not silently shrink 1000x when a
    source ships timestamp[ns] instead of [us]."""
    unit = getattr(ts.type, "unit", None) or "s"
    ticks = pc.cast(ts, pa.int64()).to_numpy(zero_copy_only=False)
    f = _UNIT_FACTOR[unit]
    if f <= 1_000_000:
        return ticks * np.int64(1_000_000 // f)
    return ticks // np.int64(f // 1_000_000)


def tumbling_window_aggregate(ds, window_s: int = 3600,
                              key: str = "user_id", ts_col: str = "ts",
                              val_col: str = "value"):
    """Per (key, window) count + exact integer-scaled sum. The float sum is
    fixed-point-scaled (floor(v*1000)) before summation so the result is
    order-independent and byte-comparable to a SQL oracle."""

    def partial(t: pa.Table) -> pa.Table:
        epoch = _epoch_seconds_floor(t.column(ts_col).combine_chunks())
        win = epoch // np.int64(window_s)  # floor toward -inf, like SQL floor
        vals = np.asarray(t.column(val_col).combine_chunks()
                          .to_numpy(zero_copy_only=False), dtype=np.float64)
        # NULL adds 0, row still counts (the shared window NULL rule;
        # unmasked floor(NaN) would become INT64_MIN and corrupt the sum)
        scaled = np.where(np.isnan(vals), np.int64(0),
                          np.floor(vals * 1000)).astype(np.int64)
        g = pa.table({
            key: t.column(key),
            "win": pa.array(win, type=pa.int64()),
            "n": pa.array(np.ones(t.num_rows, dtype=np.int64)),
            "v1000": pa.array(scaled),
        }).group_by([key, "win"]).aggregate([("n", "sum"), ("v1000", "sum")])
        # map aggregate output by NAME (column order differs across pyarrow
        # versions)
        return pa.table({key: g.column(key), "win": g.column("win"),
                         "n": g.column("n_sum"),
                         "v1000": g.column("v1000_sum")})

    from ray.data.aggregate import Sum
    return (ds.map_batches(partial, batch_format="pyarrow",
                           **rayenv.remote_args())
            .groupby([key, "win"])
            .aggregate(Sum("n", alias_name="n"),
                       Sum("v1000", alias_name="v1000")))


def sliding_window_aggregate(ds, window_s: int = 3600, hop_s: int = 900,
                             key: str = "user_id", ts_col: str = "ts",
                             val_col: str = "value"):
    """Sliding (hopping) windows of width ``window_s`` advancing by
    ``hop_s``: per (key, window start) count + exact integer-scaled sum.
    Each event explodes into its ~window/hop member windows INSIDE the
    batch (vectorized segmented arange), is pre-aggregated per batch, and
    only (key, win_start, partials) rows reach the one global shuffle —
    same partial-then-final shape as tumbling, with the replication factor
    paid before aggregation so the exchange stays event-count-independent.
    Window membership: starts k*hop with k in [floor((e-w)/hop)+1,
    floor(e/hop)] for integer epoch second e (floor toward -inf, matching
    the SQL oracle's generate_series expansion)."""
    if hop_s <= 0 or window_s <= 0:
        raise ValueError("window_s and hop_s must be positive")

    def partial(t: pa.Table) -> pa.Table:
        epoch = _epoch_seconds_floor(t.column(ts_col).combine_chunks())
        k_hi = epoch // np.int64(hop_s)
        k_lo = (epoch - np.int64(window_s)) // np.int64(hop_s) + 1
        cnt = (k_hi - k_lo + 1).astype(np.int64)
        tot = int(cnt.sum())
        out_starts = np.cumsum(cnt) - cnt
        pos = np.arange(tot, dtype=np.int64) - np.repeat(out_starts, cnt)
        win = (np.repeat(k_lo, cnt) + pos) * np.int64(hop_s)
        vals = np.asarray(t.column(val_col).combine_chunks()
                          .to_numpy(zero_copy_only=False), dtype=np.float64)
        scaled = np.where(np.isnan(vals), np.int64(0),
                          np.floor(vals * 1000)).astype(np.int64)
        kv = t.column(key).combine_chunks()
        g = pa.table({
            key: kv.take(pa.array(np.repeat(np.arange(t.num_rows), cnt))),
            "win_start": pa.array(win),
            "n": pa.array(np.ones(tot, dtype=np.int64)),
            "v1000": pa.array(np.repeat(scaled, cnt)),
        }).group_by([key, "win_start"]).aggregate([("n", "sum"),
                                                   ("v1000", "sum")])
        return pa.table({key: g.column(key),
                         "win_start": g.column("win_start"),
                         "n": g.column("n_sum"),
                         "v1000": g.column("v1000_sum")})

    from ray.data.aggregate import Sum
    return (ds.map_batches(partial, batch_format="pyarrow",
                           **rayenv.remote_args())
            .groupby([key, "win_start"])
            .aggregate(Sum("n", alias_name="n"),
                       Sum("v1000", alias_name="v1000")))


def session_windows(ds, gap_s: int = 1800, key: str = "user_id",
                    ts_col: str = "ts", buckets: int = 32):
    """Session windows: per key, sort by ts and split where the gap exceeds
    ``gap_s``. One BUCKETED shuffle (``hash(key) % buckets`` — Ray invokes
    the group UDF per group, so millions of per-key groups would be
    dispatch-bound); inside each bucket a single sort by (key, ts) and one
    vectorized boundary pass resolve every key's sessions at once."""

    def add_bucket(t: pa.Table) -> pa.Table:
        from .joins import hash_bucket
        kv = t.column(key).combine_chunks().to_numpy(zero_copy_only=False)
        return t.append_column("_b",
                               pa.array(hash_bucket(kv, buckets=buckets)))

    def sessions(g: pa.Table) -> pa.Table:
        # Arrow-native: one sort by (key, ts), unit-safe floor to epoch
        # seconds, then a single vectorized boundary pass — session rows
        # fall out of the boundary indices directly (start = first ts of
        # the run, count = run length), no per-session aggregation needed
        import pyarrow.compute as pc
        g = g.take(pc.sort_indices(g, sort_keys=[(key, "ascending"),
                                                 (ts_col, "ascending")]))
        ts = _epoch_seconds_floor(g.column(ts_col).combine_chunks())
        if not ts.size:
            return pa.table({key: pa.array([], g.schema.field(key).type),
                             "session_start": pa.array([], pa.int64()),
                             "n_events": pa.array([], pa.int64())})
        kv = g.column(key).combine_chunks()
        kn = kv.to_numpy(zero_copy_only=False)
        new_key = np.concatenate(([True], kn[1:] != kn[:-1]))
        new_session = new_key | np.concatenate(([True], np.diff(ts) > gap_s))
        bnd = np.flatnonzero(new_session)
        n_events = np.diff(np.append(bnd, ts.size))
        return pa.table({key: kv.take(pa.array(bnd)),
                         "session_start": pa.array(ts[bnd]),
                         "n_events": pa.array(n_events.astype(np.int64))})

    return (ds.map_batches(add_bucket, batch_format="pyarrow",
                           **rayenv.remote_args())
            .repartition(buckets)
            .groupby("_b")
            .map_groups(sessions, batch_format="pyarrow",
                        **rayenv.remote_args()))


def running_totals(ds, key: str = "user_id", ts_col: str = "ts",
                   val_col: str = "value", id_col: str = "event_id",
                   buckets: int = 32):
    """Per-key running aggregates — the window-function family
    (``SUM(...) OVER (PARTITION BY key ORDER BY ts)``): for every event,
    its 1-based row number within its key's time-ordered history and the
    cumulative value sum up to and including it. The event stream's
    per-entity state primitive (running spend, per-user event index).

    Values are integer-scaled (``floor(v*1000)`` int64, the same exactness
    trick as the window aggregates above) so the cumulative sums are
    bit-identical across engines and batch orders — no float summation
    order anywhere. Ordering within a key is (ts, id) so ties are
    deterministic.

    Scale shape: ONE bucketed shuffle (``hash(key) % buckets`` via the
    shared routing hash); inside each bucket a single sort by
    (key, ts, id) + a segmented cumsum resolves every key at once — no
    per-key dispatch, no driver materialization. Skew bound: a bucket
    holds whole keys, so a single key with billions of events needs the
    range-partitioned variant (sort on (key, ts) + carry-in pass);
    documented, not needed at event-table cardinalities.
    """

    def add_bucket(t: pa.Table) -> pa.Table:
        from .joins import hash_bucket
        kv = t.column(key).combine_chunks().to_numpy(zero_copy_only=False)
        return t.append_column("_b",
                               pa.array(hash_bucket(kv, buckets=buckets)))

    def cumulate(g: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        g = g.take(pc.sort_indices(g, sort_keys=[(key, "ascending"),
                                                 (ts_col, "ascending"),
                                                 (id_col, "ascending")]))
        n = g.num_rows
        if n == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             key: pa.array([], g.schema.field(key).type),
                             "row_num": pa.array([], pa.int64()),
                             "run_sum1000": pa.array([], pa.int64())})
        kn = g.column(key).combine_chunks().to_numpy(zero_copy_only=False)
        v = g.column(val_col).combine_chunks().to_numpy(
            zero_copy_only=False)
        # NULL semantics = SQL's SUM(...) OVER: a NULL/NaN value adds 0 to
        # the running sum but the row still gets a row number. Without the
        # mask, floor(NaN*1000).astype(int64) yields INT64_MIN and silently
        # corrupts every subsequent run_sum1000 for the key.
        v = np.asarray(v, dtype=np.float64)
        v1000 = np.where(np.isnan(v), np.int64(0),
                         np.floor(v * 1000)).astype(np.int64)
        new_key = np.concatenate(([True], kn[1:] != kn[:-1]))
        seg = np.flatnonzero(new_key)             # segment starts
        seg_of = np.cumsum(new_key) - 1           # segment id per row
        idx = np.arange(n, dtype=np.int64)
        row_num = idx - seg[seg_of] + 1
        cs = np.cumsum(v1000)
        base = cs[seg] - v1000[seg]               # cumsum before segment
        run_sum = cs - base[seg_of]
        return pa.table({id_col: g.column(id_col),
                         key: g.column(key),
                         "row_num": pa.array(row_num),
                         "run_sum1000": pa.array(run_sum)})

    return (ds.map_batches(add_bucket, batch_format="pyarrow",
                           **rayenv.remote_args())
            .repartition(buckets)
            .groupby("_b")
            .map_groups(cumulate, batch_format="pyarrow",
                        **rayenv.remote_args()))


def moving_range_sum(ds, range_s: int = 3600, key: str = "user_id",
                     ts_col: str = "ts", val_col: str = "value",
                     id_col: str = "event_id", buckets: int = 32):
    """Time-range moving aggregate — SQL's
    ``SUM(v) OVER (PARTITION BY key ORDER BY ts RANGE BETWEEN range_s
    PRECEDING AND CURRENT ROW)``: for every event, the count and exact
    integer-scaled value sum of its key's events in ``[t - range_s, t]``,
    INCLUDING same-timestamp peers (RANGE frames include all peers of the
    current row, unlike ROWS frames). The trailing-window primitive
    (rate limiting, rolling spend, burst detection).

    Values use the shared ``floor(v*1000)`` int64 scaling; NULL/NaN values
    contribute 0 to the sum but still count toward ``n_win``, mirroring
    SQL's SUM-skips-NULLs / COUNT(*)-counts-rows split.

    Scale shape: ONE bucketed shuffle on ``hash(key)``; inside each bucket
    every key is resolved at once with no per-key dispatch — timestamps are
    offset by ``segment_id * span`` so the window edges of ALL keys resolve
    in two global ``np.searchsorted`` calls against one prefix-sum array
    (an out-of-segment edge cannot cross into a neighboring key because the
    per-segment offset exceeds any in-segment timestamp spread by more than
    ``range_s``). Same whole-key-per-bucket skew bound as
    :func:`running_totals`.
    """
    if range_s < 0:
        raise ValueError("range_s must be >= 0")

    def add_bucket(t: pa.Table) -> pa.Table:
        from .joins import hash_bucket
        kv = t.column(key).combine_chunks().to_numpy(zero_copy_only=False)
        return t.append_column("_b",
                               pa.array(hash_bucket(kv, buckets=buckets)))

    def window_sum(g: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        g = g.take(pc.sort_indices(g, sort_keys=[(key, "ascending"),
                                                 (ts_col, "ascending"),
                                                 (id_col, "ascending")]))
        n = g.num_rows
        if n == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             key: pa.array([], g.schema.field(key).type),
                             "n_win": pa.array([], pa.int64()),
                             "win_sum1000": pa.array([], pa.int64())})
        kn = g.column(key).combine_chunks().to_numpy(zero_copy_only=False)
        tsec = _epoch_seconds_floor(g.column(ts_col))
        v = np.asarray(g.column(val_col).combine_chunks()
                       .to_numpy(zero_copy_only=False), dtype=np.float64)
        v1000 = np.where(np.isnan(v), np.int64(0),
                         np.floor(v * 1000)).astype(np.int64)
        new_key = np.concatenate(([True], kn[1:] != kn[:-1]))
        seg_of = np.cumsum(new_key) - 1           # segment id per row
        # per-segment offset large enough that (t - range_s) can never
        # reach the previous segment's adjusted range
        span = np.int64(int(tsec.max()) - int(tsec.min())
                        + int(range_s) + 2)
        t_adj = (tsec - tsec.min()) + seg_of * span
        lo = np.searchsorted(t_adj, t_adj - np.int64(range_s), side="left")
        hi = np.searchsorted(t_adj, t_adj, side="right")
        cs = np.concatenate(([np.int64(0)], np.cumsum(v1000)))
        return pa.table({id_col: g.column(id_col),
                         key: g.column(key),
                         "n_win": pa.array((hi - lo).astype(np.int64)),
                         "win_sum1000": pa.array(cs[hi] - cs[lo])})

    return (ds.map_batches(add_bucket, batch_format="pyarrow",
                           **rayenv.remote_args())
            .repartition(buckets)
            .groupby("_b")
            .map_groups(window_sum, batch_format="pyarrow",
                        **rayenv.remote_args()))


def funnel_steps(ds, steps=("view", "click", "purchase"),
                 window_s: int = 3600, key: str = "user_id",
                 ts_col: str = "ts", type_col: str = "event_type",
                 buckets: int = 32):
    """Event-sequence funnel — per user, the furthest step of an ordered
    event chain reached under a per-hop time window: step i+1 counts at
    time t iff some counted step-i event happened in ``[t - W, t)``
    (strictly before, within W seconds). The conversion/abandonment
    primitive of event analytics; output is ``(key, n_steps)`` for every
    user who reached at least step 1.

    Exactness: timestamps compare as raw int64 microsecond ticks (no
    float, no truncation), the hop predicate is EXACTLY the SQL
    ``EXISTS (a.t < b.t AND a.t >= b.t - W)`` — implemented per hop as
    one ``merge_asof(direction="backward", allow_exact_matches=False,
    tolerance=W)``, whose nearest-predecessor-within-tolerance semantics
    are the same predicate (a predecessor exists in the window iff the
    NEAREST strict predecessor is within it).

    Scale shape: ONE bucketed shuffle on hash(key) — buckets partition
    users, so the in-bucket result is final (no second exchange); each
    hop inside a bucket is one sorted merge over that bucket's events,
    every step level vectorized across all users at once."""
    W = np.int64(window_s) * np.int64(1_000_000)

    def add_bucket(t: pa.Table) -> pa.Table:
        from .joins import hash_bucket
        kv = t.column(key).combine_chunks().to_numpy(zero_copy_only=False)
        return t.append_column("_b",
                               pa.array(hash_bucket(kv, buckets=buckets)))

    def in_bucket(g: pa.Table) -> pa.Table:
        import pandas as pd
        ts = g.column(ts_col).combine_chunks()
        ticks = _epoch_micros(ts)
        df = pd.DataFrame({
            "u": g.column(key).combine_chunks().to_numpy(
                zero_copy_only=False),
            "t": ticks,
            "y": g.column(type_col).combine_chunks().to_numpy(
                zero_copy_only=False)}).sort_values("t", kind="mergesort")
        cur = df[df["y"] == steps[0]][["u", "t"]]
        reached = [cur["u"].unique()]
        for s in steps[1:]:
            if cur.empty:
                reached.append(np.array([], dtype=reached[0].dtype))
                continue
            cand = df[df["y"] == s][["u", "t"]]
            m = pd.merge_asof(cand, cur.rename(columns={"t": "pt"}),
                              left_on="t", right_on="pt", by="u",
                              direction="backward",
                              allow_exact_matches=False,
                              tolerance=int(W))
            cur = m.loc[m["pt"].notna(), ["u", "t"]]
            reached.append(cur["u"].unique())
        if reached[0].size == 0:
            return pa.table({key: pa.array([], g.schema.field(key).type),
                             "n_steps": pa.array([], pa.int64())})
        lvl = pd.concat([pd.DataFrame({"u": r, "l": i + 1})
                         for i, r in enumerate(reached)], ignore_index=True)
        out = lvl.groupby("u")["l"].max().reset_index()
        return pa.table({key: pa.array(out["u"].to_numpy()),
                         "n_steps": pa.array(out["l"].to_numpy(np.int64))})

    return (ds.map_batches(add_bucket, batch_format="pyarrow",
                           **rayenv.remote_args())
            .repartition(buckets)
            .groupby("_b")
            .map_groups(in_bucket, batch_format="pyarrow",
                        **rayenv.remote_args()))


def window_distinct_users(ds, window_s: int = 3600, key: str = "user_id",
                          ts_col: str = "ts", buckets: int = 32):
    """Per-tumbling-window COUNT(DISTINCT key) — the unique-actives
    metric (DAU/WAU family) over an event stream. Exact, not sketched:
    per-batch distinct (window, key) pairs first (each batch shrinks to
    its unique pairs before ANY exchange), then ONE bucketed shuffle on
    hash(window) — every window's pairs co-locate, so the in-bucket
    distinct count is FINAL and no second aggregation exchange exists
    (each Ray all-to-all stage carries seconds of fixed latency;
    measured 13.4 s -> with this single-exchange shape the op matches
    its siblings). Documented skew bound: one window's distinct keys
    must fit a bucket worker; for billions of uniques per window swap
    the in-bucket distinct for the HLL register merge (rwcf.analytics)
    at the same shape."""
    from .joins import hash_bucket

    def pairs(t: pa.Table) -> pa.Table:
        epoch = _epoch_seconds_floor(t.column(ts_col).combine_chunks())
        win = (epoch // np.int64(window_s)) * np.int64(window_s)
        u = pa.table({"win": pa.array(win), key: t.column(key)}) \
            .group_by(["win", key]).aggregate([])
        b = hash_bucket(u.column("win").to_numpy(zero_copy_only=False),
                        buckets=buckets)
        return u.append_column("_b", pa.array(b))

    def count_bucket(g: pa.Table) -> pa.Table:
        u = g.select(["win", key]).group_by(["win", key]).aggregate([])
        agg = u.group_by("win").aggregate([(key, "count")])
        return pa.table({"win_start": pc.cast(agg.column("win"),
                                              pa.int64()),
                         "n_users": pc.cast(agg.column(f"{key}_count"),
                                            pa.int64())})

    return (ds.map_batches(pairs, batch_format="pyarrow",
                           **rayenv.remote_args())
            .repartition(buckets)
            .groupby("_b")
            .map_groups(count_bucket, batch_format="pyarrow",
                        **rayenv.remote_args()))


def cohort_retention(ds, day_s: int = 86400, key: str = "user_id",
                     ts_col: str = "ts", max_offset: int = 14,
                     buckets: int = 32):
    """Cohort retention — for each cohort day (a user's FIRST active
    day) and each offset 0..max_offset, how many cohort members were
    active again on cohort_day + offset. The activation/stickiness
    table every event-analytics stack ships.

    Scale shape: events collapse to distinct (user, day) pairs inside
    each batch (the only thing that ever shuffles); ONE bucketed
    exchange on hash(user) co-locates each user's day set, where a
    vectorized pass derives (cohort = per-user min day, offsets) and
    emits (cohort_day, offset, 1) partials; the final groupby moves
    cohort x offset rows. Determinism: pure integer day arithmetic,
    same floor semantics as the SQL oracle."""
    from ray.data.aggregate import Sum

    from .joins import hash_bucket

    def pairs(t: pa.Table) -> pa.Table:
        epoch = _epoch_seconds_floor(t.column(ts_col).combine_chunks())
        day = epoch // np.int64(day_s)
        u = pa.table({key: t.column(key), "day": pa.array(day)}) \
            .group_by([key, "day"]).aggregate([])
        b = hash_bucket(u.column(key).to_numpy(zero_copy_only=False),
                        buckets=buckets)
        return u.append_column("_b", pa.array(b))

    def per_user(g: pa.Table) -> pa.Table:
        kv = g.column(key).to_numpy(zero_copy_only=False)
        dv = g.column("day").to_numpy(zero_copy_only=False)
        order = np.lexsort((dv, kv))
        sk, sd = kv[order], dv[order]
        first = np.ones(sk.size, dtype=bool)
        first[1:] = sk[1:] != sk[:-1]
        # drop cross-batch duplicate (user, day) pairs
        dup = np.zeros(sk.size, dtype=bool)
        dup[1:] = (sk[1:] == sk[:-1]) & (sd[1:] == sd[:-1])
        sk, sd, first = sk[~dup], sd[~dup], first[~dup]
        seg_of = np.cumsum(first) - 1
        cohort = sd[np.flatnonzero(first)][seg_of]
        off = sd - cohort
        keep = off <= max_offset
        tbl = pa.table({"cohort_day": pa.array(cohort[keep] * day_s),
                        "offset": pa.array(off[keep]),
                        "n": pa.array(np.ones(int(keep.sum()),
                                              dtype=np.int64))})
        g2 = tbl.group_by(["cohort_day", "offset"]).aggregate([("n", "sum")])
        # map aggregate output by NAME (column order differs across
        # pyarrow versions)
        return pa.table({"cohort_day": g2.column("cohort_day"),
                         "offset": g2.column("offset"),
                         "n": g2.column("n_sum")})

    out = (ds.map_batches(pairs, batch_format="pyarrow",
                          **rayenv.remote_args())
           .repartition(buckets)
           .groupby("_b")
           .map_groups(per_user, batch_format="pyarrow",
                       **rayenv.remote_args())
           .groupby(["cohort_day", "offset"])
           .aggregate(Sum("n", alias_name="n_users")))

    def cast(t: pa.Table) -> pa.Table:
        return pa.table({
            "cohort_day": pc.cast(t.column("cohort_day"), pa.int64()),
            "offset": pc.cast(t.column("offset"), pa.int64()),
            "n_users": pc.cast(t.column("n_users"), pa.int64())})
    return out.map_batches(cast, batch_format="pyarrow",
                           **rayenv.remote_args())


def event_deltas(ds, key: str = "user_id", ts_col: str = "ts",
                 id_col: str = "event_id", buckets: int = 32):
    """Per-key inter-event gaps — SQL's
    ``ts - LAG(ts) OVER (PARTITION BY key ORDER BY ts, id)`` in floored
    epoch seconds (NULL for each key's first event). The session-gap /
    arrival-rate primitive: feeds bot detection, session-gap tuning and
    event-rate features without a second pass.

    Scale shape: ONE bucketed shuffle on ``hash(key)``; in-bucket sort by
    (key, ts, id) + one shifted subtraction with a segment-start mask
    resolves every key at once. Same whole-key-per-bucket skew bound as
    :func:`running_totals`.
    """

    def add_bucket(t: pa.Table) -> pa.Table:
        from .joins import hash_bucket
        kv = t.column(key).combine_chunks().to_numpy(zero_copy_only=False)
        return t.append_column("_b",
                               pa.array(hash_bucket(kv, buckets=buckets)))

    def deltas(g: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        g = g.take(pc.sort_indices(g, sort_keys=[(key, "ascending"),
                                                 (ts_col, "ascending"),
                                                 (id_col, "ascending")]))
        n = g.num_rows
        if n == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             key: pa.array([], g.schema.field(key).type),
                             "gap_s": pa.array([], pa.int64())})
        kn = g.column(key).combine_chunks().to_numpy(zero_copy_only=False)
        tsec = _epoch_seconds_floor(g.column(ts_col))
        gap = np.empty(n, dtype=np.int64)
        gap[0] = 0
        gap[1:] = tsec[1:] - tsec[:-1]
        first = np.concatenate(([True], kn[1:] != kn[:-1]))
        return pa.table({id_col: g.column(id_col),
                         key: g.column(key),
                         "gap_s": pa.array(
                             np.ma.masked_array(gap, mask=first))})

    return (ds.map_batches(add_bucket, batch_format="pyarrow",
                           **rayenv.remote_args())
            .repartition(buckets)
            .groupby("_b")
            .map_groups(deltas, batch_format="pyarrow",
                        **rayenv.remote_args()))


def rows_window_sum(ds, preceding: int = 4, key: str = "user_id",
                    ts_col: str = "ts", val_col: str = "value",
                    id_col: str = "event_id", buckets: int = 32):
    """ROWS-frame trailing window — SQL's
    ``SUM(v) OVER (PARTITION BY key ORDER BY ts, id ROWS BETWEEN
    preceding PRECEDING AND CURRENT ROW)``: exactly the last
    ``preceding + 1`` rows of the key's deterministic (ts, id) order,
    NOT time-based and NOT peer-inclusive — the complement of
    :func:`moving_range_sum` (RANGE frame). The fixed-depth smoothing
    primitive (last-N moving averages, N-event burst scores).

    Same exactness contract (``floor(v*1000)`` int64; NaN adds 0 to the
    sum, still occupies a frame slot) and same scale shape as the other
    per-key window ops: ONE bucketed shuffle, in-bucket sort + prefix
    sums with the frame start clamped to each key's segment start — all
    keys resolve at once, no per-key dispatch.
    """
    if preceding < 0:
        raise ValueError("preceding must be >= 0")

    def add_bucket(t: pa.Table) -> pa.Table:
        from .joins import hash_bucket
        kv = t.column(key).combine_chunks().to_numpy(zero_copy_only=False)
        return t.append_column("_b",
                               pa.array(hash_bucket(kv, buckets=buckets)))

    def window_sum(g: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        g = g.take(pc.sort_indices(g, sort_keys=[(key, "ascending"),
                                                 (ts_col, "ascending"),
                                                 (id_col, "ascending")]))
        n = g.num_rows
        if n == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             key: pa.array([], g.schema.field(key).type),
                             "n_win": pa.array([], pa.int64()),
                             "win_sum1000": pa.array([], pa.int64())})
        kn = g.column(key).combine_chunks().to_numpy(zero_copy_only=False)
        v = np.asarray(g.column(val_col).combine_chunks()
                       .to_numpy(zero_copy_only=False), dtype=np.float64)
        v1000 = np.where(np.isnan(v), np.int64(0),
                         np.floor(v * 1000)).astype(np.int64)
        new_key = np.concatenate(([True], kn[1:] != kn[:-1]))
        seg = np.flatnonzero(new_key)
        seg_of = np.cumsum(new_key) - 1
        idx = np.arange(n, dtype=np.int64)
        lo = np.maximum(idx - np.int64(preceding), seg[seg_of])
        cs = np.concatenate(([np.int64(0)], np.cumsum(v1000)))
        return pa.table({id_col: g.column(id_col),
                         key: g.column(key),
                         "n_win": pa.array((idx - lo + 1).astype(np.int64)),
                         "win_sum1000": pa.array(cs[idx + 1] - cs[lo])})

    return (ds.map_batches(add_bucket, batch_format="pyarrow",
                           **rayenv.remote_args())
            .repartition(buckets)
            .groupby("_b")
            .map_groups(window_sum, batch_format="pyarrow",
                        **rayenv.remote_args()))


def latest_event_per_key(ds, key: str = "user_id", ts_col: str = "ts",
                         val_col: str = "value", id_col: str = "event_id",
                         buckets: int = 32, which: str = "last"):
    """Per-key LAST event — SQL's
    ``row_number() OVER (PARTITION BY key ORDER BY ts DESC, id DESC) = 1``:
    each key's most recent event with its floored-epoch timestamp and the
    integer-scaled value. NULL semantics (declared, and replayed by the
    oracle with COALESCE): a NULL/NaN value on the winning row emits
    ``v1000 = 0``, consistent with the window sums' NULL-adds-zero rule.
    The current-state primitive (latest profile, last-seen, most recent
    reading per entity).

    Scale shape: per-batch partial cut FIRST (each batch keeps one row
    per batch-local key), so the one ``hash(key)`` bucketed exchange
    moves at most one row per (key, batch), never raw events; the
    in-bucket final takes the last row of each sorted segment. The raw
    NATIVE-UNIT ticks ride through the exchange (every batch sees the
    same column unit, so ticks are globally comparable), so the
    cross-batch tie-break replays the oracle's raw-ts order exactly even
    for timestamp[ns] inputs — a microsecond-floored carry would collapse
    sub-microsecond ties onto the id tie-break and could pick a different
    row than ORDER BY ts DESC.

    ``which="first"`` flips both cuts to each key's EARLIEST event
    (``ORDER BY ts ASC, id ASC``) — the acquisition/first-touch mirror
    (see :func:`first_event_per_key`); the output timestamp column is
    named ``{which}_ts_s``. Identical scale shape either way.
    """
    if which not in ("last", "first"):
        raise ValueError(f"which must be 'last' or 'first', got {which!r}")
    out_ts = f"{which}_ts_s"

    def _cut(kn: np.ndarray) -> np.ndarray:
        # rows sorted (key, ts, id) ascending: per-key winner is the
        # segment's last row for "last", first row for "first"
        if which == "last":
            return np.concatenate((kn[1:] != kn[:-1], [True]))
        return np.concatenate(([True], kn[1:] != kn[:-1]))

    def local_last(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        t = t.take(pc.sort_indices(t, sort_keys=[(key, "ascending"),
                                                 (ts_col, "ascending"),
                                                 (id_col, "ascending")]))
        n = t.num_rows
        if n == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             key: pa.array([], t.schema.field(key).type),
                             "_ts_ticks": pa.array([], pa.int64()),
                             "_ts_s": pa.array([], pa.int64()),
                             "v1000": pa.array([], pa.int64())})
        kn = t.column(key).combine_chunks().to_numpy(zero_copy_only=False)
        last = _cut(kn)
        ticks = pc.cast(t.column(ts_col).combine_chunks(),
                        pa.int64()).to_numpy(zero_copy_only=False)[last]
        tsec = _epoch_seconds_floor(t.column(ts_col))[last]
        v = np.asarray(t.column(val_col).combine_chunks()
                       .to_numpy(zero_copy_only=False),
                       dtype=np.float64)[last]
        v1000 = np.where(np.isnan(v), np.int64(0),
                         np.floor(v * 1000)).astype(np.int64)
        keep = pa.array(last)
        out = pa.table({id_col: t.column(id_col).filter(keep),
                        key: t.column(key).filter(keep),
                        "_ts_ticks": pa.array(ticks),
                        "_ts_s": pa.array(tsec),
                        "v1000": pa.array(v1000)})
        from .joins import hash_bucket
        kv = out.column(key).combine_chunks() \
            .to_numpy(zero_copy_only=False)
        return out.append_column("_b",
                                 pa.array(hash_bucket(kv, buckets=buckets)))

    def final_last(g: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        g = g.take(pc.sort_indices(g, sort_keys=[
            (key, "ascending"), ("_ts_ticks", "ascending"),
            (id_col, "ascending")]))
        n = g.num_rows
        if n == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             key: pa.array([], g.schema.field(key).type),
                             out_ts: pa.array([], pa.int64()),
                             "v1000": pa.array([], pa.int64())})
        kn = g.column(key).combine_chunks().to_numpy(zero_copy_only=False)
        last = pa.array(_cut(kn))
        return pa.table({id_col: g.column(id_col).filter(last),
                         key: g.column(key).filter(last),
                         out_ts: g.column("_ts_s").filter(last),
                         "v1000": g.column("v1000").filter(last)})

    return (ds.map_batches(local_last, batch_format="pyarrow",
                           **rayenv.remote_args())
            .repartition(buckets)
            .groupby("_b")
            .map_groups(final_last, batch_format="pyarrow",
                        **rayenv.remote_args()))


def first_event_per_key(ds, key: str = "user_id", ts_col: str = "ts",
                        val_col: str = "value", id_col: str = "event_id",
                        buckets: int = 32):
    """Per-key FIRST event — SQL's ``row_number() OVER (PARTITION BY key
    ORDER BY ts ASC, id ASC) = 1``: the acquisition/first-touch mirror
    of :func:`latest_event_per_key` (signup event, first session, cohort
    anchor). Same one-row-per-(key, batch) partial-cut scale shape;
    output ``(id, key, first_ts_s, v1000)``."""
    return latest_event_per_key(ds, key=key, ts_col=ts_col,
                                val_col=val_col, id_col=id_col,
                                buckets=buckets, which="first")


def event_transitions(ds, key: str = "user_id", ts_col: str = "ts",
                      type_col: str = "event_type",
                      id_col: str = "event_id", buckets: int = 32):
    """Per-key event-type transition counts — for each user's
    time-ordered stream, count consecutive ``(from_type, to_type)``
    pairs corpus-wide (the first-order Markov matrix behaviour-model
    features come from). Order is ``(ts, id)`` ascending with the raw
    NATIVE-UNIT ticks carried, the same tie-break contract as
    :func:`latest_event_per_key`, replayed by the oracle's LAG window.

    Scale shape: adjacency crosses batch boundaries, so each key's
    events must co-locate once — ONE ``hash(key)`` bucketed exchange of
    ``(key, ticks, id, type)`` projections (the standard window-family
    exchange); in-bucket, one sort resolves every key's stream and the
    pair counting is a vectorized unique over integer-coded type pairs.
    The final groupby is |types|^2-sized — nothing corpus-sized leaves
    the buckets."""

    def project(t: pa.Table) -> pa.Table:
        from .joins import hash_bucket
        kv = t.column(key).combine_chunks().to_numpy(zero_copy_only=False)
        ticks = pc.cast(t.column(ts_col).combine_chunks(), pa.int64())
        out = pa.table({key: t.column(key), "_t": ticks,
                        id_col: t.column(id_col),
                        type_col: t.column(type_col)})
        return out.append_column(
            "_b", pa.array(hash_bucket(kv, buckets=buckets)))

    def pairs(g: pa.Table) -> pa.Table:
        g = g.take(pc.sort_indices(g, sort_keys=[
            (key, "ascending"), ("_t", "ascending"),
            (id_col, "ascending")]))
        n = g.num_rows
        if n < 2:
            return pa.table({"from_type": pa.array([], pa.string()),
                             "to_type": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        kn = g.column(key).combine_chunks().to_numpy(zero_copy_only=False)
        tv = g.column(type_col).combine_chunks() \
            .to_numpy(zero_copy_only=False)
        ut, code = np.unique(tv, return_inverse=True)
        same = kn[1:] == kn[:-1]
        pair = code[:-1].astype(np.int64) * np.int64(ut.size) + code[1:]
        pair = pair[same]
        up, cnt = np.unique(pair, return_counts=True)
        return pa.table({
            "from_type": pa.array(ut[(up // ut.size)].astype(object),
                                  pa.string()),
            "to_type": pa.array(ut[(up % ut.size)].astype(object),
                                pa.string()),
            "n": pa.array(cnt.astype(np.int64))})

    from ray.data.aggregate import Sum
    return (ds.map_batches(project, batch_format="pyarrow",
                           **rayenv.remote_args())
            .repartition(buckets)
            .groupby("_b")
            .map_groups(pairs, batch_format="pyarrow",
                        **rayenv.remote_args())
            .groupby(["from_type", "to_type"])
            .aggregate(Sum("n", alias_name="n")))


def time_since_event(ds, match_type: str = "purchase",
                     key: str = "user_id", ts_col: str = "ts",
                     type_col: str = "event_type",
                     id_col: str = "event_id", buckets: int = 32):
    """Conditional carry-forward window — for every event, the seconds
    elapsed since the SAME user's most recent prior ``match_type``
    event (the recency feature behind "time since last purchase");
    events with no prior match are omitted. Order is ``(ts, id)``
    ascending over native ticks (the window family's tie-break
    contract); the delta is taken between floored epoch seconds on both
    sides, exactly as the oracle subtracts them.

    Scale shape: the carry-forward crosses batch boundaries, so events
    co-locate per key once — ONE ``hash(key)`` bucketed exchange of
    4-column projections; in-bucket, one sort orders every stream, and
    the "latest prior match" resolves for ALL rows at once with a
    searchsorted over the match rows' positions (no per-key dispatch,
    no scan-back loop) — valid because rows sort key-first, so a match
    position is in-segment iff it is at or after the row's segment
    start."""

    def project(t: pa.Table) -> pa.Table:
        from .joins import hash_bucket
        kv = t.column(key).combine_chunks().to_numpy(zero_copy_only=False)
        out = pa.table({key: t.column(key),
                        "_t": pc.cast(t.column(ts_col).combine_chunks(),
                                      pa.int64()),
                        "_s": pa.array(_epoch_seconds_floor(
                            t.column(ts_col))),
                        id_col: t.column(id_col),
                        type_col: t.column(type_col)})
        return out.append_column(
            "_b", pa.array(hash_bucket(kv, buckets=buckets)))

    def recency(g: pa.Table) -> pa.Table:
        g = g.take(pc.sort_indices(g, sort_keys=[
            (key, "ascending"), ("_t", "ascending"),
            (id_col, "ascending")]))
        n = g.num_rows
        empty = pa.table({id_col: pa.array([], pa.int64()),
                          key: pa.array([], pa.int64()),
                          "secs_since": pa.array([], pa.int64())})
        if n == 0:
            return empty
        kn = g.column(key).combine_chunks().to_numpy(zero_copy_only=False)
        secs = g.column("_s").to_numpy(zero_copy_only=False)
        is_m = g.column(type_col).combine_chunks() \
            .to_numpy(zero_copy_only=False) == match_type
        mpos = np.flatnonzero(is_m)
        if mpos.size == 0:
            return empty
        # per-row segment start (first index of its key run)
        new = np.ones(n, dtype=bool)
        new[1:] = kn[1:] != kn[:-1]
        seg_start = np.flatnonzero(new)[np.cumsum(new) - 1]
        # last match STRICTLY before each row, globally ...
        ji = np.searchsorted(mpos, np.arange(n), side="left") - 1
        valid = ji >= 0
        j = mpos[np.maximum(ji, 0)]
        # ... and only in-segment matches count
        valid &= j >= seg_start
        keep = pa.array(valid)
        return pa.table({
            id_col: g.column(id_col).filter(keep),
            key: g.column(key).filter(keep),
            "secs_since": pa.array(
                (secs[valid] - secs[j[valid]]).astype(np.int64))})

    return (ds.map_batches(project, batch_format="pyarrow",
                           **rayenv.remote_args())
            .repartition(buckets)
            .groupby("_b")
            .map_groups(recency, batch_format="pyarrow",
                        **rayenv.remote_args()))


def session_conversion(ds, gap_s: int = 1800,
                       convert_type: str = "purchase",
                       key: str = "user_id", ts_col: str = "ts",
                       type_col: str = "event_type",
                       buckets: int = 32):
    """Sessionized conversion: per user, how many sessions (gap >
    ``gap_s`` seconds splits, same boundary rule as
    :func:`session_windows`) and how many of them contain at least one
    ``convert_type`` event. The funnel-health rollup a product pipeline
    runs right after sessionization. Output
    ``(user_id, n_sessions, n_converted)``.

    Scale shape: identical to :func:`session_windows` — ONE
    hash(key) bucketed exchange; per bucket one (key, ts) sort, a
    vectorized boundary pass, and a segmented max over the conversion
    flag resolve every user at once. The rollup to per-user counts is
    bucket-local (a bucket holds whole keys), so no second exchange."""

    def add_bucket(t: pa.Table) -> pa.Table:
        from .joins import hash_bucket
        kv = t.column(key).combine_chunks().to_numpy(zero_copy_only=False)
        return t.append_column(
            "_b", pa.array(hash_bucket(kv, buckets=buckets)))

    def conv(g: pa.Table) -> pa.Table:
        g = g.take(pc.sort_indices(g, sort_keys=[(key, "ascending"),
                                                 (ts_col, "ascending")]))
        ts = _epoch_seconds_floor(g.column(ts_col).combine_chunks())
        if not ts.size:
            return pa.table({key: pa.array([], g.schema.field(key).type),
                             "n_sessions": pa.array([], pa.int64()),
                             "n_converted": pa.array([], pa.int64())})
        kv = g.column(key).combine_chunks()
        kn = kv.to_numpy(zero_copy_only=False)
        is_conv = pc.equal(g.column(type_col).combine_chunks(),
                           convert_type) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        new_key = np.concatenate(([True], kn[1:] != kn[:-1]))
        new_session = new_key | np.concatenate(([True],
                                                np.diff(ts) > gap_s))
        sid = np.cumsum(new_session) - 1          # global session index
        n_sess_total = int(sid[-1]) + 1
        conv_per_session = np.zeros(n_sess_total, dtype=np.int64)
        np.maximum.at(conv_per_session, sid, is_conv)
        # per-key rollup: sessions whose FIRST row starts a key segment
        sess_key_rows = np.flatnonzero(new_session)   # one row per session
        key_of_session = kn[sess_key_rows]
        uk, counts = np.unique(key_of_session, return_counts=True)
        conv_counts = np.zeros(uk.size, dtype=np.int64)
        inv = np.searchsorted(uk, key_of_session)
        np.add.at(conv_counts, inv, conv_per_session)
        return pa.table({
            key: pa.array(uk, g.schema.field(key).type),
            "n_sessions": pa.array(counts.astype(np.int64)),
            "n_converted": pa.array(conv_counts)})

    return (ds.map_batches(add_bucket, batch_format="pyarrow",
                           **rayenv.remote_args())
            .repartition(buckets)
            .groupby("_b")
            .map_groups(conv, batch_format="pyarrow",
                        **rayenv.remote_args()))


def peak_concurrency(ds, gap_s: int = 1800, key: str = "user_id",
                     ts_col: str = "ts", buckets: int = 32):
    """Peak concurrent sessions — the capacity-planning gauge: the
    maximum number of sessions (same boundary rule as
    :func:`session_windows`) active at any one second, and the first
    second that peak is reached. Concurrency treats sessions as CLOSED
    intervals [first event, last event] in floor-epoch seconds; at a
    second where one session ends and another starts, both count.
    Output one row ``(peak, at_ts)``.

    Scale shape — a distributed SEGMENTED SCAN (the one pattern the
    bucketed-exchange family cannot express): session bounds fall out
    of the usual ONE hash(key) exchange; each session emits two
    boundary rows (+1 at start, -1 after end), which are RANGE-sorted
    globally (an all-to-all, but over 2 rows/session — orders of
    magnitude under the corpus); each sorted block then reduces to a
    three-number scan summary (total delta, best internal prefix max,
    its timestamp), and the driver folds the #blocks summaries IN
    ORDER — prefix max = max over blocks of (carry + block max), so no
    second distributed pass and no corpus-sized driver state."""
    import pandas as pd

    def add_bucket(t: pa.Table) -> pa.Table:
        from .joins import hash_bucket
        kv = t.column(key).combine_chunks().to_numpy(zero_copy_only=False)
        return t.append_column(
            "_b", pa.array(hash_bucket(kv, buckets=buckets)))

    def bounds(g: pa.Table) -> pa.Table:
        g = g.take(pc.sort_indices(g, sort_keys=[(key, "ascending"),
                                                 (ts_col, "ascending")]))
        ts = _epoch_seconds_floor(g.column(ts_col).combine_chunks())
        if not ts.size:
            return pa.table({"t": pa.array([], pa.int64()),
                             "nd": pa.array([], pa.int64())})
        kn = g.column(key).combine_chunks() \
            .to_numpy(zero_copy_only=False)
        new_key = np.concatenate(([True], kn[1:] != kn[:-1]))
        new_session = new_key | np.concatenate(([True],
                                                np.diff(ts) > gap_s))
        bnd = np.flatnonzero(new_session)
        starts = ts[bnd]
        ends = ts[np.concatenate((bnd[1:] - 1, [ts.size - 1]))]
        # nd = -delta so an ascending (t, nd) sort puts +1 rows before
        # -1 rows at the same second (closed-interval semantics)
        return pa.table({
            "t": pa.array(np.concatenate((starts, ends))),
            "nd": pa.array(np.concatenate((
                np.full(starts.size, -1, np.int64),
                np.full(ends.size, 1, np.int64))))})

    boundaries = (ds.map_batches(add_bucket, batch_format="pyarrow",
                                 **rayenv.remote_args())
                  .repartition(buckets)
                  .groupby("_b")
                  .map_groups(bounds, batch_format="pyarrow",
                              **rayenv.remote_args())
                  .sort(["t", "nd"]))

    def scan_summary(t: pa.Table) -> pa.Table:
        d = -t.column("nd").combine_chunks() \
            .to_numpy(zero_copy_only=False)
        if d.size == 0:
            return pa.table({"total": pa.array([0], pa.int64()),
                             "best": pa.array([np.iinfo(np.int64).min],
                                              pa.int64()),
                             "at": pa.array([0], pa.int64())})
        ts = t.column("t").combine_chunks() \
            .to_numpy(zero_copy_only=False)
        run = np.cumsum(d)
        k = int(np.argmax(run))  # first index achieving the block max
        return pa.table({"total": pa.array([int(d.sum())], pa.int64()),
                         "best": pa.array([int(run[k])], pa.int64()),
                         "at": pa.array([int(ts[k])], pa.int64())})

    # ordered fold over the #blocks summaries (rows arrive in sort
    # order; Ray preserves deterministic block order through map)
    parts = boundaries.map_batches(scan_summary, batch_format="pyarrow",
                                   batch_size=None,
                                   **rayenv.remote_args()).to_pandas()
    carry, peak, at = 0, np.iinfo(np.int64).min, 0
    for _, row in parts.iterrows():
        if int(row["best"]) != np.iinfo(np.int64).min \
                and carry + int(row["best"]) > peak:
            peak = carry + int(row["best"])
            at = int(row["at"])
        carry += int(row["total"])
    if peak == np.iinfo(np.int64).min:
        peak, at = 0, 0
    return pd.DataFrame({"peak": pd.array([peak], dtype="int64"),
                         "at_ts": pd.array([at], dtype="int64")})


def windowed_pair_join(ds, from_type: str = "purchase",
                       to_type: str = "error", window_s: int = 300,
                       key: str = "user_id", ts_col: str = "ts",
                       type_col: str = "event_type", buckets: int = 32):
    """Stream-stream windowed self-join: per user, count ``to_type``
    events STRICTLY after a ``from_type`` event and within
    ``window_s`` seconds of it (floor-epoch) — every qualifying pair
    counts (join semantics), e.g. errors shortly after purchases. The
    third temporal-join sibling (as-of = nearest-one, range = static
    interval; this one is event-to-event sliding). Output
    ``(user_id, n_pairs)`` for users with at least one pair.

    Scale shape: both sides prune to the two types at the batch level;
    ONE hash(key) exchange co-locates each user's rows; per bucket the
    counts fall out of two searchsorted calls on a per-user-offset
    composite key — no per-user dispatch, no pair materialization
    (counts, not pairs, leave the bucket)."""

    def add_bucket(t: pa.Table) -> pa.Table:
        from .joins import hash_bucket
        sel = pc.is_in(t.column(type_col),
                       value_set=pa.array([from_type, to_type]))
        t = t.filter(sel)
        kv = t.column(key).combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table({
            "_b": pa.array(hash_bucket(kv, buckets=buckets)),
            key: t.column(key),
            "es": pa.array(_epoch_seconds_floor(
                t.column(ts_col).combine_chunks())),
            "is_from": pc.equal(t.column(type_col), from_type)})

    def count_pairs(g: pa.Table) -> pa.Table:
        kn = g.column(key).combine_chunks() \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        es = g.column("es").combine_chunks() \
            .to_numpy(zero_copy_only=False)
        isf = g.column("is_from").combine_chunks() \
            .to_numpy(zero_copy_only=False)
        if kn.size == 0:
            return pa.table({key: pa.array([], pa.int64()),
                             "n_pairs": pa.array([], pa.int64())})
        # composite monotonic key: user ordinal * span + time offset.
        # span bounds the per-key time range; int64 holds ordinals x
        # span comfortably for realistic corpora (documented bound)
        u, inv = np.unique(kn, return_inverse=True)
        t0 = es.min()
        span = int(es.max()) - int(t0) + window_s + 2
        comp = inv.astype(np.int64) * span + (es - t0)
        froms = np.sort(comp[isf])
        tos = np.sort(comp[~isf])
        lo = np.searchsorted(tos, froms, side="right")   # strictly after
        hi = np.searchsorted(tos, froms + window_s, side="right")
        # windows never cross the span padding, so hi stays in-user
        per_from = hi - lo
        fu = (froms // span).astype(np.int64)            # user ordinal
        counts = np.zeros(u.size, dtype=np.int64)
        np.add.at(counts, fu, per_from)
        keep = counts > 0
        return pa.table({key: pa.array(u[keep]),
                         "n_pairs": pa.array(counts[keep])})

    return (ds.map_batches(add_bucket, batch_format="pyarrow",
                           **rayenv.remote_args())
            .repartition(buckets)
            .groupby("_b")
            .map_groups(count_pairs, batch_format="pyarrow",
                        **rayenv.remote_args()))


def top_event_paths(ds, n: int = 3, k: int = 10, key: str = "user_id",
                    ts_col: str = "ts", type_col: str = "event_type",
                    id_col: str = "event_id", buckets: int = 32):
    """Top-``k`` most common length-``n`` event-type paths across all
    users' time-ordered streams (the order-``n`` generalization of the
    transition matrix — what behavioral sequences dominate). Ordering
    is (ts, id) like the transition/funnel family; ties in the top-k
    break on the lexicographically smaller path. Output
    ``(path, n_occurrences, rank)`` with ``>`` joining the steps.

    Scale shape: ONE hash(key) exchange; per bucket one sort and a
    windowed n-gram pass over each user's segment (same kernel shape
    as the text n-grams); only (path, count) partials leave the
    bucket; a |paths|-domain groupby and a per-block top-k cut + tiny
    final finish it."""
    from ray.data.aggregate import Sum

    def add_bucket(t: pa.Table) -> pa.Table:
        from .joins import hash_bucket
        kv = t.column(key).combine_chunks().to_numpy(zero_copy_only=False)
        return t.append_column(
            "_b", pa.array(hash_bucket(kv, buckets=buckets)))

    def paths(g: pa.Table) -> pa.Table:
        g = g.take(pc.sort_indices(g, sort_keys=[
            (key, "ascending"), (ts_col, "ascending"),
            (id_col, "ascending")]))
        kn = g.column(key).combine_chunks() \
            .to_numpy(zero_copy_only=False)
        tv = g.column(type_col).combine_chunks() \
            .to_numpy(zero_copy_only=False).astype(str)
        m = kn.size
        if m < n:
            return pa.table({"path": pa.array([], pa.string()),
                             "cnt": pa.array([], pa.int64())})
        valid = np.ones(m - n + 1, dtype=bool)
        for j in range(1, n):
            valid &= kn[j:m - n + 1 + j] == kn[:m - n + 1]
        grams = tv[:m - n + 1]
        for j in range(1, n):
            grams = np.char.add(np.char.add(grams, ">"),
                                tv[j:m - n + 1 + j])
        grams = grams[valid]
        u, cnt = np.unique(grams, return_counts=True)
        return pa.table({"path": pa.array(u.astype(object), pa.string()),
                         "cnt": pa.array(cnt.astype(np.int64))})

    per_path = (ds.map_batches(add_bucket, batch_format="pyarrow",
                               **rayenv.remote_args())
                .repartition(buckets)
                .groupby("_b")
                .map_groups(paths, batch_format="pyarrow",
                            **rayenv.remote_args())
                .groupby("path")
                .aggregate(Sum("cnt", alias_name="n_occurrences")))

    def cut(rank: bool):
        def fn(t: pa.Table) -> pa.Table:
            c = t.column("n_occurrences").combine_chunks() \
                .to_numpy(zero_copy_only=False)
            p = t.column("path").combine_chunks() \
                .to_numpy(zero_copy_only=False).astype(object)
            order = np.lexsort((p, -c))[:k]
            out = {"path": pa.array(p[order], pa.string()),
                   "n_occurrences": pa.array(c[order].astype(np.int64))}
            if rank:
                out["rank"] = pa.array(
                    np.arange(1, len(order) + 1, dtype=np.int64))
            return pa.table(out)
        return fn

    return (per_path.map_batches(cut(False), batch_format="pyarrow",
                                 **rayenv.remote_args())
            .repartition(1)
            .map_batches(cut(True), batch_format="pyarrow",
                         **rayenv.remote_args()))


def median_gap_per_user(ds, key: str = "user_id", ts_col: str = "ts",
                        buckets: int = 32):
    """Per-user median inter-event gap in floor-epoch seconds — the
    cadence statistic (bots have tight medians, humans are bursty).
    The median is the discrete rank-ceil(0.5*n) order statistic of the
    user's gaps (the package's grouped-quantile convention). Users
    with fewer than two events have no gaps and are absent. Output
    ``(user_id, n_gaps, median_gap_s)``.

    Scale shape: ONE hash(key) exchange co-locates each user's rows;
    the bucket derives gaps AND resolves every user's order statistic
    in a single sort + segmented index pass — deriving data inside
    the bucket avoids a second exchange entirely."""

    def add_bucket(t: pa.Table) -> pa.Table:
        from .joins import hash_bucket
        kv = t.column(key).combine_chunks().to_numpy(zero_copy_only=False)
        return t.append_column(
            "_b", pa.array(hash_bucket(kv, buckets=buckets)))

    def med(g: pa.Table) -> pa.Table:
        g = g.take(pc.sort_indices(g, sort_keys=[(key, "ascending"),
                                                 (ts_col, "ascending")]))
        ts = _epoch_seconds_floor(g.column(ts_col).combine_chunks())
        kn = g.column(key).combine_chunks() \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        if kn.size < 2:
            return pa.table({key: pa.array([], pa.int64()),
                             "n_gaps": pa.array([], pa.int64()),
                             "median_gap_s": pa.array([], pa.int64())})
        same = kn[1:] == kn[:-1]
        gaps = np.diff(ts)[same]
        users = kn[1:][same]
        # per-user median: sort by (user, gap), index the
        # rank-ceil(n/2) element of each segment
        order = np.lexsort((gaps, users))
        users, gaps = users[order], gaps[order]
        new = np.concatenate(([True], users[1:] != users[:-1]))
        seg = np.flatnonzero(new)
        counts = np.diff(np.append(seg, users.size))
        med_idx = seg + np.maximum(1, np.ceil(0.5 * counts)
                                   .astype(np.int64)) - 1
        return pa.table({key: pa.array(users[seg]),
                         "n_gaps": pa.array(counts.astype(np.int64)),
                         "median_gap_s": pa.array(gaps[med_idx])})

    return (ds.map_batches(add_bucket, batch_format="pyarrow",
                           **rayenv.remote_args())
            .repartition(buckets)
            .groupby("_b")
            .map_groups(med, batch_format="pyarrow",
                        **rayenv.remote_args()))


def longest_streak_per_user(ds, key: str = "user_id", ts_col: str = "ts",
                            type_col: str = "event_type",
                            id_col: str = "event_id", buckets: int = 32):
    """Per-key longest run of CONSECUTIVE equal ``type_col`` values in
    (ts, id) order — the gaps-and-islands family (SQL: difference of two
    row_numbers -> island lengths -> max per key).  Engagement-streak /
    repeated-action detection over event streams.

    Scale shape: ONE bucketed shuffle (whole keys co-locate via the shared
    routing hash); in-bucket a single sort by (key, ts, id) resolves every
    key's runs at once with vectorized run-boundary detection + two levels
    of ``reduceat`` (runs, then keys) — no per-key dispatch, no expansion.
    Output: (key, n_events, max_streak).
    """

    def add_bucket(t: pa.Table) -> pa.Table:
        from .joins import hash_bucket
        kv = t.column(key).combine_chunks().to_numpy(zero_copy_only=False)
        return (t.select([key, ts_col, type_col, id_col])
                .append_column("_b",
                               pa.array(hash_bucket(kv, buckets=buckets))))

    def streaks(g: pa.Table) -> pa.Table:
        g = g.take(pc.sort_indices(g, sort_keys=[(key, "ascending"),
                                                 (ts_col, "ascending"),
                                                 (id_col, "ascending")]))
        n = g.num_rows
        if n == 0:
            return pa.table({key: pa.array([], pa.int64()),
                             "n_events": pa.array([], pa.int64()),
                             "max_streak": pa.array([], pa.int64())})
        kn = g.column(key).combine_chunks().to_numpy(zero_copy_only=False)
        tv = g.column(type_col).combine_chunks()
        # dictionary-encode the type for a fast != on codes
        codes = tv.dictionary_encode().indices.to_numpy(
            zero_copy_only=False)
        new_key = np.concatenate(([True], kn[1:] != kn[:-1]))
        new_run = new_key | np.concatenate(([True],
                                            codes[1:] != codes[:-1]))
        run_starts = np.flatnonzero(new_run)
        run_lens = np.diff(np.append(run_starts, n)).astype(np.int64)
        # key segments over the run array: a run never crosses a key
        run_is_new_key = new_key[run_starts]
        key_seg = np.flatnonzero(run_is_new_key)
        max_streak = np.maximum.reduceat(run_lens, key_seg)
        n_events = np.add.reduceat(run_lens, key_seg)
        return pa.table({key: pa.array(kn[run_starts[key_seg]]),
                         "n_events": pa.array(n_events),
                         "max_streak": pa.array(max_streak)})

    return (ds.map_batches(add_bucket, batch_format="pyarrow",
                           **rayenv.remote_args())
            .repartition(buckets)
            .groupby("_b")
            .map_groups(streaks, batch_format="pyarrow",
                        **rayenv.remote_args()))


def market_basket_pairs(ds, key: str = "user_id", ts_col: str = "ts",
                        item_col: str = "event_type", day_s: int = 86400,
                        buckets: int = 32):
    """Frequent-itemset PAIR mining over (key, day) baskets: the support
    count of every unordered item pair that co-occurs in at least one
    basket — the market-basket co-occurrence primitive (association-rule
    numerators) over an event stream.

    Scale shape: in-batch distinct (key, day, item) triples collapse
    repeats BEFORE the exchange; ONE bucketed shuffle on hash(key, day)
    co-locates whole baskets; in-bucket a lexsort + per-basket vectorized
    pair expansion (rwcf.fuzzy._block_pairs) emits (item_a, item_b) pair
    rows whose count is a final item-domain-sized groupby. A basket's
    pair count is quadratic in its DISTINCT item count — bounded by the
    item vocabulary (event-type domain), the stated contract."""

    def triples(t: pa.Table) -> pa.Table:
        from .joins import hash_bucket
        us = t.column(key).to_numpy(zero_copy_only=False)
        day = (_epoch_micros(t.column(ts_col)) //
               (day_s * 1_000_000)).astype(np.int64)
        it = t.column(item_col).combine_chunks().to_numpy(
            zero_copy_only=False)
        df = pd.DataFrame({"k": us, "d": day, "i": it}).drop_duplicates()
        return pa.table({
            "k": pa.array(df["k"].to_numpy().astype(np.int64)),
            "d": pa.array(df["d"].to_numpy().astype(np.int64)),
            "i": pa.array(df["i"].to_numpy(), pa.string()),
            "_b": pa.array(hash_bucket(df["k"].to_numpy(),
                                       df["d"].to_numpy(),
                                       buckets=buckets))})

    def pairs(g: pa.Table) -> pa.Table:
        from .fuzzy import _block_pairs
        k = g.column("k").combine_chunks().to_numpy(zero_copy_only=False)
        d = g.column("d").combine_chunks().to_numpy(zero_copy_only=False)
        i = g.column("i").combine_chunks().to_numpy(zero_copy_only=False)
        empty = pa.table({"t1": pa.array([], pa.string()),
                          "t2": pa.array([], pa.string()),
                          "n": pa.array([], pa.int64())})
        if not k.size:
            return empty
        order = np.lexsort((i, d, k))
        k, d, i = k[order], d[order], i[order]
        # cross-batch duplicate triples collapse here
        dup = np.concatenate(([False], (k[1:] == k[:-1]) &
                              (d[1:] == d[:-1]) & (i[1:] == i[:-1])))
        k, d, i = k[~dup], d[~dup], i[~dup]
        new_basket = np.concatenate(([True], (k[1:] != k[:-1]) |
                                     (d[1:] != d[:-1])))
        seg = np.flatnonzero(new_basket)
        ia, ib = _block_pairs(seg, k.size)
        if not ia.size:
            return empty
        # items are sorted within a basket, so i[ia] < i[ib] already
        pdf = (pd.DataFrame({"t1": i[ia], "t2": i[ib]})
               .groupby(["t1", "t2"], as_index=False).size())
        return pa.table({"t1": pa.array(pdf["t1"].to_numpy(), pa.string()),
                         "t2": pa.array(pdf["t2"].to_numpy(), pa.string()),
                         "n": pa.array(pdf["size"].to_numpy()
                                       .astype(np.int64))})

    from ray.data.aggregate import Sum
    return (ds.map_batches(triples, batch_format="pyarrow",
                           **rayenv.remote_args())
            .repartition(buckets)
            .groupby("_b")
            .map_groups(pairs, batch_format="pyarrow",
                        **rayenv.remote_args())
            .groupby(["t1", "t2"])
            .aggregate(Sum("n", alias_name="support")))


def windowed_dedup_events(ds, key: str = "user_id",
                          type_col: str = "event_type", ts_col: str = "ts",
                          id_col: str = "event_id", window_s: int = 3600,
                          buckets: int = 32):
    """Windowed deduplication: keep the FIRST event (min (ts, id)) per
    (key, type, tumbling window) and report how many it suppressed — the
    stream-dedup primitive (retry collapse, at-least-once delivery
    cleanup).

    Scale shape: per-batch LOCAL winners (one row per (key, type, window)
    per batch — the combiner) -> ONE bucketed exchange of winner rows ->
    in-bucket lexsort picks the global min and sums the suppressed
    counts. Raw events never shuffle."""

    def local(t: pa.Table) -> pa.Table:
        us = t.column(key).to_numpy(zero_copy_only=False)
        et = t.column(type_col).combine_chunks().to_numpy(
            zero_copy_only=False)
        mic = _epoch_micros(t.column(ts_col))
        win = mic // (window_s * 1_000_000)
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"k": us, "t": et, "w": win.astype(np.int64),
                           "mic": mic, "id": ids})
        df = df.sort_values(["k", "t", "w", "mic", "id"])
        g = df.groupby(["k", "t", "w"], as_index=False, sort=False)
        first = g.first()
        cnt = g.size()["size"]
        from .joins import hash_bucket
        return pa.table({
            "k": pa.array(first["k"].to_numpy().astype(np.int64)),
            "t": pa.array(first["t"].to_numpy(), pa.string()),
            "w": pa.array(first["w"].to_numpy().astype(np.int64)),
            "mic": pa.array(first["mic"].to_numpy().astype(np.int64)),
            "id": pa.array(first["id"].to_numpy().astype(np.int64)),
            "cnt": pa.array(cnt.to_numpy().astype(np.int64)),
            "_b": pa.array(hash_bucket(first["k"].to_numpy(),
                                       buckets=buckets))})

    def merge(g: pa.Table) -> pa.Table:
        k = g.column("k").combine_chunks().to_numpy(zero_copy_only=False)
        t = g.column("t").combine_chunks().to_numpy(zero_copy_only=False)
        w = g.column("w").combine_chunks().to_numpy(zero_copy_only=False)
        mic = g.column("mic").combine_chunks().to_numpy(
            zero_copy_only=False)
        ids = g.column("id").combine_chunks().to_numpy(
            zero_copy_only=False)
        cnt = g.column("cnt").combine_chunks().to_numpy(
            zero_copy_only=False)
        if not k.size:
            return pa.table({key: pa.array([], pa.int64()),
                             type_col: pa.array([], pa.string()),
                             "win": pa.array([], pa.int64()),
                             "keep_id": pa.array([], pa.int64()),
                             "n_in_win": pa.array([], pa.int64())})
        order = np.lexsort((ids, mic, w, t, k))
        k, t, w, ids, cnt = (k[order], t[order], w[order], ids[order],
                             cnt[order])
        new = np.concatenate(([True], (k[1:] != k[:-1]) |
                              (t[1:] != t[:-1]) | (w[1:] != w[:-1])))
        seg = np.flatnonzero(new)
        n_tot = np.add.reduceat(cnt, seg).astype(np.int64)
        return pa.table({key: pa.array(k[seg]),
                         type_col: pa.array(t[seg], pa.string()),
                         "win": pa.array(w[seg]),
                         "keep_id": pa.array(ids[seg]),
                         "n_in_win": pa.array(n_tot)})

    return (ds.map_batches(local, batch_format="pyarrow",
                           **rayenv.remote_args())
            .repartition(buckets)
            .groupby("_b")
            .map_groups(merge, batch_format="pyarrow",
                        **rayenv.remote_args()))


def interval_coverage_per_user(ds, key: str = "user_id", ts_col: str = "ts",
                               pad_s: int = 300, buckets: int = 32):
    """Per-key union length of padded event intervals ``[ts - pad_s,
    ts + pad_s)`` — merge overlapping intervals (gaps-and-islands on
    ranges) and report island count + total covered seconds.  The
    "active time" metric under an activity-halo model.

    Scale shape: ONE bucketed shuffle on the key; in-bucket a single sort
    by (key, start) + a segment-reset running maximum (np.maximum.accumulate
    with per-key rebasing) finds island boundaries for every key at once.
    Integer microsecond arithmetic end-to-end — no float time math.
    Output: (key, n_islands, covered_s)."""

    def add_bucket(t: pa.Table) -> pa.Table:
        from .joins import hash_bucket
        kv = t.column(key).to_numpy(zero_copy_only=False)
        return (t.select([key, ts_col])
                .append_column("_b",
                               pa.array(hash_bucket(kv, buckets=buckets))))

    def cover(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table({key: pa.array([], pa.int64()),
                             "n_islands": pa.array([], pa.int64()),
                             "covered_s": pa.array([], pa.int64())})
        k = g.column(key).to_numpy(zero_copy_only=False)
        mic = _epoch_micros(g.column(ts_col))
        pad = pad_s * 1_000_000
        s = mic - pad
        e = mic + pad
        order = np.lexsort((s, k))
        k, s, e = k[order], s[order], e[order]
        new_key = np.concatenate(([True], k[1:] != k[:-1]))
        # running max of e within each key segment (prefix max with
        # per-segment reset; pandas' C cummax path — an additive-shift
        # accumulate would risk int64 overflow on wide time ranges)
        seg_id = np.cumsum(new_key) - 1
        run_max = pd.Series(e).groupby(seg_id).cummax().to_numpy()
        prev_max = np.concatenate(([np.iinfo(np.int64).min],
                                   run_max[:-1]))
        new_island = new_key | (s > prev_max)
        isl_start = np.flatnonzero(new_island)
        isl_end_max = run_max[np.append(isl_start[1:], k.size) - 1]
        isl_len_us = isl_end_max - s[isl_start]
        isl_key_new = new_key[isl_start]
        kseg = np.flatnonzero(isl_key_new)
        n_isl = np.diff(np.append(kseg, isl_start.size)).astype(np.int64)
        cov_us = np.add.reduceat(isl_len_us, kseg).astype(np.int64)
        return pa.table({key: pa.array(k[isl_start[kseg]]),
                         "n_islands": pa.array(n_isl),
                         "covered_s": pa.array(cov_us // 1_000_000)})

    return (ds.map_batches(add_bucket, batch_format="pyarrow",
                           **rayenv.remote_args())
            .repartition(buckets)
            .groupby("_b")
            .map_groups(cover, batch_format="pyarrow",
                        **rayenv.remote_args()))
