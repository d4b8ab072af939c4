"""Partial-column UPDATE: rewrite ONE column section per matched
partition, byte-copying every other section verbatim.

``UPDATE store SET col = value WHERE pred`` on a columnar paged store does
not need to touch the token payload at all: the target column re-encodes
through the codec selector, the untouched sections (including the
corpus-dominating ``tokens`` stream) copy as raw transported bytes —
their page layouts, transport frames and crcs are self-contained, so the
copy is IO-bound, never decode/encode-bound.  File-level lakehouse
formats (Iceberg/Delta) rewrite whole data files for an update; section
granularity is what the rwcf single-file-per-partition layout
(pipeline.encode_partition's ``page_1..page_n | footer | size`` sections,
extending the reference's column-file layout, src/encode.rs:8-40) buys.

Semantics and safety:

- Only row-aligned scalar columns update (``tokens``/``n_tok`` would
  desync the list layout; the bucket key of a bucket-encoded store would
  break the storage-partitioned-join contract — both raise).
- Partition pruning first: zone maps on the predicate column skip
  non-matching partitions without opening them; partitions with matches
  commit a NEW partition file + manifest row carrying ``replaces`` (the
  same single atomic os.replace visibility flip as compaction), so a
  crash at any point leaves the store readable and the update
  exactly-once.  Untouched partitions are not rewritten.
- Delete tombstones carry over untouched (they are positional; the
  rewrite preserves row positions exactly).  Snapshots taken before the
  update keep time-traveling to the old rows; CDC between snapshots
  classifies the rows as updates.
- Deterministic + idempotent: the new pid hashes (old pid, set_col,
  predicate, value), so re-running a crashed update skips committed
  partitions and converges.
"""

from __future__ import annotations

import json
import os
import time
import zlib

import numpy as np
import pyarrow as pa

from . import format as fmt
from . import rayenv, selector
from .pipeline import (EncodeConfig, _compress_frames, _sliced_blocks,
                       _stage_cap, _default_concurrency, decode_partition,
                       load_manifest, manifest_rows_to_table,
                       manifest_table_to_rows)


def _pred_mask(vals: pa.Array, eq=None, between=None, isin=None):
    import pyarrow.compute as pc
    if eq is not None:
        return pc.equal(vals, eq)
    if between is not None:
        lo, hi = between
        return pc.and_(pc.greater_equal(vals, lo), pc.less_equal(vals, hi))
    if isin is not None:
        return pc.is_in(vals, value_set=pa.array(isin, vals.type))
    raise ValueError("one of eq / between / isin required")


def _zone_admits(row: dict, column: str, eq=None, between=None, isin=None):
    st = (row.get("stats") or {}).get(column)
    if not st or st.get("min") is None:
        return True
    lo, hi = st["min"], st["max"]
    if eq is not None:
        return lo <= eq <= hi
    if between is not None:
        return not (between[1] < lo or between[0] > hi)
    if isin is not None:
        return any(lo <= v <= hi for v in isin)
    return True


def update_where(out_dir: str, set_col: str, set_value,
                 pred_col: str, eq=None, between=None, isin=None,
                 cfg: EncodeConfig | None = None,
                 concurrency: int | None = None) -> dict:
    """UPDATE ``set_col`` = ``set_value`` WHERE ``pred_col`` matches.

    ``set_value`` is a constant, or a callable ``fn(old: pa.Array,
    mask: np.ndarray) -> pa.Array`` returning the full new column (only
    masked positions may differ).  Returns a summary dict
    (partitions_scanned / rewritten / rows_matched / bytes_copied /
    bytes_reencoded)."""
    import ray.data as rd

    if set_col in ("tokens", "n_tok"):
        raise ValueError(f"cannot update {set_col!r}: token list layout "
                         "is position-dependent (delete + re-append instead)")
    bspec_path = os.path.join(out_dir, "bucketspec.json")
    if os.path.exists(bspec_path):
        with open(bspec_path) as f:
            if json.load(f)["key"] == set_col:
                raise ValueError(f"cannot update bucket key {set_col!r} of "
                                 "a bucket-encoded store (would break the "
                                 "storage-partitioned-join layout)")
    if cfg is None:
        cfg = EncodeConfig(out_dir=out_dir)

    rows = load_manifest(out_dir)
    admitted = [r for r in rows
                if any(c["column"] == set_col for c in r["columns"])
                and _zone_admits(r, pred_col, eq, between, isin)]
    # deterministic update tag -> idempotent resume
    tag = zlib.crc32(json.dumps(
        [set_col, pred_col, repr(eq), repr(between), repr(isin),
         repr(set_value) if not callable(set_value)
         else getattr(set_value, "__name__", "fn")],
        sort_keys=False).encode()) & 0xFFFFFFFF
    utag = f"{tag:08x}"

    def rewrite(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        out = []
        for row in manifest_table_to_rows(batch):
            raw = dict(row)
            raw.pop("deleted_rows", None)  # positions must stay aligned
            dec = decode_partition(raw, columns=[pred_col, set_col])
            mask_arr = _pred_mask(dec.column(pred_col).combine_chunks(),
                                  eq, between, isin)
            mask = mask_arr.to_numpy(zero_copy_only=False)
            mask = np.asarray(mask, dtype=bool)
            # SQL UPDATE semantics: tombstoned (deleted) rows are not
            # live — they neither count as matches nor change value
            dr = row.get("deleted_rows")
            if dr:
                mask[np.asarray(dr, dtype=np.int64)] = False
            n_match = int(mask.sum())
            if n_match == 0:
                out.append({**row, "_matched": 0, "_rewrote": False})
                continue
            new_pid = f"{row['pid']}-u{utag}"
            mpath = os.path.join(cfg.manifest_dir, f"{new_pid}.json")
            if os.path.exists(mpath):  # resume: already committed
                with open(mpath) as f:
                    r = json.load(f)
                r["_matched"] = n_match
                r["_rewrote"] = False
                out.append(r)
                continue
            old = dec.column(set_col).combine_chunks()
            if callable(set_value):
                new = set_value(old, mask)
            else:
                new = pc.if_else(pa.array(mask), pa.scalar(
                    set_value, old.type), old)
            if pc.all(pc.equal(new, old)).as_py():
                # value-level idempotence: a re-run whose matched rows
                # already hold the target value rewrites nothing
                out.append({**row, "_matched": n_match,
                            "_rewrote": False})
                continue
            out.append(_rewrite_partition(row, set_col, new, new_pid,
                                          cfg, n_match))
        for r in out:
            r.setdefault("_matched", 0)
            r.setdefault("_rewrote", True)
        t = manifest_rows_to_table([{k: v for k, v in r.items()
                                     if k not in ("_matched", "_rewrote")}
                                    for r in out])
        t = t.append_column("_matched", pa.array(
            [r["_matched"] for r in out], pa.int64()))
        return t.append_column("_rewrote", pa.array(
            [bool(r["_rewrote"]) for r in out]))

    summary = {"partitions_scanned": len(rows),
               "partitions_admitted": len(admitted),
               "partitions_rewritten": 0, "rows_matched": 0}
    if admitted:
        n = _stage_cap(concurrency, 1)
        ds = _sliced_blocks(manifest_rows_to_table(admitted),
                            min(len(admitted), n * 2))
        res = ds.map_batches(rewrite, batch_size=1, batch_format="pyarrow",
                             num_cpus=1, concurrency=min(n, len(admitted)),
                             **rayenv.remote_args()).to_pandas()
        summary["rows_matched"] = int(res["_matched"].sum())
        summary["partitions_rewritten"] = int(res["_rewrote"].sum())
    return summary


def _rewrite_partition(row: dict, set_col: str, new_vals: pa.Array,
                       new_pid: str, cfg: EncodeConfig,
                       n_match: int) -> dict:
    """Build the successor partition: re-encode ONE column, byte-copy the
    rest, commit file-first manifest-row-last (single atomic visibility
    flip carrying ``replaces``)."""
    import pyarrow.compute as pc
    t0 = time.perf_counter()
    # chunk for the selector: strings -> (lengths, payload), ints -> np
    old_cm = next(c for c in row["columns"] if c["column"] == set_col)
    if pa.types.is_string(new_vals.type) or \
            pa.types.is_large_string(new_vals.type):
        la = new_vals.cast(pa.large_utf8())
        lens = pc.binary_length(la).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        buf = la.buffers()[2]
        off = la.buffers()[1]
        offs = np.frombuffer(off, dtype=np.int64)[
            la.offset: la.offset + len(la) + 1]
        payload = (np.frombuffer(buf, dtype=np.uint8)[offs[0]:offs[-1]]
                   if buf is not None else np.empty(0, np.uint8))
        chunk, dtype = (lens, payload), "str"
        dec_b = int(payload.size) + 8 * len(lens)
    else:
        np_t = fmt.DTYPES[old_cm["dtype"]][2]
        arr = new_vals.to_numpy(zero_copy_only=False).astype(np_t)
        chunk, dtype = arr, old_cm["dtype"]
        dec_b = int(arr.nbytes)

    enc, choice = selector.encode_auto(chunk, dtype, cfg.page_target,
                                       cfg.codecs)
    blob = fmt.write_column_file(enc)
    raw_length = len(blob)
    frames = None
    transport = next(c for c in row["columns"]
                     if c["column"] == set_col).get("transport")
    if transport == "zstd-page":
        blob, frames = _compress_frames(blob, enc)
    elif transport:
        blob = pa.Codec(transport, compression_level=1).compress(
            blob, asbytes=True)

    sections: list[bytes] = []
    col_meta = []
    offset = 0
    bytes_copied = 0
    with open(row["file"], "rb") as f:
        for cm in row["columns"]:
            if cm["column"] == set_col:
                nm = dict(cm)
                nm.update({"codec": enc.codec, "offset": offset,
                           "length": len(blob), "raw_length": raw_length,
                           "frames": frames, "crc": zlib.crc32(blob),
                           "estimate": choice.estimate,
                           "decoded_bytes": dec_b,
                           "page_stats": fmt.page_value_stats(
                               chunk, dtype, enc.pages)})
                sections.append(blob)
                offset += len(blob)
                col_meta.append(nm)
            else:
                f.seek(cm["offset"])
                sec = f.read(cm["length"])
                if cm.get("crc") is not None and \
                        zlib.crc32(sec) != cm["crc"]:
                    raise IOError(
                        f"checksum mismatch in {row['pid']}:{cm['column']}")
                nm = dict(cm)
                nm["offset"] = offset
                sections.append(sec)
                bytes_copied += len(sec)
                offset += len(sec)
                col_meta.append(nm)
        # bloom sidecars: copy untouched columns' bytes, rebuild set_col's
        blooms = {}
        bloom_bytes = 0
        boff = offset
        for name, bm in (row.get("bloom") or {}).items():
            if name == set_col:
                from . import bloom as _bloom
                bits = max(1, (bm["m_bits"] + bm["n_keys"] - 1)
                           // max(bm["n_keys"], 1))
                bf = _bloom.build(new_vals, bits)
                rawb = bf["data"].tobytes()
                blooms[name] = {"offset": boff, "length": len(rawb),
                                "m_bits": bf["m_bits"], "k": bf["k"],
                                "n_keys": bf["n_keys"],
                                "crc": zlib.crc32(rawb)}
                sections.append(rawb)
            else:
                f.seek(bm["offset"])
                rawb = f.read(bm["length"])
                blooms[name] = dict(bm, offset=boff)
                sections.append(rawb)
            boff += len(rawb)
            bloom_bytes += len(rawb)

    os.makedirs(cfg.parts_dir, exist_ok=True)
    os.makedirs(cfg.manifest_dir, exist_ok=True)
    fpath = os.path.join(cfg.parts_dir, f"{new_pid}.rwcf")
    tmp = fpath + f".tmp{os.getpid()}"
    with open(tmp, "wb") as f:
        for s in sections:
            f.write(s)
    os.replace(tmp, fpath)

    stats = dict(row.get("stats") or {})
    mm = pc.min_max(new_vals)
    stats[set_col] = {"min": mm["min"].as_py(), "max": mm["max"].as_py()}
    old_lin = row.get("lineage") or {}
    lineage = {"update_of": row["pid"], "set_col": set_col,
               "rows_matched": n_match}
    # bucket lineage rides along so bucketed stores stay joinable
    lineage.update({k: old_lin[k] for k in
                    ("bucket_key", "bucket", "n_buckets")
                    if k in old_lin})
    new_row = dict(row)
    new_row.pop("deleted_rows", None)  # tombstones travel as a sidecar
    new_row.update({
        "pid": new_pid, "file": fpath,
        "encoded_bytes": offset,
        "decoded_bytes": row["decoded_bytes"]
        - old_cm["decoded_bytes"] + dec_b,
        "columns": col_meta, "stats": stats, "lineage": lineage,
        "codec_by_column": {c["column"]: c["codec"] for c in col_meta},
        "encode_seconds": round(time.perf_counter() - t0, 4),
        "status": "committed",
        "replaces": [row["pid"]],
    })
    if blooms:
        new_row["bloom"] = blooms
        new_row["bloom_bytes"] = bloom_bytes
    # carried tombstones commit BEFORE the row: a sidecar for a pid with
    # no manifest row is inert, so any crash point leaves a valid store
    dr = row.get("deleted_rows")
    if dr:
        spath = os.path.join(cfg.manifest_dir, f"{new_pid}.del.json")
        stmp = spath + f".tmp{os.getpid()}"
        with open(stmp, "w") as f:
            json.dump({"pid": new_pid, "deleted_rows": list(dr)}, f)
        os.replace(stmp, spath)
    mpath = os.path.join(cfg.manifest_dir, f"{new_pid}.json")
    mtmp = mpath + f".tmp{os.getpid()}"
    with open(mtmp, "w") as f:
        json.dump(new_row, f)
    os.replace(mtmp, mpath)  # commit point
    new_row["_matched"] = n_match
    new_row["_bytes_copied"] = bytes_copied
    return new_row
