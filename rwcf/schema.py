"""Iceberg-style schema evolution over the encoded store.

Field-id based, like Iceberg's schema spec: every column carries a stable
integer field id; the schema log (``out_dir/schema/v-NNNNN.json``, one
FULL-schema snapshot per version, committed atomically via tmp +
``os.replace`` exactly like the encode manifest) maps ids to names and
dtypes per version. Version 0 is the implicit base
:data:`rwcf.pipeline.TOKENS_SCHEMA` (ids 1-4), so every store ever
written is already at a valid version and old manifests need no rewrite.

Readers resolve a partition's PHYSICAL column names (written under the
``schema_version`` stamped in its manifest row) to the CURRENT logical
schema:

- **rename** follows the field id — old partitions keep their old section
  name on disk and surface under the new name with zero data movement;
- **add** fills partitions written before the column existed with the
  registered default, materialized per batch via ``pa.repeat``; a
  ``None`` default means NULL (Iceberg optional add) — the v2 validity
  footer (rwcf.format) gives the format a real null representation,
  where the reference has none (src/lib.rs:59-66);
- **drop** removes the field from every read; old bytes stay on disk
  until :func:`rwcf.pipeline.compact_partitions` rewrites the partitions
  under the current schema (upgrade-on-rewrite), which also materializes
  added defaults physically.

Core fields ``doc_id`` / ``tokens`` / ``n_tok`` (ids 1-3) are the store's
row identity, payload and list offsets — the mutation primitives
(delete/upsert/lookup) and the tokens list reconstruction key on their
physical names, so they cannot be renamed or dropped. Everything else
(including base ``source``) evolves freely.

The reference format is single-schema write-once (src/lib.rs:25-48);
schema evolution belongs to the mandated mutable-store scale extension.
"""

from __future__ import annotations

import copy
import json
import os

import pyarrow as pa

from . import format as fmt
from . import rayenv

#: implicit version-0 schema: the base tokens table (ids are FROZEN —
#: they anchor every rename across the store's whole history)
BASE_FIELDS = [
    {"id": 1, "name": "doc_id", "dtype": "str", "default": None},
    {"id": 2, "name": "tokens", "dtype": "tok", "default": None},
    {"id": 3, "name": "n_tok", "dtype": "i32", "default": None},
    {"id": 4, "name": "source", "dtype": "str", "default": None},
]

#: field ids that can never be renamed or dropped (see module docstring)
CORE_IDS = {1, 2, 3}

#: dtypes addable via evolution: every fmt integer width + strings
#: ("tok" is reserved for the base tokens payload)
ADDABLE_DTYPES = tuple(fmt.DTYPES)


def _sdir(out_dir: str) -> str:
    return os.path.join(out_dir, "schema")


def current_version(out_dir: str) -> int:
    """Latest committed schema version; 0 = base (no log)."""
    sdir = _sdir(out_dir)
    v = 0
    if os.path.isdir(sdir):
        for n in os.listdir(sdir):
            if n.startswith("v-") and n.endswith(".json"):
                v = max(v, int(n[2:7]))
    return v


def fields_at(out_dir: str, version: int) -> list[dict]:
    """Full field list at a version (0 = the implicit base)."""
    if version == 0:
        return copy.deepcopy(BASE_FIELDS)
    path = os.path.join(_sdir(out_dir), f"v-{version:05d}.json")
    with open(path) as f:
        return json.load(f)["fields"]


def current(out_dir: str) -> tuple[int, list[dict]]:
    v = current_version(out_dir)
    return v, fields_at(out_dir, v)


def _commit(out_dir: str, fields: list[dict], op: dict) -> dict:
    v = current_version(out_dir) + 1
    sdir = _sdir(out_dir)
    os.makedirs(sdir, exist_ok=True)
    path = os.path.join(sdir, f"v-{v:05d}.json")
    tmp = path + f".tmp{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump({"version": v, "op": op, "fields": fields}, f)
    os.replace(tmp, path)
    return {"version": v, "fields": fields}


def _arrow_type(dtype: str) -> pa.DataType:
    if dtype == "tok":
        return pa.list_(pa.int32())
    if fmt.is_string(dtype):
        return pa.string()
    return fmt.DTYPES[dtype][1]


def add_column(out_dir: str, name: str, dtype: str, default=None) -> dict:
    """Append a new field. ``default=None`` means NULL: partitions
    written before the column existed surface it as all-null (the v2
    validity footer gives the format a real null representation, so the
    Iceberg-style optional-add now works without a mandatory default)."""
    if dtype not in ADDABLE_DTYPES:
        raise ValueError(f"dtype {dtype!r} not addable; one of "
                         f"{ADDABLE_DTYPES}")
    _, fields = current(out_dir)
    if any(f["name"] == name for f in fields):
        raise ValueError(f"column {name!r} already exists")
    if default is not None:
        pa.scalar(default, _arrow_type(dtype))  # raises on mistyped default
    fid = max(f["id"] for f in fields) + 1
    fields.append({"id": fid, "name": name, "dtype": dtype,
                   "default": default})
    return _commit(out_dir, fields,
                   {"op": "add", "id": fid, "name": name, "dtype": dtype})


def rename_column(out_dir: str, old: str, new: str) -> dict:
    _, fields = current(out_dir)
    f = next((f for f in fields if f["name"] == old), None)
    if f is None:
        raise KeyError(f"no column {old!r}")
    if f["id"] in CORE_IDS:
        raise ValueError(f"{old!r} is a core field (id {f['id']}): the "
                         "mutation primitives key on its physical name")
    if any(g["name"] == new for g in fields):
        raise ValueError(f"column {new!r} already exists")
    f["name"] = new
    return _commit(out_dir, fields,
                   {"op": "rename", "id": f["id"], "from": old, "to": new})


def drop_column(out_dir: str, name: str) -> dict:
    _, fields = current(out_dir)
    f = next((f for f in fields if f["name"] == name), None)
    if f is None:
        raise KeyError(f"no column {name!r}")
    if f["id"] in CORE_IDS:
        raise ValueError(f"{name!r} is a core field (id {f['id']}) and "
                         "cannot be dropped")
    fields.remove(f)
    return _commit(out_dir, fields,
                   {"op": "drop", "id": f["id"], "name": name})


def resolution(out_dir: str, columns: list[str] | None = None):
    """(maps, want): ``want`` = requested CURRENT fields in schema order;
    ``maps[v][current_name]`` = the field's physical name at version v,
    or None if it did not exist yet. Resolved ONCE on the driver (the
    whole log is O(versions × fields) metadata) and shipped to tasks."""
    ver, fields = current(out_dir)
    if columns is not None:
        known = {f["name"] for f in fields}
        missing = set(columns) - known
        if missing:
            raise KeyError(f"unknown columns {sorted(missing)}; current "
                           f"schema has {sorted(known)}")
    want = [f for f in fields if columns is None or f["name"] in columns]
    maps = {}
    for v in range(ver + 1):
        at = {f["id"]: f["name"] for f in fields_at(out_dir, v)}
        maps[v] = {f["name"]: at.get(f["id"]) for f in want}
    return maps, want


def logical_table(row: dict, maps: dict, want: list[dict]) -> pa.Table:
    """Decode one partition (manifest row) under the current logical
    schema: physical sections resolve by field id, missing fields fill
    their default via ``pa.repeat`` (C-level constant array)."""
    from . import pipeline

    v = int(row.get("schema_version") or 0)
    m = maps[v] if v in maps else maps[max(maps)]
    phys = [p for p in (m[f["name"]] for f in want) if p is not None]
    t = pipeline.decode_partition(row, columns=phys)
    out = {}
    for f in want:
        p = m[f["name"]]
        if p is not None and p in t.column_names:
            out[f["name"]] = t.column(p)
        elif f.get("default") is None:
            # optional add: pre-existing partitions surface the field
            # as all-null (the typed constant the v2 format round-trips)
            out[f["name"]] = pa.nulls(t.num_rows, _arrow_type(f["dtype"]))
        else:
            out[f["name"]] = pa.repeat(
                pa.scalar(f["default"], _arrow_type(f["dtype"])),
                t.num_rows)
    return pa.table(out)


def _scan_batch(batch: pa.Table, maps: dict, want: list[dict]) -> pa.Table:
    from . import pipeline
    tables = [logical_table(r, maps, want)
              for r in pipeline.manifest_table_to_rows(batch)]
    if not tables:
        return pa.table({f["name"]: pa.array([], _arrow_type(f["dtype"]))
                         for f in want})
    return pa.concat_tables(tables)


def scan(out_dir: str, columns: list[str] | None = None,
         concurrency: int | None = None, task_cpus: int = 1,
         snapshot: str | None = None):
    """Schema-aware decode pipeline: like
    :func:`rwcf.pipeline.decode_job` but the output schema is the
    store's CURRENT logical schema regardless of which schema version
    each partition was physically written under. Column pruning still
    reaches the disk reads (only the resolved physical sections are
    read); delete tombstones and ``snapshot`` time travel apply exactly
    as in decode_job (both live in load_manifest)."""
    import functools

    from . import pipeline

    maps, want = resolution(out_dir, columns)
    rows = pipeline.load_manifest(out_dir, snapshot=snapshot)
    n = concurrency or pipeline._default_concurrency()
    ds = pipeline._sliced_blocks(pipeline.manifest_rows_to_table(rows),
                                 n * 2)
    fn = functools.partial(_scan_batch, maps=maps, want=want)
    cap = pipeline._stage_cap(concurrency, task_cpus)
    return ds.map_batches(fn, batch_size=1, batch_format="pyarrow",
                          num_cpus=task_cpus, concurrency=cap,
                          **rayenv.remote_args())
