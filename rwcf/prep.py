"""Composed corpus-preparation pipeline: the end-to-end curation flow a
training-data user runs before encoding — language gate, quality window,
exact deduplication — expressed as ONE streaming Ray Data pipeline.

Scale shape: the filters are pure ``map_batches`` stages (prune EARLY —
rejected rows never reach the shuffle); the only all-to-all is the exact
dedup's content-hash bucket routing, and only surviving rows' metadata
columns leave the group (text is dropped at the output projection). Every
predicate is integer/equality arithmetic so the whole pipeline has an
exact ANSI-SQL oracle (``prep_corpus`` query).

Reference scope note: the reference engine has no filter/dedup operators
(SURVEY.md §2.2); this composition is the brief's training-data-pipeline
extension, built from the same primitives as dedup.py / textops.py.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from . import rayenv, textops
from .dedup import _shuffle_buckets
from .joins import hash_bucket

__all__ = ["prep_corpus"]


def prep_corpus(ds, text_col: str = "text", id_col: str = "doc_id",
                langs: tuple[str, ...] = ("en", "es"),
                min_words: int = 20, max_words: int = 2000,
                keep_cols: tuple[str, ...] = ("source", "lang")):
    """Curate a document corpus: keep docs whose ``lang`` is allowed and
    whose whitespace word count lies in ``[min_words, max_words]``, then
    exact-deduplicate by text (min-``id_col`` row survives). Returns a
    Dataset of ``(id_col, *keep_cols, n_words)`` — curated metadata, no
    text payload.

    Stage order is the 100-TB design: cheap vectorized predicates first
    (each batch shrinks before anything moves), then one bucketed shuffle
    keyed on the text fingerprint for the dedup. Grouping inside a bucket
    is by the REAL text (the hash only routes), so fingerprint collisions
    cannot merge distinct documents."""
    langs = tuple(langs)
    buckets = _shuffle_buckets()

    def filt(t: pa.Table) -> pa.Table:
        text = t.column(text_col)
        n_words = pc.cast(
            pc.count_substring_regex(text, textops.WORD_PATTERN), pa.int64())
        t = t.append_column("n_words", n_words)
        keep = pc.and_(
            pc.and_(pc.greater_equal(n_words, min_words),
                    pc.less_equal(n_words, max_words)),
            pc.is_in(t.column("lang"), value_set=pa.array(langs)))
        t = t.filter(keep)
        fp = textops.fingerprint_batch(t, text_col)
        b = hash_bucket(fp.column("fingerprint").to_numpy(), buckets=buckets)
        return t.append_column("_b", pa.array(b))

    out_cols = [id_col, *keep_cols, "n_words"]

    def survivors(g: pa.Table) -> pa.Table:
        df = g.to_pandas()
        # min-id row per distinct text, vectorized: idxmin per group
        win = df.loc[df.groupby(text_col, sort=False)[id_col].idxmin()]
        return pa.Table.from_pandas(win[out_cols], preserve_index=False)

    return (ds.map_batches(filt, batch_format="pyarrow",
                           **rayenv.remote_args())
            .repartition(buckets)
            .groupby("_b")
            .map_groups(survivors, batch_format="pyarrow",
                        **rayenv.remote_args()))
