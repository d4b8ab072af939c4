"""Size oracle: reproduces the reference's whole-file byte totals
(src/test_lib.rs:54-68, 119-133, 176-199) and pagination behavior
(src/test_lib.rs:229-243)."""

import numpy as np

from rwcf import oracle


def test_integer_plain_22_bytes():
    # src/test_lib.rs:49-68 — [-1,10,10,10,11,12,12,10] as i64, plain -> 22 B
    vals = np.array([-1, 10, 10, 10, 11, 12, 12, 10], dtype=np.int64)
    assert oracle.v0_encoded_size(vals, oracle.SIGNED_INT, use_rle=False) == 22


def test_string_plain_38_bytes():
    # src/test_lib.rs:114-133 — 6 short strings, plain -> 38 B
    vals = ["foo", "foo", "foo", "bar", "baz", "foo"]
    assert oracle.v0_encoded_size(vals, oracle.STRING, use_rle=False) == 38


def test_string_rle_34_bytes():
    # src/test_lib.rs:171-199 — same strings, RLE (4 runs of 5 B) -> 34 B
    vals = ["foo", "foo", "foo", "bar", "baz", "foo"]
    assert oracle.v0_encoded_size(vals, oracle.STRING, use_rle=True) == 34


def test_empty_column():
    # empty input: zero pages, footer {dt,rle,0 pages} = 3 B + 8 B size
    assert oracle.v0_encoded_size(np.empty(0, dtype=np.int64), oracle.SIGNED_INT, False) == 11


def test_multipage_1m_constant():
    # src/test_lib.rs:229-243 — 1M of -1i64 plain must span >1 page
    vals = np.full(1_000_000, -1, dtype=np.int64)
    pages, total = oracle.plan_column(vals, oracle.SIGNED_INT, use_rle=False)
    assert len(pages) > 1
    # each full page: 2048 one-byte values (post-append check hits exactly at 2048)
    assert pages[0].values_count == 2048
    assert pages[0].encoded_values_count == 2048
    assert sum(p.values_count for p in pages) == 1_000_000
    # with RLE it collapses to one run: tuple = 1 (value -1) + 5 (runlen varint 1M)
    pages_r, total_r = oracle.plan_column(vals, oracle.SIGNED_INT, use_rle=True)
    assert len(pages_r) == 1
    assert pages_r[0].values_count == 1_000_000
    assert pages_r[0].encoded_values_count == 1
    assert total_r == 6 + 3 + (1 + 5 + 1) + 8  # data + footer fields + size
    assert oracle.reference_footprint(vals, oracle.SIGNED_INT) == total_r
    assert total_r < total


def test_run_lengths_reference_semantics():
    # src/test_rle.rs:27-61 — maximal adjacent runs, repeats later are new runs
    data = ["repeated-3"] * 3 + ["no-repeat"] + ["repeated-2"] * 2 + ["repeated-3"] * 3
    starts, lens = oracle.run_lengths(data)
    assert list(lens) == [3, 1, 2, 3]
    assert [data[i] for i in starts] == ["repeated-3", "no-repeat", "repeated-2", "repeated-3"]
    # src/test_rle.rs:22-25 — empty in, empty out
    s, l = oracle.run_lengths([])
    assert s.size == 0 and l.size == 0


def test_rle_tuple_size_pin():
    # src/test_bincode.rs:33-39 — Values{value:1u64, run_length:255} -> 4 bytes
    w = oracle.value_widths(np.array([1], dtype=np.uint64), oracle.UNSIGNED_INT)
    from rwcf import varint
    rl = varint.uvarint_width(np.array([255], dtype=np.uint64))
    assert int(w[0] + rl[0]) == 4


def test_overshoot_single_huge_value():
    # a single value larger than the page target still fits alone in a page
    # (post-append size check, src/encode.rs:84-89)
    big = "x" * 5000
    pages, _ = oracle.plan_column([big, "a", "b"], oracle.STRING, use_rle=False)
    assert pages[0].encoded_values_count == 1
    assert pages[0].byte_length == 3 + 5000  # varint len (3) + payload
