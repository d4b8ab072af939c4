"""Multimodal binary-column plumbing (decode kernels stubbed, Ray plumbing
real)."""

import numpy as np
import pyarrow as pa

from rwcf import multimodal


def docs(texts):
    return pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                     "text": pa.array(texts, pa.string())})


def test_blob_layout():
    t = docs(["hello", "", "x" * 500])
    b = multimodal.make_blob_batch(t)
    blobs = b.column("blob").to_pylist()
    assert blobs[0][:4] == b"RWIM"
    assert blobs[0][12:] == b"hello"
    assert len(blobs[1]) == 12
    w = int.from_bytes(blobs[2][4:8], "little")
    h = int.from_bytes(blobs[2][8:12], "little")
    assert w == 500 % 199 + 1 and h == 500 // 199 + 1


def test_decode_stage_metadata():
    t = docs(["abc", "q" * 250])
    meta = multimodal.ImageDecodeStage()(multimodal.make_blob_batch(t)).to_pandas()
    assert meta["width"].tolist() == [3 % 199 + 1, 250 % 199 + 1]
    assert meta["height"].tolist() == [1, 2]
    assert meta["n_bytes"].tolist() == [15, 262]


def test_decode_stage_rejects_bad_magic():
    t = docs(["abc"])
    b = multimodal.make_blob_batch(t)
    raw = bytearray(b.column("blob").to_pylist()[0])
    raw[0] = 0
    bad = pa.table({"doc_id": pa.array([0], pa.int64()),
                    "blob": pa.array([bytes(raw)], pa.large_binary())})
    import pytest
    with pytest.raises(ValueError):
        multimodal.ImageDecodeStage()(bad)


def test_frame_sample_stage():
    text = "".join(chr(65 + (i % 26)) for i in range(600))
    t = docs([text, "ab"])
    fr = multimodal.FrameSampleStage(stride=64, frames=8)(
        multimodal.make_blob_batch(t)).to_pandas()
    f0 = fr["frames"].iloc[0]
    assert len(f0) == 8
    expect = [ord(text[i * 64]) for i in range(8)]
    assert list(f0) == expect
    # short payload: frames beyond length are zero
    f1 = fr["frames"].iloc[1]
    assert f1[0] == ord("a") and sum(f1[1:]) == 0


def test_ray_image_metadata_pipeline(ray_session):
    meta = multimodal.image_metadata_ds("/root/testdata/sf0.001",
                                        concurrency=2).to_pandas()
    assert len(meta) == 500
    assert (meta["n_bytes"] >= 12).all()


def test_image_resize_stage_blob_roundtrip(ray_session):
    # the resized blob must itself be a valid RWIM: decoding it yields
    # the resized dims, and the body keeps every 16th byte
    import numpy as np
    import pyarrow as pa

    from rwcf.multimodal import (ImageDecodeStage, ImageResizeStage,
                                 make_blob_batch)
    text = "x" * 500
    t = pa.table({"doc_id": pa.array([7], pa.int64()),
                  "text": pa.array([text])})
    blobs = make_blob_batch(t)
    resized = ImageResizeStage(factor=4)(blobs)
    assert resized["width"].to_pylist() == [(500 % 199 + 1 + 3) // 4]
    assert resized["height"].to_pylist() == [(500 // 199 + 1 + 3) // 4]
    assert resized["n_bytes"].to_pylist() == [(500 + 15) // 16 + 12]
    # decode the resized blob with the standard decode stage
    dec = ImageDecodeStage()
    meta = dec(resized.select(["doc_id", "blob"]))
    assert meta["width"].to_pylist() == resized["width"].to_pylist()
    assert meta["height"].to_pylist() == resized["height"].to_pylist()


def test_image_resize_ds_oracle(ray_session):
    import duckdb

    from rwcf.multimodal import image_resize_ds
    sf = "/root/testdata/sf0.001"
    # concurrency=2 at the fixture's 4 cpus: 4 actors would starve the
    # upstream read/blob tasks (same sizing as the metadata test)
    out = image_resize_ds(sf, factor=4, concurrency=2).to_pandas() \
        .sort_values("doc_id", ignore_index=True)
    exp = duckdb.sql(
        f"SELECT doc_id, (strlen(text) % 199 + 1 + 3) // 4 AS w, "
        f"(strlen(text) // 199 + 1 + 3) // 4 AS h, "
        f"(strlen(text) + 15) // 16 + 12 AS b "
        f"FROM read_parquet('{sf}/documents.parquet') ORDER BY 1").df()
    assert out["doc_id"].tolist() == exp["doc_id"].astype("int64").tolist()
    assert out["width"].tolist() == exp["w"].astype("int64").tolist()
    assert out["height"].tolist() == exp["h"].astype("int64").tolist()
    assert out["n_bytes"].tolist() == exp["b"].astype("int64").tolist()
