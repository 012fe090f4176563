"""binaryFile ingestion: directory of opaque media files → MEDIA_SCHEMA
rows → the multimodal decode stage (fake decoder; plumbing is real)."""

from __future__ import annotations

import os

import pytest

from bikes_data_warehouse_etl_spark.operators.multimodal import decode_media
from bikes_data_warehouse_etl_spark.sources.binary import (
    media_from_binary_files,
    read_binary_dir,
)


@pytest.fixture()
def media_dir(tmp_path):
    payloads = {
        "a.img": b"\x00\x01" * 500,
        "b.img": b"payload-b" * 33,
        "c.txt": b"not media",
    }
    for name, data in payloads.items():
        (tmp_path / name).write_bytes(data)
    return str(tmp_path), payloads


def test_read_binary_dir_schema_and_glob(spark, media_dir):
    path, payloads = media_dir
    df = read_binary_dir(spark, path, glob="*.img")
    rows = {os.path.basename(r["path"]): r for r in df.collect()}
    # glob pruned the .txt during listing
    assert set(rows) == {"a.img", "b.img"}
    for name, r in rows.items():
        assert bytes(r["content"]) == payloads[name]
        assert r["length"] == len(payloads[name])
    assert [f.name for f in df.schema.fields] == [
        "path",
        "modificationTime",
        "length",
        "content",
    ]


def test_media_adapter_feeds_decode(spark, media_dir):
    path, payloads = media_dir
    media = media_from_binary_files(spark, path, "image", glob="*.img")
    decoded = decode_media(media).collect()
    assert len(decoded) == 2
    by_bytes = {r["n_bytes"] for r in decoded}
    assert by_bytes == {len(payloads["a.img"]), len(payloads["b.img"])}
    for r in decoded:
        # fake decoder contract: plausible dims + 16-bin feature vector
        assert 64 <= r["width"] <= 255 and 64 <= r["height"] <= 255
        assert len(r["features"]) == 16
        assert abs(sum(r["features"]) - 1.0) < 1e-9


def test_media_ids_deterministic(spark, media_dir):
    path, _ = media_dir
    a = {r["media_id"] for r in media_from_binary_files(spark, path, "image").collect()}
    b = {r["media_id"] for r in media_from_binary_files(spark, path, "image").collect()}
    assert a == b and len(a) == 3
