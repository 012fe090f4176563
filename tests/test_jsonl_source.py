"""JSONL ingestion edge: schema-pinned parse, FAILFAST vs PERMISSIVE
quarantine, and write/read roundtrip."""

from __future__ import annotations

import pytest

from py4j.protocol import Py4JJavaError

from bikes_data_warehouse_etl_spark.sources.jsonl import (
    read_documents_jsonl,
    split_corrupt,
    write_jsonl,
)

GOOD = [
    '{"doc_id": 1, "text": "hello world", "lang": "en", "source": "s0", "n_chars": 11}',
    '{"doc_id": 2, "text": "bonjour", "lang": "fr", "source": "s1", "n_chars": 7}',
]
BAD = '{"doc_id": 3, "text": "truncated...'


def _write(tmp_path, lines):
    p = tmp_path / "docs.jsonl"
    p.write_text("\n".join(lines) + "\n")
    return str(p)


def test_failfast_raises_on_malformed(spark, tmp_path):
    path = _write(tmp_path, GOOD + [BAD])
    with pytest.raises(Py4JJavaError):
        read_documents_jsonl(spark, path, mode="FAILFAST").collect()


def test_permissive_quarantines_malformed(spark, tmp_path):
    path = _write(tmp_path, GOOD + [BAD])
    df = read_documents_jsonl(spark, path, mode="PERMISSIVE")
    with split_corrupt(df) as (good, bad):
        assert good.count() == 2
        assert {r.doc_id for r in good.collect()} == {1, 2}
        quarantined = bad.collect()
        assert len(quarantined) == 1
        assert quarantined[0][0].startswith('{"doc_id": 3')
        assert df.storageLevel.useMemory
    assert not df.storageLevel.useMemory


def test_split_corrupt_unpersists_on_exception(spark, tmp_path):
    path = _write(tmp_path, GOOD + [BAD])
    df = read_documents_jsonl(spark, path, mode="PERMISSIVE")
    with pytest.raises(RuntimeError, match="boom"):
        with split_corrupt(df) as (good, _bad):
            assert good.count() == 2
            assert df.storageLevel.useMemory
            raise RuntimeError("boom")
    assert not df.storageLevel.useMemory


def test_clean_read_and_roundtrip(spark, tmp_path):
    path = _write(tmp_path, GOOD)
    df = read_documents_jsonl(spark, path)
    rows = {r.doc_id: r for r in df.collect()}
    assert rows[1].text == "hello world" and rows[1].n_chars == 11
    out = str(tmp_path / "out_jsonl")
    write_jsonl(df, out)
    back = read_documents_jsonl(spark, out)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))
