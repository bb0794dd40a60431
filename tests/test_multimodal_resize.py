"""Resize stage: columnar target-dim math + stubbed deterministic resample."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from osm_jigsaw_spark.operators import multimodal as MM

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def media(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    return MM.attach_fake_media(docs).localCheckpoint()


def test_resize_dims_and_bytes(media):
    out = MM.resize_media(media, max_dim=32, fake=True).collect()
    assert len(out) > 0
    for r in out:
        assert r.out_width >= 1 and r.out_height >= 1
        assert r.n_bytes == r.out_width * r.out_height
        assert len(r.thumb) == r.n_bytes
        if max(r.src_width, r.src_height) <= 32:
            assert (r.out_width, r.out_height) == (r.src_width, r.src_height)
        else:
            assert max(r.out_width, r.out_height) <= 32


def test_resize_thumb_deterministic(media):
    """thumb = repeat(md5(payload))[:n] — recompute driver-side."""
    rows = MM.resize_media(media.limit(5), max_dim=16, fake=True).collect()
    payloads = {r.doc_id: bytes(r.payload) for r in media.limit(5).collect()}
    for r in rows:
        dig = hashlib.md5(payloads[r.doc_id]).digest()
        n = r.out_width * r.out_height
        assert bytes(r.thumb) == (dig * ((n + 15) // 16))[:n]


def test_resize_fake_false_raises(media):
    with pytest.raises(Exception):
        MM.resize_media(media.limit(1), fake=False).collect()
