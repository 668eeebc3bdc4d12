"""Multimodal plumbing tests: mapInPandas schema/batch contracts with
the deterministic stub codec (no media libraries in this container)."""

from __future__ import annotations

import pytest

from big_data_instacart_market_basket_analysis_spark.operators import (
    multimodal as mm,
)
from tests.conftest import SF_ORACLE


@pytest.fixture(scope="module")
def media(spark):
    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
    return mm.media_from_documents(docs)


def test_decode_requires_explicit_fake(media):
    with pytest.raises(NotImplementedError):
        mm.decode_media(media).count()
    with pytest.raises(NotImplementedError):
        mm.sample_frames(media).count()


def test_decode_schema_and_determinism(media):
    a = mm.decode_media(media, fake=True)
    assert [f.name for f in a.schema.fields] == [
        "media_id", "kind", "n_bytes", "digest", "width", "height"
    ]
    rows_a = {r["media_id"]: r["digest"] for r in a.collect()}
    rows_b = {
        r["media_id"]: r["digest"]
        for r in mm.decode_media(media, fake=True).collect()
    }
    assert rows_a == rows_b  # pure function of the bytes


def test_frame_sampling_expansion(media):
    n_media = media.count()
    frames = mm.sample_frames(media, fake=True)
    assert frames.count() == n_media * mm.N_FRAMES
    one = frames.filter(frames.media_id == 0).collect()
    assert sorted(r["frame_idx"] for r in one) == list(range(mm.N_FRAMES))
