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


def test_resize_round_trips_binary_and_preserves_aspect(spark):
    """Binary->binary Arrow round-trip: output payload is exactly
    out_width*out_height bytes, deterministic, and the target dims
    fit the box preserving aspect ratio."""
    import hashlib

    from big_data_instacart_market_basket_analysis_spark.operators import (
        multimodal as mm,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    media = mm.media_from_documents(docs.limit(20))
    rows = mm.resize_media(media, fake=True).collect()
    src = {r["media_id"]: bytes(r["media"]) for r in media.collect()}
    assert rows
    for r in rows:
        assert max(r["out_width"], r["out_height"]) <= mm.RESIZE_BOX
        assert len(bytes(r["resized"])) == r["out_width"] * r["out_height"]
        seed = hashlib.md5(
            src[r["media_id"]]
            + f":{r['out_width']}x{r['out_height']}".encode()
        ).digest()
        want = (seed * (r["out_width"] * r["out_height"] // len(seed) + 1))[
            : r["out_width"] * r["out_height"]
        ]
        assert bytes(r["resized"]) == want


def test_audio_windows_match_python_reference(spark):
    """Windowed RMS/peak equal a pure-Python reference over the same
    bytes (integer-exact contract)."""
    import math

    from big_data_instacart_market_basket_analysis_spark.operators import (
        multimodal as mm,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    media = mm.media_from_documents(docs.limit(10))
    got = {
        (r["media_id"], r["window_idx"]): r
        for r in mm.audio_windows(media).collect()
    }
    assert got
    for r in media.collect():
        b = bytes(r["media"])
        w = mm.AUDIO_WINDOW
        for i in range(math.ceil(len(b) / w)):
            chunk = b[i * w : (i + 1) * w]
            rms = math.sqrt(sum(x * x for x in chunk) / len(chunk))
            row = got[(r["media_id"], i)]
            assert row["n_samples"] == len(chunk)
            assert row["rms_milli"] == int(rms * 1000)
            assert row["peak"] == max(chunk)


def test_ahash_reference_and_phash_dedup(spark):
    """aHash parity: the Spark stage reproduces the Python reference
    per payload; exact-copy payloads pair at Hamming 0 and unrelated
    payloads do not pair within the threshold."""
    from big_data_instacart_market_basket_analysis_spark.operators import (
        multimodal as mm,
    )

    rows = [
        (1, "the quick brown fox jumps over the lazy dog " * 8),
        (2, "the quick brown fox jumps over the lazy dog " * 8),
        (3, "zzz completely different content qqq 12345 " * 9),
    ]
    docs = spark.createDataFrame(
        [(i, t, len(t)) for i, t in rows], ["doc_id", "text", "n_chars"]
    )
    media = mm.media_from_documents(docs)

    got = {
        r.media_id: r.phash
        for r in mm.perceptual_hashes(media, fake=True).collect()
    }
    for mid, text in rows:
        assert got[mid] == mm.ahash_bytes(text.encode("utf-8")), mid

    pairs = mm.phash_near_dup(media, fake=True).collect()
    assert [(p.m1, p.m2, p.hamming) for p in pairs] == [(1, 2, 0)]


def test_phash_band_pigeonhole_boundary(spark):
    """The 4-band scheme guarantees detection only up to Hamming 3:
    3 flipped bits leave >=1 clean 16-bit band (pair surfaces), while
    4 bits flipped one-per-band dirty every band and the pair is
    missed — which is exactly why PHASH_HAMMING_MAX is 3."""
    from big_data_instacart_market_basket_analysis_spark.operators import (
        multimodal as mm,
    )

    base = 0x0123_4567_89AB_CDEF
    # one flipped bit in each of bands 0,1,2 (bits 0, 16, 32)
    ham3 = base ^ (1 | (1 << 16) | (1 << 32))
    # one flipped bit in every band (bits 0, 16, 32, 48) — no clean band
    ham4 = base ^ (1 | (1 << 16) | (1 << 32) | (1 << 48))

    def signed64(v: int) -> int:
        return v - (1 << 64) if v >= (1 << 63) else v

    sigs = spark.createDataFrame(
        [(1, signed64(base)), (2, signed64(ham3)), (3, signed64(ham4))],
        "media_id long, phash long",
    )
    got = {
        (r.m1, r.m2): r.hamming
        for r in mm.phash_band_pairs(sigs, max_hamming=4).collect()
    }
    assert got.get((1, 2)) == 3  # clean band exists -> detected
    assert (1, 3) not in got  # all 4 bands dirty -> candidate never forms
    # and the default threshold reflects the guarantee
    assert mm.PHASH_HAMMING_MAX == 3


def test_phash_real_decode_is_gated(spark):
    from big_data_instacart_market_basket_analysis_spark.operators import (
        multimodal as mm,
    )
    import pytest as _pt

    docs = spark.createDataFrame(
        [(1, "x", 1)], ["doc_id", "text", "n_chars"]
    )
    with _pt.raises(NotImplementedError):
        mm.perceptual_hashes(mm.media_from_documents(docs))


def test_scene_changes_matches_python_reference(spark):
    """Frame hashes and Hamming jumps must equal the pure-Python
    reference on a crafted two-scene clip (first half constant bytes,
    second half a different constant -> one big jump mid-clip)."""
    from big_data_instacart_market_basket_analysis_spark.operators import (
        multimodal as mm,
    )

    blob = bytes([10] * 4096) + bytes([200] * 4096)
    media = spark.createDataFrame(
        [(1, blob, "video/fake")],
        "media_id long, media binary, mime string",
    )
    rows = {
        r["frame_idx"]: (r["hamming"], r["is_boundary"])
        for r in mm.scene_changes(media, fake=True).collect()
    }
    # python reference
    step = len(blob) // mm.SCENE_N_FRAMES
    hashes = [
        mm.ahash_bytes(blob[i * step : (i + 1) * step])
        for i in range(mm.SCENE_N_FRAMES)
    ]
    for i in range(1, mm.SCENE_N_FRAMES):
        ham = bin((hashes[i] ^ hashes[i - 1]) & ((1 << 64) - 1)).count("1")
        assert rows[i][0] == ham, (i, rows[i], ham)
        assert rows[i][1] == (ham >= mm.SCENE_HAMMING_MIN)
