"""[EXT] Multimodal column plumbing (opaque binary media + typed
metadata), per the project blueprint.

Images/audio/video ride as ``binary`` columns with a metadata struct;
decode / feature-extract run as Arrow-batched ``mapInPandas`` stages —
the real Spark-side shape (schema, batch iteration, partition
parallelism) with the codec itself STUBBED: this container ships no
image/audio libraries, so ``decode_media`` raises NotImplementedError
unless ``fake=True``, which substitutes a deterministic fake decoder
(byte-derived) used by tests and the declared query.

At scale: binary payloads dominate partition bytes — size
``spark.sql.files.maxPartitionBytes`` for media, keep metadata in
separate columns so pruning-only queries never touch the blobs, and let
``mapInPandas`` stream batches (never collect a partition of blobs into
one pandas frame).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("media", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("kind", T.StringType()),
                    T.StructField("declared_bytes", T.LongType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("digest", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Fixture adapter: treat each document's UTF-8 bytes as an opaque
    media payload (the fixtures ship no real binary table)."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode(F.col("text"), "UTF-8").alias("media"),
        F.struct(
            F.lit("image/fake").alias("kind"),
            F.col("n_chars").alias("declared_bytes"),
        ).alias("meta"),
    )


def _fake_decode(payload: bytes) -> tuple[str, int, int]:
    """Deterministic stand-in for a real codec: digest + fake dims
    derived from content bytes."""
    import hashlib

    digest = hashlib.md5(payload).hexdigest()
    width = 64 + (payload[0] if payload else 0) % 64
    height = 64 + (payload[-1] if payload else 0) % 64
    return digest, width, height


def decode_media(media: DataFrame, fake: bool = False) -> DataFrame:
    """Decode/feature-extract stage: Arrow-batched ``mapInPandas``.

    With a real codec library installed, replace ``_fake_decode`` with
    e.g. PIL decode + resize; the Spark-side contract (schema in/out,
    batch iteration) is already the production shape.
    """
    if not fake:
        raise NotImplementedError(
            "no media codec libraries in this environment; "
            "pass fake=True for the deterministic stub decoder"
        )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            decoded = [_fake_decode(bytes(b)) for b in pdf["media"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": [m["kind"] for m in pdf["meta"]],
                    "n_bytes": [len(bytes(b)) for b in pdf["media"]],
                    "digest": [d[0] for d in decoded],
                    "width": [d[1] for d in decoded],
                    "height": [d[2] for d in decoded],
                }
            )

    return media.mapInPandas(batches, schema=FEATURE_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_digest", T.StringType()),
    ]
)

N_FRAMES = 4


def sample_frames(
    media: DataFrame, n_frames: int = N_FRAMES, fake: bool = False
) -> DataFrame:
    """Frame-sampling stage (video shape): one input row expands to
    ``n_frames`` output rows — the row-amplifying mapInPandas pattern
    (a real decoder would seek to evenly-spaced timestamps; the stub
    slices the payload into n byte-ranges and digests each).

    At scale the output is repartitioned by the downstream key after
    sampling, never before (amplify late); blobs stay in the input
    partition and only the small frame features cross the shuffle.
    """
    if not fake:
        raise NotImplementedError(
            "no media codec libraries in this environment; "
            "pass fake=True for the deterministic stub sampler"
        )
    import hashlib

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, digests = [], [], []
            for mid, blob in zip(pdf["media_id"], pdf["media"]):
                b = bytes(blob)
                step = max(1, len(b) // n_frames)
                for i in range(n_frames):
                    ids.append(mid)
                    idxs.append(i)
                    digests.append(
                        hashlib.md5(b[i * step : (i + 1) * step]).hexdigest()
                    )
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "frame_digest": digests}
            )

    return media.mapInPandas(batches, schema=FRAME_SCHEMA)


def media_frame_samples_query(docs: DataFrame) -> DataFrame:
    """Declared query: frame-sampling over the fake media table
    (rows-only; deterministic byte-slice digests)."""
    return sample_frames(media_from_documents(docs), fake=True)


def media_features_query(docs: DataFrame) -> DataFrame:
    """Declared query: documents -> fake media -> decoded feature table.

    Rows-only check (mapInPandas is not SQL-expressible), but fully
    deterministic: digest/width/height are pure functions of the bytes.
    """
    return decode_media(media_from_documents(docs), fake=True)


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("src_width", T.IntegerType()),
        T.StructField("src_height", T.IntegerType()),
        T.StructField("out_width", T.IntegerType()),
        T.StructField("out_height", T.IntegerType()),
        T.StructField("resized", T.BinaryType()),
    ]
)

#: resize bounding box (longest side fits; aspect ratio preserved).
RESIZE_BOX = 32


def resize_media(
    media: DataFrame, box: int = RESIZE_BOX, fake: bool = False
) -> DataFrame:
    """Resize stage: binary in -> binary out through Arrow-batched
    ``mapInPandas`` — the full blob-transform contract (a real codec
    decodes, resamples to fit ``box``, re-encodes; the stub derives
    source dims from content bytes, computes the aspect-preserving
    target dims exactly as the real op would, and emits a
    deterministic ``out_width*out_height``-byte payload).

    The binary OUTPUT column is the point: downstream stages (feature
    extraction, packing into training shards) consume resized blobs,
    so the plumbing must round-trip binary through Arrow in both
    directions — that is what the unit test pins.
    """
    if not fake:
        raise NotImplementedError(
            "no media codec libraries in this environment; "
            "pass fake=True for the deterministic stub resizer"
        )
    import hashlib

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {k: [] for k in RESIZE_SCHEMA.fieldNames()}
            for mid, blob in zip(pdf["media_id"], pdf["media"]):
                b = bytes(blob)
                _, w, h = _fake_decode(b)
                scale = box / max(w, h)
                ow = max(1, round(w * scale))
                oh = max(1, round(h * scale))
                seed = hashlib.md5(b + f":{ow}x{oh}".encode()).digest()
                out = (seed * (ow * oh // len(seed) + 1))[: ow * oh]
                rows["media_id"].append(mid)
                rows["src_width"].append(w)
                rows["src_height"].append(h)
                rows["out_width"].append(ow)
                rows["out_height"].append(oh)
                rows["resized"].append(out)
            yield pd.DataFrame(rows)

    return media.mapInPandas(batches, schema=RESIZE_SCHEMA)


AUDIO_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("window_idx", T.IntegerType()),
        T.StructField("n_samples", T.IntegerType()),
        T.StructField("rms_milli", T.LongType()),
        T.StructField("peak", T.IntegerType()),
    ]
)

#: audio windowing: samples per analysis window.
AUDIO_WINDOW = 256


def audio_windows(
    media: DataFrame, window: int = AUDIO_WINDOW
) -> DataFrame:
    """Audio feature extraction: treat the payload as 8-bit PCM and
    emit per-window RMS energy and peak — REAL computation (bytes ARE
    the samples; no codec library involved), vectorized with numpy
    inside Arrow batches. One row amplifies to ceil(n_bytes/window)
    rows of small features; blobs never cross the shuffle.

    RMS surfaces as integral milli-units (floor), keeping the output
    integer-exact — the same determinism rule the z-score/stateful
    operators follow.
    """
    import math

    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {k: [] for k in AUDIO_SCHEMA.fieldNames()}
            for mid, blob in zip(pdf["media_id"], pdf["media"]):
                samples = np.frombuffer(bytes(blob), dtype=np.uint8)
                n_win = math.ceil(len(samples) / window) if len(samples) else 0
                for i in range(n_win):
                    chunk = samples[i * window : (i + 1) * window]
                    sq = chunk.astype(np.float64) ** 2
                    rms = math.sqrt(float(sq.mean()))
                    rows["media_id"].append(mid)
                    rows["window_idx"].append(i)
                    rows["n_samples"].append(len(chunk))
                    rows["rms_milli"].append(int(rms * 1000))
                    rows["peak"].append(int(chunk.max()))
            yield pd.DataFrame(rows)

    return media.mapInPandas(batches, schema=AUDIO_SCHEMA)


def media_resized_query(docs: DataFrame) -> DataFrame:
    """Declared query: aspect-preserving resize with binary output
    (rows-only; deterministic stub codec)."""
    r = resize_media(media_from_documents(docs), fake=True)
    # surface a digest instead of raw bytes so the driver's value
    # model (no binary comparison) stays simple; the binary column
    # itself is pinned by the unit test.
    return r.select(
        "media_id",
        "src_width",
        "src_height",
        "out_width",
        "out_height",
        F.md5("resized").alias("resized_md5"),
        F.length("resized").alias("n_out_bytes"),
    )


def media_audio_windows_query(docs: DataFrame) -> DataFrame:
    """Declared query: 8-bit-PCM windowed RMS/peak features
    (rows-only; integer-exact, no codec dependency)."""
    return audio_windows(media_from_documents(docs))


# ---------------------------------------------------------------------------
# Perceptual-hash (aHash) image near-dup: the multimodal member of the
# dedup family. The decode is the documented stub (fake=True treats
# payload bytes as pixels); the hash + banded Hamming join are REAL —
# swapping in a true image decoder changes only the pixel source.
# ---------------------------------------------------------------------------

PHASH_BANDS = 4
PHASH_BAND_WIDTH = 16
PHASH_BAND_MASK = (1 << PHASH_BAND_WIDTH) - 1
# 4 bands guarantee a clean band only for <=3 flipped bits (4 flips can
# land one per band, leaving none clean) — same bound as SimHash's
# SIMHASH_HAMMING_MAX. Raise PHASH_BANDS to 5 before raising this.
PHASH_HAMMING_MAX = 3


def ahash_bytes(payload: bytes) -> int:
    """Reference aHash: cycle-resize the byte stream to a 64x64 grid,
    8x8 block-mean, threshold at the global mean, pack 64 bits into a
    signed int64 (row-major, bit 63 = first block). Pure numpy — the
    same code runs per Arrow batch below."""
    import numpy as np

    px = np.frombuffer(payload or b"\x00", dtype=np.uint8)
    grid = (
        np.resize(px.astype(np.float64), 4096)
        .reshape(8, 8, 8, 8)
        .mean(axis=(1, 3))
    )
    bits = (grid > grid.mean()).flatten()
    out = 0
    for bit in bits:
        out = (out << 1) | int(bit)
    # wrap to signed 64-bit (Spark LongType)
    return out - (1 << 64) if out >= (1 << 63) else out


def perceptual_hashes(media: DataFrame, fake: bool = False) -> DataFrame:
    """(media_id, phash): Arrow-batched aHash over decoded pixels.

    ``fake=True`` uses the byte-stream stand-in decoder (this container
    ships no image codecs — same gate as ``decode_media``); a real
    deployment decodes to luma pixels in the same batch loop. Map-only:
    blobs never leave their scan partition; only the 8-byte hash rows
    ever shuffle."""
    if not fake:
        raise NotImplementedError(
            "real image decode requires an image codec; "
            "pass fake=True for the deterministic byte-stream decoder"
        )
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("phash", T.LongType()),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "phash": [
                        ahash_bytes(bytes(p)) for p in pdf["media"]
                    ],
                }
            )

    return media.select("media_id", "media").mapInPandas(batches, schema)


def phash_near_dup(
    media: DataFrame,
    fake: bool = False,
    max_hamming: int = PHASH_HAMMING_MAX,
) -> DataFrame:
    """Perceptual near-dup pairs: 16-bit band buckets over the 64-bit
    aHash (a pair within Hamming<=3 must agree on >=1 of 4 bands by
    pigeonhole — 3 flipped bits cannot dirty all 4 bands; 4 flips CAN
    land one per band, so the guarantee stops at 3), exact Hamming
    verify via bit_count(xor) — the image twin of
    ``dedup.simhash_pairs``, JVM-side after the hash stage. Bucket
    keys partition the candidate join; no all-pairs."""
    sigs = perceptual_hashes(media, fake=fake)
    return phash_band_pairs(sigs, max_hamming=max_hamming)


def phash_band_pairs(
    sigs: DataFrame, max_hamming: int = PHASH_HAMMING_MAX
) -> DataFrame:
    """Band-bucket candidate join + exact Hamming verify over a
    (media_id, phash) signature table. Split out of ``phash_near_dup``
    so the pigeonhole boundary (a pair surfaces iff some band is
    clean) is unit-testable on crafted hashes."""
    bands = sigs.select(
        "media_id",
        "phash",
        F.explode(
            F.expr(
                f"transform(sequence(0, {PHASH_BANDS - 1}),"
                " b -> struct(b AS band,"
                f"   shiftright(phash, b * {PHASH_BAND_WIDTH})"
                f" & {PHASH_BAND_MASK} AS key))"
            )
        ).alias("bk"),
    ).select("media_id", "phash", "bk.band", "bk.key")
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.media_id") < F.col("b.media_id")),
        )
        .select(
            F.col("a.media_id").alias("m1"),
            F.col("b.media_id").alias("m2"),
            F.expr("bit_count(a.phash ^ b.phash)").alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


def media_phash_dedup_query(docs: DataFrame) -> DataFrame:
    """Declared query: perceptual near-dup pairs over the documents-as
    -media fixture (exact text copies collapse to Hamming 0)."""
    return phash_near_dup(media_from_documents(docs), fake=True)


# ---------------------------------------------------------------------------
# video scene-change detection (frame-difference boundaries)
# ---------------------------------------------------------------------------

SCENE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("ahash", T.LongType()),
    ]
)
SCENE_N_FRAMES = 8
SCENE_HAMMING_MIN = 18


def scene_changes(
    media: DataFrame,
    n_frames: int = SCENE_N_FRAMES,
    fake: bool = False,
) -> DataFrame:
    """Shot/scene-boundary detection — the video member of the
    multimodal family: sample ``n_frames`` per clip, perceptual-hash
    each frame (same aHash as image dedup), and flag boundaries where
    consecutive frames' Hamming distance jumps past the threshold.
    The Arrow-batched frame hashing is the real production shape
    (decode + hash stay data-local per input partition; only the
    8-byte hashes cross any shuffle); the codec itself is the
    environment-blocked stub, as documented for the family — frame
    slicing is deterministic fake bytes, everything downstream of the
    bytes is real and parity-tested against a pure-Python reference.

    The boundary pass is a per-clip lag window (shuffle keyed on
    media_id, W frames per clip — bounded). Output per interior
    frame: media_id, frame_idx, hamming, is_boundary.
    """
    if not fake:
        raise NotImplementedError(
            "no media codec libraries in this environment; "
            "pass fake=True for the deterministic stub sampler"
        )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, hashes = [], [], []
            for mid, blob in zip(pdf["media_id"], pdf["media"]):
                b = bytes(blob)
                step = max(1, len(b) // n_frames)
                for i in range(n_frames):
                    ids.append(mid)
                    idxs.append(i)
                    hashes.append(ahash_bytes(b[i * step : (i + 1) * step]))
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "ahash": hashes}
            )

    frames = media.mapInPandas(batches, schema=SCENE_SCHEMA)
    w = Window.partitionBy("media_id").orderBy("frame_idx")
    prev = F.lag("ahash").over(w)
    hamming = F.bit_count(F.col("ahash").bitwiseXOR(prev))
    return (
        frames.select(
            "media_id",
            "frame_idx",
            hamming.alias("hamming"),
        )
        .filter(F.col("hamming").isNotNull())
        .select(
            "media_id",
            "frame_idx",
            "hamming",
            (F.col("hamming") >= SCENE_HAMMING_MIN).alias("is_boundary"),
        )
    )


def media_scene_changes_query(docs: DataFrame) -> DataFrame:
    """Declared query: frame-difference scene boundaries over the
    documents-as-media fixture."""
    return scene_changes(media_from_documents(docs), fake=True)


# ---------------------------------------------------------------------------
# REAL binary-header sniffing (PNG IHDR dimensions, no codec needed)
# ---------------------------------------------------------------------------

#: PNG signature + IHDR length/type prefix (hex, uppercase).
PNG_MAGIC_HEX = "89504E470D0A1A0A"
_PNG_IHDR_PREFIX = PNG_MAGIC_HEX + "0000000D49484452"


def media_sniff_dims(docs: DataFrame) -> DataFrame:
    """REAL (not stubbed) binary processing: build a valid PNG
    signature + IHDR prefix as a true BINARY column (dimensions
    derived from doc_id), then SNIFF the width/height back out of the
    raw bytes — big-endian 32-bit fields at byte offsets 17/21 —
    exactly the scan-speed header peek a corpus profiler runs on
    billions of images without ever invoking a codec. The round trip
    (built dims == sniffed dims, magic verified) makes the query
    self-proving, and the whole parse is hex/substring arithmetic
    both engines replay bit-for-bit.

    Map-only over the scan: zero shuffles at any corpus size.

    Output: doc_id, width, height, sniffed_w, sniffed_h, magic_ok,
    ok.
    """
    w = (64 + F.col("doc_id") % 512).cast("bigint")
    h = (64 + (F.col("doc_id") * 7) % 512).cast("bigint")
    payload_hex = F.concat(
        F.lit(_PNG_IHDR_PREFIX),
        F.lpad(F.hex(w), 8, "0"),
        F.lpad(F.hex(h), 8, "0"),
        F.lit("0806000000"),
    )
    built = docs.select(
        "doc_id",
        w.alias("width"),
        h.alias("height"),
        F.unhex(payload_hex).alias("payload"),
    )
    hx = F.hex(F.col("payload"))
    sniff_w = F.conv(F.substring(hx, 33, 8), 16, 10).cast("bigint")
    sniff_h = F.conv(F.substring(hx, 41, 8), 16, 10).cast("bigint")
    return built.select(
        "doc_id",
        "width",
        "height",
        sniff_w.alias("sniffed_w"),
        sniff_h.alias("sniffed_h"),
        (F.substring(hx, 1, 16) == PNG_MAGIC_HEX)
        .cast("int")
        .alias("magic_ok"),
        (
            (sniff_w == F.col("width")) & (sniff_h == F.col("height"))
        )
        .cast("int")
        .alias("ok"),
    )


ORACLE_SNIFF_DIMS = f"""
sn_built AS (
  SELECT doc_id,
         CAST(64 + doc_id % 512 AS BIGINT) AS width,
         CAST(64 + (doc_id * 7) % 512 AS BIGINT) AS height,
         unhex('{_PNG_IHDR_PREFIX}'
               || lpad(hex(64 + doc_id % 512), 8, '0')
               || lpad(hex(64 + (doc_id * 7) % 512), 8, '0')
               || '0806000000') AS payload
  FROM documents
),
media_sniff_dims AS (
  SELECT doc_id, width, height,
         CAST(('0x' || substr(hex(payload), 33, 8)) AS BIGINT)
           AS sniffed_w,
         CAST(('0x' || substr(hex(payload), 41, 8)) AS BIGINT)
           AS sniffed_h,
         CAST(substr(hex(payload), 1, 16) = '{PNG_MAGIC_HEX}' AS INT)
           AS magic_ok,
         CAST(CAST(('0x' || substr(hex(payload), 33, 8)) AS BIGINT)
                = width
              AND CAST(('0x' || substr(hex(payload), 41, 8)) AS BIGINT)
                = height AS INT) AS ok
  FROM sn_built
)
"""


# ---------------------------------------------------------------------------
# REAL WAV/RIFF header parsing (little-endian fields)
# ---------------------------------------------------------------------------

#: 'RIFF' and 'WAVE'+'fmt ' markers (hex, uppercase).
RIFF_MAGIC_HEX = "52494646"
_WAVE_FMT_HEX = "57415645666D7420100000000100"


def media_wav_meta(docs: DataFrame) -> DataFrame:
    """REAL audio-metadata parsing: build a valid RIFF/WAVE fmt-chunk
    header as a BINARY column (sample rate / channel count derived
    from doc_id) and parse the LITTLE-endian fields back from the raw
    bytes — the byte-swap recomposition (LE u32 = reversed byte pairs
    of the hex) is the half of binary sniffing the big-endian PNG op
    doesn't cover. Self-proving round trip; map-only at any scale.

    Output: doc_id, sample_rate, channels, sniffed_rate,
    sniffed_channels, riff_ok, ok.
    """
    rate = (F.lit(8000) + (F.col("doc_id") % 5) * 8000).cast("bigint")
    ch = (1 + F.col("doc_id") % 2).cast("bigint")

    def le32(col):  # little-endian 32-bit hex of an int column
        be = F.lpad(F.hex(col), 8, "0")
        return F.concat(
            F.substring(be, 7, 2),
            F.substring(be, 5, 2),
            F.substring(be, 3, 2),
            F.substring(be, 1, 2),
        )

    def le16(col):
        be = F.lpad(F.hex(col), 4, "0")
        return F.concat(F.substring(be, 3, 2), F.substring(be, 1, 2))

    payload_hex = F.concat(
        F.lit(RIFF_MAGIC_HEX),
        F.lit("24000000"),  # chunk size (fixed toy value)
        F.lit(_WAVE_FMT_HEX),
        le16(ch),
        le32(rate),
    )
    built = docs.select(
        "doc_id",
        rate.alias("sample_rate"),
        ch.alias("channels"),
        F.unhex(payload_hex).alias("payload"),
    )
    hx = F.hex(F.col("payload"))

    def rd_le32(start):  # parse LE u32 at 1-based BYTE offset
        p = (start - 1) * 2 + 1
        return F.conv(
            F.concat(
                F.substring(hx, p + 6, 2),
                F.substring(hx, p + 4, 2),
                F.substring(hx, p + 2, 2),
                F.substring(hx, p, 2),
            ),
            16,
            10,
        ).cast("bigint")

    def rd_le16(start):
        p = (start - 1) * 2 + 1
        return F.conv(
            F.concat(
                F.substring(hx, p + 2, 2), F.substring(hx, p, 2)
            ),
            16,
            10,
        ).cast("bigint")

    sr = rd_le32(25)
    sc = rd_le16(23)
    return built.select(
        "doc_id",
        "sample_rate",
        "channels",
        sr.alias("sniffed_rate"),
        sc.alias("sniffed_channels"),
        (F.substring(hx, 1, 8) == RIFF_MAGIC_HEX)
        .cast("int")
        .alias("riff_ok"),
        (
            (sr == F.col("sample_rate")) & (sc == F.col("channels"))
        )
        .cast("int")
        .alias("ok"),
    )


def _le32_sql(expr: str) -> str:
    be = f"lpad(hex({expr}), 8, '0')"
    return (
        f"substr({be}, 7, 2) || substr({be}, 5, 2)"
        f" || substr({be}, 3, 2) || substr({be}, 1, 2)"
    )


def _le16_sql(expr: str) -> str:
    be = f"lpad(hex({expr}), 4, '0')"
    return f"substr({be}, 3, 2) || substr({be}, 1, 2)"


ORACLE_WAV_META = f"""
wv_built AS (
  SELECT doc_id,
         CAST(8000 + (doc_id % 5) * 8000 AS BIGINT) AS sample_rate,
         CAST(1 + doc_id % 2 AS BIGINT) AS channels,
         unhex('{RIFF_MAGIC_HEX}' || '24000000' || '{_WAVE_FMT_HEX}'
               || {_le16_sql('1 + doc_id % 2')}
               || {_le32_sql('8000 + (doc_id % 5) * 8000')})
           AS payload
  FROM documents
),
wv_hex AS (
  SELECT doc_id, sample_rate, channels, hex(payload) AS hx
  FROM wv_built
),
media_wav_meta AS (
  SELECT doc_id, sample_rate, channels,
         CAST(('0x' || substr(hx, 55, 2) || substr(hx, 53, 2)
               || substr(hx, 51, 2) || substr(hx, 49, 2)) AS BIGINT)
           AS sniffed_rate,
         CAST(('0x' || substr(hx, 47, 2) || substr(hx, 45, 2))
              AS BIGINT) AS sniffed_channels,
         CAST(substr(hx, 1, 8) = '{RIFF_MAGIC_HEX}' AS INT)
           AS riff_ok,
         CAST(CAST(('0x' || substr(hx, 55, 2) || substr(hx, 53, 2)
               || substr(hx, 51, 2) || substr(hx, 49, 2)) AS BIGINT)
                = sample_rate
              AND CAST(('0x' || substr(hx, 47, 2) || substr(hx, 45, 2))
                       AS BIGINT) = channels AS INT) AS ok
  FROM wv_hex
)
"""
