"""Multimodal column operators: opaque binary content + typed metadata
(SURVEY.md §2.C; BASELINE.json north star "multimodal columns").

Design for 100 TB: an asset is one row with

    content: binary                 -- the raw bytes (image/audio/video)
    meta:    struct<kind:string, content_type:string, n_bytes:long,
                    width:int, height:int, n_frames:int, sample_rate:int>

Binary stays opaque to Catalyst (no codec on the JVM); all byte-level work
runs in Arrow-batched ``mapInPandas`` stages so each task processes a
columnar batch of blobs with numpy — never one Python call per row, never
a driver-side collect. Partitioning is whatever the upstream scan gives;
every operator here is a narrow map (zero shuffles), so asset pipelines
chain at scan speed.

Codec policy: byte-level analytics (sizes, hashes, entropy, chunk/frame
slicing) are REAL and tested. Image decode resolves per blob: PIL when
installed (all formats), else the dependency-free numpy codecs in
``operators.codecs`` (24-bit BMP; binary PPM/PGM; GIF; baseline
TIFF incl. LZW/Deflate/PackBits; PNG at every legal
depth/color-type/interlace combination via stdlib zlib inflate +
scanline unfiltering; GIF via variable-width LZW; JPEG sequential and
progressive via canonical Huffman + IDCT) — a
REAL pixel decode pinned against seeded gradient fixtures in
tests/test_multimodal.py. Audio decodes for real too (RIFF/WAVE PCM via
``codecs.decode_wav``). Only arithmetic-coded / lossless / hierarchical
JPEG and compressed audio (MP3/AAC/...) keep the honest
``NotImplementedError`` gate; ``fake_decode`` remains the deterministic
double for plumbing tests.
"""

from __future__ import annotations

import hashlib
import math
import zlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

try:  # real codec, if the environment has one (not in this container)
    from PIL import Image as _PIL_Image  # noqa: F401

    _HAS_PIL = True
except ImportError:
    _HAS_PIL = False

META_SCHEMA = StructType(
    [
        StructField("kind", StringType()),
        StructField("content_type", StringType()),
        StructField("n_bytes", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
        StructField("sample_rate", IntegerType()),
    ]
)

ASSET_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("content", BinaryType()),
        StructField("meta", META_SCHEMA),
    ]
)


# --------------------------------------------------------------------------- #
# ingestion: wrap any (id, bytes) source into the asset schema
# --------------------------------------------------------------------------- #


def as_assets(
    df: DataFrame,
    id_col: str,
    binary_col: str,
    *,
    kind: str = "blob",
    content_type: str = "application/octet-stream",
) -> DataFrame:
    """Normalize an (id, binary) DataFrame into the asset schema. Metadata
    that is derivable JVM-side (n_bytes) is filled by Catalyst; codec-only
    fields stay NULL until a decode stage fills them. Narrow projection —
    no shuffle, no Python."""
    return df.select(
        F.col(id_col).cast("long").alias("asset_id"),
        F.col(binary_col).cast("binary").alias("content"),
        F.struct(
            F.lit(kind).alias("kind"),
            F.lit(content_type).alias("content_type"),
            F.length(binary_col).cast("long").alias("n_bytes"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("n_frames"),
            F.lit(None).cast("int").alias("sample_rate"),
        ).alias("meta"),
    )


def documents_as_assets(documents: DataFrame) -> DataFrame:
    """Deterministic binary fixture: UTF-8-encode the documents table's
    text into the asset schema (the container ships no media files; any
    real corpus would land here as parquet binary columns instead)."""
    return as_assets(
        documents.select("doc_id", F.encode("text", "UTF-8").alias("blob")),
        "doc_id",
        "blob",
        kind="text",
        content_type="text/plain; charset=utf-8",
    )


# --------------------------------------------------------------------------- #
# byte-level feature extraction (REAL, vectorized, no codec needed)
# --------------------------------------------------------------------------- #

_FEATURE_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("crc32", LongType()),
        StructField("md5", StringType()),
        StructField("entropy_bits", DoubleType()),
        StructField("ascii_ratio", DoubleType()),
        StructField("null_byte_ratio", DoubleType()),
    ]
)


def extract_features(assets: DataFrame) -> DataFrame:
    """Per-asset byte statistics: size, CRC32, Shannon entropy (bits/byte),
    printable-ASCII ratio, NUL ratio. Arrow-batched ``mapInPandas``; numpy
    histogram per blob, one Python invocation per ~10k-row batch. Narrow
    map — composes with any upstream filter/partitioning untouched."""
    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for aid, blob in zip(pdf["asset_id"], pdf["content"]):
                b = bytes(blob) if blob is not None else b""
                n = len(b)
                if n:
                    arr = np.frombuffer(b, dtype=np.uint8)
                    counts = np.bincount(arr, minlength=256)
                    p = counts[counts > 0] / n
                    entropy = float(-(p * np.log2(p)).sum())
                    ascii_ratio = float(((arr >= 0x20) & (arr < 0x7F)).mean())
                    nul_ratio = float((arr == 0).mean())
                else:
                    entropy, ascii_ratio, nul_ratio = 0.0, 0.0, 0.0
                rows.append(
                    (
                        int(aid),
                        n,
                        zlib.crc32(b),
                        hashlib.md5(b).hexdigest(),
                        entropy,
                        ascii_ratio,
                        nul_ratio,
                    )
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in _FEATURE_SCHEMA.fields]
            )

    return assets.mapInPandas(batches, schema=_FEATURE_SCHEMA)


# --------------------------------------------------------------------------- #
# frame sampling (REAL slicing logic over fixed-stride frame buffers)
# --------------------------------------------------------------------------- #

_FRAME_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("frame_index", IntegerType()),
        StructField("frame", BinaryType()),
    ]
)


def sample_frames(
    assets: DataFrame, *, frame_size: int, every: int = 1, limit: int | None = None
) -> DataFrame:
    """Explode fixed-stride frame buffers (raw video/audio blocks) into one
    row per sampled frame: frames ``0, every, 2*every, ...`` up to
    ``limit``. A trailing partial frame is dropped. One output row per
    frame — the canonical shape for a downstream per-frame featurizer.
    Narrow map; output cardinality is data-dependent, so let AQE coalesce
    after any later shuffle."""
    if frame_size <= 0 or every <= 0:
        raise ValueError("frame_size and every must be positive")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out_ids, out_idx, out_frames = [], [], []
            for aid, blob in zip(pdf["asset_id"], pdf["content"]):
                b = bytes(blob) if blob is not None else b""
                n_frames = len(b) // frame_size
                taken = 0
                for i in range(0, n_frames, every):
                    if limit is not None and taken >= limit:
                        break
                    out_ids.append(int(aid))
                    out_idx.append(i)
                    out_frames.append(b[i * frame_size : (i + 1) * frame_size])
                    taken += 1
            yield pd.DataFrame(
                {"asset_id": out_ids, "frame_index": out_idx, "frame": out_frames}
            )

    return assets.mapInPandas(batches, schema=_FRAME_SCHEMA)


def chunk_content(assets: DataFrame, *, chunk_size: int) -> DataFrame:
    """Split each blob into <=chunk_size pieces JVM-side (no Python at
    all): substring over binary via sequence+transform, then explode.
    The scale path for shipping huge blobs through size-bounded batches."""
    if chunk_size <= 0:
        raise ValueError("chunk_size must be positive")
    n_chunks = F.ceil(F.length("content") / F.lit(chunk_size)).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.col("content").substr(
            i * chunk_size + 1, F.lit(chunk_size)
        ),
    )
    return assets.select(
        "asset_id",
        F.posexplode(chunks).alias("chunk_index", "chunk"),
    )


# --------------------------------------------------------------------------- #
# decode / resize — STUB (no codec libs in this container)
# --------------------------------------------------------------------------- #

_DECODE_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("mean_luma", DoubleType()),
    ]
)


def fake_decode_dims(blob: bytes) -> tuple[int, int]:
    """Deterministic test double for image dimensions: derived from the
    CRC so every engine/test run agrees. Replaced by a real codec when
    one is installed."""
    crc = zlib.crc32(blob)
    return 16 + crc % 1024, 16 + (crc >> 10) % 1024


def decode_images(assets: DataFrame, *, use_fake: bool = False) -> DataFrame:
    """Decode image blobs to (width, height, mean_luma).

    Codec resolution per blob: PIL when installed (all formats), else
    the dependency-free numpy codecs (BMP, PPM/PGM, full PNG, GIF,
    TIFF, sequential+progressive Huffman JPEG — operators.codecs), else
    the honest ``NotImplementedError`` (arithmetic/lossless/hierarchical
    JPEG genuinely needs a codec library). ``use_fake=True`` keeps the
    deterministic stub for plumbing tests. One Arrow-batched
    ``mapInPandas`` stage, narrow map, zero shuffles."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from icerunner_spark.operators.codecs import (
            decode_image_bytes,
            sniff_format,
        )

        for pdf in it:
            rows = []
            for aid, blob in zip(pdf["asset_id"], pdf["content"]):
                b = bytes(blob) if blob is not None else b""
                if use_fake:
                    w, h = fake_decode_dims(b)
                    arr = np.frombuffer(b, dtype=np.uint8)
                    luma = float(arr.mean()) if len(arr) else 0.0
                elif _HAS_PIL:  # pragma: no cover - no PIL in this container
                    import io

                    img = _PIL_Image.open(io.BytesIO(b)).convert("L")
                    w, h = img.size
                    luma = float(np.asarray(img).mean())
                elif sniff_format(b) is not None:
                    w, h, larr = decode_image_bytes(b)
                    luma = float(larr.mean()) if larr.size else 0.0
                else:
                    raise NotImplementedError(
                        "decoding this blob needs a codec library (PIL): "
                        "only BMP/PPM/PGM/PNG/GIF/TIFF/Huffman-JPEG decode without one"
                    )
                rows.append((int(aid), w, h, luma))
            yield pd.DataFrame(
                rows, columns=[f.name for f in _DECODE_SCHEMA.fields]
            )

    return assets.mapInPandas(batches, schema=_DECODE_SCHEMA)


def resize_images(
    assets: DataFrame, *, width: int, height: int, use_fake: bool = False
) -> DataFrame:
    """Resize image blobs to (width, height) grayscale BMP.

    Real path (no PIL needed for BMP/PPM/PGM/8-bit-PNG inputs): decode
    luma with the pure codecs, nearest-neighbor resample with numpy
    index maps, re-encode as 24-bit gray BMP — so the output blob
    round-trips through :func:`decode_images`. The fake path emits a
    deterministic ``width*height``-byte tiled buffer for plumbing
    tests. JPEG inputs without PIL raise per blob (honest gate)."""
    out_schema = StructType(
        [
            StructField("asset_id", LongType()),
            StructField("content", BinaryType()),
            StructField("width", IntegerType()),
            StructField("height", IntegerType()),
        ]
    )
    target = width * height

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from icerunner_spark.operators.codecs import (
            decode_image_bytes,
            encode_gray_bmp,
            sniff_format,
        )

        for pdf in it:
            rows = []
            for aid, blob in zip(pdf["asset_id"], pdf["content"]):
                b = bytes(blob) if blob is not None else b"\x00"
                if use_fake:
                    reps = math.ceil(target / max(len(b), 1))
                    rows.append((int(aid), (b * reps)[:target], width, height))
                    continue
                if _HAS_PIL:  # pragma: no cover - no PIL in this container
                    import io

                    img = _PIL_Image.open(io.BytesIO(b)).convert("L")
                    img = img.resize((width, height), _PIL_Image.NEAREST)
                    luma = np.asarray(img, dtype=np.uint8)
                elif sniff_format(b) is not None:
                    w0, h0, larr = decode_image_bytes(b)
                    # nearest-neighbor index maps (the PIL NEAREST grid)
                    ys = (np.arange(height) * h0) // height
                    xs = (np.arange(width) * w0) // width
                    luma = larr[ys][:, xs]
                else:
                    raise NotImplementedError(
                        "resizing this blob needs a codec library (PIL): "
                        "only BMP/PPM/PGM/PNG/GIF/TIFF/Huffman-JPEG decode without one"
                    )
                rows.append((int(aid), encode_gray_bmp(luma), width, height))
            yield pd.DataFrame(
                rows, columns=[f.name for f in out_schema.fields]
            )

    return assets.mapInPandas(batches, schema=out_schema)


_DHASH_SCHEMA = StructType(
    [StructField("id", LongType()), StructField("sig", LongType())]
)


def dhash_images(assets: DataFrame, *, use_fake: bool = False) -> DataFrame:
    """64-bit perceptual difference hash (dHash) per image asset.

    The standard near-dup signal for image corpora: decode luma, resample
    to a 9x8 grid (the same nearest-neighbor index maps as
    :func:`resize_images`, so the grid is engine-replayable integer
    arithmetic), and set bit ``y*8+x`` iff ``luma[y][x+1] > luma[y][x]``.
    Images that differ by re-encoding, mild brightness shifts, or small
    crops land within a few bits of each other; pair them with
    ``operators.dedup.hamming_neardup_pairs`` (banded pigeonhole join —
    never all-pairs) exactly like simhash text dedup.

    One Arrow-batched ``mapInPandas`` stage; blobs never shuffle — only
    the (id, 64-bit sig) frame moves, so at 100 TB the exchange is 16
    bytes per image. Returns (``id``, ``sig``) ready for the banded
    join. The fake path hashes the CRC-derived byte tiling for plumbing
    tests."""
    hw, hh = 8, 8  # 8x8 bits from a (hw+1) x hh luma grid

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from icerunner_spark.operators.codecs import (
            decode_image_bytes,
            sniff_format,
        )

        weights = (1 << np.arange(hw * hh, dtype=np.uint64)).reshape(hh, hw)

        for pdf in it:
            rows = []
            for aid, blob in zip(pdf["asset_id"], pdf["content"]):
                b = bytes(blob) if blob is not None else b"\x00"
                if use_fake:
                    w0, h0 = fake_decode_dims(b)
                    arr = np.frombuffer(b, dtype=np.uint8)
                    reps = -(-(w0 * h0) // max(len(arr), 1))
                    larr = np.tile(arr, reps)[: w0 * h0].reshape(h0, w0)
                elif _HAS_PIL:  # pragma: no cover - no PIL in this container
                    import io

                    img = _PIL_Image.open(io.BytesIO(b)).convert("L")
                    w0, h0 = img.size
                    larr = np.asarray(img, dtype=np.uint8)
                elif sniff_format(b) is not None:
                    w0, h0, larr = decode_image_bytes(b)
                else:
                    raise NotImplementedError(
                        "hashing this blob needs a codec library (PIL): "
                        "only BMP/PPM/PGM/PNG/GIF/TIFF/Huffman-JPEG decode without one"
                    )
                ys = (np.arange(hh) * h0) // hh
                xs = (np.arange(hw + 1) * w0) // (hw + 1)
                g = larr[ys][:, xs].astype(np.int64)
                bits = (g[:, 1:] > g[:, :-1]).astype(np.uint64)
                v = int((bits * weights).sum())
                if v >= 1 << 63:  # wrap to the signed long Spark stores
                    v -= 1 << 64
                rows.append((int(aid), v))
            yield pd.DataFrame(
                rows, columns=[f.name for f in _DHASH_SCHEMA.fields]
            )

    return assets.mapInPandas(batches, schema=_DHASH_SCHEMA)


# --------------------------------------------------------------------------- #
# audio decode (REAL for RIFF/WAVE PCM — operators.codecs.decode_wav)
# --------------------------------------------------------------------------- #

_AUDIO_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_channels", IntegerType()),
        StructField("n_frames", LongType()),
        StructField("duration_s", DoubleType()),
        StructField("rms", DoubleType()),
        StructField("peak", DoubleType()),
    ]
)


def decode_audio(assets: DataFrame) -> DataFrame:
    """Decode audio blobs to (sample_rate, n_channels, n_frames,
    duration_s, rms, peak). RIFF/WAVE PCM (8/16/32-bit int, 32-bit
    float) decodes for real via the dependency-free codec; compressed
    audio (MP3/AAC/...) raises the honest ``NotImplementedError`` per
    blob — same policy as image decode. One Arrow-batched
    ``mapInPandas`` stage, narrow map, zero shuffles; rms/peak are
    numpy reductions over the sample matrix, computed on [-1, 1]
    normalized amplitudes."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from icerunner_spark.operators.codecs import decode_wav, sniff_format

        for pdf in it:
            rows = []
            for aid, blob in zip(pdf["asset_id"], pdf["content"]):
                b = bytes(blob) if blob is not None else b""
                if sniff_format(b) != "wav":
                    raise NotImplementedError(
                        "decoding this audio blob needs a codec library: "
                        "only RIFF/WAVE PCM decodes without one"
                    )
                rate, n_ch, n_frames, samples = decode_wav(b)
                rms = float(np.sqrt((samples**2).mean())) if samples.size else 0.0
                peak = float(np.abs(samples).max()) if samples.size else 0.0
                rows.append(
                    (
                        int(aid), rate, n_ch, n_frames,
                        n_frames / rate if rate else 0.0, rms, peak,
                    )
                )
            yield pd.DataFrame(rows, columns=[f.name for f in _AUDIO_SCHEMA.fields])

    return assets.mapInPandas(batches, schema=_AUDIO_SCHEMA)


_FRAME_DHASH_SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("sig", LongType()),
    ]
)


def dhash_video_frames(assets: DataFrame, *, every_n: int = 1) -> DataFrame:
    """Per-frame 64-bit dHash for video assets (MJPEG-in-AVI decodes for
    real; inter-frame codecs raise the honest gate). ``every_n``
    subsamples frames — at 100 TB of video you hash every Nth frame,
    not all of them. One narrow ``mapInPandas``; only (id, frame_idx,
    sig) rows leave the stage, never pixels. Feed the result to
    :func:`video_neardup_pairs`."""
    hw, hh = 8, 8

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from icerunner_spark.operators.codecs import decode_avi, sniff_format

        weights = (1 << np.arange(hw * hh, dtype=np.uint64)).reshape(hh, hw)

        for pdf in it:
            rows = []
            for aid, blob in zip(pdf["asset_id"], pdf["content"]):
                b = bytes(blob) if blob is not None else b""
                if sniff_format(b) != "avi":
                    raise NotImplementedError(
                        "hashing this video blob needs a codec library: "
                        "only MJPEG-in-AVI decodes without one"
                    )
                _, _, _, frames = decode_avi(b)
                for fi, larr in enumerate(frames):
                    if fi % every_n:
                        continue
                    h0, w0 = larr.shape
                    ys = (np.arange(hh) * h0) // hh
                    xs = (np.arange(hw + 1) * w0) // (hw + 1)
                    g = larr[ys][:, xs].astype(np.int64)
                    bits = (g[:, 1:] > g[:, :-1]).astype(np.uint64)
                    v = int((bits * weights).sum())
                    if v >= 1 << 63:
                        v -= 1 << 64
                    rows.append((int(aid), fi, v))
            yield pd.DataFrame(
                rows, columns=[f.name for f in _FRAME_DHASH_SCHEMA.fields]
            )

    return assets.mapInPandas(batches, schema=_FRAME_DHASH_SCHEMA)


def video_neardup_pairs(
    frame_sigs: DataFrame,
    *,
    max_distance: int = 7,
    min_matching_frames: int = 2,
    max_bucket: int = 200,
) -> DataFrame:
    """Video-level near-duplicates from per-frame dHashes: two videos
    pair when at least ``min_matching_frames`` frame pairs land within
    ``max_distance`` bits (time-offset tolerant — a trimmed or
    re-muxed copy still shares most frame hashes). Frame candidates
    come from the same banded pigeonhole join as simhash/image dedup
    (``operators.dedup.hamming_neardup_pairs`` over a composite
    video*2^20+frame id), so no all-pairs anywhere; the per-video-pair
    rollup is one hash aggregation over surviving frame pairs.
    Input: (``id``, ``frame_idx``, ``sig``); frame_idx must stay under
    2^20 (enforced). Returns (id1, id2, n_matching_frames,
    min_distance)."""
    from icerunner_spark.operators.dedup import hamming_neardup_pairs

    shift = 1 << 20
    over = frame_sigs.filter(F.col("frame_idx") >= shift)
    composite = frame_sigs.select(
        (F.col("id") * shift + F.col("frame_idx")).alias("id"), "sig"
    )
    if over.limit(1).count():
        raise ValueError("frame_idx must be < 2^20 for the composite key")
    fp = hamming_neardup_pairs(
        composite,
        max_distance=max_distance,
        chunk_bits=8 if max_distance > 3 else 16,
        max_bucket=max_bucket,
    )
    v1, v2 = (F.col("id1") / shift).cast("long"), (
        F.col("id2") / shift
    ).cast("long")
    cross = fp.select(
        v1.alias("v1"), v2.alias("v2"), "distance"
    ).filter(F.col("v1") != F.col("v2"))
    # normalize so (small, large) regardless of frame interleaving
    norm = cross.select(
        F.least("v1", "v2").alias("id1"),
        F.greatest("v1", "v2").alias("id2"),
        "distance",
    )
    return (
        norm.groupBy("id1", "id2")
        .agg(
            F.count(F.lit(1)).alias("n_matching_frames"),
            F.min("distance").alias("min_distance"),
        )
        .filter(F.col("n_matching_frames") >= min_matching_frames)
    )


def audio_spectral_fingerprints(
    assets: DataFrame, *, frame: int = 256, hop: int = 128
) -> DataFrame:
    """64-bit Haitsma-Kalker spectral fingerprint per PCM asset: energy
    in 9 log-spaced frequency bands over 9 overlapping frames (numpy
    rfft), and bit ``(t, b)`` is the sign of the band-energy delta's
    TIME difference —

        F(t, b) = [E(t,b) - E(t,b+1)] - [E(t-1,b) - E(t-1,b+1)] > 0

    — the published scheme's core, robust to gain, EQ tilt, and mild
    noise where the plain time-energy fingerprint
    (:func:`audio_fingerprints`) is not. 8 time-deltas x 8 band-pairs
    fill exactly 64 bits, so the output joins the same banded hamming
    machinery as simhash/dHash. One narrow ``mapInPandas``; only
    (id, sig) rows leave the stage. FFT makes this numpy-only (no SQL
    oracle); correctness is pinned against perturbation/discrimination
    fixtures in tests/test_multimodal.py."""
    n_frames, n_bands = 9, 9

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from icerunner_spark.operators.codecs import decode_wav, sniff_format

        weights = 1 << np.arange(64, dtype=np.uint64)

        for pdf in it:
            rows = []
            for aid, blob in zip(pdf["asset_id"], pdf["content"]):
                b = bytes(blob) if blob is not None else b""
                if sniff_format(b) != "wav":
                    raise NotImplementedError(
                        "fingerprinting this audio blob needs a codec "
                        "library: only RIFF/WAVE PCM decodes without one"
                    )
                _, _, _, samples = decode_wav(b)
                ch0 = samples[:, 0] if samples.ndim == 2 else samples
                need = hop * (n_frames - 1) + frame
                buf = np.zeros(need, dtype=np.float64)
                buf[: min(len(ch0), need)] = ch0[:need]
                idx = hop * np.arange(n_frames)[:, None] + np.arange(frame)
                spec = np.abs(np.fft.rfft(buf[idx], axis=1)) ** 2
                # 9 log-spaced band edges over [2, frame//2) bins
                edges = np.unique(
                    np.geomspace(2, spec.shape[1] - 1, n_bands + 1).astype(int)
                )
                while len(edges) < n_bands + 1:  # tiny frames: pad linearly
                    edges = np.append(edges, edges[-1] + 1)
                e = np.add.reduceat(spec, edges[:-1], axis=1)[:, :n_bands]
                d = e[:, :-1] - e[:, 1:]            # band-pair deltas
                bits = (d[1:] - d[:-1] > 0).astype(np.uint64).ravel()
                v = int((bits * weights[: bits.size]).sum())
                if v >= 1 << 63:
                    v -= 1 << 64
                rows.append((int(aid), v))
            yield pd.DataFrame(
                rows, columns=[f.name for f in _DHASH_SCHEMA.fields]
            )

    return assets.mapInPandas(batches, schema=_DHASH_SCHEMA)


def audio_fingerprints(assets: DataFrame, *, frame: int = 64) -> DataFrame:
    """64-bit audio fingerprint per PCM asset: the sign pattern of
    frame-to-frame energy deltas (the Haitsma-Kalker band-energy scheme
    collapsed to one band — robust to gain changes, cheap enough for a
    first-pass dedup of an audio corpus before any spectral work).

    Channel 0 of the first ``65 * frame`` samples (zero-padded when
    shorter) is split into 65 frames; bit ``f`` is set iff
    ``energy(f+1) > energy(f)``. 16-bit PCM energies are exact in
    float64 (each term is an integer scaled by 2^-30 and the frame sum
    stays far under 2^53), so the signature is integer-replayable on
    any engine. Pair near-duplicates with
    ``operators.dedup.hamming_neardup_pairs`` — blobs never shuffle,
    only (id, sig) rows. Returns (``id``, ``sig``)."""
    n_frames = 65

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from icerunner_spark.operators.codecs import decode_wav, sniff_format

        weights = 1 << np.arange(n_frames - 1, dtype=np.uint64)

        for pdf in it:
            rows = []
            for aid, blob in zip(pdf["asset_id"], pdf["content"]):
                b = bytes(blob) if blob is not None else b""
                if sniff_format(b) != "wav":
                    raise NotImplementedError(
                        "fingerprinting this audio blob needs a codec "
                        "library: only RIFF/WAVE PCM decodes without one"
                    )
                _, _, _, samples = decode_wav(b)
                ch0 = samples[:, 0] if samples.ndim == 2 else samples
                need = n_frames * frame
                buf = np.zeros(need, dtype=np.float64)
                buf[: min(len(ch0), need)] = ch0[:need]
                e = (buf.reshape(n_frames, frame) ** 2).sum(axis=1)
                bits = (e[1:] > e[:-1]).astype(np.uint64)
                v = int((bits * weights).sum())
                if v >= 1 << 63:
                    v -= 1 << 64
                rows.append((int(aid), v))
            yield pd.DataFrame(
                rows, columns=[f.name for f in _DHASH_SCHEMA.fields]
            )

    return assets.mapInPandas(batches, schema=_DHASH_SCHEMA)


# --------------------------------------------------------------------------- #
# video decode (REAL for MJPEG-in-AVI — operators.codecs.decode_avi)
# --------------------------------------------------------------------------- #

_VIDEO_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
        StructField("fps", DoubleType()),
        StructField("mean_luma", DoubleType()),
    ]
)


def decode_video(assets: DataFrame) -> DataFrame:
    """Decode video blobs to (width, height, n_frames, fps, mean_luma
    over every decoded frame). MJPEG-in-AVI decodes for real — RIFF
    chunk walk for the container, the pure-python baseline-JPEG decoder
    per frame; inter-frame codecs (H.264/VP9/...) raise the honest
    ``NotImplementedError`` per blob. One Arrow-batched ``mapInPandas``
    stage, narrow map, zero shuffles. n_frames counts frames actually
    DECODED (not the header claim), so the row proves pixels flowed."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from icerunner_spark.operators.codecs import decode_avi, sniff_format

        for pdf in it:
            rows = []
            for aid, blob in zip(pdf["asset_id"], pdf["content"]):
                b = bytes(blob) if blob is not None else b""
                if sniff_format(b) != "avi":
                    raise NotImplementedError(
                        "decoding this video blob needs a codec library: "
                        "only MJPEG-in-AVI decodes without one"
                    )
                w, h, fps, frames = decode_avi(b)
                mean = (
                    float(np.mean([f.mean() for f in frames])) if frames else 0.0
                )
                rows.append((int(aid), w, h, len(frames), fps, mean))
            yield pd.DataFrame(rows, columns=[f.name for f in _VIDEO_SCHEMA.fields])

    return assets.mapInPandas(batches, schema=_VIDEO_SCHEMA)
