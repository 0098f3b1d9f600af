"""Multimodal binary-column operators: real byte analytics and real
pure-numpy codecs — BMP/PPM/PGM/PNG/JPEG image decode, RIFF/WAVE audio
decode (operators/multimodal.py, operators/codecs.py; SURVEY.md §2.C)."""

from __future__ import annotations

import math
import zlib

import pytest
from pyspark.sql import functions as F

from icerunner_spark.operators.multimodal import (
    as_assets,
    chunk_content,
    decode_audio,
    decode_images,
    decode_video,
    documents_as_assets,
    extract_features,
    fake_decode_dims,
    resize_images,
    sample_frames,
)

SF_SMALL = "/root/testdata/sf0.001"


def _asset_df(spark, blobs: dict[int, bytes]):
    rows = [(i, b) for i, b in blobs.items()]
    df = spark.createDataFrame(rows, "id long, blob binary")
    return as_assets(df, "id", "blob")


def test_as_assets_schema_and_nbytes(spark):
    assets = _asset_df(spark, {1: b"abc", 2: b"", 3: b"\x00" * 10})
    got = {r["asset_id"]: r["meta"]["n_bytes"] for r in assets.collect()}
    assert got == {1: 3, 2: 0, 3: 10}
    names = [f.name for f in assets.schema["meta"].dataType.fields]
    assert names == [
        "kind", "content_type", "n_bytes", "width", "height",
        "n_frames", "sample_rate",
    ]


def test_extract_features_known_values(spark):
    blobs = {1: b"aaaa", 2: bytes(range(256)), 3: b"", 4: b"\x00\x00ab"}
    feats = {
        r["asset_id"]: r for r in extract_features(_asset_df(spark, blobs)).collect()
    }
    # uniform blob: zero entropy; all-distinct 256 bytes: exactly 8 bits
    assert feats[1]["entropy_bits"] == pytest.approx(0.0)
    assert feats[2]["entropy_bits"] == pytest.approx(8.0)
    assert feats[3]["n_bytes"] == 0
    assert feats[4]["null_byte_ratio"] == pytest.approx(0.5)
    assert feats[4]["ascii_ratio"] == pytest.approx(0.5)
    for i, b in blobs.items():
        assert feats[i]["crc32"] == zlib.crc32(b)
    # entropy of half-zeros/half-text blob: computed independently
    p = [2 / 4, 1 / 4, 1 / 4]
    expect = -sum(x * math.log2(x) for x in p)
    assert feats[4]["entropy_bits"] == pytest.approx(expect)


def test_sample_frames_stride_and_partial_drop(spark):
    # 10 full 4-byte frames + 2 trailing bytes (dropped)
    blob = bytes(range(42))
    out = sample_frames(
        _asset_df(spark, {7: blob}), frame_size=4, every=3
    ).collect()
    idx = sorted(r["frame_index"] for r in out)
    assert idx == [0, 3, 6, 9]
    by_idx = {r["frame_index"]: bytes(r["frame"]) for r in out}
    assert by_idx[3] == bytes(range(12, 16))
    # limit caps sampled frames per asset
    limited = sample_frames(
        _asset_df(spark, {7: blob}), frame_size=4, every=3, limit=2
    ).collect()
    assert sorted(r["frame_index"] for r in limited) == [0, 3]


def test_chunk_content_jvm_side(spark):
    blob = b"abcdefghij"  # 10 bytes -> chunks of 4: 4,4,2
    out = chunk_content(_asset_df(spark, {1: blob}), chunk_size=4).collect()
    chunks = {r["chunk_index"]: bytes(r["chunk"]) for r in out}
    assert chunks == {0: b"abcd", 1: b"efgh", 2: b"ij"}


def test_decode_gate_raises_on_compressed_without_codec(spark):
    """Formats the pure codecs can't handle (JPEG, since r7 gave PNG a
    real decoder) still hit the honest NotImplementedError — raised per
    blob in the executor, so it surfaces at collect() wrapped in Spark's
    PythonException."""
    jpeg_magic = b"\xff\xd8\xff\xe0\x00\x10JFIF" + b"\x00" * 32
    assets = _asset_df(spark, {1: jpeg_magic})
    with pytest.raises(Exception, match="codec"):
        decode_images(assets).collect()
    with pytest.raises(Exception, match="codec"):
        resize_images(assets, width=2, height=2).collect()


def test_fake_decode_deterministic(spark):
    assets = _asset_df(spark, {1: b"hello", 2: b"hello", 3: b"world!"})
    out = {r["asset_id"]: r for r in decode_images(assets, use_fake=True).collect()}
    assert (out[1]["width"], out[1]["height"]) == fake_decode_dims(b"hello")
    assert (out[1]["width"], out[1]["height"]) == (out[2]["width"], out[2]["height"])
    assert out[1]["mean_luma"] == pytest.approx(
        sum(b"hello") / len(b"hello")
    )


def test_fake_resize_shapes(spark):
    assets = _asset_df(spark, {1: b"ab"})
    row = resize_images(assets, width=3, height=2, use_fake=True).collect()[0]
    assert len(bytes(row["content"])) == 6
    assert bytes(row["content"]) == b"ababab"


def test_documents_as_assets_roundtrip(spark):
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet").limit(20)
    assets = documents_as_assets(docs)
    joined = (
        assets.alias("a")
        .join(docs.alias("d"), F.col("a.asset_id") == F.col("d.doc_id"))
        .select(
            F.col("a.meta.n_bytes").alias("n_bytes"),
            F.length(F.encode("d.text", "UTF-8")).alias("expect"),
        )
    )
    assert joined.filter(F.col("n_bytes") != F.col("expect")).count() == 0


# --------------------------------------------------------------------------- #
# pure-python codecs: real in-container decode (no PIL)
# --------------------------------------------------------------------------- #


def _gradient(h, w, seed=0):
    import numpy as np

    # seeded, deterministic, exercises every row and column distinctly
    i = np.arange(h * w, dtype=np.uint32).reshape(h, w)
    return ((i * 7 + seed) % 256).astype(np.uint8)


def test_codec_bmp_roundtrip_and_row_order():
    import numpy as np

    from icerunner_spark.operators.codecs import decode_bmp, encode_gray_bmp

    g = _gradient(5, 7, seed=3)  # w=7 -> 21-byte rows, 3 pad bytes: real padding
    w, h, luma = decode_bmp(encode_gray_bmp(g))
    assert (w, h) == (7, 5)
    # gray r=g=b survives BT.601 exactly; row order must be undone
    assert np.array_equal(luma, g)


def test_codec_bmp_top_down_variant():
    import struct

    import numpy as np

    from icerunner_spark.operators.codecs import decode_bmp, encode_gray_bmp

    g = _gradient(4, 4, seed=9)
    b = bytearray(encode_gray_bmp(g))
    # flip to top-down: negative height, rows already bottom-up in the
    # blob so the decoded image becomes the vertical mirror
    struct.pack_into("<i", b, 22, -4)
    w, h, luma = decode_bmp(bytes(b))
    assert (w, h) == (4, 4)
    assert np.array_equal(luma, g[::-1])


def test_codec_pnm_roundtrip_and_comments():
    import numpy as np

    from icerunner_spark.operators.codecs import (
        decode_pnm,
        encode_pgm,
        encode_ppm,
    )

    g = _gradient(3, 5, seed=1)
    w, h, luma = decode_pnm(encode_pgm(g))
    assert (w, h, luma.tolist()) == (5, 3, g.tolist())
    rgb = np.stack([g, g, g], axis=2)
    w, h, luma = decode_pnm(encode_ppm(rgb))
    assert (w, h, luma.tolist()) == (5, 3, g.tolist())
    # header comments are legal netpbm
    with_comment = b"P5\n# a comment\n5 3\n255\n" + g.tobytes()
    w, h, luma = decode_pnm(with_comment)
    assert (w, h, luma.tolist()) == (5, 3, g.tolist())


def test_codec_rejects_unsupported_flavors():
    import struct

    from icerunner_spark.operators.codecs import decode_bmp, decode_pnm, encode_gray_bmp

    with pytest.raises(ValueError):
        decode_bmp(b"BM" + b"\x00" * 10)  # truncated
    b = bytearray(encode_gray_bmp(_gradient(2, 2)))
    struct.pack_into("<H", b, 28, 8)  # bpp=8: paletted, unsupported
    with pytest.raises(ValueError):
        decode_bmp(bytes(b))
    with pytest.raises(ValueError):
        decode_pnm(b"P3\n1 1\n255\n0 0 0")  # ASCII ppm unsupported


def test_decode_images_real_bmp_in_spark(spark):
    """decode_images performs a REAL decode in-container for BMP/PPM:
    width/height/mean_luma pinned against the known gradient."""
    import numpy as np

    from icerunner_spark.operators.codecs import encode_gray_bmp, encode_ppm

    g1 = _gradient(6, 9, seed=5)
    g2 = _gradient(8, 4, seed=11)
    blobs = {
        1: encode_gray_bmp(g1),
        2: encode_ppm(np.stack([g2, g2, g2], axis=2)),
    }
    out = {r["asset_id"]: r for r in decode_images(_asset_df(spark, blobs)).collect()}
    assert (out[1]["width"], out[1]["height"]) == (9, 6)
    assert out[1]["mean_luma"] == pytest.approx(float(g1.mean()))
    assert (out[2]["width"], out[2]["height"]) == (4, 8)
    assert out[2]["mean_luma"] == pytest.approx(float(g2.mean()))


def test_resize_images_real_nearest_neighbor(spark):
    """Real resize path: decode -> nearest-neighbor resample -> gray BMP
    re-encode; the output blob round-trips through decode_images and the
    sampled pixels match the numpy index-map definition."""
    import numpy as np

    from icerunner_spark.operators.codecs import decode_bmp, encode_gray_bmp

    g = _gradient(8, 8, seed=2)
    assets = _asset_df(spark, {1: encode_gray_bmp(g)})
    row = resize_images(assets, width=4, height=2).collect()[0]
    assert (row["width"], row["height"]) == (4, 2)
    w, h, luma = decode_bmp(bytes(row["content"]))
    assert (w, h) == (4, 2)
    ys = (np.arange(2) * 8) // 2
    xs = (np.arange(4) * 8) // 4
    assert np.array_equal(luma, g[ys][:, xs])


# --------------------------------------------------------------------------- #
# PNG codec (r7): stdlib-zlib inflate + scanline unfiltering, no PIL
# --------------------------------------------------------------------------- #


def test_codec_png_roundtrip_gray_and_rgb():
    import numpy as np

    from icerunner_spark.operators.codecs import decode_png, encode_png

    g = _gradient(6, 11, seed=4)
    w, h, luma = decode_png(encode_png(g))
    assert (w, h) == (11, 6)
    assert np.array_equal(luma, g)
    # RGB with distinct channels: BT.601 integer luma
    rgb = np.stack([g, (g.astype(np.int64) + 30) % 256,
                    (g.astype(np.int64) + 60) % 256], axis=2).astype(np.uint8)
    w, h, luma = decode_png(encode_png(rgb))
    r32 = rgb.astype(np.uint32)
    want = (299 * r32[:, :, 0] + 587 * r32[:, :, 1] + 114 * r32[:, :, 2]) // 1000
    assert np.array_equal(luma, want.astype(np.uint8))


def test_codec_png_all_filter_types():
    """Decode must reverse every spec filter (0 none, 1 sub, 2 up,
    3 average, 4 paeth): hand-build a raster with one row per filter
    from a known image and compare against the plain encode."""
    import struct
    import zlib

    import numpy as np

    from icerunner_spark.operators.codecs import decode_png

    g = _gradient(5, 8, seed=7)  # 5 rows -> filters 0..4
    ch, stride = 1, 8

    def filt(y, row, prev):
        r = row.astype(np.int32)
        p = prev.astype(np.int32)
        if y == 0:
            return 0, row
        if y == 1:  # sub
            out = r.copy()
            out[ch:] = (r[ch:] - r[:-ch]) % 256
            return 1, out.astype(np.uint8)
        if y == 2:  # up
            return 2, ((r - p) % 256).astype(np.uint8)
        if y == 3:  # average
            out = np.zeros(stride, np.int32)
            for i in range(stride):
                left = int(row[i - ch]) if i >= ch else 0
                out[i] = (r[i] - ((left + p[i]) >> 1)) % 256
            return 3, out.astype(np.uint8)
        # paeth
        def paeth(a, b, c):
            q = a + b - c
            pa, pb, pc = abs(q - a), abs(q - b), abs(q - c)
            return a if pa <= pb and pa <= pc else (b if pb <= pc else c)

        out = np.zeros(stride, np.int32)
        for i in range(stride):
            left = int(row[i - ch]) if i >= ch else 0
            ul = int(prev[i - ch]) if i >= ch else 0
            out[i] = (r[i] - paeth(left, int(p[i]), ul)) % 256
        return 4, out.astype(np.uint8)

    raster = bytearray()
    for y in range(5):
        ft, data = filt(y, g[y], g[y - 1] if y > 0 else np.zeros(stride, np.uint8))
        raster.append(ft)
        raster.extend(data.tobytes())

    sig = b"\x89PNG\r\n\x1a\n"

    def chunk(kind, data):
        return (struct.pack(">I", len(data)) + kind + data
                + struct.pack(">I", zlib.crc32(kind + data) & 0xFFFFFFFF))

    blob = (sig + chunk(b"IHDR", struct.pack(">IIBBBBB", 8, 5, 8, 0, 0, 0, 0))
            + chunk(b"IDAT", zlib.compress(bytes(raster)))
            + chunk(b"IEND", b""))
    w, h, luma = decode_png(blob)
    assert (w, h) == (8, 5)
    assert np.array_equal(luma, g)


def test_codec_png_palette_and_rgba():
    import struct
    import zlib

    import numpy as np

    from icerunner_spark.operators.codecs import decode_png

    sig = b"\x89PNG\r\n\x1a\n"

    def chunk(kind, data):
        return (struct.pack(">I", len(data)) + kind + data
                + struct.pack(">I", zlib.crc32(kind + data) & 0xFFFFFFFF))

    # palette: 4 entries, 2x2 image of indices [[0,1],[2,3]]
    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 100, 100, 100])
    raster = bytes([0, 0, 1, 0, 2, 3])  # filter 0 rows
    blob = (sig + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0))
            + chunk(b"PLTE", plte)
            + chunk(b"IDAT", zlib.compress(raster)) + chunk(b"IEND", b""))
    w, h, luma = decode_png(blob)
    want = np.array([[299 * 255 // 1000, 587 * 255 // 1000],
                     [114 * 255 // 1000, 100]], dtype=np.uint8)
    assert (w, h) == (2, 2)
    assert np.array_equal(luma, want)

    # RGBA: alpha ignored, luma from RGB
    raster = bytes([0, 10, 20, 30, 128, 40, 50, 60, 0])  # 2x1 RGBA
    blob = (sig + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 1, 8, 6, 0, 0, 0))
            + chunk(b"IDAT", zlib.compress(raster)) + chunk(b"IEND", b""))
    w, h, luma = decode_png(blob)
    assert (w, h) == (2, 1)
    assert luma[0, 0] == (299 * 10 + 587 * 20 + 114 * 30) // 1000
    assert luma[0, 1] == (299 * 40 + 587 * 50 + 114 * 60) // 1000


def _png_chunk_t(kind, data):
    import struct
    import zlib

    return (struct.pack(">I", len(data)) + kind + data
            + struct.pack(">I", zlib.crc32(kind + data) & 0xFFFFFFFF))


def test_codec_png_16bit_and_subbyte_depths():
    """16-bit samples take the high byte (PIL-style); 1/2/4-bit gray
    scales to 8 bits (x255/(2^d-1)); scanlines are bit-packed with row
    padding — all hand-built rasters against known arrays."""
    import struct
    import zlib

    import numpy as np

    from icerunner_spark.operators.codecs import _PNG_SIG, decode_png

    g16 = (np.arange(12, dtype=np.uint16).reshape(3, 4) * 4096 + 123)
    raster = b"".join(b"\x00" + g16[y].astype(">u2").tobytes() for y in range(3))
    blob = (_PNG_SIG + _png_chunk_t(b"IHDR", struct.pack(">IIBBBBB", 4, 3, 16, 0, 0, 0, 0))
            + _png_chunk_t(b"IDAT", zlib.compress(raster)) + _png_chunk_t(b"IEND", b""))
    w, h, luma = decode_png(blob)
    assert (w, h) == (4, 3)
    assert np.array_equal(luma, (g16 >> 8).astype(np.uint8))

    vals = np.array([[0, 3, 7, 12, 15], [1, 2, 4, 8, 10]], dtype=np.uint8)
    packed = []
    for y in range(2):
        row = bytearray()
        for i in range(0, 5, 2):
            hi = vals[y][i] << 4
            lo = vals[y][i + 1] if i + 1 < 5 else 0
            row.append(hi | lo)
        packed.append(b"\x00" + bytes(row))
    blob = (_PNG_SIG + _png_chunk_t(b"IHDR", struct.pack(">IIBBBBB", 5, 2, 4, 0, 0, 0, 0))
            + _png_chunk_t(b"IDAT", zlib.compress(b"".join(packed)))
            + _png_chunk_t(b"IEND", b""))
    w, h, luma = decode_png(blob)
    assert np.array_equal(luma, vals * 17)

    bits = np.array([[1, 0, 1, 1, 0, 0, 1, 0, 1, 1],
                     [0, 1, 0, 0, 1, 1, 0, 1, 0, 0]], dtype=np.uint8)
    raster = b"".join(b"\x00" + np.packbits(bits[y]).tobytes() for y in range(2))
    blob = (_PNG_SIG + _png_chunk_t(b"IHDR", struct.pack(">IIBBBBB", 10, 2, 1, 0, 0, 0, 0))
            + _png_chunk_t(b"IDAT", zlib.compress(raster)) + _png_chunk_t(b"IEND", b""))
    w, h, luma = decode_png(blob)
    assert np.array_equal(luma, bits * 255)


def test_codec_png_adam7_interlace():
    """Adam7: seven independently-filtered sub-images scatter back into
    the full raster — built by slicing a reference image with the spec's
    pass grid and compared pixel-exact after decode."""
    import struct
    import zlib

    import numpy as np

    from icerunner_spark.operators.codecs import _ADAM7, _PNG_SIG, decode_png

    ref = (np.arange(9 * 11).reshape(9, 11) * 5 % 256).astype(np.uint8)
    raster = bytearray()
    for x0, y0, dx, dy in _ADAM7:
        sub = ref[y0::dy, x0::dx]
        if sub.size == 0:
            continue
        for row in sub:
            raster += b"\x00" + row.tobytes()
    blob = (_PNG_SIG + _png_chunk_t(b"IHDR", struct.pack(">IIBBBBB", 11, 9, 8, 0, 0, 0, 1))
            + _png_chunk_t(b"IDAT", zlib.compress(bytes(raster)))
            + _png_chunk_t(b"IEND", b""))
    w, h, luma = decode_png(blob)
    assert (w, h) == (11, 9)
    assert np.array_equal(luma, ref)


def test_codec_png_rejects_unsupported_flavors():
    import struct
    import zlib

    from icerunner_spark.operators.codecs import _PNG_SIG, decode_png, encode_png

    with pytest.raises(ValueError):
        decode_png(b"\x89PNG\r\n\x1a\n" + b"\x00" * 16)  # no IHDR/IDAT
    # invalid interlace method
    blob = (_PNG_SIG + _png_chunk_t(b"IHDR", struct.pack(">IIBBBBB", 1, 1, 8, 0, 0, 0, 2))
            + _png_chunk_t(b"IDAT", zlib.compress(bytes(2))) + _png_chunk_t(b"IEND", b""))
    with pytest.raises(ValueError, match="interlace"):
        decode_png(blob)
    # sub-byte depth is only legal for gray/palette
    blob = (_PNG_SIG + _png_chunk_t(b"IHDR", struct.pack(">IIBBBBB", 1, 1, 4, 2, 0, 0, 0))
            + _png_chunk_t(b"IDAT", zlib.compress(bytes(3))) + _png_chunk_t(b"IEND", b""))
    with pytest.raises(ValueError, match="depth"):
        decode_png(blob)
    with pytest.raises(ValueError):
        encode_png(_gradient(2, 2)[:, :, None].repeat(4, axis=2))  # RGBA encode


def test_decode_images_real_png_in_spark(spark):
    """decode_images resolves PNG blobs through the real zlib codec in
    the executor: width/height/mean_luma pinned against the gradient."""
    import numpy as np

    from icerunner_spark.operators.codecs import encode_png

    g = _gradient(7, 5, seed=13)
    rgb = np.stack([g, g, g], axis=2)
    out = {
        r["asset_id"]: r
        for r in decode_images(
            _asset_df(spark, {1: encode_png(g), 2: encode_png(rgb)})
        ).collect()
    }
    for aid in (1, 2):
        assert (out[aid]["width"], out[aid]["height"]) == (5, 7)
        assert out[aid]["mean_luma"] == pytest.approx(float(g.mean()))


# --------------------------------------------------------------------------- #
# JPEG codec (r7): baseline Huffman decode, stdlib+numpy only
# --------------------------------------------------------------------------- #


def _jpeg_color_blob(g, sampling, quant_scale=20):
    """Hand-build an interleaved COLOR JPEG (Y from ``g``, zero chroma =
    achromatic gray) so the decoder's multi-component path is pinned
    without any image library. ``sampling``: (h, v) for Y; chroma is
    1x1, so (1, 1) = 4:4:4 and (2, 2) = 4:2:0."""
    import struct

    import numpy as np

    from icerunner_spark.operators import codecs as C

    ch, cv = sampling
    hh, ww = g.shape
    assert hh % (8 * cv) == 0 and ww % (8 * ch) == 0
    dc = C._canonical_codes(C._DC_LUM_COUNTS, C._DC_LUM_SYMBOLS)
    ac = C._canonical_codes(C._AC_LUM_COUNTS, C._AC_LUM_SYMBOLS)
    enc_dc = {s: (c, l) for (l, c), s in dc.items()}
    enc_ac = {s: (c, l) for (l, c), s in ac.items()}
    q = np.clip((C._K1_QUANT * quant_scale + 50) // 100, 1, 255)

    def cat(v):
        return int(v != 0 and np.floor(np.log2(abs(v))) + 1)

    bw = C._BitWriter()
    pred = 0

    def emit_block(blk):
        nonlocal pred
        coef = C._DCT_M @ (blk.astype(float) - 128) @ C._DCT_M.T
        zz = np.round(coef.reshape(-1)[C._ZIGZAG] / q).astype(np.int64)
        d = int(zz[0]) - pred
        pred = int(zz[0])
        t = cat(d)
        c, l = enc_dc[t]
        bw.write(c, l)
        if t:
            bw.write(d if d > 0 else d + (1 << t) - 1, t)
        nz = np.nonzero(zz[1:])[0]
        last = nz[-1] + 1 if len(nz) else 0
        run = 0
        for k in range(1, last + 1):
            v = int(zz[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                c, l = enc_ac[0xF0]
                bw.write(c, l)
                run -= 16
            s = cat(v)
            c, l = enc_ac[(run << 4) | s]
            bw.write(c, l)
            bw.write(v if v > 0 else v + (1 << s) - 1, s)
            run = 0
        if last < 63:
            c, l = enc_ac[0x00]
            bw.write(c, l)

    for my in range(hh // (8 * cv)):
        for mx in range(ww // (8 * ch)):
            for by in range(cv):
                for bx in range(ch):
                    yy, xx = (my * cv + by) * 8, (mx * ch + bx) * 8
                    emit_block(g[yy : yy + 8, xx : xx + 8])
            for _ in range(2):  # Cb, Cr: zero DC diff + EOB (NB: shared
                # DC predictor is fine here because every chroma DC is 0
                # only when Y's predictor is untouched — so emit raw)
                c, l = enc_dc[0]
                bw.write(c, l)
                c, l = enc_ac[0x00]
                bw.write(c, l)
    bw.flush()

    def seg(m, p):
        return bytes([0xFF, m]) + struct.pack(">H", len(p) + 2) + p

    samp = (ch << 4) | cv
    return (
        b"\xff\xd8"
        + seg(0xDB, bytes([0]) + bytes(int(v) for v in q))
        + seg(0xC0, bytes([8]) + struct.pack(">HH", hh, ww)
              + bytes([3, 1, samp, 0, 2, 0x11, 0, 3, 0x11, 0]))
        + seg(0xC4, bytes([0x00]) + bytes(C._DC_LUM_COUNTS)
              + bytes(C._DC_LUM_SYMBOLS) + bytes([0x10])
              + bytes(C._AC_LUM_COUNTS) + bytes(C._AC_LUM_SYMBOLS))
        + seg(0xDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0]))
        + bytes(bw.out)
        + b"\xff\xd9"
    )


def test_codec_jpeg_gray_roundtrip_tolerance():
    import numpy as np

    from icerunner_spark.operators.codecs import decode_jpeg, encode_gray_jpeg

    y, x = np.mgrid[0:24, 0:33]  # non-multiple-of-8 width: edge padding
    g = np.clip(y * 4 + x * 2, 0, 255).astype(np.uint8)
    w, h, luma = decode_jpeg(encode_gray_jpeg(g, quality=90))
    assert (w, h) == (33, 24)
    err = np.abs(luma.astype(int) - g.astype(int))
    assert err.max() <= 2, err.max()  # smooth field at q90: near-exact
    # flat blocks are DC-only: bit-exact through quantization
    flat = np.full((16, 16), 77, np.uint8)
    _, _, l2 = decode_jpeg(encode_gray_jpeg(flat))
    assert np.array_equal(l2, flat)


def test_codec_jpeg_restart_markers():
    import numpy as np

    from icerunner_spark.operators.codecs import decode_jpeg, encode_gray_jpeg

    y, x = np.mgrid[0:40, 0:56]
    g = np.clip(y * 3 + x * 2, 0, 255).astype(np.uint8)
    w, h, luma = decode_jpeg(encode_gray_jpeg(g, quality=90, restart_interval=3))
    assert (w, h) == (56, 40)
    assert np.abs(luma.astype(int) - g.astype(int)).max() <= 2


def test_codec_jpeg_color_444_and_420():
    import numpy as np

    from icerunner_spark.operators.codecs import decode_jpeg

    y, x = np.mgrid[0:16, 0:16]
    g = ((y * 5 + x * 3) % 200).astype(np.uint8)
    for sampling in ((1, 1), (2, 2)):  # 4:4:4 and 4:2:0
        w, h, luma = decode_jpeg(_jpeg_color_blob(g, sampling))
        assert (w, h) == (16, 16)
        err = np.abs(luma.astype(int) - g.astype(int))
        assert err.max() <= 3, (sampling, err.max())


def test_codec_jpeg_rejects_non_jpeg():
    from icerunner_spark.operators.codecs import decode_jpeg

    with pytest.raises(ValueError):
        decode_jpeg(b"\x89PNG not a jpeg")


def test_decode_images_real_jpeg_in_spark(spark):
    """decode_images resolves JPEG blobs through the real baseline
    decoder in the executor; mean luma within quantization tolerance."""
    import numpy as np

    from icerunner_spark.operators.codecs import encode_gray_jpeg

    y, x = np.mgrid[0:32, 0:24]
    g = np.clip(y * 2 + x * 4, 0, 255).astype(np.uint8)
    out = decode_images(
        _asset_df(spark, {1: encode_gray_jpeg(g, quality=90)})
    ).collect()[0]
    assert (out["width"], out["height"]) == (24, 32)
    assert out["mean_luma"] == pytest.approx(float(g.mean()), abs=1.0)


def test_codec_jpeg_progressive_matches_baseline_decode():
    """Progressive (SOF2) decode must reconstruct EXACTLY the same
    pixels as the baseline decode of the same quantized coefficients —
    the six-scan script covers spectral selection (DC / AC 1-5 /
    AC 6-63) AND successive approximation (Al=1 first pass + Al=0
    refinement for every band), exercising DC refine bits, AC EOB runs,
    ZRL-in-refine, and the correction-bit interleave."""
    import numpy as np

    from icerunner_spark.operators.codecs import (
        decode_jpeg,
        encode_gray_jpeg,
        encode_gray_jpeg_progressive,
    )

    y, x = np.mgrid[0:24, 0:33]
    smooth = np.clip(y * 4 + x * 2, 0, 255).astype(np.uint8)
    noise = np.random.RandomState(3).randint(0, 256, (40, 56)).astype(np.uint8)
    flat = np.full((8, 8), 128, np.uint8)
    diag = (np.eye(32) * 255).astype(np.uint8)
    for img, q in ((smooth, 90), (noise, 40), (flat, 75), (diag, 75)):
        _, _, prog = decode_jpeg(encode_gray_jpeg_progressive(img, quality=q))
        _, _, base = decode_jpeg(encode_gray_jpeg(img, quality=q))
        assert np.array_equal(prog, base), (img.shape, q)
    # and the smooth gradient stays near-exact end to end
    _, _, luma = decode_jpeg(encode_gray_jpeg_progressive(smooth, quality=90))
    assert np.abs(luma.astype(int) - smooth.astype(int)).max() <= 2


def test_codec_jpeg_rejects_arithmetic_and_lossless():
    import struct

    from icerunner_spark.operators.codecs import decode_jpeg

    def seg(m, p):
        return bytes([0xFF, m]) + struct.pack(">H", len(p) + 2) + p

    for sof in (0xC3, 0xC9, 0xCA):  # lossless, arith sequential, arith progressive
        blob = b"\xff\xd8" + seg(
            sof, bytes([8]) + struct.pack(">HH", 8, 8) + bytes([1, 1, 0x11, 0])
        )
        with pytest.raises(ValueError, match="unsupported JPEG flavor"):
            decode_jpeg(blob)


# --------------------------------------------------------------------------- #
# WAV codec + decode_audio (r7)
# --------------------------------------------------------------------------- #


def test_codec_wav_roundtrip_mono_and_stereo():
    import numpy as np

    from icerunner_spark.operators.codecs import decode_wav, encode_wav

    s = (np.sin(np.arange(800) / 10) * 20000).astype(np.int16)
    rate, ch, nf, arr = decode_wav(encode_wav(s, 16000))
    assert (rate, ch, nf) == (16000, 1, 800)
    assert np.allclose(arr[:, 0], s / 32768.0)
    stereo = np.stack([s, -s], axis=1)
    rate, ch, nf, arr = decode_wav(encode_wav(stereo, 8000))
    assert (rate, ch, nf) == (8000, 2, 800)
    assert np.allclose(arr[:, 1], -s / 32768.0)


def test_codec_wav_rejects_compressed():
    import struct

    from icerunner_spark.operators.codecs import decode_wav

    # format tag 85 = MP3-in-WAV: honest refusal
    fmt = struct.pack("<HHIIHH", 85, 1, 8000, 8000, 1, 16)
    blob = (b"RIFF" + struct.pack("<I", 28) + b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", 0))
    with pytest.raises(ValueError, match="codec library"):
        decode_wav(blob)
    with pytest.raises(ValueError):
        decode_wav(b"OggS not a wav")


def test_decode_audio_real_wav_in_spark(spark):
    """decode_audio resolves WAV blobs through the real codec in the
    executor: rate/channels/frames/duration/rms pinned against numpy."""
    import numpy as np

    from icerunner_spark.operators.codecs import encode_wav

    s = (np.sin(np.arange(400) / 5) * 16000).astype(np.int16)
    out = decode_audio(_asset_df(spark, {1: encode_wav(s, 8000)})).collect()[0]
    assert (out["sample_rate"], out["n_channels"], out["n_frames"]) == (8000, 1, 400)
    assert out["duration_s"] == pytest.approx(0.05)
    v = s / 32768.0
    assert out["rms"] == pytest.approx(float(np.sqrt((v**2).mean())), abs=1e-9)
    assert out["peak"] == pytest.approx(float(np.abs(v).max()), abs=1e-9)
    # compressed audio hits the honest gate
    with pytest.raises(Exception, match="codec"):
        decode_audio(_asset_df(spark, {2: b"\xff\xfb\x90Dmp3frame"})).collect()


# --------------------------------------------------------------------------- #
# MJPEG-AVI codec + decode_video (r7)
# --------------------------------------------------------------------------- #


def test_codec_avi_mjpeg_roundtrip():
    import numpy as np

    from icerunner_spark.operators.codecs import decode_avi, encode_mjpeg_avi

    y, x = np.mgrid[0:16, 0:24]
    frames = [
        np.clip(f * 20 + y * 3 + x * 2, 0, 255).astype(np.uint8) for f in range(4)
    ]
    w, h, fps, dec = decode_avi(encode_mjpeg_avi(frames, fps=10, quality=90))
    assert (w, h, fps, len(dec)) == (24, 16, 10.0, 4)
    for d, f in zip(dec, frames):
        assert d.shape == f.shape
        # smooth frames at q90: every pixel within JPEG quantization slack
        assert np.abs(d.astype(int) - f.astype(int)).max() <= 3


def test_codec_avi_rejects_other_video_codecs():
    import struct

    from icerunner_spark.operators.codecs import decode_avi, encode_mjpeg_avi
    import numpy as np

    blob = bytearray(encode_mjpeg_avi([np.zeros((8, 8), np.uint8)]))
    i = blob.find(b"vidsMJPG")
    blob[i + 4 : i + 8] = b"H264"
    with pytest.raises(ValueError, match="only MJPEG"):
        decode_avi(bytes(blob))
    with pytest.raises(ValueError):
        decode_avi(b"RIFF\x04\x00\x00\x00WAVE")  # audio, not AVI


def test_decode_video_real_avi_in_spark(spark):
    """decode_video resolves AVI blobs through the real RIFF + JPEG
    codec chain in the executor; n_frames counts decoded frames and the
    mean luma lands within JPEG tolerance of the source frames."""
    import numpy as np

    from icerunner_spark.operators.codecs import encode_mjpeg_avi

    y, x = np.mgrid[0:16, 0:24]
    frames = [
        np.clip(f * 15 + y * 4 + x, 0, 255).astype(np.uint8) for f in range(3)
    ]
    out = decode_video(
        _asset_df(spark, {1: encode_mjpeg_avi(frames, fps=10)})
    ).collect()[0]
    assert (out["width"], out["height"], out["n_frames"]) == (24, 16, 3)
    assert out["fps"] == pytest.approx(10.0)
    want = float(np.mean([f.mean() for f in frames]))
    assert out["mean_luma"] == pytest.approx(want, abs=1.0)
    # non-AVI blob hits the honest gate
    with pytest.raises(Exception, match="codec"):
        decode_video(_asset_df(spark, {2: b"\x00\x00\x00\x20ftypisom"})).collect()


# --------------------------------------------------------------------------- #
# GIF codec (r7): variable-width LZW, interlace, multi-frame
# --------------------------------------------------------------------------- #


def test_codec_gif_roundtrip_plain_noise_interlaced():
    import numpy as np

    from icerunner_spark.operators.codecs import decode_gif, encode_gray_gif

    g = ((np.mgrid[0:20, 0:33][0] * 6 + np.mgrid[0:20, 0:33][1] * 3) % 256).astype(
        np.uint8
    )
    w, h, luma, n = decode_gif(encode_gray_gif(g))
    assert (w, h, n) == (33, 20, 1)
    assert np.array_equal(luma, g)  # gray palette: LZW is lossless
    # noise crosses 9->10->11-bit LZW widths and the 4096-entry reset
    noise = np.random.RandomState(5).randint(0, 256, (64, 64)).astype(np.uint8)
    _, _, luma, _ = decode_gif(encode_gray_gif(noise))
    assert np.array_equal(luma, noise)
    # interlaced: the 4-pass row order must invert exactly
    _, _, luma, _ = decode_gif(encode_gray_gif(g, interlace=True))
    assert np.array_equal(luma, g)


def test_codec_gif_multiframe_and_dispatch():
    import numpy as np

    from icerunner_spark.operators.codecs import (
        decode_gif,
        decode_image_bytes,
        encode_gray_gif,
    )

    g1 = ((np.mgrid[0:10, 0:12][0] * 9) % 256).astype(np.uint8)
    g2 = ((np.mgrid[0:10, 0:12][1] * 7) % 256).astype(np.uint8)
    b1 = encode_gray_gif(g1)
    b2 = encode_gray_gif(g2)
    img2 = b2[b2.index(b"\x2c", 13):]  # second file's image block + trailer
    multi = b1[:-1] + img2[:-1] + b"\x3b"
    w, h, luma, n = decode_gif(multi)
    assert (w, h, n) == (12, 10, 2)
    assert np.array_equal(luma, g1)  # first frame decodes; later counted
    # image dispatch resolves GIF too
    w, h, luma = decode_image_bytes(b1)
    assert np.array_equal(luma, g1)
    with pytest.raises(ValueError):
        decode_gif(b"GIF8 but truncated")


# --------------------------------------------------------------------------- #
# TIFF codec (r7): baseline strips, PackBits, both byte orders
# --------------------------------------------------------------------------- #


def _tiff_blob(px, photo, spp, extra_tags=()):
    """Hand-build a single-strip little-endian TIFF around raw pixels."""
    import struct

    h, w = px.shape[0], px.shape[1]
    raw = px.tobytes()
    tags = [
        (256, 3, 1, w), (257, 3, 1, h), (258, 3, 1, 8), (259, 3, 1, 1),
        (262, 3, 1, photo), (277, 3, 1, spp), (278, 3, 1, h),
        (279, 4, 1, len(raw)),
    ] + list(extra_tags)
    n = len(tags) + 1  # + StripOffsets
    strip_off = 8 + 2 + 12 * n + 4
    ext = b""
    ents = []
    for tag, typ, count, val in tags:
        if isinstance(val, (list, tuple)):  # out-of-line SHORT array
            ents.append(struct.pack("<HHII", tag, typ, count,
                                    strip_off + len(raw) + len(ext)))
            ext += struct.pack(f"<{count}H", *val)
        elif typ == 3:
            ents.append(struct.pack("<HHIHH", tag, typ, count, val, 0))
        else:
            ents.append(struct.pack("<HHII", tag, typ, count, val))
    ents.append(struct.pack("<HHII", 273, 4, 1, strip_off))
    ents.sort()  # IFD entries must be tag-ordered
    return (b"II\x2a\x00" + struct.pack("<I", 8) + struct.pack("<H", n)
            + b"".join(ents) + struct.pack("<I", 0) + raw + ext)


def test_codec_tiff_gray_roundtrips_all_variants():
    import numpy as np

    from icerunner_spark.operators.codecs import decode_tiff, encode_gray_tiff

    g = ((np.mgrid[0:17, 0:29][0] * 6 + np.mgrid[0:17, 0:29][1] * 3) % 256).astype(
        np.uint8
    )
    for packbits in (False, True):
        for big_endian in (False, True):
            w, h, luma = decode_tiff(
                encode_gray_tiff(g, packbits=packbits, big_endian=big_endian)
            )
            assert (w, h) == (29, 17)
            assert np.array_equal(luma, g), (packbits, big_endian)
    # long runs exercise PackBits repeat packets
    flat = np.repeat(np.arange(16, dtype=np.uint8) * 16, 40).reshape(16, 40)
    _, _, luma = decode_tiff(encode_gray_tiff(flat, packbits=True))
    assert np.array_equal(luma, flat)


def test_codec_tiff_rgb_palette_whitezero():
    import numpy as np

    from icerunner_spark.operators.codecs import decode_tiff

    g = ((np.mgrid[0:6, 0:9][0] * 20 + np.mgrid[0:6, 0:9][1] * 7) % 256).astype(
        np.uint8
    )
    # RGB with distinct channels: BT.601 integer luma
    rgb = np.stack([g, (g.astype(np.int64) + 30) % 256,
                    (g.astype(np.int64) + 60) % 256], axis=2).astype(np.uint8)
    w, h, luma = decode_tiff(_tiff_blob(rgb, photo=2, spp=3))
    r32 = rgb.astype(np.uint32)
    want = (299 * r32[:, :, 0] + 587 * r32[:, :, 1] + 114 * r32[:, :, 2]) // 1000
    assert np.array_equal(luma, want.astype(np.uint8))
    # white-is-zero gray inverts
    w, h, luma = decode_tiff(_tiff_blob(g[:, :, None], photo=0, spp=1))
    assert np.array_equal(luma, 255 - g)
    # palette: 4-entry ColorMap (16-bit per channel, planar R,G,B)
    idx = np.array([[0, 1], [2, 3]], dtype=np.uint8)[:, :, None]
    cmap = [255 << 8, 0, 0, 100 << 8] + [0, 255 << 8, 0, 100 << 8] + \
           [0, 0, 255 << 8, 100 << 8]
    w, h, luma = decode_tiff(
        _tiff_blob(idx, photo=3, spp=1, extra_tags=[(320, 3, 12, cmap)])
    )
    want = np.array([[299 * 255 // 1000, 587 * 255 // 1000],
                     [114 * 255 // 1000, 100]], dtype=np.uint8)
    assert np.array_equal(luma, want)


def test_codec_tiff_rejects_unsupported():
    import numpy as np

    from icerunner_spark.operators.codecs import decode_tiff

    g = np.zeros((4, 4, 1), np.uint8)
    blob = bytearray(_tiff_blob(g, photo=1, spp=1))
    # patch compression (tag 259) to 7 = JPEG-in-TIFF (genuinely gated)
    i = blob.index(bytes.fromhex("0301") + b"\x03\x00\x01\x00\x00\x00\x01\x00")
    blob[i + 8] = 7
    with pytest.raises(ValueError, match="compression"):
        decode_tiff(bytes(blob))
    # floating-point predictor (3): refused honestly
    blob2 = _tiff_blob(g, photo=1, spp=1, extra_tags=[(317, 3, 1, 3)])
    with pytest.raises(ValueError, match="predictor"):
        decode_tiff(blob2)
    with pytest.raises(ValueError):
        decode_tiff(b"II\x2b\x00 not classic tiff")


def test_codec_tiff_horizontal_predictor():
    """Predictor 2 (horizontal differencing, the usual companion of LZW
    TIFFs): per-row difference coding undone by a row cumsum."""
    import numpy as np

    from icerunner_spark.operators.codecs import decode_tiff

    g = ((np.mgrid[0:5, 0:8][0] * 30 + np.mgrid[0:5, 0:8][1] * 11) % 256).astype(
        np.uint8
    )
    diffed = g.astype(np.int64).copy()
    diffed[:, 1:] = (g[:, 1:].astype(np.int64) - g[:, :-1].astype(np.int64)) % 256
    blob = _tiff_blob(
        diffed.astype(np.uint8)[:, :, None], photo=1, spp=1,
        extra_tags=[(317, 3, 1, 2)],
    )
    w, h, luma = decode_tiff(blob)
    assert np.array_equal(luma, g)


def test_codec_tiff_lzw_and_deflate():
    """TIFF-flavor LZW (MSB-first packing, spec early width change,
    dictionary reset at 4094) and zlib Deflate strips roundtrip exactly,
    in both byte orders, on gradient / noise / reset-stress images."""
    import numpy as np

    from icerunner_spark.operators.codecs import decode_tiff, encode_gray_tiff

    g = ((np.mgrid[0:23, 0:31][0] * 6 + np.mgrid[0:23, 0:31][1] * 3) % 256).astype(
        np.uint8
    )
    noise = np.random.RandomState(9).randint(0, 256, (48, 48)).astype(np.uint8)
    huge = np.random.RandomState(11).randint(0, 256, (128, 128)).astype(np.uint8)
    for comp in ("lzw", "deflate"):
        for img in (g, noise, huge):
            for be in (False, True):
                _, _, luma = decode_tiff(
                    encode_gray_tiff(img, big_endian=be, compression=comp)
                )
                assert np.array_equal(luma, img), (comp, be, img.shape)


def test_codec_jpeg_progressive_color_interleaved_dc():
    """Color progressive (SOF2, 3 components): the DC scan is MCU-
    INTERLEAVED (the one progressive scan type that may carry multiple
    components) followed by per-component AC scans — hand-built with Y
    from a known image and zero chroma, pinned within baseline
    quantization tolerance."""
    import struct

    import numpy as np

    from icerunner_spark.operators import codecs as C
    from icerunner_spark.operators.codecs import decode_jpeg

    g = ((np.mgrid[0:16, 0:16][0] * 5 + np.mgrid[0:16, 0:16][1] * 3) % 200).astype(
        np.uint8
    )
    q = np.clip((C._K1_QUANT * 20 + 50) // 100, 1, 255)
    dc = C._canonical_codes(C._DC_LUM_COUNTS, C._DC_LUM_SYMBOLS)
    ac = C._canonical_codes(C._AC_LUM_COUNTS, C._AC_LUM_SYMBOLS)
    enc_dc = {s: (c, l) for (l, c), s in dc.items()}
    enc_ac = {s: (c, l) for (l, c), s in ac.items()}

    def cat(v):
        return int(v != 0 and np.floor(np.log2(abs(v))) + 1)

    blocks = []
    for by in range(2):
        for bx in range(2):
            blk = g[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8].astype(float)
            coef = C._DCT_M @ (blk - 128) @ C._DCT_M.T
            blocks.append(np.round(coef.reshape(-1)[C._ZIGZAG] / q).astype(np.int64))

    def seg(m, p):
        return bytes([0xFF, m]) + struct.pack(">H", len(p) + 2) + p

    out = bytearray(b"\xff\xd8")
    out += seg(0xDB, bytes([0]) + bytes(int(v) for v in q))
    out += seg(0xC2, bytes([8]) + struct.pack(">HH", 16, 16)
               + bytes([3, 1, 0x11, 0, 2, 0x11, 0, 3, 0x11, 0]))
    out += seg(0xC4, bytes([0x00]) + bytes(C._DC_LUM_COUNTS)
               + bytes(C._DC_LUM_SYMBOLS) + bytes([0x10])
               + bytes(C._AC_LUM_COUNTS) + bytes(C._AC_LUM_SYMBOLS))
    # interleaved DC-first scan: per MCU, Y DC diff + two zero chroma DCs
    bw = C._BitWriter()
    pred = 0
    for zz in blocks:
        v = int(zz[0])
        d = v - pred
        pred = v
        t = cat(d)
        c, l = enc_dc[t]
        bw.write(c, l)
        if t:
            bw.write(d if d > 0 else d + (1 << t) - 1, t)
        for _ in range(2):
            c, l = enc_dc[0]
            bw.write(c, l)
    bw.flush()
    out += seg(0xDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 0, 0])) + bytes(bw.out)
    # Y AC 1..63 first scan
    bw = C._BitWriter()
    for zz in blocks:
        va = [int(zz[k]) for k in range(1, 64)]
        nz = [i for i, v in enumerate(va) if v]
        last = nz[-1] if nz else -1
        run, i = 0, 0
        while i <= last:
            v = va[i]
            if v == 0:
                run += 1
                i += 1
                continue
            while run > 15:
                c, l = enc_ac[0xF0]
                bw.write(c, l)
                run -= 16
            s = cat(v)
            c, l = enc_ac[(run << 4) | s]
            bw.write(c, l)
            bw.write(v if v > 0 else v + (1 << s) - 1, s)
            run, i = 0, i + 1
        if last < 62:
            c, l = enc_ac[0x00]
            bw.write(c, l)
    bw.flush()
    out += seg(0xDA, bytes([1, 1, 0x00, 1, 63, 0])) + bytes(bw.out)
    # chroma AC scans: all-zero bands, one EOB per block
    for comp in (2, 3):
        bw = C._BitWriter()
        for _ in blocks:
            c, l = enc_ac[0x00]
            bw.write(c, l)
        bw.flush()
        out += seg(0xDA, bytes([1, comp, 0x00, 1, 63, 0])) + bytes(bw.out)
    out += b"\xff\xd9"

    w, h, luma = decode_jpeg(bytes(out))
    assert (w, h) == (16, 16)
    assert np.abs(luma.astype(int) - g.astype(int)).max() <= 3


# --------------------------------------------------------------------------- #
# perceptual dHash (operators.multimodal.dhash_images)
# --------------------------------------------------------------------------- #


def test_dhash_matches_reference_bits(spark):
    """The packed 64-bit signature equals the bit-by-bit reference
    computed here from the decoded luma (independent packing order
    check: bit y*8+x, signed-long wrap)."""
    import numpy as np

    from icerunner_spark.operators.codecs import encode_gray_bmp
    from icerunner_spark.operators.multimodal import as_assets, dhash_images

    rng = np.random.default_rng(7)
    imgs = {i: rng.integers(0, 256, (16, 25), dtype=np.uint8).astype(np.uint8)
            for i in range(6)}
    df = spark.createDataFrame(
        [(i, bytearray(encode_gray_bmp(a))) for i, a in imgs.items()],
        "doc_id long, blob binary",
    )
    assets = as_assets(df, "doc_id", "blob", kind="image")
    got = {r["id"]: r["sig"] for r in dhash_images(assets).collect()}
    for i, a in imgs.items():
        ys = (np.arange(8) * 16) // 8
        xs = (np.arange(9) * 25) // 9
        g = a[ys][:, xs].astype(int)
        want = 0
        for y in range(8):
            for x in range(8):
                if g[y, x + 1] > g[y, x]:
                    want |= 1 << (y * 8 + x)
        if want >= 1 << 63:
            want -= 1 << 64
        assert got[i] == want


def test_dhash_near_and_far(spark):
    """A lightly-perturbed copy stays within a few bits; an unrelated
    image does not — and the banded pair join finds exactly the close
    pair."""
    import numpy as np

    from icerunner_spark.operators.codecs import encode_gray_bmp
    from icerunner_spark.operators.dedup import hamming_neardup_pairs
    from icerunner_spark.operators.multimodal import as_assets, dhash_images

    rng = np.random.default_rng(11)
    base = rng.integers(0, 256, (32, 32), dtype=np.uint8).astype(np.uint8)
    near = base.copy()
    near[:2, :2] = 255 - near[:2, :2]  # local edit
    far = rng.permutation(base.ravel()).reshape(32, 32).astype(np.uint8)
    df = spark.createDataFrame(
        [(0, bytearray(encode_gray_bmp(base))),
         (1, bytearray(encode_gray_bmp(near))),
         (2, bytearray(encode_gray_bmp(far)))],
        "doc_id long, blob binary",
    )
    sigs = dhash_images(as_assets(df, "doc_id", "blob", kind="image"))
    pairs = {(r["id1"], r["id2"]): r["distance"]
             for r in hamming_neardup_pairs(
                 sigs, max_distance=7, chunk_bits=8).collect()}
    assert (0, 1) in pairs and pairs[(0, 1)] <= 7
    assert (0, 2) not in pairs and (1, 2) not in pairs


def test_audio_fingerprint_gain_invariant_and_discriminating(spark):
    """Scaling amplitude scales every frame energy by the same factor,
    so the delta-sign fingerprint is identical; an unrelated signal is
    far away; the banded join pairs only the true matches."""
    import numpy as np

    from icerunner_spark.operators.codecs import encode_wav
    from icerunner_spark.operators.dedup import hamming_neardup_pairs
    from icerunner_spark.operators.multimodal import (
        as_assets,
        audio_fingerprints,
    )

    rng = np.random.default_rng(3)
    t = np.arange(65 * 64)
    base = (2000 * np.sin(t / 17) * (1 + 0.5 * np.sin(t / 301))).astype(
        np.int16
    )
    half = (base.astype(np.int32) // 2).astype(np.int16)  # -6 dB copy
    noise = rng.integers(-2000, 2000, len(t)).astype(np.int16)
    df = spark.createDataFrame(
        [(0, bytearray(encode_wav(base, 8000))),
         (1, bytearray(encode_wav(half, 8000))),
         (2, bytearray(encode_wav(noise, 8000)))],
        "doc_id long, blob binary",
    )
    sigs = audio_fingerprints(
        as_assets(df, "doc_id", "blob", kind="audio")
    )
    by_id = {r["id"]: r["sig"] for r in sigs.collect()}
    # halving int16 amplitudes floors odd samples, so the copy is close
    # but not necessarily identical — the near-dup contract, not equality
    d01 = bin((by_id[0] ^ by_id[1]) & ((1 << 64) - 1)).count("1")
    assert d01 <= 7, f"gain-shifted copy drifted {d01} bits"
    pairs = {(r["id1"], r["id2"])
             for r in hamming_neardup_pairs(
                 sigs, max_distance=7, chunk_bits=8).collect()}
    assert (0, 1) in pairs
    assert (0, 2) not in pairs and (1, 2) not in pairs


def test_video_dhash_neardup_finds_brightness_shifted_copy(spark):
    """dHash is invariant to constant brightness shifts, so a +10-luma
    re-encode of the same clip matches nearly frame-for-frame even
    through JPEG loss; an unrelated clip does not pair."""
    import numpy as np

    from icerunner_spark.operators.codecs import encode_mjpeg_avi
    from icerunner_spark.operators.multimodal import (
        as_assets,
        dhash_video_frames,
        video_neardup_pairs,
    )

    rng = np.random.default_rng(5)
    y, x = np.mgrid[0:16, 0:16]

    def clip(offset, scramble=False):
        frames = []
        for fi in range(4):
            v = ((fi * 11 + 3 * y + 5 * x) % 200 + offset).astype(np.uint8)
            if scramble:
                v = rng.permutation(v.ravel()).reshape(16, 16).astype(np.uint8)
            frames.append(v)
        return encode_mjpeg_avi(frames, fps=5)

    df = spark.createDataFrame(
        [(0, bytearray(clip(0))), (1, bytearray(clip(10))),
         (2, bytearray(clip(0, scramble=True)))],
        "doc_id long, blob binary",
    )
    assets = as_assets(df, "doc_id", "blob", kind="video")
    sigs = dhash_video_frames(assets)
    assert sigs.count() == 12  # 3 clips x 4 frames
    pairs = {(r["id1"], r["id2"]): r["n_matching_frames"]
             for r in video_neardup_pairs(
                 sigs, max_distance=7, min_matching_frames=2).collect()}
    assert (0, 1) in pairs and pairs[(0, 1)] >= 2
    assert (0, 2) not in pairs and (1, 2) not in pairs


def test_video_dhash_every_n_subsamples(spark):
    import numpy as np

    from icerunner_spark.operators.codecs import encode_mjpeg_avi
    from icerunner_spark.operators.multimodal import (
        as_assets,
        dhash_video_frames,
    )

    y, x = np.mgrid[0:16, 0:16]
    frames = [((fi * 7 + y + x) % 250).astype(np.uint8) for fi in range(6)]
    df = spark.createDataFrame(
        [(9, bytearray(encode_mjpeg_avi(frames, fps=5)))],
        "doc_id long, blob binary",
    )
    sigs = dhash_video_frames(
        as_assets(df, "doc_id", "blob", kind="video"), every_n=2
    )
    got = sorted(r["frame_idx"] for r in sigs.collect())
    assert got == [0, 2, 4]


def test_audio_spectral_fingerprint_robust_and_discriminating(spark):
    """The HK spectral fingerprint survives gain change AND mild
    additive noise (where the plain energy fingerprint may not), and
    separates unrelated signals; the banded join pairs only the true
    matches."""
    import numpy as np

    from icerunner_spark.operators.codecs import encode_wav
    from icerunner_spark.operators.dedup import hamming_neardup_pairs
    from icerunner_spark.operators.multimodal import (
        as_assets,
        audio_spectral_fingerprints,
    )

    rng = np.random.default_rng(23)
    n = 128 * 8 + 256
    t = np.arange(n)
    # a chirpy tone stack: distinct band structure per frame
    base = (
        6000 * np.sin(2 * np.pi * t * (0.01 + 0.00002 * t))
        + 3000 * np.sin(2 * np.pi * 0.11 * t)
    ).astype(np.int16)
    gain = (base.astype(np.int32) * 2 // 3).astype(np.int16)
    noisy = (base + rng.integers(-300, 300, n)).astype(np.int16)
    other = (
        6000 * np.sin(2 * np.pi * t * (0.2 - 0.00002 * t))
        + 3000 * np.sin(2 * np.pi * 0.31 * t)
    ).astype(np.int16)
    df = spark.createDataFrame(
        [(0, bytearray(encode_wav(base, 8000))),
         (1, bytearray(encode_wav(gain, 8000))),
         (2, bytearray(encode_wav(noisy, 8000))),
         (3, bytearray(encode_wav(other, 8000)))],
        "doc_id long, blob binary",
    )
    sigs = audio_spectral_fingerprints(
        as_assets(df, "doc_id", "blob", kind="audio")
    )
    by_id = {r["id"]: r["sig"] for r in sigs.collect()}

    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    assert ham(by_id[0], by_id[1]) <= 7, "gain copy drifted"
    assert ham(by_id[0], by_id[2]) <= 7, "mild noise drifted"
    assert ham(by_id[0], by_id[3]) > 7, "unrelated signal too close"
    pairs = {(r["id1"], r["id2"])
             for r in hamming_neardup_pairs(
                 sigs, max_distance=7, chunk_bits=8).collect()}
    assert (0, 1) in pairs and (0, 2) in pairs
    assert not any(3 in p for p in pairs)
