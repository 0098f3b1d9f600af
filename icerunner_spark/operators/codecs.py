"""Dependency-free image codecs for uncompressed formats (BMP, PPM, PGM).

The multimodal operators (operators.multimodal) treat blobs as opaque
binary and run all byte work in Arrow-batched ``mapInPandas`` stages.
Decode was previously gated entirely on PIL (absent in this container);
these pure numpy codecs de-gate it for the uncompressed formats, so
``decode_images`` / ``resize_images`` perform a REAL pixel decode
in-container — header parsing, bottom-up row order, scanline padding,
channel-to-luma conversion — while compressed formats (JPEG/PNG) still
require PIL and keep the honest NotImplementedError gate.

Formats:
- BMP: 24-bit BI_RGB with BITMAPINFOHEADER, the uncompressed baseline
  every tool writes. Bottom-up (positive height) and top-down (negative
  height) row orders both decode; scanlines are 4-byte padded; pixels
  are stored BGR.
- PPM (P6) / PGM (P5): binary netpbm with maxval 255 — whitespace-and-
  comment header, then raw samples row-major top-down.

Luma uses the ITU-R BT.601 integer formula PIL's ``convert("L")``
applies — (299 R + 587 G + 114 B) // 1000 — so a PIL-equipped
environment produces identical values on the same blobs.

All functions are plain bytes -> numpy so they compose inside any
mapInPandas batch loop without touching Spark types.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

__all__ = [
    "decode_bmp",
    "decode_image_bytes",
    "decode_png",
    "decode_pnm",
    "encode_gray_bmp",
    "encode_pgm",
    "encode_png",
    "encode_ppm",
    "sniff_format",
]

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def sniff_format(b: bytes) -> str | None:
    """Return 'bmp' | 'ppm' | 'pgm' | 'png' for blobs these codecs can
    decode, else None (caller falls back to PIL or the honest gate)."""
    if len(b) >= 2 and b[:2] == b"BM":
        return "bmp"
    if len(b) >= 2 and b[:2] == b"P6":
        return "ppm"
    if len(b) >= 2 and b[:2] == b"P5":
        return "pgm"
    if len(b) >= 8 and b[:8] == _PNG_SIG:
        return "png"
    return None


# --------------------------------------------------------------------------- #
# BMP (24-bit BI_RGB, BITMAPINFOHEADER)
# --------------------------------------------------------------------------- #


def encode_gray_bmp(gray: np.ndarray) -> bytes:
    """Encode a (h, w) uint8 grayscale array as a 24-bit BI_RGB BMP
    (r = g = b), bottom-up rows, 4-byte padded scanlines."""
    gray = np.asarray(gray, dtype=np.uint8)
    h, w = gray.shape
    row_size = (w * 3 + 3) // 4 * 4
    img_size = row_size * h
    header = struct.pack("<2sIHHI", b"BM", 54 + img_size, 0, 0, 54)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0)
    rows = np.zeros((h, row_size), dtype=np.uint8)
    bgr = np.repeat(gray[:, :, None], 3, axis=2)  # gray -> B=G=R
    rows[:, : w * 3] = bgr.reshape(h, w * 3)
    return header + dib + rows[::-1].tobytes()  # bottom-up storage


def decode_bmp(b: bytes) -> tuple[int, int, np.ndarray]:
    """Decode a 24-bit BI_RGB BMP to (width, height, luma uint8 (h, w)).
    Handles bottom-up (height > 0) and top-down (height < 0) storage and
    padded scanlines. Raises ValueError on other BMP flavors."""
    if len(b) < 54 or b[:2] != b"BM":
        raise ValueError("not a BMP blob")
    data_offset = struct.unpack_from("<I", b, 10)[0]
    dib_size, w, h_signed = struct.unpack_from("<Iii", b, 14)
    if dib_size < 40:
        raise ValueError(f"unsupported BMP header size {dib_size}")
    planes, bpp, compression = struct.unpack_from("<HHI", b, 26)
    if bpp != 24 or compression != 0:
        raise ValueError(
            f"unsupported BMP flavor (bpp={bpp}, compression={compression}); "
            "only 24-bit BI_RGB decodes without PIL"
        )
    h = abs(h_signed)
    row_size = (w * 3 + 3) // 4 * 4
    need = data_offset + row_size * h
    if len(b) < need:
        raise ValueError(f"truncated BMP: {len(b)} bytes, need {need}")
    rows = np.frombuffer(b, dtype=np.uint8, count=row_size * h, offset=data_offset)
    rows = rows.reshape(h, row_size)[:, : w * 3].reshape(h, w, 3)
    if h_signed > 0:
        rows = rows[::-1]  # stored bottom-up -> top-down
    bgr = rows.astype(np.uint32)
    luma = (299 * bgr[:, :, 2] + 587 * bgr[:, :, 1] + 114 * bgr[:, :, 0]) // 1000
    return w, h, luma.astype(np.uint8)


# --------------------------------------------------------------------------- #
# netpbm (P6 PPM / P5 PGM, binary, maxval <= 255)
# --------------------------------------------------------------------------- #


def encode_ppm(rgb: np.ndarray) -> bytes:
    """Encode a (h, w, 3) uint8 array as binary PPM (P6, maxval 255)."""
    rgb = np.asarray(rgb, dtype=np.uint8)
    h, w, _ = rgb.shape
    return f"P6\n{w} {h}\n255\n".encode() + rgb.tobytes()


def encode_pgm(gray: np.ndarray) -> bytes:
    """Encode a (h, w) uint8 array as binary PGM (P5, maxval 255)."""
    gray = np.asarray(gray, dtype=np.uint8)
    h, w = gray.shape
    return f"P5\n{w} {h}\n255\n".encode() + gray.tobytes()


def _pnm_header(b: bytes) -> tuple[int, int, int, int]:
    """Parse the netpbm header after the magic: returns (width, height,
    maxval, data_offset). Tokens are separated by whitespace; '#' starts
    a comment running to end-of-line; exactly one whitespace byte
    follows maxval before the raster."""
    vals: list[int] = []
    i = 2
    n = len(b)
    while len(vals) < 3:
        while i < n and b[i : i + 1].isspace():
            i += 1
        if i < n and b[i : i + 1] == b"#":
            while i < n and b[i] not in (0x0A, 0x0D):
                i += 1
            continue
        j = i
        while j < n and not b[j : j + 1].isspace():
            j += 1
        if j == i:
            raise ValueError("truncated netpbm header")
        vals.append(int(b[i:j]))
        i = j
    return vals[0], vals[1], vals[2], i + 1  # single whitespace after maxval


def decode_pnm(b: bytes) -> tuple[int, int, np.ndarray]:
    """Decode binary PPM (P6) or PGM (P5) to (width, height, luma uint8)."""
    magic = b[:2]
    if magic not in (b"P5", b"P6"):
        raise ValueError("not a binary netpbm blob")
    w, h, maxval, off = _pnm_header(b)
    if maxval > 255:
        raise ValueError(f"unsupported netpbm maxval {maxval}")
    channels = 3 if magic == b"P6" else 1
    need = off + w * h * channels
    if len(b) < need:
        raise ValueError(f"truncated netpbm: {len(b)} bytes, need {need}")
    arr = np.frombuffer(b, dtype=np.uint8, count=w * h * channels, offset=off)
    if channels == 1:
        return w, h, arr.reshape(h, w).copy()
    rgb = arr.reshape(h, w, 3).astype(np.uint32)
    luma = (299 * rgb[:, :, 0] + 587 * rgb[:, :, 1] + 114 * rgb[:, :, 2]) // 1000
    return w, h, luma.astype(np.uint8)


# --------------------------------------------------------------------------- #
# PNG (RFC 2083 / W3C spec): stdlib zlib inflate + numpy unfiltering.
# Supported: bit depth 8, color types 0 (gray), 2 (RGB), 3 (palette),
# 4 (gray+alpha), 6 (RGBA), interlace 0. Adam7 / 16-bit / sub-byte depths
# raise ValueError and fall through to the PIL gate.
# --------------------------------------------------------------------------- #

_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _png_chunk(kind: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + kind
        + data
        + struct.pack(">I", zlib.crc32(kind + data) & 0xFFFFFFFF)
    )


def encode_png(img: np.ndarray) -> bytes:
    """Encode a (h, w) gray or (h, w, 3) RGB uint8 array as a PNG
    (bit depth 8, filter 0 on every scanline, one IDAT)."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        h, w = img.shape
        color_type, ch = 0, 1
    elif img.ndim == 3 and img.shape[2] == 3:
        h, w, _ = img.shape
        color_type, ch = 2, 3
    else:
        raise ValueError(f"encode_png: unsupported array shape {img.shape}")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = np.zeros((h, 1 + w * ch), dtype=np.uint8)
    raw[:, 1:] = img.reshape(h, w * ch)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw.tobytes(), 6))
        + _png_chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _png_unfilter(raw: np.ndarray, h: int, stride: int, ch: int) -> np.ndarray:
    """Reverse the per-scanline filters. Rows of ``raw`` are (filter_byte,
    stride data bytes). none/up/sub vectorize (sub is a per-channel
    cumulative sum); average/paeth carry a same-row byte dependency and
    walk the row."""
    out = np.zeros((h, stride), dtype=np.uint8)
    for y in range(h):
        ftype = int(raw[y, 0])
        line = raw[y, 1:].astype(np.int32)
        prev = out[y - 1].astype(np.int32) if y > 0 else np.zeros(stride, np.int32)
        if ftype == 0:
            rec = line
        elif ftype == 1:  # sub: recon[i] = raw[i] + recon[i-ch]
            cols = line.reshape(-1, ch)
            rec = np.cumsum(cols, axis=0, dtype=np.int64).reshape(-1)
        elif ftype == 2:  # up
            rec = line + prev
        elif ftype == 3:  # average
            rec = np.zeros(stride, np.int32)
            for i in range(stride):
                left = rec[i - ch] if i >= ch else 0
                rec[i] = line[i] + ((left + prev[i]) >> 1)
                rec[i] &= 0xFF
        elif ftype == 4:  # paeth
            rec = np.zeros(stride, np.int32)
            for i in range(stride):
                left = rec[i - ch] if i >= ch else 0
                ul = prev[i - ch] if i >= ch else 0
                rec[i] = line[i] + _paeth(int(left), int(prev[i]), int(ul))
                rec[i] &= 0xFF
        else:
            raise ValueError(f"bad PNG filter type {ftype} on row {y}")
        out[y] = (rec & 0xFF).astype(np.uint8)
    return out


def decode_png(b: bytes) -> tuple[int, int, np.ndarray]:
    """Decode a PNG to (width, height, luma uint8 (h, w)). Gray returns
    the gray channel; palette resolves through PLTE then BT.601; RGB(A)
    converts via the BT.601 integer formula (alpha ignored, matching
    PIL ``convert("L")`` on the RGB values)."""
    if len(b) < 8 or b[:8] != _PNG_SIG:
        raise ValueError("not a PNG blob")
    pos, ihdr, plte, idat = 8, None, None, []
    while pos + 8 <= len(b):
        (length,), kind = struct.unpack_from(">I", b, pos), b[pos + 4 : pos + 8]
        data = b[pos + 8 : pos + 8 + length]
        if len(data) < length:
            raise ValueError("truncated PNG chunk")
        if kind == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif kind == b"PLTE":
            plte = np.frombuffer(data, np.uint8).reshape(-1, 3)
        elif kind == b"IDAT":
            idat.append(data)
        elif kind == b"IEND":
            break
        pos += 12 + length
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, depth, color_type, comp, filt, interlace = ihdr
    if depth != 8 or comp != 0 or filt != 0 or interlace != 0:
        raise ValueError(
            f"unsupported PNG flavor (depth={depth}, interlace={interlace}); "
            "only 8-bit non-interlaced decodes without PIL"
        )
    if color_type not in _PNG_CHANNELS:
        raise ValueError(f"unsupported PNG color type {color_type}")
    ch = _PNG_CHANNELS[color_type]
    stride = w * ch
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), np.uint8)
    if raw.size != h * (stride + 1):
        raise ValueError(
            f"PNG raster size {raw.size}, expected {h * (stride + 1)}"
        )
    px = _png_unfilter(raw.reshape(h, stride + 1), h, stride, ch).reshape(h, w, ch)
    if color_type == 0:
        return w, h, px[:, :, 0].copy()
    if color_type == 4:
        return w, h, px[:, :, 0].copy()  # gray channel; alpha ignored
    if color_type == 3:
        if plte is None:
            raise ValueError("palette PNG missing PLTE")
        rgb = plte[px[:, :, 0]].astype(np.uint32)
    else:  # 2 (RGB) or 6 (RGBA): first three channels
        rgb = px[:, :, :3].astype(np.uint32)
    luma = (299 * rgb[:, :, 0] + 587 * rgb[:, :, 1] + 114 * rgb[:, :, 2]) // 1000
    return w, h, luma.astype(np.uint8)


def decode_image_bytes(b: bytes) -> tuple[int, int, np.ndarray]:
    """Dispatch on magic bytes: (width, height, luma uint8 (h, w)) for
    any format these codecs handle; ValueError otherwise."""
    fmt = sniff_format(b)
    if fmt == "bmp":
        return decode_bmp(b)
    if fmt in ("ppm", "pgm"):
        return decode_pnm(b)
    if fmt == "png":
        return decode_png(b)
    raise ValueError("no pure-python codec for this blob (need PIL)")
