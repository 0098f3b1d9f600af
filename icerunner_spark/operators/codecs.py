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

import numpy as np

__all__ = [
    "decode_bmp",
    "decode_image_bytes",
    "decode_pnm",
    "encode_gray_bmp",
    "encode_pgm",
    "encode_ppm",
    "sniff_format",
]


def sniff_format(b: bytes) -> str | None:
    """Return 'bmp' | 'ppm' | 'pgm' for blobs these codecs can decode,
    else None (caller falls back to PIL or the honest gate)."""
    if len(b) >= 2 and b[:2] == b"BM":
        return "bmp"
    if len(b) >= 2 and b[:2] == b"P6":
        return "ppm"
    if len(b) >= 2 and b[:2] == b"P5":
        return "pgm"
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


def decode_image_bytes(b: bytes) -> tuple[int, int, np.ndarray]:
    """Dispatch on magic bytes: (width, height, luma uint8 (h, w)) for
    any format these codecs handle; ValueError otherwise."""
    fmt = sniff_format(b)
    if fmt == "bmp":
        return decode_bmp(b)
    if fmt in ("ppm", "pgm"):
        return decode_pnm(b)
    raise ValueError("no pure-python codec for this blob (need PIL)")
