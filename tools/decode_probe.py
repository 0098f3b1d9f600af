"""Per-megapixel decode-cost probe for the dependency-free codecs
(r7 verdict item 4).

The multimodal oracle queries bench over tiny fixture blobs (~0.4 s for
40 blobs), which says nothing about the pure-Python Huffman/LZW loops'
cost on REAL image sizes. This probe encodes deterministic synthetic
images at realistic 0.1-1 MP sizes with our own encoders, decodes each
median-of-3, and records sec/megapixel per format — the constant that
decides whether the numpy codecs are a viable production path or (as
SCALE.md claims) a correctness/portability floor behind the PIL-first
resolution order (operators/multimodal.py prefers PIL per blob when
installed). If PIL is importable the same blobs are decoded through it
for a direct ratio; in this container it is absent and the column
records null.

Decode is a narrow mapInPandas map (blobs never shuffle), so cluster
throughput is cores / (sec/MP) megapixels per second per executor —
driver-side timing here measures exactly the per-core constant.

Usage:  python tools/decode_probe.py
Output: one JSON line; merges a "decode_sec_per_mp" section into
        SCALE_PROBE.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from icerunner_spark.operators import codecs  # noqa: E402

try:  # pragma: no cover - absent in this container
    from PIL import Image as _PIL_Image

    _HAS_PIL = True
except ImportError:
    _HAS_PIL = False


def _gray(mp: float, seed: int) -> np.ndarray:
    """Deterministic grayscale test image of ~mp megapixels: a gradient
    plus seeded texture — compressible like a photo, not a flat field
    (flat fields make RLE/Huffman look unrealistically cheap)."""
    side = int((mp * 1_000_000) ** 0.5)
    rng = np.random.RandomState(seed)
    y, x = np.mgrid[0:side, 0:side]
    img = (x + y) * 255.0 / (2 * side) + rng.randint(-25, 26, (side, side))
    return np.clip(img, 0, 255).astype(np.uint8)


def _rgb(mp: float, seed: int) -> np.ndarray:
    g = _gray(mp, seed)
    return np.stack([g, np.roll(g, 7, 0), np.roll(g, 13, 1)], axis=-1)


# format -> (encoder, target megapixels). JPEG probes at smaller sizes:
# the per-MP cost is the constant under test and the interpreted Huffman
# loop makes 1 MP trials slow without changing the answer.
_CASES = {
    "bmp": (lambda mp: codecs.encode_gray_bmp(_gray(mp, 1)), 1.0),
    "ppm": (lambda mp: codecs.encode_ppm(_rgb(mp, 2)), 1.0),
    "png": (lambda mp: codecs.encode_png(_gray(mp, 3)), 0.5),
    "gif": (lambda mp: codecs.encode_gray_gif(_gray(mp, 4)), 0.25),
    "tiff_lzw": (
        lambda mp: codecs.encode_gray_tiff(_gray(mp, 5), compression="lzw"),
        0.25,
    ),
    "jpeg": (lambda mp: codecs.encode_gray_jpeg(_gray(mp, 6)), 0.1),
    "jpeg_progressive": (
        lambda mp: codecs.encode_gray_jpeg_progressive(_gray(mp, 7)),
        0.1,
    ),
}


def _median3(fn) -> float:
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[1]


def main() -> None:
    out: dict[str, dict] = {}
    for fmt, (enc, mp) in _CASES.items():
        blob = enc(mp)
        w, h, _ = codecs.decode_image_bytes(blob)
        true_mp = w * h / 1_000_000
        t = _median3(lambda b=blob: codecs.decode_image_bytes(b))
        row = {
            "megapixels": round(true_mp, 3),
            "blob_kb": round(len(blob) / 1024, 1),
            "numpy_sec_per_mp": round(t / true_mp, 3),
            "pil_sec_per_mp": None,
        }
        if _HAS_PIL:  # pragma: no cover
            import io

            tp = _median3(
                lambda b=blob: np.asarray(
                    _PIL_Image.open(io.BytesIO(b)).convert("L")
                )
            )
            row["pil_sec_per_mp"] = round(tp / true_mp, 3)
        out[fmt] = row
        print(f"{fmt:18s} {row}", file=sys.stderr)

    result = {"metric": "decode_sec_per_mp", "formats": out, "has_pil": _HAS_PIL}
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    art = os.path.join(here, "SCALE_PROBE.json")
    if os.path.exists(art):
        with open(art) as fh:
            full = json.load(fh)
        full["decode_sec_per_mp"] = out
        full["decode_has_pil"] = _HAS_PIL
        with open(art, "w") as fh:
            json.dump(full, fh, indent=1)
    print(json.dumps(result, separators=(",", ":")))


if __name__ == "__main__":
    main()
