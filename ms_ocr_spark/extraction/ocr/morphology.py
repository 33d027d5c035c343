"""Morphology / point-op kernels mirroring the reference image-processor API
(SURVEY.md §2.8 K5-K12), pure numpy.

Reference counterparts in `/root/reference/src/library/image_processor/main.py`:
  threshold (226-229), erode/dilate (231-243), gamma LUT (266-271),
  mask/maskApply (256-264), createOrDeleteBorder (313-323),
  noiseRemove auto-kernel (273-311).

These run inside pandas UDF batches when a pipeline needs them; the core
OCR kernel (kernel.py) uses median+binarize directly.
"""

from __future__ import annotations

import numpy as np


def threshold(img: np.ndarray, th: int = 128, maxval: int = 255) -> np.ndarray:
    """Fixed binary threshold (reference `threshold`, main.py:226-229)."""
    return np.where(img >= th, np.uint8(maxval), np.uint8(0))


def _binary_window(mask: np.ndarray, kh: int, kw: int) -> np.ndarray:
    """Stack of shifted views covering a kh x kw neighborhood (edge-padded)."""
    ph, pw = kh // 2, kw // 2
    p = np.pad(mask, ((ph, kh - 1 - ph), (pw, kw - 1 - pw)), mode="edge")
    h, w = mask.shape
    return np.stack(
        [p[dy : dy + h, dx : dx + w] for dy in range(kh) for dx in range(kw)]
    )


def erode(img: np.ndarray, kh: int = 2, kw: int = 1) -> np.ndarray:
    """Rect-kernel erosion on uint8 (min filter) — main.py:231-236."""
    return _binary_window(img, kh, kw).min(axis=0).astype(np.uint8)


def dilate(img: np.ndarray, kh: int = 3, kw: int = 1) -> np.ndarray:
    """Rect-kernel dilation on uint8 (max filter) — main.py:238-243."""
    return _binary_window(img, kh, kw).max(axis=0).astype(np.uint8)


def gamma(img: np.ndarray, g: float = 2.2) -> np.ndarray:
    """Gamma LUT (main.py:266-271)."""
    lut = (np.power(np.arange(256) / 255.0, 1.0 / g) * 255.0).astype(np.uint8)
    return lut[img]


def make_mask(shape: tuple[int, int], boxes: list[tuple[int, int, int, int]]) -> np.ndarray:
    """White-on-black box mask (main.py:256-259); boxes are (x1,y1,x2,y2)."""
    m = np.zeros(shape, dtype=np.uint8)
    for x1, y1, x2, y2 in boxes:
        m[y1:y2, x1:x2] = 255
    return m


def apply_mask(img: np.ndarray, mask: np.ndarray) -> np.ndarray:
    """Bitwise AND (main.py:261-264)."""
    return np.bitwise_and(img, mask)


def add_border(img: np.ndarray, px: int, value: int = 255) -> np.ndarray:
    """Pad border (createOrDeleteBorder create path, main.py:313-318)."""
    return np.pad(img, px, mode="constant", constant_values=value)


def remove_border(img: np.ndarray, px: int) -> np.ndarray:
    """Crop border (createOrDeleteBorder delete path, main.py:319-323)."""
    if px <= 0:
        return img.copy()
    return img[px:-px, px:-px].copy()


def noise_remove(img: np.ndarray, th: int = 128) -> np.ndarray:
    """Auto open/close morphology; kernel side from sqrt(mean CC size)
    (main.py:273-311).  Uses the engine's run-based CC labeling."""
    from .kernel import connected_components

    mask = img < th
    boxes = connected_components(mask)
    if not boxes:
        return img.copy()
    mean_area = float(np.mean([(x2 - x1) * (y2 - y1) for x1, y1, x2, y2 in boxes]))
    k = max(1, int(np.sqrt(mean_area) / 4))
    opened = dilate(erode(img, k, k), k, k)  # open: erode then dilate (ink=dark)
    return opened


def heatmap(img: np.ndarray) -> np.ndarray:
    """Min-max normalize a float score map and colorize it JET-style to
    HxWx3 uint8 (reference K13, `/root/reference/src/library/
    image_processor/main.py:325-328` — debug visualization)."""
    f = img.astype(np.float64)
    lo, hi = float(f.min()), float(f.max())
    norm = np.zeros_like(f) if hi == lo else (f - lo) / (hi - lo)
    # piecewise-linear JET approximation on [0, 1]
    r = np.clip(1.5 - np.abs(4 * norm - 3), 0, 1)
    g = np.clip(1.5 - np.abs(4 * norm - 2), 0, 1)
    b = np.clip(1.5 - np.abs(4 * norm - 1), 0, 1)
    return (np.stack([r, g, b], axis=-1) * 255).astype(np.uint8)


def draw_rectangles(
    img: np.ndarray,
    boxes: list[tuple[int, int, int, int]],
    value: int = 0,
    thickness: int = 1,
) -> np.ndarray:
    """Draw box outlines on a grayscale image (reference K14 `rectangle`,
    `image_processor/main.py:253-254` — debug overlay).  Boxes are
    (x1, y1, x2, y2) exclusive-end, clipped to the canvas."""
    out = img.copy()
    h, w = out.shape
    for x1, y1, x2, y2 in boxes:
        x1c, y1c = max(0, x1), max(0, y1)
        x2c, y2c = min(w, x2), min(h, y2)
        if x2c <= x1c or y2c <= y1c:
            continue
        t = thickness
        out[y1c : min(y1c + t, y2c), x1c:x2c] = value
        out[max(y2c - t, y1c) : y2c, x1c:x2c] = value
        out[y1c:y2c, x1c : min(x1c + t, x2c)] = value
        out[y1c:y2c, max(x2c - t, x1c) : x2c] = value
    return out
