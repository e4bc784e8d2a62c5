"""Self-contained 2-D rasterization toolkit (PIL/numpy, no OpenCV).

The reference delegates rasterization to RDKit-SVG/cairosvg
(/root/reference/rdkit_img_generate.py:30-48) and the Indigo renderer
(indigo_img_generator.py:38-49).  This framework draws molecules itself;
this module is the drawing substrate: antialiased lines, filled
polygons, rectangles and text on a grayscale canvas.

Antialiasing strategy: draw on a supersampled canvas (default 2x) and
downsample with a box filter at export time — one resize per image, far
cheaper than per-primitive AA and visually equivalent to cv2.LINE_AA
output for the stroke widths used in molecule depiction.

Fonts: four DejaVu faces shipped inside the (baked-in) matplotlib wheel
play the role of the reference's four Hershey font families
(rdkit .. FONT_HERSHEY_*); falls back to PIL's built-in scalable font.
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Sequence, Tuple

import numpy as np
from PIL import Image, ImageDraw, ImageFont

__all__ = ["Canvas", "FONT_FAMILIES", "get_font", "text_size", "resize"]

# Font families: (filename-in-matplotlib-data, human name).
FONT_FAMILIES: Tuple[str, ...] = (
    "DejaVuSans.ttf",
    "DejaVuSans-Bold.ttf",
    "DejaVuSerif.ttf",
    "DejaVuSerif-Bold.ttf",
)


@functools.lru_cache(maxsize=None)
def _font_path(family: str) -> Optional[str]:
    try:
        import matplotlib
        p = os.path.join(matplotlib.get_data_path(), "fonts", "ttf", family)
        if os.path.exists(p):
            return p
    except Exception:
        pass
    return None


@functools.lru_cache(maxsize=None)
def get_font(family: str, size_px: int):
    """Load a sized font; size_px is the nominal glyph height in pixels."""
    size_px = max(6, int(size_px))
    path = _font_path(family)
    if path is not None:
        return ImageFont.truetype(path, size_px)
    return ImageFont.load_default(size_px)


def text_size(text: str, family: str, size_px: int) -> Tuple[int, int]:
    """(width, height) of the rendered text in pixels (ascender box)."""
    font = get_font(family, size_px)
    l, t, r, b = font.getbbox(text)
    return int(r - l), int(b - t)


class Canvas:
    """Supersampled grayscale canvas with (row, col) addressing.

    All public drawing methods take (row, col) points in *target* pixel
    units; the supersampling factor is internal.
    """

    def __init__(self, size: int, supersample: int = 2, background: int = 255):
        self.size = size
        self.ss = supersample
        self._img = Image.new("L", (size * supersample, size * supersample),
                              background)
        self._draw = ImageDraw.Draw(self._img)

    # -- coordinate helper: (row, col) -> supersampled (x, y) ---------
    def _xy(self, p_rc: Tuple[float, float]) -> Tuple[float, float]:
        return (p_rc[1] * self.ss, p_rc[0] * self.ss)

    def line(self, p_rc, q_rc, width: float, color: int = 0) -> None:
        w = max(1, int(round(width * self.ss)))
        self._draw.line([self._xy(p_rc), self._xy(q_rc)], fill=color, width=w)
        # Round caps for thick strokes (cv2.line default behavior).
        if w >= 3 * self.ss:
            r = w / 2
            for pt in (p_rc, q_rc):
                x, y = self._xy(pt)
                self._draw.ellipse([x - r, y - r, x + r, y + r], fill=color)

    def polygon(self, pts_rc: Sequence[Tuple[float, float]],
                color: int = 0) -> None:
        self._draw.polygon([self._xy(p) for p in pts_rc], fill=color)

    def rectangle(self, rc_min, rc_max, color: int = 255) -> None:
        x0, y0 = self._xy(rc_min)
        x1, y1 = self._xy(rc_max)
        self._draw.rectangle([min(x0, x1), min(y0, y1),
                              max(x0, x1), max(y0, y1)], fill=color)

    def ellipse(self, center_rc, radius: float, width: float,
                color: int = 0) -> None:
        x, y = self._xy(center_rc)
        r = radius * self.ss
        w = max(1, int(round(width * self.ss)))
        self._draw.ellipse([x - r, y - r, x + r, y + r],
                           outline=color, width=w)

    def text(self, text: str, topleft_rc, family: str, size_px: int,
             color: int = 0) -> None:
        """Draw text with its bounding box's top-left at topleft_rc."""
        font = get_font(family, size_px * self.ss)
        x, y = self._xy(topleft_rc)
        l, t, _, _ = font.getbbox(text)
        self._draw.text((x - l, y - t), text, fill=color, font=font)

    def to_array(self) -> np.ndarray:
        """Downsample to (size, size) uint8."""
        if self.ss == 1:
            return np.asarray(self._img, np.uint8).copy()
        out = self._img.resize((self.size, self.size), Image.BOX)
        return np.asarray(out, np.uint8).copy()


def resize(img: np.ndarray, out_hw: Tuple[int, int],
           resample=Image.BILINEAR) -> np.ndarray:
    """Resize a grayscale array to (rows, cols) — cv2.resize equivalent
    for the augmentation path (reference src/utils.py:50-54)."""
    h, w = out_hw
    pil = Image.fromarray(np.asarray(img).astype(np.uint8))
    return np.asarray(pil.resize((w, h), resample), np.uint8)


def imwrite(path: str, img: np.ndarray) -> None:
    Image.fromarray(np.asarray(img).astype(np.uint8)).save(path)


def imread_gray(path: str) -> np.ndarray:
    return np.asarray(Image.open(path).convert("L"), np.uint8)
