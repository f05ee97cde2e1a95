"""Builtin bitmap font and glyph-atlas builder for the text overlay.

The reference renders its atlas at startup with OpenCV ``putText``
(FONT_HERSHEY_PLAIN, green, ``threads.cpp:44-54``) for the alphabet
``CHARS_STR "0123456789BFPSWbkps :/"`` (``common.h:13``). We have no
OpenCV dependency, so the atlas comes from an embedded 5x7 bitmap font
scaled up host-side — same contract: a dense ``(n_chars, cell_h,
cell_w, 3)`` uint8 array of green-on-black cells uploaded to the device
once and blitted whole (background included) onto the frame.
"""

from __future__ import annotations

from typing import List

import numpy as np

CHARS = "0123456789BFPSWbkps :/"

# Each glyph: 7 rows of 5 bits, MSB = leftmost column.
_FONT_5X7 = {
    "0": (0b01110, 0b10001, 0b10011, 0b10101, 0b11001, 0b10001, 0b01110),
    "1": (0b00100, 0b01100, 0b00100, 0b00100, 0b00100, 0b00100, 0b01110),
    "2": (0b01110, 0b10001, 0b00001, 0b00010, 0b00100, 0b01000, 0b11111),
    "3": (0b11111, 0b00010, 0b00100, 0b00010, 0b00001, 0b10001, 0b01110),
    "4": (0b00010, 0b00110, 0b01010, 0b10010, 0b11111, 0b00010, 0b00010),
    "5": (0b11111, 0b10000, 0b11110, 0b00001, 0b00001, 0b10001, 0b01110),
    "6": (0b00110, 0b01000, 0b10000, 0b11110, 0b10001, 0b10001, 0b01110),
    "7": (0b11111, 0b00001, 0b00010, 0b00100, 0b01000, 0b01000, 0b01000),
    "8": (0b01110, 0b10001, 0b10001, 0b01110, 0b10001, 0b10001, 0b01110),
    "9": (0b01110, 0b10001, 0b10001, 0b01111, 0b00001, 0b00010, 0b01100),
    "B": (0b11110, 0b10001, 0b10001, 0b11110, 0b10001, 0b10001, 0b11110),
    "F": (0b11111, 0b10000, 0b10000, 0b11110, 0b10000, 0b10000, 0b10000),
    "P": (0b11110, 0b10001, 0b10001, 0b11110, 0b10000, 0b10000, 0b10000),
    "S": (0b01111, 0b10000, 0b10000, 0b01110, 0b00001, 0b00001, 0b11110),
    "W": (0b10001, 0b10001, 0b10001, 0b10101, 0b10101, 0b10101, 0b01010),
    "b": (0b10000, 0b10000, 0b10110, 0b11001, 0b10001, 0b10001, 0b11110),
    "k": (0b10000, 0b10000, 0b10010, 0b10100, 0b11000, 0b10100, 0b10010),
    "p": (0b00000, 0b00000, 0b11110, 0b10001, 0b11110, 0b10000, 0b10000),
    "s": (0b00000, 0b00000, 0b01111, 0b10000, 0b01110, 0b00001, 0b11110),
    " ": (0, 0, 0, 0, 0, 0, 0),
    ":": (0b00000, 0b00100, 0b00100, 0b00000, 0b00100, 0b00100, 0b00000),
    "/": (0b00001, 0b00010, 0b00100, 0b00100, 0b01000, 0b10000, 0b00000),
}

GLYPH_H, GLYPH_W = 7, 5
CELL_H, CELL_W = GLYPH_H + 1, GLYPH_W + 1  # 1px padding row/col


def glyph_bitmap(ch: str) -> np.ndarray:
    """(CELL_H, CELL_W) 0/1 array for one character."""
    rows = _FONT_5X7[ch]
    out = np.zeros((CELL_H, CELL_W), dtype=np.uint8)
    for r, bits in enumerate(rows):
        for c in range(GLYPH_W):
            out[r, c] = (bits >> (GLYPH_W - 1 - c)) & 1
    return out


def make_atlas(scale: int = 5) -> np.ndarray:
    """(len(CHARS), CELL_H*scale, CELL_W*scale, 3) uint8 BGR atlas,
    green glyphs on black (the reference's cv::Scalar(0,255,0))."""
    cells = []
    for ch in CHARS:
        bm = glyph_bitmap(ch)
        bm = np.kron(bm, np.ones((scale, scale), dtype=np.uint8))
        cell = np.zeros((*bm.shape, 3), dtype=np.uint8)
        cell[:, :, 1] = bm * 255  # G channel in BGR
        cells.append(cell)
    return np.stack(cells, axis=0)


def encode_text(text: str, max_len: int | None = None) -> List[int]:
    """Map a status string to atlas indices; unknown chars become spaces
    (the reference leaves ``idx`` stale on a miss — we define spaces)."""
    ids = [CHARS.index(c) if c in CHARS else CHARS.index(" ") for c in text]
    if max_len is not None:
        ids = ids[:max_len] + [CHARS.index(" ")] * max(0, max_len - len(ids))
    return ids
