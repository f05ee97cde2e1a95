"""Device text overlay: glyph-atlas blit onto the frame before diffing.

The reference launches one ``kernel2_char`` per character
(``kernels.cu:351-375``, driven from exec_core ``kernels.cu:466-476``),
copying the full glyph cell — background included — into the frame's top
rows at ``x = j * cell_w``. Here each character is one
``dynamic_update_slice`` with a dynamically selected atlas cell; a static
``max_chars`` bound with an ``n_chars`` scalar keeps shapes fixed under
jit while matching the reference's "blit nothing until text exists"
behavior.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import Array


def overlay_blit(
    frame: Array,
    atlas: Array,
    char_ids: Array,
    n_chars: Array,
    height: int,
    width: int,
) -> Array:
    """Blit up to ``max_chars = char_ids.shape[0]`` glyph cells.

    Single-pass strip formulation: gather the selected cells into one
    ``(cell_h, max_chars*cell_w, 3)`` text strip (a tiny gather), mask
    characters past ``n_chars`` with the underlying frame pixels, and
    write the strip back with one *static* slice update. This replaces
    the reference's one-kernel-launch-per-character schedule
    (``kernels.cu:466-476``) with a single fused op — and replaces 28
    dynamic-slice round trips over a 6 MB buffer with one small one.

    Args:
      frame: flat uint8 frame.
      atlas: (n_glyphs, cell_h, cell_w, 3) uint8 device atlas.
      char_ids: (max_chars,) int32 atlas indices.
      n_chars: int32 scalar — characters beyond it leave the frame intact.
    """
    cell_h, cell_w = atlas.shape[1], atlas.shape[2]
    max_chars = char_ids.shape[0]
    n_fit = min(max_chars, width // cell_w)
    if n_fit == 0 or cell_h > height:
        return frame
    # byte-space 2D views only: an (H, W, 3) view would force a
    # minor-dim-3 relayout of the whole frame (milliseconds at 1080p)
    img = frame.reshape(height, width * 3)
    cw3 = cell_w * 3
    strip_w3 = n_fit * cw3
    # glyph select as a one-hot matmul, not a gather: TPU gathers lower
    # to slow scalar loops, while (n_fit, n_glyphs) @ (n_glyphs, cell)
    # rides the MXU. Exact: one term per row is nonzero and every byte
    # value (<=255) is exactly representable in f32/bf16.
    n_glyphs = atlas.shape[0]
    onehot = (
        char_ids[:n_fit, None] == jax.lax.broadcasted_iota(jnp.int32, (1, n_glyphs), 1)
    ).astype(jnp.float32)
    flat_cells = atlas.reshape(n_glyphs, cell_h * cw3).astype(jnp.float32)
    cells = jnp.dot(onehot, flat_cells).astype(jnp.uint8)
    strip = cells.reshape(n_fit, cell_h, cw3).transpose(1, 0, 2).reshape(
        cell_h, strip_w3
    )
    under = img[:cell_h, :strip_w3]
    col_char = jax.lax.broadcasted_iota(jnp.int32, (1, strip_w3), 1) // cw3
    merged = jnp.where(col_char < n_chars, strip, under)
    img = img.at[:cell_h, :strip_w3].set(merged)
    return img.reshape(-1)
