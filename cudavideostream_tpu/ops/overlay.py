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

    Args:
      frame: flat uint8 frame.
      atlas: (n_glyphs, cell_h, cell_w, 3) uint8 device atlas.
      char_ids: (max_chars,) int32 atlas indices.
      n_chars: int32 scalar — characters beyond it leave the frame intact.
    """
    cell_h, cell_w = atlas.shape[1], atlas.shape[2]
    img = frame.reshape(height, width, 3)
    max_chars = char_ids.shape[0]
    for j in range(max_chars):
        x0 = j * cell_w
        if x0 + cell_w > width or cell_h > height:
            break
        cell = jax.lax.dynamic_index_in_dim(atlas, char_ids[j], 0, keepdims=False)
        cur = jax.lax.dynamic_slice(img, (0, x0, 0), (cell_h, cell_w, 3))
        new = jnp.where(j < n_chars, cell, cur)
        img = jax.lax.dynamic_update_slice(img, new, (0, x0, 0))
    return img.reshape(-1)
