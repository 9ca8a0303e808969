"""Proposal-sparse video towers.

The reference computes the extra video towers (`cls_convs2`/`reg_convs2`,
tscd_head.py:240-281) and the wavelet edge block
(surrounding_extraction.py:215) over EVERY anchor of every FPN level,
then gathers the P selected proposals per frame (find_feature_score,
tscd_head.py:976). At the TSCD-Large eval shape that is ~1.3 TFLOP per
32-frame window for features that are read at only P=50 positions per
frame — >99% of the tower work is discarded.

This module computes those towers ONLY on small patches around the
selected proposals, with bit-matching semantics:

- Each tower conv is the SAME flax module (same parameter names) run
  with VALID padding on a patch extracted from the zero-padded stem map;
  out-of-map positions of every intermediate are re-zeroed, which
  reproduces the dense path's 'same' zero padding at map borders
  exactly.
- The wavelet edge block's Haar DWT tiles 2x2 blocks anchored at even
  map coordinates, so reg patches are block-ALIGNED: for a proposal at
  (y, x) the reg tower is evaluated on the aligned 4x4 region
  [2*floor((y-1)/2), +4) x [2*floor((x-1)/2), +4), which contains the
  content conv's 3x3 neighbourhood of (y, x) and the full DWT block of
  (y, x). WaveletsHFBlock then runs verbatim on the 4x4 patch and the
  (y, x) output is selected.
- Proposal anchor ids are global across levels; each level processes
  all P slots (clamped coords for foreign proposals) and a level mask
  selects the owning level's result. The 3x redundancy is ~130 MFLOP
  per proposal vs ~25 GFLOP per frame-level for the dense towers.

Exactness vs the dense path is locked down by tests/test_sparse_towers.py
(random + forced-border proposals, fp32).

Train-mode note: BatchNorm batch statistics over patches differ from
full-map statistics, so this path is only valid when BN runs in
running-average mode (eval, or fix_bn-style training) — the caller
gates on `train=False`.
"""

from typing import Any, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def extract_patches(fmap: jax.Array, oy: jax.Array, ox: jax.Array,
                    size: int, pad: int) -> jax.Array:
    """Gather (size x size) patches from a zero-padded map.

    fmap: (F, h, w, C); oy/ox: (F, P) patch origins in UNPADDED map
    coords (entries in [-pad, h-1]); returns (F, P, size, size, C)."""
    F, h, w, C = fmap.shape
    P = oy.shape[1]
    fp = jnp.pad(fmap, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    wp = w + 2 * pad
    flat = fp.reshape(F, -1, C)
    ii = jnp.arange(size, dtype=oy.dtype)
    rows = (oy + pad)[..., None] + ii                    # (F, P, size)
    cols = (ox + pad)[..., None] + ii
    lin = rows[..., :, None] * wp + cols[..., None, :]   # (F, P, s, s)
    out = jnp.take_along_axis(flat, lin.reshape(F, -1)[..., None], axis=1)
    return out.reshape(F, P, size, size, C)


def inmap_mask(oy: jax.Array, ox: jax.Array, size: int, h: int, w: int,
               dtype: Any) -> jax.Array:
    """(F, P, size, size, 1) mask of patch positions inside [0,h)x[0,w).

    Zeroing out-of-map intermediates reproduces the dense path's 'same'
    zero padding at map borders (the VALID patch convs otherwise produce
    garbage there: BN's beta makes conv(0) nonzero)."""
    ii = jnp.arange(size, dtype=oy.dtype)
    ry = oy[..., None] + ii                              # (F, P, size)
    rx = ox[..., None] + ii
    my = (ry >= 0) & (ry < h)
    mx = (rx >= 0) & (rx < w)
    return (my[..., :, None] & mx[..., None, :]).astype(dtype)[..., None]


def sparse_vid_tower_features(
        stem_feats: Sequence[jax.Array],
        hw: Sequence[Tuple[int, int]],
        idx: jax.Array,
        cls_towers: Sequence[Sequence[Any]],
        reg_towers: Sequence[Sequence[Any]],
        edge_blocks: Sequence[Any],
        lframe: int,
        edge_all_frames: bool,
        train: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Per-proposal tower features without dense tower maps.

    stem_feats: per-level (F, h_k, w_k, hid) stem outputs.
    idx: (F, P) global anchor ids (flatten_levels order).
    cls_towers/reg_towers: per-level lists of bound conv modules (the
    dense towers' modules — same parameters).
    edge_blocks: per-level bound WaveletsHFBlock modules.
    Returns (f_cls (F,P,hid), f_reg (F,P,hid),
    f_edge (F or lframe, P, hid)) matching take(dense_map, idx)."""
    F, P = idx.shape
    hid = stem_feats[0].shape[-1]
    bases = np.concatenate([[0], np.cumsum([h * w for h, w in hw])])
    Fe = F if edge_all_frames else lframe

    f_cls = jnp.zeros((F, P, hid), stem_feats[0].dtype)
    f_reg = jnp.zeros((F, P, hid), stem_feats[0].dtype)
    f_edge = jnp.zeros((Fe, P, hid), stem_feats[0].dtype)

    for k, x in enumerate(stem_feats):
        h_k, w_k = hw[k]
        local = jnp.clip(idx - int(bases[k]), 0, h_k * w_k - 1)
        y = local // w_k
        xx = local % w_k
        own = ((idx >= int(bases[k])) &
               (idx < int(bases[k + 1])))                # (F, P)

        # --- cls tower: 5x5 patch centred at (y, x) -> 3x3 -> 1x1
        pc = extract_patches(x, y - 2, xx - 2, 5, pad=2)
        pc = pc.reshape(F * P, 5, 5, hid)
        pc = cls_towers[k][0](pc, train, valid=True)     # (FP, 3, 3, hid)
        m3 = inmap_mask(y - 1, xx - 1, 3, h_k, w_k, pc.dtype)
        pc = pc * m3.reshape(F * P, 3, 3, 1)
        pc = cls_towers[k][1](pc, train, valid=True)     # (FP, 1, 1, hid)
        f_cls_k = pc.reshape(F, P, hid)

        # --- reg tower: block-aligned 8x8 -> 6x6 -> 4x4
        sy = 2 * ((y - 1) // 2)                          # even, in [-2, h-2]
        sx = 2 * ((xx - 1) // 2)
        pr = extract_patches(x, sy - 2, sx - 2, 8, pad=4)
        pr = pr.reshape(F * P, 8, 8, hid)
        pr = reg_towers[k][0](pr, train, valid=True)     # (FP, 6, 6, hid)
        m6 = inmap_mask(sy - 1, sx - 1, 6, h_k, w_k, pr.dtype)
        pr = pr * m6.reshape(F * P, 6, 6, 1)
        pr = reg_towers[k][1](pr, train, valid=True)     # (FP, 4, 4, hid)
        m4 = inmap_mask(sy, sx, 4, h_k, w_k, pr.dtype)
        pr = pr * m4.reshape(F * P, 4, 4, 1)
        pr4 = pr.reshape(F, P, 4, 4, hid)

        dy = y - sy                                      # in {1, 2}
        dx = xx - sx
        sel = (dy * 4 + dx)[..., None, None]             # (F, P, 1, 1)
        f_reg_k = jnp.take_along_axis(
            pr4.reshape(F, P, 16, hid), sel, axis=2)[:, :, 0]

        # --- edge block verbatim on the aligned 4x4 reg patch
        e = edge_blocks[k](pr4[:Fe].reshape(Fe * P, 4, 4, hid))
        f_edge_k = jnp.take_along_axis(
            e.reshape(Fe, P, 16, hid), sel[:Fe], axis=2)[:, :, 0]

        ownf = own[..., None].astype(f_cls_k.dtype)
        f_cls = f_cls + ownf * f_cls_k
        f_reg = f_reg + ownf * f_reg_k
        f_edge = f_edge + ownf[:Fe] * f_edge_k

    return f_cls, f_reg, f_edge
