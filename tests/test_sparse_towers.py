"""Sparse proposal-patch vid towers == dense towers + gather, exactly.

The sparse path (models/sparse_towers.py) must reproduce the dense
towers' gathered features bit-for-bit in fp32 (modulo float
reassociation): same conv params run VALID on patches, with out-of-map
masking standing in for 'same' zero padding. BN parameters are
randomized so that conv(0) != 0 — otherwise the border masking is not
exercised at all."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from tscd_tpu.models.blocks import BaseConv
from tscd_tpu.models.sparse_towers import sparse_vid_tower_features
from tscd_tpu.models.tscd_head import flatten_levels
from tscd_tpu.ops.wavelets import WaveletsHFBlock

HID = 8
HWS = [(8, 8), (4, 4), (2, 2)]


class Harness(nn.Module):
    """Towers for 3 levels; dense and sparse share parameters."""

    @nn.compact
    def __call__(self, stems, idx, lframe, edge_all, sparse):
        L = len(stems)
        cls_mods = [[BaseConv(HID, 3, 1, name=f"c{k}_{i}")
                     for i in range(2)] for k in range(L)]
        reg_mods = [[BaseConv(HID, 3, 1, name=f"r{k}_{i}")
                     for i in range(2)] for k in range(L)]
        edge_mods = [WaveletsHFBlock(name=f"e{k}") for k in range(L)]
        hw = [(s.shape[1], s.shape[2]) for s in stems]
        if sparse:
            return sparse_vid_tower_features(
                stems, hw, idx, cls_mods, reg_mods, edge_mods,
                lframe, edge_all)
        cls_maps, reg_maps, edge_maps = [], [], []
        for k, s in enumerate(stems):
            v = s
            for m in cls_mods[k]:
                v = m(v)
            cls_maps.append(v)
            vr = s
            for m in reg_mods[k]:
                vr = m(vr)
            reg_maps.append(vr)
            edge_maps.append(edge_mods[k](
                vr if edge_all else vr[:lframe]))
        take = jax.vmap(lambda f, i: f[i])
        Fe = idx.shape[0] if edge_all else lframe
        return (take(flatten_levels(cls_maps), idx),
                take(flatten_levels(reg_maps), idx),
                take(flatten_levels(edge_maps), idx[:Fe]))


def _randomize(variables, rng):
    """Random params + running stats so BN(0) != 0 and masks matter.
    All 1-d leaves (BN scale/bias/mean/var, conv bias) are made positive
    — var needs it, and a nonzero BN bias is what exposes missing
    out-of-map masking."""
    leaves, treedef = jax.tree_util.tree_flatten(variables)
    out = []
    for leaf in leaves:
        val = rng.normal(0.1, 0.35, leaf.shape)
        if leaf.ndim == 1:
            val = np.abs(val) + 0.1
        out.append(jnp.asarray(val, jnp.float32))
    return jax.tree_util.tree_unflatten(treedef, out)


def _run(idx, lframe=2, edge_all=False):
    F = idx.shape[0]
    rng = np.random.default_rng(0)
    stems = [jnp.asarray(rng.normal(size=(F, h, w, HID)), jnp.float32)
             for h, w in HWS]
    idx = jnp.asarray(idx, jnp.int32)
    m = Harness()
    variables = m.init(jax.random.PRNGKey(0), stems, idx, lframe,
                       edge_all, False)
    variables = _randomize(variables, rng)
    dense = m.apply(variables, stems, idx, lframe, edge_all, False)
    sparse = m.apply(variables, stems, idx, lframe, edge_all, True)
    return dense, sparse


@pytest.mark.parametrize("edge_all", [False, True])
def test_borders_and_levels(edge_all):
    # anchors chosen to hit every border case of every level:
    # corners, edges, centre, and the cross-level boundaries
    A0, A1 = 64, 16
    idx = np.array([
        [0, 7, 56, 63, 9, 35, A0 + 0, A0 + 3, A0 + 15, A0 + A1 + 0],
        [A0 + A1 + 3, A0 + A1 + 1, 1, 8, 62, 27, A0 + 5, 36, 18, 54],
        [63, 0, A0 + 12, A0 + A1 + 2, 44, 2, 16, 30, A0 + 10, 5],
    ])
    (dc, dr, de), (sc, sr, se) = _run(idx, lframe=2, edge_all=edge_all)
    # patch-conv vs map-conv reassociation: ~1e-6 relative per conv,
    # amplified by the content*edge product — 1e-4 relative is float
    # noise, a masking/alignment bug is orders of magnitude larger
    np.testing.assert_allclose(sc, dc, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(sr, dr, rtol=1e-4, atol=1e-5)
    assert se.shape == de.shape == (3 if edge_all else 2, 10, HID)
    np.testing.assert_allclose(se, de, rtol=1e-3, atol=1e-5)


def test_full_head_sparse_equals_dense():
    """End-to-end: TSCD head outputs identical with sparse_vid_towers."""
    from tscd_tpu.models.matching import init_matcher_state
    from tscd_tpu.models.tscd import TSCD
    from tscd_tpu.ops.position import get_timing_signal_1d

    L, G, P = 1, 3, 10
    F, H, W = L + G, 64, 64
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.uniform(0, 255, (F, H, W, 3)), jnp.float32)
    te = jnp.asarray(get_timing_signal_1d(np.arange(F), 256), jnp.float32)

    kw = dict(num_classes=5, depth=0.33, width=0.25, num_proposals=P,
              heads=4, dtype=jnp.float32)
    dense_m = TSCD(sparse_vid_towers=False, **kw)
    sparse_m = TSCD(sparse_vid_towers=True, **kw)
    variables = dense_m.init(jax.random.PRNGKey(0), x, te, L, G)
    hidden = int(256 * 0.25)
    st = init_matcher_state(P, hidden, 4 * hidden, dtype=jnp.float32)

    out_d = dense_m.apply(variables, x, te, L, G, False, st)
    out_s = sparse_m.apply(variables, x, te, L, G, False, st)
    # param trees must be interchangeable between the two modes
    vs = sparse_m.init(jax.random.PRNGKey(0), x, te, L, G)
    assert (jax.tree_util.tree_structure(vs)
            == jax.tree_util.tree_structure(variables))
    for key in ["refined_cls_logits", "refined_boxes",
                "matcher_obj_logits"]:
        np.testing.assert_allclose(out_s[key], out_d[key],
                                   rtol=1e-4, atol=1e-4, err_msg=key)
