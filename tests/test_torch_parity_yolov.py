"""Composed-head torch parity for the YOLOV family.

test_torch_parity_video.py proves every component (MSA_yolov,
LocalAggregation, towers, decode) individually; these tests prove the
COMPOSED eval forwards — YOLOV's gmode MSA head (yolovp_msa.py:216) and
YOLOV++'s msa/decouple_reg head (v_plus_head.py:257) — against the
reference on converted random weights, through the real pre-NMS
proposal-selection path (postpro_woclass, post_process.py:464).

The reference hardcodes top-750 pre-NMS (post_process.py:507), so the
FPN levels are sized to give A=756 anchors. Proposal rows are aligned
via selected anchor indices (reference keeps NMS order, the rebuild
keeps score order — same set)."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def ref():
    import refpkg

    class Mods:
        yolovp = refpkg.load("yolox.models.yolovp_msa")
        v_plus = refpkg.load("yolox.models.v_plus_head")

    return Mods


@pytest.fixture()
def rng():
    return np.random.default_rng(7)


def t2n(x):
    return x.detach().cpu().numpy()


def nchw(x):
    return torch.from_numpy(np.ascontiguousarray(x.transpose(0, 3, 1, 2)))


TOWER_PREFIXES = ("stem_", "cls_conv_", "reg_conv_", "cls_conv2_",
                  "reg_conv2_", "cls_pred_", "reg_pred_", "obj_pred_")


def _regroup(torch_module, num_classes, renames):
    """torch state_dict -> flax variables for the repo heads: tower keys
    nest under 'towers'; `renames` maps reference module names; the
    MSA head's linear_pred (C+1 — the reference discards the last
    column, yolovp_msa.py:350) slices to cls_pred (C)."""
    from flax.traverse_util import flatten_dict, unflatten_dict

    from tscd_tpu.utils.convert import torch_to_flax
    sd = {k: v.detach().cpu().numpy()
          for k, v in torch_module.state_dict().items()}
    variables = torch_to_flax(sd)
    out = {}
    for col, tree in variables.items():
        flat = flatten_dict(tree)
        new = {}
        for path, arr in flat.items():
            head = path[0]
            if head == "linear_pred":
                arr = (arr[:, :num_classes] if path[-1] == "kernel"
                       else arr[:num_classes])
                path = ("cls_pred",) + path[1:]
            elif head in renames:
                path = (renames[head],) + path[1:]
            if path[0].startswith(TOWER_PREFIXES):
                path = ("towers",) + path
            new[path] = arr
        out[col] = unflatten_dict(new)
    return out


def _feats(rng, F):
    # A = 8^2 + 4^2 + 2^2 = 84 anchors; the reference heads take Prenum
    # from the ctor (defulat_pre) — set it to 84 so the pre-NMS top-k
    # equals the rebuild's min(750, A)
    return [rng.normal(size=(F, hw, hw, ch)).astype(np.float32)
            for hw, ch in [(8, 32), (4, 64), (2, 128)]]


def _align(repo_idx, ref_idx):
    repo_idx = np.asarray(repo_idx)
    assert sorted(repo_idx.tolist()) == sorted(ref_idx.tolist()), \
        "proposal sets differ"
    pos = {int(a): i for i, a in enumerate(ref_idx)}
    return np.array([pos[int(a)] for a in repo_idx])


def test_yolov_msa_head_eval_forward_parity(ref, rng):
    import jax.numpy as jnp

    from tscd_tpu.models.yolov_heads import YOLOVHead

    C, P, W, F = 5, 6, 0.125, 4
    tm = ref.yolovp.YOLOXHead(num_classes=C, width=W, heads=4,
                              defualt_p=P, defulat_pre=84,
                              use_score=True, gmode=True)
    tm.eval()
    fm = YOLOVHead(num_classes=C, width=W, heads=4, num_proposals=P,
                   use_pre_nms=True, use_score=True, reconf=False)
    variables = _regroup(tm, C, renames={"trans": "agg"})

    cap = {}
    tm.linear_pred.register_forward_hook(
        lambda m, i, o: cap.__setitem__("cls", t2n(o)))
    feats = _feats(rng, F)
    # the reference's eval tail calls postprocess() with a stale
    # signature (yolovp_msa.py:377 omits reg_output) — stub it; the
    # refined logits are captured by the hook before that call
    ref.yolovp.postprocess = lambda *a, **k: (None, None)
    with torch.no_grad():
        tm([nchw(f) for f in feats], labels=None,
           imgs=torch.zeros(F, 3, 64, 64),
           nms_thresh=0.5, lframe=0, gframe=F)
    # re-run the reference proposal selection to capture indices
    with torch.no_grad():
        outs = []
        for k in range(3):
            x = tm.stems[k](nchw(feats[k]))
            rf = tm.reg_convs[k](x)
            cf = tm.cls_convs[k](x)
            outs.append(torch.cat([tm.reg_preds[k](rf),
                                   tm.obj_preds[k](rf).sigmoid(),
                                   tm.cls_preds[k](cf).sigmoid()], 1))
        tm.hw = [o.shape[-2:] for o in outs]
        dec = torch.cat([o.flatten(start_dim=2) for o in outs],
                        dim=2).permute(0, 2, 1)
        dec = tm.decode_outputs(dec, dtype=outs[0].type())
        _, pred_idx = tm.postpro_woclass(dec, num_classes=C,
                                         nms_thre=0.75, topK=P)

    out = fm.apply(variables, [jnp.asarray(f) for f in feats],
                   lframe=0, gframe=F)
    props = out["proposals"]
    assert bool(np.asarray(props.valid).all())
    cls_ref = cap["cls"].reshape(F, P, C + 1)[..., :-1]
    for f in range(F):
        align = _align(props.idx[f], t2n(pred_idx[f]).astype(int))
        np.testing.assert_allclose(
            np.asarray(out["refined_cls_logits"][f]), cls_ref[f][align],
            rtol=1e-3, atol=1e-4, err_msg=f"frame {f}")


def test_yolov_plus_head_eval_forward_parity(ref, rng):
    import jax.numpy as jnp

    from tscd_tpu.models.yolov_heads import YOLOVPlusHead

    C, P, W, F, L = 5, 6, 0.125, 4, 0   # gframe-only (the v++ configs)
    kwargs = dict(ota_mode=True, agg_type="msa", reconf=True,
                  decouple_reg=True, vid_cls=True, vid_reg=True,
                  use_pre_nms=False, minimal_limit=P, maximal_limit=P)
    tm = ref.v_plus.YOLOVHead(num_classes=C, width=W, heads=4,
                              defualt_p=P, use_score=True, **kwargs)
    tm.eval()
    fm = YOLOVPlusHead(num_classes=C, width=W, heads=4, num_proposals=P,
                       use_pre_nms=False, agg_type="msa", reconf=True,
                       decouple_reg=True, use_score=True)
    variables = _regroup(tm, C, renames={})

    cap = {}
    tm.cls_pred.register_forward_hook(
        lambda m, i, o: cap.__setitem__("cls", t2n(o)))
    tm.obj_pred.register_forward_hook(
        lambda m, i, o: cap.__setitem__("obj", t2n(o)))

    feats = _feats(rng, F)
    with torch.no_grad():
        tm([nchw(f) for f in feats], labels=None,
           imgs=torch.zeros(F, 3, 64, 64), nms_thresh=0.5,
           lframe=L, gframe=F - L)
        # capture the reference's selected indices the same way
        outs = []
        for k in range(3):
            x = tm.stems[k](nchw(feats[k]))
            rf = tm.reg_convs[k](x)
            cf = tm.cls_convs[k](x)
            outs.append(torch.cat([tm.reg_preds[k](rf),
                                   tm.obj_preds[k](rf).sigmoid(),
                                   tm.cls_preds[k](cf).sigmoid()], 1))
        tm.hw = [o.shape[-2:] for o in outs]
        dec = torch.cat([o.flatten(start_dim=2) for o in outs],
                        dim=2).permute(0, 2, 1)
        dec = tm.decode_outputs(dec, dtype=outs[0].type())
        _, pred_idx, _, _ = tm.postprocess_widx(
            dec, num_classes=C, nms_thre=0.75, ota_idxs=None)

    out = fm.apply(variables, [jnp.asarray(f) for f in feats],
                   lframe=L, gframe=F - L)
    props = out["proposals"]
    assert bool(np.asarray(props.valid).all())

    # gframe-only: every frame is refined
    for f in range(F):
        align = _align(props.idx[f], t2n(pred_idx[f]).astype(int))
        np.testing.assert_allclose(
            np.asarray(out["refined_cls_logits"][f]),
            cap["cls"].reshape(-1, P, C)[f][align],
            rtol=1e-3, atol=1e-4, err_msg=f"cls frame {f}")
        np.testing.assert_allclose(
            np.asarray(out["refined_obj_logits"][f]),
            cap["obj"].reshape(-1, P)[f][align],
            rtol=1e-3, atol=1e-4, err_msg=f"obj frame {f}")
