"""TRAIN-path golden parity: the composed TSCD train forward + loss vs
the reference PyTorch TSCDHead (VERDICT r2 Missing #1 / Next #1).

Runs the reference `TSCDHead.forward` in TRAINING mode (fix_bn
semantics: module.train() with every BatchNorm in eval mode, exactly how
the stage-2 recipe trains — vid_tscd_large.py freezes the backbone and
fixes BN) on randomly-initialized converted weights + synthetic labels,
and asserts `tscd_tpu.train.losses.tscd_loss` over the repo head's
outputs reproduces the reference 9-tuple loss components:

  (total, 3*iou, obj, cls, l1, num_fg/num_gts,
   refined_cls, matched_obj, 6*matched_iou)
                       (reference tscd_head.py:1008-1207 return order)

This is the composition proof the eval-side suite couldn't give: SimOTA
assignment -> OTA refined-label construction (tscd_head.py:540-609) ->
get_matcher_refined_losses (:1008-1200), including which rows get
supervised and the num_fg / num_fg_local normalizations.

The loss sums are permutation-invariant over proposal rows, so the
reference's anchor-index row order vs the repo's score order needs no
alignment here (per-row output parity is already locked by
test_torch_parity_video.py).
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

REF = "/root/reference/yolox/models"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference repo not mounted")

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def ref():
    import refpkg

    class Mods:
        tscd_head = refpkg.load("yolox.models.tscd_head")

    return Mods


def to_flax(torch_module):
    from tscd_tpu.utils.convert import torch_to_flax
    sd = {k: v.detach().cpu().numpy()
          for k, v in torch_module.state_dict().items()}
    return torch_to_flax(sd)


def t2n(x):
    return x.detach().cpu().numpy()


def nchw(x):
    return torch.from_numpy(np.ascontiguousarray(x.transpose(0, 3, 1, 2)))


def _ref_head_train(ref, C, P, width=0.125, heads=4, cat_ota_fg=False):
    kwargs = dict(ota_mode=True, agg_type="mca", reconf=True,
                  decouple_reg=True, vid_cls=True, vid_reg=True,
                  use_pre_nms=False, minimal_limit=P, maximal_limit=P,
                  cat_ota_fg=cat_ota_fg)
    tm = ref.tscd_head.TSCDHead(num_classes=C, width=width, heads=heads,
                                defualt_p=P, **kwargs)
    # fix_bn training: train-mode forward branch, BN on running stats
    tm.train()
    for m in tm.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.eval()
    return tm


def _repo_head(C, P, width=0.125, heads=4, cat_ota_fg=False):
    from tscd_tpu.models.tscd_head import TSCDHead
    return TSCDHead(num_classes=C, width=width, heads=heads,
                    num_proposals=P, use_pre_nms=False, reconf=True,
                    decouple_reg=True, vid_cls=True, vid_reg=True,
                    agg_type="mca", decoder_layer_num=1, test_conf=0.001,
                    cat_ota_fg=cat_ota_fg)


def _labels(rng, F, zero_frame=None, G=8, img=64):
    """Padded (F, G, 5) [cls, cx, cy, w, h] labels with 2-3 gts/frame."""
    lab = np.zeros((F, G, 5), np.float32)
    for f in range(F):
        if f == zero_frame:
            continue
        n = int(rng.integers(2, 4))
        for g in range(n):
            w, h = rng.uniform(12, 36, 2)
            cx = rng.uniform(w / 2, img - w / 2)
            cy = rng.uniform(h / 2, img - h / 2)
            lab[f, g] = [rng.integers(0, 5), cx, cy, w, h]
    return lab


def _run_pair(ref, rng, C, P, F, L, zero_frame=None, cat_ota_fg=False):
    import jax.numpy as jnp
    from tscd_tpu.train.losses import tscd_loss

    tm = _ref_head_train(ref, C, P, cat_ota_fg=cat_ota_fg)
    fm = _repo_head(C, P, cat_ota_fg=cat_ota_fg)
    variables = to_flax(tm)

    feats = [rng.normal(size=(F, hw, hw, ch)).astype(np.float32)
             for hw, ch in [(8, 32), (4, 64), (2, 128)]]
    time_emb = rng.normal(size=(F, 256)).astype(np.float32)
    lab = _labels(rng, F, zero_frame)

    with torch.no_grad():
        want = tm([nchw(f) for f in feats],
                  labels=torch.from_numpy(lab),
                  imgs=torch.zeros(F, 3, 64, 64),
                  time_embedding=torch.from_numpy(time_emb),
                  nms_thresh=0.5, lframe=L, gframe=F - L, resume=False)

    out = fm.apply(variables, [jnp.asarray(f) for f in feats],
                   jnp.asarray(time_emb), L, F - L, train=False,
                   labels=jnp.asarray(lab) if cat_ota_fg else None)
    got = tscd_loss(out, jnp.asarray(lab), (8, 16, 32), L, ota_mode=True)
    return want, got


WANT_KEYS = ["total_loss", "iou_loss", "conf_loss", "cls_loss", None,
             "num_fg", "loss_refined_cls", "loss_matched_obj",
             "loss_matched_iou"]


def _assert_loss_tuple(want, got, rtol=2e-3, atol=1e-4):
    for i, key in enumerate(WANT_KEYS):
        if key is None:  # l1 (not used outside the no-aug tail)
            assert float(want[i]) == 0.0
            continue
        np.testing.assert_allclose(
            float(np.asarray(got[key])), float(want[i]), rtol=rtol,
            atol=atol, err_msg=f"component {i} ({key})")


def test_tscd_train_loss_parity(ref, rng):
    """TSCD-Large train config (ota_mode, mca, reconf, decouple_reg,
    cat_ota_fg=False): full composed loss tuple parity, 2 local frames."""
    want, got = _run_pair(ref, rng, C=5, P=6, F=4, L=2)
    _assert_loss_tuple(want, got)


def test_tscd_train_loss_parity_zero_gt_frame(ref, rng):
    """A local frame with zero gts: the reference's empty-fg bookkeeping
    (get_fg_idx zero-gt branch, tscd_head.py:1755-1762 + the reorder
    skip) must match the masked fixed-shape path."""
    want, got = _run_pair(ref, rng, C=5, P=6, F=4, L=2, zero_frame=0)
    _assert_loss_tuple(want, got)


def test_iou_based_label_parity(ref, rng):
    """get_iou_based_label (tscd_head.py:1853-1916) vs the repo's
    iou_based_refined_targets: fg (iou>=0.6) / bg (<0.3) / ignore band
    classification, obj targets, supervision masks and the iou weights
    must match exactly.

    The reference's candidate columns are the SimOTA fg anchors' matched
    gt boxes (reg_targets[batch_idx], duplicated per anchor), and the
    class label comes from the first maximal column's thresholded
    one-hot — including the edge where that anchor's pred-iou is 0 and
    the label is all-zero. The repo reproduces these semantics exactly
    (see iou_based_refined_targets docstring), so this asserts full
    equality of fg/ignore masks, obj targets and cls targets.

    Note the full ota_mode=False TRAIN branch is dead code upstream:
    TSCDHead.__init__ only honors agg_type under ota_mode (tscd_head.py
    :90-146), so ota_mode=False builds LocalAggregation/MCA combinations
    whose forward calls crash (probed: ValueError/TypeError for all
    reconf x agg_type combos), and get_matcher_refined_losses'
    non-ota branch references an undefined `loss_matched_obj` at the
    clip (:1190). Only the target construction is runnable — which is
    what this test locks."""
    import jax
    import jax.numpy as jnp
    from tscd_tpu.ops.boxes import box_cxcywh_to_xyxy
    from tscd_tpu.ops.decode import anchor_centers
    from tscd_tpu.ops.simota import simota_assign_batch
    from tscd_tpu.train.losses import (iou_based_refined_targets,
                                       labels_to_padded)

    C, P, F = 5, 8, 3
    hw = [(8, 8), (4, 4), (2, 2)]
    A = sum(h * w for h, w in hw)
    lab = _labels(rng, F)
    # synthetic decoded predictions: some rows engineered near the gts
    # so the fg band is populated, plus background noise rows
    dec = np.stack([rng.uniform(4, 60, (F, A)), rng.uniform(4, 60, (F, A)),
                    rng.uniform(6, 24, (F, A)), rng.uniform(6, 24, (F, A))],
                   -1).astype(np.float32)
    for f in range(F):
        gts = lab[f][lab[f].sum(-1) > 0]
        for g, row in enumerate(gts):
            dec[f, 10 * g:10 * g + 3] = row[1:5] + rng.normal(
                0, [1.5, 1.5, 2.0, 2.0], (3, 4))
    obj_log = rng.normal(size=(F, A)).astype(np.float32)
    cls_log = rng.normal(size=(F, A, C)).astype(np.float32)

    gt_boxes, gt_classes, gt_valid = labels_to_padded(jnp.asarray(lab))
    xs, ys, ss = anchor_centers(hw, (8, 16, 32))
    tgt = simota_assign_batch(
        jnp.asarray(dec), jnp.asarray(obj_log), jnp.asarray(cls_log),
        gt_boxes, gt_classes, gt_valid,
        jnp.asarray(xs), jnp.asarray(ys), jnp.asarray(ss))

    # proposal rows: top-P by score (anchor order, like the reference)
    score = (jax.nn.sigmoid(jnp.asarray(obj_log))
             * jnp.max(jax.nn.sigmoid(jnp.asarray(cls_log)), -1))
    idx = np.sort(np.asarray(jax.lax.top_k(score, P)[1]), axis=1)
    boxes_xyxy = np.asarray(box_cxcywh_to_xyxy(jnp.asarray(dec)))

    # reference inputs: per-frame ragged SimOTA targets in anchor order
    pred_result, idx_list, reg_t_list, cls_t_list = [], [], [], []
    for f in range(F):
        rows = np.zeros((P, 7 + C), np.float32)
        rows[:, :4] = boxes_xyxy[f, idx[f]]
        pred_result.append(torch.from_numpy(rows))
        idx_list.append(torch.from_numpy(idx[f]))
        fg_anchors = np.where(np.asarray(tgt.fg_mask[f]))[0]
        reg_t_list.append(torch.from_numpy(
            np.asarray(tgt.reg_target[f])[fg_anchors]))
        cls_t_list.append(torch.from_numpy(
            np.asarray(tgt.cls_target[f])[fg_anchors]))

    tm = _ref_head_train(ref, C, P)  # only get_iou_based_label is used
    with torch.no_grad():
        ref_cls_t, ref_cls_m, ref_obj_t, ref_obj_m = tm.get_iou_based_label(
            pred_result, idx_list, torch.from_numpy(lab),
            torch.zeros(F, A, 5 + C), reg_t_list, cls_t_list)

    got_fg, got_ign, got_cls_t, got_reg_t = jax.vmap(
        iou_based_refined_targets)(
        jnp.asarray(boxes_xyxy[np.arange(F)[:, None], idx]),
        jnp.ones((F, P), bool), tgt.reg_target, tgt.cls_target,
        tgt.fg_mask)
    got_fg = np.asarray(got_fg)
    got_ign = np.asarray(got_ign)

    for f in range(F):
        fg_r = t2n(ref_cls_m[f])                      # cls mask == fg rows
        obj_sup = t2n(ref_obj_m[f])                   # fg | bg rows
        assert (got_fg[f] == fg_r).all(), f"frame {f} fg mismatch"
        assert ((~got_ign[f]) == obj_sup).all(), f"frame {f} ignore band"
        np.testing.assert_array_equal(
            t2n(ref_obj_t[f])[:, 0], got_fg[f].astype(np.float32))
        np.testing.assert_allclose(
            np.asarray(got_cls_t[f]), t2n(ref_cls_t[f]), rtol=1e-5,
            atol=1e-6, err_msg=f"frame {f}: cls targets")
        # reg targets at fg rows: the best-matching anchor's gt box
        fg_anchors = np.where(np.asarray(tgt.fg_mask[f]))[0]
        ref_boxes = np.asarray(tgt.reg_target[f])[fg_anchors]
        for r in np.where(fg_r)[0]:
            got_box = np.asarray(got_reg_t[f])[r]
            assert (np.abs(ref_boxes - got_box).max(-1) < 1e-5).any(), \
                f"frame {f} row {r}: reg target not an fg anchor's gt"


def test_cat_ota_fg_reference_is_broken_repo_path_consistent(ref, rng):
    """cat_ota_fg=True has NO runnable reference behavior to match: with
    use_pre_nms=False, postprocess_widx appends the OTA rows to
    `output[i]` (tscd_head.py:1585-1588) but keeps `output_index[i]` to
    the conf rows only (:1661-1667: `detections[conf_mask]` is NOT
    filtered by `abs_idx_out_ota`), so the per-frame feature count and
    score count disagree by n_ota and the MCA forward crashes on a shape
    mismatch (post_trans.py:658) whenever an OTA anchor also sits in the
    conf top-P; when none does, it survives to the loss and dies on
    `refine_reg_targets=None` in encode_reg_preds (tscd_head.py:958 —
    the cat_ota_fg branch never builds refined reg targets, :540-560).
    (With use_pre_nms=True it dies earlier still: `abs_idx = None` is
    concatenated at :1682.) The shipped reference exps all set
    cat_ota_fg=False.

    This test (a) pins that fact — if a reference fix ever lands, it
    fails and the composed parity test should be written — and (b)
    checks the repo's self-consistent redesign (rank OTA fg anchors
    first within the fixed P slots, select_frame_proposals ota_fg) still
    produces finite, supervised losses end-to-end."""
    import jax.numpy as jnp
    from tscd_tpu.train.losses import tscd_loss

    C, P, F, L = 5, 6, 3, 1
    tm = _ref_head_train(ref, C, P, cat_ota_fg=True)
    fm = _repo_head(C, P, cat_ota_fg=True)
    variables = to_flax(tm)

    feats = [rng.normal(size=(F, hw, hw, ch)).astype(np.float32)
             for hw, ch in [(8, 32), (4, 64), (2, 128)]]
    time_emb = rng.normal(size=(F, 256)).astype(np.float32)
    lab = _labels(rng, F)

    with pytest.raises((RuntimeError, TypeError)):
        with torch.no_grad():
            tm([nchw(f) for f in feats], labels=torch.from_numpy(lab),
               imgs=torch.zeros(F, 3, 64, 64),
               time_embedding=torch.from_numpy(time_emb),
               nms_thresh=0.5, lframe=L, gframe=F - L, resume=False)

    out = fm.apply(variables, [jnp.asarray(f) for f in feats],
                   jnp.asarray(time_emb), L, F - L, train=False,
                   labels=jnp.asarray(lab))
    assert "simota" in out  # head-side assignment reused by the loss
    # every OTA fg anchor of the local frame must occupy a valid slot
    fg_anchors = np.where(np.asarray(out["simota"].fg_mask[0]))[0]
    slots = np.asarray(out["proposals"].idx[0])
    valid = np.asarray(out["proposals"].valid[0])
    for a in fg_anchors[:P]:
        pos = np.where(slots == a)[0]
        assert pos.size == 1 and valid[pos[0]], f"fg anchor {a} not slotted"
    got = tscd_loss(out, jnp.asarray(lab), (8, 16, 32), L, ota_mode=True)
    for k, v in got.items():
        assert np.isfinite(float(np.asarray(v))), k
    assert float(np.asarray(got["loss_matched_iou"])) > 0
