"""Validate this framework against a reference PyTorch TSCD checkpoint.

The one command that closes the standing "mAP parity on real VID/OVIS
checkpoints" gap the moment real weights/data exist (BASELINE.md: mAP50
within 0.3 of PyTorch TSCD-Large). It runs the full chain a user would:

  1. convert the .pth with the torch->flax converter
     (tscd_tpu/utils/convert.py, the tools/convert_weights.py path),
  2. evaluate it through the REAL CLI (tools/tscd_eval.py) on the exp's
     val split -> our mAP / AP50,
  3. optionally (--torch-eval) build the ORIGINAL reference model
     (/root/reference yolox.models.tscd, constructed exactly as
     exps/TSCD_VID/vid_tscd_large.py:95-155 does), load the same .pth,
     and drive it through the SAME data loader and the SAME evaluator
     accounting (tests/test_eval_integration_parity.py pins that our
     accounting equals the reference's convert_to_coco_format+COCOeval)
     -> reference mAP / AP50 on identical windows,
  4. report side-by-side and exit nonzero if |dAP50| > --map-tol.

--selftest is the dress rehearsal runnable WITHOUT real weights: it
synthesizes a tiny VID dataset + a randomly-initialized reference torch
checkpoint, then runs the exact flow above with --torch-eval. A
conversion gap, loader mismatch, resume-semantics bug, or evaluator
drift all surface as a mAP delta here — so when real weights arrive,
the only untested variable is the weights file itself.

Usage:
  python tools/validate_reference_ckpt.py --ckpt tscd_large.pth \
      -f exps/TSCD_VID/vid_tscd_large.py --data-root /data/ILSVRC2015 \
      [--tnum 20] [--torch-eval] [--map-tol 0.3] [--cpu]
  python tools/validate_reference_ckpt.py --selftest [--workdir DIR]
"""

import argparse
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
TESTS = os.path.join(REPO, "tests")


def make_parser():
    p = argparse.ArgumentParser("reference-checkpoint validation")
    p.add_argument("--ckpt", help="reference torch .pth checkpoint")
    p.add_argument("-f", "--exp_file", default="exps/TSCD_VID/vid_tscd_large.py")
    p.add_argument("--data-root", default=None,
                   help="override exp.data_dir (ILSVRC layout)")
    p.add_argument("--val-seq", default=None,
                   help="override exp.val_seq_path (val_seq.npy)")
    p.add_argument("--tnum", type=int, default=-1,
                   help="first N val sequences only (reference --tnum)")
    p.add_argument("--torch-eval", action="store_true",
                   help="also run the reference torch model on the same "
                        "windows (needs /root/reference + torch)")
    p.add_argument("--map-tol", type=float, default=0.3,
                   help="max |our AP50 - torch AP50| (BASELINE.md gate)")
    p.add_argument("--cpu", action="store_true",
                   help="force JAX_PLATFORMS=cpu for our eval subprocess")
    p.add_argument("--workdir", default="YOLOX_outputs/validate_ref")
    p.add_argument("--selftest", action="store_true",
                   help="synthetic dress rehearsal (no real weights "
                        "needed): random-init reference ckpt + tiny "
                        "synthetic VID dataset, full flow, parity gate")
    p.add_argument("opts", nargs="*", help="exp override key value pairs")
    return p


# --------------------------------------------------------------- step 3
def build_reference_model(exp):
    """Construct the ORIGINAL reference TSCD exactly as the reference
    exp does (/root/reference/exps/TSCD_VID/vid_tscd_large.py:95-155),
    with every knob taken from our exp object (reference defaults from
    exps/TSCD_VID/tscd_base.py:38-126 where our exps don't carry one)."""
    sys.path.insert(0, TESTS)
    import refpkg
    import torch.nn as nn

    pafpn = refpkg.load("yolox.models.yolo_pafpn")
    head_mod = refpkg.load("yolox.models.tscd_head")
    tscd_mod = refpkg.load("yolox.models.tscd")

    g = lambda n, d: getattr(exp, n, d)
    in_channels = [256, 512, 1024]
    backbone = pafpn.YOLOPAFPN(exp.depth, exp.width,
                               in_channels=in_channels)
    more_args = {
        "use_ffn": g("use_ffn", True),
        "use_time_emd": g("use_time_emd", False),
        "use_loc_emd": g("use_loc_emd", True),
        "loc_fuse_type": g("loc_fuse_type", "add"),
        "use_qkv": g("use_qkv", True),
        "local_mask": g("local_mask", False),
        "local_mask_branch": g("local_mask_branch", ""),
        "pure_pos_emb": g("pure_pos_emb", False),
        "loc_conf": g("loc_conf", False),
        "iou_base": g("iou_base", False),
        "reconf": g("reconf", False),
        "ota_mode": g("ota_mode", False),
        "ota_cls": g("ota_cls", False),
        "traj_linking": g("traj_linking", False),
        "iou_window": g("iou_window", 0),
        "globalBlocks": g("globalBlocks", 1),
        "use_pre_nms": g("use_pre_nms", False),
        "cat_ota_fg": g("cat_ota_fg", False),
        "agg_type": g("agg_type", "mca"),
        "minimal_limit": g("minimal_limit", 0),
        "decouple_reg": g("decouple_reg", False),
        "maximal_limit": g("maximal_limit", 0),
        "vid_cls": g("vid_cls", True),
        "vid_reg": g("vid_reg", False),
        "decoder_layer_num": g("decoder_layer_num", 1),
    }
    head = head_mod.TSCDHead(
        exp.num_classes, exp.width, in_channels=in_channels,
        heads=g("heads", 4), drop=g("drop_rate", 0.0),
        use_score=g("use_score", True), defualt_p=g("defualt_p", 30),
        sim_thresh=g("sim_thresh", 0.75), pre_nms=g("pre_nms", 0.75),
        ave=g("ave", True), defulat_pre=g("defualt_pre", 750),
        test_conf=g("test_conf", 0.001), use_mask=g("use_mask", False),
        gmode=g("gmode", True), lmode=g("lmode", False),
        both_mode=g("both_mode", False),
        localBlocks=g("localBlocks", 1), **more_args)
    model = tscd_mod.TSCD(backbone, head)
    for m in model.modules():  # init_yolo (vid_tscd_large.py:105-109)
        if isinstance(m, nn.BatchNorm2d):
            m.eps = 1e-3
            m.momentum = 0.03
    model.eval()
    return model


def torch_predict_fn(model, exp):
    """Reference model -> the VIDEvaluator predict_fn contract:
    (imgs (F,H,W,3) 0-255, time_emb (F,256), resume, state) ->
    (dets per local frame as (K,7) [x1,y1,x2,y2,obj,score,cls], state).
    The reference keeps matcher state INSIDE the module; `resume`
    controls reset (tscd_matching.py:779)."""
    import numpy as np
    import torch

    lframe = exp.lframe_val
    gframe = exp.gframe_val
    nmsthre = getattr(exp, "nmsthre", 0.5)

    def predict(imgs, te, resume, state):
        x = torch.from_numpy(
            np.asarray(imgs, np.float32).transpose(0, 3, 1, 2))
        t = torch.from_numpy(np.asarray(te, np.float32))
        with torch.no_grad():
            result, _ = model(x, targets=None, time_embedding=t,
                              nms_thresh=nmsthre, lframe=lframe,
                              gframe=gframe, resume=bool(resume))
        dets = []
        for r in result[:lframe]:
            if r is None or (hasattr(r, "numel") and r.numel() == 0):
                dets.append(np.zeros((0, 7), np.float32))
            else:
                dets.append(r[:, :7].cpu().numpy().astype(np.float32))
        return dets, None

    return predict


def run_our_eval(exp_file, msgpack, args, out_json):
    cmd = [sys.executable, os.path.join(REPO, "tools", "tscd_eval.py"),
           "-f", exp_file, "-c", msgpack, "--tnum", str(args.tnum),
           "--output", out_json]
    overrides = list(args.opts)
    if args.data_root:
        overrides += ["data_dir", args.data_root]
    if args.val_seq:
        overrides += ["val_seq_path", args.val_seq]
    cmd += overrides
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    if args.cpu:
        env["JAX_PLATFORMS"] = "cpu"
    print("[validate] $", " ".join(cmd), flush=True)
    r = subprocess.run(cmd, capture_output=True, text=True, env=env)
    if r.returncode != 0:
        sys.stderr.write(r.stdout[-2000:] + "\n" + r.stderr[-4000:])
        raise SystemExit(f"our eval failed rc={r.returncode}")
    with open(out_json) as f:
        return json.load(f)


def run_torch_eval(exp, ckpt_path, log=print):
    """Reference model over OUR loader through OUR evaluator (equal to
    the reference's own accounting by test_eval_integration_parity)."""
    import torch
    model = build_reference_model(exp)
    sd = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    sd = sd.get("model", sd) if isinstance(sd, dict) else sd
    missing, unexpected = model.load_state_dict(sd, strict=False)
    if missing or unexpected:
        log(f"[validate] torch load: {len(missing)} missing, "
            f"{len(unexpected)} unexpected keys")
        for k in list(missing)[:8]:
            log(f"  missing: {k}")
        for k in list(unexpected)[:8]:
            log(f"  unexpected: {k}")
    loader = exp.get_eval_loader()
    evaluator = exp.get_evaluator(loader)
    return evaluator.evaluate(torch_predict_fn(model, exp), log=log)


def our_predict_fn(exp, msgpack, args):
    """In-process predict_fn on the converted weights (the same
    construction tools/tscd_eval.py uses)."""
    import jax.numpy as jnp
    from tscd_tpu.core.tscd_trainer import TSCDTrainer
    from tscd_tpu.train.checkpoint import load_checkpoint, load_tolerant

    loader = exp.get_eval_loader()
    trainer = TSCDTrainer(exp, argparse.Namespace(), val_loader=loader)
    first = next(iter(loader))
    F = exp.lframe_val + exp.gframe_val
    variables = trainer._init_variables(
        jnp.asarray(first["imgs"][:F]),
        jnp.asarray(first["time_embedding"][:F]),
        exp.lframe_val, exp.gframe_val)
    restored = load_checkpoint(msgpack)
    variables = {
        "params": load_tolerant(variables["params"],
                                restored.get("params", restored)),
        "batch_stats": load_tolerant(variables.get("batch_stats", {}),
                                     restored.get("batch_stats", {}))}
    return trainer.make_predict_fn(variables, exp.lframe_val,
                                   exp.gframe_val), loader


def compare_detections(exp, msgpack, ckpt_path, args, log=print):
    """Run BOTH pipelines over identical windows and IoU-match their
    per-frame detections. Much finer-grained than the mAP gate: a
    conversion bug shows up as low matched IoU / score drift even when
    both mAPs are 0 (random weights) or 1 (easy data)."""
    import numpy as np
    import torch

    ours_fn, loader = our_predict_fn(exp, msgpack, args)
    model = build_reference_model(exp)
    sd = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    sd = sd.get("model", sd)
    model.load_state_dict(sd, strict=False)
    ref_fn = torch_predict_fn(model, exp)

    from tscd_tpu.eval.vid_evaluator import VIDEvaluator
    ev = VIDEvaluator(loader, lframe=exp.lframe_val,
                      gframe=exp.gframe_val)

    n_ours = n_ref = n_match = 0
    ious, sdeltas = [], []
    st = None
    for batch in loader:
        resume = ev._first_frame_idx(batch) != ev.first_frame_index
        ours, st = ours_fn(batch["imgs"], batch["time_embedding"],
                           resume, st)
        refs, _ = ref_fn(batch["imgs"], batch["time_embedding"],
                         resume, None)
        for a, b in zip(ours, refs):
            a, b = np.asarray(a), np.asarray(b)
            n_ours += len(a)
            n_ref += len(b)
            if not len(a) or not len(b):
                continue
            # pairwise IoU, greedy best-match per our-row
            ax1, ay1, ax2, ay2 = a[:, 0:1], a[:, 1:2], a[:, 2:3], a[:, 3:4]
            bx1, by1, bx2, by2 = b[:, 0], b[:, 1], b[:, 2], b[:, 3]
            iw = np.clip(np.minimum(ax2, bx2) - np.maximum(ax1, bx1),
                         0, None)
            ih = np.clip(np.minimum(ay2, by2) - np.maximum(ay1, by1),
                         0, None)
            inter = iw * ih
            area_a = (ax2 - ax1) * (ay2 - ay1)
            area_b = (bx2 - bx1) * (by2 - by1)
            iou = inter / np.maximum(area_a + area_b - inter, 1e-9)
            j = iou.argmax(1)
            best = iou[np.arange(len(a)), j]
            hit = best >= 0.5
            n_match += int(hit.sum())
            ious.extend(best[hit].tolist())
            sa = a[hit, 4] * a[hit, 5]
            sb = b[j[hit], 4] * b[j[hit], 5]
            sdeltas.extend(np.abs(sa - sb).tolist())
    rep = {
        "n_ours": n_ours, "n_ref": n_ref, "n_matched": n_match,
        "matched_frac": round(n_match / max(n_ours, 1), 4),
        "mean_matched_iou": round(float(np.mean(ious)), 4) if ious
        else None,
        "mean_score_delta": round(float(np.mean(sdeltas)), 5) if sdeltas
        else None,
    }
    log(f"[validate] det-level: {rep}")
    return rep


# ------------------------------------------------------------- selftest
def _write_selftest_assets(workdir):
    """Tiny synthetic VID dataset + tiny exp + random-init reference
    .pth. Returns (exp_file, ckpt_path)."""
    import numpy as np
    import cv2

    root = os.path.join(workdir, "vid")
    videos = []
    rng = np.random.default_rng(0)
    h, w = 128, 128
    for v in range(2):
        rel_frames = []
        for f in range(8):
            rel = f"Data/VID/val/vid{v}/{f:06d}.JPEG"
            path = os.path.join(root, rel)
            os.makedirs(os.path.dirname(path), exist_ok=True)
            img = np.full((h, w, 3), 90, np.uint8)
            img += rng.integers(0, 8, (h, w, 3), dtype=np.uint8)
            x0, y0 = 20 + 3 * f + 12 * v, 15 + 2 * f
            cv2.rectangle(img, (x0, y0), (x0 + 48, y0 + 36),
                          (250, 250, 250), -1)
            cv2.imwrite(path, img)
            xml = os.path.join(root, rel.replace("Data", "Annotations")
                               .replace("JPEG", "xml"))
            os.makedirs(os.path.dirname(xml), exist_ok=True)
            with open(xml, "w") as fh:
                fh.write(f"""<annotation>
  <size><width>{w}</width><height>{h}</height></size>
  <object><name>n02691156</name>
    <bndbox><xmin>{x0}</xmin><ymin>{y0}</ymin>
            <xmax>{x0 + 48}</xmax><ymax>{y0 + 36}</ymax></bndbox>
  </object>
</annotation>""")
            rel_frames.append(rel)
        videos.append(rel_frames)
    np.save(os.path.join(root, "val_seq.npy"),
            np.asarray(videos, object), allow_pickle=True)

    exp_file = os.path.join(workdir, "selftest_exp.py")
    with open(exp_file, "w") as f:
        f.write(f"""
import os
from tscd_tpu.exp.tscd_base import Exp as B


class Exp(B):
    def __init__(self):
        super().__init__()
        self.depth, self.width = 0.33, 0.125
        self.num_classes = 30
        self.heads = 4
        self.defualt_p = 6
        self.minimal_limit = 6
        self.maximal_limit = 6
        self.lframe_val, self.gframe_val = 1, 3
        self.input_size = self.test_size = (128, 128)
        self.data_dir = {root!r}
        self.val_seq_path = os.path.join({root!r}, "val_seq.npy")
        self.output_dir = {os.path.join(workdir, "out")!r}
        self.exp_name = "validate_selftest"
        self.fix_bn = False
        self.seed = 0
""")

    # random-init reference model -> .pth (deterministic seed)
    import torch
    torch.manual_seed(0)
    sys.path.insert(0, REPO)
    from tscd_tpu.exp import get_exp
    exp = get_exp(exp_file)
    model = build_reference_model(exp)
    ckpt_path = os.path.join(workdir, "ref_random.pth")
    torch.save({"model": model.state_dict()}, ckpt_path)
    return exp_file, ckpt_path


def main():
    args = make_parser().parse_args()
    os.makedirs(args.workdir, exist_ok=True)

    if args.selftest:
        args.torch_eval = True
        args.cpu = True
        if args.map_tol == 0.3:
            args.map_tol = 0.05  # identical weights => tight gate
    if args.cpu:
        # --cpu must also bind THIS process to CPU, not just the eval
        # subprocess: step 4 (compare_detections) traces our flax model
        # in-process, and on this rig a sitecustomize pins the axon TPU
        # first — the config update is the only pre-backend-init switch
        # that sticks (CLAUDE.md).
        import jax
        jax.config.update("jax_platforms", "cpu")
    if args.selftest:
        args.exp_file, args.ckpt = _write_selftest_assets(args.workdir)
    assert args.ckpt, "--ckpt required (or --selftest)"

    from tscd_tpu.exp import get_exp
    from tscd_tpu.train.checkpoint import save_checkpoint
    from tscd_tpu.utils.convert import load_torch_checkpoint, torch_to_flax

    # 1. convert
    sd = load_torch_checkpoint(args.ckpt)
    variables = torch_to_flax(sd)
    msgpack = save_checkpoint(
        {"params": variables["params"],
         "batch_stats": variables["batch_stats"]},
        args.workdir, name="converted")
    print(f"[validate] converted {len(sd)} tensors -> {msgpack}")

    # 2. our eval through the real CLI
    ours = run_our_eval(args.exp_file, msgpack, args,
                        os.path.join(args.workdir, "our_eval.json"))
    report = {"ours": {"mAP": ours.get("mAP"), "AP50": ours.get("AP50"),
                       "ms_per_frame": ours.get("ms_per_frame")}}

    # 3. reference torch eval on the same windows
    if args.torch_eval:
        exp = get_exp(args.exp_file)
        exp.merge(args.opts)
        if args.data_root:
            exp.data_dir = args.data_root
        if args.val_seq:
            exp.val_seq_path = args.val_seq
        exp.tnum = args.tnum
        ref = run_torch_eval(exp, args.ckpt)
        report["reference"] = {"mAP": ref.get("mAP"),
                               "AP50": ref.get("AP50")}
        d50 = abs(ours.get("AP50", 0.0) - ref.get("AP50", 0.0))
        report["delta_AP50"] = round(d50, 4)
        report["map_tol"] = args.map_tol
        # 4. detection-level agreement on identical windows (catches
        # conversion bugs even when both mAPs sit at 0 or saturate)
        det = compare_detections(exp, msgpack, args.ckpt, args)
        report["det_level"] = det
        det_ok = (det["n_ours"] > 0 and det["n_ref"] > 0
                  and det["matched_frac"] >= 0.8
                  and (det["mean_matched_iou"] or 0) >= 0.85)
        report["pass"] = bool(d50 <= args.map_tol and det_ok)

    print(json.dumps(report, indent=1))
    if args.torch_eval and not report["pass"]:
        raise SystemExit(
            f"validation failed: delta_AP50={report['delta_AP50']} "
            f"(tol {args.map_tol}), det_level={report['det_level']}")


if __name__ == "__main__":
    main()
