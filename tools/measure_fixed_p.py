"""Quantify the fixed-P proposal ceiling (VERDICT r2 Weak #1 / Next #9).

The repo pins P proposal slots per frame while the reference's
use_pre_nms=False path keeps EVERY det above conf 0.001 (minimal_limit
is only a floor; TSCD-Large ships maximal_limit=0 = unbounded,
/root/reference/yolox/models/tscd_head.py:1592-1607). This tool runs the
REFERENCE TSCDHead eval forward on synthetic crowded frames (obj biases
tuned so ~50-200 anchors clear the threshold) and measures, for
P in {50, 75, 100}:

  - the proposals-clipped distribution (how many above-threshold dets
    the cap drops, and the still-score mass they carry), and
  - the refined-score delta on the SURVIVING rows (clipping changes the
    attention key set, so even kept proposals shift).

Usage:  python tools/measure_fixed_p.py [--frames 4] [--seeds 3]
Writes a markdown summary to stdout; the measured numbers are recorded
in tscd_tpu/exp/tscd_base.py's docstring.
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir, "tests"))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))


def build_head(tscd_head_mod, torch, C, maximal_limit, obj_bias, seed,
               obj_scale=1.0):
    torch.manual_seed(seed)
    kwargs = dict(ota_mode=True, agg_type="mca", reconf=True,
                  decouple_reg=True, vid_cls=True, vid_reg=True,
                  use_pre_nms=False, minimal_limit=50,
                  maximal_limit=maximal_limit, cat_ota_fg=False)
    tm = tscd_head_mod.TSCDHead(num_classes=C, width=0.25, heads=4,
                                defualt_p=30, **kwargs)
    tm.eval()
    # shape the objectness logit distribution so a crowded-but-bounded
    # set of anchors clears the 0.001 threshold (trained detectors put
    # ~50-150 there; random init puts ALL anchors there)
    with torch.no_grad():
        for op in tm.obj_preds:
            op.bias.fill_(obj_bias)
            op.weight.mul_(obj_scale)
    return tm


def run_once(tm, torch, feats, time_emb, F, L):
    """Eval forward capturing per-frame (anchor idx, refined cls sigmoid,
    refined obj sigmoid) before the final NMS."""
    cap = {}
    h1 = tm.cls_pred.register_forward_hook(
        lambda m, i, o: cap.__setitem__("cls", o.detach()))
    h2 = tm.matcher_obj_pred.register_forward_hook(
        lambda m, i, o: cap.__setitem__("obj", o.detach()))
    orig_widx = tm.postprocess_widx

    def widx(*a, **k):
        out = orig_widx(*a, **k)
        cap["idx"] = [None if ix is None else ix.cpu().numpy()
                      for ix in out[1]]
        return out

    tm.postprocess_widx = widx
    with torch.no_grad():
        tm(feats, labels=None, imgs=torch.zeros(F, 3, 256, 256),
           time_embedding=time_emb, nms_thresh=0.5, lframe=L,
           gframe=F - L, resume=False)
    h1.remove()
    h2.remove()
    tm.postprocess_widx = orig_widx
    idx0 = cap["idx"][0]
    n0 = len(idx0)
    cls_sig = torch.sigmoid(cap["cls"].reshape(-1, tm.num_classes)[:n0])
    obj_sig = torch.sigmoid(cap["obj"].reshape(-1)[:n0])
    counts = [len(ix) for ix in cap["idx"]]
    return idx0, cls_sig.numpy(), obj_sig.numpy(), counts


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=4)
    ap.add_argument("--seeds", type=int, default=3)
    ap.add_argument("--obj_scale", type=float, default=3.0)
    args = ap.parse_args()

    import refpkg
    torch = __import__("torch")
    tscd_head_mod = refpkg.load("yolox.models.tscd_head")

    C, F, L = 30, args.frames, 1
    caps = [50, 75, 100]
    rows = {p: dict(clipped=[], mass=[], dcls=[], dobj=[]) for p in caps}
    unbounded_counts = []

    def calibrate_bias(seed, feats, te):
        """Random towers give a narrow score band; binary-search the obj
        bias so 80-200 anchors/frame clear conf 0.001 — the trained-
        detector crowded regime."""
        lo, hi = -7.0, -5.5
        for _ in range(12):
            mid = (lo + hi) / 2
            tm = build_head(tscd_head_mod, torch, C, 0, mid, seed,
                            args.obj_scale)
            _, _, _, counts = run_once(tm, torch, feats, te, F, L)
            c = float(np.mean(counts))
            if 80 <= c <= 200:
                return mid, tm
            if c > 200:
                hi = mid
            else:
                lo = mid
        return mid, tm

    for seed in range(args.seeds):
        rng = np.random.default_rng(seed)
        feats_np = [rng.normal(size=(F, ch, hw, hw)).astype(np.float32)
                    for hw, ch in [(32, 64), (16, 128), (8, 256)]]
        feats = [torch.from_numpy(f) for f in feats_np]
        te = torch.from_numpy(
            rng.normal(size=(F, 256)).astype(np.float32))

        bias, tm = calibrate_bias(seed, feats, te)
        sd = tm.state_dict()
        idx_u, cls_u, obj_u, counts_u = run_once(tm, torch, feats, te, F, L)
        unbounded_counts.extend(counts_u)
        score_u = obj_u * cls_u.max(-1)  # refined still-score proxy
        pos_u = {int(a): i for i, a in enumerate(idx_u)}

        for p in caps:
            tmp = build_head(tscd_head_mod, torch, C, p, bias,
                             seed, args.obj_scale)
            tmp.load_state_dict(sd)
            idx_p, cls_p, obj_p, _ = run_once(tmp, torch, feats, te, F, L)
            kept = [int(a) for a in idx_p]
            clipped = max(len(idx_u) - len(idx_p), 0)
            rows[p]["clipped"].append(clipped / max(len(idx_u), 1))
            dropped = [i for a, i in pos_u.items() if a not in set(kept)]
            rows[p]["mass"].append(
                float(score_u[dropped].sum() / max(score_u.sum(), 1e-9)))
            # refined-score delta on surviving rows
            shared = [(pos_u[a], j) for j, a in enumerate(kept)
                      if a in pos_u]
            iu = np.array([s[0] for s in shared])
            ip = np.array([s[1] for s in shared])
            rows[p]["dcls"].append(
                float(np.abs(cls_p[ip] - cls_u[iu]).max()))
            rows[p]["dobj"].append(
                float(np.abs(obj_p[ip] - obj_u[iu]).max()))

    print(f"unbounded above-threshold proposals/frame: "
          f"mean {np.mean(unbounded_counts):.1f}, "
          f"min {min(unbounded_counts)}, max {max(unbounded_counts)}")
    print("| P | dets clipped (frac of unbounded) | clipped score mass "
          "| max |d refined cls sig| | max |d refined obj sig| |")
    print("|---|---|---|---|---|")
    for p in caps:
        r = rows[p]
        print(f"| {p} | {np.mean(r['clipped']):.3f} | "
              f"{np.mean(r['mass']):.4f} | {np.max(r['dcls']):.4f} | "
              f"{np.max(r['dobj']):.4f} |")


if __name__ == "__main__":
    main()
