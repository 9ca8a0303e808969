"""QAT efficacy measurement: prove int8_eval(qat=True) recovers accuracy
that plain int8 serving loses.

The analog of validating the reference's TensorRT int8 deployment path
(/root/reference/demo/TensorRT) — there the proof is "TRT int8 engine
keeps mAP"; here the proof must also cover the QAT knob, so the
experiment manufactures the one failure mode per-channel-weight +
per-tensor-activation int8 is known to have (outlier activation
channels, the SmoothQuant paper's motivating case) and shows QAT
fine-tuning closes the gap where an equal-budget fp fine-tune does not.

Pipeline (all CPU, deterministic seeds):
  1. train a tiny YOLOX on a quantization-SENSITIVE synthetic task
     (4 classes separated only by subtle grayscale levels 24 apart on a
     noisy background, 12-20 px boxes) to mAP ~0.82;
  2. surgically inject outlier activation channels into every
     Bottleneck conv1->conv2 pair: conv1's BN gamma/beta x alpha, the
     consuming conv2 kernel slice / alpha — fp output is IDENTICAL up
     to rounding (fp mAP moves 0.8224 -> 0.8161) but conv2's input
     activations now have channels alpha x hotter, wrecking the
     per-tensor activation scale;
  3. measure fp / int8-dynamic / int8-static+SmoothQuant;
  4. fine-tune twice with the SAME budget (Adam 1e-5, fix-bn): once
     plain fp (control), once under int8_eval(qat=True);
  5. re-measure. Success = the QAT model's fp->int8 gap collapses while
     the control's does not.

Measured round 4 (alpha=64, n_out=4, 150 ft epochs, seeds pinned —
table recorded in PROFILE.md §int8-qat):
  fp_injected 0.8161 | int8-dyn pre 0.5642 (gap 0.252) |
  int8-static+SQ pre 0.7919 | control post: fp 0.9612 / int8-dyn
  0.6078 (gap 0.353 — extra training alone does NOT fix int8) |
  QAT post: fp 0.7540 / int8-dyn 0.7352 (gap 0.019, int8 +0.171 over
  pre-QAT) with the outlier gamma ratio still at 64x — QAT learned
  weights that TOLERATE quantization rather than removing the outliers.

Usage: python tools/measure_qat_recovery.py [--alpha 64] [--n-out 4]
           [--ft-epochs 150] [--epochs 200] [--work /tmp/qat_work]
Prints one JSON dict of all measurements.
"""
import argparse
import json
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax

jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
import flax
import jax.numpy as jnp
import numpy as np
import optax

import tscd_tpu.models.blocks as blocks
from tscd_tpu.exp import get_exp
from tscd_tpu.models.blocks import int8_eval
from tscd_tpu.train.checkpoint import load_checkpoint, save_checkpoint
from tscd_tpu.train.losses import yolox_loss
from tscd_tpu.train.step import init_train_state


def make_hard_coco(root, n_imgs=32, size=(96, 128), n_cls=4, seed=3):
    """Quantization-sensitive detection task: per-class grayscale fill
    levels 24 apart on a noisy bg-80 canvas, 12-20 px boxes."""
    import cv2
    rng = np.random.default_rng(seed)
    h, w = size
    os.makedirs(os.path.join(root, "train2017"), exist_ok=True)
    images, annotations = [], []
    ann_id = 1
    for i in range(n_imgs):
        fn = f"{i:012d}.jpg"
        img = np.clip(rng.normal(80, 4, (h, w, 3)), 0, 255).astype(np.uint8)
        for _ in range(3):
            c = int(rng.integers(n_cls))
            bw = int(rng.integers(12, 21)); bh = int(rng.integers(10, 17))
            x0 = int(rng.integers(2, w - bw - 2))
            y0 = int(rng.integers(2, h - bh - 2))
            level = 104 + 24 * c   # 104,128,152,176 on bg 80
            img[y0:y0 + bh, x0:x0 + bw] = level
            annotations.append({
                "id": ann_id, "image_id": i, "category_id": c + 1,
                "bbox": [x0, y0, bw, bh], "area": bw * bh, "iscrowd": 0})
            ann_id += 1
        cv2.imwrite(os.path.join(root, "train2017", fn), img,
                    [cv2.IMWRITE_JPEG_QUALITY, 100])
        images.append({"id": i, "file_name": fn, "width": w, "height": h})
    os.makedirs(os.path.join(root, "annotations"), exist_ok=True)
    coco = {"images": images, "annotations": annotations,
            "categories": [{"id": c + 1, "name": f"cat{c}"}
                           for c in range(n_cls)]}
    for name in ("instances_train2017.json", "instances_val2017.json"):
        with open(os.path.join(root, "annotations", name), "w") as f:
            json.dump(coco, f)
    return root


def inject_outliers(params, alpha, n_out, min_c=16):
    """Outlier-channel surgery on every Bottleneck conv1->conv2 pair.

    Scales conv1's BN gamma/beta by alpha and divides the consuming
    conv2 kernel input-slice by alpha: the fp function is unchanged
    (up to fp rounding) but conv2's INPUT activations carry n_out
    channels alpha x hotter than the rest — exactly the activation
    landscape (GPT-style outlier channels) that breaks per-tensor
    activation quantization."""
    flat = flax.traverse_util.flatten_dict(params)
    new = dict(flat)
    injected = []
    for k in list(flat):
        if k[-3:] == ("conv2", "conv", "kernel"):
            ker = np.asarray(flat[k])
            if ker.ndim != 4 or ker.shape[0] != 3:
                continue
            C = ker.shape[2]
            if C < min_c or n_out >= C:
                continue
            base = k[:-3]
            gk = base + ("conv1", "bn", "scale")
            bk = base + ("conv1", "bn", "bias")
            if gk not in flat or flat[gk].shape[0] != C:
                continue
            g = np.asarray(flat[gk]).copy(); g[:n_out] *= alpha
            b = np.asarray(flat[bk]).copy(); b[:n_out] *= alpha
            ker = ker.copy(); ker[:, :, :n_out, :] /= alpha
            new[gk] = jnp.asarray(g); new[bk] = jnp.asarray(b)
            new[k] = jnp.asarray(ker)
            injected.append("/".join(base))
    return flax.traverse_util.unflatten_dict(new), injected


def make_fixbn_step(model, tx, qat=False):
    """Fix-bn fine-tune step; with qat=True the forward traces under
    int8_eval(qat=True) so eligible convs run as STE fake-quant."""
    def raw(state, images, labels):
        def loss_fn(params):
            out = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                images, False, False,
                method=lambda mdl, x, t, d: mdl(x, train=t, decode=d))
            losses = yolox_loss(out["outputs"], labels, out["hw"],
                                (8, 16, 32), use_l1=True)
            return losses["total_loss"], losses
        (_, losses), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state,
                                       state.params)
        params = optax.apply_updates(state.params, updates)
        return state._replace(params=params, opt_state=opt_state,
                              step=state.step + 1), losses
    jitted = jax.jit(raw)
    if not qat:
        return jitted
    def wrapped(state, images, labels):
        with int8_eval(qat=True):
            return jitted(state, images, labels)
    return wrapped


def run(alpha=64.0, n_out=4, ft_epochs=150, epochs=200,
        work="/tmp/qat_work", verbose=True):
    os.makedirs(work, exist_ok=True)
    root = make_hard_coco(os.path.join(work, "coco"))
    exp_src = f"""
from tscd_tpu.exp.yolox_base import Exp as B
class Exp(B):
    def __init__(self):
        super().__init__()
        self.depth, self.width = 0.33, 0.125
        self.num_classes = 4
        self.input_size = self.test_size = (96, 128)
        self.batch_size = 8
        self.max_epoch = {epochs}
        self.no_aug_epochs = {epochs}
        self.eval_interval = 1000
        self.basic_lr_per_img = 0.2 / 64
        self.warmup_epochs = 5
        self.data_dir = {root!r}
        self.train_name = self.val_name = "train2017"
        self.output_dir = {os.path.join(work, 'out')!r}
        self.exp_name = "qat_eff"
        self.enable_mixup = False
        self.mosaic_prob = 0.0
        self.flip_prob = 0.0
        self.seed = 0
"""
    exp_path = os.path.join(work, "exp.py")
    open(exp_path, "w").write(exp_src)
    exp = get_exp(exp_path)
    trainer = exp.get_trainer(None)

    say = print if verbose else (lambda *a, **k: None)
    base_ckpt = os.path.join(work, "base_ckpt.msgpack")
    if os.path.exists(base_ckpt):
        restored = load_checkpoint(base_ckpt)
        variables = {"params": restored["params"],
                     "batch_stats": restored["batch_stats"]}
        say("loaded cached base weights")
    else:
        t0 = time.time()
        state = trainer.train()
        variables = {"params": state.ema_params,
                     "batch_stats": state.ema_batch_stats}
        save_checkpoint(variables, work, name="base")
        say(f"base train {time.time()-t0:.0f}s")

    evaluator = exp.get_evaluator()

    def ap(v, mode=None):
        if mode is None:
            r = evaluator.evaluate(trainer.make_predict_fn(v))
        else:
            with int8_eval(**mode):
                r = evaluator.evaluate(trainer.make_predict_fn(v))
        return {"mAP": round(float(r["mAP"]), 4),
                "AP50": round(float(r["AP50"]), 4)}

    # the tiny model's convs are below the serving-size gates; lower
    # them so quantization actually engages (gates exist for PERF on
    # full-size models, not correctness)
    old_gates = (blocks.INT8_MIN_CIN, blocks.INT8_MIN_CIN_STATIC)
    blocks.INT8_MIN_CIN = blocks.INT8_MIN_CIN_STATIC = 16
    try:
        res = {}
        res["fp_base"] = ap(variables)
        say("fp base:", res["fp_base"])

        params_inj, injected = inject_outliers(
            variables["params"], alpha, n_out)
        say(f"injected {len(injected)} bottlenecks "
            f"(alpha={alpha}, n={n_out})")
        v_inj = {"params": params_inj,
                 "batch_stats": variables["batch_stats"]}
        res["fp_injected"] = ap(v_inj)
        say("fp after surgery:", res["fp_injected"])

        res["int8_dyn_pre"] = ap(v_inj, mode=dict())
        say("int8 dynamic pre-QAT:", res["int8_dyn_pre"])

        # static + SmoothQuant calibrated on 8 training images
        loader = exp.get_data_loader(no_aug=True)
        batch = next(iter(loader))
        calib_imgs = jnp.asarray(batch["imgs"][:8])
        model = trainer.model

        @jax.jit
        def calib(v, x):
            _, muts = model.apply(v, x, False, True, mutable=["quant"])
            return muts

        with int8_eval(calibrate=True):
            muts = calib(v_inj, calib_imgs)
        vq = {**v_inj, "quant": muts["quant"]}
        res["int8_static_pre"] = ap(vq, mode=dict(static=True))
        say("int8 static+smoothquant pre-QAT:", res["int8_static_pre"])

        def finetune(v, n_epochs, qat=False, lr=1e-5):
            # Adam (per-param normalized) + zero_nans: the injected
            # model has alpha x-magnitude gamma outliers, so SGD step
            # sizes are wildly mismatched across params and early
            # fake-quant steps can spike.
            tx = optax.chain(optax.zero_nans(),
                             optax.clip_by_global_norm(1.0),
                             optax.adam(lr))
            state = init_train_state(v, tx)
            step = make_fixbn_step(trainer.model, tx, qat=qat)
            ld = exp.get_data_loader(no_aug=True)
            it = iter(ld)
            last = None
            for _ in range(n_epochs):
                for _ in range(ld.steps_per_epoch):
                    b = next(it)
                    state, losses = step(state, jnp.asarray(b["imgs"]),
                                         jnp.asarray(b["labels"]))
                    last = float(losses["total_loss"])
            say(("qat" if qat else "fp"), "ft final loss:", last)
            return {"params": state.params,
                    "batch_stats": v["batch_stats"]}

        # control: same-budget fp fine-tune (no fake-quant) —
        # attributes any int8 recovery to QAT rather than to extra
        # training steps
        t0 = time.time()
        v_ctl = finetune(v_inj, ft_epochs, qat=False)
        say(f"fp-control ft {time.time()-t0:.0f}s")
        res["fp_post_ctl"] = ap(v_ctl)
        res["int8_dyn_post_ctl"] = ap(v_ctl, mode=dict())
        say("control fp / int8-dyn:", res["fp_post_ctl"],
            res["int8_dyn_post_ctl"])

        t0 = time.time()
        v_qat = finetune(v_inj, ft_epochs, qat=True)
        say(f"qat ft {time.time()-t0:.0f}s")

        # outlier persistence: did QAT keep the outlier channels?
        flat = flax.traverse_util.flatten_dict(v_qat["params"])
        for k in flat:
            if ("/".join(k[:-3]) == injected[0]
                    and k[-3:] == ("conv1", "bn", "scale")):
                g = np.abs(np.asarray(flat[k]))
                res["outlier_ratio_post"] = float(
                    g[:n_out].min() / np.median(g[n_out:]))
                say("outlier gamma ratio post-QAT:",
                    res["outlier_ratio_post"])

        res["fp_post_qat"] = ap(v_qat)
        res["int8_dyn_post_qat"] = ap(v_qat, mode=dict())
        say("fp post-QAT:", res["fp_post_qat"])
        say("int8 dynamic post-QAT:", res["int8_dyn_post_qat"])
        return res
    finally:
        blocks.INT8_MIN_CIN, blocks.INT8_MIN_CIN_STATIC = old_gates


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--alpha", type=float, default=64.0)
    ap.add_argument("--n-out", type=int, default=4)
    ap.add_argument("--ft-epochs", type=int, default=150)
    ap.add_argument("--epochs", type=int, default=200)
    ap.add_argument("--work", default="/tmp/qat_work")
    args = ap.parse_args()
    res = run(alpha=args.alpha, n_out=args.n_out,
              ft_epochs=args.ft_epochs, epochs=args.epochs,
              work=args.work)
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
