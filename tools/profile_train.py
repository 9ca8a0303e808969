"""Per-stage timing of the TSCD-Large train step (VERDICT r2 Weak #5 /
Next #7): forward / SimOTA+loss / backward / optimizer+EMA cuts, plus
the frozen-backbone fast path (stop_backbone_grad).

Stage cuts are separate jitted programs; differences between them give
the stage costs (standalone microbenches carry a ~1.5 ms dispatch floor
on the axon tunnel — see PROFILE.md — so only in-program cuts are
trusted). Timing uses a scalar host readback as the barrier.

Usage: python tools/profile_train.py [--f 16] [--size 576] [--iters 5]
"""

import argparse
import json
import os
import time

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_comp_cache"))
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--f", type=int, default=16)
    ap.add_argument("--size", type=int, default=576)
    ap.add_argument("--lframe", type=int, default=4)
    ap.add_argument("--depth", type=float, default=1.0)
    ap.add_argument("--width", type=float, default=1.0)
    ap.add_argument("--stop-backbone-grad", action="store_true",
                    help="profile the frozen-backbone fast path instead "
                    "of the plain step (run in a FRESH process: two "
                    "models alive at once skews HBM layout/timings)")
    ap.add_argument("--int8-backbone", action="store_true",
                    help="run the frozen backbone forward in w8a8 "
                    "(exp knob int8_frozen_backbone)")
    ap.add_argument("--full-finetune", action="store_true",
                    help="no frozen prefixes: optimizer updates ALL "
                    "params, so the backbone backward cannot be "
                    "dead-code-eliminated through the freeze mask "
                    "(the stage-1-style full fine-tune cost)")
    args = ap.parse_args()

    import optax

    from tscd_tpu.models.tscd import TSCD
    from tscd_tpu.ops.decode import anchor_centers, decode_outputs
    from tscd_tpu.ops.position import get_timing_signal_1d
    from tscd_tpu.ops.simota import simota_assign_batch
    from tscd_tpu.train.ema import ema_update
    from tscd_tpu.train.losses import labels_to_padded, tscd_loss
    from tscd_tpu.train.optim import build_sgd
    from tscd_tpu.train.step import TrainState, init_train_state

    L = args.lframe
    F, H, W = args.f, args.size, args.size
    G = F - L
    P = 50
    strides = (8, 16, 32)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 255, (F, H, W, 3)), jnp.float32)
    te = jnp.asarray(get_timing_signal_1d(np.arange(F), 256), jnp.float32)
    labels_np = np.zeros((F, 40, 5), np.float32)
    for f in range(F):
        for g in range(6):
            wh = rng.uniform(40, 160, 2)
            cxy = rng.uniform(wh / 2, args.size - wh / 2)
            labels_np[f, g] = [rng.integers(0, 30), *cxy, *wh]
    labels = jnp.asarray(labels_np)

    def build(stop_grad):
        model = TSCD(num_classes=30, depth=args.depth, width=args.width,
                     num_proposals=P, heads=4, dtype=jnp.bfloat16,
                     stop_backbone_grad=stop_grad)
        variables = jax.jit(
            lambda: model.init(jax.random.PRNGKey(0), x, te, L, G))()
        freeze = () if args.full_finetune else ("backbone",)
        tx = build_sgd(lambda i: 0.01, freeze_prefixes=freeze)
        state = init_train_state(variables, tx)
        return model, variables, tx, state

    if args.int8_backbone:
        import contextlib

        from tscd_tpu.models.blocks import int8_eval
        _stack = contextlib.ExitStack()
        _stack.enter_context(int8_eval(scope=(("backbone",),)))

    model, variables, tx, state = build(args.stop_backbone_grad)

    def apply_fix_bn(params, bs):
        return model.apply({"params": params, "batch_stats": bs},
                           x, te, L, G, False)

    # ---- stage-cut programs (all under the fix_bn stage-2 recipe)
    def fwd_only(state):
        out = apply_fix_bn(state.params, state.batch_stats)
        return (out["refined_cls_logits"], out["matcher_reg_offsets"],
                out["matcher_obj_logits"])

    def fwd_simota(state):
        out = apply_fix_bn(state.params, state.batch_stats)
        raw = out["raw_outputs"].astype(jnp.float32)
        dec = decode_outputs(raw, out["hw"], strides)
        gt_boxes, gt_classes, gt_valid = labels_to_padded(labels)
        xs, ys, ss = anchor_centers(out["hw"], strides)
        tgt = simota_assign_batch(dec[..., :4], raw[..., 4], raw[..., 5:],
                                  gt_boxes, gt_classes, gt_valid,
                                  jnp.asarray(xs), jnp.asarray(ys),
                                  jnp.asarray(ss))
        return out["refined_cls_logits"], tgt.fg_mask

    def fwd_loss(state):
        out = apply_fix_bn(state.params, state.batch_stats)
        return tscd_loss(out, labels, strides, L)["total_loss"]

    def raw_grads(state):
        return jax.grad(lambda p: tscd_loss(
            apply_fix_bn(p, state.batch_stats), labels, strides,
            L)["total_loss"])(state.params)

    def grad_fn(state):
        # reduce the grads tree to ONE scalar: returning the full tree
        # forces XLA to materialize every grad array into program
        # outputs (measured +30 ms of pure output layout/copy at
        # TSCD-Large scale), which the real train step never pays —
        # its grads feed the optimizer in-program.
        return jax.tree_util.tree_reduce(
            lambda a, g: a + jnp.sum(g.astype(jnp.float32)),
            raw_grads(state), 0.0)

    def full_step(state):
        grads = raw_grads(state)
        updates, opt_state = tx.update(grads, state.opt_state,
                                       state.params)
        params = optax.apply_updates(state.params, updates)
        ns = state.step + 1
        return TrainState(
            params=params, batch_stats=state.batch_stats,
            opt_state=opt_state,
            ema_params=ema_update(state.ema_params, params, ns),
            ema_batch_stats=state.ema_batch_stats, step=ns)

    def force(r):
        leaf = jax.tree_util.tree_leaves(r)[0]
        return float(jnp.sum(leaf.astype(jnp.float32).ravel()[:1]))

    def time_fn(fn):
        f = jax.jit(fn)
        r = f(state)
        force(r)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            r = f(state)
        force(r)
        return (time.perf_counter() - t0) * 1000.0 / args.iters

    def time_step_chained(fn):
        # the trainer's actual loop shape: state donated, the step's
        # output feeds the next step (no full-state output readback,
        # buffers reused in place)
        f = jax.jit(fn, donate_argnums=(0,))
        s = jax.tree_util.tree_map(jnp.copy, state)
        s = f(s)
        force(s.step)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            s = f(s)
        force(s.step)
        return (time.perf_counter() - t0) * 1000.0 / args.iters

    ms = {}
    if args.stop_backbone_grad:
        ms["forward_loss"] = time_fn(fwd_loss)
        ms["grad"] = time_fn(grad_fn)
        ms["step"] = time_step_chained(full_step)
        report = {
            "frames": F, "lframe": L, "size": args.size,
            "mode": "stop_backbone_grad"
                    + ("+int8_backbone" if args.int8_backbone else ""),
            "backward_ms": round(ms["grad"] - ms["forward_loss"], 2),
            "opt_ema_ms": round(ms["step"] - ms["grad"], 2),
            "full_step_ms": round(ms["step"], 2),
        }
    else:
        ms["forward"] = time_fn(fwd_only)
        ms["forward_simota"] = time_fn(fwd_simota)
        ms["forward_loss"] = time_fn(fwd_loss)
        ms["grad"] = time_fn(grad_fn)
        ms["step"] = time_step_chained(full_step)
        report = {
            "frames": F, "lframe": L, "size": args.size,
            "mode": ("full_finetune" if args.full_finetune
                     else "frozen_backbone_sgd"),
            "forward_ms": round(ms["forward"], 2),
            "simota_ms": round(ms["forward_simota"] - ms["forward"], 2),
            "loss_rest_ms": round(ms["forward_loss"]
                                  - ms["forward_simota"], 2),
            "backward_ms": round(ms["grad"] - ms["forward_loss"], 2),
            "opt_ema_ms": round(ms["step"] - ms["grad"], 2),
            "full_step_ms": round(ms["step"], 2),
        }
    print(json.dumps(report))


if __name__ == "__main__":
    main()
