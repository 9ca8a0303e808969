"""Per-stage timing of the TSCD-Large 576px streaming-eval window
(VERDICT r1 item 4: attack the backbone MXU%, report ms-per-stage).

Stages (static cuts in models/tscd.py `stage`):
  backbone  — CSPDarknet-L + PAFPN over the 32-frame window
  dense     — + towers, dense decode, fixed-slot proposal selection
  full      — + MCA cls/reg aggregation, CAFM matcher, refined heads

Timing uses a scalar host readback as the barrier (the axon tunnel does
not honor block_until_ready). Mirrors the reference evaluator's ms
accounting (yolox/evaluators/vid_evaluator_v2.py:429-439).

Usage: python tools/profile_eval.py [--cast-bf16] [--iters 10] [--f 32]
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
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--f", type=int, default=32, help="window frames")
    ap.add_argument("--size", type=int, default=576)
    ap.add_argument("--cast-bf16", action="store_true",
                    help="pre-cast params to bf16 (skip per-step casts)")
    ap.add_argument("--sparse", action="store_true",
                    help="proposal-patch vid towers (sparse_vid_towers)")
    args = ap.parse_args()

    from tscd_tpu.models.matching import init_matcher_state
    from tscd_tpu.models.tscd import TSCD
    from tscd_tpu.ops.position import get_timing_signal_1d

    L, G = 1, args.f - 1
    F, H, W = args.f, args.size, args.size
    P = 50
    model = TSCD(num_classes=30, depth=1.0, width=1.0, num_proposals=P,
                 heads=4, sparse_vid_towers=args.sparse, dtype=jnp.bfloat16)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 255, (F, H, W, 3)), jnp.float32)
    te = jnp.asarray(get_timing_signal_1d(np.arange(F), 256), jnp.float32)
    variables = jax.jit(
        lambda: model.init(jax.random.PRNGKey(0), x, te, L, G))()
    if args.cast_bf16:
        variables = {
            "params": jax.tree.map(lambda a: a.astype(jnp.bfloat16),
                                   variables["params"]),
            "batch_stats": variables["batch_stats"],
        }

    hidden = 256
    state0 = init_matcher_state(P, hidden, 4 * hidden, dtype=jnp.bfloat16)

    def force(r):
        leaf = jax.tree_util.tree_leaves(r)[0]
        return float(jnp.sum(leaf.astype(jnp.float32).ravel()[:1]))

    fns = {
        "backbone": jax.jit(lambda v, x, te, st: model.apply(
            v, x, te, L, G, False, st, stage="backbone")),
        "dense": jax.jit(lambda v, x, te, st: model.apply(
            v, x, te, L, G, False, st, stage="dense")["proposals"]),
        "full": jax.jit(lambda v, x, te, st: (
            lambda o: (o["refined_boxes"], o["refined_cls_logits"],
                       o["matcher_obj_logits"], o["matcher_state"]))(
            model.apply(v, x, te, L, G, False, st))),
    }

    ms = {}
    for name, fn in fns.items():
        r = fn(variables, x, te, state0)   # compile
        force(r)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            r = fn(variables, x, te, state0)
        force(r)
        ms[name] = (time.perf_counter() - t0) * 1000.0 / args.iters

    report = {
        "frames": F, "size": args.size, "cast_bf16": args.cast_bf16,
        "sparse": args.sparse,
        "backbone_ms": round(ms["backbone"], 2),
        "towers_decode_select_ms": round(ms["dense"] - ms["backbone"], 2),
        "agg_matcher_refine_ms": round(ms["full"] - ms["dense"], 2),
        "full_ms": round(ms["full"], 2),
        "fps": round(F / (ms["full"] / 1000.0), 2),
    }
    print(json.dumps(report))


if __name__ == "__main__":
    main()
