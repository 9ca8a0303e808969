"""Headline benchmark: TSCD-Large streaming eval throughput at 576px.

Mirrors the reference evaluator's accounting (yolox/evaluators/
vid_evaluator_v2.py:429-439 — average inference ms over the frames of a
sequence, model forward + in-graph postprocess), on ONE chip. The forward
here is the full TSCD eval path: CSPDarknet-L + PAFPN over a 32-frame
(lframe=1, gframe=31) window — the TSCD-Large VID eval config
(exps/TSCD_VID/vid_tscd_large.py) — dense decode, fixed-slot proposal
selection + NMS, MCA cls/reg aggregation, CAFM matcher with carried
temporal state, refined decode. bf16 compute (the TPU analogue of the
reference's fp16 eval).

Baseline: the reference publishes no TSCD fps number; the anchor is
YOLOX-L at 14.5 ms/img on V100 (docs/model_zoo.md:9) = 69 fps, an UPPER
bound on reference TSCD-Large throughput (TSCD adds the whole video stack
on top of YOLOX-L). vs_baseline = our_fps / 69.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import re
import subprocess
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_comp_cache"))
import jax.numpy as jnp
import numpy as np

BASELINE_FPS = 69.0  # YOLOX-L V100 fp16, docs/model_zoo.md:9 (14.5 ms/img)

METRIC = "tscd_large_576_eval_fps"

# The axon-tunneled TPU worker goes down for ~15 min when it crashes
# (CLAUDE.md); a bench attempt against a down worker can HANG for ~30
# minutes before the UNAVAILABLE error surfaces (VERDICT r3 missing #1).
# So: (a) gate every attempt on a cheap subprocess probe with a hard
# deadline, (b) retry with a backoff sized to the worker recovery,
# (c) on final failure emit ONE structured JSON line so BENCH_rN is
# machine-readable either way.
PROBE_TIMEOUT_S = int(os.environ.get("TSCD_BENCH_PROBE_TIMEOUT", "180"))
ATTEMPTS = int(os.environ.get("TSCD_BENCH_ATTEMPTS", "4"))
BACKOFF_S = int(os.environ.get("TSCD_BENCH_BACKOFF", "300"))

_PROBE_SRC = (
    "import jax, jax.numpy as jnp;"
    "x = jnp.ones((8, 8));"
    "print(float((x @ x).sum()))"
)


def probe_backend() -> str:
    """Run a tiny device op in a SUBPROCESS with a hard deadline.

    Returns '' on success, else a one-line error description. A
    subprocess is the only reliable deadline here: an in-process jax
    call against a down axon worker blocks uninterruptibly.
    """
    try:
        r = subprocess.run([sys.executable, "-c", _PROBE_SRC],
                           capture_output=True, text=True,
                           timeout=PROBE_TIMEOUT_S)
    except subprocess.TimeoutExpired:
        return f"probe timed out after {PROBE_TIMEOUT_S}s (worker hung)"
    if r.returncode != 0:
        tail = (r.stderr or r.stdout).strip().splitlines()
        return "probe failed: " + (tail[-1] if tail else
                                   f"rc={r.returncode}")
    return ""


def toolchain_versions() -> dict:
    """jax/jaxlib/backend versions so a perf move between rounds is
    attributable to the toolchain vs the code (VERDICT r3 weak #5)."""
    info = {"jax": jax.__version__}
    try:
        import jaxlib
        info["jaxlib"] = jaxlib.__version__
    except Exception:
        pass
    try:
        backend = jax.extend.backend.get_backend()
        info["backend_platform"] = backend.platform
        info["backend_version"] = str(
            getattr(backend, "platform_version", ""))[:120]
    except Exception:
        pass
    return info


# exception signatures worth the 300s worker-recovery backoff: backend/
# transport faults. Anything else (ImportError, shape mismatch, a bug in
# a bench section) is deterministic — re-running it 3x with 300s sleeps
# just delays the structured-error line the driver machine-reads.
_RETRYABLE = re.compile(
    r"UNAVAILABLE|DEADLINE|INTERNAL|unavailable|connection|socket|"
    r"terminated|worker|XlaRuntimeError|RuntimeError", re.I)


def main():
    err = None
    for attempt in range(ATTEMPTS):
        if attempt:
            print(f"retrying in {BACKOFF_S}s (attempt "
                  f"{attempt + 1}/{ATTEMPTS}): {err}", file=sys.stderr)
            time.sleep(BACKOFF_S)
        err = probe_backend()
        if err:
            continue
        try:
            run_bench()
            return
        except Exception as e:  # worker can fault mid-run; retry
            import traceback
            traceback.print_exc(file=sys.stderr)
            err = f"bench attempt raised {type(e).__name__}: {e}"
            if not _RETRYABLE.search(err):
                print(f"non-retryable failure, failing fast: {err}",
                      file=sys.stderr)
                break
    print(json.dumps({
        "metric": METRIC,
        "value": None,
        "unit": "frames/sec",
        "vs_baseline": None,
        "error": err,
        "attempts": ATTEMPTS,
        "versions": toolchain_versions(),
    }))
    sys.exit(1)


def run_bench():
    from tscd_tpu.models.matching import init_matcher_state
    from tscd_tpu.models.tscd import TSCD
    from tscd_tpu.ops.position import get_timing_signal_1d

    # the reference TSCD-Large VID eval window: lframe=1 / gframe=31
    # (exps/TSCD_VID/vid_tscd_large.py)
    L, G = 1, 31
    F, H, W = L + G, 576, 576
    width = 1.0
    P = 50
    model = TSCD(num_classes=30, depth=1.0, width=width, num_proposals=P,
                 heads=4, dtype=jnp.bfloat16)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 255, (F, H, W, 3)), jnp.float32)
    te = jnp.asarray(get_timing_signal_1d(np.arange(F), 256), jnp.float32)
    variables = jax.jit(
        lambda: model.init(jax.random.PRNGKey(0), x, te, L, G))()

    hidden = int(256 * width)
    state0 = init_matcher_state(P, hidden, 4 * hidden, dtype=jnp.bfloat16)

    @jax.jit
    def fwd(variables, x, te, st):
        out = model.apply(variables, x, te, L, G, False, st)
        return (out["refined_boxes"], out["refined_cls_logits"],
                out["matcher_obj_logits"], out["matcher_state"])

    def force(res):
        # a tiny scalar host readback is the only reliable execution
        # barrier on the axon-tunneled TPU (block_until_ready returns
        # before remote execution completes there)
        return float(jnp.sum(res[0].astype(jnp.float32)))

    # warmup / compile
    st = state0
    r = fwd(variables, x, te, st)
    force(r)
    st = r[-1]

    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fwd(variables, x, te, st)
        st = r[-1]
    force(r)
    dt = time.perf_counter() - t0
    fps = F * iters / dt

    # per-stage ms (VERDICT r1 item 4): static cuts of the same forward,
    # timed with fewer iters — the stage programs hit the compile cache
    # after the first round
    stages = {}
    try:
        stage_fns = {
            "backbone": jax.jit(lambda v, x, te, st: model.apply(
                v, x, te, L, G, False, st, stage="backbone")),
            "dense": jax.jit(lambda v, x, te, st: model.apply(
                v, x, te, L, G, False, st, stage="dense")["proposals"]),
        }
        ms = {}
        for name, fn in stage_fns.items():
            rr = fn(variables, x, te, state0)
            force(rr)
            t0 = time.perf_counter()
            for _ in range(5):
                rr = fn(variables, x, te, state0)
            force(rr)
            ms[name] = (time.perf_counter() - t0) * 1000.0 / 5
        full_ms = dt * 1000.0 / iters
        stages = {
            "backbone_ms": round(ms["backbone"], 2),
            "towers_decode_select_ms": round(ms["dense"] - ms["backbone"], 2),
            "agg_matcher_refine_ms": round(full_ms - ms["dense"], 2),
            "full_ms": round(full_ms, 2),
        }
    except Exception as e:  # stage breakdown is best-effort; the
        # headline metric stands — but a silent regression in the
        # backbone/dense profiling cuts must still be visible
        import traceback
        print(f"stage breakdown failed: {e!r}", file=sys.stderr)
        traceback.print_exc(file=sys.stderr)
        stages = {"error": repr(e)}

    # int8 (w8a8) serving mode: calibrate static activation scales on
    # the bench window, re-trace the same forward under int8_eval, and
    # report throughput + output divergence vs the bf16 path. The
    # headline stays the bf16-exact path (int8 accuracy on real
    # checkpoints is not measurable in this environment); int8_fps is
    # the serving-mode number.
    int8 = {}
    vq = r8 = st8 = d_fp = d_q = None
    if os.environ.get("TSCD_BENCH_INT8", "1") != "0":
        try:
            from tscd_tpu.models.blocks import (int8_eval,
                                                quantize_int8_scan)

            # Serving-shape calibration: ALL F=32 frames of the bench
            # window, folded through a chunked lax.scan carrying ONE
            # maxima tree (blocks.quantize_int8_scan). The flat F=32
            # calibrate program (~70 mutable max-reduction outputs on
            # top of the whole eval) kernel-faults this worker; the
            # scan program has a single tree output, and the
            # fp-observer calibration makes chunking exact (chunked ==
            # full maxima, tests/test_int8_scan_calib.py).
            Fc = 8
            n_chunks = F // Fc
            xs = x[:n_chunks * Fc].reshape((n_chunks, Fc) + x.shape[1:])
            tes = te[:n_chunks * Fc].reshape(
                (n_chunks, Fc) + te.shape[1:])
            vq = quantize_int8_scan(
                lambda v, xa, ta: model.apply(
                    v, xa, ta, L, Fc - L, False, state0,
                    mutable=["quant"]),
                variables, xs, tes)
            force((jax.tree_util.tree_leaves(vq["quant"])[0][None],))

            with int8_eval(static=True):
                fwd8 = jax.jit(lambda v, x, te, st: (
                    lambda o: (o["refined_boxes"],
                               o["refined_cls_logits"],
                               o["matcher_obj_logits"],
                               o["matcher_state"]))(
                    model.apply(v, x, te, L, G, False, st)))
                r8 = fwd8(vq, x, te, state0)
                force(r8)
            st8 = r8[-1]
            t0 = time.perf_counter()
            for _ in range(iters):
                r8 = fwd8(vq, x, te, st8)
                st8 = r8[-1]
            force(r8)
            int8_fps = F * iters / (time.perf_counter() - t0)
            # divergence vs bf16 on the quantized surface (dense
            # decoded head outputs: backbone + towers + decode). The
            # refined stream is NOT compared here: it passes through
            # discrete matcher/attention-gate decisions whose
            # random-weight sensitivity amplifies any numeric
            # perturbation; on real checkpoints evaluate with
            # tools/tscd_eval.py --int8.
            d_fp = jax.jit(lambda v, x, te, st: model.apply(
                v, x, te, L, G, False, st,
                stage="dense")["raw_outputs"])(variables, x, te, state0)
            with int8_eval(static=True):
                d_q = jax.jit(lambda v, x, te, st: model.apply(
                    v, x, te, L, G, False, st,
                    stage="dense")["raw_outputs"])(vq, x, te, state0)
            delta = np.abs(np.asarray(d_q, np.float32)
                           - np.asarray(d_fp, np.float32))
            int8 = {
                "int8_fps": round(int8_fps, 2),
                "int8_vs_baseline": round(int8_fps / BASELINE_FPS, 3),
                "int8_max_raw_delta": round(float(delta.max()), 4),
                "int8_p999_raw_delta": round(
                    float(np.percentile(delta, 99.9)), 4)}
        except Exception as e:
            import traceback
            print(f"int8 bench failed: {e!r}", file=sys.stderr)
            traceback.print_exc(file=sys.stderr)
            int8 = {"int8_error": repr(e)}

    # training throughput (stage-2 recipe): the frozen-backbone SGD
    # step at the reference's video train shape (F=16, lframe=4, 576px,
    # fix_bn), chained with donated state like the real trainer loop
    # (tools/profile_train.py methodology). Driver-verifies the train
    # number that r3's PROFILE.md could only claim from builder
    # sessions. Ran AFTER the eval timings so its HBM footprint cannot
    # skew them; int8 trees are dropped first.
    train = {}
    if os.environ.get("TSCD_BENCH_TRAIN", "1") != "0":
        try:
            # free the int8 section's device trees before building the
            # train state (quantized param copy + carried bank + dense
            # cut outputs)
            vq = r8 = st8 = d_fp = d_q = None  # noqa: F841
            import optax

            from tscd_tpu.train.ema import ema_update
            from tscd_tpu.train.losses import tscd_loss
            from tscd_tpu.train.optim import build_sgd
            from tscd_tpu.train.step import TrainState, init_train_state

            Lt, Ft = 4, 16
            strides = (8, 16, 32)
            xt = jnp.asarray(rng.uniform(0, 255, (Ft, H, W, 3)),
                             jnp.float32)
            tet = jnp.asarray(get_timing_signal_1d(np.arange(Ft), 256),
                              jnp.float32)
            labels_np = np.zeros((Ft, 40, 5), np.float32)
            for f in range(Ft):
                for g in range(6):
                    wh = rng.uniform(40, 160, 2)
                    cxy = rng.uniform(wh / 2, H - wh / 2)
                    labels_np[f, g] = [rng.integers(0, 30), *cxy, *wh]
            labels = jnp.asarray(labels_np)

            tmodel = TSCD(num_classes=30, depth=1.0, width=width,
                          num_proposals=P, heads=4, dtype=jnp.bfloat16,
                          stop_backbone_grad=True)
            tvars = jax.jit(lambda: tmodel.init(
                jax.random.PRNGKey(0), xt, tet, Lt, Ft - Lt))()
            tx = build_sgd(lambda i: 0.01, freeze_prefixes=("backbone",))
            tstate = init_train_state(tvars, tx)

            def train_step(s):
                grads = jax.grad(lambda p: tscd_loss(
                    tmodel.apply({"params": p,
                                  "batch_stats": s.batch_stats},
                                 xt, tet, Lt, Ft - Lt, False),
                    labels, strides, Lt)["total_loss"])(s.params)
                updates, opt_state = tx.update(grads, s.opt_state,
                                               s.params)
                params = optax.apply_updates(s.params, updates)
                ns = s.step + 1
                return TrainState(
                    params=params, batch_stats=s.batch_stats,
                    opt_state=opt_state,
                    ema_params=ema_update(s.ema_params, params, ns),
                    ema_batch_stats=s.ema_batch_stats, step=ns)

            step_fn = jax.jit(train_step, donate_argnums=(0,))
            tstate = step_fn(tstate)
            float(jnp.sum(tstate.step))  # barrier (compile + 1 step)
            t0 = time.perf_counter()
            t_iters = 8
            for _ in range(t_iters):
                tstate = step_fn(tstate)
            float(jnp.sum(tstate.step))
            t_dt = time.perf_counter() - t0
            train = {
                "train_fps": round(Ft * t_iters / t_dt, 2),
                "train_step_ms": round(t_dt * 1000.0 / t_iters, 2),
                "train_shape": f"F={Ft} lframe={Lt} {H}px "
                               "frozen-backbone SGD fix_bn",
            }
        except Exception as e:
            import traceback
            print(f"train bench failed: {e!r}", file=sys.stderr)
            traceback.print_exc(file=sys.stderr)
            train = {"train_error": repr(e)}

    print(json.dumps({
        "metric": METRIC,
        "value": round(fps, 2),
        "unit": "frames/sec",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
        "stages_ms": stages,
        **int8,
        **train,
        "versions": toolchain_versions(),
    }))


if __name__ == "__main__":
    main()
