"""Model export for deployment (TPU-native equivalent of the reference's
demo/{ONNXRuntime,TensorRT,ncnn,MegEngine,OpenVINO} exporters +
tools/export_onnx.py): serialize the jitted forward as StableHLO via
jax.export. The artifact runs on any PJRT runtime (TPU/CPU/GPU) — the
portable-deployment story for an XLA framework; the standalone C++
decode+NMS lives in tscd_tpu/native/yolox_deploy.cpp.

Usage:
  python tools/export.py -f exps/default/yolox_s.py -c ckpt.msgpack \
      --output yolox_s.stablehlo [--tsize 640]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from tscd_tpu.exp import get_exp


def make_parser():
    p = argparse.ArgumentParser("export")
    p.add_argument("-f", "--exp_file", type=str, default=None)
    p.add_argument("-n", "--name", type=str, default=None)
    p.add_argument("-c", "--ckpt", type=str, default=None)
    p.add_argument("--output", type=str, default="model.stablehlo")
    p.add_argument("--tsize", type=int, default=None)
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--video", action="store_true",
                   help="export the TSCD streaming step: "
                        "(frames, time_emb, matcher_state) -> "
                        "(refined dets, original dets, new state)")
    p.add_argument("--int8", action="store_true",
                   help="export the w8a8 int8 serving forward (dynamic "
                        "activation scales baked into the artifact)")
    p.add_argument("--raw", action="store_true",
                   help="export the RAW head output (B, A, 5+C logits) "
                        "instead of the decoded boxes — the contract the "
                        "C++ PJRT runner + native decode/NMS consume "
                        "(native/pjrt_runner.cpp), mirroring the "
                        "reference's TensorRT demo split")
    p.add_argument("opts", nargs="*")
    return p


def export_tscd(exp, args):
    """Streaming TSCD eval-step export: the matcher state is part of the
    signature, so the consumer threads it between windows exactly like
    tscd_tpu's own evaluator."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import export as jax_export

    from tscd_tpu.models.matching import MatcherState, init_matcher_state
    from tscd_tpu.models.tscd import tscd_eval_postprocess
    from tscd_tpu.ops.position import get_timing_signal_1d
    from tscd_tpu.ops.postprocess import Detections
    from tscd_tpu.train.checkpoint import load_checkpoint, load_tolerant

    for nt, name in ((MatcherState, "tscd_tpu.MatcherState"),
                     (Detections, "tscd_tpu.Detections")):
        try:
            jax_export.register_namedtuple_serialization(
                nt, serialized_name=name)
        except ValueError:
            pass  # already registered

    L, G = exp.lframe_val, exp.gframe_val
    F = L + G
    H, W = exp.test_size
    model = exp.get_model()
    x = jnp.zeros((F, H, W, 3), jnp.float32)
    te = jnp.asarray(get_timing_signal_1d(np.arange(F), 256), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, te, L, G)
    if args.ckpt:
        restored = load_checkpoint(args.ckpt)
        variables = {
            "params": load_tolerant(variables["params"],
                                    restored.get("params", restored)),
            "batch_stats": load_tolerant(
                variables.get("batch_stats", {}),
                restored.get("batch_stats", {}))}
    hidden = int(256 * exp.width)
    st0 = init_matcher_state(exp.minimal_limit, hidden, 4 * hidden)

    def step(frames, time_emb, state):
        out = model.apply(variables, frames, time_emb, L, G, False, state)
        refined, original = tscd_eval_postprocess(out, L, exp.num_classes)
        return refined, original, out["matcher_state"]

    exported = jax_export.export(jax.jit(step))(
        jax.ShapeDtypeStruct((F, H, W, 3), jnp.float32),
        jax.ShapeDtypeStruct((F, 256), jnp.float32),
        jax.tree_util.tree_map(
            lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), st0))
    blob = exported.serialize()
    with open(args.output, "wb") as f:
        f.write(blob)
    print(f"exported TSCD streaming step {args.output} "
          f"({len(blob)} bytes); window (F={F}, {H}, {W}, 3)")
    restored_fn = jax_export.deserialize(blob)
    r = restored_fn.call(x, te, st0)
    print("round-trip OK:", jax.tree_util.tree_map(
        lambda a: a.shape, r[0]))


def main():
    import jax
    import jax.numpy as jnp
    from jax import export as jax_export

    from tscd_tpu.train.checkpoint import load_checkpoint, load_tolerant

    args = make_parser().parse_args()
    if getattr(args, "int8", False):
        # trace-time flag: set for the whole process so both export
        # paths trace the quantized forward (models/blocks.py)
        from tscd_tpu.models.blocks import set_int8_eval
        set_int8_eval(True)
    exp = get_exp(args.exp_file, args.name)
    exp.merge(args.opts)
    if args.tsize:
        exp.test_size = (args.tsize, args.tsize)
    if args.video:
        return export_tscd(exp, args)
    H, W = exp.test_size

    model = exp.get_model()
    x = jnp.zeros((args.batch, H, W, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, False, True)
    if args.ckpt:
        restored = load_checkpoint(args.ckpt)
        variables = {
            "params": load_tolerant(variables["params"],
                                    restored.get("params", restored)),
            "batch_stats": load_tolerant(
                variables.get("batch_stats", {}),
                restored.get("batch_stats", {}))}

    # close over the weights: the exported artifact is self-contained
    def fwd(img):
        out = model.apply(variables, img, False, not args.raw)
        if args.raw:
            return out["outputs"]      # (B, A, 5+C) raw reg + logits
        return out["decoded"]          # (B, A, 5+C) pixels + sigmoided

    exported = jax_export.export(jax.jit(fwd))(
        jax.ShapeDtypeStruct((args.batch, H, W, 3), jnp.float32))
    blob = exported.serialize()
    with open(args.output, "wb") as f:
        f.write(blob)
    mlir = exported.mlir_module()
    with open(args.output + ".mlir", "w") as f:
        f.write(mlir if isinstance(mlir, str) else str(mlir))
    print(f"exported {args.output} ({len(blob)} bytes) + .mlir text; "
          f"input (B={args.batch}, {H}, {W}, 3) float32, "
          f"output (B, A, 5+{exp.num_classes})")
    # round-trip check
    restored_fn = jax_export.deserialize(blob)
    y = restored_fn.call(x)
    print("round-trip OK:", y.shape)


if __name__ == "__main__":
    main()
