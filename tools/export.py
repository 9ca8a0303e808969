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
    p.add_argument("opts", nargs="*")
    return p


def main():
    import jax
    import jax.numpy as jnp
    from jax import export as jax_export

    from tscd_tpu.train.checkpoint import load_checkpoint, load_tolerant

    args = make_parser().parse_args()
    exp = get_exp(args.exp_file, args.name)
    exp.merge(args.opts)
    if args.tsize:
        exp.test_size = (args.tsize, args.tsize)
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
        out = model.apply(variables, img, False, True)
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
