"""C++ PJRT runner (VERDICT r4 next #6): build native/pjrt_runner.cpp,
and — when a TPU is reachable — run a tools/export.py --raw artifact
through it end-to-end (PJRT compile + execute + native decode/NMS) and
compare detections against the python forward + ctypes NMS on the same
synthetic image. The CPU-only CI path pins the build, the CLI contract,
and the export artifact; the device path is opt-in via
TSCD_RUN_TPU_TESTS=1 (no CPU PJRT plugin ships in this image).
"""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
NATIVE = os.path.join(REPO, "tscd_tpu", "native")
TF_INC = "/opt/venv/lib/python3.12/site-packages/tensorflow/include"
AXON_PLUGIN = "/opt/axon/libaxon_pjrt.so"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(TF_INC), reason="pjrt_c_api.h not available")


@pytest.fixture(scope="module")
def runner_bin(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("pjrt") / "pjrt_runner")
    subprocess.run(
        ["g++", "-O2", "-std=c++17",
         os.path.join(NATIVE, "pjrt_runner.cpp"),
         os.path.join(NATIVE, "yolox_deploy.cpp"),
         "-ldl", f"-I{TF_INC}", "-o", out],
        check=True, capture_output=True, text=True)
    return out


def test_build_and_help(runner_bin):
    r = subprocess.run([runner_bin, "--help"], capture_output=True,
                       text=True, timeout=60)
    assert r.returncode == 0 and "--plugin" in r.stdout


def test_missing_args_fail_fast(runner_bin):
    r = subprocess.run([runner_bin], capture_output=True, text=True,
                       timeout=60)
    assert r.returncode != 0 and "required" in r.stderr


def synth_image(H, W):
    """Must match pjrt_runner.cpp's synthetic-image formula."""
    n = H * W * 3
    i = np.arange(n, dtype=np.uint64)
    return ((i * np.uint64(2654435761)) % np.uint64(256)).astype(
        np.float32).reshape(1, H, W, 3)


@pytest.fixture(scope="module")
def tiny_export(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("export") / "yolox.stablehlo")
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "export.py"),
         "-f", os.path.join(REPO, "exps", "default", "yolox_s.py"),
         "--tsize", "128", "--raw", "--output", out,
         "depth", "0.33", "width", "0.125", "num_classes", "5"],
        capture_output=True, text=True, timeout=560, env=env, cwd=REPO)
    assert r.returncode == 0, r.stderr[-2000:]
    assert os.path.exists(out + ".mlir")
    return out


def test_raw_export_artifact(tiny_export):
    """--raw exports raw logits (decode/NMS left to the C++ side)."""
    from jax import export as jax_export
    with open(tiny_export, "rb") as f:
        restored = jax_export.deserialize(f.read())
    y = restored.call(synth_image(128, 128))
    a = np.asarray(y)
    assert a.shape == (1, 336, 10)
    # raw head output: reg is unbounded, obj/cls are logits (can be
    # negative) — a decoded artifact would have [4:] in (0,1)
    assert a[..., 4:].min() < 0


@pytest.mark.skipif(os.environ.get("TSCD_RUN_TPU_TESTS") != "1",
                    reason="device run is opt-in (no CPU PJRT plugin)")
def test_runner_matches_python_on_device(runner_bin, tiny_export,
                                         tmp_path):
    assert os.path.exists(AXON_PLUGIN), "axon PJRT plugin missing"
    H = W = 128
    ncls = 5
    img = synth_image(H, W)

    # python golden: CPU forward + the same native decode/NMS via ctypes
    import ctypes

    from jax import export as jax_export

    from tscd_tpu.native import load_library
    with open(tiny_export, "rb") as f:
        raw = np.ascontiguousarray(np.asarray(
            jax_export.deserialize(f.read()).call(img))[0])
    hw = np.asarray([(H // s, W // s) for s in (8, 16, 32)], np.int32)
    strides = np.asarray((8, 16, 32), np.int32)
    lib = load_library("yolox_deploy")
    assert lib is not None
    lib.yolox_decode_nms.restype = ctypes.c_int32
    buf = np.zeros((30, 7), np.float32)
    n = lib.yolox_decode_nms(
        raw.ctypes.data_as(ctypes.c_void_p),
        ctypes.c_int64(raw.shape[0]), ctypes.c_int64(5),
        hw.ctypes.data_as(ctypes.c_void_p),
        strides.ctypes.data_as(ctypes.c_void_p), ctypes.c_int64(3),
        ctypes.c_float(0.25), ctypes.c_float(0.45), ctypes.c_int32(30),
        buf.ctypes.data_as(ctypes.c_void_p))
    want = buf[:n]
    want = np.concatenate(
        [want[:, :4], (want[:, 4] * want[:, 5])[:, None],
         want[:, 6:7]], -1)

    # this deployment's plugin needs its create options (the same ones
    # the python registration passes — axon/register/pjrt.py:160-210)
    import uuid
    gen = os.environ.get("PALLAS_AXON_TPU_GEN", "v5e")
    rc = "1" if os.environ.get("PALLAS_AXON_REMOTE_COMPILE") == "1" else "0"
    axon_opts = [
        "--set-int", f"remote_compile={rc}",
        "--set-int", "local_only=0",
        "--set-int", "priority=0",
        "--set-str", f"topology={gen}:1x1x1",
        "--set-int", "n_slices=1",
        "--set-str", f"session_id={uuid.uuid4()}",
        "--set-int", f"rank={0xFFFF_FFFF}",
    ]
    r = subprocess.run(
        [runner_bin, "--plugin", AXON_PLUGIN, "--module",
         tiny_export + ".mlir", "--height", str(H), "--width", str(W),
         "--classes", str(ncls), "--conf", "0.25", "--nms", "0.45",
         "--max-out", "30"] + axon_opts,
        capture_output=True, text=True, timeout=560)
    assert r.returncode == 0, r.stderr[-2000:]
    lines = [ln for ln in r.stdout.splitlines() if ln.startswith("det ")]
    got = np.array([[float(v) for v in ln.split()[1:]] for ln in lines])

    assert len(got) == len(want), (r.stdout, want)
    if len(got):
        # TPU fp32 vs CPU fp32 drift: boxes within a pixel, scores 2%
        np.testing.assert_allclose(got[:, :4], want[:, :4], atol=1.5)
        np.testing.assert_allclose(got[:, 4], want[:, 4], atol=0.02)
        np.testing.assert_array_equal(got[:, 5], want[:, 5])
