"""CLI surface smoke: tools/demo.py run as a real subprocess on a
synthetic image + tiny checkpoint, in fp and in --int8 serving mode
(the flag path through make_parser -> set_int8_eval -> Predictor's jit
trace)."""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
@pytest.mark.parametrize("extra", [[], ["--int8"]])
def test_demo_cli_image(tmp_path, extra):
    import cv2
    import jax
    import jax.numpy as jnp

    img = np.full((96, 128, 3), 80, np.uint8)
    cv2.rectangle(img, (30, 20), (80, 60), (255, 255, 255), -1)
    img_path = str(tmp_path / "in.jpg")
    cv2.imwrite(img_path, img)

    exp_file = tmp_path / "tiny_demo_exp.py"
    exp_file.write_text(f"""
from tscd_tpu.exp.yolox_base import Exp as B
class Exp(B):
    def __init__(self):
        super().__init__()
        self.depth, self.width = 0.33, 0.125
        self.num_classes = 2
        self.test_size = (96, 128)
        self.output_dir = {str(tmp_path / "out")!r}
        self.exp_name = "tiny_demo"
""")
    # tiny checkpoint from a fresh init
    sys.path.insert(0, REPO)
    from tscd_tpu.exp import get_exp
    from tscd_tpu.train.checkpoint import save_checkpoint

    exp = get_exp(str(exp_file))
    m = exp.get_model()
    variables = m.init(jax.random.PRNGKey(0),
                       jnp.zeros((1, 96, 128, 3), jnp.float32),
                       False, False)
    ckpt = save_checkpoint(
        {"params": variables["params"],
         "batch_stats": variables["batch_stats"]}, str(tmp_path))

    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "demo.py"), "image",
         "-f", str(exp_file), "-c", ckpt, "--path", img_path,
         "--save_result"] + extra,
        capture_output=True, text=True, timeout=400, env=env,
        cwd=REPO)
    assert r.returncode == 0, f"demo failed:\n{r.stderr[-2000:]}"
    vis_dir = os.path.join(exp.output_dir, "tiny_demo", "vis_res")
    outs = [os.path.join(dp, f) for dp, _, fs in os.walk(vis_dir)
            for f in fs]
    assert outs, "no visualization written"


@pytest.mark.slow
def test_tscd_demo_cli_int8(tmp_path):
    """tools/tscd_demo.py as a subprocess on a synthetic image folder
    with a tiny TSCD exp + init checkpoint, in --int8 mode."""
    import cv2
    import jax
    import jax.numpy as jnp

    frames_dir = tmp_path / "frames"
    frames_dir.mkdir()
    for i in range(4):
        img = np.full((96, 128, 3), 90, np.uint8)
        cv2.rectangle(img, (20 + 2 * i, 15), (70 + 2 * i, 55),
                      (255, 255, 255), -1)
        cv2.imwrite(str(frames_dir / f"{i:06d}.jpg"), img)

    exp_file = tmp_path / "tiny_tscd_demo_exp.py"
    exp_file.write_text("""
from tscd_tpu.exp.tscd_base import Exp as B
class Exp(B):
    def __init__(self):
        super().__init__()
        self.depth, self.width = 0.33, 0.125
        self.num_classes = 30
        self.minimal_limit = 8
        self.heads = 2
        self.lframe_val, self.gframe_val = 1, 3
        self.test_size = (96, 128)
        self.exp_name = "tiny_tscd_demo"
""")
    sys.path.insert(0, REPO)
    from tscd_tpu.exp import get_exp
    from tscd_tpu.ops.position import get_timing_signal_1d
    from tscd_tpu.train.checkpoint import save_checkpoint

    exp = get_exp(str(exp_file))
    m = exp.get_model()
    te = jnp.asarray(get_timing_signal_1d(np.arange(4), 256),
                     jnp.float32)
    variables = m.init(jax.random.PRNGKey(0),
                       jnp.zeros((4, 96, 128, 3), jnp.float32), te, 1, 3)
    ckpt = save_checkpoint(
        {"params": variables["params"],
         "batch_stats": variables["batch_stats"]}, str(tmp_path))

    env = dict(os.environ, JAX_PLATFORMS="cpu")
    out_dir = str(tmp_path / "demo_out")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "tscd_demo.py"),
         "-f", str(exp_file), "-c", ckpt, "--path", str(frames_dir),
         "--output_dir", out_dir, "--int8"],
        capture_output=True, text=True, timeout=480, env=env, cwd=REPO)
    assert r.returncode == 0, f"tscd_demo failed:\n{r.stderr[-2000:]}"
    outs = [os.path.join(dp, f) for dp, _, fs in os.walk(out_dir)
            for f in fs]
    assert outs, "no demo output written"

    # static-calibrated serving: --int8-calib K calibrates on the
    # stream's own first K windows (quantize_int8_scan) and serves with
    # static scales
    out_dir2 = str(tmp_path / "demo_out_static")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "tscd_demo.py"),
         "-f", str(exp_file), "-c", ckpt, "--path", str(frames_dir),
         "--output_dir", out_dir2, "--int8", "--int8-calib", "1"],
        capture_output=True, text=True, timeout=480, env=env, cwd=REPO)
    assert r.returncode == 0, (
        f"tscd_demo --int8-calib failed:\n{r.stderr[-2000:]}")
    assert "calibrated static scales on 1 windows" in r.stdout
    outs2 = [os.path.join(dp, f) for dp, _, fs in os.walk(out_dir2)
             for f in fs]
    assert outs2, "no static-int8 demo output written"


@pytest.mark.slow
@pytest.mark.parametrize("batch", [1, 2])
def test_yolov_demo_online_cli(tmp_path, batch):
    """tools/yolov_demo_online.py as a subprocess, per-frame and in
    --online-batch mode (K frames per dispatch, YOLOVOnline.window +
    FrameBatcher), on a 5-frame synthetic clip — 5 % 2 != 0 also
    exercises the partial-tail replay path."""
    import cv2
    import jax
    import jax.numpy as jnp

    frames_dir = tmp_path / "frames"
    frames_dir.mkdir()
    for f in range(5):
        img = np.full((96, 128, 3), 80, np.uint8)
        cv2.rectangle(img, (20 + 4 * f, 20), (70 + 4 * f, 60),
                      (255, 255, 255), -1)
        cv2.imwrite(str(frames_dir / f"{f:03d}.jpg"), img)

    exp_file = tmp_path / "tiny_online_exp.py"
    exp_file.write_text(f"""
from tscd_tpu.exp.yolov_base import Exp as B
class Exp(B):
    def __init__(self):
        super().__init__()
        self.depth, self.width = 0.33, 0.125
        self.num_classes = 2
        self.minimal_limit = 8
        self.heads = 2
        self.test_size = (96, 128)
        self.output_dir = {str(tmp_path / "out")!r}
        self.exp_name = "tiny_online"
""")
    sys.path.insert(0, REPO)
    from tscd_tpu.exp import get_exp
    from tscd_tpu.models.yolov import YOLOVOnline
    from tscd_tpu.models.yolov_heads import init_online_bank
    from tscd_tpu.train.checkpoint import save_checkpoint

    exp = get_exp(str(exp_file))
    model = YOLOVOnline(num_classes=2, depth=0.33, width=0.125,
                        num_proposals=8, heads=2)
    bank0 = init_online_bank(4 * 8, int(256 * 0.125))
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 96, 128, 3), jnp.float32),
                           bank0)
    ckpt = save_checkpoint(
        {"params": variables["params"],
         "batch_stats": variables["batch_stats"]}, str(tmp_path))

    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable,
         os.path.join(REPO, "tools", "yolov_demo_online.py"),
         "-f", str(exp_file), "-c", ckpt, "--path", str(frames_dir),
         "--bank_frames", "4", "--online-batch", str(batch),
         "--output_dir", str(tmp_path / "demo_out")],
        capture_output=True, text=True, timeout=520, env=env, cwd=REPO)
    assert r.returncode == 0, f"online demo failed:\n{r.stderr[-2000:]}"
    assert "5 frames" in r.stdout, r.stdout
    assert os.path.exists(tmp_path / "demo_out" / "online_out.mp4")
