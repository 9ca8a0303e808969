"""CLI surface smoke (VERDICT r3 #7): tools/tscd_eval.py as a real
subprocess with --int8, and tools/tscd_demo.py with --post (REPP) +
traj_linking overlap chunking + tubelet rescoring (reference
tools/tscd_demo.py:286-299, post_process.py:321)."""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _tiny_ckpt(exp, tmp_path, f=4):
    import jax
    import jax.numpy as jnp

    from tscd_tpu.ops.position import get_timing_signal_1d
    from tscd_tpu.train.checkpoint import save_checkpoint

    m = exp.get_model()
    h, w = exp.test_size
    te = jnp.asarray(get_timing_signal_1d(np.arange(f), 256), jnp.float32)
    variables = m.init(jax.random.PRNGKey(0),
                       jnp.zeros((f, h, w, 3), jnp.float32), te,
                       exp.lframe_val, exp.gframe_val)
    return save_checkpoint(
        {"params": variables["params"],
         "batch_stats": variables["batch_stats"]}, str(tmp_path))


@pytest.mark.slow
def test_tscd_eval_cli_int8(tmp_path):
    """tscd_eval.py subprocess on a synthetic VID dataset in --int8
    serving mode with --tnum mini-eval and --output json dump."""
    from tests.test_e2e_train import _make_vid_dataset

    root = _make_vid_dataset(str(tmp_path / "vid"), n_videos=2,
                             n_frames=8, size=(96, 128))
    exp_file = tmp_path / "tiny_eval_exp.py"
    exp_file.write_text(f"""
import os
from tscd_tpu.exp.tscd_base import Exp as B
class Exp(B):
    def __init__(self):
        super().__init__()
        self.depth, self.width = 0.33, 0.125
        self.num_classes = 30
        self.minimal_limit = 8
        self.heads = 2
        self.lframe_val, self.gframe_val = 1, 3
        self.input_size = self.test_size = (96, 128)
        self.data_dir = {root!r}
        self.train_seq_path = os.path.join({root!r}, "train_seq.npy")
        self.val_seq_path = os.path.join({root!r}, "val_seq.npy")
        self.output_dir = {str(tmp_path / "out")!r}
        self.exp_name = "tiny_eval_cli"
""")
    from tscd_tpu.exp import get_exp

    exp = get_exp(str(exp_file))
    ckpt = _tiny_ckpt(exp, tmp_path)

    env = dict(os.environ, JAX_PLATFORMS="cpu")
    out_json = str(tmp_path / "eval.json")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "tscd_eval.py"),
         "-f", str(exp_file), "-c", ckpt, "--tnum", "2", "--int8",
         "--output", out_json],
        capture_output=True, text=True, timeout=480, env=env, cwd=REPO)
    assert r.returncode == 0, f"tscd_eval failed:\n{r.stderr[-2000:]}"
    assert os.path.exists(out_json)
    import json
    res = json.load(open(out_json))
    assert "mAP" in res and np.isfinite(res["mAP"])

    # static-calibrated serving mode: --int8-calib K folds activation
    # maxima over the first K val windows (quantize_int8_scan) and
    # serves with static scales — the measured serving default
    out_json2 = str(tmp_path / "eval_static.json")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "tscd_eval.py"),
         "-f", str(exp_file), "-c", ckpt, "--tnum", "2",
         "--int8", "--int8-calib", "2", "--output", out_json2],
        capture_output=True, text=True, timeout=480, env=env, cwd=REPO)
    assert r.returncode == 0, (
        f"tscd_eval --int8-calib failed:\n{r.stderr[-2000:]}")
    assert "calibrated static scales on 2 windows" in r.stdout
    res2 = json.load(open(out_json2))
    assert "mAP" in res2 and np.isfinite(res2["mAP"])


@pytest.mark.slow
def test_tscd_eval_cli_sp_sharded(tmp_path):
    """tscd_eval.py subprocess with --sp 2: the frame axis of each eval
    window shards over a 2-device mesh (parallel/sharded_eval.py) —
    the CLI surface of the SP option, on virtual CPU devices."""
    from tests.test_e2e_train import _make_vid_dataset

    root = _make_vid_dataset(str(tmp_path / "vid"), n_videos=2,
                             n_frames=8, size=(96, 128))
    exp_file = tmp_path / "tiny_sp_exp.py"
    exp_file.write_text(f"""
import os
from tscd_tpu.exp.tscd_base import Exp as B
class Exp(B):
    def __init__(self):
        super().__init__()
        self.depth, self.width = 0.33, 0.125
        self.num_classes = 30
        self.minimal_limit = 8
        self.heads = 2
        self.lframe_val, self.gframe_val = 1, 3
        self.input_size = self.test_size = (96, 128)
        self.data_dir = {root!r}
        self.train_seq_path = os.path.join({root!r}, "train_seq.npy")
        self.val_seq_path = os.path.join({root!r}, "val_seq.npy")
        self.output_dir = {str(tmp_path / "out")!r}
        self.exp_name = "tiny_sp_cli"
""")
    from tscd_tpu.exp import get_exp

    exp = get_exp(str(exp_file))
    ckpt = _tiny_ckpt(exp, tmp_path)

    env = dict(os.environ, JAX_PLATFORMS="cpu",
               XLA_FLAGS=(os.environ.get("XLA_FLAGS", "")
                          + " --xla_force_host_platform_device_count=2"
                          ).strip())
    out_json = str(tmp_path / "eval_sp.json")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "tscd_eval.py"),
         "-f", str(exp_file), "-c", ckpt, "--tnum", "2", "--sp", "2",
         "--output", out_json],
        capture_output=True, text=True, timeout=480, env=env, cwd=REPO)
    assert r.returncode == 0, f"tscd_eval --sp failed:\n{r.stderr[-2000:]}"
    import json
    res = json.load(open(out_json))
    assert "mAP" in res and np.isfinite(res["mAP"])


@pytest.mark.slow
def test_tscd_train_cli_mesh_flags(tmp_path):
    """tools/tscd_train.py subprocess with --mesh-data 2 --fsdp on two
    virtual CPU devices: the FLAG path (argparse -> exp knobs -> mesh
    inside the trainer) that test_trainer_mesh.py's direct-API tests
    bypass. Asserts the run completes and writes a checkpoint."""
    from tests.test_e2e_train import _make_vid_dataset

    root = _make_vid_dataset(str(tmp_path / "vid"), n_videos=1,
                             n_frames=4, size=(96, 128))
    out_dir = tmp_path / "out"
    exp_file = tmp_path / "tiny_meshcli_exp.py"
    exp_file.write_text(f"""
import os
from tscd_tpu.exp.tscd_base import Exp as B
class Exp(B):
    def __init__(self):
        super().__init__()
        self.depth, self.width = 0.33, 0.125
        self.num_classes = 30
        self.minimal_limit = 8
        self.heads = 2
        self.lframe, self.gframe = 1, 3
        self.lframe_val, self.gframe_val = 1, 3
        self.input_size = self.test_size = (96, 128)
        self.max_epoch = 1
        self.eval_interval = 10
        self.hsv_prob = 0.0
        self.flip_prob = 0.0
        self.data_dir = {str(root)!r}
        self.train_seq_path = os.path.join({str(root)!r}, "train_seq.npy")
        self.val_seq_path = os.path.join({str(root)!r}, "val_seq.npy")
        self.output_dir = {str(out_dir)!r}
        self.exp_name = "tiny_meshcli"
        self.fix_bn = False
        self.seed = 0
""")
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               XLA_FLAGS=(os.environ.get("XLA_FLAGS", "")
                          + " --xla_force_host_platform_device_count=2"
                          ).strip())
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "tscd_train.py"),
         "-f", str(exp_file), "--mesh-data", "2", "--fsdp"],
        capture_output=True, text=True, timeout=480, env=env, cwd=REPO)
    assert r.returncode == 0, f"tscd_train mesh failed:\n{r.stderr[-2000:]}"
    ckpt = os.path.join(str(out_dir), "tiny_meshcli",
                        "latest_ckpt.msgpack")
    assert os.path.exists(ckpt), "mesh training wrote no checkpoint"


@pytest.mark.slow
def test_tscd_demo_cli_post_and_traj_linking(tmp_path):
    """tscd_demo.py subprocess with traj_linking overlap chunking (exp
    knob via trailing opts) composed with --post REPP: both offline
    post passes run and the output video is written."""
    import cv2

    frames_dir = tmp_path / "frames"
    frames_dir.mkdir()
    for i in range(6):
        img = np.full((96, 128, 3), 90, np.uint8)
        cv2.rectangle(img, (20 + 2 * i, 15), (70 + 2 * i, 55),
                      (255, 255, 255), -1)
        cv2.imwrite(str(frames_dir / f"{i:06d}.jpg"), img)

    exp_file = tmp_path / "tiny_traj_exp.py"
    exp_file.write_text("""
from tscd_tpu.exp.tscd_base import Exp as B
class Exp(B):
    def __init__(self):
        super().__init__()
        self.depth, self.width = 0.33, 0.125
        self.num_classes = 30
        self.minimal_limit = 8
        self.heads = 2
        self.lframe_val, self.gframe_val = 2, 2
        self.test_size = (96, 128)
        self.exp_name = "tiny_traj_demo"
""")
    from tscd_tpu.exp import get_exp

    exp = get_exp(str(exp_file))
    ckpt = _tiny_ckpt(exp, tmp_path)

    env = dict(os.environ, JAX_PLATFORMS="cpu")
    out_dir = str(tmp_path / "demo_out")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "tscd_demo.py"),
         "-f", str(exp_file), "-c", ckpt, "--path", str(frames_dir),
         "--output_dir", out_dir, "--post", "traj_linking", "True"],
        capture_output=True, text=True, timeout=480, env=env, cwd=REPO)
    assert r.returncode == 0, f"tscd_demo failed:\n{r.stderr[-2000:]}"
    assert "traj_linking: tubelet-averaged rescoring applied" in r.stdout
    assert os.path.exists(os.path.join(out_dir, "tscd_out.mp4"))
