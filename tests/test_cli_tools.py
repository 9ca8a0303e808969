"""CLI smokes for the user-facing tools no other suite runs as a real
process: the weight converters (the entry gate for every reference user
migrating — tools/convert_weights.py, convert_swin_weights.py),
imdb_to_coco, ovis_data_division, vid_demo (both window modes) /
vid_demo_wpost, vid_train, and tscd_cam.

The converter tests pin the CLI output against the in-process
translation (leaf-exact) and against the flax model's own param layout
(key-set + shape equality), so a converter that silently drops or
misnames a tensor fails here rather than at real-checkpoint time.
"""

import json
import os
import pickle
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

REF = "/root/reference"


def _run(cmd, timeout=480, env_extra=None, check=True):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    if env_extra:
        env.update(env_extra)
    r = subprocess.run([sys.executable] + cmd, capture_output=True,
                       text=True, timeout=timeout, env=env, cwd=REPO)
    if check:
        assert r.returncode == 0, (
            f"{cmd[0]} failed:\n{r.stdout[-1000:]}\n{r.stderr[-2000:]}")
    return r


# ------------------------------------------------------------ converters


@pytest.mark.slow
@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")
def test_convert_weights_cli(tmp_path):
    """Reference YOLOX .pth -> CLI -> msgpack: leaf-exact vs the
    in-process torch_to_flax translation, then loads into the exp model
    and runs a finite jitted forward."""
    torch = pytest.importorskip("torch")
    import refpkg

    pafpn_mod = refpkg.load("yolox.models.yolo_pafpn")
    head_mod = refpkg.load("yolox.models.yolo_head")
    yolox_mod = refpkg.load("yolox.models.yolox")

    tm = yolox_mod.YOLOX(
        backbone=pafpn_mod.YOLOPAFPN(depth=0.33, width=0.125),
        head=head_mod.YOLOXHead(num_classes=2, width=0.125))
    sd = tm.state_dict()
    pth = str(tmp_path / "tiny_yolox.pth")
    torch.save({"model": sd, "start_epoch": 3}, pth)

    out = str(tmp_path / "tiny_yolox.msgpack")
    r = _run([os.path.join(REPO, "tools", "convert_weights.py"), pth, out])
    assert "converted" in r.stdout and os.path.exists(out)

    from flax import traverse_util

    from tscd_tpu.train.checkpoint import load_checkpoint
    from tscd_tpu.utils.convert import torch_to_flax

    restored = load_checkpoint(out)
    expected = torch_to_flax(
        {k: v.detach().cpu().numpy() for k, v in sd.items()})
    for col in ("params", "batch_stats"):
        got = traverse_util.flatten_dict(restored[col])
        want = traverse_util.flatten_dict(expected[col])
        assert set(got) == set(want), (
            f"{col} keys diverge: only-cli={set(got) - set(want)} "
            f"only-lib={set(want) - set(got)}")
        for k in want:
            assert np.array_equal(np.asarray(got[k]), np.asarray(want[k])), k

    # the converted tree drives the flax model
    import jax
    import jax.numpy as jnp

    exp_file = tmp_path / "tiny_conv_exp.py"
    exp_file.write_text("""
from tscd_tpu.exp.yolox_base import Exp as B
class Exp(B):
    def __init__(self):
        super().__init__()
        self.depth, self.width = 0.33, 0.125
        self.num_classes = 2
        self.test_size = (96, 128)
""")
    from tscd_tpu.exp import get_exp

    model = get_exp(str(exp_file)).get_model()
    init = model.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, 96, 128, 3), jnp.float32), False, False)
    fi = traverse_util.flatten_dict(init["params"])
    fc = traverse_util.flatten_dict(restored["params"])
    assert set(fi) == set(fc)
    for k in fi:
        assert fi[k].shape == np.asarray(fc[k]).shape, k
    out_arr = jax.jit(lambda v, x: model.apply(v, x, False, False))(
        {"params": restored["params"],
         "batch_stats": restored["batch_stats"]},
        jnp.zeros((1, 96, 128, 3), jnp.float32))
    assert all(np.isfinite(np.asarray(a, np.float32)).all()
               for a in jax.tree_util.tree_leaves(out_arr))


@pytest.mark.slow
@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")
def test_convert_swin_weights_cli(tmp_path):
    """Reference Swin .pth -> CLI -> msgpack whose param tree matches
    our SwinTransformer's init layout EXACTLY (key set + shapes). This
    is the test that catches dropped tensors — e.g. the per-out-index
    feature norms (reference swin_transfomer.py:557-560) that map to
    our out_norm{i}."""
    torch = pytest.importorskip("torch")
    import refpkg

    swin_mod = refpkg.load("yolox.models.swin_transfomer")
    tm = swin_mod.SwinTransformer(
        pretrain_img_size=64, embed_dim=8, depths=(1, 1, 1, 1),
        num_heads=(1, 1, 1, 1), window_size=2, out_indices=(1, 2, 3),
        ape=False)
    pth = str(tmp_path / "tiny_swin.pth")
    torch.save({"model": tm.state_dict()}, pth)

    out = str(tmp_path / "tiny_swin.msgpack")
    _run([os.path.join(REPO, "tools", "convert_swin_weights.py"), pth, out])

    import jax
    import jax.numpy as jnp
    from flax import traverse_util

    from tscd_tpu.models.swin import SwinTransformer
    from tscd_tpu.train.checkpoint import load_checkpoint

    model = SwinTransformer(8, (1, 1, 1, 1), (1, 1, 1, 1), window_size=2)
    init = model.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, 64, 64, 3), jnp.float32), False)
    fi = traverse_util.flatten_dict(init["params"])
    fc = traverse_util.flatten_dict(load_checkpoint(out)["params"])
    assert set(fi) == set(fc), (
        f"converted swin tree diverges: only-model={set(fi) - set(fc)} "
        f"only-ckpt={set(fc) - set(fi)}")
    for k in fi:
        assert fi[k].shape == np.asarray(fc[k]).shape, k
    feats = jax.jit(lambda v, x: model.apply(v, x, False))(
        {"params": traverse_util.unflatten_dict(fc)},
        jnp.zeros((1, 64, 64, 3), jnp.float32))
    for v in feats.values():
        assert np.isfinite(np.asarray(v, np.float32)).all()


# --------------------------------------------------------- offline tools


def test_imdb_to_coco_cli(tmp_path):
    imdb = {
        "vidA": {
            "000000.JPEG": [
                {"bbox": [10.0, 20.0, 30.0, 40.0],
                 "scores": np.asarray([0.1, 0.8, 0.05], np.float32)},
            ],
            "000001.JPEG": [],
        },
        "vidB": {
            "000000.JPEG": [
                {"bbox": [5.0, 5.0, 10.0, 10.0],
                 "scores": np.asarray([0.6, 0.2, 0.1], np.float32)},
                {"bbox": [1.0, 2.0, 3.0, 4.0],
                 "scores": np.asarray([0.0, 0.0, 0.9], np.float32)},
            ],
        },
    }
    src = str(tmp_path / "in.pkl")
    with open(src, "wb") as f:
        pickle.dump(imdb, f)
    id_map = {"vidA/000000.JPEG": 7}
    map_path = str(tmp_path / "ids.json")
    with open(map_path, "w") as f:
        json.dump(id_map, f)

    dst = str(tmp_path / "out.json")
    r = _run([os.path.join(REPO, "tools", "imdb_to_coco.py"), src, dst,
              "--image_id_map", map_path], timeout=120)
    assert "3 predictions" in r.stdout
    out = json.load(open(dst))
    assert len(out) == 3
    by_id = {o["image_id"] for o in out}
    assert 7 in by_id and "vidB/000000.JPEG" in by_id
    top = next(o for o in out if o["image_id"] == 7)
    assert top["category_id"] == 2 and abs(top["score"] - 0.8) < 1e-6
    assert top["bbox"] == [10.0, 20.0, 30.0, 40.0]


def test_ovis_data_division_cli(tmp_path):
    vis = {
        "videos": [
            {"id": i + 1, "width": 64, "height": 48,
             "file_names": [f"v{i}/img_{k}.jpg" for k in range(3)]}
            for i in range(4)
        ],
        "annotations": [
            {"id": 1, "video_id": 1, "category_id": 2,
             "bboxes": [[1, 2, 10, 10], None, [3, 4, 8, 8]],
             "areas": [100, None, 64]},
            {"id": 2, "video_id": 3, "category_id": 1,
             "bboxes": [None, [5, 5, 6, 6], None],
             "areas": [None, 36, None]},
        ],
        "categories": [{"id": 1, "name": "a"}, {"id": 2, "name": "b"}],
    }
    src = str(tmp_path / "vis.json")
    with open(src, "w") as f:
        json.dump(vis, f)
    out_dir = str(tmp_path / "ovis_out")
    r = _run([os.path.join(REPO, "tools", "ovis_data_division.py"),
              "--src", src, "--out_dir", out_dir, "--valid_ratio", "0.25",
              "--seed", "0"], timeout=120)
    assert "annotations_train.json" in r.stdout
    train = json.load(open(os.path.join(out_dir, "annotations_train.json")))
    valid = json.load(open(os.path.join(out_dir, "annotations_valid.json")))
    assert len(train["videos"]) == 3 and len(valid["videos"]) == 1
    assert len(train["images"]) == 9 and len(valid["images"]) == 3
    # per-frame expansion: only non-None bboxes become annotations, and
    # every annotation's image carries matching sid/fid bookkeeping
    all_out = train["annotations"] + valid["annotations"]
    assert len(all_out) == 3
    for coco in (train, valid):
        imgs = {im["id"]: im for im in coco["images"]}
        for ann in coco["annotations"]:
            assert ann["image_id"] in imgs
            assert ann["area"] > 0 and len(ann["bbox"]) == 4


# ---------------------------------------------------------------- demos


def _write_frames(tmp_path, n=6, size=(96, 128)):
    import cv2

    frames_dir = tmp_path / "frames"
    frames_dir.mkdir()
    for i in range(n):
        img = np.full(size + (3,), 90, np.uint8)
        cv2.rectangle(img, (20 + 2 * i, 15), (70 + 2 * i, 55),
                      (255, 255, 255), -1)
        cv2.imwrite(str(frames_dir / f"{i:06d}.jpg"), img)
    return frames_dir


def _yolov_exp_file(tmp_path, name, lframe, gframe, **knobs):
    lines = "\n".join(f"        self.{k} = {v!r}"
                      for k, v in knobs.items())
    exp_file = tmp_path / f"{name}.py"
    exp_file.write_text(f"""
from tscd_tpu.exp.yolov_base import Exp as B
class Exp(B):
    def __init__(self):
        super().__init__()
        self.depth, self.width = 0.33, 0.125
        self.num_classes = 30
        self.minimal_limit = 8
        self.defualt_p = 8
        self.heads = 2
        self.lframe, self.gframe = {lframe}, {gframe}
        self.lframe_val, self.gframe_val = {lframe}, {gframe}
        self.input_size = self.test_size = (96, 128)
        self.exp_name = {name!r}
{lines}
""")
    return exp_file


def _yolov_ckpt(exp_file, tmp_path):
    import jax
    import jax.numpy as jnp

    from tscd_tpu.exp import get_exp
    from tscd_tpu.ops.position import get_timing_signal_1d
    from tscd_tpu.train.checkpoint import save_checkpoint

    exp = get_exp(str(exp_file))
    F = exp.lframe_val + exp.gframe_val
    h, w = exp.test_size
    trainer = exp.get_trainer(None)
    te = jnp.asarray(get_timing_signal_1d(np.arange(F), 256), jnp.float32)
    variables = trainer._init_variables(
        jnp.zeros((F, h, w, 3), jnp.float32), te,
        exp.lframe_val, exp.gframe_val)
    return save_checkpoint(
        {"params": variables["params"],
         "batch_stats": variables["batch_stats"]}, str(tmp_path))


@pytest.mark.slow
def test_vid_demo_cli_gmode(tmp_path):
    """vid_demo on a pure-gframe (lframe=0) YOLOV exp: the reference's
    consecutive-chunk mode (tools/vid_demo.py:199-210) — every frame
    must receive predictions (the L>0 loop alone would drop them all)."""
    frames_dir = _write_frames(tmp_path, n=6)
    exp_file = _yolov_exp_file(tmp_path, "tiny_vid_gmode", 0, 4)
    ckpt = _yolov_ckpt(exp_file, tmp_path)

    out_dir = str(tmp_path / "demo_out")
    r = _run([os.path.join(REPO, "tools", "vid_demo.py"),
              "-f", str(exp_file), "-c", ckpt, "--path", str(frames_dir),
              "--output_dir", out_dir])
    assert "frames with predictions: 6/6" in r.stdout, r.stdout[-800:]
    assert os.path.exists(os.path.join(out_dir, "tscd_out.mp4"))


@pytest.mark.slow
def test_vid_demo_int8_static_cli(tmp_path):
    """vid_demo --int8 --int8-calib on a YOLOV++ exp (local+global
    windows): static scales calibrated on the stream's own first window
    via the chunked-scan path, then served — the YOLOV-family analog of
    tscd_demo --int8-calib (covers the te-taking YOLOVPlus apply
    signature and the L>0 calibration-window builder)."""
    frames_dir = _write_frames(tmp_path, n=6)
    exp_file = _yolov_exp_file(tmp_path, "tiny_vid_int8s", 2, 2,
                               model_family="yolov_plus")
    ckpt = _yolov_ckpt(exp_file, tmp_path)

    out_dir = str(tmp_path / "demo_out")
    r = _run([os.path.join(REPO, "tools", "vid_demo.py"),
              "-f", str(exp_file), "-c", ckpt, "--path", str(frames_dir),
              "--output_dir", out_dir, "--int8-calib", "1"])
    assert "calibrated static scales on 1 windows" in r.stdout, \
        r.stdout[-800:]
    assert "frames with predictions: 6/6" in r.stdout, r.stdout[-800:]
    assert os.path.exists(os.path.join(out_dir, "tscd_out.mp4"))


@pytest.mark.slow
def test_vid_demo_wpost_cli(tmp_path):
    """vid_demo_wpost alias: local-frame windows + REPP post on by
    default (reference tools/vid_demo_wpost.py)."""
    frames_dir = _write_frames(tmp_path, n=6)
    exp_file = _yolov_exp_file(tmp_path, "tiny_vid_wpost", 2, 2)
    ckpt = _yolov_ckpt(exp_file, tmp_path)

    out_dir = str(tmp_path / "demo_out")
    r = _run([os.path.join(REPO, "tools", "vid_demo_wpost.py"),
              "-f", str(exp_file), "-c", ckpt, "--path", str(frames_dir),
              "--output_dir", out_dir])
    assert "frames with predictions: 6/6" in r.stdout, r.stdout[-800:]
    assert os.path.exists(os.path.join(out_dir, "tscd_out.mp4"))


@pytest.mark.slow
def test_vid_train_cli(tmp_path):
    """tools/vid_train.py one tiny epoch via the YOLOV trainer; writes
    the rolling checkpoint (reference vid_train = tscd_train with the
    YOLOV exp family)."""
    from tests.test_e2e_train import _make_vid_dataset

    root = _make_vid_dataset(str(tmp_path / "vid"), n_videos=1,
                             n_frames=4, size=(96, 128))
    out_dir = tmp_path / "out"
    exp_file = _yolov_exp_file(
        tmp_path, "tiny_vid_train", 0, 4,
        max_epoch=1, eval_interval=10, hsv_prob=0.0, flip_prob=0.0,
        data_dir=str(root),
        train_seq_path=os.path.join(str(root), "train_seq.npy"),
        val_seq_path=os.path.join(str(root), "val_seq.npy"),
        output_dir=str(out_dir), fix_bn=False, seed=0)
    _run([os.path.join(REPO, "tools", "vid_train.py"),
          "-f", str(exp_file)])
    assert os.path.exists(os.path.join(
        str(out_dir), "tiny_vid_train", "latest_ckpt.msgpack"))


@pytest.mark.slow
def test_vid_eval_cli(tmp_path):
    """tools/vid_eval.py subprocess (YOLOV family eval — reference
    tools/vid_eval.py): --tnum mini-eval with --output json, then the
    --int8 serving mode on the same checkpoint."""
    import json

    from tests.test_e2e_train import _make_vid_dataset

    root = _make_vid_dataset(str(tmp_path / "vid"), n_videos=2,
                             n_frames=8, size=(96, 128))
    exp_file = _yolov_exp_file(
        tmp_path, "tiny_vid_eval", 0, 4,
        data_dir=str(root),
        train_seq_path=os.path.join(str(root), "train_seq.npy"),
        val_seq_path=os.path.join(str(root), "val_seq.npy"),
        output_dir=str(tmp_path / "out"))
    ckpt = _yolov_ckpt(exp_file, tmp_path)

    for tag, extra in (("fp", []), ("int8", ["--int8"]),
                       ("int8s", ["--int8-calib", "2"])):
        out_json = str(tmp_path / f"vid_eval_{tag}.json")
        r = _run([os.path.join(REPO, "tools", "vid_eval.py"),
                  "-f", str(exp_file), "-c", ckpt, "--tnum", "2",
                  "--output", out_json] + extra)
        res = json.load(open(out_json))
        assert "mAP" in res and np.isfinite(res["mAP"]), (tag, res)
        if tag == "int8s":  # static scales calibrated via the scan path
            assert "calibrated static scales" in r.stdout, r.stdout[-800:]


@pytest.mark.slow
def test_tscd_cam_cli(tmp_path):
    """tools/tscd_cam.py: backbone CAM heatmaps for all three FPN
    levels on a synthetic image (reference tools/tscd_cam.py:13)."""
    import cv2

    img = np.full((96, 128, 3), 90, np.uint8)
    cv2.rectangle(img, (30, 20), (90, 70), (255, 255, 255), -1)
    img_path = str(tmp_path / "cam_in.jpg")
    cv2.imwrite(img_path, img)

    exp_file = tmp_path / "tiny_cam_exp.py"
    exp_file.write_text("""
from tscd_tpu.exp.yolox_base import Exp as B
class Exp(B):
    def __init__(self):
        super().__init__()
        self.depth, self.width = 0.33, 0.125
        self.num_classes = 2
        self.test_size = (96, 128)
""")
    out_dir = str(tmp_path / "cam_out")
    _run([os.path.join(REPO, "tools", "tscd_cam.py"),
          "-f", str(exp_file), "--path", img_path,
          "--output_dir", out_dir], timeout=240)
    for lvl in ("p3", "p4", "p5"):
        assert os.path.exists(
            os.path.join(out_dir, f"cam_{lvl}_cam_in.jpg")), lvl
