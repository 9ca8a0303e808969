"""Trainer-level multi-device product path (the TPU replacement for the
reference's in-trainer DDP, yolox/core/launch.py:39 +
yolox/core/tscd_trainer.py:231): the SAME TSCDTrainer that runs
single-device reads the `mesh_data`/`mesh_model`/`fsdp` exp knobs,
builds a jax.sharding.Mesh, batches windows, and trains on it.

Equality oracle: DP over 2 mesh shards == single-device window_batch=2
(identical math, identical data order) — final params and step count
must match. FSDP and DP x TP must produce the same trained params too
(state layout changes, semantics must not)."""

import os
import random
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tests.test_e2e_train import _make_vid_dataset  # noqa: E402


def _write_exp(tmp_path, root, name, **knobs):
    lines = "\n".join(f"        self.{k} = {v!r}" for k, v in knobs.items())
    exp_file = tmp_path / f"{name}.py"
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
        self.output_dir = {str(tmp_path / "out")!r}
        self.exp_name = {name!r}
        self.fix_bn = False
        self.seed = 0
{lines}
""")
    return str(exp_file)


def _run_trainer(exp_file):
    from tscd_tpu.exp import get_exp
    random.seed(0)
    np.random.seed(0)
    exp = get_exp(exp_file)
    trainer = exp.get_trainer(None)
    state = trainer.train()
    return trainer, state


def _host_params(state):
    import jax
    return jax.tree_util.tree_map(np.asarray, jax.device_get(state.params))


def _assert_tree_close(a, b, rtol=2e-5, atol=1e-6):
    import jax
    la, ta = jax.tree_util.tree_flatten(a)
    lb, tb = jax.tree_util.tree_flatten(b)
    assert ta == tb
    for x, y in zip(la, lb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=rtol, atol=atol)


@pytest.mark.slow
def test_trainer_dp_mesh_matches_single_device(tmp_path):
    """mesh_data=2 through TSCDTrainer == single-device window_batch=2."""
    root = _make_vid_dataset(str(tmp_path / "vid"), n_videos=1,
                             n_frames=4)
    base_f = _write_exp(tmp_path, root, "base_wb2", window_batch=2)
    dp_f = _write_exp(tmp_path, root, "dp2", mesh_data=2)

    t_base, s_base = _run_trainer(base_f)
    t_dp, s_dp = _run_trainer(dp_f)
    assert t_base.mesh is None and t_base.window_batch == 2
    assert t_dp.mesh is not None and t_dp.mesh.shape["data"] == 2
    assert int(s_base.step) == int(s_dp.step) >= 1
    _assert_tree_close(_host_params(s_base), _host_params(s_dp))
    _assert_tree_close(
        {"ema": s_base.ema_params}, {"ema": s_dp.ema_params})


@pytest.mark.slow
def test_trainer_fsdp_and_tp_match_dp(tmp_path):
    """fsdp=True and mesh_model=2 change the state LAYOUT only: trained
    params equal the plain window_batch baseline; the state actually
    lands sharded."""
    import jax
    from jax.sharding import PartitionSpec as PS

    root = _make_vid_dataset(str(tmp_path / "vid"), n_videos=1,
                             n_frames=4)
    base_f = _write_exp(tmp_path, root, "base_wb2b", window_batch=2)
    fsdp_f = _write_exp(tmp_path, root, "fsdp2", mesh_data=2, fsdp=True)
    tp_f = _write_exp(tmp_path, root, "dp2tp2", mesh_data=2,
                      mesh_model=2)

    _, s_base = _run_trainer(base_f)
    base_params = _host_params(s_base)

    t_fsdp, s_fsdp = _run_trainer(fsdp_f)
    assert any(
        getattr(p, "sharding", None) is not None and p.sharding.spec != PS()
        for p in jax.tree_util.tree_leaves(s_fsdp.params)), (
        "FSDP trainer produced no sharded param leaf")
    _assert_tree_close(base_params, _host_params(s_fsdp))

    t_tp, s_tp = _run_trainer(tp_f)
    assert t_tp.mesh.shape["model"] == 2

    def _on_model_axis(spec):
        return any(e == "model" or (isinstance(e, tuple) and "model" in e)
                   for e in spec)

    assert any(
        getattr(p, "sharding", None) is not None
        and _on_model_axis(p.sharding.spec)
        for p in jax.tree_util.tree_leaves(s_tp.params)), (
        "TP trainer produced no model-sharded param leaf")
    _assert_tree_close(base_params, _host_params(s_tp))


@pytest.mark.slow
def test_trainer_grad_accum_matches_batched(tmp_path):
    """grad_accum=2 (lax.scan over window chunks inside one step) must
    reproduce the plain window_batch=2 step exactly: equal chunk sizes
    make mean-of-chunk-means the batch mean for grads, losses and BN
    stats alike. Peak activation memory is the feature; the math must
    not move."""
    root = _make_vid_dataset(str(tmp_path / "vid"), n_videos=1,
                             n_frames=4)
    base_f = _write_exp(tmp_path, root, "base_wb2c", window_batch=2)
    ga_f = _write_exp(tmp_path, root, "ga2", window_batch=2,
                      grad_accum=2)

    _, s_base = _run_trainer(base_f)
    t_ga, s_ga = _run_trainer(ga_f)
    assert t_ga.mesh is None and t_ga.window_batch == 2
    assert int(s_base.step) == int(s_ga.step) >= 1
    _assert_tree_close(_host_params(s_base), _host_params(s_ga),
                       rtol=5e-5, atol=2e-6)
    _assert_tree_close({"bs": s_base.batch_stats},
                       {"bs": s_ga.batch_stats}, rtol=5e-5, atol=2e-6)
    _assert_tree_close({"ema": s_base.ema_params},
                       {"ema": s_ga.ema_params}, rtol=5e-5, atol=2e-6)


@pytest.mark.slow
def test_trainer_fsdp_checkpoint_resume(tmp_path):
    """The FSDP trainer's sharded TrainState must round-trip through
    the msgpack checkpoint: save gathers shards to host arrays, resume
    re-places them onto the mesh. Pins the r4 product-path interaction
    (parallel/trainer_mesh.py x train/checkpoint.py)."""
    import argparse

    import jax

    root = _make_vid_dataset(str(tmp_path / "vid"), n_videos=1,
                             n_frames=4)
    exp_f = _write_exp(tmp_path, root, "fsdp_resume", mesh_data=2,
                       fsdp=True)

    from tscd_tpu.exp import get_exp
    random.seed(0)
    np.random.seed(0)
    exp = get_exp(exp_f)
    t1 = exp.get_trainer(None)
    s1 = t1.train()
    ckpt = os.path.join(t1.file_name, "latest_ckpt.msgpack")
    assert os.path.exists(ckpt)
    params1 = _host_params(s1)

    exp2 = get_exp(exp_f)
    exp2.max_epoch = 2
    args = argparse.Namespace(resume=True, ckpt=None)
    t2 = exp2.get_trainer(args)
    s2 = t2.train()
    assert t2.start_epoch == 1, "resume did not pick up start_epoch"
    assert int(s2.step) == 2 * int(s1.step) >= 2
    from jax.sharding import PartitionSpec as PS
    assert any(
        getattr(p, "sharding", None) is not None and p.sharding.spec != PS()
        for p in jax.tree_util.tree_leaves(s2.params)), (
        "resumed FSDP state is not sharded")
    for leaf in jax.tree_util.tree_leaves(_host_params(s2)):
        assert np.all(np.isfinite(leaf))
    # the resumed run must actually have CHANGED params vs the ckpt
    moved = any(
        not np.allclose(a, b)
        for a, b in zip(jax.tree_util.tree_leaves(params1),
                        jax.tree_util.tree_leaves(_host_params(s2))))
    assert moved, "resumed epoch made no update"


def _write_still_exp(tmp_path, root, name, **knobs):
    lines = "\n".join(f"        self.{k} = {v!r}" for k, v in knobs.items())
    exp_file = tmp_path / f"{name}.py"
    exp_file.write_text(f"""
from tscd_tpu.exp.yolox_base import Exp as B
class Exp(B):
    def __init__(self):
        super().__init__()
        self.depth, self.width = 0.33, 0.125
        self.num_classes = 2
        self.input_size = self.test_size = (96, 128)
        self.batch_size = 4
        self.max_epoch = 1
        self.no_aug_epochs = 0
        self.eval_interval = 10
        self.data_dir = {str(root)!r}
        self.train_name = self.val_name = "train2017"
        self.output_dir = {str(tmp_path / "out")!r}
        self.exp_name = {name!r}
        self.enable_mixup = False
        self.mosaic_prob = 0.0
        self.flip_prob = 0.0
        self.hsv_prob = 0.0
        self.seed = 0
{lines}
""")
    return str(exp_file)


@pytest.mark.slow
def test_still_trainer_dp_mesh_matches_single_device(tmp_path):
    """The still-image Trainer's mesh path: mesh_data=2 over the image
    batch == the single-device run (BN batch means become GLOBAL means
    under GSPMD — sync-BN by construction). Same math; the sharded
    reduction order shifts BN stats by ~1e-3 relative, so stats get a
    looser bound than params."""
    from tests.test_e2e_still import _make_coco

    root = _make_coco(str(tmp_path / "coco"))
    base_f = _write_still_exp(tmp_path, root, "still_base")
    dp_f = _write_still_exp(tmp_path, root, "still_dp2", mesh_data=2)

    t_base, s_base = _run_trainer(base_f)
    t_dp, s_dp = _run_trainer(dp_f)
    assert t_base.mesh is None and t_dp.mesh is not None
    assert t_dp.mesh.shape["data"] == 2
    assert int(s_base.step) == int(s_dp.step) >= 1
    _assert_tree_close(_host_params(s_base), _host_params(s_dp))
    _assert_tree_close({"bs": s_base.batch_stats},
                       {"bs": s_dp.batch_stats}, rtol=5e-3, atol=1e-4)


def _write_yolov_exp(tmp_path, root, name, **knobs):
    lines = "\n".join(f"        self.{k} = {v!r}" for k, v in knobs.items())
    exp_file = tmp_path / f"{name}.py"
    exp_file.write_text(f"""
import os
from tscd_tpu.exp.yolov_base import Exp as B
class Exp(B):
    def __init__(self):
        super().__init__()
        self.depth, self.width = 0.33, 0.125
        self.num_classes = 30
        self.minimal_limit = 8
        self.defualt_p = 8
        self.heads = 2
        self.lframe, self.gframe = 0, 4
        self.lframe_val, self.gframe_val = 0, 4
        self.input_size = self.test_size = (96, 128)
        self.max_epoch = 1
        self.eval_interval = 10
        self.hsv_prob = 0.0
        self.flip_prob = 0.0
        self.data_dir = {str(root)!r}
        self.train_seq_path = os.path.join({str(root)!r}, "train_seq.npy")
        self.val_seq_path = os.path.join({str(root)!r}, "val_seq.npy")
        self.output_dir = {str(tmp_path / "out")!r}
        self.exp_name = {name!r}
        self.fix_bn = False
        self.seed = 0
{lines}
""")
    return str(exp_file)


@pytest.mark.slow
def test_yolov_trainer_dp_mesh_matches_single_device(tmp_path):
    """YOLOVTrainer inherits the shared step machinery (window batching
    + trainer mesh + grad accumulation) via the _window_losses hook:
    mesh_data=2 == single-device window_batch=2, and the single-window
    path still trains (the family's first trainer-level e2e)."""
    root = _make_vid_dataset(str(tmp_path / "vid"), n_videos=2,
                             n_frames=8)
    base_f = _write_yolov_exp(tmp_path, root, "yv_base_wb2",
                              window_batch=2)
    dp_f = _write_yolov_exp(tmp_path, root, "yv_dp2", mesh_data=2)

    t_base, s_base = _run_trainer(base_f)
    t_dp, s_dp = _run_trainer(dp_f)
    assert t_base.mesh is None and t_base.window_batch == 2
    assert t_dp.mesh is not None and t_dp.mesh.shape["data"] == 2
    assert int(s_base.step) == int(s_dp.step) >= 1
    _assert_tree_close(_host_params(s_base), _host_params(s_dp))

    import jax

    single_f = _write_yolov_exp(tmp_path, root, "yv_single")
    t_s, s_s = _run_trainer(single_f)
    assert t_s.window_batch == 1 and int(s_s.step) >= 1
    for leaf in jax.tree_util.tree_leaves(_host_params(s_s)):
        assert np.all(np.isfinite(leaf))


def test_opt_state_checkpoint_roundtrip(tmp_path):
    """Momentum must survive save->msgpack->load->restore through the
    REAL stage-2 optimizer recipe (grouped SGD + freeze masks + clip),
    not just a toy chain (reference saves optimizer.state_dict(),
    yolox/core/trainer.py:355)."""
    import jax
    import jax.numpy as jnp
    import optax

    from tscd_tpu.train.checkpoint import (load_checkpoint,
                                           opt_state_to_ckpt,
                                           restore_opt_state,
                                           save_checkpoint)
    from tscd_tpu.train.optim import build_sgd

    params = {"backbone": {"conv": {"kernel": jnp.ones((3, 3, 4, 8))}},
              "head": {"dense": {"kernel": jnp.full((8, 4), 0.5),
                                 "bias": jnp.zeros((4,))}}}
    tx = build_sgd(lambda i: 0.1, momentum=0.9,
                   freeze_prefixes=("backbone",))
    opt_state = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    _, opt_state = tx.update(grads, opt_state, params)  # momentum != 0

    path = save_checkpoint({"opt_state": opt_state_to_ckpt(opt_state)},
                           str(tmp_path))
    restored = restore_opt_state(tx.init(params),
                                 load_checkpoint(path)["opt_state"])
    la = jax.tree_util.tree_leaves(opt_state)
    lb = jax.tree_util.tree_leaves(restored)
    assert len(la) == len(lb)
    nonzero = False
    for a, b in zip(la, lb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
        nonzero = nonzero or (np.asarray(a).size and
                              np.any(np.asarray(a) != 0))
    assert nonzero, "round-tripped state was all zeros (vacuous)"


def test_window_loader_batch_windows(tmp_path):
    """batch_windows stacks B windows on a leading axis and drops the
    last partial group (static shapes for the mesh step)."""
    from tscd_tpu.data.vid import VIDDataset, WindowLoader

    root = _make_vid_dataset(str(tmp_path / "vid"), n_videos=1,
                             n_frames=5)
    ds = VIDDataset(file_path=os.path.join(root, "train_seq.npy"),
                    img_size=(96, 128), lframe=1, gframe=3, val=False,
                    mode="random", dataset_pth=root, training=True)
    n = len(ds.res)
    assert n >= 3
    loader = WindowLoader(ds, shuffle=False, batch_windows=2,
                          train_time_index=True, cxcywh=True)
    assert len(loader) == n // 2
    batches = list(loader)
    assert len(batches) == n // 2
    b = batches[0]
    assert b["imgs"].shape[:2] == (2, 4)
    assert b["labels"].shape[0] == 2
    assert b["time_embedding"].shape == (2, 4, 256)
    assert len(b["paths"]) == 2 and len(b["paths"][0]) == 4


def test_window_loader_rejects_oversized_batch(tmp_path):
    """batch_windows > dataset windows must fail with a diagnosable
    error at construction, not an empty loader -> bare StopIteration in
    the trainer's first next()."""
    from tscd_tpu.data.vid import VIDDataset, WindowLoader

    root = _make_vid_dataset(str(tmp_path / "vid"), n_videos=1,
                             n_frames=5)
    ds = VIDDataset(file_path=os.path.join(root, "train_seq.npy"),
                    img_size=(96, 128), lframe=1, gframe=3, val=False,
                    mode="random", dataset_pth=root, training=True)
    with pytest.raises(ValueError, match="batch_windows"):
        WindowLoader(ds, batch_windows=len(ds.res) + 1)


def test_yolov_trainer_optimizer_gets_window_batch(tmp_path):
    """YOLOVTrainer must inherit TSCDTrainer._init_state so the
    global-window-batch LR scaling (reference lr-per-img x global batch,
    tscd_base.Exp.get_optimizer) reaches its optimizer — a local copy
    dropped the window_batch kwarg, silently training mesh/window-batched
    yolov runs at the 1-window LR."""
    from tscd_tpu.core.yolov_trainer import YOLOVTrainer

    assert "_init_state" not in YOLOVTrainer.__dict__, (
        "YOLOVTrainer must not fork _init_state (LR-scaling kwarg)")

    root = _make_vid_dataset(str(tmp_path / "vid"), n_videos=2,
                             n_frames=8)
    f = _write_yolov_exp(tmp_path, root, "yv_wb_opt", window_batch=2)
    from tscd_tpu.exp import get_exp
    exp = get_exp(f)
    seen = {}
    orig = exp.get_optimizer

    def spy(iters, **kw):
        seen.update(kw)
        return orig(iters, **kw)

    exp.get_optimizer = spy
    trainer = exp.get_trainer(None)
    assert isinstance(trainer, YOLOVTrainer)
    trainer.train_loader = exp.get_data_loader(
        batch_windows=trainer.window_batch)
    trainer._init_state(next(iter(trainer.train_loader)))
    assert seen.get("window_batch") == 2


def test_exp_nmsthre_reaches_eval_postprocess(monkeypatch):
    """exp.nmsthre / exp.test_conf must reach tscd_eval_postprocess
    through the trainer's eval fn (they were hard-coded 0.5/0.001 —
    the demo's --nms flag was silently ignored; reference TSCD.forward
    threads nms_thresh through)."""
    import jax.numpy as jnp

    import tscd_tpu.core.tscd_trainer as tt
    from tscd_tpu.exp.tscd_base import Exp
    from tscd_tpu.ops.position import get_timing_signal_1d

    exp = Exp()
    exp.depth, exp.width = 0.33, 0.125
    exp.num_classes = 30
    exp.minimal_limit = 8
    exp.heads = 2
    exp.lframe_val, exp.gframe_val = 1, 3
    exp.input_size = exp.test_size = (96, 128)
    exp.nmsthre = 0.123
    exp.test_conf = 0.002

    seen = {}
    real = tt.tscd_eval_postprocess

    def spy(out, lf, C, **kw):
        seen.update(kw)
        return real(out, lf, C, **kw)

    monkeypatch.setattr(tt, "tscd_eval_postprocess", spy)
    trainer = tt.TSCDTrainer(exp, None)
    x = jnp.zeros((4, 96, 128, 3), jnp.float32)
    te = jnp.asarray(get_timing_signal_1d(np.arange(4), 256),
                     jnp.float32)
    variables = trainer._init_variables(x, te, 1, 3)
    predict = trainer.make_predict_fn(variables, 1, 3)
    predict(np.zeros((4, 96, 128, 3), np.float32), np.asarray(te),
            False, None)
    assert seen.get("nms_thresh") == 0.123
    assert seen.get("conf_thre") == 0.002
