"""Still-image YOLOX trainer (reference: yolox/core/trainer.py:36).

Iteration-driven: infinite BatchLoader, jitted train step (forward +
SimOTA + losses + backward + SGD + EMA in ONE XLA program), mosaic off +
L1 on for the last no_aug epochs, per-epoch checkpoint + eval.

Multi-chip: the `mesh_data`/`mesh_model`/`fsdp` exp knobs (or the
tools/train.py flags) build a mesh and jit the SAME step with the image
batch sharded along `data` (parallel/trainer_mesh.py) — the TPU
replacement for the reference's launch()/DDP (yolox/core/launch.py:39).
BN batch means become global means under GSPMD, so sync-BN is by
construction (vs the reference's allreduce_norm.py:97 before eval only).
"""

import datetime
import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.postprocess import postprocess_dense_batch
from ..train.checkpoint import (load_checkpoint, load_tolerant,
                                save_checkpoint)
from ..train.step import (TrainState, init_train_state,
                          make_yolox_train_step)
from ..utils.metric import MeterBuffer, gpu_mem_usage_mb


class Trainer:
    def __init__(self, exp, args=None):
        self.exp = exp
        self.args = args
        # host-RNG seeding for the augmentation pipeline (reference
        # tools/train.py seeds random/torch when exp.seed is not None)
        from ..utils.seeding import seed_everything
        seed_everything(getattr(exp, "seed", None))
        self.file_name = os.path.join(exp.output_dir, exp.exp_name)
        os.makedirs(self.file_name, exist_ok=True)
        self.meter = MeterBuffer(window_size=exp.print_interval)
        self.best_ap = 0.0
        self.start_epoch = 0
        self.model = exp.get_model()
        self.state: Optional[TrainState] = None
        from ..parallel.trainer_mesh import mesh_from_exp
        self.mesh = mesh_from_exp(exp)
        if self.mesh is not None:
            nd = self.mesh.shape["data"]
            assert exp.batch_size % nd == 0, (
                f"batch_size({exp.batch_size}) must divide evenly over "
                f"mesh_data({nd})")

    def _init_state(self, sample):
        exp = self.exp
        x = jnp.asarray(sample["imgs"])
        variables = self.model.init(jax.random.PRNGKey(exp.seed or 0), x,
                                    False, False)
        ckpt_path = getattr(self.args, "ckpt", None) if self.args else None
        opt_ckpt = None
        if getattr(self.args, "resume", False) and self.args:
            path = ckpt_path or os.path.join(self.file_name,
                                             "latest_ckpt.msgpack")
            restored = load_checkpoint(path)
            self.start_epoch = int(restored.get("start_epoch", 0))
            variables = {
                "params": load_tolerant(variables["params"],
                                        restored["params"]),
                "batch_stats": load_tolerant(
                    variables.get("batch_stats", {}),
                    restored.get("batch_stats", {}))}
            # momentum survives a resume (reference trainer.py:291)
            opt_ckpt = restored.get("opt_state")
        elif ckpt_path:
            restored = load_checkpoint(ckpt_path)
            variables = {
                "params": load_tolerant(variables["params"],
                                        restored.get("params", restored)),
                "batch_stats": load_tolerant(
                    variables.get("batch_stats", {}),
                    restored.get("batch_stats", {}))}
        self.tx = exp.get_optimizer(self.iters_per_epoch)
        self.state = init_train_state(variables, self.tx)
        if opt_ckpt is not None:
            from ..train.checkpoint import restore_opt_state
            self.state = self.state._replace(
                opt_state=restore_opt_state(self.state.opt_state,
                                            opt_ckpt))
        if self.start_epoch:
            self.state = self.state._replace(step=jnp.asarray(
                self.start_epoch * self.iters_per_epoch, jnp.int32))

    def train(self):
        exp = self.exp
        loader = exp.get_data_loader()
        self.iters_per_epoch = loader.steps_per_epoch
        no_aug_loader = None
        it = iter(loader)
        sample = next(it)
        self._init_state(sample)
        from ..parallel.trainer_mesh import jit_trainer_step, place_state
        fsdp = bool(getattr(exp, "fsdp", False))
        accum = int(getattr(exp, "grad_accum", 1) or 1)
        if accum > 1:
            assert exp.batch_size % accum == 0, (
                f"grad_accum({accum}) must divide batch_size"
                f"({exp.batch_size})")
            if self.mesh is not None:
                assert (exp.batch_size // accum) % \
                    self.mesh.shape["data"] == 0, (
                        "each grad_accum chunk must still divide over "
                        "mesh_data")
        if self.mesh is not None:
            self.state = place_state(self.state, self.mesh, fsdp)
        step_aug = jit_trainer_step(
            make_yolox_train_step(self.model, self.tx, use_l1=False,
                                  ema_decay=exp.ema_decay,
                                  grad_accum=accum),
            self.state, self.mesh, fsdp=fsdp, num_data_args=2)
        step_l1 = jit_trainer_step(
            make_yolox_train_step(self.model, self.tx, use_l1=True,
                                  ema_decay=exp.ema_decay,
                                  grad_accum=accum),
            self.state, self.mesh, fsdp=fsdp, num_data_args=2)

        for epoch in range(self.start_epoch, exp.max_epoch):
            no_aug = epoch >= exp.max_epoch - exp.no_aug_epochs
            if no_aug and no_aug_loader is None:
                no_aug_loader = exp.get_data_loader(no_aug=True)
                it = iter(no_aug_loader)
                print("--> no mosaic aug, L1 loss on")
            step_fn = step_l1 if no_aug else step_aug
            t_epoch = time.time()
            data_t0 = time.time()
            for n in range(self.iters_per_epoch):
                batch = sample if (epoch == self.start_epoch and n == 0
                                   and not no_aug) else next(it)
                imgs_np, labels_np = batch["imgs"], batch["labels"]
                if getattr(exp, "enable_multiscale", False) and not no_aug:
                    import random as _random

                    from ..data.vid import multiscale_resize
                    if n % 10 == 0 or not hasattr(self, "_ms_size"):
                        from ..utils.rig import clamp_multiscale_size
                        self._ms_size = clamp_multiscale_size(
                            exp.random_input_size(
                                _random.Random(int(self.state.step))))
                    imgs_np, labels_np = multiscale_resize(
                        np.asarray(imgs_np), np.asarray(labels_np),
                        self._ms_size)
                if self.mesh is not None:
                    from ..parallel.mesh import shard_batch
                    frames, labels = shard_batch(self.mesh, (
                        jnp.asarray(imgs_np), jnp.asarray(labels_np)))
                else:
                    frames = jax.device_put(jnp.asarray(imgs_np))
                    labels = jax.device_put(jnp.asarray(labels_np))
                data_time = time.time() - data_t0
                t0 = time.time()
                self.state, losses = step_fn(self.state, frames, labels)
                host = {k: float(v) for k, v in losses.items()}
                self.meter.update(iter_time=time.time() - t0,
                                  data_time=data_time, **host)
                data_t0 = time.time()
                if (n + 1) % exp.print_interval == 0:
                    left = (self.iters_per_epoch - n - 1 +
                            (exp.max_epoch - epoch - 1) *
                            self.iters_per_epoch)
                    eta = datetime.timedelta(seconds=int(
                        left * self.meter["iter_time"].global_avg))
                    loss_str = ", ".join(f"{k}: {self.meter[k].latest:.3f}"
                                         for k in host)
                    print(f"epoch {epoch + 1} iter {n + 1}/"
                          f"{self.iters_per_epoch} "
                          f"mem {gpu_mem_usage_mb():.0f}MB "
                          f"iter {self.meter['iter_time'].avg:.3f}s "
                          f"ETA {eta} | {loss_str}")
            # ckpt_interval: skip intermediate epoch saves (a width-1.0
            # checkpoint is ~650 MB; per-epoch writes can dominate small
            # runs). The final epoch always saves.
            ci = getattr(exp, "ckpt_interval", 1) or 1
            if (epoch + 1) % ci == 0 or epoch + 1 == exp.max_epoch:
                self.save_ckpt(epoch)
            if (epoch + 1) % exp.eval_interval == 0:
                ap = self.evaluate()
                if ap > self.best_ap:
                    self.best_ap = ap
                    self.save_ckpt(epoch, is_best=True)
            print(f"epoch {epoch + 1}/{exp.max_epoch} done in "
                  f"{time.time() - t_epoch:.0f}s")
        return self.state

    def make_predict_fn(self, variables):
        exp = self.exp
        model = self.model

        @jax.jit
        def fwd(variables, x):
            out = model.apply(variables, x, False, True)
            dets = postprocess_dense_batch(out["decoded"],
                                           exp.num_classes,
                                           exp.test_conf, exp.nmsthre, 100)
            return dets

        def predict(imgs):
            d = fwd(variables, jnp.asarray(imgs))
            d = jax.tree_util.tree_map(np.asarray, d)
            out = []
            for b in range(len(imgs)):
                rows = np.concatenate([
                    d.boxes[b], d.obj[b][:, None], d.score[b][:, None],
                    d.cls_id[b][:, None].astype(np.float32)], -1)
                out.append(rows[d.mask[b]])
            return out

        return predict

    def evaluate(self) -> float:
        evaluator = self.exp.get_evaluator()
        variables = {"params": self.state.ema_params,
                     "batch_stats": self.state.ema_batch_stats}
        res = evaluator.evaluate(self.make_predict_fn(variables))
        return float(res.get("AP50", 0.0))

    def save_ckpt(self, epoch: int, is_best: bool = False):
        from ..train.checkpoint import opt_state_to_ckpt
        ckpt = {
            "start_epoch": np.int32(epoch + 1),
            "params": self.state.ema_params,
            "raw_params": self.state.params,
            "batch_stats": self.state.ema_batch_stats,
            # momentum survives a resume (reference trainer.py:355)
            "opt_state": opt_state_to_ckpt(self.state.opt_state),
        }
        path = save_checkpoint(ckpt, self.file_name, is_best=is_best)
        print(f"saved checkpoint {path}")
