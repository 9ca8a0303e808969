"""Video (TSCD) trainer (reference: yolox/core/tscd_trainer.py:90).

One jitted XLA program per train step (forward + SimOTA + losses +
backward + grouped SGD + EMA). The reference's CUDA-stream prefetcher is
the WindowLoader background thread + async device_put; AMP autocast is
bf16 by construction.

Multi-chip training is a PRODUCT path here (the TPU replacement for the
reference's launch()/DDP wrap, yolox/core/launch.py:39 +
tscd_trainer.py:231): set the exp knobs `mesh_data` / `mesh_model` /
`fsdp` (or the matching tools/tscd_train.py flags) and the trainer
builds a jax.sharding.Mesh, the loader yields a batch of `mesh_data`
windows per step (one window per data shard — the analogue of the
reference's per-GPU batch split, yolox_base.py:183), the step vmaps the
per-window loss and means BN stats across windows (sync-BN), and the
step is jitted with the matching in/out shardings
(parallel/trainer_mesh.py); gradient all-reduce, FSDP
all-gather/reduce-scatter and TP activation collectives fall out of
GSPMD. Defaults (mesh_data=1) keep the single-chip path bit-identical
to before. Equality vs the single-device trainer is pinned by
tests/test_trainer_mesh.py.
"""

import datetime
import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.matching import init_matcher_state
from ..models.tscd import tscd_eval_postprocess
from ..ops.position import get_timing_signal_1d
from ..train.checkpoint import (load_checkpoint, load_tolerant,
                                save_checkpoint)
from ..train.ema import ema_update
from ..train.losses import tscd_loss
from ..train.step import TrainState, init_train_state
from ..utils.metric import MeterBuffer, gpu_mem_usage_mb


class TSCDTrainer:
    def __init__(self, exp, args=None, val_loader=None):
        self.exp = exp
        self.args = args
        # host-RNG seeding for the augmentation pipeline (reference
        # tools/vid_train.py:104-105 seeds random/torch from exp.seed)
        from ..utils.seeding import seed_everything
        seed_everything(getattr(exp, "seed", None))
        self.val_loader = val_loader
        self.lframe, self.gframe = exp.lframe, exp.gframe
        self.max_epoch = exp.max_epoch
        self.file_name = os.path.join(exp.output_dir, exp.exp_name)
        os.makedirs(self.file_name, exist_ok=True)
        self.meter = MeterBuffer(window_size=exp.print_interval)
        self.best_ap = 0.0
        self.start_epoch = 0
        self.model = exp.get_model()
        self.state: Optional[TrainState] = None
        self._train_step = None
        self._eval_fn = None
        # trainer mesh from the exp knobs (None = single device, the
        # default); window_batch = windows per optimizer step (0 = one
        # per data shard)
        from ..parallel.trainer_mesh import mesh_from_exp
        self.mesh = mesh_from_exp(exp)
        wb = int(getattr(exp, "window_batch", 0) or 0)
        self.window_batch = wb or (self.mesh.shape["data"]
                                   if self.mesh is not None else 1)
        if self.mesh is not None:
            assert self.window_batch % self.mesh.shape["data"] == 0, (
                f"window_batch({self.window_batch}) must divide evenly "
                f"over mesh_data({self.mesh.shape['data']})")

    # -- setup ---------------------------------------------------------
    def _init_variables(self, x, te, L, G):
        return self.model.init(jax.random.PRNGKey(self.exp.seed or 0),
                               x, te, L, G)

    def _init_state(self, sample_batch):
        exp = self.exp
        F = self.lframe + self.gframe
        imgs_np = sample_batch["imgs"]
        te_np = sample_batch["time_embedding"]
        if self.window_batch > 1:       # [B, F, ...] -> first window
            imgs_np, te_np = imgs_np[0], te_np[0]
        x = jnp.asarray(imgs_np[:F])
        te = jnp.asarray(te_np[:F])
        variables = self._init_variables(x, te, self.lframe, self.gframe)

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
                    restored.get("batch_stats", {})),
            }
            # resume restores momentum too (reference trainer.py:291);
            # fine-tune loads (elif below) deliberately do not
            opt_ckpt = restored.get("opt_state")
            print(f"resumed from {path} at epoch {self.start_epoch}")
        elif ckpt_path:
            restored = load_checkpoint(ckpt_path)
            # fine-tune load: shape-tolerant merge (2-stage recipe — init
            # TSCD from a YOLOX checkpoint, reference checkpoint.py:11)
            src = restored.get("params", restored)
            variables = {
                "params": load_tolerant(variables["params"], src),
                "batch_stats": load_tolerant(
                    variables.get("batch_stats", {}),
                    restored.get("batch_stats",
                                 variables.get("batch_stats", {}))),
            }
            print(f"loaded fine-tune weights from {ckpt_path}")

        iters = max(len(self.train_loader), 1)
        try:
            self.tx = exp.get_optimizer(iters,
                                        window_batch=self.window_batch)
        except TypeError:  # custom exp without the window_batch kwarg
            self.tx = exp.get_optimizer(iters)
        self.state = init_train_state(variables, self.tx)
        if opt_ckpt is not None:
            from ..train.checkpoint import restore_opt_state
            self.state = self.state._replace(
                opt_state=restore_opt_state(self.state.opt_state,
                                            opt_ckpt))
        if self.start_epoch:
            self.state = self.state._replace(
                step=jnp.asarray(self.start_epoch * iters, jnp.int32))

    def _window_losses(self, params, batch_stats, frames, labels,
                       time_emb):
        """Loss dict (+ new BN stats) for ONE window — the piece
        subclasses override (YOLOVTrainer swaps the forward signature
        and loss); everything around it (window batching, grad
        accumulation, mesh sharding, int8 wrapping) is shared."""
        exp, model = self.exp, self.model
        L, G = self.lframe, self.gframe
        fix_bn = getattr(exp, "fix_bn", False)
        variables = {"params": params, "batch_stats": batch_stats}
        if fix_bn:
            # frozen-backbone stage-2: BN in eval mode everywhere,
            # no stat updates (reference fix_bn semantics).
            # cat_ota_fg still needs the train-path proposal
            # injection, so pass labels with train=False: the
            # head gates injection on labels presence + its
            # cat_ota_fg attribute
            out = model.apply(variables, frames, time_emb, L, G,
                              False, labels=labels)
            new_bs = batch_stats
        else:
            out, mut = model.apply(variables, frames, time_emb, L,
                                   G, True, labels=labels,
                                   mutable=["batch_stats"])
            new_bs = mut["batch_stats"]
        losses = tscd_loss(out, labels, (8, 16, 32), L,
                           ota_mode=getattr(exp, "ota_mode", True))
        return losses, new_bs

    def _build_train_step(self):
        exp = self.exp
        tx = self.tx
        fix_bn = getattr(exp, "fix_bn", False)
        import optax

        batched = self.window_batch > 1
        accum = int(getattr(exp, "grad_accum", 1) or 1)
        if accum > 1:
            assert batched and self.window_batch % accum == 0, (
                f"grad_accum({accum}) needs window_batch a multiple of "
                f"it (window_batch={self.window_batch})")
            if self.mesh is not None:
                assert (self.window_batch // accum) % \
                    self.mesh.shape["data"] == 0, (
                        "each grad_accum chunk must still divide over "
                        "mesh_data")

        window_losses = self._window_losses

        def step(state: TrainState, frames, labels, time_emb):
            def chunk_loss_fn(params, f, l, t):
                """Mean loss (+ mean BN stats) over one chunk of
                windows; the unit both the plain batched step and the
                grad-accum scan differentiate."""
                if not batched:
                    losses, new_bs = window_losses(
                        params, state.batch_stats, f, l, t)
                    return losses["total_loss"], (losses, new_bs)
                if fix_bn:
                    losses_b = jax.vmap(
                        lambda fi, li, ti: window_losses(
                            params, state.batch_stats, fi, li, ti)[0]
                    )(f, l, t)
                    new_bs = state.batch_stats
                else:
                    losses_b, bs_b = jax.vmap(
                        lambda fi, li, ti: window_losses(
                            params, state.batch_stats, fi, li, ti)
                    )(f, l, t)
                    # cross-window BN-stat mean — under the data mesh
                    # GSPMD turns this into the sync-BN all-reduce
                    # (reference allreduce_norm.py:97)
                    new_bs = jax.tree_util.tree_map(
                        lambda a: a.mean(0), bs_b)
                losses = jax.tree_util.tree_map(lambda a: a.mean(0),
                                                losses_b)
                return losses["total_loss"], (losses, new_bs)

            if accum > 1:
                # gradient accumulation: lax.scan over window chunks so
                # peak activation memory scales with window_batch/accum
                # while the update math stays EXACTLY the one-big-batch
                # mean (the per-window vmapped loss decomposes over the
                # batch, so mean of chunk-means == batch mean for
                # grads, losses and BN stats alike —
                # tests/test_trainer_mesh.py pins step equality)
                from ..train.step import scan_accum_value_and_grad
                grads, (losses, new_bs) = scan_accum_value_and_grad(
                    chunk_loss_fn, state.params,
                    (frames, labels, time_emb), accum)
                if fix_bn:
                    # the aux mean of A identical batch_stats copies is
                    # the same values only up to rounding for A not a
                    # power of two — keep the exact tree instead
                    new_bs = state.batch_stats
            else:
                (_, (losses, new_bs)), grads = jax.value_and_grad(
                    chunk_loss_fn, has_aux=True)(
                        state.params, frames, labels, time_emb)
            updates, opt_state = tx.update(grads, state.opt_state,
                                           state.params)
            params = optax.apply_updates(state.params, updates)
            new_step = state.step + 1
            new_state = TrainState(
                params=params, batch_stats=new_bs, opt_state=opt_state,
                ema_params=ema_update(state.ema_params, params, new_step,
                                      exp.ema_decay),
                ema_batch_stats=ema_update(state.ema_batch_stats, new_bs,
                                           new_step, exp.ema_decay),
                step=new_step)
            return new_state, losses

        # int8 frozen-backbone stage-2 (opt-in): the frozen backbone's
        # FORWARD runs w8a8 (models/blocks.py) while the trained video
        # head stays fp — valid because fix_bn runs the backbone with
        # train=False and its params receive no updates (freeze mask +
        # stop_backbone_grad), so the int8 path's round() never needs a
        # gradient. The head then trains against the same features the
        # int8 serving path produces.
        if (getattr(exp, "int8_frozen_backbone", False) and fix_bn
                and "backbone" in tuple(exp.freeze_prefixes())):
            from ..models.blocks import int8_eval
            inner_step = step

            def step(state, frames, labels, time_emb):
                with int8_eval(scope=(("backbone",),)):
                    return inner_step(state, frames, labels, time_emb)
        elif getattr(exp, "int8_qat", False) and fix_bn:
            # quantization-aware fine-tune: every eligible conv runs
            # fake-quant with STE gradients (models/blocks.py), so the
            # trained weights adapt to the int8 serving noise; serve
            # the checkpoint with --int8 afterwards
            from ..models.blocks import int8_eval
            inner_step = step

            def step(state, frames, labels, time_emb):
                with int8_eval(qat=True):
                    return inner_step(state, frames, labels, time_emb)

        from ..parallel.trainer_mesh import jit_trainer_step, place_state
        fsdp = bool(getattr(exp, "fsdp", False))
        if self.mesh is not None:
            self.state = place_state(self.state, self.mesh, fsdp)
        self._train_step = jit_trainer_step(step, self.state, self.mesh,
                                            fsdp=fsdp, num_data_args=3)

    # -- train ---------------------------------------------------------
    def train(self):
        exp = self.exp
        try:
            self.train_loader = exp.get_data_loader(
                batch_windows=self.window_batch)
        except TypeError:  # custom exp without the batch_windows kwarg
            assert self.window_batch == 1, (
                "mesh_data/window_batch > 1 needs a get_data_loader "
                "that accepts batch_windows")
            self.train_loader = exp.get_data_loader()
        first = next(iter(self.train_loader))
        self._init_state(first)
        self._build_train_step()
        iters_per_epoch = max(len(self.train_loader), 1)
        print(f"training {exp.exp_name}: {self.max_epoch} epochs x "
              f"{iters_per_epoch} windows")

        for epoch in range(self.start_epoch, self.max_epoch):
            t_epoch = time.time()
            n = 0
            data_t0 = time.time()
            for batch in iter(self.train_loader):
                self._one_iter(batch, epoch, n, iters_per_epoch, data_t0)
                n += 1
                data_t0 = time.time()
            # ckpt_interval: skip intermediate epoch saves (a width-1.0
            # checkpoint is ~650 MB; per-epoch writes can dominate small
            # runs). The final epoch always saves.
            ci = getattr(exp, "ckpt_interval", 1) or 1
            if (epoch + 1) % ci == 0 or epoch + 1 == self.max_epoch:
                self.save_ckpt(epoch)
            if (epoch + 1) % exp.eval_interval == 0:
                ap = self.evaluate()
                if ap > self.best_ap:
                    self.best_ap = ap
                    self.save_ckpt(epoch, is_best=True)
            print(f"epoch {epoch + 1}/{self.max_epoch} done in "
                  f"{time.time() - t_epoch:.0f}s")
        return self.state

    def _one_iter(self, batch, epoch, n, iters_per_epoch, data_t0):
        F = self.lframe + self.gframe
        B = self.window_batch
        if B > 1:  # [B, F, ...] window batch
            imgs_np, labels_np = batch["imgs"], batch["labels"]
            te_np = batch["time_embedding"]
        else:
            imgs_np, labels_np = batch["imgs"][:F], batch["labels"][:F]
            te_np = batch["time_embedding"][:F]
        if getattr(self.exp, "enable_multiscale", False):
            # re-sample every 10 iters (reference trainer's multiscale
            # cadence); each size is a separately-cached compile
            import random as _random
            from ..data.vid import multiscale_resize
            if n % 10 == 0 or not hasattr(self, "_ms_size"):
                from ..utils.rig import clamp_multiscale_size
                self._ms_size = clamp_multiscale_size(
                    self.exp.random_input_size(
                        _random.Random(int(self.state.step) if self.state
                                       is not None else 0)))
            imgs_np = np.asarray(imgs_np)
            labels_np = np.asarray(labels_np)
            if B > 1:  # resize operates per-frame: flatten the window axis
                bf = imgs_np.shape[:2]
                ri, rl = multiscale_resize(
                    imgs_np.reshape((-1,) + imgs_np.shape[2:]),
                    labels_np.reshape((-1,) + labels_np.shape[2:]),
                    self._ms_size)
                imgs_np = ri.reshape(bf + ri.shape[1:])
                labels_np = rl.reshape(bf + rl.shape[1:])
            else:
                imgs_np, labels_np = multiscale_resize(
                    imgs_np, labels_np, self._ms_size)
        if self.mesh is not None:
            from ..parallel.mesh import shard_batch
            frames, labels, te = shard_batch(self.mesh, (
                jnp.asarray(imgs_np), jnp.asarray(labels_np),
                jnp.asarray(te_np, jnp.float32)))
        else:
            frames = jax.device_put(jnp.asarray(imgs_np))
            labels = jax.device_put(jnp.asarray(labels_np))
            te = jax.device_put(jnp.asarray(te_np, jnp.float32))
        data_time = time.time() - data_t0
        t0 = time.time()
        self.state, losses = self._train_step(self.state, frames, labels,
                                              te)
        # scalar readback doubles as the execution barrier
        host_losses = {k: float(v) for k, v in losses.items()}
        iter_time = time.time() - t0
        self.meter.update(iter_time=iter_time, data_time=data_time,
                          **host_losses)
        # periodic in-epoch checkpoint (reference tscd_trainer.py:346)
        if (int(self.state.step) % 2000) == 0:
            self.save_ckpt(epoch)
        if (n + 1) % self.exp.print_interval == 0:
            left = (iters_per_epoch - n - 1 +
                    (self.max_epoch - epoch - 1) * iters_per_epoch)
            eta = datetime.timedelta(
                seconds=int(left * self.meter["iter_time"].global_avg))
            loss_str = ", ".join(
                f"{k}: {self.meter[k].latest:.3f}" for k in host_losses)
            print(f"epoch {epoch + 1} iter {n + 1}/{iters_per_epoch} "
                  f"mem {gpu_mem_usage_mb():.0f}MB "
                  f"iter {self.meter['iter_time'].avg:.3f}s "
                  f"data {self.meter['data_time'].avg:.3f}s "
                  f"ETA {eta} | {loss_str}")

    # -- eval ------------------------------------------------------------
    def _build_eval_fn(self, lframe, gframe, sp_mesh=None):
        model = self.model
        C = self.exp.num_classes
        # exp-driven final postprocess (reference TSCD.forward
        # nms_thresh / test_conf — the demo's --nms lands here)
        nms = float(getattr(self.exp, "nmsthre", 0.5))
        conf = float(getattr(self.exp, "test_conf", 0.001))
        if sp_mesh is not None:
            # sequence-parallel eval: frame axis sharded over the mesh
            # (per-frame convs stay on their shard, only proposal
            # features ride the all-gather) — parallel/sharded_eval.py
            from ..parallel.sharded_eval import make_sharded_tscd_eval
            inner = make_sharded_tscd_eval(model, sp_mesh, lframe,
                                           gframe, C, nms_thresh=nms,
                                           conf_thre=conf)

            def eval_fn(variables, x, te, st):
                (refined, original), new_st = inner(variables, x, te, st)
                return refined, original, new_st

            return eval_fn

        @jax.jit
        def eval_fn(variables, x, te, st):
            out = model.apply(variables, x, te, lframe, gframe, False, st)
            refined, original = tscd_eval_postprocess(
                out, lframe, C, nms_thresh=nms, conf_thre=conf)
            return refined, original, out["matcher_state"]

        return eval_fn

    def make_predict_fn(self, variables, lframe, gframe, sp_mesh=None):
        """Returns predict_fn(imgs, te, resume, state) for VIDEvaluator.

        Also exposes `.dispatch` / `.materialize` so the evaluator can
        pipeline: dispatch window i+1 (async upload + compute) before
        materializing window i's results to the host — the JAX analogue
        of the reference's CUDA-stream DataPrefetcher overlap."""
        eval_fn = self._build_eval_fn(lframe, gframe, sp_mesh=sp_mesh)
        P = self.exp.minimal_limit
        hidden = int(256 * self.exp.width)
        # fresh state in the MODEL dtype: a bf16 model RETURNS its
        # carried state at bf16, so an fp32 fresh state would make the
        # first window of every video a second compiled program
        # (PROFILE.md §latency retrace trap); matching dtypes = one
        # program serves both. Zero-valued state gated by
        # has_state=False, so the dtype carries no information.
        fresh = init_matcher_state(
            P, hidden, 4 * hidden,
            dtype=getattr(self.model, "dtype", jnp.float32))

        def dispatch(imgs, te, resume, state):
            st = state if (resume and state is not None) else fresh
            refined, original, new_st = eval_fn(
                variables, jnp.asarray(imgs),
                jnp.asarray(te, jnp.float32), st)
            return refined, new_st

        def materialize(refined):
            refined = jax.tree_util.tree_map(np.asarray, refined)
            dets = []
            for f in range(lframe):
                m = refined.mask[f]
                rows = np.concatenate([
                    refined.boxes[f], refined.obj[f][:, None],
                    refined.score[f][:, None],
                    refined.cls_id[f][:, None].astype(np.float32)], -1)
                dets.append(rows[m])
            return dets

        def predict(imgs, te, resume, state):
            refined, new_st = dispatch(imgs, te, resume, state)
            return materialize(refined), new_st

        predict.dispatch = dispatch
        predict.materialize = materialize
        return predict

    def evaluate(self) -> float:
        exp = self.exp
        loader = self.val_loader or exp.get_eval_loader()
        evaluator = exp.get_evaluator(loader)
        variables = {"params": self.state.ema_params,
                     "batch_stats": self.state.ema_batch_stats} \
            if self.state is not None else None
        assert variables is not None, "no state to evaluate"
        predict = self.make_predict_fn(variables, exp.lframe_val,
                                       exp.gframe_val)
        res = evaluator.evaluate(predict)
        return float(res.get("AP50", 0.0))

    # -- ckpt -------------------------------------------------------------
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
