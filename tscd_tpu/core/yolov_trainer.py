"""YOLOV/YOLOV++ trainer — TSCDTrainer with the YOLOV forward signature
(no matcher state; YOLOV takes no time embedding, YOLOV++ takes one) and
yolov_loss (reference: yolox/core/vid_trainer.py drives these heads the
same way as TSCD)."""

import jax
import jax.numpy as jnp
import numpy as np

from ..models.yolov import YOLOV, yolov_eval_postprocess
from ..train.losses import yolov_loss
from .tscd_trainer import TSCDTrainer


class YOLOVTrainer(TSCDTrainer):
    def _apply_model(self, variables, frames, te, L, G, train,
                     mutable=False):
        if isinstance(self.model, YOLOV):
            if mutable:
                return self.model.apply(variables, frames, L, G, train,
                                        mutable=["batch_stats"])
            return self.model.apply(variables, frames, L, G, train)
        if mutable:
            return self.model.apply(variables, frames, L, G, te, train,
                                    mutable=["batch_stats"])
        return self.model.apply(variables, frames, L, G, te, train)

    def _init_variables(self, x, te, L, G):
        if isinstance(self.model, YOLOV):
            return self.model.init(jax.random.PRNGKey(self.exp.seed or 0),
                                   x, L, G)
        return self.model.init(jax.random.PRNGKey(self.exp.seed or 0),
                               x, L, G, te)

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
        iters = max(len(self.train_loader), 1)
        self.tx = exp.get_optimizer(iters)
        from ..train.checkpoint import load_checkpoint, load_tolerant
        from ..train.step import init_train_state
        ckpt_path = getattr(self.args, "ckpt", None) if self.args else None
        opt_ckpt = None
        if getattr(self.args, "resume", False) and self.args:
            import os as _os
            path = ckpt_path or _os.path.join(self.file_name,
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
            print(f"resumed from {path} at epoch {self.start_epoch}")
        elif ckpt_path:
            restored = load_checkpoint(ckpt_path)
            variables = {
                "params": load_tolerant(variables["params"],
                                        restored.get("params", restored)),
                "batch_stats": load_tolerant(
                    variables.get("batch_stats", {}),
                    restored.get("batch_stats", {}))}
            print(f"loaded fine-tune weights from {ckpt_path}")
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
        """One-window YOLOV/YOLOV++ loss; the shared TSCDTrainer step
        machinery (window batching, grad accumulation, trainer mesh)
        wraps this unchanged."""
        exp = self.exp
        L, G = self.lframe, self.gframe
        # refined frames: YOLOV refines all F, MCA variants refine L
        R = (L + G) if (isinstance(self.model, YOLOV)
                        or exp.agg_type in ("msa", "localagg")) else L
        fix_bn = getattr(exp, "fix_bn", False)
        variables = {"params": params, "batch_stats": batch_stats}
        if fix_bn:
            out = self._apply_model(variables, frames, time_emb,
                                    L, G, False)
            new_bs = batch_stats
        else:
            out, mut = self._apply_model(variables, frames, time_emb,
                                         L, G, True, mutable=True)
            new_bs = mut["batch_stats"]
        losses = yolov_loss(out, labels, (8, 16, 32), R)
        return losses, new_bs

    def make_predict_fn(self, variables, lframe, gframe):
        C = self.exp.num_classes
        R = ((lframe + gframe)
             if (isinstance(self.model, YOLOV)
                 or self.exp.agg_type in ("msa", "localagg"))
             else max(lframe, 1))

        @jax.jit
        def eval_fn(variables, x, te):
            out = self._apply_model(variables, x, te, lframe, gframe,
                                    False)
            refined, original = yolov_eval_postprocess(out, R, C)
            return refined, original

        def dispatch(imgs, te, resume, state):
            refined, _ = eval_fn(variables, jnp.asarray(imgs),
                                 jnp.asarray(te, jnp.float32))
            return refined, state

        def materialize(refined):
            refined = jax.tree_util.tree_map(np.asarray, refined)
            dets = []
            for f in range(R):
                m = refined.mask[f]
                rows = np.concatenate([
                    refined.boxes[f], refined.obj[f][:, None],
                    refined.score[f][:, None],
                    refined.cls_id[f][:, None].astype(np.float32)], -1)
                dets.append(rows[m])
            return dets

        def predict(imgs, te, resume, state):
            refined, state = dispatch(imgs, te, resume, state)
            return materialize(refined), state

        predict.dispatch = dispatch
        predict.materialize = materialize
        return predict
