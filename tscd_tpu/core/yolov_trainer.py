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

    # _init_state is inherited from TSCDTrainer: it already goes through
    # the overridden _init_variables above, and the parent version passes
    # window_batch to exp.get_optimizer (the global-window-batch LR
    # scaling, reference lr-per-img rule yolox_base.py:183) — a local
    # copy here silently skipped that scaling under mesh/window batching.

    def _window_losses(self, params, batch_stats, frames, labels,
                       time_emb):
        """One-window YOLOV/YOLOV++ loss; the shared TSCDTrainer step
        machinery (window batching, grad accumulation, trainer mesh)
        wraps this unchanged."""
        exp = self.exp
        L, G = self.lframe, self.gframe
        # refined frames — mirrors the heads' own slicing: YOLOVHead
        # refines ALL F frames; YOLOVPlusHead slices agg features to
        # [:L] whenever lframe > 0 for EVERY agg_type (msa/localagg/mca,
        # yolov_heads.py L = max(lframe,1) if lframe>0 else F — the
        # reference v_plus_head keeps local rows only the same way) and
        # to F when lframe == 0
        R = (L + G) if (isinstance(self.model, YOLOV) or L == 0) else L
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
        # same refined-frame rule as _window_losses (the old agg_type
        # condition mis-sized R for YOLOV++ msa/localagg with lframe>0 —
        # the head still slices to local frames; caught by the vid_demo
        # int8 CLI smoke on a yolov_plus exp)
        R = ((lframe + gframe)
             if (isinstance(self.model, YOLOV) or lframe == 0)
             else lframe)
        nms = float(getattr(self.exp, "nmsthre", 0.5))
        conf = float(getattr(self.exp, "test_conf", 0.001))

        @jax.jit
        def eval_fn(variables, x, te):
            out = self._apply_model(variables, x, te, lframe, gframe,
                                    False)
            refined, original = yolov_eval_postprocess(
                out, R, C, nms_thresh=nms, conf_thre=conf)
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
