"""Video (TSCD) experiment base (reference: exps/TSCD_VID/tscd_base.py).

Carries the reference's video knobs (:38-126) as typed attributes. The
default values here match vid_tscd_large.py (the TSCD-Large VID config):
ota_mode refined labels, MCA aggregation, decoupled reg, fixed 50-slot
proposals, lframe=4/gframe=12 train windows, lframe=1/gframe=31 eval.
"""

import os
from typing import Optional

from .yolox_base import Exp as YoloxExp


class Exp(YoloxExp):
    def __init__(self):
        super().__init__()
        # model — TSCD-Large defaults (vid_tscd_large.py:13-45)
        self.num_classes = 30
        self.depth = 1.0
        self.width = 1.0
        self.input_size = (576, 576)
        self.test_size = (576, 576)
        self.multiscale_range = 3          # ±3×64 (tscd_base random_resize)
        self.multiscale_step = 64          # video rule: 64-px steps
                                           # (reference tscd_base.py:388-392)
        # video window construction (tscd_base.py:38-126)
        self.lframe = 4
        self.gframe = 12
        self.lframe_val = 1
        self.gframe_val = 31
        self.mode = "random"
        self.local_stride = 1
        self.traj_linking = False
        self.tnum = -1
        # proposals / aggregation
        self.defualt_p = 30                 # reference's (sic) topK name
        self.minimal_limit = 50             # validity floor (:1594-1599)
        # physical proposal slots P = the fixed-shape maximal_limit
        # (:1600-1607); 0 = same as minimal_limit (the reference's
        # TSCD-Large configs set maximal_limit=0 i.e. unbounded).
        # Measured ceiling (tools/measure_fixed_p.py, reference TSCDHead
        # on synthetic crowded frames with 125-170 above-threshold dets):
        #   P=50  drops 65% of above-threshold dets, P=75 48%, P=100 31%;
        #   the SURVIVING rows' refined cls scores move by <= 7e-4
        #   (sigmoid) and the matcher obj by <= 0.11 from the changed
        #   attention key set. (Random-weight scores are flat, so the
        #   dropped rows there carry proportional score mass; a trained
        #   detector concentrates mass in the kept top-P.) Default stays
        #   at the reference's 50-floor; raise to 75-100 for crowded
        #   datasets (OVIS) at ~P^2 attention cost.
        self.maximal_limit = 0
        self.defualt_pre = 750
        self.sim_thresh = 0.75
        self.conf_sim_thresh = 0.99  # obj-branch round-2 threshold (ovis v++)
        self.pre_nms = 0.75
        self.use_pre_nms = False
        self.ave = True
        self.use_mask = False
        self.agg_type = "mca"
        self.decouple_reg = True
        self.vid_cls = True
        self.vid_reg = True
        # eval-time proposal-patch vid towers (models/sparse_towers.py):
        # exact-equal fast path (tests/test_sparse_towers.py); valid
        # whenever BN runs in running-average mode (eval, or fix_bn)
        self.sparse_vid_towers = False
        # jax.checkpoint over the backbone: ~1 extra backward-pass
        # forward buys the window's activation memory (longer F)
        self.remat_backbone = False
        # backbone family (reference ovis_tscd_base.py:59 backbone_name):
        # "MCSP" | "Swin_Tiny" | "Swin_Base" | "Focal"
        self.backbone_name = "MCSP"
        # eval windows upload as raw uint8 (bit-exact; 4x lighter)
        self.eval_uint8_transport = True
        # the stage-2 backbone is frozen (freeze_prefixes), so skip its
        # backward entirely — torch does this implicitly via
        # requires_grad=False (vid_tscd_large.py:111-143); identical
        # updates, measured ~2x faster train step (PROFILE.md §train)
        self.stop_backbone_grad = True
        # run the frozen backbone's stage-2 forward in int8 (w8a8,
        # core/tscd_trainer.py): faster step, and the video head trains
        # against the exact features the int8 serving path produces.
        # Off by default (the reference recipe is fp).
        self.int8_frozen_backbone = False
        # quantization-aware fine-tune: all eligible convs run
        # fake-quant with STE gradients during the fix_bn stage-2 step
        # (models/blocks.py int8_eval(qat=True)); serve the resulting
        # checkpoint with --int8. Mutually exclusive with
        # int8_frozen_backbone (that one wins if both are set).
        self.int8_qat = False
        # windows per optimizer step (0 = auto: one per `data` mesh
        # shard). >1 on a single device = window-batched step (vmapped
        # loss, averaged grads) — the same math the DP mesh runs.
        self.window_batch = 0
        # grad_accum (inherited from yolox_base): for video exps the
        # per-window vmapped loss makes accumulation EXACTLY the
        # one-big-batch step (tests/test_trainer_mesh.py)
        self.reconf = True
        self.ota_mode = True
        self.cat_ota_fg = False
        self.heads = 4
        self.drop_rate = 0.0
        # matcher
        self.decoder_layer_num = 1
        # training (tscd_base.py + vid_tscd_large.py)
        self.max_epoch = 7
        self.no_aug_epochs = 2
        self.warmup_epochs = 1
        self.basic_lr_per_img = 0.002 / 64.0
        self.stem_lr_ratio = 0.1
        self.batch_size = 16                # = lframe + gframe (one window)
        self.eval_interval = 1
        self.perspective = 0.0
        self.enable_multiscale = False      # ±multiscale_range x64 resize
        self.fix_bn = True                  # frozen backbone => eval-mode BN
        self.seed = 2024
        # eval postprocess: video defaults (reference TSCD.forward
        # nms_thresh=0.5 / test_conf=0.001, tscd_base.py:60-61) — these
        # reach tscd_eval_postprocess via the trainer's eval fn and the
        # demo's --nms override
        self.nmsthre = 0.5
        self.test_conf = 0.001
        # data paths
        self.data_dir = "./datasets/ILSVRC2015"
        self.train_seq_path = "./yolox/data/datasets/train_seq.npy"
        self.val_seq_path = "./yolox/data/datasets/val_seq.npy"
        self.anno_cache = ""
        self.dataset_name = "vid"           # vid | ovis
        self.ovis_train_json = ""
        self.ovis_val_json = ""
        self.ovis_name = ""
        self.exp_name = os.path.splitext(os.path.basename(__file__))[0]

    # -- builders ----------------------------------------------------------
    def get_model(self):
        from ..models.tscd import TSCD
        # stop_backbone_grad severs the backbone backward; that is only
        # an identity transform while the backbone is actually frozen.
        # A subclass that unfreezes it (full fine-tune) must also flip
        # the knob, else it would silently train with zero backbone
        # gradients — so derive/deny here rather than trust the default.
        if self.stop_backbone_grad:
            assert any(p.startswith("backbone")
                       for p in self.freeze_prefixes()), (
                "stop_backbone_grad=True but freeze_prefixes() does not "
                "freeze the backbone; set stop_backbone_grad=False for "
                "full fine-tune")
        return TSCD(num_classes=self.num_classes, depth=self.depth,
                    width=self.width, act=self.act,
                    depthwise=self.depthwise,
                    num_proposals=self.maximal_limit or self.minimal_limit,
                    minimal_limit=self.minimal_limit,
                    cat_ota_fg=self.cat_ota_fg, heads=self.heads,
                    agg_type=self.agg_type,
                    decoder_layer_num=self.decoder_layer_num,
                    reconf=self.reconf, decouple_reg=self.decouple_reg,
                    use_pre_nms=self.use_pre_nms,
                    sim_thresh=self.sim_thresh,
                    conf_sim_thresh=self.conf_sim_thresh,
                    test_conf=self.test_conf,
                    sparse_vid_towers=self.sparse_vid_towers,
                    remat_backbone=self.remat_backbone,
                    stop_backbone_grad=self.stop_backbone_grad,
                    backbone_name=self.backbone_name)

    def freeze_prefixes(self):
        """Parameter-path prefixes frozen during TSCD stage-2 training
        (reference vid_tscd_large.py:111-143: backbone + still-image
        stems/towers/preds are frozen)."""
        return ("backbone",)

    def stem_lr_prefixes(self):
        """Reduced-LR groups (stem_lr_ratio, vid_tscd_large.py:157-190)."""
        return ("head/stem_", "head/cls_conv_", "head/reg_conv_",
                "head/cls_pred_", "head/reg_pred_", "head/obj_pred_")

    def get_optimizer(self, iters_per_epoch: int, window_batch: int = 1):
        from ..train.optim import build_sgd
        sched = self.get_lr_schedule(iters_per_epoch)
        if window_batch > 1:
            # reference LR rule: lr = basic_lr_per_img x GLOBAL batch
            # (yolox_base.py:183 splits batch_size over world_size, the
            # schedule uses the global size). batch_size here is ONE
            # window's frames, so B windows/step scales the schedule by B.
            base_sched = sched
            sched = lambda i: base_sched(i) * window_batch  # noqa: E731
        return build_sgd(sched,
                         momentum=self.momentum,
                         weight_decay=self.weight_decay,
                         freeze_prefixes=self.freeze_prefixes(),
                         stem_lr_prefixes=self.stem_lr_prefixes(),
                         stem_lr_ratio=self.stem_lr_ratio)

    def _vid_dataset(self, val: bool, lframe: int, gframe: int):
        from ..data.vid import OVISVideoDataset, VIDDataset
        if self.dataset_name == "ovis":
            return OVISVideoDataset(
                json_path=self.ovis_val_json if val else self.ovis_train_json,
                data_dir=self.data_dir, name=self.ovis_name,
                img_size=self.input_size if not val else self.test_size,
                lframe=lframe, gframe=gframe, val=val, mode=self.mode,
                training=not val)
        return VIDDataset(
            file_path=self.val_seq_path if val else self.train_seq_path,
            img_size=self.input_size if not val else self.test_size,
            lframe=lframe, gframe=gframe, val=val, mode=self.mode,
            dataset_pth=self.data_dir, tnum=self.tnum,
            traj_linking=val and self.traj_linking,
            local_stride=self.local_stride, training=not val,
            cache_file=self.anno_cache, formal=val)

    def get_data_loader(self, batch_size: Optional[int] = None,
                        no_aug: bool = False, batch_windows: int = 1):
        from ..data.vid import WindowLoader
        ds = self._vid_dataset(False, self.lframe, self.gframe)
        return WindowLoader(ds, shuffle=True, max_labels=120,
                            train_time_index=True, cxcywh=True,
                            augment=not no_aug, hsv_prob=self.hsv_prob,
                            flip_prob=self.flip_prob,
                            batch_windows=batch_windows)

    def get_eval_loader(self, lframe: Optional[int] = None,
                        gframe: Optional[int] = None):
        import numpy as _np

        from ..data.vid import WindowLoader
        ds = self._vid_dataset(True, lframe or self.lframe_val,
                               gframe or self.gframe_val)
        # uint8 transport: bit-exact vs fp32 (letterboxed pixels are
        # integers; the backbone casts on device) at 4x fewer
        # host->HBM bytes — tests/test_vid_datasets.py::
        # test_uint8_transport_exact
        dtype = _np.uint8 if self.eval_uint8_transport else _np.float32
        return WindowLoader(ds, shuffle=False, max_labels=120,
                            img_dtype=dtype)

    def get_evaluator(self, val_loader=None):
        from ..eval.vid_evaluator import OVISEvaluator, VIDEvaluator
        cls = OVISEvaluator if self.dataset_name == "ovis" else VIDEvaluator
        return cls(val_loader or self.get_eval_loader(),
                   img_size=self.test_size, confthre=self.test_conf,
                   nmsthre=self.nmsthre,
                   num_classes=self.num_classes,
                   lframe=self.lframe_val, gframe=self.gframe_val,
                   traj_linking=self.traj_linking)

    def get_trainer(self, args=None):
        from ..core.tscd_trainer import TSCDTrainer
        return TSCDTrainer(self, args)
