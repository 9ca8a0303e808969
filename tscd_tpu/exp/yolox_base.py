"""Still-image YOLOX experiment (reference: yolox/exp/yolox_base.py:15).

All hyperparameters as attributes; builder methods construct the model,
loaders, optimizer, LR schedule, and evaluator. TPU differences: the
optimizer is an optax transform with the reference's 3 param groups
(BN/bias no-decay vs weights), multiscale is a fixed set of pre-compiled
shapes instead of a broadcast resize, and AMP is bf16 by construction.
"""

import os
import random
from typing import Optional, Tuple

from .base_exp import BaseExp


class Exp(BaseExp):
    def __init__(self):
        super().__init__()
        # model
        self.num_classes = 80
        self.depth = 1.00
        self.width = 1.00
        self.act = "silu"
        self.depthwise = False
        # trainer mesh (parallel/trainer_mesh.py) — the product knobs for
        # multi-chip training, replacing the reference's launch()/DDP
        # (yolox/core/launch.py:39, tscd_trainer.py:231):
        #   mesh_data  — data-parallel axis size (-1 = all devices/model)
        #   mesh_model — tensor-parallel axis size (DP x TP when > 1)
        #   fsdp       — shard params/momenta/EMA over the data axis
        # Defaults leave every config single-device, exactly as before.
        self.mesh_data = 1
        self.mesh_model = 1
        self.fsdp = False
        # gradient accumulation: split each step's batch into this many
        # sequential chunks (lax.scan inside the SAME jitted step,
        # train/step.py scan_accum_value_and_grad) — peak activation
        # memory scales with batch/grad_accum. Exactly the big-batch
        # step for per-window video losses / fix_bn; per-chunk BN
        # batches (the standard accumulation semantics) for train-mode
        # BN. No reference analog — its per-GPU batch is memory-bound
        # (yolox_base.py:183).
        self.grad_accum = 1
        # data
        self.data_dir = "./datasets/COCO"
        self.train_ann = "instances_train2017.json"
        self.val_ann = "instances_val2017.json"
        self.train_name = "train2017"
        self.val_name = "val2017"
        self.input_size = (640, 640)
        self.multiscale_range = 5
        self.multiscale_step = 32        # still-image rule: ±range x32
        self.enable_multiscale = False   # each size = one cached compile
        self.data_num_workers = 4
        self.flip_prob = 0.5
        self.hsv_prob = 1.0
        # mosaic/mixup
        self.mosaic_prob = 1.0
        self.mixup_prob = 1.0
        self.degrees = 10.0
        self.translate = 0.1
        self.mosaic_scale = (0.1, 2)
        self.mixup_scale = (0.5, 1.5)
        self.shear = 2.0
        self.enable_mixup = True
        # schedule
        self.warmup_epochs = 5
        self.max_epoch = 300
        self.warmup_lr = 0
        self.basic_lr_per_img = 0.01 / 64.0
        self.scheduler = "yoloxwarmcos"
        self.no_aug_epochs = 15
        self.min_lr_ratio = 0.05
        self.ema = True
        self.ema_decay = 0.9998
        self.momentum = 0.9
        self.weight_decay = 5e-4
        self.batch_size = 16
        self.print_interval = 10
        self.eval_interval = 10
        # save latest_ckpt every N epochs (final epoch always saves);
        # raise for large models where 100s-of-MB per-epoch writes
        # dominate short runs
        self.ckpt_interval = 1
        self.exp_name = os.path.splitext(os.path.basename(__file__))[0]
        # test
        self.test_size = (640, 640)
        self.test_conf = 0.01
        self.nmsthre = 0.65
        self.save_history_ckpt = True

    # -- builders ----------------------------------------------------------
    def get_model(self):
        import jax.numpy as jnp

        from ..models.yolox import YOLOX
        return YOLOX(num_classes=self.num_classes, depth=self.depth,
                     width=self.width, act=self.act,
                     depthwise=self.depthwise)

    def get_dataset(self, cache: bool = False):
        from ..data.coco import COCODataset
        return COCODataset(
            json_file=os.path.join(self.data_dir, "annotations",
                                   self.train_ann),
            data_dir=self.data_dir, name=self.train_name,
            img_size=self.input_size)

    def get_data_loader(self, batch_size: Optional[int] = None,
                        no_aug: bool = False):
        from ..data.coco import BatchLoader, MosaicDetection
        from ..data.transforms import TrainTransform
        dataset = MosaicDetection(
            self.get_dataset(), img_size=self.input_size,
            mosaic=not no_aug,
            preproc=TrainTransform(max_labels=120,
                                   flip_prob=self.flip_prob,
                                   hsv_prob=self.hsv_prob),
            degrees=self.degrees, translate=self.translate,
            mosaic_scale=self.mosaic_scale, mixup_scale=self.mixup_scale,
            shear=self.shear, enable_mixup=self.enable_mixup and not no_aug,
            mosaic_prob=self.mosaic_prob, mixup_prob=self.mixup_prob)
        return BatchLoader(dataset, batch_size or self.batch_size,
                           seed=self.seed or 0)

    def get_eval_dataset(self):
        from ..data.coco import COCODataset
        return COCODataset(
            json_file=os.path.join(self.data_dir, "annotations",
                                   self.val_ann),
            data_dir=self.data_dir, name=self.val_name,
            img_size=self.test_size)

    def get_lr_schedule(self, iters_per_epoch: int):
        from ..train.lr import (cos_lr, multistep_lr, warm_cos_lr,
                                yolox_warm_cos_lr)
        lr = self.basic_lr_per_img * self.batch_size
        total = iters_per_epoch * self.max_epoch
        warm = iters_per_epoch * self.warmup_epochs
        if self.scheduler == "yoloxwarmcos":
            return yolox_warm_cos_lr(
                lr, self.min_lr_ratio, total, warm, self.warmup_lr,
                iters_per_epoch * self.no_aug_epochs)
        if self.scheduler == "warmcos":
            return warm_cos_lr(lr, total, warm)
        if self.scheduler == "cos":
            return cos_lr(lr, total)
        if self.scheduler == "multistep":
            return multistep_lr(lr, [total * 2 // 3, total * 5 // 6])
        raise ValueError(f"unknown scheduler {self.scheduler}")

    def get_optimizer(self, iters_per_epoch: int):
        from ..train.optim import build_sgd
        return build_sgd(self.get_lr_schedule(iters_per_epoch),
                         momentum=self.momentum,
                         weight_decay=self.weight_decay)

    def get_evaluator(self, dataset=None):
        from ..eval.coco_evaluator import COCOEvaluator
        return COCOEvaluator(dataset or self.get_eval_dataset(),
                             img_size=self.test_size,
                             confthre=self.test_conf,
                             nmsthre=self.nmsthre,
                             num_classes=self.num_classes)

    def get_trainer(self, args=None):
        from ..core.trainer import Trainer
        return Trainer(self, args)

    def random_input_size(self, rng: random.Random) -> Tuple[int, int]:
        """Multiscale candidate (reference random_resize,
        yolox_base.py:205 step 32; video exps override the step to 64,
        exps/TSCD_VID/tscd_base.py:388-392). With jit this selects among
        a small set of pre-compiled programs. Preserves the reference's
        aspect handling: the second dim scales by the size_factor."""
        step = self.multiscale_step
        base = self.input_size[0] // step
        k = rng.randint(base - self.multiscale_range,
                        base + self.multiscale_range)
        size_factor = self.input_size[1] / self.input_size[0]
        return (step * k, step * int(k * size_factor))
