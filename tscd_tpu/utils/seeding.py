"""Global-RNG seeding for reproducible training (reference:
tools/vid_train.py:104-105 / tools/train.py — `random.seed(exp.seed)`
+ `torch.manual_seed(exp.seed)` when exp.seed is not None).

The JAX model init is already seeded via PRNGKey(exp.seed), but the
HOST-side augmentation pipeline (mosaic/mixup/perspective/HSV in
data/transforms.py + data/coco.py) draws from the global `random` and
`np.random` modules exactly like the reference's — without this call a
"seeded" training run is only device-deterministic, and tiny-dataset
mAPs vary run to run (caught by a flaky test_int8_trained run).
"""

import random

import numpy as np


def seed_everything(seed) -> None:
    """Seed the host RNGs the data pipeline draws from. No-op when seed
    is None (the reference's gate, vid_train.py:103)."""
    if seed is None:
        return
    random.seed(int(seed))
    np.random.seed(int(seed) & 0xFFFFFFFF)
