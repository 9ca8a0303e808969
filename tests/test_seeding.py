"""Host-RNG seeding contract: constructing a trainer with exp.seed set
must make the host augmentation RNG stream reproducible (reference
tools/vid_train.py:104-105). Guards the flaky-test class where a
"seeded" run was only device-deterministic while mosaic/HSV draws came
from the unseeded global random/np.random.
"""

import os
import random
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tscd_tpu.utils.seeding import seed_everything


def test_seed_everything_reproduces_host_streams():
    seed_everything(1234)
    a = (random.random(), np.random.uniform(), np.random.randint(0, 99))
    seed_everything(1234)
    b = (random.random(), np.random.uniform(), np.random.randint(0, 99))
    assert a == b
    # None = reference's "not seeded" gate: must not touch the streams
    state_py = random.getstate()
    state_np = np.random.get_state()[1].tobytes()
    seed_everything(None)
    assert random.getstate() == state_py
    assert np.random.get_state()[1].tobytes() == state_np


def test_trainer_ctor_seeds_host_rngs(tmp_path):
    from tscd_tpu.exp.yolox_base import Exp
    from tscd_tpu.core.trainer import Trainer

    def draws_after_ctor():
        exp = Exp()
        exp.seed = 7
        exp.output_dir = str(tmp_path / "out")
        exp.exp_name = "seed_probe"
        Trainer(exp)
        return (random.random(), float(np.random.uniform()))

    random.seed()  # scramble
    np.random.seed()
    first = draws_after_ctor()
    random.seed()
    np.random.seed()
    second = draws_after_ctor()
    assert first == second
