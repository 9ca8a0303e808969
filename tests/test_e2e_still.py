"""End-to-end still-image integration: synthetic COCO dataset -> exp ->
Trainer (mosaic loader, jitted step) -> COCOEvaluator."""

import json
import os
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _make_coco(root, n_imgs=8, size=(96, 128), n_categories=2):
    import cv2
    h, w = size
    os.makedirs(os.path.join(root, "train2017"), exist_ok=True)
    images, annotations = [], []
    ann_id = 1
    for i in range(n_imgs):
        fn = f"{i:012d}.jpg"
        img = np.full((h, w, 3), 80, np.uint8)
        x0, y0 = 15 + 3 * i, 10 + 2 * i
        cv2.rectangle(img, (x0, y0), (x0 + 40, y0 + 30),
                      (255, 255, 255), -1)
        cv2.imwrite(os.path.join(root, "train2017", fn), img)
        images.append({"id": i, "file_name": fn, "width": w, "height": h})
        annotations.append({
            "id": ann_id, "image_id": i, "category_id": 1,
            "bbox": [x0, y0, 40, 30], "area": 1200, "iscrowd": 0})
        ann_id += 1
    os.makedirs(os.path.join(root, "annotations"), exist_ok=True)
    coco = {"images": images, "annotations": annotations,
            "categories": [{"id": c + 1, "name": f"cat{c}"}
                           for c in range(n_categories)]}
    for name in ("instances_train2017.json", "instances_val2017.json"):
        with open(os.path.join(root, "annotations", name), "w") as f:
            json.dump(coco, f)
    return root


def test_yolox_grad_accum_matches_chunk_mean_oracle():
    """grad_accum=2 on the still-image step == hand-rolled mean of the
    two half-batch plain steps (with plain SGD every state field —
    params, BN stats, EMA, losses — is LINEAR in the gradient/stats, so
    averaging the two half-batch step results is an exact oracle for
    the accumulated step; BN normalizing per chunk is the intended
    semantics, train/step.py scan_accum_value_and_grad)."""
    import jax
    import jax.numpy as jnp
    import optax

    from tscd_tpu.models.yolox import YOLOX
    from tscd_tpu.train.step import (init_train_state,
                                     make_yolox_train_step)

    model = YOLOX(num_classes=2, depth=0.33, width=0.125)
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.uniform(0, 255, (4, 96, 128, 3)), jnp.float32)
    labels = np.zeros((4, 10, 5), np.float32)
    for b in range(4):
        labels[b, 0] = [1, 40 + b, 30 + b, 36, 28]
        labels[b, 1] = [0, 90 - b, 60, 24, 20]
    labels = jnp.asarray(labels)

    variables = model.init(jax.random.PRNGKey(0), imgs, False, False)
    tx = optax.sgd(0.01)
    state = init_train_state(variables, tx)

    step_acc = jax.jit(make_yolox_train_step(model, tx, grad_accum=2))
    step_plain = jax.jit(make_yolox_train_step(model, tx))

    s_acc, l_acc = step_acc(state, imgs, labels)
    s_a, l_a = step_plain(state, imgs[:2], labels[:2])
    s_b, l_b = step_plain(state, imgs[2:], labels[2:])

    def mean_tree(ta, tb):
        return jax.tree_util.tree_map(lambda x, y: (x + y) / 2, ta, tb)

    def close(t_got, t_want, what):
        la, _ = jax.tree_util.tree_flatten(t_got)
        lb, _ = jax.tree_util.tree_flatten(t_want)
        for x, y in zip(la, lb):
            np.testing.assert_allclose(
                np.asarray(x), np.asarray(y), rtol=2e-5, atol=1e-6,
                err_msg=what)

    close(s_acc.params, mean_tree(s_a.params, s_b.params), "params")
    close(s_acc.batch_stats, mean_tree(s_a.batch_stats, s_b.batch_stats),
          "batch_stats")
    close(s_acc.ema_params, mean_tree(s_a.ema_params, s_b.ema_params),
          "ema")
    close(l_acc, mean_tree(l_a, l_b), "losses")


@pytest.mark.slow
def test_yolox_end_to_end_train_and_eval(tmp_path):
    root = _make_coco(str(tmp_path / "coco"))
    exp_file = tmp_path / "tiny_yolox_exp.py"
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
        self.data_dir = {root!r}
        self.train_name = self.val_name = "train2017"
        self.output_dir = {str(tmp_path / "out")!r}
        self.exp_name = "tiny_still_e2e"
        self.enable_mixup = False
        self.mosaic_prob = 0.5
        self.seed = 0
""")
    from tscd_tpu.exp import get_exp
    exp = get_exp(str(exp_file))
    trainer = exp.get_trainer(None)
    state = trainer.train()
    assert int(state.step) >= 2
    ap = trainer.evaluate()
    assert isinstance(ap, float)
