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
