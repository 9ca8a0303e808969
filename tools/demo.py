"""Still-image/video YOLOX demo CLI (reference: tools/demo.py)."""

import argparse
import os
import sys
import time

import cv2
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from tscd_tpu.exp import get_exp

IMAGE_EXT = [".jpg", ".jpeg", ".webp", ".bmp", ".png"]

COCO_CLASSES = (
    "person", "bicycle", "car", "motorcycle", "airplane", "bus", "train",
    "truck", "boat", "traffic light", "fire hydrant", "stop sign",
    "parking meter", "bench", "bird", "cat", "dog", "horse", "sheep",
    "cow", "elephant", "bear", "zebra", "giraffe", "backpack", "umbrella",
    "handbag", "tie", "suitcase", "frisbee", "skis", "snowboard",
    "sports ball", "kite", "baseball bat", "baseball glove", "skateboard",
    "surfboard", "tennis racket", "bottle", "wine glass", "cup", "fork",
    "knife", "spoon", "bowl", "banana", "apple", "sandwich", "orange",
    "broccoli", "carrot", "hot dog", "pizza", "donut", "cake", "chair",
    "couch", "potted plant", "bed", "dining table", "toilet", "tv",
    "laptop", "mouse", "remote", "keyboard", "cell phone", "microwave",
    "oven", "toaster", "sink", "refrigerator", "book", "clock", "vase",
    "scissors", "teddy bear", "hair drier", "toothbrush")


def make_parser():
    parser = argparse.ArgumentParser("YOLOX-TPU demo")
    parser.add_argument("demo", default="image",
                        help="image, video or webcam")
    parser.add_argument("-n", "--name", type=str, default=None)
    parser.add_argument("-f", "--exp_file", type=str, default=None)
    parser.add_argument("-c", "--ckpt", type=str, default=None)
    parser.add_argument("--path", type=str, default="./assets/dog.jpg")
    parser.add_argument("--conf", type=float, default=0.3)
    parser.add_argument("--nms", type=float, default=0.45)
    parser.add_argument("--tsize", type=int, default=None)
    parser.add_argument("--save_result", action="store_true")
    parser.add_argument("--int8", action="store_true",
                        help="w8a8 int8 serving mode (dynamic "
                        "activation scales; models/blocks.py int8_eval)")
    parser.add_argument("opts", nargs="*")
    return parser


def get_image_list(path):
    image_names = []
    for maindir, _, file_name_list in os.walk(path):
        for filename in file_name_list:
            if os.path.splitext(filename)[1].lower() in IMAGE_EXT:
                image_names.append(os.path.join(maindir, filename))
    return image_names


class Predictor:
    def __init__(self, exp, ckpt_path=None, conf=0.3, nms=0.45):
        import jax
        import jax.numpy as jnp

        from tscd_tpu.data.transforms import letterbox
        from tscd_tpu.ops.postprocess import postprocess_dense_batch
        from tscd_tpu.train.checkpoint import (load_checkpoint,
                                               load_tolerant)
        self.exp = exp
        self.letterbox = letterbox
        self.model = exp.get_model()
        H, W = exp.test_size
        variables = self.model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3), jnp.float32),
            False, False)
        if ckpt_path:
            restored = load_checkpoint(ckpt_path)
            variables = {
                "params": load_tolerant(variables["params"],
                                        restored.get("params", restored)),
                "batch_stats": load_tolerant(
                    variables.get("batch_stats", {}),
                    restored.get("batch_stats", {}))}
        self.variables = variables
        model = self.model
        C = exp.num_classes

        @jax.jit
        def fwd(variables, x):
            out = model.apply(variables, x, False, True)
            return postprocess_dense_batch(out["decoded"], C, conf, nms,
                                           100)

        self.fwd = fwd
        self.jnp = jnp

    def inference(self, img):
        import jax
        padded, r = self.letterbox(img, self.exp.test_size)
        t0 = time.time()
        d = self.fwd(self.variables, self.jnp.asarray(padded[None]))
        d = jax.tree_util.tree_map(np.asarray, d)
        infer_time = time.time() - t0
        m = d.mask[0]
        boxes = d.boxes[0][m] / r
        scores = (d.obj[0] * d.score[0])[m]
        cls_ids = d.cls_id[0][m]
        return boxes, scores, cls_ids, infer_time


def main():
    from tscd_tpu.utils.visualize import vis

    args = make_parser().parse_args()
    if getattr(args, "int8", False):
        from tscd_tpu.models.blocks import set_int8_eval
        set_int8_eval(True)
    exp = get_exp(args.exp_file, args.name)
    exp.merge(args.opts)
    if args.tsize:
        exp.test_size = (args.tsize, args.tsize)
    predictor = Predictor(exp, args.ckpt, args.conf, args.nms)
    save_dir = os.path.join(exp.output_dir, exp.exp_name, "vis_res")

    if args.demo == "image":
        files = ([args.path] if os.path.isfile(args.path)
                 else get_image_list(args.path))
        for f in files:
            img = cv2.imread(f)
            boxes, scores, cls_ids, dt = predictor.inference(img)
            print(f"{f}: {len(boxes)} dets in {dt * 1000:.1f} ms")
            out = vis(img, boxes, scores, cls_ids, args.conf, COCO_CLASSES)
            if args.save_result:
                os.makedirs(save_dir, exist_ok=True)
                cv2.imwrite(os.path.join(save_dir, os.path.basename(f)),
                            out)
    elif args.demo in ("video", "webcam"):
        cap = cv2.VideoCapture(
            args.path if args.demo == "video" else 0)
        writer = None
        while True:
            ret, frame = cap.read()
            if not ret:
                break
            boxes, scores, cls_ids, _ = predictor.inference(frame)
            out = vis(frame, boxes, scores, cls_ids, args.conf,
                      COCO_CLASSES)
            if args.save_result:
                if writer is None:
                    os.makedirs(save_dir, exist_ok=True)
                    writer = cv2.VideoWriter(
                        os.path.join(save_dir, "out.mp4"),
                        cv2.VideoWriter_fourcc(*"mp4v"),
                        cap.get(cv2.CAP_PROP_FPS) or 25,
                        (out.shape[1], out.shape[0]))
                writer.write(out)
        if writer is not None:
            writer.release()


if __name__ == "__main__":
    main()
