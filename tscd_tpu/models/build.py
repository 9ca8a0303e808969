"""Model factory (reference: yolox/models/build.py create_yolox_model:32
— name -> constructed model; the reference also downloads pretrained
.pth weights, which maps here to tools/convert_weights.py + a local
checkpoint path since this environment has no egress)."""

from typing import Optional

_YOLOX_CFG = {
    "yolox-nano": dict(depth=0.33, width=0.25, depthwise=True),
    "yolox-tiny": dict(depth=0.33, width=0.375),
    "yolox-s": dict(depth=0.33, width=0.50),
    "yolox-m": dict(depth=0.67, width=0.75),
    "yolox-l": dict(depth=1.0, width=1.0),
    "yolox-x": dict(depth=1.33, width=1.25),
}


def create_yolox_model(name: str = "yolox-s", num_classes: int = 80,
                       ckpt_path: Optional[str] = None):
    """Returns (model, variables_or_None). `ckpt_path` (msgpack) loads
    converted weights."""
    from .yolox import YOLOX
    cfg = _YOLOX_CFG[name.lower().replace("_", "-")]
    model = YOLOX(num_classes=num_classes, **cfg)
    variables = None
    if ckpt_path:
        from ..train.checkpoint import load_checkpoint
        variables = load_checkpoint(ckpt_path)
    return model, variables


def create_model(name: str, **kw):
    """Extended registry covering every family in the framework."""
    name = name.lower().replace("_", "-")
    if name.startswith("yolox"):
        return create_yolox_model(name, **kw)[0]
    from .elan import YOLOv7
    from .tscd import TSCD
    from .yolov import YOLOV, YOLOVOnline, YOLOVPlus
    from .yolov8 import YOLOv8
    registry = {
        "tscd": TSCD, "yolov": YOLOV, "yolov++": YOLOVPlus,
        "yolov-plus": YOLOVPlus, "yolov-online": YOLOVOnline,
        "yolov7": YOLOv7, "yolov8": YOLOv8,
    }
    return registry[name](**kw)
