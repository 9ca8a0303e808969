"""Optimizer construction (reference: yolox/exp/yolox_base.py:237 and
exps/TSCD_VID/vid_tscd_large.py:157).

The reference builds 3-4 SGD param groups: BN params and biases get no
weight decay; conv/linear weights get 5e-4; TSCD adds a reduced-LR group
(stem_lr_ratio) for the frozen-adjacent towers. Here groups are expressed
with optax.multi_transform over a param-path labelling function, and the
schedule multiplies inside sgd via inject_hyperparams.
"""

from typing import Callable, Dict, Optional, Sequence

import jax
import optax
from flax import traverse_util


def _label_params(params, freeze_prefixes: Sequence[str],
                  stem_lr_prefixes: Sequence[str]):
    """Label each param leaf: 'frozen' | 'weight' | 'no_decay' |
    'stem_weight' | 'stem_no_decay'."""
    flat = traverse_util.flatten_dict(params)
    labels = {}
    for path, _ in flat.items():
        spath = "/".join(str(p) for p in path)
        frozen = any(spath.startswith(p) for p in freeze_prefixes)
        stem = any(spath.startswith(p) for p in stem_lr_prefixes)
        # BN scales/biases and all biases skip weight decay
        # (yolox_base.py:243-253)
        leaf = str(path[-1])
        parent = str(path[-2]) if len(path) > 1 else ""
        no_decay = (leaf == "bias" or parent == "bn"
                    or leaf in ("scale",))
        if frozen:
            labels[path] = "frozen"
        elif stem:
            labels[path] = "stem_no_decay" if no_decay else "stem_weight"
        else:
            labels[path] = "no_decay" if no_decay else "weight"
    return traverse_util.unflatten_dict(labels)


def build_sgd(schedule: Callable, momentum: float = 0.9,
              weight_decay: float = 5e-4, nesterov: bool = True,
              freeze_prefixes: Sequence[str] = (),
              stem_lr_prefixes: Sequence[str] = (),
              stem_lr_ratio: float = 1.0,
              clip_grad_norm: Optional[float] = 35.0
              ) -> optax.GradientTransformation:
    """SGD with param groups. `schedule` maps step -> lr.

    `clip_grad_norm` guards against the loss-spike blowups the reference
    absorbs via its fp16 GradScaler inf-step skipping (tscd_trainer.py
    autocast+GradScaler); bf16 training has no scaler, so a global-norm
    clip is the equivalent safety. None disables."""

    def sgd(decay, ratio):
        chain = []
        if decay:
            chain.append(optax.add_decayed_weights(weight_decay))
        chain.append(optax.sgd(lambda i: schedule(i) * ratio,
                               momentum=momentum, nesterov=nesterov))
        return optax.chain(*chain)

    transforms = {
        "weight": sgd(True, 1.0),
        "no_decay": sgd(False, 1.0),
        "stem_weight": sgd(True, stem_lr_ratio),
        "stem_no_decay": sgd(False, stem_lr_ratio),
        "frozen": optax.set_to_zero(),
    }
    label_fn = lambda params: _label_params(
        params, tuple(freeze_prefixes), tuple(stem_lr_prefixes))
    tx = optax.multi_transform(transforms, label_fn)
    if clip_grad_norm is not None:
        # zero frozen-param grads BEFORE the global-norm clip: frozen
        # grads don't exist at all in the reference (requires_grad=
        # False), so they must not inflate the clip norm. This also
        # makes the stop_backbone_grad fast path update-identical
        # (tests/test_remat.py::test_stop_backbone_grad_same_updates).
        zero_frozen = optax.multi_transform(
            {"weight": optax.identity(), "no_decay": optax.identity(),
             "stem_weight": optax.identity(),
             "stem_no_decay": optax.identity(),
             "frozen": optax.set_to_zero()},
            label_fn)
        tx = optax.chain(zero_frozen,
                         optax.clip_by_global_norm(clip_grad_norm), tx)
    return tx
