"""Experiment (config) base class (reference: yolox/exp/base_exp.py:17).

Plain-attribute config objects with builder methods, selected by python
file path, subclassed to override. The reference's third config layer —
an untyped kwargs dict threaded into the head (`more_args`) — is
deliberately absent: every knob is a declared attribute here, so typos
fail loudly instead of silently hitting a `.get(...)` default.
"""

import ast
from abc import ABCMeta, abstractmethod
from typing import Dict, List, Sequence


class BaseExp(metaclass=ABCMeta):
    seed = None
    output_dir = "./YOLOX_outputs"
    print_interval = 100
    eval_interval = 1

    @abstractmethod
    def get_model(self):
        pass

    def merge(self, cfg_list: Sequence[str]):
        """CLI `key value` override pairs, type-coerced to the existing
        attribute's type (reference base_exp.py:63)."""
        assert len(cfg_list) % 2 == 0, "override list must be key/value pairs"
        for k, v in zip(cfg_list[0::2], cfg_list[1::2]):
            if k.startswith("--"):
                k = k[2:]
            if not hasattr(self, k):
                raise AttributeError(f"unknown exp attribute {k!r}")
            src_value = getattr(self, k)
            if src_value is not None and not isinstance(src_value, str):
                try:
                    v = ast.literal_eval(v)
                except (ValueError, SyntaxError):
                    pass
                if src_value is not None:
                    v = type(src_value)(v)
            setattr(self, k, v)
        return self

    def attrs(self) -> Dict:
        return {k: getattr(self, k) for k in dir(self)
                if not k.startswith("_")
                and not callable(getattr(self, k))}

    def __repr__(self):
        rows = [f"{'key':<24} value", "-" * 40]
        rows += [f"{k:<24} {v}" for k, v in sorted(self.attrs().items())]
        return "\n".join(rows)
