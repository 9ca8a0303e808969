"""Golden parity tests: our flax blocks vs the reference's pure-torch
blocks (loaded directly from /root/reference — skipped when absent).

These validate the risky numerics end to end through weight conversion:
conv padding, BN eps/momentum, SiLU, Focus channel order, CSP wiring.
"""

import importlib.util
import os
import sys

import numpy as np
import pytest

REF = "/root/reference/yolox/models"

pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference repo not mounted")

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def refmods():
    """Load reference network_blocks + darknet as a standalone package."""
    import types
    pkg = types.ModuleType("refmodels")
    pkg.__path__ = [REF]
    sys.modules["refmodels"] = pkg
    out = {}
    for name in ["network_blocks", "darknet"]:
        spec = importlib.util.spec_from_file_location(
            f"refmodels.{name}", os.path.join(REF, f"{name}.py"))
        mod = importlib.util.module_from_spec(spec)
        sys.modules[f"refmodels.{name}"] = mod
        spec.loader.exec_module(mod)
        out[name] = mod
    return out


def to_flax(torch_module):
    from tscd_tpu.utils.convert import torch_to_flax
    sd = {k: v.detach().cpu().numpy()
          for k, v in torch_module.state_dict().items()}
    return torch_to_flax(sd)


def run_torch(mod, x_nchw):
    mod.eval()
    with torch.no_grad():
        return mod(torch.from_numpy(x_nchw))


def test_baseconv_parity(refmods):
    import jax.numpy as jnp
    from tscd_tpu.models.blocks import BaseConv

    tm = refmods["network_blocks"].BaseConv(8, 16, ksize=3, stride=2)
    x = np.random.default_rng(0).normal(size=(2, 8, 10, 10)).astype(np.float32)
    ref = run_torch(tm, x).numpy()

    fm = BaseConv(16, 3, 2)
    variables = to_flax(tm)
    y = fm.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(y).transpose(0, 3, 1, 2), ref,
                               rtol=1e-4, atol=1e-4)


def test_csplayer_parity(refmods):
    import jax.numpy as jnp
    from tscd_tpu.models.blocks import CSPLayer

    tm = refmods["network_blocks"].CSPLayer(16, 16, n=2)
    x = np.random.default_rng(1).normal(size=(1, 16, 8, 8)).astype(np.float32)
    ref = run_torch(tm, x).numpy()

    fm = CSPLayer(16, n=2)
    y = fm.apply(to_flax(tm), jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(y).transpose(0, 3, 1, 2), ref,
                               rtol=1e-4, atol=1e-4)


def test_focus_parity(refmods):
    import jax.numpy as jnp
    from tscd_tpu.models.blocks import Focus

    tm = refmods["network_blocks"].Focus(3, 16, ksize=3)
    x = np.random.default_rng(2).normal(size=(1, 3, 16, 16)).astype(np.float32)
    ref = run_torch(tm, x).numpy()

    fm = Focus(16, ksize=3)
    y = fm.apply(to_flax(tm), jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(y).transpose(0, 3, 1, 2), ref,
                               rtol=1e-4, atol=1e-4)


def test_spp_parity(refmods):
    import jax.numpy as jnp
    from tscd_tpu.models.blocks import SPPBottleneck

    tm = refmods["network_blocks"].SPPBottleneck(32, 32)
    x = np.random.default_rng(3).normal(size=(1, 32, 16, 16)).astype(np.float32)
    ref = run_torch(tm, x).numpy()

    fm = SPPBottleneck(32)
    y = fm.apply(to_flax(tm), jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(y).transpose(0, 3, 1, 2), ref,
                               rtol=1e-4, atol=1e-4)


def test_cspdarknet_parity(refmods):
    import jax.numpy as jnp
    from tscd_tpu.models.darknet import CSPDarknet

    tm = refmods["darknet"].CSPDarknet(dep_mul=0.33, wid_mul=0.25)
    x = np.random.default_rng(4).normal(size=(1, 3, 64, 64)).astype(np.float32)
    tm.eval()
    with torch.no_grad():
        ref = tm(torch.from_numpy(x))

    fm = CSPDarknet(dep_mul=0.33, wid_mul=0.25)
    out = fm.apply(to_flax(tm), jnp.asarray(x.transpose(0, 2, 3, 1)))
    for key in ["dark3", "dark4", "dark5"]:
        np.testing.assert_allclose(
            np.asarray(out[key]).transpose(0, 3, 1, 2), ref[key].numpy(),
            rtol=1e-3, atol=1e-3)
