"""Axon-rig multiscale clamp (tscd_tpu/utils/rig.py): train programs at
input sizes >= 704 kernel-fault the tunneled worker (PROFILE.md
§multiscale), and the reference's video multiscale set reaches 768
(/root/reference/exps/TSCD_VID/tscd_base.py:388-392) — the trainers
clamp sampled sizes on the axon backend only."""

import os
import sys

import jax

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tscd_tpu.utils import rig  # noqa: E402


def test_clamp_noop_off_axon():
    # tests run on CPU: the full reference set must pass through
    assert jax.default_backend() != "axon"
    assert rig.clamp_multiscale_size((768, 768)) == (768, 768)
    assert rig.clamp_multiscale_size((704, 704)) == (704, 704)


def test_clamp_on_axon(monkeypatch):
    monkeypatch.setattr(jax, "default_backend", lambda: "axon")
    monkeypatch.setattr(rig, "_warned", False)
    monkeypatch.delenv("TSCD_ALLOW_LARGE_MULTISCALE", raising=False)
    assert rig.clamp_multiscale_size((768, 768)) == (640, 640)
    # aspect preserved, dims stay multiples of 32
    assert rig.clamp_multiscale_size((704, 352)) == (640, 320)
    # in-range draws untouched (never even checks the backend)
    assert rig.clamp_multiscale_size((640, 640)) == (640, 640)
    assert rig.clamp_multiscale_size((384, 384)) == (384, 384)


def test_clamp_env_override(monkeypatch):
    monkeypatch.setattr(jax, "default_backend", lambda: "axon")
    monkeypatch.setenv("TSCD_ALLOW_LARGE_MULTISCALE", "1")
    assert rig.clamp_multiscale_size((768, 768)) == (768, 768)


def test_trainer_sampling_goes_through_clamp(monkeypatch):
    """The trainer-side draw (exp.random_input_size -> clamp) caps at
    640 on axon for the flagship video recipe (576 +-3x64)."""
    import random

    from tscd_tpu.exp.tscd_base import Exp

    monkeypatch.setattr(jax, "default_backend", lambda: "axon")
    monkeypatch.setattr(rig, "_warned", True)
    monkeypatch.delenv("TSCD_ALLOW_LARGE_MULTISCALE", raising=False)
    exp = Exp()
    sizes = {rig.clamp_multiscale_size(
        exp.random_input_size(random.Random(s))) for s in range(64)}
    assert all(max(sz) <= 640 for sz in sizes)
    assert (640, 640) in sizes and min(min(sz) for sz in sizes) >= 384
