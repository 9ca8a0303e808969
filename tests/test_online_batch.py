"""Latency-budgeted online batching (VERDICT r4 next #7):
FrameBatcher flush policy + YOLOVOnline.window ==
K sequential single-frame steps (same outputs, same bank)."""

import numpy as np
import pytest

from tscd_tpu.utils.batcher import FrameBatcher


class FakeClock:
    def __init__(self):
        self.t = 100.0

    def __call__(self):
        return self.t


def test_batcher_flushes_on_size():
    b = FrameBatcher(3, max_wait_ms=1e9)
    assert b.push("a") is None
    assert b.push("b") is None
    assert b.push("c") == ["a", "b", "c"]
    assert len(b) == 0


def test_batcher_flushes_on_age():
    clk = FakeClock()
    b = FrameBatcher(8, max_wait_ms=25.0, clock=clk)
    b.push("a")
    clk.t += 0.010
    b.push("b")
    assert b.poll() is None            # oldest waited 10 ms < 25 ms
    clk.t += 0.016                     # oldest now 26 ms
    assert b.poll() == ["a", "b"]
    assert b.poll() is None


def test_batcher_age_measured_from_oldest():
    clk = FakeClock()
    b = FrameBatcher(8, max_wait_ms=25.0, clock=clk)
    b.push("a")
    for _ in range(3):
        clk.t += 0.010
        b.push("x")                    # newer frames don't reset age
    assert b.poll() == ["a", "x", "x", "x"]


def test_batcher_flush_drains_tail():
    b = FrameBatcher(4)
    b.push(1)
    b.push(2)
    assert b.flush() == [1, 2]
    assert b.flush() is None


def test_batcher_rejects_bad_size():
    with pytest.raises(ValueError):
        FrameBatcher(0)


@pytest.mark.slow
def test_window_matches_sequential_steps(rng):
    import jax
    import jax.numpy as jnp

    from tscd_tpu.models.yolov import YOLOVOnline, yolov_eval_postprocess
    from tscd_tpu.models.yolov_heads import init_online_bank

    H = W = 64
    P, hidden_w = 8, 0.125
    hidden = int(256 * hidden_w)
    model = YOLOVOnline(num_classes=5, depth=0.33, width=hidden_w,
                        num_proposals=P, heads=2)
    bank0 = init_online_bank(4 * P, hidden)
    frames = rng.uniform(0, 255, (6, H, W, 3)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.asarray(frames[:1]), bank0)

    # sequential singles
    bank = bank0
    seq = []
    for f in range(6):
        out = model.apply(variables, jnp.asarray(frames[f:f + 1]), bank)
        bank = out["bank"]
        seq.append(out)
    bank_seq = bank

    # two K=3 windows
    bank = bank0
    w1, bank = model.apply(variables, jnp.asarray(frames[:3]), bank,
                           method=YOLOVOnline.window)
    w2, bank = model.apply(variables, jnp.asarray(frames[3:]), bank,
                           method=YOLOVOnline.window)
    bank_win = bank

    for leaf_s, leaf_w in zip(
            jax.tree_util.tree_leaves(bank_seq),
            jax.tree_util.tree_leaves(bank_win)):
        np.testing.assert_allclose(np.asarray(leaf_s, np.float32),
                                   np.asarray(leaf_w, np.float32),
                                   rtol=1e-4, atol=1e-4)

    win_logits = np.concatenate(
        [np.asarray(w1["refined_cls_logits"]),
         np.asarray(w2["refined_cls_logits"])])
    seq_logits = np.concatenate(
        [np.asarray(o["refined_cls_logits"]) for o in seq])
    np.testing.assert_allclose(win_logits, seq_logits, rtol=1e-4,
                               atol=1e-4)
    np.testing.assert_array_equal(
        np.concatenate([np.asarray(w1["use_refined"]).ravel(),
                        np.asarray(w2["use_refined"]).ravel()]),
        np.asarray([o["use_refined"] for o in seq]))

    # the stacked dict feeds the standard postprocess unchanged
    refined, original = yolov_eval_postprocess(w2, 3, 5)
    assert refined.boxes.shape[0] == 3
