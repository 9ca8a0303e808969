"""Rig-specific safety guards (axon-tunneled TPU worker).

The axon worker kernel-faults on stage-2 TRAIN programs at input sizes
>= 704 (PROFILE.md §multiscale: 704/768 @ F=16 crash it at first
execution; recovery ~15 min with every TPU call hanging meanwhile).
The reference's video multiscale recipe is 576 ± 3×64 = 384..768
(/root/reference/exps/TSCD_VID/tscd_base.py:388-392), so a user who
flips `enable_multiscale True` on this rig would draw a faulting size
within a few 10-iter resamples. `clamp_multiscale_size` shrinks a
sampled size to the known-safe maximum ON THE AXON BACKEND ONLY —
other platforms (CPU, non-tunneled TPU VMs) keep the full reference
set, and `TSCD_ALLOW_LARGE_MULTISCALE=1` disables the guard (re-probe
with tools/measure_multiscale_cost.py after a libtpu upgrade).
"""

import os

# largest multiscale size measured stable on the axon worker
# (PROFILE.md §multiscale: 640 runs, 704 faults)
MAX_AXON_TRAIN_SIZE = 640

_warned = False


def clamp_multiscale_size(size):
    """Clamp an (h, w) multiscale draw on the axon backend.

    Shrinks proportionally so the larger dim lands on
    MAX_AXON_TRAIN_SIZE, rounding both dims down to multiples of 32
    (the input-size contract). No-op off-axon, under
    TSCD_ALLOW_LARGE_MULTISCALE=1, or when already in range.
    """
    global _warned
    if max(size) <= MAX_AXON_TRAIN_SIZE:
        return size
    if os.environ.get("TSCD_ALLOW_LARGE_MULTISCALE") == "1":
        return size
    try:
        import jax
        platform = jax.default_backend()
    except Exception:
        return size
    if platform != "axon":
        return size
    m = max(size)  # integer math: no float-rounding cliff at exact fits
    clamped = tuple(max((s * MAX_AXON_TRAIN_SIZE // m) // 32 * 32, 32)
                    for s in size)
    if not _warned:
        _warned = True
        print(f"[rig] multiscale size {tuple(size)} clamped to {clamped}: "
              f"train programs >= 704px kernel-fault the axon worker "
              f"(PROFILE.md §multiscale). Set TSCD_ALLOW_LARGE_MULTISCALE=1 "
              f"to disable after re-probing a new libtpu.")
    return clamped
