"""Conv primitives for the detection core.

TPU-native counterparts of the reference block zoo
(`/root/reference/yolox/models/network_blocks.py`): BaseConv (conv->BN->act,
network_blocks.py:36), DWConv (:64), Bottleneck (:158), ResLayer (:183),
SPPBottleneck (:201), CSPLayer (:226), Focus (:267), ResNetBottleneck (:292).

Design notes (TPU-first):
- NHWC layout (XLA's preferred conv layout on TPU; the MXU consumes the
  channel dim as the contraction axis for 1x1 convs).
- Compute dtype is configurable (bf16 by default in model configs); BN runs
  in fp32 for stability, params are fp32.
- BN folding for inference: see `tscd_tpu.utils.model_utils.
  fuse_conv_bn_params` which produces a bias-ful conv and drops BN
  entirely — the equivalent of the reference's `fuseforward` deploy path.
"""

import contextlib
import contextvars
import os
from typing import (Any, Callable, NamedTuple, Optional, Sequence,
                    Tuple)

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Dtype = Any


# --- int8 (w8a8) inference mode --------------------------------------
# Trace-time toggle: BaseConv lowers its eval path to an int8 MXU conv
# while the flag is on (see BaseConv._int8_forward). The flag is read
# when the model is TRACED, so wrap the jit/apply call:
#     with int8_eval():
#         fn = jax.jit(model.apply); out = fn(variables, x)
# (or set TSCD_INT8_EVAL=1 for tools). Param/variable trees are
# unchanged — the same checkpoint serves both precisions.
#
# CAVEAT (jit cache): jax.jit caches by function identity + argument
# shapes, NOT by this flag. A function already compiled with the flag
# off will keep running fp even if called inside int8_eval() — create
# the jitted function (or at least trigger its first call) INSIDE the
# context, as above.
#
# The whole mode lives in ONE ContextVar holding an immutable tuple:
# concurrent traces (threaded test runners, a multi-threaded server
# tracing fp and int8 programs at once) each see their own context's
# mode instead of racing on module globals.
class _Int8Mode(NamedTuple):
    enable: bool = False
    static: bool = False
    calibrate: bool = False
    scope: Optional[Tuple[Tuple[str, ...], ...]] = None
    qat: bool = False


_INT8_MODE: "contextvars.ContextVar[_Int8Mode]" = contextvars.ContextVar(
    "tscd_int8_mode", default=_Int8Mode(
        enable=os.environ.get("TSCD_INT8_EVAL", "0") == "1",
        static=os.environ.get("TSCD_INT8_STATIC", "0") == "1"))

# Only quantize convs with C_in >= this (mode-dependent). DYNAMIC
# scales pay a per-call max pass over the activation, so
# large-spatial few-channel convs lose: dark2 (C 64-128 at 288px)
# runs 4.6 ms int8-dynamic vs 2.7 ms bf16, dark3+ (C >= 128) win
# (tools/profile_backbone.py). STATIC calibrated scales have no max
# pass, and dark2 then wins too: the full TSCD step measures 1090 fps
# at min_cin 32 vs 1065 at 128 (bench.py).
INT8_MIN_CIN = int(os.environ.get("TSCD_INT8_MIN_CIN", "128"))
INT8_MIN_CIN_STATIC = int(os.environ.get("TSCD_INT8_MIN_CIN_STATIC",
                                         "32"))


def _int8_min_cin() -> int:
    # calibration must cover every layer the static trace will use
    mode = _INT8_MODE.get()
    return (INT8_MIN_CIN_STATIC if (mode.static or mode.calibrate)
            else INT8_MIN_CIN)


# Activation-scale modes (fields of _Int8Mode): dynamic (default —
# per-tensor max computed in-program every call), calibrate (dynamic +
# record the running max into a `quant` variable collection; apply with
# mutable=["quant"]), static (read the calibrated scale from the
# `quant` collection — no per-call max pass, deterministic latency).
# `qat`: fake-quant in float with straight-through-estimator gradients —
# same quantization noise as the int8 path but differentiable, so a
# fix_bn training step can fine-tune weights against it (then serve
# through the real int8 path). `scope`: optional module-path prefixes;
# only BaseConvs under one of them quantize — used by the stage-2
# trainers to run the FROZEN backbone in int8 while the trained video
# head stays fp.


def _ste_round(v: jax.Array) -> jax.Array:
    """round() with a straight-through gradient (identity backward)."""
    return v + jax.lax.stop_gradient(jnp.round(v) - v)


def int8_eval_enabled() -> bool:
    return _INT8_MODE.get().enable


def set_int8_eval(enable: bool) -> None:
    """Sticky (non-scoped) toggle for CLI tools; affects only the
    current thread/context (the mode is a ContextVar)."""
    _INT8_MODE.set(_INT8_MODE.get()._replace(enable=bool(enable)))


@contextlib.contextmanager
def int8_eval(enable: bool = True, static: bool = False,
              calibrate: bool = False, scope=None, qat: bool = False):
    """Trace-time int8 serving mode. `calibrate=True` records per-layer
    activation maxima into the mutable `quant` collection; a later
    `static=True` trace consumes them instead of computing dynamic
    scales (see quantize_int8() for the one-call helper). `scope`
    restricts quantization to modules under the given flax path
    prefixes, e.g. scope=(("backbone",),) for a frozen-backbone train
    step. `qat=True` swaps the int8 conv for differentiable fake-quant
    (STE) so a fix_bn train step can fine-tune against quantization
    noise."""
    token = _INT8_MODE.set(_Int8Mode(
        enable=bool(enable), static=bool(static),
        calibrate=bool(calibrate),
        scope=(tuple(tuple(p) for p in scope)
               if scope is not None else None),
        qat=bool(qat)))
    try:
        yield
    finally:
        _INT8_MODE.reset(token)


def _int8_in_scope(module: nn.Module) -> bool:
    scope = _INT8_MODE.get().scope
    if scope is None:
        return True
    path = tuple(module.scope.path) if module.scope is not None else ()
    return any(path[:len(p)] == p for p in scope)


def quantize_int8(apply_fn, variables, *sample_args, **apply_kwargs):
    """Calibrate static int8 activation scales: run `apply_fn`
    (signature like model.apply) on sample data inside the calibrate
    context and return `variables` with the populated `quant`
    collection merged in. Serve with `int8_eval(static=True)`."""
    with int8_eval(calibrate=True):
        _, muts = apply_fn(variables, *sample_args,
                           mutable=["quant"], **apply_kwargs)
    return {**variables, "quant": muts["quant"]}


def quantize_int8_scan(apply_fn, variables, *stacked_args):
    """Serving-shape calibration as a chunked `lax.scan` carrying ONE
    maxima tree.

    `apply_fn(variables, *chunk_args)` must run the model with
    `mutable=["quant"]` and return `(out, muts)`; each element of
    `stacked_args` carries a leading chunk axis. The scan body runs the
    calibrate trace on one chunk and folds its per-layer activation
    maxima into the carry, so the compiled program has a single
    maxima-tree output no matter how many frames are calibrated.

    Why: the flat calibrate program at the full serving window
    (F=32@576 — ~70 mutable max-reduction outputs on top of the whole
    eval forward) kernel-faults this TPU worker. Quantized convs are
    all per-frame (aggregation/matcher layers are Linears the int8 path
    never touches), so a frame-chunked max-fold is EXACT: max over
    chunks == max over the full window (equality pinned by
    tests/test_int8_scan_calib.py). Returns `variables` with the
    populated `quant` collection; serve with `int8_eval(static=True)`.
    """
    first = jax.tree_util.tree_map(lambda a: a[0], stacked_args)
    with int8_eval(calibrate=True):
        shapes = jax.eval_shape(
            lambda v, a: apply_fn(v, *a)[1]["quant"], variables, first)
        init = jax.tree_util.tree_map(
            lambda s: jnp.zeros(s.shape, s.dtype), shapes)

        def body(carry, chunk):
            _, muts = apply_fn(variables, *chunk)
            return jax.tree_util.tree_map(jnp.maximum, carry,
                                          muts["quant"]), None

        carry, _ = jax.lax.scan(body, init, stacked_args)
    return {**variables, "quant": carry}


def get_activation(name: str = "silu") -> Callable[[jax.Array], jax.Array]:
    if name in ("silu", "swish"):
        return jax.nn.silu
    if name == "relu":
        return jax.nn.relu
    if name == "lrelu":
        return lambda x: jax.nn.leaky_relu(x, negative_slope=0.1)
    if name in ("id", "identity", None):
        return lambda x: x
    raise ValueError(f"Unsupported act type: {name}")


class BaseConv(nn.Module):
    """Conv2d -> BatchNorm -> activation, 'same' padding for odd kernels."""

    out_channels: int
    ksize: int
    stride: int = 1
    groups: int = 1
    act: str = "silu"
    dtype: Dtype = jnp.float32
    use_bias: bool = False  # True only after BN folding

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False,
                 valid: bool = False) -> jax.Array:
        """`valid=True` runs the SAME parameters with VALID padding —
        used by the sparse proposal-patch tower path (models/
        sparse_towers.py), where 'same' zero-padding semantics are
        reproduced by masking out-of-map patch positions instead."""
        pad = 0 if valid else (self.ksize - 1) // 2
        if (int8_eval_enabled() and not train and self.groups == 1
                and x.shape[-1] >= _int8_min_cin()
                and _int8_in_scope(self)):
            return self._int8_forward(x, pad)
        x = nn.Conv(
            features=self.out_channels,
            kernel_size=(self.ksize, self.ksize),
            strides=(self.stride, self.stride),
            padding=[(pad, pad), (pad, pad)],
            feature_group_count=self.groups,
            use_bias=self.use_bias,
            dtype=self.dtype,
            name="conv",
        )(x)
        if not self.use_bias:
            # fp32 batch norm; eps/momentum match the reference's torch defaults
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9,
                epsilon=1e-5,
                dtype=jnp.float32,
                name="bn",
            )(x)
            x = x.astype(self.dtype)
        return get_activation(self.act)(x)

    def _int8_forward(self, x: jax.Array, pad: int) -> jax.Array:
        """w8a8 serving path (inside `int8_eval()`): BN folded into the
        kernel, per-OUTPUT-CHANNEL symmetric int8 weights, per-tensor
        DYNAMIC symmetric int8 activations (scale = max|x|/127 computed
        in-program — no calibration pass needed), int32 accumulation on
        the MXU (~2x bf16 peak on v5e), dequant + bias + activation as
        the fused epilogue. Variable tree is identical to the fp path
        (conv/kernel [+bias], bn/*), so any checkpoint runs unchanged.

        No reference counterpart (the reference serves fp16,
        demo/TensorRT/README.md); TPU-native serving extension."""
        C_in = x.shape[-1]
        w, b = _ConvParams((self.ksize, self.ksize, C_in,
                            self.out_channels), self.use_bias,
                           name="conv")()
        if not self.use_bias:
            gamma, beta, mean, var = _BNStats(self.out_channels,
                                              name="bn")()
            s = gamma / jnp.sqrt(var + 1e-5)
            w_eff = w * s[None, None, None]
            b_eff = beta - mean * s
        else:
            w_eff = w
            b_eff = b if b is not None else jnp.zeros(
                (self.out_channels,), jnp.float32)
        xf = x.astype(jnp.float32)
        mode = _INT8_MODE.get()
        if (mode.static and not mode.calibrate
                and not self.has_variable("quant", "act_scale")):
            raise ValueError(
                "int8_eval(static=True) needs calibrated activation "
                "scales: run quantize_int8(model.apply, variables, "
                "*sample_batch) first and pass its returned variables "
                "(with the 'quant' collection) to apply")
        if mode.static or mode.calibrate:
            # per-INPUT-CHANNEL calibrated activation maxima: outlier
            # channels get their own range, and the channel scales fold
            # into the weight's C_in axis at trace time, so the static
            # path pays nothing at runtime for the finer granularity
            act_scale = self.variable(
                "quant", "act_scale",
                lambda: jnp.zeros((C_in,), jnp.float32))
        if mode.static and not mode.calibrate:
            # SmoothQuant-style equalization: migrate HALF of each
            # channel's range disparity into the weights (e_c =
            # sqrt(s_c / gmean)), then quantize the equalized
            # activation per-tensor. Outlier channels stop dominating
            # the activation range without making their weight rows
            # dominate the per-cout weight range. No per-call max
            # pass; all folds are on (C,) vectors and the kernel.
            s_c = jnp.maximum(act_scale.value, 1e-8)  # (C_in,)
            e_c = jnp.sqrt(s_c / jnp.exp(jnp.mean(jnp.log(s_c))))
            e_c = jnp.clip(e_c, 1.0 / 16, 16.0)
            s_t = jnp.max(s_c / e_c)      # scalar per-tensor scale
            x_scale = e_c * s_t           # (C_in,) per-channel
            w_eff = w_eff * e_c[None, None, :, None]
            s_x = s_t
        else:
            s_x = jnp.maximum(jnp.max(jnp.abs(xf)), 1e-8) / 127.0
            x_scale = s_x
        s_w = jnp.maximum(jnp.max(jnp.abs(w_eff), axis=(0, 1, 2)),
                          1e-8) / 127.0
        dims = dict(window_strides=(self.stride, self.stride),
                    padding=[(pad, pad), (pad, pad)],
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if mode.calibrate:
            # PTQ observer pass: record per-input-channel maxima of the
            # FP activations and run the FP (BN-folded) conv forward —
            # NOT the quantized one. Observing fp activations is the
            # standard PTQ contract, and it makes calibration exactly
            # batch/window-size-invariant (a quantized calibration
            # forward would let the batch-wide dynamic scale leak chunk
            # size into downstream maxima — quantize_int8_scan's
            # chunked==full equality test pins this).
            axes = tuple(range(xf.ndim - 1))
            act_scale.value = jnp.maximum(
                act_scale.value,
                jnp.max(jnp.abs(xf), axis=axes) / 127.0)
            y = jax.lax.conv_general_dilated(
                xf, w_eff, preferred_element_type=jnp.float32,
                **dims) + b_eff
            return get_activation(self.act)(y.astype(self.dtype))
        if mode.qat:
            # QAT: fake-quant in float with straight-through-estimator
            # gradients (scales stop-gradiented, clip saturates the
            # gradient like real int8 would). Trains at bf16 speed;
            # serve the result through the real int8 path. Forward
            # matches the int8 path exactly while partial sums stay
            # below fp32's 2^24 integer window (tested sizes); a
            # C_in*k*k*127^2 worst case beyond that can differ by an
            # LSB — the training-noise alignment is what matters.
            s_x = jax.lax.stop_gradient(s_x)
            s_w = jax.lax.stop_gradient(s_w)
            x_scale = jax.lax.stop_gradient(x_scale)
            xq = jnp.clip(_ste_round(xf / x_scale), -127.0, 127.0)
            wq = _ste_round(w_eff / s_w)
            y = jax.lax.conv_general_dilated(
                xq, wq, preferred_element_type=jnp.float32, **dims)
        else:
            xq = jnp.clip(jnp.round(xf / x_scale), -127,
                          127).astype(jnp.int8)
            wq = jnp.round(w_eff / s_w).astype(jnp.int8)
            y = jax.lax.conv_general_dilated(
                xq, wq, preferred_element_type=jnp.int32, **dims)
        y = y.astype(jnp.float32) * (s_x * s_w)[None, None, None] + b_eff
        return get_activation(self.act)(y.astype(self.dtype))


class DWConv(nn.Module):
    """Depthwise conv followed by pointwise conv (network_blocks.py:64)."""

    out_channels: int
    ksize: int
    stride: int = 1
    act: str = "silu"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False,
                 valid: bool = False) -> jax.Array:
        in_ch = x.shape[-1]
        x = BaseConv(in_ch, self.ksize, self.stride, groups=in_ch, act=self.act,
                     dtype=self.dtype, name="dconv")(x, train, valid=valid)
        x = BaseConv(self.out_channels, 1, 1, act=self.act, dtype=self.dtype,
                     name="pconv")(x, train)
        return x


def _conv_cls(depthwise: bool):
    return DWConv if depthwise else BaseConv


class Bottleneck(nn.Module):
    """Standard bottleneck (network_blocks.py:158)."""

    out_channels: int
    shortcut: bool = True
    expansion: float = 0.5
    depthwise: bool = False
    act: str = "silu"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        hidden = int(self.out_channels * self.expansion)
        y = BaseConv(hidden, 1, 1, act=self.act, dtype=self.dtype, name="conv1")(x, train)
        Conv = _conv_cls(self.depthwise)
        y = Conv(self.out_channels, 3, 1, act=self.act, dtype=self.dtype, name="conv2")(y, train)
        if self.shortcut and x.shape[-1] == self.out_channels:
            y = y + x
        return y


class ResLayer(nn.Module):
    """Residual 1x1->3x3 lrelu layer (network_blocks.py:183)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        in_ch = x.shape[-1]
        mid = in_ch // 2
        y = BaseConv(mid, 1, 1, act="lrelu", dtype=self.dtype, name="layer1")(x, train)
        y = BaseConv(in_ch, 3, 1, act="lrelu", dtype=self.dtype, name="layer2")(y, train)
        return x + y


class SPPBottleneck(nn.Module):
    """Spatial pyramid pooling (network_blocks.py:201).

    Max-pools with 'same' padding at stride 1 lower trivially to XLA
    reduce-window ops which fuse with the surrounding convs.
    """

    out_channels: int
    kernel_sizes: Sequence[int] = (5, 9, 13)
    act: str = "silu"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        hidden = x.shape[-1] // 2
        x = BaseConv(hidden, 1, 1, act=self.act, dtype=self.dtype, name="conv1")(x, train)
        pools = [x]
        for ks in self.kernel_sizes:
            pad = ks // 2
            pools.append(
                nn.max_pool(x, (ks, ks), strides=(1, 1),
                            padding=[(pad, pad), (pad, pad)])
            )
        x = jnp.concatenate(pools, axis=-1)
        x = BaseConv(self.out_channels, 1, 1, act=self.act, dtype=self.dtype,
                     name="conv2")(x, train)
        return x


class CSPLayer(nn.Module):
    """C3: CSP bottleneck with 3 convolutions (network_blocks.py:226)."""

    out_channels: int
    n: int = 1
    shortcut: bool = True
    expansion: float = 0.5
    depthwise: bool = False
    act: str = "silu"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        hidden = int(self.out_channels * self.expansion)
        x1 = BaseConv(hidden, 1, 1, act=self.act, dtype=self.dtype, name="conv1")(x, train)
        x2 = BaseConv(hidden, 1, 1, act=self.act, dtype=self.dtype, name="conv2")(x, train)
        for i in range(self.n):
            x1 = Bottleneck(hidden, self.shortcut, 1.0, self.depthwise,
                            self.act, dtype=self.dtype, name=f"m_{i}")(x1, train)
        x = jnp.concatenate([x1, x2], axis=-1)
        return BaseConv(self.out_channels, 1, 1, act=self.act, dtype=self.dtype,
                        name="conv3")(x, train)


def space_to_depth_focus(x: jax.Array) -> jax.Array:
    """(B,H,W,C) -> (B,H/2,W/2,4C) with the reference's channel order
    (top-left, bottom-left, top-right, bottom-right; network_blocks.py:274-289).

    Lowered as ONE one-hot 2x2 stride-2 conv (exact: 0/1 taps). The
    reshape/transpose formulation is pathological on the TPU for the
    3-channel fp32 input — the innermost (2,2,3) transpose packs
    sublanes at ~1% utilization and took 15.8 ms of the 32 ms
    TSCD-Large backbone (tools/profile_backbone.py); the conv
    formulation rides the MXU like the Haar DWT fix (ops/wavelets.py).
    Multi-axis strided slices are also out: they kernel-fault the axon
    TPU worker at large batch x channel shapes.
    """
    B, H, W, C = x.shape
    # phase order [(h0,w0), (h1,w0), (h0,w1), (h1,w1)] = tl, bl, tr, br
    # -> output channel (dx*2 + dy)*C + c
    k = np.zeros((2, 2, C, 4 * C), np.float32)
    for dy in range(2):
        for dx in range(2):
            for c in range(C):
                k[dy, dx, c, (dx * 2 + dy) * C + c] = 1.0
    return jax.lax.conv_general_dilated(
        x, jnp.asarray(k, x.dtype), window_strides=(2, 2), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


class _FocusKernel(nn.Module):
    """Holds the (k, k, 4C, out) conv kernel at the same param path as
    BaseConv's nn.Conv ('conv/kernel') so checkpoints interchange."""

    shape: Tuple[int, ...]

    @nn.compact
    def __call__(self) -> jax.Array:
        return self.param("kernel", nn.initializers.lecun_normal(),
                          self.shape)


class _ConvParams(nn.Module):
    """Declares nn.Conv's param tree (conv kernel [+ bias]) without
    running it — the int8 eval path consumes the raw params instead."""

    shape: Tuple[int, ...]
    use_bias: bool = False

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            self.shape)
        bias = (self.param("bias", nn.initializers.zeros,
                           (self.shape[-1],)) if self.use_bias else None)
        return kernel, bias


class _BNStats(nn.Module):
    """Declares the same variable tree as nn.BatchNorm (params
    scale/bias, batch_stats mean/var) without running it — the eval
    Focus paths fold BN into the conv instead."""

    ch: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.ch,))
        bias = self.param("bias", nn.initializers.zeros, (self.ch,))
        mean = self.variable("batch_stats", "mean",
                             lambda: jnp.zeros((self.ch,), jnp.float32))
        var = self.variable("batch_stats", "var",
                            lambda: jnp.ones((self.ch,), jnp.float32))
        return scale, bias, mean.value, var.value


class _FocusConv(nn.Module):
    """BaseConv stand-in for the Focus stem: identical param tree
    (conv/kernel + bn/*) but the conv consumes the FULL-resolution image
    with the kernel rearranged to (2k, 2k, C, out), stride doubled.
    At eval on TPU the whole stem (conv + folded BN + SiLU) runs as one
    Pallas kernel (ops/pallas/focus_stem.py)."""

    out_channels: int
    ksize: int
    stride: int
    act: str
    dtype: Dtype

    def _conv6(self, x, w3, C):
        k = self.ksize
        # s2d channel order is (dx*2+dy)*C + c (space_to_depth_focus):
        # (k,k,4C,O) -> (u,v,dx,dy,c,O) -> (u,dy,v,dx,c,O) -> (2k,2k,C,O)
        w6 = w3.reshape(k, k, 2, 2, C, self.out_channels)
        w6 = w6.transpose(0, 3, 1, 2, 4, 5).reshape(
            2 * k, 2 * k, C, self.out_channels)
        pad = k - 1
        return jax.lax.conv_general_dilated(
            x.astype(self.dtype), w6.astype(self.dtype),
            window_strides=(2 * self.stride, 2 * self.stride),
            padding=[(pad, pad), (pad, pad)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        B, H, W, C = x.shape
        k = self.ksize
        assert k % 2 == 1, "Focus fused conv assumes odd ksize"
        w3 = _FocusKernel((k, k, 4 * C, self.out_channels), name="conv")()
        if train:
            y = self._conv6(x, w3, C)
            y = nn.BatchNorm(use_running_average=False, momentum=0.9,
                             epsilon=1e-5, dtype=jnp.float32,
                             name="bn")(y)
            return get_activation(self.act)(y.astype(self.dtype))

        # eval: fold BN into scale/shift (same tree as nn.BatchNorm)
        gamma, beta, mean, var = _BNStats(self.out_channels, name="bn")()
        scale = gamma / jnp.sqrt(var + 1e-5)
        shift = beta - mean * scale

        from ..ops import banded_stem
        from ..ops.pallas import focus_stem
        if (jax.default_backend() == "tpu"
                and banded_stem.supported(H, W, C, k, self.stride,
                                          self.act)):
            return banded_stem.focus_stem_banded(x, w3, scale, shift,
                                                 self.dtype)
        if (jax.default_backend() == "tpu"
                and focus_stem.supported(H, W, C, k, self.stride,
                                         self.act)):
            return focus_stem.focus_stem(x, w3, scale, shift, self.dtype)
        y = self._conv6(x, w3, C).astype(jnp.float32)
        y = y * scale[None, None, None] + shift[None, None, None]
        return get_activation(self.act)(y.astype(self.dtype))


class Focus(nn.Module):
    """Space-to-depth stem (network_blocks.py:267).

    TPU lowering: s2d followed by a k x k conv on the half-res grid is
    algebraically ONE 2k x 2k stride-2(s) conv on the full-res image
    (out[i,j] sums X[2si+2(u-(k-1)/2)+dy, ...] = taps -(k-1)..k), so the
    (k,k,4C,out) kernel is rearranged to (2k,2k,C,out) at apply time and
    a single conv runs. Both the reshape/transpose s2d and a separate
    small-channel conv are pathological on the axon TPU (the split stem
    measured 14.5 ms of the 31 ms TSCD-Large backbone at <2% MXU —
    tools/profile_backbone.py); the fused conv keeps the image read to
    one pass. Param tree and math (mod float reassociation) are
    unchanged: conv/conv/kernel stays (k,k,4C,out), BN/act follow as in
    BaseConv (torch parity: tests/test_torch_parity.py)."""

    out_channels: int
    ksize: int = 1
    stride: int = 1
    act: str = "silu"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        return _FocusConv(self.out_channels, self.ksize, self.stride,
                          self.act, self.dtype, name="conv")(x, train)


class ResNetBottleneck(nn.Module):
    """Torchvision-style bottleneck with stride on the 3x3
    (network_blocks.py:292)."""

    planes: int
    stride: int = 1
    has_downsample: bool = False
    groups: int = 1
    base_width: int = 64
    act: str = "relu"
    expansion: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        width = int(self.planes * (self.base_width / 64.0)) * self.groups
        out = BaseConv(width, 1, 1, self.groups, act=self.act, dtype=self.dtype,
                       name="ConvBn1")(x, train)
        out = BaseConv(width, 3, self.stride, self.groups, act=self.act,
                       dtype=self.dtype, name="ConvBn2")(out, train)
        out = BaseConv(self.planes * self.expansion, 1, 1, self.groups,
                       act=self.act, dtype=self.dtype, name="ConvBn3")(out, train)
        if self.has_downsample:
            identity = BaseConv(self.planes * self.expansion, 1, self.stride,
                                act="id", dtype=self.dtype, name="downsample")(x, train)
        else:
            identity = x
        return get_activation(self.act)(out + identity)
