"""YOLOv7 ELAN family (reference: yolox/models/ELANNet.py — BaseConv:41,
Focus:109, ELANLayer:422, ELAN2Layer:480, MPConvLayer:505, MP:533,
DownC:542, SPPCSPC:557, SPPELAN:640, RepConv:625, ELANNet:745,
ELANFPN:985, ELANFPNP6:1145 — and yolov7.py YOLOv7:11).

Faithful to the reference architecture tables (arch 'tiny'/'L'/'X'/
'W6'/'E6'/'D6'/'E6E'): the SPPCSPC sits at the END of the backbone's
last stage, ELAN layers carry dual mid-channels with per-arch concat
lists, and MPConv concatenates conv-path-first. NHWC; converted
reference checkpoints line up via utils/convert.backbone_to_flax
(family="elan"), parity-pinned in tests/test_torch_parity_elan.py.

Notes vs the reference source:
- Its BaseConv (ELANNet.py:41) uses BN eps=1e-3 and always applies
  SiLU at eval time regardless of `act`; both mirrored here. Its torch
  momentum 0.97 is a Paddle->torch port artifact (semantics invert);
  we keep the intended Paddle semantic (flax momentum 0.97).
- RepConv keeps the 3x3 + 1x1 (+identity BN) branches explicit; on TPU
  XLA fuses the parallel convs, so deploy-time re-parameterization is
  an optimization, not a requirement.
- ELANFPNP6's `use_aux` training heads (ELANNet.py:1198) are
  train-only extras of an arch no reference exp instantiates; omitted.
"""

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .blocks import Focus
from .pafpn import upsample2x


class EConv(nn.Module):
    """ELANNet.py:41 BaseConv: conv((k-1)//2 pad, no bias) + BN(eps
    1e-3) + SiLU (the reference hardwires x*sigmoid(x) at eval)."""

    out_channels: int
    ksize: int
    stride: int = 1
    groups: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        pad = (self.ksize - 1) // 2
        x = nn.Conv(self.out_channels, (self.ksize,) * 2,
                    strides=(self.stride,) * 2,
                    padding=[(pad, pad)] * 2,
                    feature_group_count=self.groups, use_bias=False,
                    dtype=self.dtype, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.97,
                         epsilon=1e-3, dtype=jnp.float32, name="bn")(x)
        return nn.silu(x)


class ELANLayer(nn.Module):
    """(ELANNet.py:422) two 1x1 entries + num_blocks chained 3x3 convs;
    the concat picks entries per `concat_list`, reversed, then 1x1."""

    mid1: int
    mid2: int
    out_channels: int
    num_blocks: int = 4
    concat_list: Sequence[int] = (-1, -3, -5, -6)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        dt = self.dtype
        x1 = EConv(self.mid1, 1, 1, dtype=dt, name="conv1")(x, train)
        x2 = EConv(self.mid1, 1, 1, dtype=dt, name="conv2")(x, train)
        outs = [x1, x2]
        idx = {i + self.num_blocks for i in self.concat_list[:-2]}
        h = x2
        for i in range(self.num_blocks):
            h = EConv(self.mid2, 3, 1, dtype=dt,
                      name=f"bottleneck_{i}")(h, train)
            if i in idx:
                outs.append(h)
        cat = jnp.concatenate(outs[::-1], -1)
        return EConv(self.out_channels, 1, 1, dtype=dt,
                     name="conv3")(cat, train)


class ELAN2Layer(nn.Module):
    """(ELANNet.py:480) two parallel ELANLayers, summed (E6E)."""

    mid1: int
    mid2: int
    out_channels: int
    num_blocks: int = 4
    concat_list: Sequence[int] = (-1, -3, -5, -6)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        a = ELANLayer(self.mid1, self.mid2, self.out_channels,
                      self.num_blocks, self.concat_list, self.dtype,
                      name="elan_layer1")(x, train)
        b = ELANLayer(self.mid1, self.mid2, self.out_channels,
                      self.num_blocks, self.concat_list, self.dtype,
                      name="elan_layer2")(x, train)
        return a + b


class MPConvLayer(nn.Module):
    """(ELANNet.py:505) maxpool+1x1 ‖ 1x1+3x3s2, conv path FIRST in the
    concat. Output channels = 2 * int(out_channels * expansion)."""

    out_channels: int
    expansion: float = 0.5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        dt = self.dtype
        mid = int(self.out_channels * self.expansion)
        x1 = nn.max_pool(x, (2, 2), strides=(2, 2))
        x1 = EConv(mid, 1, 1, dtype=dt, name="conv1")(x1, train)
        x2 = EConv(mid, 1, 1, dtype=dt, name="conv2")(x, train)
        x2 = EConv(mid, 3, 2, dtype=dt, name="conv3")(x2, train)
        return jnp.concatenate([x2, x1], -1)


class DownC(nn.Module):
    """(ELANNet.py:542) 1x1+3x3s_k ‖ maxpool+1x1 downsample (E6/D6)."""

    out_channels: int
    k: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        dt = self.dtype
        c1 = x.shape[-1]
        x2 = EConv(c1, 1, 1, dtype=dt, name="cv1")(x, train)
        x2 = EConv(self.out_channels // 2, 3, self.k, dtype=dt,
                   name="cv2")(x2, train)
        x3 = nn.max_pool(x, (self.k, self.k), strides=(self.k, self.k))
        x3 = EConv(self.out_channels // 2, 1, 1, dtype=dt,
                   name="cv3")(x3, train)
        return jnp.concatenate([x2, x3], -1)


def _maxpool_same(x, k):
    """MaxPool2d(k, 1, padding=k//2): torch pads symmetric with -inf."""
    p = k // 2
    x = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)),
                constant_values=-jnp.inf)
    return nn.max_pool(x, (k, k), strides=(1, 1), padding="VALID")


class SPPCSPC(nn.Module):
    """(ELANNet.py:557) CSP split around multi-kernel max pooling."""

    out_channels: int
    e: float = 0.5
    pool_ks: Sequence[int] = (5, 9, 13)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        dt = self.dtype
        c_ = int(2 * self.out_channels * self.e)
        a = EConv(c_, 1, 1, dtype=dt, name="cv1")(x, train)
        a = EConv(c_, 3, 1, dtype=dt, name="cv3")(a, train)
        a = EConv(c_, 1, 1, dtype=dt, name="cv4")(a, train)
        pools = [a] + [_maxpool_same(a, k) for k in self.pool_ks]
        a = EConv(c_, 1, 1, dtype=dt,
                  name="cv5")(jnp.concatenate(pools, -1), train)
        a = EConv(c_, 3, 1, dtype=dt, name="cv6")(a, train)
        b = EConv(c_, 1, 1, dtype=dt, name="cv2")(x, train)
        return EConv(self.out_channels, 1, 1, dtype=dt,
                     name="cv7")(jnp.concatenate([a, b], -1), train)


class SPPELAN(nn.Module):
    """(ELANNet.py:640) tiny-arch SPP: dual 1x1 + pools, reversed cat."""

    out_channels: int
    e: float = 0.5
    pool_ks: Sequence[int] = (5, 9, 13)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        dt = self.dtype
        c_ = int(2 * self.out_channels * self.e)
        x1 = EConv(c_, 1, 1, dtype=dt, name="cv1")(x, train)
        x2 = EConv(c_, 1, 1, dtype=dt, name="cv2")(x, train)
        cats = [x2] + [_maxpool_same(x2, k) for k in self.pool_ks]
        y = EConv(c_, 1, 1, dtype=dt,
                  name="cv3")(jnp.concatenate(cats[::-1], -1), train)
        return EConv(self.out_channels, 1, 1, dtype=dt,
                     name="cv4")(jnp.concatenate([y, x1], -1), train)


class RepConv(nn.Module):
    """(ELANNet.py:625) RepVGG block: 3x3 + 1x1 (+identity BN when
    channels match, stride 1), summed then SiLU'd. Branch BNs use torch
    defaults (eps 1e-5) unlike EConv."""

    out_channels: int
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        dt = self.dtype
        bn = lambda n: nn.BatchNorm(use_running_average=not train,
                                    momentum=0.9, epsilon=1e-5,
                                    dtype=jnp.float32, name=n)
        dense = nn.Conv(self.out_channels, (3, 3),
                        strides=(self.stride,) * 2,
                        padding=[(1, 1)] * 2, use_bias=False, dtype=dt,
                        name="rbr_dense")(x)
        dense = bn("rbr_dense_bn")(dense)
        one = nn.Conv(self.out_channels, (1, 1),
                      strides=(self.stride,) * 2, use_bias=False,
                      dtype=dt, name="rbr_1x1")(x)
        one = bn("rbr_1x1_bn")(one)
        out = dense + one
        if self.stride == 1 and x.shape[-1] == self.out_channels:
            out = out + bn("rbr_identity_bn")(x)
        return nn.silu(out)


class ImplicitA(nn.Module):
    """(ELANNet.py:605) learned additive prior (YOLOR)."""

    channels: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        ia = self.param("ia", nn.initializers.normal(0.02),
                        (1, 1, 1, self.channels))
        return x + ia


class ImplicitM(nn.Module):
    """(ELANNet.py:616) learned multiplicative prior (YOLOR)."""

    channels: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        im = self.param("im", nn.initializers.normal(0.02),
                        (1, 1, 1, self.channels))
        return x * im


# ------------------------------------------------------------- backbone

# [in_ch, out_ch] of 1 stem + stages (ELANNet.py:762)
_CH = {
    "tiny": [[32, 64], [64, 64], [64, 128], [128, 256], [256, 512]],
    "L": [[32, 64], [64, 256], [256, 512], [512, 1024], [1024, 1024]],
    "X": [[40, 80], [80, 320], [320, 640], [640, 1280], [1280, 1280]],
    "W6": [[64, 64], [64, 128], [128, 256], [256, 512], [512, 768],
           [768, 1024]],
    "E6": [[80, 80], [80, 160], [160, 320], [320, 640], [640, 960],
           [960, 1280]],
    "D6": [[96, 96], [96, 192], [192, 384], [384, 768], [768, 1152],
           [1152, 1536]],
    "E6E": [[80, 80], [80, 160], [160, 320], [320, 640], [640, 960],
            [960, 1280]],
}
_MID = {
    "tiny": [[32, 32], [64, 64], [128, 128], [256, 256]],
    "L": [[64, 64], [128, 128], [256, 256], [256, 256]],
    "X": [[64, 64], [128, 128], [256, 256], [256, 256]],
    "W6": [[64, 64], [128, 128], [256, 256], [384, 384], [512, 512]],
    "E6": [[64, 64], [128, 128], [256, 256], [384, 384], [512, 512]],
    "D6": [[64, 64], [128, 128], [256, 256], [384, 384], [512, 512]],
    "E6E": [[64, 64], [128, 128], [256, 256], [384, 384], [512, 512]],
}
_CONCAT = {
    "tiny": (-1, -2, -3, -4),
    "L": (-1, -3, -5, -6),
    "X": (-1, -3, -5, -7, -8),
    "W6": (-1, -3, -5, -6),
    "E6": (-1, -3, -5, -7, -8),
    "D6": (-1, -3, -5, -7, -9, -10),
    "E6E": (-1, -3, -5, -7, -8),
}
_NBLOCKS = {"tiny": 2, "L": 4, "X": 6, "W6": 4, "E6": 6, "D6": 8,
            "E6E": 6}


class ELANNet(nn.Module):
    """(ELANNet.py:745) YOLOv7 backbone. return_idx selects stage
    outputs by stride index ([2,3,4] -> 8/16/32; P6 archs use
    [2,3,4,5] -> 8/16/32/64). The LAST stage ends with SPPCSPC
    (SPPELAN for tiny), halving its channel count."""

    arch: str = "L"
    return_idx: Sequence[int] = (2, 3, 4)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False
                 ) -> Tuple[jax.Array, ...]:
        dt = self.dtype
        arch = self.arch
        chs = _CH[arch]
        mids = _MID[arch]
        concat = _CONCAT[arch]
        nb = _NBLOCKS[arch]
        x = x.astype(dt)  # raw pixels, as the reference consumes

        ch_1, ch_out = chs[0][0], chs[0][-1]
        if arch in ("L", "X"):
            x = EConv(ch_1, 3, 1, dtype=dt, name="stem_0")(x, train)
            x = EConv(ch_1 * 2, 3, 2, dtype=dt, name="stem_1")(x, train)
            x = EConv(ch_out, 3, 1, dtype=dt, name="stem_2")(x, train)
        elif arch == "tiny":
            x = EConv(ch_1, 3, 2, dtype=dt, name="stem_0")(x, train)
            x = EConv(ch_out, 3, 2, dtype=dt, name="stem_1")(x, train)
        else:  # W6/E6/D6/E6E: ReOrg + conv (Focus)
            x = Focus(ch_out, 3, act="silu", dtype=dt, name="stem")(
                x, train)

        outs = []
        n_stages = len(chs) - 1
        ELANBlock = ELAN2Layer if arch == "E6E" else ELANLayer
        for i, (in_ch, out_ch) in enumerate(chs[1:]):
            # 1. downsample
            if i == 0:
                if arch in ("L", "X"):
                    x = EConv(out_ch // 2, 3, 2, dtype=dt,
                              name=f"stage{i}_down")(x, train)
                elif arch == "W6":
                    x = EConv(out_ch, 3, 2, dtype=dt,
                              name=f"stage{i}_down")(x, train)
                elif arch in ("E6", "D6", "E6E"):
                    x = DownC(out_ch, 2, dtype=dt,
                              name=f"stage{i}_down")(x, train)
                # tiny: no stage-0 downsample
            else:
                if arch in ("L", "X"):
                    x = MPConvLayer(in_ch, 0.5, dtype=dt,
                                    name=f"stage{i}_down")(x, train)
                elif arch == "tiny":
                    x = nn.max_pool(x, (2, 2), strides=(2, 2))
                elif arch == "W6":
                    x = EConv(out_ch, 3, 2, dtype=dt,
                              name=f"stage{i}_down")(x, train)
                else:  # E6/D6/E6E
                    x = DownC(out_ch, 2, dtype=dt,
                              name=f"stage{i}_down")(x, train)
            # 2. ELAN block
            x = ELANBlock(mids[i][0], mids[i][1], out_ch, nb, concat,
                          dtype=dt, name=f"stage{i}_elan")(x, train)
            # 3. SPP at the last stage
            if i == n_stages - 1:
                spp = SPPELAN if arch == "tiny" else SPPCSPC
                x = spp(out_ch // 2, dtype=dt,
                        name=f"stage{i}_spp")(x, train)
            outs.append(x)
        # forward() returns blocks with i+1 in return_idx (ELANNet.py:967)
        return tuple(outs[i - 1] for i in self.return_idx)


# ----------------------------------------------------------------- FPNs

# [in_ch, mid1, mid2, out_ch] per ELANLayer (2 FPN + 2 PAN),
# ELANNet.py:992
_FPN_CH = {
    "tiny": [[256, 64, 64, 128], [128, 32, 32, 64], [64, 64, 64, 128],
             [128, 128, 128, 256]],
    "L": [[512, 256, 128, 256], [256, 128, 64, 128],
          [128, 256, 128, 256], [256, 512, 256, 512]],
    "X": [[640, 256, 256, 320], [320, 128, 128, 160],
          [160, 256, 256, 320], [320, 512, 512, 640]],
}
_FPN_CONCAT = {
    "tiny": (-1, -2, -3, -4),
    "L": (-1, -2, -3, -4, -5, -6),
    "X": (-1, -3, -5, -7, -8),
}
_FPN_NBLOCKS = {"tiny": 2, "L": 4, "X": 6}


class ELANFPN(nn.Module):
    """(ELANNet.py:985) YOLOv7 P5 neck: top-down FPN + bottom-up PAN of
    ELANLayers; RepConv (BaseConv for tiny/X) output convs double the
    channels. in_channels are the backbone's (c3, c4, c5)."""

    arch: str = "L"
    in_channels: Sequence[int] = (512, 1024, 512)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats, train: bool = False):
        dt = self.dtype
        arch = self.arch
        chs = _FPN_CH[arch]
        concat = _FPN_CONCAT[arch]
        nb = _FPN_NBLOCKS[arch]
        c3, c4, c5 = feats

        def elan(name, spec):
            return ELANLayer(spec[1], spec[2], spec[3], nb, concat,
                             dtype=dt, name=name)

        out_ch = chs[0][3]
        p5_lat = EConv(out_ch, 1, 1, dtype=dt,
                       name="lateral_conv1")(c5, train)
        route_c4 = EConv(out_ch, 1, 1, dtype=dt,
                         name="route_conv1")(c4, train)
        f1 = jnp.concatenate([route_c4, upsample2x(p5_lat)], -1)
        fpn_out1 = elan("elan_fpn1", chs[0])(f1, train)

        out_ch = chs[1][3]
        f1_lat = EConv(out_ch, 1, 1, dtype=dt,
                       name="lateral_conv2")(fpn_out1, train)
        route_c3 = EConv(out_ch, 1, 1, dtype=dt,
                         name="route_conv2")(c3, train)
        f2 = jnp.concatenate([route_c3, upsample2x(f1_lat)], -1)
        fpn_out2 = elan("elan_fpn2", chs[1])(f2, train)

        out_ch = chs[2][3]
        if arch == "tiny":
            d1 = EConv(out_ch, 3, 2, dtype=dt,
                       name="mp_conv1")(fpn_out2, train)
        else:
            d1 = MPConvLayer(out_ch, 0.5, dtype=dt,
                             name="mp_conv1")(fpn_out2, train)
        pan_out1 = elan("elan_pan1", chs[2])(
            jnp.concatenate([d1, fpn_out1], -1), train)

        out_ch = chs[3][3]
        if arch == "tiny":
            d2 = EConv(out_ch, 3, 2, dtype=dt,
                       name="mp_conv2")(pan_out1, train)
        else:
            d2 = MPConvLayer(out_ch, 0.5, dtype=dt,
                             name="mp_conv2")(pan_out1, train)
        pan_out2 = elan("elan_pan2", chs[3])(
            jnp.concatenate([d2, c5], -1), train)

        outs = []
        Rep = RepConv if arch == "L" else (
            lambda c, dtype, name: EConv(c, 3, 1, dtype=dtype, name=name))
        for i, p in enumerate((fpn_out2, pan_out1, pan_out2)):
            c = chs[1:][i][3] * 2
            outs.append(Rep(c, dtype=dt, name=f"repconv_{i}")(p, train))
        return tuple(outs)


# [in_ch, mid1, mid2, out_ch] per ELANLayer (3 FPN + 3 PAN),
# ELANNet.py:1152
_P6_CH = {
    "W6": [[512, 384, 192, 384], [384, 256, 128, 256],
           [256, 128, 64, 128], [128, 256, 128, 256],
           [256, 384, 192, 384], [384, 512, 256, 512]],
    "E6": [[640, 384, 192, 480], [480, 256, 128, 320],
           [320, 128, 64, 160], [160, 256, 128, 320],
           [320, 384, 192, 480], [480, 512, 256, 640]],
    "D6": [[768, 384, 192, 576], [576, 256, 128, 384],
           [384, 128, 64, 192], [192, 256, 128, 384],
           [384, 384, 192, 576], [576, 512, 256, 768]],
    "E6E": [[640, 384, 192, 480], [480, 256, 128, 320],
            [320, 128, 64, 160], [160, 256, 128, 320],
            [320, 384, 192, 480], [480, 512, 256, 640]],
}
_P6_CONCAT = {
    "W6": (-1, -2, -3, -4, -5, -6),
    "E6": (-1, -2, -3, -4, -5, -6, -7, -8),
    "D6": (-1, -2, -3, -4, -5, -6, -7, -8, -9, -10),
    "E6E": (-1, -2, -3, -4, -5, -6, -7, -8),
}
_P6_NBLOCKS = {"W6": 4, "E6": 6, "D6": 8, "E6E": 6}


class ELANFPNP6(nn.Module):
    """(ELANNet.py:1145) YOLOv7 P6 neck: 3 top-down + 3 bottom-up
    ELAN layers over (c3, c4, c5, c6); BaseConv (W6) or DownC (E6/D6/
    E6E) downsamples; output convs double the channels. Returns 4
    pyramid levels (stride 8/16/32/64)."""

    arch: str = "W6"
    in_channels: Sequence[int] = (256, 512, 768, 512)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats, train: bool = False):
        dt = self.dtype
        arch = self.arch
        chs = _P6_CH[arch]
        concat = _P6_CONCAT[arch]
        nb = _P6_NBLOCKS[arch]
        c3, c4, c5, c6 = feats
        ELANBlock = ELAN2Layer if arch == "E6E" else ELANLayer

        def elan(name, spec):
            return ELANBlock(spec[1], spec[2], spec[3], nb, concat,
                             dtype=dt, name=name)

        def down(name, out_ch):
            if arch == "W6":
                return lambda z, tr: EConv(out_ch, 3, 2, dtype=dt,
                                           name=name)(z, tr)
            return lambda z, tr: DownC(out_ch, 2, dtype=dt,
                                       name=name)(z, tr)

        # Top-down
        out_ch = chs[0][3]
        p6_lat = EConv(out_ch, 1, 1, dtype=dt,
                       name="lateral_conv1")(c6, train)
        route_c5 = EConv(out_ch, 1, 1, dtype=dt,
                         name="route_conv1")(c5, train)
        fpn_out1 = elan("elan_fpn1", chs[0])(
            jnp.concatenate([route_c5, upsample2x(p6_lat)], -1), train)

        out_ch = chs[1][3]
        f1_lat = EConv(out_ch, 1, 1, dtype=dt,
                       name="lateral_conv2")(fpn_out1, train)
        route_c4 = EConv(out_ch, 1, 1, dtype=dt,
                         name="route_conv2")(c4, train)
        fpn_out2 = elan("elan_fpn2", chs[1])(
            jnp.concatenate([route_c4, upsample2x(f1_lat)], -1), train)

        out_ch = chs[2][3]
        f2_lat = EConv(out_ch, 1, 1, dtype=dt,
                       name="lateral_conv3")(fpn_out2, train)
        route_c3 = EConv(out_ch, 1, 1, dtype=dt,
                         name="route_conv3")(c3, train)
        fpn_out3 = elan("elan_fpn3", chs[2])(
            jnp.concatenate([route_c3, upsample2x(f2_lat)], -1), train)

        # Bottom-up
        d1 = down("down_conv1", chs[3][3])(fpn_out3, train)
        pan_out1 = elan("elan_pan1", chs[3])(
            jnp.concatenate([d1, fpn_out2], -1), train)
        d2 = down("down_conv2", chs[4][3])(pan_out1, train)
        pan_out2 = elan("elan_pan2", chs[4])(
            jnp.concatenate([d2, fpn_out1], -1), train)
        d3 = down("down_conv3", chs[5][3])(pan_out2, train)
        pan_out3 = elan("elan_pan3", chs[5])(
            jnp.concatenate([d3, c6], -1), train)

        outs = []
        for i, p in enumerate((fpn_out3, pan_out1, pan_out2, pan_out3)):
            c = chs[2:][i][3] * 2
            outs.append(EConv(c, 3, 1, dtype=dt,
                              name=f"repconv_{i}")(p, train))
        return tuple(outs)


class YOLOv7(nn.Module):
    """(yolov7.py:11) ELANNet + ELANFPN + YOLOX decoupled head."""

    num_classes: int = 80
    arch: str = "L"
    act: str = "silu"
    dtype: Any = jnp.float32

    def setup(self):
        from .yolo_head import YOLOXHead
        chs = _CH[self.arch]
        c5 = chs[-1][-1] // 2      # SPPCSPC halves the last stage
        in_channels = (chs[-3][-1], chs[-2][-1], c5)
        fpn_out = tuple(c[3] * 2 for c in _FPN_CH[self.arch][1:])
        self.backbone = ELANNet(self.arch, dtype=self.dtype)
        self.fpn = ELANFPN(self.arch, in_channels, dtype=self.dtype)
        self.head = YOLOXHead(self.num_classes, width=1.0,
                              in_channels=fpn_out, act=self.act,
                              dtype=self.dtype)

    def __call__(self, x: jax.Array, train: bool = False,
                 decode: bool = True):
        feats = self.backbone(x, train)
        fpn = self.fpn(feats, train)
        out = self.head(fpn, train)
        if decode:
            from ..ops.decode import decode_outputs
            raw = out["outputs"].astype(jnp.float32)
            dec = decode_outputs(raw, out["hw"], self.head.strides)
            out["decoded"] = jnp.concatenate(
                [dec[..., :4], jax.nn.sigmoid(dec[..., 4:])], -1)
        return out
