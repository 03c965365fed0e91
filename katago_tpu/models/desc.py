"""KataGo .bin.gz / .txt.gz model format: parser + JAX evaluator.

This is the interop surface with the reference ecosystem: any net released
for the reference engine loads here and runs on TPU via XLA. It replaces
the role of cpp/neuralnet/desc.{cpp,h} (format parse, ~3.4k LoC) and of the
five device backends that consume a ModelDesc (cuda/trt/opencl/eigen/metal)
with a single weight tree + one jit-able forward function.

Format (defined by the reference's exporter, python/export_model_pytorch.py
:206-394, and parser, cpp/neuralnet/desc.cpp): whitespace-separated header
tokens; weight blobs either as text floats (.txt.gz) or as "@BIN@" followed
by little-endian f32s (.bin.gz). Conv weights are stored y,x,ic,oc (exactly
JAX's HWIO layout for NHWC convs); matmuls are ic,oc. Supported here:
model versions 8..15 conv families (ordinary / gpool / nested-bottleneck
blocks). Transformer blocks (v17) are a later milestone.

All v8..v17 models consume V7 input features (modelversion.cpp:36-38),
which katago_tpu.models.features provides.
"""

from __future__ import annotations

import dataclasses
import gzip
import hashlib
import struct
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


class ModelParseError(ValueError):
    pass


class _Reader:
    """Tokenized reader over the decompressed model bytes, with @BIN@ blobs."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    def token(self) -> str:
        d, n = self.data, len(self.data)
        p = self.pos
        while p < n and d[p:p + 1].isspace():
            p += 1
        start = p
        while p < n and not d[p:p + 1].isspace():
            p += 1
        self.pos = p
        if start == p:
            raise ModelParseError("unexpected end of model file")
        return d[start:p].decode("ascii")

    def int(self) -> int:
        return int(self.token())

    def float(self) -> float:
        return float(self.token())

    def floats(self, count: int) -> np.ndarray:
        """Weight blob: binary @BIN@ payload or `count` text floats."""
        d = self.data
        p = self.pos
        while p < len(d) and d[p:p + 1].isspace():
            p += 1
        if d[p:p + 5] == b"@BIN@":
            p += 5
            out = np.frombuffer(d, dtype="<f4", count=count, offset=p)
            self.pos = p + 4 * count
            return out.astype(np.float32)
        # text floats
        vals = np.empty(count, np.float32)
        self.pos = p
        for i in range(count):
            vals[i] = self.float()
        return vals


# ---- layer descs (plain dataclasses holding numpy weights) ---------------

@dataclasses.dataclass
class Conv:
    name: str
    ky: int
    kx: int
    in_ch: int
    out_ch: int
    kernel: np.ndarray  # HWIO


@dataclasses.dataclass
class BatchNorm:
    name: str
    channels: int
    # merged affine: y = x * scale + bias  (desc.cpp computeMerged)
    scale: np.ndarray
    bias: np.ndarray


@dataclasses.dataclass
class MatMul:
    name: str
    in_ch: int
    out_ch: int
    weight: np.ndarray  # [in, out]


@dataclasses.dataclass
class MatBias:
    name: str
    channels: int
    bias: np.ndarray


def _parse_conv(r: _Reader) -> Conv:
    name = r.token()
    ky, kx = r.int(), r.int()
    in_ch, out_ch = r.int(), r.int()
    dy, dx = r.int(), r.int()
    if dy != 1 or dx != 1:
        raise ModelParseError(f"{name}: dilation != 1 unsupported here")
    w = r.floats(ky * kx * in_ch * out_ch).reshape(ky, kx, in_ch, out_ch)
    return Conv(name, ky, kx, in_ch, out_ch, w)


def _parse_bn(r: _Reader) -> BatchNorm:
    name = r.token()
    c = r.int()
    eps = r.float()
    has_scale = r.int()
    has_bias = r.int()
    mean = r.floats(c)
    var = r.floats(c)
    scale = r.floats(c) if has_scale else np.ones(c, np.float32)
    bias = r.floats(c) if has_bias else np.zeros(c, np.float32)
    merged_scale = scale / np.sqrt(var + eps)
    merged_bias = bias - mean * merged_scale
    return BatchNorm(name, c, merged_scale.astype(np.float32),
                     merged_bias.astype(np.float32))


_ACTS = {"ACTIVATION_IDENTITY": "identity", "ACTIVATION_RELU": "relu",
         "ACTIVATION_MISH": "mish", "ACTIVATION_SILU": "silu"}


def _parse_act(r: _Reader, version: int) -> str:
    r.token()  # name
    if version >= 11:
        kind = r.token()
        if kind not in _ACTS:
            raise ModelParseError(f"unknown activation {kind}")
        return _ACTS[kind]
    return "relu"


def _parse_matmul(r: _Reader) -> MatMul:
    name = r.token()
    in_ch, out_ch = r.int(), r.int()
    w = r.floats(in_ch * out_ch).reshape(in_ch, out_ch)
    return MatMul(name, in_ch, out_ch, w)


def _parse_matbias(r: _Reader) -> MatBias:
    name = r.token()
    c = r.int()
    return MatBias(name, c, r.floats(c))


def _parse_block(r: _Reader, version: int) -> dict:
    kind = r.token()
    if kind == "ordinary_block":
        return {
            "kind": "ordinary",
            "name": r.token(),
            "pre_bn": _parse_bn(r), "pre_act": _parse_act(r, version),
            "regular_conv": _parse_conv(r),
            "mid_bn": _parse_bn(r), "mid_act": _parse_act(r, version),
            "final_conv": _parse_conv(r),
        }
    if kind == "gpool_block":
        return {
            "kind": "gpool",
            "name": r.token(),
            "pre_bn": _parse_bn(r), "pre_act": _parse_act(r, version),
            "regular_conv": _parse_conv(r),
            "gpool_conv": _parse_conv(r),
            "gpool_bn": _parse_bn(r), "gpool_act": _parse_act(r, version),
            "gpool_to_bias": _parse_matmul(r),
            "mid_bn": _parse_bn(r), "mid_act": _parse_act(r, version),
            "final_conv": _parse_conv(r),
        }
    if kind == "nested_bottleneck_block":
        name = r.token()
        internal = r.int()
        pre = {"pre_bn": _parse_bn(r), "pre_act": _parse_act(r, version),
               "pre_conv": _parse_conv(r)}
        sub = [_parse_block(r, version) for _ in range(internal)]
        post = {"post_bn": _parse_bn(r), "post_act": _parse_act(r, version),
                "post_conv": _parse_conv(r)}
        return {"kind": "nested", "name": name, "internal": internal,
                **pre, "sub_blocks": sub, **post}
    raise ModelParseError(f"unsupported block kind {kind!r} "
                          "(transformer blocks are a later milestone)")


@dataclasses.dataclass
class ModelDesc:
    name: str
    version: int
    num_spatial_inputs: int
    num_global_inputs: int
    sha256: str
    post_process: dict
    trunk: dict
    policy_head: dict
    value_head: dict

    @property
    def num_policy_channels(self) -> int:
        return self.policy_head["p2_conv"].out_ch


def load_model(path: str) -> ModelDesc:
    """Parse a reference-format model file (.bin.gz / .txt.gz / raw)."""
    raw = open(path, "rb").read()
    sha256 = hashlib.sha256(raw).hexdigest()
    if raw[:2] == b"\x1f\x8b":
        raw = gzip.decompress(raw)
    r = _Reader(raw)

    name = r.token()
    version = r.int()
    if not (8 <= version <= 16):
        raise ModelParseError(f"model version {version} unsupported (want 8..16)")
    num_spatial = r.int()
    num_global = r.int()

    pp = {"td_score_mult": 20.0, "scoremean_mult": 20.0,
          "scorestdev_mult": 20.0, "lead_mult": 20.0,
          "variance_time_mult": 40.0, "shortterm_value_error_mult": 0.25,
          "shortterm_score_error_mult": 30.0}
    if version >= 13:
        for k in list(pp):
            pp[k] = r.float()
    if version >= 15:
        meta_version = r.int()
        if meta_version != 0:
            raise ModelParseError("metadata encoder not yet supported")
        for _ in range(7):  # preferPassAlive + 6 reserved
            if r.int() != 0:
                raise ModelParseError("unsupported reserved model option")

    # ---- trunk ----
    tname = r.token()
    if tname != "trunk":
        raise ModelParseError(f"expected 'trunk', got {tname!r}")
    num_blocks = r.int()
    trunk_ch = r.int()
    mid_ch = r.int()
    regular_ch = r.int()
    _dilated_ch = r.int()
    gpool_ch = r.int()
    if version >= 15:
        trunk_norm_kind = r.int()
        if trunk_norm_kind != 0:
            raise ModelParseError("rmsnorm trunk final unsupported yet")
        for _ in range(5):
            if r.int() != 0:
                raise ModelParseError("unsupported trunk option")
    initial_conv = _parse_conv(r)
    initial_matmul = _parse_matmul(r)
    blocks = [_parse_block(r, version) for _ in range(num_blocks)]
    trunk_final_bn = _parse_bn(r)
    trunk_final_act = _parse_act(r, version)
    trunk = {
        "num_blocks": num_blocks, "trunk_ch": trunk_ch, "mid_ch": mid_ch,
        "regular_ch": regular_ch, "gpool_ch": gpool_ch,
        "initial_conv": initial_conv, "initial_matmul": initial_matmul,
        "blocks": blocks, "final_bn": trunk_final_bn,
        "final_act": trunk_final_act,
    }

    # ---- policy head ----
    ph: dict = {"name": r.token()}
    ph["p1_conv"] = _parse_conv(r)
    ph["g1_conv"] = _parse_conv(r)
    ph["g1_bn"] = _parse_bn(r)
    ph["g1_act"] = _parse_act(r, version)
    ph["gpool_to_bias"] = _parse_matmul(r)
    ph["p1_bn"] = _parse_bn(r)
    ph["p1_act"] = _parse_act(r, version)
    ph["p2_conv"] = _parse_conv(r)
    ph["gpool_to_pass"] = _parse_matmul(r)
    if version >= 15:
        ph["pass_bias"] = _parse_matbias(r)
        ph["pass_act"] = _parse_act(r, version)
        ph["gpool_to_pass2"] = _parse_matmul(r)

    # ---- value head ----
    vh: dict = {"name": r.token()}
    vh["v1_conv"] = _parse_conv(r)
    vh["v1_bn"] = _parse_bn(r)
    vh["v1_act"] = _parse_act(r, version)
    vh["v2_mul"] = _parse_matmul(r)
    vh["v2_bias"] = _parse_matbias(r)
    vh["v2_act"] = _parse_act(r, version)
    vh["v3_mul"] = _parse_matmul(r)
    vh["v3_bias"] = _parse_matbias(r)
    vh["sv3_mul"] = _parse_matmul(r)
    vh["sv3_bias"] = _parse_matbias(r)
    vh["ownership_conv"] = _parse_conv(r)

    return ModelDesc(name=name, version=version,
                     num_spatial_inputs=num_spatial,
                     num_global_inputs=num_global, sha256=sha256,
                     post_process=pp, trunk=trunk, policy_head=ph,
                     value_head=vh)


# ---- JAX forward over a parsed desc --------------------------------------

def _act(name):
    from katago_tpu.models.model import act_fn
    return act_fn(name)


def _conv(x, c: Conv):
    return jax.lax.conv_general_dilated(
        x, jnp.asarray(c.kernel), window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _bn(x, bn: BatchNorm, mask):
    return (x * jnp.asarray(bn.scale) + jnp.asarray(bn.bias)) * mask


def _gpool(x, mask, mask_sum_hw):
    sqrt_off = jnp.sqrt(mask_sum_hw) - 14.0
    mean = jnp.sum(x, axis=(1, 2), keepdims=True) / mask_sum_hw
    mx = jnp.max(x + (mask - 1.0) * 5000.0, axis=(1, 2), keepdims=True)
    out = jnp.concatenate([mean, mean * (sqrt_off / 10.0), mx], axis=-1)
    return out[:, 0, 0, :]


def _vgpool(x, mask, mask_sum_hw):
    sqrt_off = jnp.sqrt(mask_sum_hw) - 14.0
    mean = jnp.sum(x, axis=(1, 2), keepdims=True) / mask_sum_hw
    out = jnp.concatenate([mean, mean * (sqrt_off / 10.0),
                           mean * (sqrt_off * sqrt_off / 100.0 - 0.1)],
                          axis=-1)
    return out[:, 0, 0, :]


def _apply_block(x, blk, mask, mask_sum_hw):
    act = _act
    if blk["kind"] == "ordinary":
        out = _bn(x, blk["pre_bn"], mask)
        out = act(blk["pre_act"])(out)
        out = _conv(out, blk["regular_conv"])
        out = _bn(out, blk["mid_bn"], mask)
        out = act(blk["mid_act"])(out)
        out = _conv(out, blk["final_conv"])
        return x + out
    if blk["kind"] == "gpool":
        out = _bn(x, blk["pre_bn"], mask)
        out = act(blk["pre_act"])(out)
        outr = _conv(out, blk["regular_conv"])
        outg = _conv(out, blk["gpool_conv"])
        outg = _bn(outg, blk["gpool_bn"], mask)
        outg = act(blk["gpool_act"])(outg)
        pooled = _gpool(outg, mask, mask_sum_hw)
        bias = pooled @ jnp.asarray(blk["gpool_to_bias"].weight)
        outr = outr + bias[:, None, None, :]
        outr = _bn(outr, blk["mid_bn"], mask)
        outr = act(blk["mid_act"])(outr)
        outr = _conv(outr, blk["final_conv"])
        return x + outr
    if blk["kind"] == "nested":
        out = _bn(x, blk["pre_bn"], mask)
        out = act(blk["pre_act"])(out)
        out = _conv(out, blk["pre_conv"])
        for sub in blk["sub_blocks"]:
            out = _apply_block(out, sub, mask, mask_sum_hw)
        out = _bn(out, blk["post_bn"], mask)
        out = act(blk["post_act"])(out)
        out = _conv(out, blk["post_conv"])
        return x + out
    raise ValueError(blk["kind"])


def apply_desc_model(desc: ModelDesc, spatial, global_in, mask=None) -> dict:
    """Forward a parsed reference model. spatial [B,H,W,22] NHWC, global
    [B,19]. Returns the same raw-output dict shape as KataGoModel (policy
    channel 0 = play policy; channel 1 = optimistic policy when present)."""
    b, h, w, _ = spatial.shape
    if mask is None:
        mask = jnp.ones((b, h, w, 1), jnp.float32)
    mask_sum_hw = jnp.sum(mask, axis=(1, 2), keepdims=True)
    act = _act
    t = desc.trunk

    x = _conv(spatial, t["initial_conv"])
    x = x + (global_in @ jnp.asarray(t["initial_matmul"].weight))[:, None, None, :]
    for blk in t["blocks"]:
        x = _apply_block(x, blk, mask, mask_sum_hw)
    x = _bn(x, t["final_bn"], mask)
    x = act(t["final_act"])(x)

    # policy head
    ph = desc.policy_head
    p1 = _conv(x, ph["p1_conv"])
    g1 = _conv(x, ph["g1_conv"])
    g1 = _bn(g1, ph["g1_bn"], mask)
    g1 = act(ph["g1_act"])(g1)
    pooled = _gpool(g1, mask, mask_sum_hw)
    p1 = p1 + (pooled @ jnp.asarray(ph["gpool_to_bias"].weight))[:, None, None, :]
    p1 = _bn(p1, ph["p1_bn"], mask)
    p1 = act(ph["p1_act"])(p1)
    p2 = _conv(p1, ph["p2_conv"])             # [B,H,W,Cpol]
    p2 = p2 - (1.0 - mask) * 5000.0
    if desc.version >= 15:
        outpass = pooled @ jnp.asarray(ph["gpool_to_pass"].weight)
        outpass = outpass + jnp.asarray(ph["pass_bias"].bias)
        outpass = act(ph["pass_act"])(outpass)
        outpass = outpass @ jnp.asarray(ph["gpool_to_pass2"].weight)
    else:
        outpass = pooled @ jnp.asarray(ph["gpool_to_pass"].weight)
    n_pol = p2.shape[-1]
    policy = jnp.concatenate(
        [p2.reshape(b, h * w, n_pol), outpass[:, None, :]], axis=1)
    policy = policy.transpose(0, 2, 1)        # [B, Cpol, NN+1]

    # value head
    vh = desc.value_head
    v1 = _conv(x, vh["v1_conv"])
    v1 = _bn(v1, vh["v1_bn"], mask)
    v1 = act(vh["v1_act"])(v1)
    vpooled = _vgpool(v1, mask, mask_sum_hw)
    v2 = vpooled @ jnp.asarray(vh["v2_mul"].weight) + jnp.asarray(vh["v2_bias"].bias)
    v2 = act(vh["v2_act"])(v2)
    value = v2 @ jnp.asarray(vh["v3_mul"].weight) + jnp.asarray(vh["v3_bias"].bias)
    sv = v2 @ jnp.asarray(vh["sv3_mul"].weight) + jnp.asarray(vh["sv3_bias"].bias)
    own = _conv(v1, vh["ownership_conv"]) * mask

    # pad miscvalue to the KataGoModel 10-channel layout
    pad = jnp.zeros((b, 10 - sv.shape[-1]), sv.dtype)
    miscvalue = jnp.concatenate([sv, pad], axis=-1)
    return {
        "policy_logits": policy,
        "value_logits": value,
        "miscvalue": miscvalue,
        "moremiscvalue": jnp.zeros((b, 8), sv.dtype),
        "ownership_pretanh": own[..., 0],
        "scoring_presoftmax": jnp.zeros_like(own[..., 0]),
        "futurepos_pretanh": jnp.zeros((b, h, w, 2), sv.dtype),
        "seki_logits": jnp.zeros((b, h, w, 4), sv.dtype),
        "scorebelief_logprobs": jnp.zeros((b, 2), sv.dtype),
    }


def make_desc_apply(desc: ModelDesc):
    """model_apply(params, spatial, global) signature adapter so a parsed
    reference net drops into run_search / selfplay unchanged."""

    def apply(params, spatial, glob):
        del params
        return apply_desc_model(desc, spatial, glob)

    return apply
