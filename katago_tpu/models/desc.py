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
model versions 3..17 (the reference's full supported range,
modelversion.cpp:30-33) — conv families (ordinary / gpool /
nested-bottleneck blocks), v17 transformer blocks (GQA attention with
fixed or learnable 2-D RoPE, SwiGLU FFN, rmsnorm trunk tip;
desc.cpp:1176-1414,1658-1770) and the v15+ SGF-metadata encoder
(desc.cpp:1567-1614). Pre-v8 files differ only in value-head channel
counts and output semantics, normalized below.

Input features follow modelversion.cpp getInputsVersion: model v3/v4 ->
V3, v5 -> V4, v6 -> V5, v7 -> V6, v8..v17 -> V7 — all provided by
katago_tpu.models.features (ModelDesc.input_version picks the row).
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


@dataclasses.dataclass
class TRMSNorm:
    """Weight-only RMSNorm inside transformer blocks (desc.cpp:1124-1143)."""
    name: str
    channels: int
    eps: float
    weight: np.ndarray


@dataclasses.dataclass
class RMSNormLayer:
    """Trunk-tip RMSNorm with gamma+beta (desc.cpp:1069-1095)."""
    name: str
    channels: int
    eps: float
    spatial: bool
    gamma: np.ndarray
    beta: np.ndarray


def _parse_trmsnorm(r: _Reader) -> TRMSNorm:
    name = r.token()
    c = r.int()
    eps = r.float()
    return TRMSNorm(name, c, eps, r.floats(c))


def _parse_rmsnorm_layer(r: _Reader) -> RMSNormLayer:
    name = r.token()
    c = r.int()
    eps = r.float()
    spatial = r.int() != 0
    cgroup = r.int()
    if cgroup != 0:
        raise ModelParseError(f"{name}: grouped spatial rmsnorm unsupported")
    gamma = r.floats(c)
    beta = r.floats(c)
    return RMSNormLayer(name, c, eps, spatial, gamma, beta)


def _parse_attention(r: _Reader) -> dict:
    """transformer_attention_block (desc.cpp:1176-1254)."""
    name = r.token()
    num_heads = r.int()
    num_kv_heads = r.int()
    q_head_dim = r.int()
    v_head_dim = r.int()
    use_rope = r.int() != 0
    learnable_rope = r.int() != 0
    if num_heads < 1 or num_kv_heads < 1 or num_heads % num_kv_heads != 0:
        raise ModelParseError(f"{name}: bad head counts")
    if use_rope and q_head_dim % 2 != 0:
        raise ModelParseError(f"{name}: qHeadDim must be even with RoPE")
    blk = {
        "kind": "attention", "name": name,
        "num_heads": num_heads, "num_kv_heads": num_kv_heads,
        "q_head_dim": q_head_dim, "v_head_dim": v_head_dim,
        "use_rope": use_rope, "learnable_rope": learnable_rope,
        "pre_ln": _parse_trmsnorm(r),
        "q_proj": _parse_matmul(r), "k_proj": _parse_matmul(r),
        "v_proj": _parse_matmul(r), "out_proj": _parse_matmul(r),
        "rope_theta": 0.0, "rope_freqs": None,
    }
    if blk["q_proj"].out_ch != num_heads * q_head_dim:
        raise ModelParseError(f"{name}: qProj shape mismatch")
    if blk["k_proj"].out_ch != num_kv_heads * q_head_dim:
        raise ModelParseError(f"{name}: kProj shape mismatch")
    if blk["v_proj"].out_ch != num_kv_heads * v_head_dim:
        raise ModelParseError(f"{name}: vProj shape mismatch")
    if use_rope:
        r.token()  # rope_freqs / rope_theta tensor name
        if learnable_rope:
            kvh = r.int()
            pairs = r.int()
            dim2 = r.int()
            if kvh != num_kv_heads or pairs != q_head_dim // 2 or dim2 != 2:
                raise ModelParseError(f"{name}: bad learnable rope header")
            blk["rope_freqs"] = r.floats(kvh * pairs * 2).reshape(
                kvh, pairs, 2)
        else:
            blk["rope_theta"] = r.float()
            if not blk["rope_theta"] > 0:
                raise ModelParseError(f"{name}: rope theta must be positive")
    return blk


def _parse_ffn(r: _Reader) -> dict:
    """transformer_ffn_block (desc.cpp:1374-1408)."""
    name = r.token()
    channels = r.int()
    ffn_channels = r.int()
    use_swiglu = r.int() != 0
    blk = {
        "kind": "ffn", "name": name, "channels": channels,
        "ffn_channels": ffn_channels, "use_swiglu": use_swiglu,
        "pre_ln": _parse_trmsnorm(r),
        "linear1": _parse_matmul(r),
        "linear_gate": _parse_matmul(r) if use_swiglu else None,
        "linear2": _parse_matmul(r),
    }
    if blk["linear1"].in_ch != channels or blk["linear1"].out_ch != ffn_channels:
        raise ModelParseError(f"{name}: linear1 shape mismatch")
    if blk["linear2"].in_ch != ffn_channels or blk["linear2"].out_ch != channels:
        raise ModelParseError(f"{name}: linear2 shape mismatch")
    return blk


def _parse_metadata_encoder(r: _Reader, version: int) -> dict:
    """SGF metadata encoder (desc.cpp:1572-1614): 192-float -> MLP -> trunk
    bias. The exporter folds the feature mask and output scale into
    mul1/mul3 (export_model_pytorch.py write_metadata_encoder)."""
    name = r.token()
    in_ch = r.int()
    if in_ch != 192:
        raise ModelParseError(f"{name}: meta encoder wants 192 in-channels")
    return {
        "name": name, "in_ch": in_ch,
        "mul1": _parse_matmul(r), "bias1": _parse_matbias(r),
        "act1": _parse_act(r, version),
        "mul2": _parse_matmul(r), "bias2": _parse_matbias(r),
        "act2": _parse_act(r, version),
        "mul3": _parse_matmul(r),
    }


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
    if kind == "transformer_attention_block":
        return _parse_attention(r)
    if kind == "transformer_ffn_block":
        return _parse_ffn(r)
    raise ModelParseError(f"unsupported block kind {kind!r}")


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
    meta_encoder_version: int = 0
    prefer_pass_alive: bool = False

    @property
    def num_policy_channels(self) -> int:
        return self.policy_head["p2_conv"].out_ch

    @property
    def input_version(self) -> int:
        """Input-feature version for this model (modelversion.cpp:35-48)."""
        v = self.version
        if v >= 8:
            return 7
        return {3: 3, 4: 3, 5: 4, 6: 5, 7: 6}[v]


def load_model(path: str) -> ModelDesc:
    """Parse a reference-format model file (.bin.gz / .txt.gz / raw)."""
    raw = open(path, "rb").read()
    sha256 = hashlib.sha256(raw).hexdigest()
    if raw[:2] == b"\x1f\x8b":
        raw = gzip.decompress(raw)
    r = _Reader(raw)

    name = r.token()
    version = r.int()
    if not (3 <= version <= 17):
        raise ModelParseError(f"model version {version} unsupported (want 3..17)")
    num_spatial = r.int()
    num_global = r.int()

    pp = {"td_score_mult": 20.0, "scoremean_mult": 20.0,
          "scorestdev_mult": 20.0, "lead_mult": 20.0,
          "variance_time_mult": 40.0, "shortterm_value_error_mult": 0.25,
          "shortterm_score_error_mult": 30.0}
    if version >= 13:
        for k in list(pp):
            pp[k] = r.float()
    meta_version = 0
    prefer_pass_alive = False
    if version >= 15:
        meta_version = r.int()
        if meta_version not in (0, 1):
            raise ModelParseError(
                f"metadata encoder version {meta_version} unsupported")
        prefer_pass_alive = r.int() != 0
        for _ in range(6):  # reserved
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
    trunk_norm_kind = 0
    if version >= 15:
        trunk_norm_kind = r.int()
        if trunk_norm_kind not in (0, 1):
            raise ModelParseError(
                f"trunk norm kind {trunk_norm_kind} unsupported")
        for _ in range(5):
            if r.int() != 0:
                raise ModelParseError("unsupported trunk option")
    initial_conv = _parse_conv(r)
    initial_matmul = _parse_matmul(r)
    meta_encoder = None
    if meta_version > 0:
        meta_encoder = _parse_metadata_encoder(r, version)
        if meta_encoder["mul3"].out_ch != trunk_ch:
            raise ModelParseError("meta encoder output != trunk channels")
    blocks = [_parse_block(r, version) for _ in range(num_blocks)]
    if trunk_norm_kind == 0:
        trunk_final_bn = _parse_bn(r)
        trunk_final_rms = None
    else:
        trunk_final_bn = None
        trunk_final_rms = _parse_rmsnorm_layer(r)
    trunk_final_act = _parse_act(r, version)
    trunk = {
        "num_blocks": num_blocks, "trunk_ch": trunk_ch, "mid_ch": mid_ch,
        "regular_ch": regular_ch, "gpool_ch": gpool_ch,
        "initial_conv": initial_conv, "initial_matmul": initial_matmul,
        "meta_encoder": meta_encoder,
        "blocks": blocks, "final_bn": trunk_final_bn,
        "final_rms": trunk_final_rms,
        "final_act": trunk_final_act,
    }

    # ---- policy head ----
    ph: dict = {"name": r.token()}
    if version >= 17:
        pol_out = r.int()
        if pol_out not in (2, 4):
            raise ModelParseError(f"bad policyOutChannels {pol_out}")
        ph["policy_out_channels"] = pol_out
        for _ in range(3):
            if r.int() != 0:
                raise ModelParseError("unsupported policy head option")
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
    if version >= 17:
        for _ in range(3):
            if r.int() != 0:
                raise ModelParseError("unsupported value head option")
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
                     value_head=vh, meta_encoder_version=meta_version,
                     prefer_pass_alive=prefer_pass_alive)


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


def _trms(x, n: TRMSNorm):
    """Weight-only RMSNorm over the channel dim (eigenbackend.cpp:866-918).
    Masked positions are zeroed by the residual-add mask."""
    ms = jnp.mean(jnp.square(x), axis=-1, keepdims=True)
    return x * jax.lax.rsqrt(ms + n.eps) * jnp.asarray(n.weight)


def _rope_tables(blk, h, w):
    """cos/sin [S, num_heads_or_1, D] matching computeRopeCosSin
    (desc.cpp:1301-1363): interleaved pairs; fixed rope = first half height
    angles, second half width; learnable rope = per-KV-head (x*fx + y*fy)."""
    d = blk["q_head_dim"]
    pairs = d // 2
    ys, xs = np.meshgrid(np.arange(h, dtype=np.float32),
                         np.arange(w, dtype=np.float32), indexing="ij")
    pos = np.stack([ys.reshape(-1), xs.reshape(-1)], axis=-1)  # [S,2] (y,x)
    if blk["learnable_rope"]:
        fr = np.asarray(blk["rope_freqs"], np.float32)  # [kv, pairs, 2(x,y)]
        # angle = x*freq_x + y*freq_y  (desc.cpp:1320)
        ang = (pos[:, None, None, 1] * fr[None, :, :, 0]
               + pos[:, None, None, 0] * fr[None, :, :, 1])  # [S,kv,pairs]
    else:
        half = pairs // 2
        theta = blk["rope_theta"]
        freq = 1.0 / theta ** (2.0 * np.arange(half, dtype=np.float32) / pairs)
        ang_h = pos[:, 0:1] * freq[None, :]   # [S, half]
        ang_w = pos[:, 1:2] * freq[None, :]
        ang = np.concatenate([ang_h, ang_w], axis=-1)[:, None, :]  # [S,1,pairs]
    ang = np.repeat(ang, 2, axis=-1)          # interleave: pair p -> 2p,2p+1
    return jnp.asarray(np.cos(ang)), jnp.asarray(np.sin(ang))


def _rot2(x):
    x2 = x.reshape(x.shape[:-1] + (-1, 2))
    return jnp.stack([-x2[..., 1], x2[..., 0]], axis=-1).reshape(x.shape)


def _apply_attention(x, blk, mask):
    """GQA attention over board positions (eigenbackend.cpp:1374-1612)."""
    b, h, w, c = x.shape
    s = h * w
    nh, nkv = blk["num_heads"], blk["num_kv_heads"]
    qd, vd = blk["q_head_dim"], blk["v_head_dim"]
    xs = _trms(x.reshape(b, s, c), blk["pre_ln"])
    q = (xs @ jnp.asarray(blk["q_proj"].weight)).reshape(b, s, nh, qd)
    k = (xs @ jnp.asarray(blk["k_proj"].weight)).reshape(b, s, nkv, qd)
    v = (xs @ jnp.asarray(blk["v_proj"].weight)).reshape(b, s, nkv, vd)
    if blk["use_rope"]:
        cos, sin = _rope_tables(blk, h, w)    # [S, kv|1, D]
        if blk["learnable_rope"]:
            # q heads map to their kv head's table (eigenbackend.cpp:1444)
            rep = nh // nkv
            qcos = jnp.repeat(cos, rep, axis=1)[None]
            qsin = jnp.repeat(sin, rep, axis=1)[None]
            kcos, ksin = cos[None], sin[None]
        else:
            qcos = kcos = cos[None]
            qsin = ksin = sin[None]
        q = q * qcos + _rot2(q) * qsin
        k = k * kcos + _rot2(k) * ksin
    if nh != nkv:
        k = jnp.repeat(k, nh // nkv, axis=2)
        v = jnp.repeat(v, nh // nkv, axis=2)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) / np.sqrt(qd)
    key_mask = mask.reshape(b, 1, 1, s)
    logits = jnp.where(key_mask > 0, logits, -1e30)
    att = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", att, v).reshape(b, s, nh * vd)
    out = out @ jnp.asarray(blk["out_proj"].weight)
    return x + out.reshape(b, h, w, c) * mask


def _apply_ffn(x, blk, mask):
    """SwiGLU / plain FFN (eigenbackend.cpp:1643-1720): silu applies to
    linear1's output, multiplied by the gate projection."""
    b, h, w, c = x.shape
    xs = _trms(x.reshape(b, h * w, c), blk["pre_ln"])
    y = xs @ jnp.asarray(blk["linear1"].weight)
    if blk["use_swiglu"]:
        y = jax.nn.silu(y) * (xs @ jnp.asarray(blk["linear_gate"].weight))
    else:
        y = jax.nn.relu(y)
    y = y @ jnp.asarray(blk["linear2"].weight)
    return x + y.reshape(b, h, w, c) * mask


def _apply_block(x, blk, mask, mask_sum_hw):
    act = _act
    if blk["kind"] == "attention":
        return _apply_attention(x, blk, mask)
    if blk["kind"] == "ffn":
        return _apply_ffn(x, blk, mask)
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


def _inv_softplus(t):
    """Inverse of softplus for t > 0: log(expm1(t)) = t + log1p(-exp(-t))."""
    t = jnp.maximum(t, 1e-6)
    return t + jnp.log1p(-jnp.exp(-t))


def _normalize_value_channels(desc: ModelDesc, sv, mask_sum_hw):
    """Map a version's sv3 outputs onto the v14-native raw channels the
    engine postprocess expects (see apply_desc_model). Returns
    ([mv0..mv3], [mmv0, mmv1]) lists of [B] arrays.

    Version semantics (nneval.cpp:1059-1199):
      v3: one pre-atan scoreValue; whiteScoreMean =
          tan(atan(sv0))*2*sqrt(boardArea) = sv0*2*sqrtArea exactly, with
          scoreStdev 0 and lead = scoreMean (nneval.cpp:1063-1094)
      v4-7: (scoreMean, scoreStdev); lead falls back to scoreMean,
          varianceTime unavailable -> 0 (reference reports -1)
      v8: + (lead, varianceTime)
      v9: + shortterm errors, engine-side plain softplus (x, x*10)
      v10-13: errors sqrt(softplus(x)*mult)
      v14+: errors softplus(x/2)*sqrt(mult) — the native convention
    Non-default v13+ postprocess multipliers are folded in (linear
    channels by ratio; softplus channels through an exact
    inverse-softplus rebase), so custom-scaled models stay bit-honest."""
    b = sv.shape[0]
    v = desc.version
    pp = desc.post_process
    zero = jnp.zeros((b,), sv.dtype)
    neg = jnp.full((b,), -1e4, sv.dtype)   # softplus -> 0

    def rebase_softplus(x, mult, default):
        if mult == default:
            return x
        return _inv_softplus(jax.nn.softplus(x) * (mult / default))

    if v == 3:
        sqrt_area = jnp.sqrt(mask_sum_hw[:, 0, 0, 0])
        mean_raw = sv[:, 0] * 2.0 * sqrt_area / 20.0
        return [mean_raw, neg, mean_raw, neg], [zero, zero]
    if v <= 7:
        return [sv[:, 0], sv[:, 1], sv[:, 0], neg], [zero, zero]
    mv = [sv[:, 0] * (pp["scoremean_mult"] / 20.0),
          rebase_softplus(sv[:, 1], pp["scorestdev_mult"], 20.0),
          sv[:, 2] * (pp["lead_mult"] / 20.0),
          rebase_softplus(sv[:, 3], pp["variance_time_mult"], 40.0)]
    if v == 8:
        return mv, [zero, zero]
    wl_mult = pp["shortterm_value_error_mult"]
    sc_mult = pp["shortterm_score_error_mult"]
    if v >= 14:
        if wl_mult == 0.25 and sc_mult == 30.0:
            return mv, [sv[:, 4], sv[:, 5]]
        err_wl = jax.nn.softplus(sv[:, 4] * 0.5) * np.sqrt(wl_mult)
        err_sc = jax.nn.softplus(sv[:, 5] * 0.5) * np.sqrt(sc_mult)
    elif v >= 10:
        err_wl = jnp.sqrt(jax.nn.softplus(sv[:, 4]) * wl_mult)
        err_sc = jnp.sqrt(jax.nn.softplus(sv[:, 5]) * sc_mult)
    else:  # v9: engine-side plain softplus, score error x10
        err_wl = jax.nn.softplus(sv[:, 4])
        err_sc = jax.nn.softplus(sv[:, 5]) * 10.0
    return mv, [2.0 * _inv_softplus(err_wl * 2.0),
                2.0 * _inv_softplus(err_sc / np.sqrt(30.0))]


def apply_desc_model(desc: ModelDesc, spatial, global_in, mask=None,
                     metadata=None) -> dict:
    """Forward a parsed reference model. spatial [B,H,W,22] NHWC, global
    [B,19], optional metadata [B,192] (humanSL nets, meta_encoder_version
    1). Returns the same raw-output dict shape as KataGoModel (policy
    channel 0 = play policy; channel 1 = optimistic policy when present;
    channels 2,3 = q winloss / q score on 4-channel v17 heads)."""
    b, h, w, _ = spatial.shape
    if mask is None:
        mask = jnp.ones((b, h, w, 1), jnp.float32)
    mask_sum_hw = jnp.sum(mask, axis=(1, 2), keepdims=True)
    act = _act
    t = desc.trunk

    x = _conv(spatial, t["initial_conv"])
    x = x + (global_in @ jnp.asarray(t["initial_matmul"].weight))[:, None, None, :]
    if t.get("meta_encoder") is not None:
        me = t["meta_encoder"]
        if metadata is None:
            metadata = jnp.zeros((b, 192), jnp.float32)
        m = metadata @ jnp.asarray(me["mul1"].weight) + jnp.asarray(me["bias1"].bias)
        m = act(me["act1"])(m)
        m = m @ jnp.asarray(me["mul2"].weight) + jnp.asarray(me["bias2"].bias)
        m = act(me["act2"])(m)
        m = m @ jnp.asarray(me["mul3"].weight)
        x = x + m[:, None, None, :]
    for blk in t["blocks"]:
        x = _apply_block(x, blk, mask, mask_sum_hw)
    if t.get("final_rms") is not None:
        fr = t["final_rms"]
        if fr.spatial:
            # RMS over all on-board positions and channels per batch element
            ssum = jnp.sum(jnp.square(x) * mask, axis=(1, 2, 3), keepdims=True)
            cnt = mask_sum_hw[..., 0:1] * x.shape[-1]
            rms = jax.lax.rsqrt(ssum / cnt + fr.eps)
        else:
            rms = jax.lax.rsqrt(
                jnp.mean(jnp.square(x), axis=-1, keepdims=True) + fr.eps)
        x = (x * rms * jnp.asarray(fr.gamma) + jnp.asarray(fr.beta)) * mask
    else:
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

    # sv3 rows map to (scoremean, scorestdev, lead, vtime, shortterm value
    # err, shortterm score err) — the first 4 are miscvalue channels 0-3,
    # the last 2 are moremiscvalue channels 0-1 (export_model_pytorch.py
    # write_value_head). Older versions carry fewer channels with
    # different activations (nneval.cpp:1059-1199, desc.cpp:2305-2330);
    # everything is normalized here to the engine's v14-native channel
    # conventions so nn_leaf_eval needs no version knowledge:
    #   mv0*20=scoreMean  softplus(mv1)*20=scoreStdev  mv2*20=lead
    #   softplus(mv3)*40=varTime  softplus(mmv/2)*sqrt(mult)=st errors
    mv, mmv01 = _normalize_value_channels(desc, sv, mask_sum_hw)
    miscvalue = jnp.concatenate(
        [jnp.stack(mv, axis=-1), jnp.zeros((b, 6), sv.dtype)], axis=-1)
    moremiscvalue = jnp.concatenate(
        [jnp.stack(mmv01, axis=-1), jnp.zeros((b, 6), sv.dtype)], axis=-1)
    return {
        **({} if desc.version >= 9 else
           {"supports_shortterm_error": False}),
        "policy_logits": policy,
        "value_logits": value,
        "miscvalue": miscvalue,
        "moremiscvalue": moremiscvalue,
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
