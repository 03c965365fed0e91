"""KataGo-family neural network in flax — the single TPU backend.

Replaces all five reference inference backends (CUDA/TensorRT/OpenCL/Eigen/
Metal, ~28k LoC, /root/reference/cpp/neuralnet/) and mirrors the training
architecture of python/katago/train/model_pytorch.py: masked conv trunk with
fixup initialization, global-pooling bias structure (KataGPool: mean,
mean*(sqrt(area)-14)/10, max — model_pytorch.py:492), regular and nested-
bottleneck residual blocks, and the full KataGo head set (6-channel policy
with pass logit, win/loss/noresult value, score mean/stdev/lead/vartime,
shortterm error heads, ownership, scoring, futurepos, seki, mixture
score-belief distribution — model_pytorch.py:2593,2717).

TPU-first choices: NHWC layout throughout, bfloat16 trunk compute with
float32 params and float32 heads (policy/value logits are precision
sensitive), everything shape-static under jit. The board-size mask
machinery matches the reference so mixed-size batches stay exact (mask
after every norm, true-area divisors in pooling).
"""

from __future__ import annotations

import math
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from katago_tpu.models.config import ModelConfig

# init gains, reference model_pytorch.py:85-100
_GAINS = {
    "relu": math.sqrt(2.0),
    "elu": math.sqrt(1.55052),
    "mish": math.sqrt(2.210277),
    "silu": math.sqrt(2.0),
    "gelu": math.sqrt(2.351718),
    "identity": 1.0,
}

_TRUNC_CORRECTION = 0.87962566103423978


def act_fn(name: str):
    return {
        "relu": jax.nn.relu,
        "elu": jax.nn.elu,
        "mish": lambda x: x * jnp.tanh(jax.nn.softplus(x)),
        "silu": jax.nn.silu,
        "gelu": jax.nn.gelu,
        "identity": lambda x: x,
    }[name]


def katago_init(activation: str, scale: float):
    """Truncated-normal init: std = scale*gain/sqrt(fan_in)/0.8796, +-2 std.

    Matches init_weights (model_pytorch.py:102-117). scale == 0 -> zeros
    (fixup zero-init of the last conv in each residual branch).
    """
    gain = _GAINS[activation]

    def init(key, shape, dtype=jnp.float32):
        if scale == 0.0:
            return jnp.zeros(shape, dtype)
        if len(shape) == 4:      # conv kernel HWIO
            fan_in = shape[0] * shape[1] * shape[2]
        elif len(shape) == 2:    # dense (in, out)
            fan_in = shape[0]
        else:
            fan_in = shape[-1]
        std = scale * gain / math.sqrt(fan_in) / _TRUNC_CORRECTION
        return std * jax.random.truncated_normal(key, -2.0, 2.0, shape, dtype)

    return init


class NormMask(nn.Module):
    """Fixup 'norm': optional per-channel gamma + beta, then mask.

    Reference NormMask with norm_kind == fixup (model_pytorch.py:265-489):
    no actual normalization, just (x [*gamma] + beta) * mask.
    """
    channels: int
    use_gamma: bool = False

    @nn.compact
    def __call__(self, x, mask):
        beta = self.param("beta", nn.initializers.zeros, (self.channels,))
        if self.use_gamma:
            gamma = self.param("gamma", nn.initializers.ones, (self.channels,))
            x = x * gamma.astype(x.dtype)
        return (x + beta.astype(x.dtype)) * mask


def kata_gpool(x, mask, mask_sum_hw):
    """(mean, mean*(sqrt(area)-14)/10, max) pooled over the board.

    x: [B,H,W,C]; mask: [B,H,W,1]; mask_sum_hw: [B,1,1,1]. Returns [B,3C].
    Max is mask-safe because activations are > -1 and off-board is 0
    (reference KataGPool, model_pytorch.py:492-519).
    """
    xf = x.astype(jnp.float32)
    sqrt_off = jnp.sqrt(mask_sum_hw) - 14.0
    mean = jnp.sum(xf, axis=(1, 2), keepdims=True) / mask_sum_hw
    mx = jnp.max(xf + (mask - 1.0), axis=(1, 2), keepdims=True)
    out = jnp.concatenate([mean, mean * (sqrt_off / 10.0), mx], axis=-1)
    return out[:, 0, 0, :]


def value_head_gpool(x, mask, mask_sum_hw):
    """(mean, mean*off/10, mean*(off^2/100 - 0.1)) — model_pytorch.py:521."""
    xf = x.astype(jnp.float32)
    sqrt_off = jnp.sqrt(mask_sum_hw) - 14.0
    mean = jnp.sum(xf, axis=(1, 2), keepdims=True) / mask_sum_hw
    out = jnp.concatenate(
        [mean, mean * (sqrt_off / 10.0),
         mean * (sqrt_off * sqrt_off / 100.0 - 0.1)], axis=-1)
    return out[:, 0, 0, :]


class Conv(nn.Module):
    features: int
    kernel: int
    activation: str
    scale: float
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.Conv(self.features, (self.kernel, self.kernel),
                       use_bias=False, dtype=self.dtype,
                       kernel_init=katago_init(self.activation, self.scale))(x)


class ConvAndGPool(nn.Module):
    """Conv branch + global-pooling bias branch (KataConvAndGPool)."""
    c_out: int
    c_gpool: int
    activation: str
    scale: float
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask, mask_sum_hw):
        r_scale, g_scale = 0.8, 0.6
        outr = Conv(self.c_out, 3, self.activation,
                    self.scale * r_scale, self.dtype)(x)
        outg = Conv(self.c_gpool, 3, self.activation,
                    math.sqrt(self.scale) * math.sqrt(g_scale), self.dtype)(x)
        outg = NormMask(self.c_gpool)(outg, mask)
        outg = act_fn(self.activation)(outg)
        pooled = kata_gpool(outg, mask, mask_sum_hw)  # [B, 3*c_gpool] f32
        bias = nn.Dense(self.c_out, use_bias=False, dtype=self.dtype,
                        kernel_init=katago_init(
                            self.activation,
                            math.sqrt(self.scale) * math.sqrt(g_scale)))(
                                pooled.astype(self.dtype))
        return outr + bias[:, None, None, :]


class NormActConv(nn.Module):
    """norm -> act -> conv (optionally with gpool branch)."""
    c_in: int
    c_out: int
    activation: str
    kernel: int
    scale: float
    c_gpool: Optional[int] = None
    use_gamma: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask, mask_sum_hw):
        x = NormMask(self.c_in, use_gamma=self.use_gamma)(x, mask)
        x = act_fn(self.activation)(x)
        if self.c_gpool is not None:
            return ConvAndGPool(self.c_out, self.c_gpool, self.activation,
                                self.scale, self.dtype)(x, mask, mask_sum_hw)
        return Conv(self.c_out, self.kernel, self.activation,
                    self.scale, self.dtype)(x)


class ResBlock(nn.Module):
    """Pre-activation residual block, returns the residual only."""
    c_main: int
    c_mid: int
    activation: str
    fixup_scale: float
    c_gpool: Optional[int] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask, mask_sum_hw):
        c_inner = self.c_mid - (self.c_gpool or 0)
        out = NormActConv(self.c_main, c_inner, self.activation, 3,
                          self.fixup_scale, c_gpool=self.c_gpool,
                          dtype=self.dtype)(x, mask, mask_sum_hw)
        out = NormActConv(c_inner, self.c_main, self.activation, 3,
                          0.0, use_gamma=True,
                          dtype=self.dtype)(out, mask, mask_sum_hw)
        return out


class NestedBottleneckResBlock(nn.Module):
    """1x1 down -> internal_length ResBlocks -> 1x1 up; returns residual."""
    c_main: int
    c_mid: int
    internal_length: int
    activation: str
    fixup_scale: float
    c_gpool: Optional[int] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask, mask_sum_hw):
        inner_scale = math.pow(self.fixup_scale, 1.0 / (1.0 + self.internal_length))
        out = NormActConv(self.c_main, self.c_mid, self.activation, 1,
                          inner_scale, dtype=self.dtype)(x, mask, mask_sum_hw)
        for i in range(self.internal_length):
            out = out + ResBlock(
                self.c_mid, self.c_mid, self.activation, inner_scale,
                c_gpool=(self.c_gpool if i == 0 else None),
                dtype=self.dtype)(out, mask, mask_sum_hw)
        out = NormActConv(self.c_mid, self.c_main, self.activation, 1,
                          0.0, use_gamma=True,
                          dtype=self.dtype)(out, mask, mask_sum_hw)
        return out


class RMSNorm(nn.Module):
    """torch.nn.RMSNorm equivalent (model_pytorch.py transformer norms)."""
    features: int
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        xf = x.astype(jnp.float32)
        ms = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
        return (xf * jax.lax.rsqrt(ms + self.eps) * scale).astype(x.dtype)


def rope_cos_sin_2d(dim: int, pos_len: int, theta: float = 100.0):
    """precompute_freqs_cos_sin_2d (model_pytorch.py:1415-1435): 2-D RoPE
    tables, interleaved layout. Returns (cos, sin) f32[pos_len^2, dim]."""
    assert dim % 4 == 0
    dim_half = dim // 2
    freqs = 1.0 / (theta ** (np.arange(0, dim_half, 2, dtype=np.float32)
                             / dim_half))
    t = np.arange(pos_len, dtype=np.float32)
    grid_h, grid_w = np.meshgrid(t, t, indexing="ij")
    emb_h = grid_h[..., None] * freqs
    emb_w = grid_w[..., None] * freqs
    emb = np.concatenate([emb_h, emb_w], axis=-1).reshape(
        pos_len * pos_len, dim_half)
    emb = np.repeat(emb, 2, axis=-1)
    return np.cos(emb), np.sin(emb)


def _rotate_every_two(x):
    x2 = x.reshape(x.shape[:-1] + (-1, 2))
    x0, x1 = x2[..., 0], x2[..., 1]
    return jnp.stack([-x1, x0], axis=-1).reshape(x.shape)


def apply_rope(q, k, cos, sin):
    """apply_rotary_emb (model_pytorch.py:1437-1455). q,k: [B,S,H,D];
    cos,sin: [S,D]."""
    cos = cos[None, :, None, :]
    sin = sin[None, :, None, :]
    q2 = q * cos + _rotate_every_two(q) * sin
    k2 = k * cos + _rotate_every_two(k) * sin
    return q2.astype(q.dtype), k2.astype(k.dtype)


class GABTemplates(nn.Module):
    """Geometric Attention Bias template MLP (GABTemplateMLP,
    model_pytorch.py:1423-1470): learnable Fourier frequencies over the
    relative offsets (dr, dc, dr+dc, dr-dc) -> MLP -> T translational
    bias templates [S, S, T], shared by every GAB attention block."""
    cfg: ModelConfig
    pos_len: int

    @nn.compact
    def __call__(self, s: int):
        cfg = self.cfg
        F = cfg.gab_num_fourier_features
        T = cfg.gab_num_templates
        # geometric init 1 rad/square .. 1/50 rad/square
        freqs = self.param(
            "freqs", lambda _: jnp.exp(jnp.linspace(
                math.log(1.0), math.log(1.0 / 50.0), F)), )
        idx = np.arange(self.pos_len * self.pos_len)
        sr, sc = idx // self.pos_len, idx % self.pos_len
        dr = jnp.asarray((sr[:, None] - sr[None, :]).astype(np.float32))
        dc = jnp.asarray((sc[:, None] - sc[None, :]).astype(np.float32))
        dr, dc = dr[:s, :s], dc[:s, :s]
        combos = jnp.stack([dr, dc, dr + dc, dr - dc], -1)   # [S,S,4]
        ang = combos[..., None] * freqs                      # [S,S,4,F]
        feats = jnp.concatenate(
            [jnp.sin(ang), jnp.cos(ang)], axis=-1).reshape(s, s, 8 * F)
        h_ = nn.Dense(cfg.gab_mlp_hidden, name="linear1",
                      kernel_init=katago_init(cfg.activation, 1.0))(feats)
        h_ = act_fn(cfg.activation)(h_)
        t = nn.Dense(T, name="linear2",
                     kernel_init=katago_init("identity", 1.0))(h_)
        return t / math.sqrt(T)                              # [S,S,T]


class TransformerAttentionBlock(nn.Module):
    """v17 attention half-block (TransformerAttentionBlock,
    model_pytorch.py:2079): RMSNorm -> GQA projections -> 2D RoPE ->
    masked attention over board positions -> out projection. Returns the
    residual (caller adds to the trunk).

    use_gab + gab_templates: Geometric Attention Bias — per-head mixtures
    of the shared translational templates, chosen from the pooled board
    state, added to the attention logits (_compute_gab_bias,
    model_pytorch.py:2208-2281). TAB (input-dependent factored
    templates) remains on the gap list.
    """
    cfg: ModelConfig
    pos_len: int
    use_rope: bool = True
    use_gab: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask, mask_sum_hw, gab_templates=None):
        cfg = self.cfg
        b, h, w, c = x.shape
        s = h * w
        n_heads = cfg.transformer_heads
        n_kv = cfg.transformer_kv_heads or n_heads
        q_dim = c // n_heads
        v_dim = c // n_heads
        n_rep = n_heads // n_kv

        xs = x.reshape(b, s, c)
        xn = RMSNorm(c)(xs).astype(self.dtype)

        dense = lambda f, name: nn.Dense(
            f, use_bias=False, dtype=self.dtype,
            kernel_init=nn.initializers.lecun_normal(), name=name)
        q = dense(n_heads * q_dim, "q_proj")(xn).reshape(b, s, n_heads, q_dim)
        k = dense(n_kv * q_dim, "k_proj")(xn).reshape(b, s, n_kv, q_dim)
        v = dense(n_kv * v_dim, "v_proj")(xn).reshape(b, s, n_kv, v_dim)

        if cfg.attention_qk_norm:
            q = RMSNorm(q_dim, name="q_norm")(q).astype(self.dtype)
            k = RMSNorm(q_dim, name="k_norm")(k).astype(self.dtype)

        if self.use_rope:
            cos, sin = rope_cos_sin_2d(q_dim, self.pos_len, cfg.rope_theta)
            q, k = apply_rope(q, k, jnp.asarray(cos), jnp.asarray(sin))

        if n_rep > 1:
            k = jnp.repeat(k, n_rep, axis=2)
            v = jnp.repeat(v, n_rep, axis=2)

        # masked attention: off-board keys excluded
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) / np.sqrt(q_dim)
        if self.use_gab:
            assert gab_templates is not None, \
                "GAB block needs the shared template tensor"
            cfg_ = self.cfg
            y = nn.Dense(cfg_.gab_d1, use_bias=False, name="gab_proj1",
                         dtype=self.dtype)(xn)                 # [B,S,d1]
            mflat = mask.reshape(b, s, 1)
            pooled = jnp.sum(y * mflat, axis=1) / \
                mask_sum_hw.reshape(b, 1)                      # [B,d1]
            z = nn.Dense(cfg_.gab_d2, use_bias=False, name="gab_proj2",
                         dtype=self.dtype)(pooled)
            z = act_fn(cfg_.activation)(z)
            z = RMSNorm(cfg_.gab_d2, name="gab_norm1")(z)
            z = nn.Dense(n_heads * cfg_.gab_num_templates,
                         use_bias=False, name="gab_proj3",
                         dtype=self.dtype)(z)
            z = act_fn(cfg_.activation)(z)
            z = RMSNorm(n_heads * cfg_.gab_num_templates,
                        name="gab_norm2")(z)
            z = z.reshape(b, n_heads, cfg_.gab_num_templates)
            bias = jnp.einsum("bhd,std->bhst",
                              z.astype(jnp.float32),
                              gab_templates.astype(jnp.float32))
            logits = logits + bias.astype(logits.dtype)
        key_mask = mask.reshape(b, 1, 1, s)
        logits = jnp.where(key_mask > 0, logits, -1e30)
        att = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(
            self.dtype)
        # retrievable by apply(..., mutable=["intermediates"]) — the
        # attention-map visualizer (tools/visualize_attention.py, the
        # reference's visualize_transformer_attention.py); free otherwise
        self.sow("intermediates", "attention", att.astype(jnp.float32))
        out = jnp.einsum("bhqk,bkhd->bqhd", att, v).reshape(b, s,
                                                            n_heads * v_dim)
        out = dense(c, "out_proj")(out)
        return out.reshape(b, h, w, c) * mask


class TransformerFFNBlock(nn.Module):
    """v17 FFN half-block (TransformerFFNBlock, model_pytorch.py:2485):
    RMSNorm -> FFN (optionally SwiGLU) -> projection. Returns residual."""
    cfg: ModelConfig
    use_swiglu: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask, mask_sum_hw):
        cfg = self.cfg
        b, h, w, c = x.shape
        ffn = cfg.transformer_ffn_channels
        xn = RMSNorm(c)(x).astype(self.dtype)
        dense = lambda f, name: nn.Dense(
            f, use_bias=False, dtype=self.dtype,
            kernel_init=nn.initializers.lecun_normal(), name=name)
        y = dense(ffn, "ffn_linear1")(xn)
        if self.use_swiglu:
            # silu applies to linear1's output, multiplied by the gate
            # projection (model_pytorch.py:2568-2572, eigenbackend.cpp SwiGLU)
            gate = dense(ffn, "ffn_linear_gate")(xn)
            y = jax.nn.silu(y) * gate
        else:
            y = act_fn(cfg.activation)(y)
        y = dense(c, "ffn_linear2")(y)
        return y * mask


class NestedBottleneckTransformerBlock(nn.Module):
    """1x1 conv down -> internal_length x (attention + FFN) at c_mid ->
    1x1 conv up; returns the residual (NestedBottleneckTransformerBlock,
    model_pytorch.py:1921-2018 — the "nbttf" hybrid family)."""
    cfg: ModelConfig
    pos_len: int
    internal_length: int
    use_swiglu: bool = True
    use_rope: bool = True
    use_gab: bool = False
    fixup_scale: float = 1.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask, mask_sum_hw, gab_templates=None):
        cfg = self.cfg
        inner_scale = math.pow(self.fixup_scale,
                               1.0 / (1.0 + self.internal_length))
        out = NormActConv(cfg.trunk_num_channels, cfg.mid_num_channels,
                          cfg.activation, 1, inner_scale,
                          dtype=self.dtype)(x, mask, mask_sum_hw)
        for i in range(self.internal_length):
            attn = TransformerAttentionBlock(
                cfg, self.pos_len, use_rope=self.use_rope,
                use_gab=self.use_gab, dtype=self.dtype,
                name=f"attn{i + 1}")
            out = out + attn(out, mask, mask_sum_hw,
                             gab_templates=gab_templates)
            ffn = TransformerFFNBlock(cfg, use_swiglu=self.use_swiglu,
                                      dtype=self.dtype,
                                      name=f"ffn{i + 1}")
            out = out + ffn(out, mask, mask_sum_hw)
        out = NormActConv(cfg.mid_num_channels, cfg.trunk_num_channels,
                          cfg.activation, 1, 0.0, use_gamma=True,
                          dtype=self.dtype)(out, mask, mask_sum_hw)
        return out


class MetadataEncoder(nn.Module):
    """HumanSL SGF-metadata conditioning (MetadataEncoder,
    model_pytorch.py:2881): 192 metadata floats -> 2-layer MLP -> trunk
    bias, scaled by 0.5. Channel 86 (board area) is masked out (the trunk
    already sees the board mask)."""
    cfg: ModelConfig
    internal_channels: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, input_meta):
        actn = self.cfg.activation
        mask = jnp.ones((192,), jnp.float32).at[86].set(0.0)
        x = input_meta * mask[None, :]
        x = nn.Dense(self.internal_channels,
                     kernel_init=katago_init(actn, 0.8),
                     bias_init=nn.initializers.zeros)(x)
        x = act_fn(actn)(x)
        x = nn.Dense(self.internal_channels,
                     kernel_init=katago_init(actn, 0.8),
                     bias_init=nn.initializers.zeros)(x)
        x = act_fn(actn)(x)
        x = nn.Dense(self.cfg.trunk_num_channels, use_bias=False,
                     kernel_init=katago_init(actn, 0.8))(x)
        return 0.5 * x


class PolicyHead(nn.Module):
    """Policy over NN+1 moves x num_policy_outputs channels.

    Channel map (model_pytorch.py:2613-2620): 0 policy, 1 opponent reply,
    2 soft policy, 3 soft opponent, 4 long-term-optimistic, 5 short-term-
    optimistic (+6,7 q-value heads at version 16).
    """
    cfg: ModelConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask, mask_sum_hw):
        cfg = self.cfg
        actn = cfg.activation
        n_out = cfg.num_policy_outputs
        b, h, w, _ = x.shape

        outp = Conv(cfg.p1_num_channels, 1, actn, 0.8, self.dtype)(x)
        outg = Conv(cfg.g1_num_channels, 1, actn, 1.0, self.dtype)(x)
        outg = NormMask(cfg.g1_num_channels)(outg, mask)
        outg = act_fn(actn)(outg)
        pooled = kata_gpool(outg, mask, mask_sum_hw)  # f32 [B, 3*g1]

        # pass logit: 2-layer mlp on pooled features (version >= 15)
        outpass = nn.Dense(cfg.p1_num_channels,
                           kernel_init=katago_init(actn, 1.0),
                           bias_init=nn.initializers.zeros)(pooled)
        outpass = act_fn(actn)(outpass)
        outpass = nn.Dense(n_out, use_bias=False,
                           kernel_init=katago_init("identity", 0.3))(outpass)

        bias = nn.Dense(cfg.p1_num_channels, use_bias=False, dtype=self.dtype,
                        kernel_init=katago_init(actn, 0.6))(
                            pooled.astype(self.dtype))
        outp = outp + bias[:, None, None, :]
        outp = NormMask(cfg.p1_num_channels)(outp, mask)
        outp = act_fn(actn)(outp)
        outp = Conv(n_out, 1, "identity", 0.3, jnp.float32)(
            outp.astype(jnp.float32))
        # mask off-board to large negative so softmax zeroes them
        outp = outp - (1.0 - mask) * 5000.0
        outp = outp.reshape(b, h * w, n_out)
        policy = jnp.concatenate([outp, outpass[:, None, :]], axis=1)
        return policy.transpose(0, 2, 1)  # [B, n_out, NN+1]


class ValueHead(nn.Module):
    cfg: ModelConfig
    pos_len: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask, mask_sum_hw, input_global):
        cfg = self.cfg
        actn = cfg.activation
        xf = x.astype(jnp.float32)

        v1 = Conv(cfg.v1_num_channels, 1, actn, 1.0, jnp.float32)(xf)
        v1 = NormMask(cfg.v1_num_channels)(v1, mask)
        v1 = act_fn(actn)(v1)
        pooled = value_head_gpool(v1, mask, mask_sum_hw)  # [B, 3*v1]

        v2 = nn.Dense(cfg.v2_size, kernel_init=katago_init(actn, 1.0))(pooled)
        v2 = act_fn(actn)(v2)

        out_value = nn.Dense(3, kernel_init=katago_init("identity", 1.0))(v2)
        out_miscvalue = nn.Dense(10, kernel_init=katago_init("identity", 1.0))(v2)
        out_moremiscvalue = nn.Dense(8, kernel_init=katago_init("identity", 1.0))(v2)

        own = Conv(1, 1, "identity", 0.2, jnp.float32)(v1) * mask
        scoring = Conv(1, 1, "identity", 0.2, jnp.float32)(v1) * mask
        futurepos = Conv(2, 1, "identity", 0.2, jnp.float32)(xf) * mask
        seki = Conv(4, 1, "identity", 0.2, jnp.float32)(xf) * mask

        # mixture score-belief head (model_pytorch.py:2747-2771, 2867-2881)
        sb_len = cfg.scorebelief_len(self.pos_len)
        mid = sb_len // 2
        offset_bias = jnp.asarray(
            [0.05 * (float(i - mid) + 0.5) for i in range(sb_len)],
            jnp.float32)[None, :, None]
        parity = jnp.asarray(
            [0.5 - float((i - mid) % 2) for i in range(sb_len)],
            jnp.float32)[None, :]

        s2 = nn.Dense(cfg.sbv2_num_channels,
                      kernel_init=katago_init(actn, 1.0))(pooled)[:, None, :]
        s2off = nn.Dense(cfg.sbv2_num_channels, use_bias=False,
                         kernel_init=katago_init(actn, 1.0))(offset_bias)
        wave = input_global[:, -1:]
        s2par = nn.Dense(cfg.sbv2_num_channels, use_bias=False,
                         kernel_init=katago_init(actn, 1.0))(
                             (parity * wave)[:, :, None])
        sv2 = act_fn(actn)(s2 + s2off + s2par)          # [B, sb_len, sbv2]
        sv3 = nn.Dense(cfg.num_scorebeliefs,
                       kernel_init=katago_init("identity", 0.5))(sv2)
        smix = nn.Dense(cfg.num_scorebeliefs,
                        kernel_init=katago_init("identity", 1.0))(pooled)
        mix_logw = jax.nn.log_softmax(smix, axis=1)      # [B, K]
        sb_logprobs = jax.nn.log_softmax(sv3, axis=1)    # [B, sb_len, K]
        scorebelief_logprobs = jax.nn.logsumexp(
            sb_logprobs + mix_logw[:, None, :], axis=2)  # [B, sb_len]

        return {
            "value_logits": out_value,                 # [B,3] win/loss/noresult
            "miscvalue": out_miscvalue,                # [B,10]
            "moremiscvalue": out_moremiscvalue,        # [B,8]
            "ownership_pretanh": own[..., 0],          # [B,H,W]
            "scoring_presoftmax": scoring[..., 0],     # [B,H,W]
            "futurepos_pretanh": futurepos,            # [B,H,W,2]
            "seki_logits": seki,                       # [B,H,W,4]
            "scorebelief_logprobs": scorebelief_logprobs,  # [B,sb_len]
        }


class KataGoModel(nn.Module):
    """Full net. Input: spatial [B,H,W,22] f32, global [B,19] f32,
    mask [B,H,W,1], optional metadata [B,192] (humanSL conditioning when
    cfg.metadata_encoder is on). Output dict with policy + value-head
    tensors."""
    cfg: ModelConfig
    pos_len: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, spatial, global_in, mask=None, metadata=None):
        cfg = self.cfg
        actn = cfg.activation
        b, h, w, _ = spatial.shape
        if mask is None:
            mask = jnp.ones((b, h, w, 1), jnp.float32)
        mask_sum_hw = jnp.sum(mask, axis=(1, 2), keepdims=True)

        x = Conv(cfg.trunk_num_channels, 1 if cfg.initial_conv_1x1 else 3,
                 actn, 0.8, self.dtype)(spatial.astype(self.dtype))
        g = nn.Dense(cfg.trunk_num_channels, use_bias=False, dtype=self.dtype,
                     kernel_init=katago_init(actn, 0.6))(
                         global_in.astype(self.dtype))
        x = x + g[:, None, None, :]
        if cfg.metadata_encoder:
            if metadata is None:
                metadata = jnp.zeros((b, 192), jnp.float32)
            meta_bias = MetadataEncoder(
                cfg, internal_channels=cfg.metadata_encoder_channels)(
                metadata)
            x = x + meta_bias[:, None, None, :].astype(self.dtype)

        num_blocks = len(cfg.block_kind)
        fixup_scale = 1.0 / math.sqrt(max(num_blocks, 1))
        intermediate_out = {}
        gab_templates = None   # built once, shared by all GAB blocks
        for block_i, kind in enumerate(cfg.block_kind):
            if (cfg.has_intermediate_head
                    and block_i == cfg.intermediate_head_blocks):
                # auxiliary heads tapping the trunk partway down
                # (model_pytorch.py:3510-3521): own final norm + full
                # policy/value head stacks, outputs prefixed
                xi = NormMask(cfg.trunk_num_channels, use_gamma=True,
                              name="norm_intermediate_trunkfinal")(x, mask)
                xi = act_fn(actn)(xi)
                ipol = PolicyHead(cfg, dtype=self.dtype,
                                  name="intermediate_policy_head")(
                    xi, mask, mask_sum_hw)
                ival = ValueHead(cfg, self.pos_len,
                                 name="intermediate_value_head")(
                    xi, mask, mask_sum_hw, global_in)
                intermediate_out = {
                    "intermediate_policy_logits": ipol,
                    **{f"intermediate_{k}": v for k, v in ival.items()}}
            if kind in ("attnrope", "attn"):
                blk = TransformerAttentionBlock(
                    cfg, self.pos_len, use_rope=(kind == "attnrope"),
                    dtype=self.dtype)
                x = x + blk(x, mask, mask_sum_hw)
                continue
            if kind.startswith("bottlenest") and "transformer" in kind:
                # bottlenest{N}transformer[rope][gab]sg (model_pytorch.py
                # block_kind table at :2955): nested-bottleneck hybrid
                il = int(kind[len("bottlenest")])
                use_gab = "gab" in kind
                use_rope = "rope" in kind
                use_swiglu = kind.endswith("sg")
                if use_gab and gab_templates is None:
                    gab_templates = GABTemplates(
                        cfg, self.pos_len,
                        name="gab_templates")(self.pos_len * self.pos_len)
                blk = NestedBottleneckTransformerBlock(
                    cfg, self.pos_len, il, use_swiglu=use_swiglu,
                    use_rope=use_rope, use_gab=use_gab,
                    fixup_scale=fixup_scale, dtype=self.dtype)
                x = x + blk(x, mask, mask_sum_hw,
                            gab_templates=gab_templates)
                continue
            if kind in ("ffng", "ffnsg"):
                blk = TransformerFFNBlock(cfg, use_swiglu=(kind == "ffnsg"),
                                          dtype=self.dtype)
                x = x + blk(x, mask, mask_sum_hw)
                continue
            use_gpool = kind.endswith("gpool")
            base = kind[:-5] if use_gpool else kind
            c_gp = cfg.gpool_num_channels if use_gpool else None
            if base == "regular":
                blk = ResBlock(cfg.trunk_num_channels, cfg.mid_num_channels,
                               actn, fixup_scale, c_gpool=c_gp,
                               dtype=self.dtype)
            elif base in ("bottle1", "bottle2", "bottle3", "bottlenest2"):
                il = 2 if base == "bottlenest2" else int(base[-1])
                blk = NestedBottleneckResBlock(
                    cfg.trunk_num_channels, cfg.mid_num_channels, il,
                    actn, fixup_scale, c_gpool=c_gp, dtype=self.dtype)
            else:
                raise ValueError(f"unsupported block kind {kind!r}")
            x = x + blk(x, mask, mask_sum_hw)

        if (cfg.has_intermediate_head
                and cfg.intermediate_head_blocks >= num_blocks):
            # full-distillation variant: intermediate heads share the
            # trunk end (modelconfigs.py:2107-2108)
            xi = NormMask(cfg.trunk_num_channels, use_gamma=True,
                          name="norm_intermediate_trunkfinal")(x, mask)
            xi = act_fn(actn)(xi)
            ipol = PolicyHead(cfg, dtype=self.dtype,
                              name="intermediate_policy_head")(
                xi, mask, mask_sum_hw)
            ival = ValueHead(cfg, self.pos_len,
                             name="intermediate_value_head")(
                xi, mask, mask_sum_hw, global_in)
            intermediate_out = {
                "intermediate_policy_logits": ipol,
                **{f"intermediate_{k}": v for k, v in ival.items()}}

        x = NormMask(cfg.trunk_num_channels, use_gamma=True)(x, mask)
        x = act_fn(actn)(x)

        policy = PolicyHead(cfg, dtype=self.dtype)(x, mask, mask_sum_hw)
        value_outs = ValueHead(cfg, self.pos_len)(x, mask, mask_sum_hw,
                                                  global_in)
        return {"policy_logits": policy, **value_outs, **intermediate_out}


def postprocess_outputs(raw: dict, to_move_is_white=None) -> dict:
    """Raw head tensors -> NNOutput-style quantities.

    Scaling constants follow the reference's loss/usage conventions
    (metrics_pytorch.py + ModelPostProcessParams, desc.h:493): miscvalue
    channels 0-3 are scoremean(*20), scorestdev(softplus*20), lead(*20),
    variance-time(softplus*40); moremiscvalue 0,1 are shortterm value/score
    error (softplus scaled).
    """
    mv = raw["miscvalue"]
    mmv = raw["moremiscvalue"]
    out = {
        "policy_log_probs": jax.nn.log_softmax(raw["policy_logits"][:, 0, :], axis=-1),
        "value_probs": jax.nn.softmax(raw["value_logits"], axis=-1),
        "score_mean": mv[:, 0] * 20.0,
        "score_stdev": jax.nn.softplus(mv[:, 1]) * 20.0,
        "lead": mv[:, 2] * 20.0,
        "variance_time": jax.nn.softplus(mv[:, 3]) * 40.0,
        # v14+ convention: raw channel x encodes predicted squared error
        # softplus(x/2)^2 * mult; these entries are the error stdevs the
        # engine consumes, softplus(x/2)*sqrt(mult) (nneval.cpp:1163-1168)
        "shortterm_value_error": jax.nn.softplus(mmv[:, 0] * 0.5) * 0.5,
        "shortterm_score_error":
            jax.nn.softplus(mmv[:, 1] * 0.5) * 5.4772256,
        "ownership": jnp.tanh(raw["ownership_pretanh"]),
    }
    return out
