"""Wan2.1/2.2-style video-diffusion DiT with LiteAttention self-attention.

The reference ships LiteAttention as a drop-in for the Wan2.x DiT's
self-attention (reference README.md:34-87, 162-197: the user swaps the
attention module inside each DiT block and keeps it persistent across the
denoising loop). There is no JAX Wan port to reuse (SURVEY.md section 7,
hard part 5), so this is an independent reimplementation of the
architecture family -- patchified 3D latents, adaLN-modulated blocks with
full 3D-RoPE self-attention + text cross-attention, flow-matching
denoising -- sized by :class:`WanConfig` (defaults = Wan2.1-14B geometry:
dim 5120, 40 heads x 128, 40 blocks, ffn 13824, umT5 text dim 4096).

TPU-native structure:

* the skip-mask states of all blocks form one explicit pytree carried
  through the jitted denoising step (SURVEY.md section 7 hard part 2) --
  no host round trips inside the loop;
* self-attention runs on the Pallas lite kernel (v2v skipping); text
  cross-attention runs the dense kernel un-skipped, matching the
  reference's t2t/t2v/v2t-dense policy (README.md:227-263);
* everything is bf16 on the MXU with fp32 modulation/softmax statistics.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from liteattention_tpu.lite_attention import (
    lite_attention_init,
    lite_attention_step,
)
from liteattention_tpu.ops.flash_fwd import flash_attention
from liteattention_tpu.ops.lite_flash_fwd import pack_kv
from liteattention_tpu.ops.tile_sizes import BlockSizes, get_block_sizes
from liteattention_tpu.parallel.seq_parallel import (
    seq_parallel_attention_step,
)


@dataclasses.dataclass(frozen=True)
class WanConfig:
    """Geometry of a Wan2.x-family DiT."""

    dim: int = 5120
    ffn_dim: int = 13824
    num_heads: int = 40
    head_dim: int = 128
    num_layers: int = 40
    in_channels: int = 16
    out_channels: int = 16
    text_dim: int = 4096
    text_len: int = 512
    patch_size: Tuple[int, int, int] = (1, 2, 2)
    freq_dim: int = 256
    qk_norm: bool = True
    eps: float = 1e-6
    dtype: Any = jnp.bfloat16
    block_sizes: Optional[BlockSizes] = None
    # Wan2.1-I2V decoupled image cross-attention: image tokens get their
    # own K/V projections (``k_img``/``v_img`` + ``norm_k_img``) and the
    # cross-attention output is attn(q, text) + attn(q, img) -- the
    # WanI2VCrossAttention layout of Wan-Video/Wan2.1
    # wan/modules/model.py. False = Wan2.2-style shared context (image
    # tokens concatenated in front of the text tokens).
    i2v_decoupled: bool = False
    # Recompute block activations in backward (jax.checkpoint); see
    # GPTConfig.remat. Training-only knob.
    remat: bool = False
    # Attention-structure probe (training-only): when > 0, each
    # self-attention layer computes exact softmax statistics on this many
    # strided query rows and sows scalar summaries ("attn_entropy",
    # "attn_tile_excess") into the "intermediates" collection. Used by
    # the calibration harness to regularize attention toward the peaked,
    # tile-sparse structure converged video models exhibit (reference
    # README.md:12-27 motivates skipping with exactly that structure).
    # Adds no parameters; off (0) for inference and all parity paths.
    attn_probe_rows: int = 0
    # Sequence-parallel self-attention over an ICI mesh axis (config 5):
    # when set, the model must run inside shard_map-compatible jit with
    # that mesh active; KV and the per-layer skip masks are sharded on
    # the axis, Q is replicated, outputs merge via psum LSE combine.
    sp_axis: Optional[str] = None

    def attn_block_sizes(self, kind: str = "lite") -> BlockSizes:
        return self.block_sizes or get_block_sizes(
            self.head_dim, 2, kind=kind
        )

    @staticmethod
    def tiny() -> "WanConfig":
        """Small config for tests / compile checks."""
        return WanConfig(
            dim=128,
            ffn_dim=256,
            num_heads=2,
            head_dim=64,
            num_layers=2,
            text_dim=64,
            text_len=16,
            freq_dim=32,
            block_sizes=BlockSizes(128, 128),
        )


def timestep_embedding(t: jax.Array, dim: int, max_period=10000.0):
    """Sinusoidal timestep embedding (fp32)."""
    half = dim // 2
    freqs = jnp.exp(
        -jnp.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = t.astype(jnp.float32)[:, None] * freqs[None]
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


def _rope_split(head_dim: int) -> Tuple[int, int, int]:
    """Split head_dim across (t, h, w) rotary axes; Wan's 44/42/42 at 128."""
    d_hw = 2 * (head_dim // 6)
    d_t = head_dim - 2 * d_hw
    return d_t, d_hw, d_hw


def rope_3d_freqs(
    grid: Tuple[int, int, int], head_dim: int, theta: float = 10000.0
) -> jax.Array:
    """Per-token rotation angles for 3D RoPE.

    Returns fp32 ``[N, head_dim // 2]`` where N = prod(grid).
    """
    f, h, w = grid
    d_t, d_h, d_w = _rope_split(head_dim)

    def axis_freqs(n, d):
        inv = 1.0 / (
            theta ** (jnp.arange(0, d, 2, dtype=jnp.float32) / d)
        )
        return jnp.arange(n, dtype=jnp.float32)[:, None] * inv[None]

    ft = axis_freqs(f, d_t)  # [f, d_t/2]
    fh = axis_freqs(h, d_h)
    fw = axis_freqs(w, d_w)
    ft = jnp.broadcast_to(ft[:, None, None, :], (f, h, w, d_t // 2))
    fh = jnp.broadcast_to(fh[None, :, None, :], (f, h, w, d_h // 2))
    fw = jnp.broadcast_to(fw[None, None, :, :], (f, h, w, d_w // 2))
    return jnp.concatenate([ft, fh, fw], axis=-1).reshape(
        f * h * w, head_dim // 2
    )


def apply_rope(x: jax.Array, freqs: jax.Array) -> jax.Array:
    """Rotate ``x`` [B, N, H, D] by per-token angles [N, D/2] (fp32 math)."""
    xf = x.astype(jnp.float32)
    x1, x2 = jnp.split(xf, 2, axis=-1)
    cos = jnp.cos(freqs)[None, :, None, :]
    sin = jnp.sin(freqs)[None, :, None, :]
    out = jnp.concatenate(
        [x1 * cos - x2 * sin, x1 * sin + x2 * cos], axis=-1
    )
    return out.astype(x.dtype)


class RMSNorm(nn.Module):
    dim: int
    eps: float = 1e-6
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.dim,))
        xf = x.astype(jnp.float32)
        n = xf * jax.lax.rsqrt(
            jnp.mean(xf * xf, axis=-1, keepdims=True) + self.eps
        )
        return (n * scale).astype(self.dtype)


class CtxProj(nn.Module):
    """Two-layer gelu MLP projecting encoder states into model dim
    (shared by the text and image conditioning paths)."""

    dim: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.dim, dtype=self.dtype, name="fc1")(
            x.astype(self.dtype)
        )
        x = nn.gelu(x, approximate=True)
        return nn.Dense(self.dim, dtype=self.dtype, name="fc2")(x)


class ImgProj(nn.Module):
    """Wan-I2V CLIP-token projection (MLPProj: LayerNorm -> Linear ->
    GELU -> Linear -> LayerNorm; Wan-Video/Wan2.1 wan/modules/model.py
    MLPProj) -- key-for-key checkpoint parity for img_emb.proj.*."""

    dim: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        x = x.astype(self.dtype)
        x = nn.LayerNorm(dtype=self.dtype, name="norm_in")(x)
        x = nn.Dense(x.shape[-1], dtype=self.dtype, name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dense(self.dim, dtype=self.dtype, name="fc2")(x)
        return nn.LayerNorm(dtype=self.dtype, name="norm_out")(x)


def _attn_bhsd(x, num_heads):
    b, n, _ = x.shape
    return x.reshape(b, n, num_heads, -1).transpose(0, 2, 1, 3)


def _attn_bnhd(x):
    b, h, n, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, n, h * d)


class WanSelfAttention(nn.Module):
    """3D-RoPE self-attention; runs the lite (skip) kernel when a mask
    state is passed, dense otherwise."""

    cfg: WanConfig

    @nn.compact
    def __call__(
        self, x, freqs, state=None, threshold=-10.0, emit_votes=True,
        schedule=None,
    ):
        cfg = self.cfg
        dense = functools.partial(
            nn.Dense, use_bias=True, dtype=cfg.dtype, param_dtype=jnp.float32
        )
        inner = cfg.num_heads * cfg.head_dim
        q = dense(inner, name="q")(x)
        k = dense(inner, name="k")(x)
        v = dense(inner, name="v")(x)
        b, n, _ = x.shape
        if cfg.qk_norm:
            # Wan2.1 normalizes q/k over the FULL model dim before the
            # head split (WanRMSNorm(dim); Wan-Video/Wan2.1
            # wan/modules/model.py WanSelfAttention) -- weight shape
            # [dim], required for checkpoint parity.
            q = RMSNorm(inner, cfg.eps, cfg.dtype, name="q_norm")(q)
            k = RMSNorm(inner, cfg.eps, cfg.dtype, name="k_norm")(k)
        q = q.reshape(b, n, cfg.num_heads, cfg.head_dim)
        k = k.reshape(b, n, cfg.num_heads, cfg.head_dim)
        q = apply_rope(q, freqs)
        k = apply_rope(k, freqs)
        qh = q.transpose(0, 2, 1, 3)
        kh = k.transpose(0, 2, 1, 3)
        vh = _attn_bhsd(v, cfg.num_heads)
        if cfg.attn_probe_rows > 0 and state is None:
            # Exact softmax statistics on a strided row sample (training
            # probe; see WanConfig.attn_probe_rows). Scores use the same
            # scale as the kernel; tile stats live in the kernel's log2
            # domain so `attn_tile_excess` is directly comparable to the
            # skip threshold (CLAUDE.md log2-space convention;
            # VOTE_TILE=128 fine granularity).
            r = min(cfg.attn_probe_rows, n)
            stride = max(n // r, 1)
            qp = qh[:, :, :: stride, :][:, :, :r, :].astype(jnp.float32)
            s = jnp.einsum(
                "bhrd,bhnd->bhrn", qp, kh.astype(jnp.float32),
                precision=jax.lax.Precision.HIGHEST,
            ) * (1.0 / float(cfg.head_dim) ** 0.5)
            lse = jax.nn.logsumexp(s, axis=-1)
            p = jax.nn.softmax(s, axis=-1)
            entropy = lse - jnp.sum(p * s, axis=-1)
            self.sow(
                "intermediates", "attn_entropy", jnp.mean(entropy)
            )
            log2e = 1.4426950408889634
            s2 = s * log2e
            nt = s2.shape[-1] // 128
            if nt > 1:
                tile_max = jnp.max(
                    s2[..., : nt * 128].reshape(*s2.shape[:-1], nt, 128),
                    axis=-1,
                )
                excess = tile_max - jnp.max(s2, axis=-1, keepdims=True)
                self.sow(
                    "intermediates",
                    "attn_tile_excess",
                    jnp.mean(jax.nn.softplus(excess + 3.0)),
                )
        if cfg.sp_axis is not None and state is not None:
            oh, new_state = seq_parallel_attention_step(
                state, qh, kh, vh, threshold, cfg.sp_axis,
                cfg.attn_block_sizes("lite"), emit_votes=emit_votes,
            )
        elif state is None:
            oh = flash_attention(
                qh, kh, vh, block_sizes=cfg.attn_block_sizes("dense")
            )
            new_state = None
        else:
            # Hand the kernel the pre-interleaved K|V layout: the lane
            # concat is the packed buffer's ONLY consumer here, so XLA
            # writes the rope/transpose outputs straight into it -- the
            # kernel's in-call interleave (~2x KV bytes of HBM traffic
            # per step) disappears instead of moving up a level.
            oh, new_state = lite_attention_step(
                state, qh, None, None, threshold=threshold,
                block_sizes=cfg.attn_block_sizes("lite"),
                emit_votes=emit_votes, schedule=schedule,
                packed_kv=pack_kv(kh, vh), seqlen_k=n,
            )
        out = _attn_bnhd(oh)
        return dense(cfg.dim, name="o")(out), new_state


class WanCrossAttention(nn.Module):
    """Text cross-attention -- always dense (reference README.md:227-263:
    only v2v self-attention is skipped).

    ``cfg.i2v_decoupled`` adds the Wan2.1-I2V image branch
    (WanI2VCrossAttention, Wan-Video/Wan2.1 wan/modules/model.py):
    image tokens ride separate ``k_img``/``v_img`` projections (with
    ``norm_k_img`` under qk_norm) and the branch outputs SUM before the
    output projection -- checkpoint-parity for decoupled I2V weights."""

    cfg: WanConfig

    @nn.compact
    def __call__(self, x, ctx, ctx_img=None):
        cfg = self.cfg
        dense = functools.partial(
            nn.Dense, use_bias=True, dtype=cfg.dtype, param_dtype=jnp.float32
        )
        inner = cfg.num_heads * cfg.head_dim
        b, n, _ = x.shape
        q = dense(inner, name="q")(x)
        if cfg.qk_norm:
            # Full-dim RMSNorm pre-head-split (see WanSelfAttention).
            q = RMSNorm(inner, cfg.eps, cfg.dtype, name="q_norm")(q)
        qh = q.reshape(b, n, cfg.num_heads, cfg.head_dim).transpose(
            0, 2, 1, 3
        )

        def branch(tokens, k_name, v_name, norm_name):
            k = dense(inner, name=k_name)(tokens)
            v = dense(inner, name=v_name)(tokens)
            if cfg.qk_norm:
                k = RMSNorm(inner, cfg.eps, cfg.dtype, name=norm_name)(k)
            k = k.reshape(b, tokens.shape[1], cfg.num_heads, cfg.head_dim)
            return flash_attention(
                qh,
                k.transpose(0, 2, 1, 3),
                _attn_bhsd(v, cfg.num_heads),
                block_sizes=cfg.attn_block_sizes("dense"),
            )

        oh = branch(ctx, "k", "v", "k_norm")
        if cfg.i2v_decoupled:
            assert ctx_img is not None, (
                "i2v_decoupled WanCrossAttention needs the image tokens "
                "(pass image_ctx to WanModel)"
            )
            oh = oh + branch(ctx_img, "k_img", "v_img", "k_img_norm")
        return dense(cfg.dim, name="o")(_attn_bnhd(oh))


def _modulate(x, shift, scale):
    return x * (1.0 + scale) + shift


class WanBlock(nn.Module):
    """adaLN-modulated DiT block: self-attn -> cross-attn -> FFN."""

    cfg: WanConfig

    @nn.compact
    def __call__(
        self, x, ctx, t_mod, freqs, state=None, threshold=-10.0,
        emit_votes=True, schedule=None, ctx_img=None,
    ):
        cfg = self.cfg
        # Per-block learned modulation bias added to the shared time
        # modulation: 6 x dim (Wan-style adaLN).
        mod_bias = self.param(
            "mod_bias",
            nn.initializers.normal(0.02),
            (6, cfg.dim),
            jnp.float32,
        )
        mod = (t_mod + mod_bias[None]).astype(jnp.float32)
        sh1, sc1, g1, sh2, sc2, g2 = [
            m.astype(cfg.dtype)[:, None, :] for m in jnp.moveaxis(mod, 1, 0)
        ]
        ln = functools.partial(
            nn.LayerNorm,
            use_bias=False,
            use_scale=False,
            epsilon=cfg.eps,
            dtype=cfg.dtype,
        )
        h_attn, new_state = WanSelfAttention(cfg, name="self_attn")(
            _modulate(ln(name="norm1")(x), sh1, sc1),
            freqs,
            state,
            threshold,
            emit_votes,
            schedule,
        )
        x = x + g1 * h_attn
        # norm3 is AFFINE in Wan (cross_attn_norm=True ->
        # nn.LayerNorm(dim, elementwise_affine=True)); norm1/norm2 are
        # not (their scale/shift come from adaLN modulation).
        x = x + WanCrossAttention(cfg, name="cross_attn")(
            nn.LayerNorm(
                use_bias=True,
                use_scale=True,
                epsilon=cfg.eps,
                dtype=cfg.dtype,
                name="norm3",
            )(x),
            ctx,
            ctx_img,
        )
        h_ffn = _modulate(ln(name="norm2")(x), sh2, sc2)
        h_ffn = nn.Dense(cfg.ffn_dim, dtype=cfg.dtype, name="ffn_up")(h_ffn)
        h_ffn = nn.gelu(h_ffn, approximate=True)
        h_ffn = nn.Dense(cfg.dim, dtype=cfg.dtype, name="ffn_down")(h_ffn)
        x = x + g2 * h_ffn
        return x, new_state


class WanModel(nn.Module):
    """Wan2.x-family DiT backbone.

    ``__call__(latents, t, text, skip_states, threshold, image_ctx)`` where
    ``latents``: [B, F, H, W, C] (video latent grid), ``t``: [B] diffusion
    timesteps, ``text``: [B, L, text_dim] encoder states, ``skip_states``:
    optional dict {layer_idx: SkipMaskState} threaded through the
    denoising loop. Returns (velocity prediction, new skip states).
    """

    cfg: WanConfig

    @nn.compact
    def __call__(
        self,
        latents: jax.Array,
        t: jax.Array,
        text: jax.Array,
        skip_states: Optional[Dict[int, Any]] = None,
        threshold=-10.0,
        image_ctx: Optional[jax.Array] = None,
        latent_cond: Optional[jax.Array] = None,
        emit_votes: bool = True,
        schedules: Optional[Dict[int, Any]] = None,
    ):
        cfg = self.cfg
        if latent_cond is not None:
            # I2V first-frame conditioning: extra channels (encoded
            # reference frame + temporal mask) concatenated to the noisy
            # latents before patchify, the Wan-I2V input convention.
            latents = jnp.concatenate(
                [latents, latent_cond.astype(latents.dtype)], axis=-1
            )
        b, f, hh, ww, c = latents.shape
        pt, ph, pw = cfg.patch_size
        gf, gh, gw = f // pt, hh // ph, ww // pw

        # Patchify: [B, F, H, W, C] -> [B, N, dim].
        x = latents.reshape(b, gf, pt, gh, ph, gw, pw, c)
        x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7).reshape(
            b, gf * gh * gw, pt * ph * pw * c
        )
        x = nn.Dense(cfg.dim, dtype=cfg.dtype, name="patch_embed")(
            x.astype(cfg.dtype)
        )

        # Conditioning context: text, plus (I2V) CLIP image tokens --
        # prepended into the shared context (Wan2.2 style) or kept
        # separate for the decoupled image-K/V branch (Wan2.1-I2V,
        # cfg.i2v_decoupled).
        ctx = CtxProj(cfg.dim, cfg.dtype, name="text_proj")(text)
        ctx_img = None
        if image_ctx is not None:
            img = ImgProj(cfg.dim, cfg.dtype, name="img_proj")(image_ctx)
            if cfg.i2v_decoupled:
                ctx_img = img
            else:
                ctx = jnp.concatenate([img, ctx], axis=1)
        elif cfg.i2v_decoupled:
            raise ValueError(
                "cfg.i2v_decoupled=True requires image_ctx"
            )

        # Time embedding -> shared 6 x dim modulation.
        te = timestep_embedding(t, cfg.freq_dim)
        te = nn.Dense(cfg.dim, dtype=jnp.float32, name="time_mlp_1")(te)
        te = nn.silu(te)
        te = nn.Dense(cfg.dim, dtype=jnp.float32, name="time_mlp_2")(te)
        t_mod = nn.Dense(
            6 * cfg.dim, dtype=jnp.float32, name="time_mod"
        )(nn.silu(te)).reshape(b, 6, cfg.dim)

        freqs = rope_3d_freqs((gf, gh, gw), cfg.head_dim)

        new_states: Dict[int, Any] = {}
        block_cls = WanBlock
        if cfg.remat:
            # Activation remat for training runs (jax.checkpoint): at
            # 73k tokens a single block's activations are ~GBs; the
            # denoising/inference path never differentiates, so leave
            # remat off there (default).
            block_cls = nn.remat(WanBlock)
        for i in range(cfg.num_layers):
            st = skip_states.get(i) if skip_states is not None else None
            sched = schedules.get(i) if schedules is not None else None
            x, st_new = block_cls(cfg, name=f"block_{i}")(
                x, ctx, t_mod, freqs, st, threshold, emit_votes, sched,
                ctx_img,
            )
            if st_new is not None:
                new_states[i] = st_new

        # Final modulated projection + unpatchify.
        fin_mod = self.param(
            "final_mod_bias",
            nn.initializers.normal(0.02),
            (2, cfg.dim),
            jnp.float32,
        )
        # Wan Head: shift/scale = modulation + e (the raw time embedding;
        # no extra Linear -- checkpoint parity with head.modulation).
        fm = fin_mod[None] + te[:, None, :]
        shift, scale = [
            m.astype(cfg.dtype)[:, None, :] for m in jnp.moveaxis(fm, 1, 0)
        ]
        x = _modulate(
            nn.LayerNorm(
                use_bias=False,
                use_scale=False,
                epsilon=cfg.eps,
                dtype=cfg.dtype,
                name="final_norm",
            )(x),
            shift,
            scale,
        )
        x = nn.Dense(
            pt * ph * pw * cfg.out_channels, dtype=cfg.dtype, name="proj_out"
        )(x)

        # Unpatchify back to [B, F, H, W, C_out].
        x = x.reshape(b, gf, gh, gw, pt, ph, pw, cfg.out_channels)
        x = x.transpose(0, 1, 4, 2, 5, 3, 6, 7).reshape(
            b, f, hh, ww, cfg.out_channels
        )
        return x, (new_states if skip_states is not None else None)


def init_skip_states(
    cfg: WanConfig, batch: int, grid: Tuple[int, int, int], mesh=None
) -> Dict[int, Any]:
    """Per-layer skip-mask states for a latent grid (one persistent
    LiteAttention instance per block, reference README.md:162-172)."""
    gf = grid[0] // cfg.patch_size[0]
    gh = grid[1] // cfg.patch_size[1]
    gw = grid[2] // cfg.patch_size[2]
    n = gf * gh * gw
    states = {
        i: lite_attention_init(
            batch, cfg.num_heads, n, n, cfg.head_dim, 2,
            block_sizes=cfg.attn_block_sizes(),
        )
        for i in range(cfg.num_layers)
    }
    if cfg.sp_axis is not None and mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        sharding = NamedSharding(mesh, P(None, None, None, cfg.sp_axis))
        states = {
            i: st._replace(do_mask=jax.device_put(st.do_mask, sharding))
            for i, st in states.items()
        }
    return states


__all__ = [
    "WanConfig",
    "WanModel",
    "WanBlock",
    "init_skip_states",
    "rope_3d_freqs",
    "apply_rope",
    "timestep_embedding",
]
