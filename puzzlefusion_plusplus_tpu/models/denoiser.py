"""SE(3) pose-diffusion denoiser transformer (flax.linen).

Capability parity with the reference DenoiserTransformer
(puzzlefusion_plusplus/denoiser/model/modules/denoiser_transformer.py:11-203 and attention.py):

  * Token layout: L=25 latent tokens per part, sequence = P*L (20*25 = 500), width 512, 6 layers,
    8 heads.
  * Conditioning: NeRF sin/cos embeddings (10 freqs) of the noisy 7-DoF params, of token xyz and
    of part scale; a 2-row reference-part embedding table; per-part sinusoidal position encoding.
  * Each layer: AdaLayerNorm (timestep-embedding-table -> scale/shift) -> part-local self
    attention (block-diagonal mask) -> AdaLayerNorm -> global attention (validity key mask) ->
    LayerNorm -> GEGLU feed-forward. Residuals around each.
  * Output: mean-pool tokens per part -> separate translation(3) / rotation(4) MLP heads.

TPU-first notes: masks are additive biases built once per forward from static part/validity
structure; attention runs as batched einsum on the MXU (seq len 500 — flash-style tiling is
unnecessary, XLA fuses the softmax chain); everything is fixed-shape so the 20-step sampler can
``lax.scan`` over the whole module.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from puzzlefusion_plusplus_tpu.models.embeddings import nerf_embed, sinusoidal_table

_NEG_INF = -1e9


class AdaLayerNorm(nn.Module):
    """LayerNorm modulated by a learned per-timestep scale/shift (reference attention.py:5-25)."""

    dim: int
    num_embeddings: int
    dtype: object = None

    @nn.compact
    def __call__(self, x, timestep):
        emb = nn.Embed(self.num_embeddings, self.dim, name="emb", dtype=self.dtype)(timestep)
        emb = nn.Dense(2 * self.dim, name="linear", dtype=self.dtype)(nn.silu(emb))
        scale, shift = jnp.split(emb, 2, axis=-1)
        x = nn.LayerNorm(use_bias=False, use_scale=False, epsilon=1e-5)(x)
        return x * (1.0 + scale[:, None, :]) + shift[:, None, :]


class MultiHeadAttention(nn.Module):
    """diffusers-style attention: biasless qkv, biased out-proj, dropout on the output."""

    dim: int
    num_heads: int
    dropout: float = 0.0
    dtype: object = None

    @nn.compact
    def __call__(self, x, bias, train: bool = False):
        """x: [B, T, C]; bias: additive mask broadcastable to [B, h, T, T]."""
        B, T, C = x.shape
        h = self.num_heads
        hd = C // h
        q = nn.Dense(C, use_bias=False, name="to_q", dtype=self.dtype)(x)
        k = nn.Dense(C, use_bias=False, name="to_k", dtype=self.dtype)(x)
        v = nn.Dense(C, use_bias=False, name="to_v", dtype=self.dtype)(x)
        q = q.reshape(B, T, h, hd).transpose(0, 2, 1, 3)
        k = k.reshape(B, T, h, hd).transpose(0, 2, 1, 3)
        v = v.reshape(B, T, h, hd).transpose(0, 2, 1, 3)
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(hd)
        if bias is not None:
            scores = scores + bias.astype(scores.dtype)
        probs = nn.softmax(scores.astype(jnp.float32), axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, T, C)
        out = nn.Dense(C, name="to_out", dtype=self.dtype)(out)
        out = nn.Dropout(self.dropout, deterministic=not train)(out)
        return out


class GEGLUFeedForward(nn.Module):
    """diffusers FeedForward(activation_fn='geglu', mult=4) (exact gelu)."""

    dim: int
    dropout: float = 0.0
    mult: int = 4
    dtype: object = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        inner = self.dim * self.mult
        hg = nn.Dense(2 * inner, name="proj", dtype=self.dtype)(x)
        h, gate = jnp.split(hg, 2, axis=-1)
        h = h * nn.gelu(gate, approximate=False)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        return nn.Dense(self.dim, name="out", dtype=self.dtype)(h)


class EncoderLayer(nn.Module):
    """AdaLN -> local attn -> AdaLN -> global attn -> LN -> GEGLU FF (attention.py:30-92)."""

    dim: int
    num_heads: int
    num_ada_embeddings: int
    dropout: float = 0.2
    dtype: object = None

    @nn.compact
    def __call__(self, x, self_bias, gen_bias, timestep, train: bool = False):
        h = AdaLayerNorm(self.dim, self.num_ada_embeddings, self.dtype, name="norm1")(
            x, timestep
        )
        x = x + MultiHeadAttention(self.dim, self.num_heads, self.dropout, self.dtype,
                                   name="self_attn")(h, self_bias, train)
        h = AdaLayerNorm(self.dim, self.num_ada_embeddings, self.dtype, name="norm2")(
            x, timestep
        )
        x = x + MultiHeadAttention(self.dim, self.num_heads, self.dropout, self.dtype,
                                   name="global_attn")(h, gen_bias, train)
        h = nn.LayerNorm(epsilon=1e-5, name="norm3")(x)
        x = x + GEGLUFeedForward(self.dim, self.dropout, dtype=self.dtype, name="ff")(h, train)
        return x


class PoseHead(nn.Module):
    """Linear-SiLU-Linear-SiLU-Linear head (reference :88-105 nn.Sequential); param names
    ``layers_{0,2,4}`` mirror the torch Sequential indices for checkpoint conversion."""

    dim: int
    out_dim: int
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        x = nn.silu(nn.Dense(self.dim, name="layers_0", dtype=self.dtype)(x))
        x = nn.silu(nn.Dense(self.dim // 2, name="layers_2", dtype=self.dtype)(x))
        return nn.Dense(self.out_dim, name="layers_4")(x)


class DenoiserTransformer(nn.Module):
    embed_dim: int = 512
    num_layers: int = 6
    num_heads: int = 8
    num_dim: int = 64  # latent channels per token
    num_point: int = 25  # tokens per part
    max_parts: int = 20
    multires: int = 10
    dropout: float = 0.2
    pe_dropout: float = 0.1
    # AdaLayerNorm embedding table size. The reference sizes it at 6*embed_dim (3072 for the
    # 512-wide model, denoiser_transformer.py:24 ``num_embeds_ada_norm = 6*model_channels``)
    # even though timesteps only reach 999 — the released checkpoints carry [3072, 512] tables,
    # so conversion requires matching rows. 0 means "use 6 * embed_dim".
    num_ada_embeds: int = 0
    dtype: object = None  # compute dtype (jnp.bfloat16 for mixed precision); params stay fp32

    @nn.compact
    def __call__(
        self,
        x,  # [B, P, 7] noisy trans+quat
        timesteps,  # [B] int
        latent,  # [B, P, L, num_dim]
        xyz,  # [B, P, L, 3]
        part_valids,  # [B, P] {0, 1}
        scale,  # [B, P, 1]
        ref_part,  # [B, P] bool
        train: bool = False,
    ):
        B, P, L, _ = latent.shape
        C = self.embed_dim
        T = P * L

        # --- conditioning (reference _gen_cond, :118-137) ---
        scale_emb = nerf_embed(scale, self.multires)  # [B, P, 21]
        scale_emb = jnp.broadcast_to(scale_emb[:, :, None, :], (B, P, L, scale_emb.shape[-1]))
        xyz_emb = nerf_embed(xyz, self.multires)  # [B, P, L, 63]
        shape_in = jnp.concatenate([latent, xyz_emb, scale_emb], axis=-1)
        shape_emb = nn.Dense(C, name="shape_embedding", dtype=self.dtype)(shape_in)

        x_emb = nn.Dense(C, name="param_fc", dtype=self.dtype)(nerf_embed(x, self.multires))

        # --- reference-part embedding (:21, 150-156) ---
        ref_table = nn.Embed(2, C, name="ref_part_emb")(ref_part.astype(jnp.int32))
        x_emb = x_emb + ref_table

        # --- assemble tokens: per-part param emb broadcast over its L tokens (:169-185) ---
        data = x_emb[:, :, None, :] + shape_emb  # [B, P, L, C]

        # per-part sinusoidal position encoding (+ dropout, model_utils.py:5-21)
        pe = jnp.asarray(sinusoidal_table(self.max_parts, C))[:P]
        data = data + pe[None, :, None, :]
        data = nn.Dropout(self.pe_dropout, deterministic=not train)(data)
        data = data.reshape(B, T, C)

        # --- masks (reference _gen_mask, :158-166), as additive biases ---
        part_id = jnp.arange(T) // L
        self_allowed = part_id[:, None] == part_id[None, :]  # [T, T] block-diagonal
        self_bias = jnp.where(self_allowed, 0.0, _NEG_INF)[None, None]  # [1, 1, T, T]
        tok_valid = jnp.repeat(part_valids.astype(bool), L, axis=1)  # [B, T]
        gen_bias = jnp.where(tok_valid, 0.0, _NEG_INF)[:, None, None, :]  # [B, 1, 1, T]

        num_ada = self.num_ada_embeds if self.num_ada_embeds else 6 * C
        for i in range(self.num_layers):
            data = EncoderLayer(
                C, self.num_heads, num_ada, self.dropout, self.dtype,
                name=f"layer{i}",
            )(data, self_bias, gen_bias, timesteps, train)

        # --- output heads (:138-147): mean-pool tokens per part, separate trans/rot MLPs ---
        out = data.reshape(B, P, L, C).mean(axis=2).astype(jnp.float32)
        trans = PoseHead(C, 3, self.dtype, name="mlp_out_trans")(out)
        rots = PoseHead(C, 4, self.dtype, name="mlp_out_rot")(out)
        return jnp.concatenate([trans, rots], axis=-1)  # [B, P, 7]
