"""Attention layers for the matching model (flax.linen, fixed-shape, piece-aware).

Parity targets (Jigsaw_matching/model/jigsaw/attention_layer.py):
  * ``MultiHeadAttention``     — biasless qkv/out projections, post-residual LayerNorm
    (:27-75; note the residual is added BEFORE the norm, torch-style post-norm).
  * ``PositionwiseFeedForward``— two linears + residual + LayerNorm (:78-97).
  * ``CrossAttentionLayer``    — self-attention-as-cross (x attends x) + FFN (:100-113).
  * ``PointTransformerLayer``  — vector attention over piece-aware kNN groups (:159-225):
    q/k/v linears, grouped relative-position MLP (linear_p), grouped weight MLP (linear_w)
    with n_heads value sharing, softmax over the k neighbors.

The flat-cloud [B, N_sum, C] layout with ``piece_id`` replaces the reference's
torch_geometric batch vectors; the BatchNorm1d-as-LayerNorm1d modules keep torch BatchNorm
semantics (per-channel batch statistics) via flax BatchNorm over the flattened point axis.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from puzzlefusion_plusplus_tpu.matching.ops import knn_piece_aware

_NEG_INF = -1e9


class MultiHeadAttention(nn.Module):
    num_heads: int = 8
    dim: int = 512

    @nn.compact
    def __call__(self, q_in, k_in, v_in, mask=None):
        B, Tq, C = q_in.shape
        h = self.num_heads
        hd = C // h
        q = nn.Dense(C, use_bias=False, name="w_qs")(q_in).reshape(B, Tq, h, hd)
        k = nn.Dense(C, use_bias=False, name="w_ks")(k_in).reshape(B, -1, h, hd)
        v = nn.Dense(C, use_bias=False, name="w_vs")(v_in).reshape(B, -1, h, hd)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) / np.sqrt(hd)
        if mask is not None:
            scores = jnp.where(mask[:, None], scores, _NEG_INF)
        probs = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(B, Tq, C)
        out = nn.Dense(C, use_bias=False, name="fc")(out)
        out = out + q_in  # post-norm residual (reference :70-73)
        return nn.LayerNorm(epsilon=1e-6, name="layer_norm")(out)


class PositionwiseFeedForward(nn.Module):
    dim: int
    hidden: int

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.hidden, name="w_1")(x)
        h = nn.Dense(self.dim, name="w_2")(nn.relu(h))
        return nn.LayerNorm(epsilon=1e-6, name="layer_norm")(h + x)


class CrossAttentionLayer(nn.Module):
    dim: int
    num_heads: int

    @nn.compact
    def __call__(self, x, mask=None):
        x = MultiHeadAttention(self.num_heads, self.dim, name="attn")(x, x, x, mask)
        return PositionwiseFeedForward(self.dim, 2 * self.dim, name="pos_ffn")(x)


class BatchNormPoints(nn.Module):
    """torch BatchNorm1d over channels of a flattened point set (the reference's
    LayerNorm1d subclass of BatchNorm1d, attention_layer.py:118-126).

    ``weights``: optional per-point {0,1} mask (any shape broadcastable to x[..., 0]) —
    train-mode statistics then ignore zero-weight points. The reference computes these BNs
    on ragged valid-only buffers; in the fixed-shape design the invalid tail slots would
    otherwise pollute the statistics (and make them depend on the pad)."""

    @nn.compact
    def __call__(self, x, train: bool = False, weights=None):
        from puzzlefusion_plusplus_tpu.models.vqvae import MaskedBatchNorm

        orig = x.shape
        x = x.reshape(-1, orig[-1])
        w = None if weights is None else weights.reshape(-1)
        # name pins the param/stat tree to the previous nn.BatchNorm auto-name, keeping
        # existing checkpoints loadable (weights=None is numerically identical)
        x = MaskedBatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5, name="BatchNorm_0"
        )(x, w)
        return x.reshape(orig)


class PointTransformerLayer(nn.Module):
    in_feat: int
    out_feat: int
    n_heads: int = 8
    n_sample: int = 16

    @nn.compact
    def __call__(self, xyz, feats, pid, train: bool = False):
        """xyz: [B, N, 3], feats: [B, N, in_feat], pid: [B, N] piece ids."""
        B, N, _ = xyz.shape
        C = self.out_feat
        x_q = nn.Dense(C, name="linear_q")(feats)
        x_k = nn.Dense(C, name="linear_k")(feats)
        x_v = nn.Dense(C, name="linear_v")(feats)

        from puzzlefusion_plusplus_tpu.ops.grouping import index_points

        _, idx = knn_piece_aware(xyz, pid, self.n_sample)  # [B, N, k] same-piece knn
        # gather neighbors: [B, N, k, C] / [B, N, k, 3]
        k_nbr = index_points(x_k, idx)
        v_nbr = index_points(x_v, idx)
        p_nbr = index_points(xyz, idx) - xyz[:, :, None, :]

        # linear_p: Linear(3,3) -> BN -> ReLU -> Linear(3, C)   (reference :178-183)
        p_r = nn.Dense(3, name="linear_p0")(p_nbr)
        p_r = BatchNormPoints(name="linear_p_bn")(p_r, train)
        p_r = nn.Dense(C, name="linear_p1")(nn.relu(p_r))

        # r_qk = k - q + p_r; the reference's einops reduce "(i j) -> j" with j = mid_feat
        # is the identity since out_feat == mid_feat (:195-201)
        r_qk = k_nbr - x_q[:, :, None, :] + p_r

        # linear_w: BN -> ReLU -> Linear(C, C/h) -> BN -> ReLU -> Linear(C/h, C/h)
        w = BatchNormPoints(name="linear_w_bn0")(r_qk, train)
        w = nn.Dense(C // self.n_heads, name="linear_w0")(nn.relu(w))
        w = BatchNormPoints(name="linear_w_bn1")(w, train)
        w = nn.Dense(C // self.n_heads, name="linear_w1")(nn.relu(w))
        w = jax.nn.softmax(w, axis=2)  # over the k neighbors (reference softmax dim=1)

        # value sharing: C channels viewed as (heads, C/h); weights shared across heads
        vv = (v_nbr + p_r).reshape(B, N, self.n_sample, self.n_heads, C // self.n_heads)
        out = jnp.einsum("bnksi,bnki->bnsi", vv, w)
        return out.reshape(B, N, C)
