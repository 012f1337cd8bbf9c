"""Pairwise-alignment verifier transformer (flax.linen).

Capability parity with the reference VerifierTransformer
(puzzlefusion_plusplus/verifier/model/modules/verifier_transformer.py:9-65): edge tokens are a
7-dim feature (6 normalized CD-histogram bins + raw match count) lifted to 256 dims, with edge
identity encoded by concatenating the two endpoint nodes' 128-dim sinusoidal position encodings;
a 6-layer post-norm transformer encoder (torch ``TransformerEncoderLayer`` semantics: dim 256,
8 heads, FF 2048, gelu, dropout 0.1, key-padding mask) and a linear 1-logit head.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from puzzlefusion_plusplus_tpu.models.embeddings import sinusoidal_table

_NEG_INF = -1e9


class TorchEncoderLayer(nn.Module):
    """Post-norm torch.nn.TransformerEncoderLayer: attn -> add&norm -> FF -> add&norm."""

    dim: int
    num_heads: int
    ff_dim: int = 2048
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, key_bias, train: bool = False):
        B, T, C = x.shape
        h = self.num_heads
        hd = C // h
        # torch MultiheadAttention: packed in-proj with bias, biased out-proj
        q = nn.Dense(C, name="q_proj")(x)
        k = nn.Dense(C, name="k_proj")(x)
        v = nn.Dense(C, name="v_proj")(x)
        q = q.reshape(B, T, h, hd).transpose(0, 2, 1, 3)
        k = k.reshape(B, T, h, hd).transpose(0, 2, 1, 3)
        v = v.reshape(B, T, h, hd).transpose(0, 2, 1, 3)
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(hd)
        if key_bias is not None:
            scores = scores + key_bias
        probs = nn.softmax(scores, axis=-1)
        probs = nn.Dropout(self.dropout, deterministic=not train)(probs)
        attn = jnp.einsum("bhqk,bhkd->bhqd", probs, v).transpose(0, 2, 1, 3).reshape(B, T, C)
        attn = nn.Dense(C, name="out_proj")(attn)
        x = nn.LayerNorm(epsilon=1e-5, name="norm1")(x + nn.Dropout(self.dropout, deterministic=not train)(attn))

        ff = nn.Dense(self.ff_dim, name="linear1")(x)
        ff = nn.gelu(ff, approximate=False)
        ff = nn.Dropout(self.dropout, deterministic=not train)(ff)
        ff = nn.Dense(C, name="linear2")(ff)
        x = nn.LayerNorm(epsilon=1e-5, name="norm2")(x + nn.Dropout(self.dropout, deterministic=not train)(ff))
        return x


class VerifierTransformer(nn.Module):
    embed_dim: int = 256
    num_layers: int = 6
    num_heads: int = 8
    max_nodes: int = 20
    num_features: int = 7  # 6 histogram bins + match count
    ff_dim: int = 2048  # torch TransformerEncoderLayer dim_feedforward (reference :23)

    @nn.compact
    def __call__(self, edge_features, edge_indices, edge_valids, train: bool = False):
        """edge_features: [B, E, 7], edge_indices: [B, E, 2] int, edge_valids: [B, E] {0,1}.

        Returns logits [B, E, 1].
        """
        B, E, _ = edge_indices.shape
        feat = nn.Dense(self.embed_dim, name="edge_feature_emb")(edge_features)
        pe = jnp.asarray(sinusoidal_table(self.max_nodes, self.embed_dim // 2))
        idx_pe = pe[edge_indices].reshape(B, E, self.embed_dim)  # concat of both endpoint PEs
        x = idx_pe + feat

        key_bias = jnp.where(edge_valids.astype(bool), 0.0, _NEG_INF)[:, None, None, :]
        for i in range(self.num_layers):
            x = TorchEncoderLayer(
                self.embed_dim, self.num_heads, self.ff_dim, name=f"layer{i}"
            )(x, key_bias, train)
        return nn.Dense(1, name="mlp_out")(x)
