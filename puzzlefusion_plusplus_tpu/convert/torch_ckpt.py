"""PyTorch (Lightning) checkpoint -> flax/orbax converter for the released reference weights.

The reference distributes three Lightning checkpoints whose state_dicts are split/remapped by
key prefix at load time ('ae.' -> '' for the VQ-VAE into the denoiser, 'denoiser.'/'encoder.'/
'verifier.' splits in test.py:24-38 — SURVEY.md §5.4). This module maps those state_dicts onto
our flax parameter trees:

  * Linear weight [out, in]        -> Dense kernel [in, out] (transpose)
  * Conv1d/Conv2d 1x1 [out, in, 1(,1)] -> Dense kernel [in, out]
  * BatchNorm{1,2}d weight/bias/running_mean/running_var -> BatchNorm scale/bias + batch_stats
  * nn.Embedding weight            -> Embed embedding
  * torch MultiheadAttention packed in_proj_weight/bias -> split q/k/v Dense kernels

Works on CPU torch only (torch.load with map_location='cpu'); no reference code is imported.
"""

from __future__ import annotations

from typing import Mapping

import numpy as np


def _t(w) -> np.ndarray:  # torch tensor -> numpy
    return np.asarray(w.detach().cpu().numpy() if hasattr(w, "detach") else w)


def _linear(sd: Mapping, prefix: str) -> dict:
    out = {"kernel": _t(sd[prefix + ".weight"]).T}
    if prefix + ".bias" in sd:
        out["bias"] = _t(sd[prefix + ".bias"])
    return out


def _conv1x1(sd: Mapping, prefix: str) -> dict:
    w = _t(sd[prefix + ".weight"])  # [out, in, 1] or [out, in, 1, 1]
    return {"kernel": w.reshape(w.shape[0], w.shape[1]).T, "bias": _t(sd[prefix + ".bias"])}


def _bn(sd: Mapping, prefix: str) -> tuple[dict, dict]:
    params = {"scale": _t(sd[prefix + ".weight"]), "bias": _t(sd[prefix + ".bias"])}
    stats = {"mean": _t(sd[prefix + ".running_mean"]), "var": _t(sd[prefix + ".running_var"])}
    return params, stats


def strip_prefix(sd: Mapping, prefix: str) -> dict:
    return {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}


# ------------------------------------------------------------------ VQ-VAE


def convert_vqvae(sd: Mapping) -> dict:
    """state_dict (keys under 'pn2.' / 'vector_quantization.') -> {params, batch_stats}."""
    params: dict = {"pn2": {}, "vector_quantization": {}}
    stats: dict = {"pn2": {}}
    for sa in ("sa1", "sa2", "sa3"):
        p_sa: dict = {}
        s_sa: dict = {}
        for j in range(3):
            p_sa[f"conv{j}"] = _conv1x1(sd, f"pn2.{sa}.mlp_convs.{j}")
            bn_p, bn_s = _bn(sd, f"pn2.{sa}.mlp_bns.{j}")
            p_sa[f"bn{j}"] = bn_p
            s_sa[f"bn{j}"] = bn_s
        params["pn2"][sa] = p_sa
        stats["pn2"][sa] = s_sa
    params["pn2"]["conv6"] = _conv1x1(sd, "pn2.conv6")
    for fc in ("fc1", "fc2", "fc3"):
        params["pn2"][fc] = _linear(sd, f"pn2.{fc}")
    params["vector_quantization"]["embedding"] = _t(sd["vector_quantization.embedding.weight"])
    return {"params": params, "batch_stats": stats}


def convert_vqvae_checkpoint(lightning_sd: Mapping) -> dict:
    """Full FractureAE Lightning ckpt: keys 'ae.*' (train_denoiser.py:32 remap)."""
    return convert_vqvae(strip_prefix(lightning_sd, "ae."))


# ------------------------------------------------------------------ denoiser


def _adaln(sd: Mapping, prefix: str) -> dict:
    return {
        "emb": {"embedding": _t(sd[prefix + ".emb.weight"])},
        "linear": _linear(sd, prefix + ".linear"),
    }


def _diffusers_attn(sd: Mapping, prefix: str) -> dict:
    return {
        "to_q": {"kernel": _t(sd[prefix + ".to_q.weight"]).T},
        "to_k": {"kernel": _t(sd[prefix + ".to_k.weight"]).T},
        "to_v": {"kernel": _t(sd[prefix + ".to_v.weight"]).T},
        "to_out": _linear(sd, prefix + ".to_out.0"),
    }


def convert_denoiser(sd: Mapping) -> dict:
    """DenoiserTransformer state_dict (keys under 'denoiser.' already stripped) -> params."""
    params: dict = {
        "ref_part_emb": {"embedding": _t(sd["ref_part_emb.weight"])},
        "shape_embedding": _linear(sd, "shape_embedding"),
        "param_fc": _linear(sd, "param_fc"),
    }
    n_layers = 1 + max(
        int(k.split(".")[1]) for k in sd if k.startswith("transformer_layers.")
    )
    for i in range(n_layers):
        p = f"transformer_layers.{i}"
        params[f"layer{i}"] = {
            "norm1": _adaln(sd, f"{p}.norm1"),
            "self_attn": _diffusers_attn(sd, f"{p}.self_attn"),
            "norm2": _adaln(sd, f"{p}.norm2"),
            "global_attn": _diffusers_attn(sd, f"{p}.global_attn"),
            "norm3": {"scale": _t(sd[f"{p}.norm3.weight"]), "bias": _t(sd[f"{p}.norm3.bias"])},
            "ff": {
                "proj": _linear(sd, f"{p}.ff.net.0.proj"),
                "out": _linear(sd, f"{p}.ff.net.2"),
            },
        }
    for head in ("mlp_out_trans", "mlp_out_rot"):
        # torch Sequential(Linear, SiLU, Linear, SiLU, Linear) -> indices 0, 2, 4;
        # flax nn.Sequential names module list entries by position: layers_0, layers_2, layers_4
        params[head] = {
            f"layers_{j}": _linear(sd, f"{head}.{j}") for j in (0, 2, 4)
        }
    return {"params": params}


def convert_denoiser_checkpoint(lightning_sd: Mapping) -> dict:
    """Full Denoiser/AutoAgglomerative ckpt: splits 'denoiser.' / 'encoder.' (test.py:24-38)."""
    out = {"denoiser": convert_denoiser(strip_prefix(lightning_sd, "denoiser."))}
    enc = strip_prefix(lightning_sd, "encoder.")
    if enc:
        out["encoder"] = convert_vqvae(enc)
    return out


# ------------------------------------------------------------------ verifier


def convert_verifier(sd: Mapping) -> dict:
    """VerifierTransformer state_dict (keys under 'verifier.' stripped) -> params."""
    params: dict = {
        "edge_feature_emb": _linear(sd, "edge_feature_emb"),
        "mlp_out": _linear(sd, "mlp_out"),
    }
    n_layers = 1 + max(
        int(k.split(".")[2]) for k in sd if k.startswith("transformer_encoder.layers.")
    )
    for i in range(n_layers):
        p = f"transformer_encoder.layers.{i}"
        w = _t(sd[f"{p}.self_attn.in_proj_weight"])  # [3C, C] packed q,k,v
        b = _t(sd[f"{p}.self_attn.in_proj_bias"])
        C = w.shape[1]
        params[f"layer{i}"] = {
            "q_proj": {"kernel": w[:C].T, "bias": b[:C]},
            "k_proj": {"kernel": w[C : 2 * C].T, "bias": b[C : 2 * C]},
            "v_proj": {"kernel": w[2 * C :].T, "bias": b[2 * C :]},
            "out_proj": _linear(sd, f"{p}.self_attn.out_proj"),
            "linear1": _linear(sd, f"{p}.linear1"),
            "linear2": _linear(sd, f"{p}.linear2"),
            "norm1": {"scale": _t(sd[f"{p}.norm1.weight"]), "bias": _t(sd[f"{p}.norm1.bias"])},
            "norm2": {"scale": _t(sd[f"{p}.norm2.weight"]), "bias": _t(sd[f"{p}.norm2.bias"])},
        }
    return {"params": params}


def convert_verifier_checkpoint(lightning_sd: Mapping) -> dict:
    return convert_verifier(strip_prefix(lightning_sd, "verifier."))


# ------------------------------------------------------------------ entry


def convert_file(torch_ckpt_path: str, out_dir: str, kind: str) -> str:
    """Load a Lightning .ckpt with CPU torch and save converted trees with orbax.

    kind: 'vqvae' | 'denoiser' | 'verifier'.
    """
    import torch

    import orbax.checkpoint as ocp
    import os

    sd = torch.load(torch_ckpt_path, map_location="cpu")["state_dict"]
    if kind == "vqvae":
        tree = convert_vqvae_checkpoint(sd)
    elif kind == "denoiser":
        tree = convert_denoiser_checkpoint(sd)
    elif kind == "verifier":
        tree = convert_verifier_checkpoint(sd)
    else:
        raise ValueError(kind)
    path = os.path.abspath(os.path.join(out_dir, kind))
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, tree, force=True)
    ckptr.wait_until_finished()
    return path
