"""Numerical parity of the flax models against torch reimplementations of the reference stack.

Verdict r1 item 2: the converter was structurally tested but only the verifier layer had a
numerical parity test. These tests make the converter a parity *instrument*: inline torch
modules reproduce the reference's exact architectures (no reference imports, CPU torch only),
their ``state_dict()`` — which has the reference's key layout by construction — goes through
``convert_*``, and the flax forward must match the torch forward within float tolerance.

Covered:
  * full DenoiserTransformer forward (denoiser_transformer.py:169-202) incl. AdaLN (attention.py
    :5-25), diffusers Attention/GEGLU (:30-92), NeRF embeddings, ref-part quirk, dual masks;
  * one EncoderLayer in isolation (tighter tolerance);
  * PN2 encode in BatchNorm eval mode with identical FPS/ball-query indices injected on both
    sides (pn2.py:57-68, pn2_utils.py:115-216) + quantized VQVAE encode + decode;
  * DDPM scheduler step vs a float64 numpy transcription of diffusers' DDPMScheduler.step
    (epsilon / fixed_small / no clipping / leading spacing — diffusers itself is not installed
    in this image) with the piecewise betas (custom_diffusers.py:38-69), across all 20
    inference timesteps.
"""

import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tests.helpers import jit_apply

torch = pytest.importorskip("torch")
nn = torch.nn

from puzzlefusion_plusplus_tpu.convert.torch_ckpt import convert_denoiser, convert_vqvae
from puzzlefusion_plusplus_tpu.models.denoiser import DenoiserTransformer, EncoderLayer
from puzzlefusion_plusplus_tpu.models.scheduler import (
    DDPMParams,
    add_noise,
    leading_timesteps,
    piecewise_betas,
    step,
)
from puzzlefusion_plusplus_tpu.models.vqvae import PN2, VQVAE, pn2_grouping_indices


# --------------------------------------------------------------------------- torch reimpls
# Test-only transcriptions of the reference's torch modules (attention.py, model_utils.py,
# denoiser_transformer.py, pn2.py + pn2_utils.py). Module/attribute names intentionally match
# the reference so state_dict() keys line up with what the converter expects.


def nerf_torch(x, num_freqs=10):
    outs = [x]
    for f in (2.0 ** torch.linspace(0.0, num_freqs - 1.0, num_freqs)).tolist():
        outs += [torch.sin(x * f), torch.cos(x * f)]
    return torch.cat(outs, dim=-1)


class TAdaLayerNorm(nn.Module):
    def __init__(self, dim, num_embeddings):
        super().__init__()
        self.emb = nn.Embedding(num_embeddings, dim)
        self.linear = nn.Linear(dim, 2 * dim)
        self.norm = nn.LayerNorm(dim, elementwise_affine=False)

    def forward(self, x, timestep):
        emb = self.linear(torch.nn.functional.silu(self.emb(timestep)))
        scale, shift = emb.chunk(2, dim=1)
        return self.norm(x) * (1 + scale[:, None]) + shift[:, None]


class TAttention(nn.Module):
    """diffusers Attention(bias=False) under AttnProcessor2_0: bool masks are keep-masks."""

    def __init__(self, dim, heads):
        super().__init__()
        self.heads = heads
        self.to_q = nn.Linear(dim, dim, bias=False)
        self.to_k = nn.Linear(dim, dim, bias=False)
        self.to_v = nn.Linear(dim, dim, bias=False)
        self.to_out = nn.ModuleList([nn.Linear(dim, dim), nn.Dropout(0.0)])

    def forward(self, x, attention_mask):
        B, T, C = x.shape
        h, hd = self.heads, C // self.heads
        q = self.to_q(x).reshape(B, T, h, hd).transpose(1, 2)
        k = self.to_k(x).reshape(B, T, h, hd).transpose(1, 2)
        v = self.to_v(x).reshape(B, T, h, hd).transpose(1, 2)
        scores = q @ k.transpose(-1, -2) / math.sqrt(hd)
        if attention_mask is not None:
            keep = attention_mask
            if keep.dim() == 2:  # [B, T] key mask (gen_mask)
                keep = keep[:, None, None, :]
            else:  # [B, T, T] (self_mask)
                keep = keep[:, None, :, :]
            scores = scores.masked_fill(~keep, float("-inf"))
        probs = torch.softmax(scores, dim=-1)
        out = (probs @ v).transpose(1, 2).reshape(B, T, C)
        return self.to_out[0](out)


class TGEGLU(nn.Module):
    def __init__(self, dim, inner):
        super().__init__()
        self.proj = nn.Linear(dim, 2 * inner)

    def forward(self, x):
        h, gate = self.proj(x).chunk(2, dim=-1)
        return h * torch.nn.functional.gelu(gate)


class TFeedForward(nn.Module):
    def __init__(self, dim, mult=4):
        super().__init__()
        self.net = nn.ModuleList(
            [TGEGLU(dim, dim * mult), nn.Dropout(0.0), nn.Linear(dim * mult, dim)]
        )

    def forward(self, x):
        for mod in self.net:
            x = mod(x)
        return x


class TEncoderLayer(nn.Module):
    def __init__(self, dim, heads, num_ada):
        super().__init__()
        self.norm1 = TAdaLayerNorm(dim, num_ada)
        self.self_attn = TAttention(dim, heads)
        self.norm2 = TAdaLayerNorm(dim, num_ada)
        self.global_attn = TAttention(dim, heads)
        self.norm3 = nn.LayerNorm(dim)
        self.ff = TFeedForward(dim)

    def forward(self, x, self_mask, gen_mask, timestep):
        x = x + self.self_attn(self.norm1(x, timestep), self_mask)
        x = x + self.global_attn(self.norm2(x, timestep), gen_mask)
        return x + self.ff(self.norm3(x))


class TDenoiserTransformer(nn.Module):
    def __init__(self, dim=64, layers=2, heads=4, num_dim=16, max_parts=20, num_ada=None):
        super().__init__()
        self.C = dim
        self.ref_part_emb = nn.Embedding(2, dim)
        # num_ada: the reference uses 6*model_channels (3072 at width 512, always > the 999
        # max timestep); narrow test widths must widen the table to keep timesteps in range
        self.transformer_layers = nn.ModuleList(
            [TEncoderLayer(dim, heads, num_ada or 6 * dim) for _ in range(layers)]
        )
        self.shape_embedding = nn.Linear(num_dim + 63 + 21, dim)
        self.param_fc = nn.Linear(147, dim)
        # PositionalEncoding buffer (model_utils.py:5-21)
        pe = torch.zeros(max_parts, dim)
        position = torch.arange(0, max_parts, dtype=torch.float).unsqueeze(1)
        div = torch.exp(torch.arange(0, dim, 2).float() * (-math.log(10000.0) / dim))
        pe[:, 0::2] = torch.sin(position * div)
        pe[:, 1::2] = torch.cos(position * div)
        self.register_buffer("pe", pe.unsqueeze(0))

        def head(out):
            return nn.Sequential(
                nn.Linear(dim, dim), nn.SiLU(), nn.Linear(dim, dim // 2), nn.SiLU(),
                nn.Linear(dim // 2, out),
            )

        self.mlp_out_trans = head(3)
        self.mlp_out_rot = head(4)

    def forward(self, x, timesteps, latent, xyz, part_valids, scale, ref_part):
        B, N, L, _ = latent.shape
        C = self.C
        scale_emb = nerf_torch(scale.flatten(0, 1)).unsqueeze(1).repeat(1, L, 1)
        xyz_emb = nerf_torch(xyz.flatten(0, 1))
        shape_emb = self.shape_embedding(
            torch.cat((latent.flatten(0, 1), xyz_emb, scale_emb), dim=-1)
        )
        x_emb = self.param_fc(nerf_torch(x.flatten(0, 1))).reshape(B, N, C)
        ref_emb = self.ref_part_emb.weight[0].repeat(B, N, 1).clone()
        ref_emb[ref_part.bool()] = self.ref_part_emb.weight[1]
        x_emb = x_emb + ref_emb
        data = x_emb.reshape(B, N, 1, C).repeat(1, 1, L, 1).reshape(B, N * L, C)
        data = data + shape_emb.reshape(B, N * L, C)
        data = (data.reshape(B, N, L, C) + self.pe[:, :N].unsqueeze(2)).reshape(B, N * L, C)

        self_block = torch.ones(L, L, dtype=torch.bool)
        self_mask = torch.block_diag(*([self_block] * N)).unsqueeze(0).repeat(B, 1, 1)
        gen_mask = part_valids.unsqueeze(-1).repeat(1, 1, L).flatten(1, 2).bool()
        for layer in self.transformer_layers:
            data = layer(data, self_mask, gen_mask, timesteps)
        out = data.reshape(B, N, L, C).mean(dim=2)
        return torch.cat([self.mlp_out_trans(out), self.mlp_out_rot(out)], dim=-1)


def _denoiser_inputs(B=2, P=4, L=5, num_dim=16, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(B, P, 7)).astype(np.float32)
    # table rows = 6*embed_dim = 384 at the test width; keep indices in range
    timesteps = rng.integers(0, 300, size=(B,)).astype(np.int64)
    latent = rng.normal(size=(B, P, L, num_dim)).astype(np.float32)
    xyz = rng.normal(size=(B, P, L, 3)).astype(np.float32)
    valids = np.ones((B, P), np.float32)
    valids[1, 3] = 0.0
    scale = (rng.uniform(0.2, 1.0, size=(B, P, 1))).astype(np.float32)
    ref = np.zeros((B, P), bool)
    ref[0, 0] = True
    ref[1, 1] = True
    return x, timesteps, latent, xyz, valids, scale, ref


def test_denoiser_transformer_full_forward_parity():
    torch.manual_seed(0)
    C, layers, heads, num_dim, P, L = 64, 2, 4, 16, 4, 5
    tmodel = TDenoiserTransformer(C, layers, heads, num_dim).eval()
    params = convert_denoiser(tmodel.state_dict())["params"]

    inputs = _denoiser_inputs(num_dim=num_dim)
    with torch.no_grad():
        ref_out = tmodel(*[torch.from_numpy(np.asarray(a)) for a in inputs]).numpy()

    model = DenoiserTransformer(embed_dim=C, num_layers=layers, num_heads=heads,
                                num_dim=num_dim, num_point=L, max_parts=P)
    x, t, latent, xyz, valids, scale, ref = [jnp.asarray(a) for a in inputs]
    out = jit_apply(model, {"params": jax.tree.map(jnp.asarray, params)},
                    x, t.astype(jnp.int32), latent, xyz, valids, scale, ref, train=False)
    np.testing.assert_allclose(np.asarray(out), ref_out, atol=5e-5)


def test_denoiser_encoder_layer_parity():
    torch.manual_seed(1)
    C, heads, P, L = 32, 4, 3, 4
    T = P * L
    tlayer = TEncoderLayer(C, heads, 6 * C).eval()

    rng = np.random.default_rng(2)
    x = rng.normal(size=(2, T, C)).astype(np.float32)
    timestep = np.array([7, 123], np.int64)
    valids = np.array([[1, 1, 1], [1, 1, 0]], np.float32)

    self_block = torch.ones(L, L, dtype=torch.bool)
    self_mask = torch.block_diag(*([self_block] * P)).unsqueeze(0).repeat(2, 1, 1)
    gen_mask = torch.from_numpy(valids).unsqueeze(-1).repeat(1, 1, L).flatten(1, 2).bool()
    with torch.no_grad():
        ref_out = tlayer(torch.from_numpy(x), self_mask, gen_mask,
                         torch.from_numpy(timestep)).numpy()

    # route the torch weights through the converter (as one transformer_layers.0 block)
    sd = {f"transformer_layers.0.{k}": v for k, v in tlayer.state_dict().items()}
    sd.update({
        "ref_part_emb.weight": torch.zeros(2, C),
        "shape_embedding.weight": torch.zeros(C, 100), "shape_embedding.bias": torch.zeros(C),
        "param_fc.weight": torch.zeros(C, 147), "param_fc.bias": torch.zeros(C),
    })
    for head, out in (("mlp_out_trans", 3), ("mlp_out_rot", 4)):
        sd[f"{head}.0.weight"] = torch.zeros(C, C)
        sd[f"{head}.0.bias"] = torch.zeros(C)
        sd[f"{head}.2.weight"] = torch.zeros(C // 2, C)
        sd[f"{head}.2.bias"] = torch.zeros(C // 2)
        sd[f"{head}.4.weight"] = torch.zeros(out, C // 2)
        sd[f"{head}.4.bias"] = torch.zeros(out)
    params = convert_denoiser(sd)["params"]["layer0"]

    part_id = np.arange(T) // L
    self_bias = jnp.where(part_id[:, None] == part_id[None, :], 0.0, -1e9)[None, None]
    tok_valid = np.repeat(valids.astype(bool), L, axis=1)
    gen_bias = jnp.where(jnp.asarray(tok_valid), 0.0, -1e9)[:, None, None, :]
    layer = EncoderLayer(C, heads, 6 * C, dropout=0.0)
    out = jax.jit(layer.apply, static_argnums=5)(
        {"params": jax.tree.map(jnp.asarray, params)}, jnp.asarray(x),
        self_bias, gen_bias, jnp.asarray(timestep.astype(np.int32)), False)
    np.testing.assert_allclose(np.asarray(out), ref_out, atol=2e-5)


# --------------------------------------------------------------------------- PN2 / VQ-VAE


def _index_points_t(points, idx):
    B = points.shape[0]
    bidx = torch.arange(B).view(B, *([1] * (idx.dim() - 1))).expand(idx.shape)
    return points[bidx, idx]


class TSA(nn.Module):
    """PointNetSetAbstraction (pn2_utils.py:175-216) with injected sampling indices."""

    def __init__(self, cin, mlp):
        super().__init__()
        self.mlp_convs = nn.ModuleList()
        self.mlp_bns = nn.ModuleList()
        last = cin
        for c in mlp:
            self.mlp_convs.append(nn.Conv2d(last, c, 1))
            self.mlp_bns.append(nn.BatchNorm2d(c))
            last = c

    def forward(self, xyz, points, fps_idx, group_idx):
        new_xyz = _index_points_t(xyz, fps_idx)  # [B, S, 3]
        grouped = _index_points_t(xyz, group_idx) - new_xyz.unsqueeze(2)  # [B, S, K, 3]
        if points is not None:
            grouped = torch.cat([grouped, _index_points_t(points, group_idx)], dim=-1)
        h = grouped.permute(0, 3, 2, 1)  # [B, C+D, K, S]
        for conv, bn in zip(self.mlp_convs, self.mlp_bns):
            h = torch.relu(bn(conv(h)))
        return new_xyz, h.max(dim=2)[0].permute(0, 2, 1)  # [B, S, C']


class TPN2(nn.Module):
    def __init__(self, num_dim=64, local_decode_pts=40):
        super().__init__()
        self.sa1 = TSA(3, [64, 64, 128])
        self.sa2 = TSA(128 + 3, [128, 128, 256])
        self.sa3 = TSA(256 + 3, [256, 256, 512])
        self.conv6 = nn.Conv1d(512, num_dim, 1)
        self.fc1 = nn.Linear(num_dim, 256)
        self.fc2 = nn.Linear(256, 512)
        self.fc3 = nn.Linear(512, local_decode_pts * 3)

    def encode(self, xyz, idx):
        (f1, g1), (f2, g2), (f3, g3) = idx
        l1_xyz, l1_points = self.sa1(xyz, None, f1, g1)
        l2_xyz, l2_points = self.sa2(l1_xyz, l1_points, f2, g2)
        l3_xyz, l3_points = self.sa3(l2_xyz, l2_points, f3, g3)
        feat = self.conv6(l3_points.permute(0, 2, 1)).permute(0, 2, 1)
        return feat, l3_xyz

    def decode(self, feat, num_point, local_decode_pts):
        x = torch.relu(self.fc1(feat))
        x = torch.relu(self.fc2(x))
        return self.fc3(x).reshape(feat.shape[0], num_point, local_decode_pts, 3)


def _pn2_setup(seed=0):
    """Torch PN2 with non-trivial BatchNorm running stats + matching flax params."""
    torch.manual_seed(seed)
    tpn2 = TPN2()
    B, N = 2, 128
    npoint, sa_np, sa_ns = 8, (32, 16), (8, 8, 8)
    rng = np.random.default_rng(seed)
    # populate running stats with a couple of train-mode passes
    tpn2.train()
    for i in range(3):
        xyz = rng.normal(size=(B, N, 3)).astype(np.float32)
        idx = pn2_grouping_indices(jnp.asarray(xyz), npoint, sa_np, sa_ns)
        tidx = [(torch.from_numpy(np.asarray(f, np.int64)), torch.from_numpy(np.asarray(g, np.int64)))
                for f, g in idx]
        with torch.no_grad():
            tpn2.encode(torch.from_numpy(xyz), tidx)
    tpn2.eval()
    sd = {f"pn2.{k}": v for k, v in tpn2.state_dict().items()}
    g = torch.Generator().manual_seed(seed)
    sd["vector_quantization.embedding.weight"] = torch.randn(32, 16, generator=g)
    tree = convert_vqvae(sd)
    return tpn2, sd, tree, (npoint, sa_np, sa_ns)


def test_pn2_encode_parity_batchnorm_eval():
    tpn2, sd, tree, (npoint, sa_np, sa_ns) = _pn2_setup()
    rng = np.random.default_rng(42)
    xyz = rng.normal(size=(2, 128, 3)).astype(np.float32)
    idx = pn2_grouping_indices(jnp.asarray(xyz), npoint, sa_np, sa_ns)
    tidx = [(torch.from_numpy(np.asarray(f, np.int64)), torch.from_numpy(np.asarray(g, np.int64)))
            for f, g in idx]
    with torch.no_grad():
        ref_feat, ref_xyz = tpn2.encode(torch.from_numpy(xyz), tidx)

    model = PN2(num_point=npoint, num_dim=64, local_decode_pts=40,
                sa_npoints=sa_np, sa_nsamples=sa_ns)
    variables = {"params": jax.tree.map(jnp.asarray, tree["params"]["pn2"]),
                 "batch_stats": jax.tree.map(jnp.asarray, tree["batch_stats"]["pn2"])}
    feat, l3_xyz = jax.jit(model.apply, static_argnums=2, static_argnames="method")(
        variables, jnp.asarray(xyz), False, idx, method=PN2.encode)
    np.testing.assert_allclose(np.asarray(l3_xyz), ref_xyz.numpy(), atol=1e-6)
    np.testing.assert_allclose(np.asarray(feat), ref_feat.numpy(), atol=2e-4)


def test_vqvae_encode_quantize_decode_parity():
    tpn2, sd, tree, (npoint, sa_np, sa_ns) = _pn2_setup(seed=3)
    rng = np.random.default_rng(7)
    xyz = rng.normal(size=(2, 128, 3)).astype(np.float32)
    idx = pn2_grouping_indices(jnp.asarray(xyz), npoint, sa_np, sa_ns)
    tidx = [(torch.from_numpy(np.asarray(f, np.int64)), torch.from_numpy(np.asarray(g, np.int64)))
            for f, g in idx]
    codebook = sd["vector_quantization.embedding.weight"]
    with torch.no_grad():
        feat, _ = tpn2.encode(torch.from_numpy(xyz), tidx)
        B, L, _ = feat.shape
        z = feat.reshape(B, 4 * L, 16).reshape(-1, 16)  # quantizer.py:26-44
        d = (z**2).sum(1, keepdim=True) + (codebook**2).sum(1) - 2 * z @ codebook.T
        code = d.argmin(dim=1)
        z_q = codebook[code].reshape(B, 4 * L, 16).reshape(B, L, 64)
        ref_dec = tpn2.decode(z_q, npoint, 40)

    model = VQVAE(n_embeddings=32, embedding_dim=16, num_point=npoint, num_dim=64,
                  local_decode_pts=40, sa_npoints=sa_np, sa_nsamples=sa_ns)
    variables = {"params": jax.tree.map(jnp.asarray, tree["params"]),
                 "batch_stats": jax.tree.map(jnp.asarray, tree["batch_stats"])}
    enc = jax.jit(model.apply, static_argnums=2, static_argnames="method")(
        variables, jnp.asarray(xyz), False, idx, method=VQVAE.encode)
    np.testing.assert_allclose(np.asarray(enc["z_q"]), z_q.numpy(), atol=2e-4)
    dec = jax.jit(model.apply, static_argnames="method")(
        variables, enc["z_q"], method=VQVAE.decode)
    np.testing.assert_allclose(np.asarray(dec), ref_dec.numpy(), atol=5e-4)


# --------------------------------------------------------------------------- scheduler


def _ref_piecewise_betas(n=1000, max_beta=0.999):
    """Scalar-python transcription of custom_diffusers.py betas_for_alpha_bar (float64)."""

    def alpha_bar(t):
        t = t * 1000
        if t <= 700:
            return 1 - 0.1 * (t / 700) ** 2
        return 0.9 * (1 - ((t - 700) / 300) ** 2)

    return np.array(
        [min(1 - alpha_bar((i + 1) / n) / alpha_bar(i / n), max_beta) for i in range(n)],
        np.float32,
    )


def _diffusers_step_numpy(betas, num_train, num_inf, model_output, t, sample, noise):
    """float64 transcription of diffusers DDPMScheduler.step (epsilon, fixed_small, no clip)."""
    alphas_cumprod = np.cumprod(1.0 - betas.astype(np.float64))
    prev_t = t - num_train // num_inf
    alpha_prod_t = alphas_cumprod[t]
    alpha_prod_t_prev = alphas_cumprod[prev_t] if prev_t >= 0 else 1.0
    beta_prod_t = 1.0 - alpha_prod_t
    beta_prod_t_prev = 1.0 - alpha_prod_t_prev
    current_alpha_t = alpha_prod_t / alpha_prod_t_prev
    current_beta_t = 1.0 - current_alpha_t
    pred_x0 = (sample - beta_prod_t**0.5 * model_output) / alpha_prod_t**0.5
    pred_x0_coeff = alpha_prod_t_prev**0.5 * current_beta_t / beta_prod_t
    sample_coeff = current_alpha_t**0.5 * beta_prod_t_prev / beta_prod_t
    prev = pred_x0_coeff * pred_x0 + sample_coeff * sample
    if t > 0:
        var = max(beta_prod_t_prev / beta_prod_t * current_beta_t, 1e-20)
        prev = prev + var**0.5 * noise
    return prev


def test_piecewise_betas_match_reference_formula():
    np.testing.assert_allclose(piecewise_betas(1000), _ref_piecewise_betas(1000), atol=1e-7)


def test_leading_timesteps():
    np.testing.assert_array_equal(
        leading_timesteps(1000, 20), np.arange(950, -1, -50, dtype=np.int32)
    )


def test_scheduler_step_parity_all_20_timesteps():
    params = DDPMParams.piecewise(1000)
    betas = np.asarray(params.betas)
    rng = np.random.default_rng(0)
    sample = rng.normal(size=(3, 7)).astype(np.float32)
    for t in leading_timesteps(1000, 20):
        eps = rng.normal(size=sample.shape).astype(np.float32)
        noise = rng.normal(size=sample.shape).astype(np.float32)
        ref = _diffusers_step_numpy(betas, 1000, 20, eps.astype(np.float64), int(t),
                                    sample.astype(np.float64), noise.astype(np.float64))
        got = step(params, jnp.asarray(eps), jnp.asarray(t), jnp.asarray(sample),
                   jnp.asarray(noise), 20)
        np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-4, atol=2e-5)
        sample = np.asarray(got)  # roll the trajectory forward like the sampler does


def test_add_noise_parity():
    params = DDPMParams.piecewise(1000)
    acp = np.cumprod(1.0 - np.asarray(params.betas, np.float64))
    rng = np.random.default_rng(1)
    x0 = rng.normal(size=(2, 4, 7)).astype(np.float32)
    eps = rng.normal(size=x0.shape).astype(np.float32)
    t = np.array([13, 977])
    ref = (np.sqrt(acp[t])[:, None, None] * x0 + np.sqrt(1 - acp[t])[:, None, None] * eps)
    got = add_noise(params, jnp.asarray(x0), jnp.asarray(eps), jnp.asarray(t))
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-5, atol=1e-6)


# ------------------------------------------------------- full-trajectory composition

def _quat_apply_t(q, p):
    """pytorch3d transforms.quaternion_apply (scalar-first), the reference's rotation op
    (denoiser.py:55-62 _apply_rots)."""
    w, v = q[..., :1], q[..., 1:]
    t = 2.0 * torch.cross(v.expand_as(p), p, dim=-1)
    return p + w * t + torch.cross(v.expand_as(p), t, dim=-1)


def _torch_extract_features(tpn2, codebook, part_pcs, part_valids, noisy, enc_shapes):
    """Reference Denoiser._extract_features (denoiser.py:66-77): normalize the noisy quat,
    rotate, boolean-select valid parts, frozen VQ-VAE encode (vq_vae.py:23-55 quantization),
    scatter into dense [B, P, L, *]. FPS/ball-query indices are computed on the ROTATED
    clouds exactly as the reference encoder does — their equality with the jax side's cached
    unrotated-cloud indices is the rotation-invariance claim under test."""
    npoint, sa_np, sa_ns = enc_shapes
    B, P, N, _ = part_pcs.shape
    q = noisy[..., 3:]
    q = q / q.norm(dim=-1, keepdim=True)
    rotated = _quat_apply_t(q.unsqueeze(2), part_pcs)
    sel = rotated[part_valids.bool()]  # [M, N, 3]
    idx = pn2_grouping_indices(jnp.asarray(sel.numpy()), npoint, sa_np, sa_ns)
    tidx = [
        (torch.from_numpy(np.asarray(f, np.int64)), torch.from_numpy(np.asarray(g, np.int64)))
        for f, g in idx
    ]
    feat, l3_xyz = tpn2.encode(sel, tidx)
    M, L, _ = feat.shape
    z = feat.reshape(M, 4 * L, 16).reshape(-1, 16)
    d = (z**2).sum(1, keepdim=True) + (codebook**2).sum(1) - 2 * z @ codebook.T
    z_q = codebook[d.argmin(dim=1)].reshape(M, 4 * L, 16).reshape(M, L, 64)
    latent = torch.zeros(B, P, L, 64)
    xyz = torch.zeros(B, P, L, 3)
    latent[part_valids.bool()] = z_q
    xyz[part_valids.bool()] = l3_xyz
    return latent, xyz


def test_full_trajectory_parity_converted_weights():
    """VERDICT r2 item 1: converted torch weights through the FULL 20-step reverse loop.

    Torch side transcribes the reference validation sampler (denoiser.py:153-209): per step
    re-encode the noisily-rotated clouds through the frozen VQ-VAE, run the denoiser, take a
    diffusers DDPMScheduler.step, pin reference parts. Jax side is the production path:
    ``build_feature_cache`` + ``extract_features`` + ``ddpm_sample`` (lax.scan) from
    CONVERTED weights, with the identical init/per-step noise injected. Denoiser weights are
    damped 0.05x (contractive map) so float-association epsilon between torch-CPU and
    XLA-CPU does not amplify chaotically over the 20-step recurrence
    (see tests/test_bucketing.py module docstring for the expansive-weights analysis)."""
    from puzzlefusion_plusplus_tpu.inference.sampler import (
        build_feature_cache,
        ddpm_sample,
        extract_features,
        make_frozen_encoder,
    )

    # --- frozen encoder (non-trivial BN stats) + damped denoiser, both converted
    tpn2, sd, tree, (npoint, sa_np, sa_ns) = _pn2_setup(seed=5)
    codebook = sd["vector_quantization.embedding.weight"]
    torch.manual_seed(11)
    C, layers, heads, num_dim, L = 64, 2, 4, 64, npoint
    B, P, N = 2, 4, 128
    tden = TDenoiserTransformer(C, layers, heads, num_dim, max_parts=P, num_ada=1000).eval()
    with torch.no_grad():
        for p in tden.parameters():
            p.mul_(0.05)
    dn_params = convert_denoiser(tden.state_dict())["params"]

    # --- a fixed scene: clouds, scales, ref parts, one invalid slot
    rng = np.random.default_rng(13)
    part_pcs = (rng.normal(size=(B, P, N, 3)) * 0.3).astype(np.float32)
    valids = np.ones((B, P), np.float32)
    valids[1, 3] = 0.0
    scale = rng.uniform(0.2, 1.0, size=(B, P, 1)).astype(np.float32)
    ref = np.zeros((B, P), bool)
    ref[0, 2] = True
    ref[1, 0] = True
    gt_trans = (rng.normal(size=(B, P, 3)) * 0.4).astype(np.float32)
    gt_quat = rng.normal(size=(B, P, 4)).astype(np.float32)
    gt_quat /= np.linalg.norm(gt_quat, axis=-1, keepdims=True)
    gt = np.concatenate([gt_trans, gt_quat], axis=-1)

    # --- identical noise on both sides
    init = rng.normal(size=(B, P, 7)).astype(np.float32)
    ts = leading_timesteps(1000, 20)
    noises = rng.normal(size=(len(ts), B, P, 7)).astype(np.float32)
    betas = piecewise_betas(1000)

    # --- torch trajectory (reference validation-loop semantics)
    refvals = np.where(ref[..., None], gt, 0.0).astype(np.float32)
    noisy_t = torch.from_numpy(np.where(ref[..., None], refvals, init))
    tv = torch.from_numpy(valids)
    tpcs = torch.from_numpy(part_pcs)
    traj_t = []
    with torch.no_grad():
        for i, t in enumerate(ts):
            latent, xyz = _torch_extract_features(
                tpn2, codebook, tpcs, tv, noisy_t, (npoint, sa_np, sa_ns)
            )
            pred = tden(
                noisy_t, torch.full((B,), int(t), dtype=torch.long), latent, xyz,
                tv, torch.from_numpy(scale), torch.from_numpy(ref),
            )
            stepped = _diffusers_step_numpy(
                betas, 1000, 20, pred.numpy().astype(np.float64), int(t),
                noisy_t.numpy().astype(np.float64), noises[i].astype(np.float64),
            )
            noisy_t = torch.from_numpy(
                np.where(ref[..., None], refvals, stepped.astype(np.float32))
            )
            traj_t.append(noisy_t.numpy().copy())
    traj_t = np.stack(traj_t)

    # --- jax trajectory: production cached sampler from converted weights
    ae = VQVAE(n_embeddings=32, embedding_dim=16, num_point=npoint, num_dim=64,
               local_decode_pts=40, sa_npoints=sa_np, sa_nsamples=sa_ns, remat=False)
    enc = make_frozen_encoder(
        ae, jax.tree.map(jnp.asarray, tree["params"]),
        jax.tree.map(jnp.asarray, tree["batch_stats"]),
    )
    dmodel = DenoiserTransformer(embed_dim=C, num_layers=layers, num_heads=heads,
                                 num_dim=num_dim, num_point=npoint, max_parts=P,
                                 num_ada_embeds=1000, dropout=0.0, pe_dropout=0.0)
    jpcs, jval = jnp.asarray(part_pcs), jnp.asarray(valids)
    jscale, jref = jnp.asarray(scale), jnp.asarray(ref)
    jparams = jax.tree.map(jnp.asarray, dn_params)
    cache = build_feature_cache(enc, jpcs, jval)

    def denoise_fn(noisy, t):
        latent, xyz = extract_features(enc, jpcs, jval, noisy, cache)
        return dmodel.apply({"params": jparams}, noisy, t, latent, xyz,
                            jval, jscale, jref, train=False)

    ddpm = DDPMParams.piecewise(1000)
    final, traj_j = jax.jit(
        lambda init_, noises_: ddpm_sample(
            denoise_fn, ddpm, jnp.asarray(ts), init_, jref, jnp.asarray(refvals),
            jax.random.key(0), 20, noise_seq=noises_,
        )
    )(jnp.asarray(init), jnp.asarray(noises))
    traj_j = np.asarray(traj_j)

    # early steps essentially exact; allow small growth from 20 steps of float-association
    # drift between torch-CPU and XLA-CPU under the contractive map
    np.testing.assert_allclose(traj_j[0], traj_t[0], atol=5e-4)
    np.testing.assert_allclose(traj_j, traj_t, atol=3e-3)
    np.testing.assert_allclose(np.asarray(final), traj_t[-1], atol=3e-3)


def test_teacher_forced_full_magnitude_step_parity():
    """VERDICT r3 #5: close the damped-weights caveat of the full-trajectory test.

    Teacher-forced composed parity at REALISTIC weight magnitude: both sides start every
    one of the 20 inference timesteps from the SAME state (a fresh random pose drawn per
    step), so each comparison covers one full composed step — frozen-encoder re-encode of
    the rotated clouds + denoiser forward + diffusers scheduler step + ref-part pinning
    (reference loop denoiser.py:153-209) — with no recurrence to amplify torch-CPU vs
    XLA-CPU float-association drift. Weights are the raw torch init (NO 0.05x damping)."""
    from puzzlefusion_plusplus_tpu.inference.sampler import (
        build_feature_cache,
        extract_features,
        make_frozen_encoder,
    )

    tpn2, sd, tree, (npoint, sa_np, sa_ns) = _pn2_setup(seed=5)
    codebook = sd["vector_quantization.embedding.weight"]
    torch.manual_seed(11)
    C, layers, heads, num_dim = 64, 2, 4, 64
    B, P, N = 2, 4, 128
    tden = TDenoiserTransformer(C, layers, heads, num_dim, max_parts=P, num_ada=1000).eval()
    dn_params = convert_denoiser(tden.state_dict())["params"]

    rng = np.random.default_rng(13)
    part_pcs = (rng.normal(size=(B, P, N, 3)) * 0.3).astype(np.float32)
    valids = np.ones((B, P), np.float32)
    valids[1, 3] = 0.0
    scale = rng.uniform(0.2, 1.0, size=(B, P, 1)).astype(np.float32)
    ref = np.zeros((B, P), bool)
    ref[0, 2] = True
    ref[1, 0] = True
    gt_trans = (rng.normal(size=(B, P, 3)) * 0.4).astype(np.float32)
    gt_quat = rng.normal(size=(B, P, 4)).astype(np.float32)
    gt_quat /= np.linalg.norm(gt_quat, axis=-1, keepdims=True)
    gt = np.concatenate([gt_trans, gt_quat], axis=-1)
    refvals = np.where(ref[..., None], gt, 0.0).astype(np.float32)

    ts = leading_timesteps(1000, 20)
    betas = piecewise_betas(1000)
    # per-step TEACHER states: random poses with ref parts pinned, shared by both sides
    states = rng.normal(size=(len(ts), B, P, 7)).astype(np.float32)
    states = np.where(ref[None, ..., None], refvals[None], states)
    noises = rng.normal(size=(len(ts), B, P, 7)).astype(np.float32)

    # --- jax side: production cached sampler pieces, ONE jitted composed step
    ae = VQVAE(n_embeddings=32, embedding_dim=16, num_point=npoint, num_dim=64,
               local_decode_pts=40, sa_npoints=sa_np, sa_nsamples=sa_ns, remat=False)
    enc = make_frozen_encoder(
        ae, jax.tree.map(jnp.asarray, tree["params"]),
        jax.tree.map(jnp.asarray, tree["batch_stats"]),
    )
    dmodel = DenoiserTransformer(embed_dim=C, num_layers=layers, num_heads=heads,
                                 num_dim=num_dim, num_point=npoint, max_parts=P,
                                 num_ada_embeds=1000, dropout=0.0, pe_dropout=0.0)
    jpcs, jval = jnp.asarray(part_pcs), jnp.asarray(valids)
    jscale, jref = jnp.asarray(scale), jnp.asarray(ref)
    jparams = jax.tree.map(jnp.asarray, dn_params)
    cache = build_feature_cache(enc, jpcs, jval)
    ddpm = DDPMParams.piecewise(1000)

    @jax.jit
    def jax_step(state, t, noise):
        latent, xyz = extract_features(enc, jpcs, jval, state, cache)
        pred = dmodel.apply({"params": jparams}, state, t, latent, xyz,
                            jval, jscale, jref, train=False)
        out = step(ddpm, pred, t[0], state, noise, 20)
        return jnp.where(jref[..., None], jnp.asarray(refvals), out)

    tv = torch.from_numpy(valids)
    tpcs = torch.from_numpy(part_pcs)
    with torch.no_grad():
        for i, t in enumerate(ts):
            state_t = torch.from_numpy(states[i])
            latent, xyz = _torch_extract_features(
                tpn2, codebook, tpcs, tv, state_t, (npoint, sa_np, sa_ns)
            )
            pred = tden(
                state_t, torch.full((B,), int(t), dtype=torch.long), latent, xyz,
                tv, torch.from_numpy(scale), torch.from_numpy(ref),
            )
            stepped = _diffusers_step_numpy(
                betas, 1000, 20, pred.numpy().astype(np.float64), int(t),
                states[i].astype(np.float64), noises[i].astype(np.float64),
            )
            out_t = np.where(ref[..., None], refvals, stepped.astype(np.float32))

            out_j = np.asarray(jax_step(
                jnp.asarray(states[i]),
                jnp.full((B,), int(t), jnp.int32),
                jnp.asarray(noises[i]),
            ))
            np.testing.assert_allclose(
                out_j, out_t, atol=1e-4,
                err_msg=f"teacher-forced step {i} (t={int(t)}) diverged at full magnitude",
            )
