"""Torch-checkpoint converter tests: structural match with flax init trees + numerical parity
of the verifier encoder layer against torch.nn.TransformerEncoderLayer (the reference's exact
layer class, verifier_transformer.py:17-30)."""

import numpy as np

from tests.helpers import jit_apply, jit_init
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

from puzzlefusion_plusplus_tpu.convert.torch_ckpt import (
    convert_denoiser,
    convert_verifier,
    convert_vqvae,
)
from puzzlefusion_plusplus_tpu.models.denoiser import DenoiserTransformer
from puzzlefusion_plusplus_tpu.models.verifier import TorchEncoderLayer, VerifierTransformer
from puzzlefusion_plusplus_tpu.models.vqvae import VQVAE


def tree_shapes(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        key = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.update(tree_shapes(v, key))
        else:
            out[key] = tuple(np.shape(v))
    return out


def torch_sd_from_modules(**modules):
    sd = {}
    for name, mod in modules.items():
        for k, v in mod.state_dict().items():
            sd[f"{name}.{k}"] = v
    return sd


def test_verifier_layer_numerical_parity():
    """flax TorchEncoderLayer(params from converter) == torch TransformerEncoderLayer."""
    torch.manual_seed(0)
    C, H = 32, 4
    t_layer = torch.nn.TransformerEncoderLayer(
        d_model=C, nhead=H, dim_feedforward=64, dropout=0.0, activation="gelu",
        batch_first=True,
    ).eval()
    sd = {f"transformer_encoder.layers.0.{k}": v for k, v in t_layer.state_dict().items()}
    params = convert_verifier(
        {**sd,
         "edge_feature_emb.weight": torch.zeros(C, 7), "edge_feature_emb.bias": torch.zeros(C),
         "mlp_out.weight": torch.zeros(1, C), "mlp_out.bias": torch.zeros(1)}
    )["params"]

    x = np.random.default_rng(0).normal(size=(2, 5, C)).astype(np.float32)
    with torch.no_grad():
        ref = t_layer(torch.from_numpy(x)).numpy()

    layer = TorchEncoderLayer(dim=C, num_heads=H, ff_dim=64, dropout=0.0)
    out = layer.apply({"params": params["layer0"]}, jnp.asarray(x), None, train=False)
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5)


def test_verifier_layer_parity_with_padding_mask():
    torch.manual_seed(1)
    C, H, T = 32, 4, 6
    t_layer = torch.nn.TransformerEncoderLayer(
        d_model=C, nhead=H, dim_feedforward=64, dropout=0.0, activation="gelu",
        batch_first=True,
    ).eval()
    sd = {f"transformer_encoder.layers.0.{k}": v for k, v in t_layer.state_dict().items()}
    params = convert_verifier(
        {**sd,
         "edge_feature_emb.weight": torch.zeros(C, 7), "edge_feature_emb.bias": torch.zeros(C),
         "mlp_out.weight": torch.zeros(1, C), "mlp_out.bias": torch.zeros(1)}
    )["params"]
    x = np.random.default_rng(1).normal(size=(1, T, C)).astype(np.float32)
    valid = np.array([[1, 1, 1, 0, 0, 0]], np.float32)
    with torch.no_grad():
        ref = t_layer(
            torch.from_numpy(x),
            src_key_padding_mask=torch.from_numpy(valid == 0),
        ).numpy()
    layer = TorchEncoderLayer(dim=C, num_heads=H, ff_dim=64, dropout=0.0)
    bias = jnp.where(jnp.asarray(valid) > 0, 0.0, -1e9)[:, None, None, :]
    out = np.asarray(layer.apply({"params": params["layer0"]}, jnp.asarray(x), bias,
                                 train=False))
    np.testing.assert_allclose(out[:, :3], ref[:, :3], atol=2e-5)  # valid positions only


def _fake_sd_vqvae():
    """Torch-shaped random state_dict for the reference VQVAE layout."""
    sd = {}
    chans = {
        "sa1": (3, [64, 64, 128]),
        "sa2": (128 + 3, [128, 128, 256]),
        "sa3": (256 + 3, [256, 256, 512]),
    }
    g = torch.Generator().manual_seed(0)
    for sa, (cin, mlp) in chans.items():
        last = cin
        for j, c in enumerate(mlp):
            sd[f"pn2.{sa}.mlp_convs.{j}.weight"] = torch.randn(c, last, 1, 1, generator=g)
            sd[f"pn2.{sa}.mlp_convs.{j}.bias"] = torch.randn(c, generator=g)
            sd[f"pn2.{sa}.mlp_bns.{j}.weight"] = torch.randn(c, generator=g)
            sd[f"pn2.{sa}.mlp_bns.{j}.bias"] = torch.randn(c, generator=g)
            sd[f"pn2.{sa}.mlp_bns.{j}.running_mean"] = torch.randn(c, generator=g)
            sd[f"pn2.{sa}.mlp_bns.{j}.running_var"] = torch.rand(c, generator=g) + 0.5
            last = c
    sd["pn2.conv6.weight"] = torch.randn(64, 512, 1, generator=g)
    sd["pn2.conv6.bias"] = torch.randn(64, generator=g)
    sd["pn2.fc1.weight"] = torch.randn(256, 64, generator=g)
    sd["pn2.fc1.bias"] = torch.randn(256, generator=g)
    sd["pn2.fc2.weight"] = torch.randn(512, 256, generator=g)
    sd["pn2.fc2.bias"] = torch.randn(512, generator=g)
    sd["pn2.fc3.weight"] = torch.randn(120, 512, generator=g)
    sd["pn2.fc3.bias"] = torch.randn(120, generator=g)
    sd["vector_quantization.embedding.weight"] = torch.randn(1024, 16, generator=g)
    return sd


def test_vqvae_converter_structure_matches_flax():
    tree = convert_vqvae(_fake_sd_vqvae())
    model = VQVAE()
    variables = jit_init(model, jax.random.key(0), jnp.zeros((1, 64, 3)), train=False)
    assert tree_shapes(tree["params"]) == tree_shapes(variables["params"])
    assert tree_shapes(tree["batch_stats"]) == tree_shapes(variables["batch_stats"])
    # converted params must actually run through the model
    out = jit_apply(
        model,
        {"params": jax.tree.map(jnp.asarray, tree["params"]),
         "batch_stats": jax.tree.map(jnp.asarray, tree["batch_stats"])},
        jnp.ones((1, 64, 3)) * 0.1, train=False,
    )
    assert np.isfinite(np.asarray(out["pc_offset"])).all()


def _fake_sd_denoiser(C=64, layers=2):
    g = torch.Generator().manual_seed(0)
    sd = {
        "ref_part_emb.weight": torch.randn(2, C, generator=g),
        "shape_embedding.weight": torch.randn(C, 64 + 63 + 21, generator=g),
        "shape_embedding.bias": torch.randn(C, generator=g),
        "param_fc.weight": torch.randn(C, 147, generator=g),
        "param_fc.bias": torch.randn(C, generator=g),
    }
    for i in range(layers):
        p = f"transformer_layers.{i}"
        for nm in ("norm1", "norm2"):
            # reference AdaLN table rows = num_embeds_ada_norm = 6*embed_dim
            sd[f"{p}.{nm}.emb.weight"] = torch.randn(6 * C, C, generator=g)
            sd[f"{p}.{nm}.linear.weight"] = torch.randn(2 * C, C, generator=g)
            sd[f"{p}.{nm}.linear.bias"] = torch.randn(2 * C, generator=g)
        for at in ("self_attn", "global_attn"):
            for qkv in ("to_q", "to_k", "to_v"):
                sd[f"{p}.{at}.{qkv}.weight"] = torch.randn(C, C, generator=g)
            sd[f"{p}.{at}.to_out.0.weight"] = torch.randn(C, C, generator=g)
            sd[f"{p}.{at}.to_out.0.bias"] = torch.randn(C, generator=g)
        sd[f"{p}.norm3.weight"] = torch.randn(C, generator=g)
        sd[f"{p}.norm3.bias"] = torch.randn(C, generator=g)
        sd[f"{p}.ff.net.0.proj.weight"] = torch.randn(8 * C, C, generator=g)
        sd[f"{p}.ff.net.0.proj.bias"] = torch.randn(8 * C, generator=g)
        sd[f"{p}.ff.net.2.weight"] = torch.randn(C, 4 * C, generator=g)
        sd[f"{p}.ff.net.2.bias"] = torch.randn(C, generator=g)
    for head in ("mlp_out_trans", "mlp_out_rot"):
        dims = [(C, C), (C // 2, C), (3 if head.endswith("trans") else 4, C // 2)]
        for j, (o, i_) in zip((0, 2, 4), dims):
            sd[f"{head}.{j}.weight"] = torch.randn(o, i_, generator=g)
            sd[f"{head}.{j}.bias"] = torch.randn(o, generator=g)
    return sd


def test_denoiser_converter_structure_matches_flax():
    C, layers = 64, 2
    tree = convert_denoiser(_fake_sd_denoiser(C, layers))
    model = DenoiserTransformer(embed_dim=C, num_layers=layers, num_heads=4,
                                num_dim=64, num_point=5, max_parts=4)
    B, P, L = 1, 4, 5
    variables = jit_init(
        model,
        jax.random.key(0),
        jnp.zeros((B, P, 7)), jnp.zeros((B,), jnp.int32),
        jnp.zeros((B, P, L, 64)), jnp.zeros((B, P, L, 3)),
        jnp.ones((B, P)), jnp.ones((B, P, 1)), jnp.zeros((B, P), bool), train=False,
    )
    assert tree_shapes(tree["params"]) == tree_shapes(variables["params"])
    out = jit_apply(
        model,
        {"params": jax.tree.map(jnp.asarray, tree["params"])},
        jnp.zeros((B, P, 7)), jnp.zeros((B,), jnp.int32),
        jnp.zeros((B, P, L, 64)), jnp.zeros((B, P, L, 3)),
        jnp.ones((B, P)), jnp.ones((B, P, 1)), jnp.zeros((B, P), bool), train=False,
    )
    assert out.shape == (B, P, 7)


def test_verifier_converter_structure_matches_flax():
    torch.manual_seed(0)
    C = 32
    t_layer = torch.nn.TransformerEncoderLayer(
        d_model=C, nhead=4, dim_feedforward=64, dropout=0.1, activation="gelu",
        batch_first=True,
    )
    sd = {}
    for i in range(2):
        for k, v in t_layer.state_dict().items():
            sd[f"transformer_encoder.layers.{i}.{k}"] = v
    sd["edge_feature_emb.weight"] = torch.randn(C, 7)
    sd["edge_feature_emb.bias"] = torch.randn(C)
    sd["mlp_out.weight"] = torch.randn(1, C)
    sd["mlp_out.bias"] = torch.randn(1)
    tree = convert_verifier(sd)
    model = VerifierTransformer(embed_dim=C, num_layers=2, num_heads=4, max_nodes=6, ff_dim=64)
    variables = jit_init(
        model, jax.random.key(0), jnp.zeros((1, 15, 7)), jnp.zeros((1, 15, 2), jnp.int32),
        jnp.ones((1, 15)), train=False,
    )
    assert tree_shapes(tree["params"]) == tree_shapes(variables["params"])


def test_full_three_model_lightning_ckpt_roundtrip(tmp_path):
    """VERDICT r3 #8: one converter round trip over a synthetically-built set of Lightning
    checkpoints exercising EVERY key-prefix rule of the reference load path (test.py:24-38
    'denoiser.'/'encoder.'/'verifier.' splits + train_denoiser.py:32 'ae.' -> '' remap):
    torch.save -> convert_file -> orbax restore -> exact leaf equality with the in-memory
    conversion, decoy keys dropped."""
    import orbax.checkpoint as ocp

    from puzzlefusion_plusplus_tpu.convert.torch_ckpt import (
        convert_denoiser_checkpoint,
        convert_file,
        convert_verifier_checkpoint,
        convert_vqvae_checkpoint,
    )

    torch.manual_seed(3)
    C = 32
    t_layer = torch.nn.TransformerEncoderLayer(
        d_model=C, nhead=4, dim_feedforward=64, dropout=0.1, activation="gelu",
        batch_first=True,
    )
    verifier_sd = {}
    for i in range(2):
        for k, v in t_layer.state_dict().items():
            verifier_sd[f"transformer_encoder.layers.{i}.{k}"] = v.clone()
    verifier_sd["edge_feature_emb.weight"] = torch.randn(C, 7)
    verifier_sd["edge_feature_emb.bias"] = torch.randn(C)
    verifier_sd["mlp_out.weight"] = torch.randn(1, C)
    verifier_sd["mlp_out.bias"] = torch.randn(1)

    decoys = {  # Lightning ckpts carry non-model keys the splits must drop
        "loss_weights.pos": torch.randn(1),
        "metrics.train_acc.total": torch.randn(1),
    }
    ckpts = {
        # FractureAE saves the AE under 'ae.' (train_denoiser.py:30-35 remap)
        "vqvae": {f"ae.{k}": v for k, v in _fake_sd_vqvae().items()},
        # AutoAgglomerative/Denoiser ckpt: 'denoiser.' + 'encoder.' (test.py:24-33)
        "denoiser": {
            **{f"denoiser.{k}": v for k, v in _fake_sd_denoiser().items()},
            **{f"encoder.{k}": v for k, v in _fake_sd_vqvae().items()},
        },
        # Verifier ckpt: 'verifier.' (test.py:35-38)
        "verifier": {f"verifier.{k}": v for k, v in verifier_sd.items()},
    }
    converters = {
        "vqvae": convert_vqvae_checkpoint,
        "denoiser": convert_denoiser_checkpoint,
        "verifier": convert_verifier_checkpoint,
    }

    ckptr = ocp.StandardCheckpointer()
    for kind, sd in ckpts.items():
        full_sd = {**sd, **decoys}
        pt_path = tmp_path / f"{kind}.ckpt"
        torch.save({"state_dict": full_sd, "epoch": 7}, pt_path)
        out_path = convert_file(str(pt_path), str(tmp_path / "orbax"), kind)
        restored = ckptr.restore(out_path)
        expected = converters[kind](full_sd)
        exp_leaves = jax.tree_util.tree_leaves_with_path(expected)
        got_leaves = jax.tree_util.tree_leaves_with_path(restored)
        assert len(exp_leaves) == len(got_leaves) > 0, kind
        for (pe, le), (pg, lg) in zip(exp_leaves, got_leaves):
            assert pe == pg, (kind, pe, pg)
            np.testing.assert_array_equal(np.asarray(le), np.asarray(lg),
                                          err_msg=f"{kind} {pe}")
        flat = "/".join(str(p) for p, _ in got_leaves)
        assert "decoy" not in flat and "loss_weights" not in flat and "metrics" not in flat

    # the denoiser split must produce BOTH sub-trees (the engine loads them separately)
    den = converters["denoiser"](ckpts["denoiser"])
    assert set(den) == {"denoiser", "encoder"}
    assert "batch_stats" in den["encoder"]
