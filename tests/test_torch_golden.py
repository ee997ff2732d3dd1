"""Golden-value parity vs the PyTorch reference (SURVEY §4 implication (b)).

These tests run the reference's *pure-torch* modules on CPU, convert their
randomly-initialized weights through :mod:`geneface_tpu.utils.torch_import`,
and assert our forward matches torch to float tolerance. This validates both
the checkpoint-import mapping (layout transposes, key naming) and the model
re-implementations themselves.

Skipped when the reference checkout or torch is unavailable (the CUDA-bound
modules — grid encoder, raymarching — are covered by formula-oracle unit
tests instead; the reference RADNeRF class itself cannot be instantiated
without CUDA).
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference checkout unavailable"
)
torch = pytest.importorskip("torch")

if os.path.isdir(REF) and REF not in sys.path:
    sys.path.insert(0, REF)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from geneface_tpu.utils import torch_import as ti  # noqa: E402


def _sd(mod, prefix):
    return {f"{prefix}.{k}": v.detach().numpy() for k, v in mod.state_dict().items()}


# ---------------------------------------------------------------- RADNeRF ----
@pytest.fixture(scope="module")
def radnerf_pair():
    """Our RADNeRF (reference grid geometry) + a torch state_dict assembled
    from the reference's pure-torch submodules (cond_encoder.py)."""
    from modules.radnerfs.cond_encoder import MLP as TorchMLP
    from modules.radnerfs.cond_encoder import AudioAttNet, AudioNet

    from geneface_tpu.config import Config
    from geneface_tpu.tasks.radnerf import model_from_cfg

    torch.manual_seed(0)
    cfg = Config(
        cond_type="idexp_lm3d_normalized", cond_out_dim=64, cond_win_size=1,
        smo_win_size=5, with_att=True, bound=1, grid_type="tiledgrid",
        log2_hashmap_size=16, desired_resolution=256, grid_size=32,
        grid_num_levels=16, grid_level_dim=2,
        num_layers_ambient=3, hidden_dim_ambient=128, num_layers_sigma=3,
        hidden_dim_sigma=128, geo_feat_dim=128, num_layers_color=2,
        hidden_dim_color=128, individual_embedding_num=10,
        individual_embedding_dim=4, grid_backend="reference",
    )
    model = model_from_cfg(cfg)
    params = model.init(
        jax.random.PRNGKey(0), jnp.ones((5, 1, 204)), jnp.zeros((8, 3)),
        jnp.zeros((8, 3)), method=model.init_all,
    )
    p = params["params"]

    t_prenet = AudioNet(204, 64, win_size=1)
    t_att = AudioAttNet(64, seq_len=5)
    t_ambient = TorchMLP(p["ambient_net"]["Dense_0"]["kernel"].shape[0], 2, 128, 3)
    t_sigma = TorchMLP(p["sigma_net"]["Dense_0"]["kernel"].shape[0], 129, 128, 3)
    t_color = TorchMLP(p["color_net"]["Dense_0"]["kernel"].shape[0], 3, 128, 2)

    sd = {}
    sd.update(_sd(t_prenet, "cond_prenet"))
    sd.update(_sd(t_att, "cond_att_net"))
    sd.update(_sd(t_ambient, "ambient_net"))
    sd.update(_sd(t_sigma, "sigma_net"))
    sd.update(_sd(t_color, "color_net"))
    rng = np.random.RandomState(1)
    sd["position_embedder.embeddings"] = rng.uniform(
        -1e-2, 1e-2, p["pos_embeddings"].shape
    ).astype(np.float32)
    sd["ambient_embedder.embeddings"] = rng.uniform(
        -1e-2, 1e-2, p["ambient_embeddings"].shape
    ).astype(np.float32)
    sd["individual_embeddings"] = rng.randn(10, 4).astype(np.float32) * 0.1

    imported = ti.radnerf_params_from_torch(sd, params)
    torch_mods = dict(
        prenet=t_prenet, att=t_att, ambient=t_ambient, sigma=t_sigma,
        color=t_color,
    )
    return model, imported, sd, torch_mods


def test_radnerf_cond_path_golden(radnerf_pair):
    """cal_cond_feat (AudioNet → AudioAttNet) matches torch bit-for-float."""
    model, params, _, tm = radnerf_pair
    x = np.random.RandomState(2).randn(5, 1, 204).astype(np.float32)
    with torch.no_grad():
        feat = tm["prenet"](torch.from_numpy(x))
        ref = tm["att"](feat).numpy()
    ours = np.asarray(
        model.apply(params, jnp.asarray(x), method=model.cal_cond_feat)
    )[0]
    np.testing.assert_allclose(ours, ref, atol=2e-5)


def test_radnerf_mlps_golden(radnerf_pair):
    """The imported bias-free MLP stacks match torch on random inputs."""
    from geneface_tpu.models.radnerf.cond_encoder import MLP as OurMLP

    _, params, _, tm = radnerf_pair
    rs = np.random.RandomState(3)
    for name, tmod, dims in (
        ("ambient_net", tm["ambient"], (2, 128, 3)),
        ("sigma_net", tm["sigma"], (129, 128, 3)),
        ("color_net", tm["color"], (3, 128, 2)),
    ):
        sub = params["params"][name]
        din = sub["Dense_0"]["kernel"].shape[0]
        x = rs.randn(7, din).astype(np.float32)
        with torch.no_grad():
            ref = tmod(torch.from_numpy(x)).numpy()
        ours = OurMLP(
            dim_out=dims[0], dim_hidden=dims[1], num_layers=dims[2],
            dtype=jnp.float32,
        ).apply({"params": sub}, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-5)


def test_radnerf_embeddings_imported_verbatim(radnerf_pair):
    _, params, sd, _ = radnerf_pair
    np.testing.assert_array_equal(
        np.asarray(params["params"]["pos_embeddings"]),
        sd["position_embedder.embeddings"],
    )
    np.testing.assert_array_equal(
        np.asarray(params["params"]["individual_embeddings"]),
        sd["individual_embeddings"],
    )


def test_radnerf_import_shape_mismatch_hint():
    """Wrong grid geometry raises with the config keys to fix."""
    from geneface_tpu.config import Config
    from geneface_tpu.tasks.radnerf import model_from_cfg

    cfg = Config(
        cond_type="idexp_lm3d_normalized", cond_out_dim=64, cond_win_size=1,
        smo_win_size=5, with_att=False, bound=1, grid_type="tiledgrid",
        log2_hashmap_size=16, desired_resolution=256, grid_num_levels=8,
        grid_level_dim=4, num_layers_ambient=2, hidden_dim_ambient=32,
        num_layers_sigma=2, hidden_dim_sigma=32, geo_feat_dim=32,
        num_layers_color=2, hidden_dim_color=32, individual_embedding_num=4,
        individual_embedding_dim=4, grid_backend="reference",
    )
    model = model_from_cfg(cfg)
    params = model.init(
        jax.random.PRNGKey(0), jnp.ones((1, 1, 204)), jnp.zeros((8, 3)),
        jnp.zeros((8, 3)), method=model.init_all,
    )
    sd = {"position_embedder.embeddings": np.zeros((999, 2), np.float32)}
    with pytest.raises(ValueError, match="grid_num_levels"):
        ti.radnerf_params_from_torch(sd, params)


def test_radnerf_import_block_backend_field_parity():
    """Imported reference checkpoints run through the BLOCK fast path: the
    block backend consumes the same canonical ``[n_entries, C]`` embedding
    layout the import produces, and on uncapped (all-dense) grid geometry its
    addressing is exact — the full field (grids + MLPs) must match the
    ``reference`` backend to float tolerance. Capped levels alias at block
    granularity instead of per-cell hashing (different collision sets), so
    migrated checkpoints with capped levels should briefly finetune — see
    docs/migrate_from_geneface.md.
    """
    from geneface_tpu.config import Config
    from geneface_tpu.tasks.radnerf import model_from_cfg

    base = dict(
        cond_type="idexp_lm3d_normalized", cond_out_dim=64, cond_win_size=1,
        smo_win_size=5, with_att=True, bound=1, grid_type="tiledgrid",
        log2_hashmap_size=16, desired_resolution=32, grid_size=32,
        grid_num_levels=16, grid_level_dim=2,
        num_layers_ambient=3, hidden_dim_ambient=128, num_layers_sigma=3,
        hidden_dim_sigma=128, geo_feat_dim=128, num_layers_color=2,
        hidden_dim_color=128, individual_embedding_num=10,
        individual_embedding_dim=4,
    )
    ref_model = model_from_cfg(Config(grid_backend="reference", **base))
    blk_model = model_from_cfg(Config(grid_backend="block", **base))
    params = ref_model.init(
        jax.random.PRNGKey(0), jnp.ones((5, 1, 204)), jnp.zeros((8, 3)),
        jnp.zeros((8, 3)), method=ref_model.init_all,
    )
    # all levels must be dense for exactness
    bm = blk_model.bind(params)
    assert all(m == "dense" for m in bm.pos_block_meta.modes)

    from modules.radnerfs.cond_encoder import MLP as TorchMLP
    from modules.radnerfs.cond_encoder import AudioAttNet, AudioNet

    torch.manual_seed(7)
    p = params["params"]
    sd = {}
    sd.update(_sd(AudioNet(204, 64, win_size=1), "cond_prenet"))
    sd.update(_sd(AudioAttNet(64, seq_len=5), "cond_att_net"))
    for name, mod in (
        ("ambient_net", TorchMLP(p["ambient_net"]["Dense_0"]["kernel"].shape[0], 2, 128, 3)),
        ("sigma_net", TorchMLP(p["sigma_net"]["Dense_0"]["kernel"].shape[0], 129, 128, 3)),
        ("color_net", TorchMLP(p["color_net"]["Dense_0"]["kernel"].shape[0], 3, 128, 2)),
    ):
        sd.update(_sd(mod, name))
    rng = np.random.RandomState(11)
    sd["position_embedder.embeddings"] = rng.uniform(
        -1e-2, 1e-2, p["pos_embeddings"].shape
    ).astype(np.float32)
    sd["ambient_embedder.embeddings"] = rng.uniform(
        -1e-2, 1e-2, p["ambient_embeddings"].shape
    ).astype(np.float32)
    sd["individual_embeddings"] = rng.randn(10, 4).astype(np.float32) * 0.1
    imported = ti.radnerf_params_from_torch(sd, params)

    rs = np.random.RandomState(5)
    xyz = jnp.asarray(rs.uniform(-0.9, 0.9, (64, 3)).astype(np.float32))
    dirs = rs.randn(64, 3).astype(np.float32)
    dirs = jnp.asarray(dirs / np.linalg.norm(dirs, axis=-1, keepdims=True))
    cond = jnp.asarray(rs.randn(1, 64).astype(np.float32) * 0.1)
    ind = jnp.asarray(np.asarray(sd["individual_embeddings"][0]))

    s_ref, c_ref, a_ref = ref_model.apply(imported, xyz, dirs, cond, ind)
    s_blk, c_blk, a_blk = blk_model.apply(imported, xyz, dirs, cond, ind)
    np.testing.assert_allclose(np.asarray(s_blk), np.asarray(s_ref), rtol=2e-2, atol=2e-3)
    np.testing.assert_allclose(np.asarray(c_blk), np.asarray(c_ref), atol=2e-2)
    np.testing.assert_allclose(np.asarray(a_blk), np.asarray(a_ref), atol=2e-3)


def test_radnerf_import_rejects_fused_backend():
    """Torch imports target the canonical grid layout; the fused backend's
    grouped tables must be rejected with a pointer to the right config."""
    from geneface_tpu.config import Config
    from geneface_tpu.tasks.radnerf import model_from_cfg

    cfg = Config(
        cond_type="idexp_lm3d_normalized", cond_out_dim=64, cond_win_size=1,
        smo_win_size=5, with_att=False, bound=1, grid_type="tiledgrid",
        log2_hashmap_size=16, desired_resolution=256, grid_num_levels=8,
        grid_level_dim=4, num_layers_ambient=2, hidden_dim_ambient=32,
        num_layers_sigma=2, hidden_dim_sigma=32, geo_feat_dim=32,
        num_layers_color=2, hidden_dim_color=32, individual_embedding_num=4,
        individual_embedding_dim=4,
    )
    model = model_from_cfg(cfg)  # default backend = fused
    params = model.init(
        jax.random.PRNGKey(0), jnp.ones((1, 1, 204)), jnp.zeros((8, 3)),
        jnp.zeros((8, 3)), method=model.init_all,
    )
    sd = {"position_embedder.embeddings": np.zeros((999, 2), np.float32)}
    with pytest.raises(ValueError, match="grid_backend"):
        ti.radnerf_params_from_torch(sd, params)


# ----------------------------------------------------------- NeRF backbone ----
def test_nerf_backbone_golden():
    from modules.nerfs.adnerf.backbone import NeRFBackbone as TorchBackbone

    from geneface_tpu.models.nerf.backbone import NeRFBackbone

    torch.manual_seed(1)
    tb = TorchBackbone(pos_dim=63, cond_dim=64, view_dim=27, hid_dim=128)
    ours = NeRFBackbone(hid_dim=128)
    pos = np.random.RandomState(4).randn(3, 5, 63).astype(np.float32)
    cond = np.random.RandomState(5).randn(64).astype(np.float32)
    view = np.random.RandomState(6).randn(3, 27).astype(np.float32)
    params = ours.init(
        jax.random.PRNGKey(0), jnp.asarray(pos), jnp.asarray(cond),
        jnp.asarray(view),
    )
    sd = {k: v.detach().numpy() for k, v in tb.state_dict().items()}
    imported = ti.nerf_backbone_params_from_torch(sd, params)
    with torch.no_grad():
        ref = tb(
            torch.from_numpy(pos), torch.from_numpy(cond), torch.from_numpy(view)
        ).numpy()
    got = np.asarray(
        ours.apply(imported, jnp.asarray(pos), jnp.asarray(cond), jnp.asarray(view))
    )
    np.testing.assert_allclose(got, ref, atol=2e-5)


# -------------------------------------------------------- volume rendering ----
def test_raw2outputs_golden():
    from modules.nerfs.commons.volume_rendering import raw2outputs as t_raw2outputs

    from geneface_tpu.ops.volume import raw2outputs

    rs = np.random.RandomState(7)
    N, S = 6, 16
    raw = rs.randn(N, S, 4).astype(np.float32)
    z = np.sort(rs.uniform(0.3, 0.9, (N, S)).astype(np.float32), axis=-1)
    rd = rs.randn(N, 3).astype(np.float32)
    bc = rs.uniform(0, 1, (N, 3)).astype(np.float32)
    with torch.no_grad():
        t_rgb, t_disp, t_acc, t_w, t_depth, t_fg = t_raw2outputs(
            torch.from_numpy(raw), torch.from_numpy(z), torch.from_numpy(rd),
            torch.from_numpy(bc),
        )
    out = raw2outputs(
        jnp.asarray(raw), jnp.asarray(z), jnp.asarray(rd), jnp.asarray(bc)
    )
    np.testing.assert_allclose(np.asarray(out["rgb_map"]), t_rgb.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out["weights"]), t_w.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out["depth_map"]), t_depth.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out["acc_map"]), t_acc.numpy(), atol=1e-5)


def test_sample_pdf_golden():
    from modules.nerfs.commons.volume_rendering import sample_pdf as t_sample_pdf

    from geneface_tpu.ops.volume import sample_pdf

    rs = np.random.RandomState(8)
    N, S = 4, 32
    bins = np.sort(rs.uniform(0.3, 0.9, (N, S)).astype(np.float32), axis=-1)
    weights = rs.uniform(0, 1, (N, S - 1)).astype(np.float32)
    with torch.no_grad():
        ref = t_sample_pdf(
            torch.from_numpy(bins), torch.from_numpy(weights), 24, det=True
        ).numpy()
    got = np.asarray(
        sample_pdf(jnp.asarray(bins), jnp.asarray(weights), 24, det=True)
    )
    np.testing.assert_allclose(got, ref, atol=1e-5)


# ----------------------------------------------------------------- postnet ----
def test_postnet_golden():
    from modules.postnet.models import CNNPostNet as TorchPostNet

    from geneface_tpu.models.postnet.models import CNNPostNet

    torch.manual_seed(2)
    tp = TorchPostNet(in_out_dim=204).eval()
    # give the BN running stats non-trivial values
    with torch.no_grad():
        for m in tp.modules():
            if isinstance(m, torch.nn.BatchNorm1d):
                m.running_mean.uniform_(-0.5, 0.5)
                m.running_var.uniform_(0.5, 2.0)

    ours = CNNPostNet(in_out_dim=204, norm="bn")
    x = np.random.RandomState(9).randn(2, 9, 204).astype(np.float32)
    x[1, 6:] = 0.0  # padded frames exercise the mask path
    variables = ours.init(jax.random.PRNGKey(0), jnp.asarray(x))
    sd = {k: v.detach().numpy() for k, v in tp.state_dict().items()}
    imported = ti.postnet_params_from_torch(sd, variables)
    with torch.no_grad():
        ref = tp(torch.from_numpy(x)).numpy()
    got = np.asarray(ours.apply(imported, jnp.asarray(x)))
    np.testing.assert_allclose(got, ref, atol=3e-5)


# ----------------------------------------------------------------- syncnet ----
def test_syncnet_golden():
    from modules.syncnet.models import LandmarkHubertSyncNet as TorchSyncNet

    from geneface_tpu.models.syncnet.models import LandmarkHubertSyncNet

    torch.manual_seed(3)
    ts = TorchSyncNet(lm_dim=60).eval()
    with torch.no_grad():
        for m in ts.modules():
            if isinstance(m, torch.nn.BatchNorm1d):
                m.running_mean.uniform_(-0.2, 0.2)
                m.running_var.uniform_(0.5, 2.0)

    ours = LandmarkHubertSyncNet(lm_dim=60, norm="bn")
    rs = np.random.RandomState(10)
    hubert = rs.randn(2, 10, 1024).astype(np.float32)
    mouth = rs.randn(2, 5, 60).astype(np.float32)
    variables = ours.init(
        jax.random.PRNGKey(0), jnp.asarray(hubert), jnp.asarray(mouth)
    )
    sd = {k: v.detach().numpy() for k, v in ts.state_dict().items()}
    imported = ti.syncnet_params_from_torch(sd, variables)
    with torch.no_grad():
        ref_a, ref_m = ts(torch.from_numpy(hubert), torch.from_numpy(mouth))
    got_a, got_m = ours.apply(
        imported, jnp.asarray(hubert), jnp.asarray(mouth)
    )
    np.testing.assert_allclose(np.asarray(got_a), ref_a.numpy(), atol=3e-5)
    np.testing.assert_allclose(np.asarray(got_m), ref_m.numpy(), atol=3e-5)


# ------------------------------------------------------------------- VAE ----
def test_vae_model_golden():
    """VAEModel: posterior stats (train) and temperature-0 generation (infer,
    deterministic through the inverted prior flow) match torch."""
    from modules.audio2motion.vae import VAEModel as TorchVAEModel

    from geneface_tpu.models.audio2motion.vae import VAEModel

    torch.manual_seed(4)
    tv = TorchVAEModel(in_out_dim=64, use_prior_flow=True).eval()
    with torch.no_grad():
        for m in tv.modules():
            if isinstance(m, torch.nn.BatchNorm1d):
                m.running_mean.uniform_(-0.2, 0.2)
                m.running_var.uniform_(0.5, 2.0)

    rs = np.random.RandomState(11)
    T = 32
    hubert = rs.randn(1, 2 * T, 1024).astype(np.float32)
    y = rs.randn(1, T, 64).astype(np.float32)
    mask = np.ones((1, T), np.float32)
    batch = {"hubert": jnp.asarray(hubert), "y": jnp.asarray(y),
             "y_mask": jnp.asarray(mask)}

    ours = VAEModel(in_out_dim=64, use_prior_flow=True, norm="bn")
    variables = ours.init(jax.random.PRNGKey(0), batch, jax.random.PRNGKey(1))
    sd = {k: v.detach().numpy() for k, v in tv.state_dict().items()}
    imported = ti.vae_model_params_from_torch(sd, variables)

    tb = {"hubert": torch.from_numpy(hubert), "y": torch.from_numpy(y),
          "y_mask": torch.from_numpy(mask)}
    with torch.no_grad():
        _, _, m_q, logs_q = tv(tb, {}, train=True, return_latent=True)
    out = ours.apply(imported, batch, jax.random.PRNGKey(2), train=True)
    # torch forward returns m_q already transposed to [B, T_sqz, C]
    np.testing.assert_allclose(np.asarray(out["m_q"]), m_q.numpy(), atol=5e-5)

    with torch.no_grad():
        ref_recon = tv(tb, {}, train=False, temperature=0.0).numpy()
    got = ours.apply(
        imported, batch, jax.random.PRNGKey(3), train=False, temperature=0.0
    )
    np.testing.assert_allclose(
        np.asarray(got["pred"]), ref_recon, atol=1e-4, rtol=1e-4
    )
