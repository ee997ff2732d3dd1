"""tools/validate_import.py against a synthetically-authored torch ckpt.

VERDICT r4 #5: the real-checkpoint validation recipe must be executable and
tested before real released weights exist. This authors a torch checkpoint
in the reference's exact dump format (``utils/commons/trainer.py:460-473``:
``{"state_dict": {"model": <state_dict>}}`` + density-grid buffers), runs
the full convert→render→PSNR→pass/fail pipeline, and checks both verdicts:
PASS against matching goldens, FAIL against corrupted ones.
"""

import os
import sys

import numpy as np
import pytest
import yaml

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference checkout unavailable"
)
torch = pytest.importorskip("torch")
if REF not in sys.path:
    sys.path.insert(0, REF)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from tools.make_synthetic_dataset import make_dataset  # noqa: E402


CFG = dict(
    cond_type="idexp_lm3d_normalized", cond_out_dim=64, cond_win_size=1,
    smo_win_size=5, with_att=True, bound=1, grid_type="tiledgrid",
    log2_hashmap_size=16, desired_resolution=256, grid_size=32,
    grid_num_levels=16, grid_level_dim=2,
    num_layers_ambient=3, hidden_dim_ambient=64, num_layers_sigma=3,
    hidden_dim_sigma=64, geo_feat_dim=64, num_layers_color=2,
    hidden_dim_color=64, individual_embedding_num=10,
    individual_embedding_dim=4, max_steps=8, density_thresh=10,
    dt_gamma=1.0 / 256, min_near=0.05,
)


@pytest.fixture(scope="module")
def authored(tmp_path_factory):
    """Synthetic dataset + a reference-format torch checkpoint dir."""
    from modules.radnerfs.cond_encoder import MLP as TorchMLP
    from modules.radnerfs.cond_encoder import AudioAttNet, AudioNet

    from geneface_tpu.config import Config
    from geneface_tpu.tasks.radnerf import model_from_cfg

    root = tmp_path_factory.mktemp("vimport")
    data_dir = str(root / "data")
    make_dataset(data_dir, n_frames=6, hw=64)

    cfg = Config(dict(CFG, grid_backend="block", data_dir=data_dir))
    model = model_from_cfg(cfg)
    params = model.init(
        jax.random.PRNGKey(0), jnp.ones((5, 1, 204)), jnp.zeros((8, 3)),
        jnp.zeros((8, 3)), method=model.init_all,
    )
    p = params["params"]

    torch.manual_seed(0)
    t_prenet = AudioNet(204, 64, win_size=1)
    t_att = AudioAttNet(64, seq_len=5)
    t_ambient = TorchMLP(p["ambient_net"]["Dense_0"]["kernel"].shape[0], 2, 64, 3)
    t_sigma = TorchMLP(p["sigma_net"]["Dense_0"]["kernel"].shape[0], 65, 64, 3)
    t_color = TorchMLP(p["color_net"]["Dense_0"]["kernel"].shape[0], 3, 64, 2)

    def _sd(mod, prefix):
        return {f"{prefix}.{k}": v.detach() for k, v in mod.state_dict().items()}

    sd = {}
    for mod, name in ((t_prenet, "cond_prenet"), (t_att, "cond_att_net"),
                      (t_ambient, "ambient_net"), (t_sigma, "sigma_net"),
                      (t_color, "color_net")):
        sd.update(_sd(mod, name))
    rng = np.random.RandomState(1)
    sd["position_embedder.embeddings"] = torch.from_numpy(
        rng.uniform(-1e-2, 1e-2, p["pos_embeddings"].shape).astype(np.float32)
    )
    sd["ambient_embedder.embeddings"] = torch.from_numpy(
        rng.uniform(-1e-2, 1e-2, p["ambient_embeddings"].shape).astype(np.float32)
    )
    sd["individual_embeddings"] = torch.from_numpy(
        (rng.randn(10, 4) * 0.1).astype(np.float32)
    )
    # density-grid buffer: a trained-looking occupied ball
    H = CFG["grid_size"]
    r = (np.arange(H) + 0.5) / H * 2 - 1
    gx, gy, gz = np.meshgrid(r, r, r, indexing="ij")
    dg = np.where(
        np.sqrt(gx**2 + gy**2 + gz**2) < 0.5, 40.0, 0.0
    ).reshape(-1).astype(np.float32)
    sd["density_grid"] = torch.from_numpy(dg)

    ckpt_dir = str(root / "ckpt")
    os.makedirs(ckpt_dir)
    torch.save(
        {"state_dict": {"model": sd}},
        os.path.join(ckpt_dir, "model_ckpt_steps_1000.ckpt"),
    )
    with open(os.path.join(ckpt_dir, "config.yaml"), "w") as f:
        yaml.safe_dump(dict(CFG), f)
    return dict(root=str(root), data_dir=data_dir, ckpt_dir=ckpt_dir)


def test_validate_import_pass_and_fail(authored, tmp_path):
    from tools.validate_import import validate

    golden_dir = str(tmp_path / "golden")
    report1 = validate(
        authored["ckpt_dir"], authored["data_dir"], frames=2,
        out=str(tmp_path / "r1.json"), dump_frames=golden_dir,
    )
    assert report1["pass"]
    assert all(f["finite"] for f in report1["frames"])
    assert all("psnr_vs_gt" in f for f in report1["frames"])

    # identical goldens -> PASS with huge PSNR
    report2 = validate(
        authored["ckpt_dir"], authored["data_dir"], frames=2,
        golden=golden_dir, out=str(tmp_path / "r2.json"),
    )
    assert report2["pass"]
    assert report2["min_psnr_vs_golden"] > 60

    # corrupted goldens -> FAIL
    bad_dir = str(tmp_path / "bad")
    os.makedirs(bad_dir)
    for name in os.listdir(golden_dir):
        g = np.load(os.path.join(golden_dir, name))
        np.save(
            os.path.join(bad_dir, name),
            np.clip(g + 0.25 * np.random.RandomState(0).rand(*g.shape), 0, 1),
        )
    report3 = validate(
        authored["ckpt_dir"], authored["data_dir"], frames=2,
        golden=bad_dir, out=str(tmp_path / "r3.json"),
    )
    assert not report3["pass"]
    assert report3["min_psnr_vs_golden"] < 30
    assert os.path.exists(str(tmp_path / "r3.json"))
