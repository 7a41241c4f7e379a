"""Round-trip test of scripts/convert_reference_ckpt.py: build a checkpoint
with the reference's exact torch module names and tuple schema
(`/root/reference/src/trainer/rodygs_static.py:321-347`,
`rodygs_dynamic.py:298-303`, `model/rodygs_dynamic.py:243-293`), convert,
and verify (a) the store loads with correct alive/time bookkeeping and
(b) the converted deform network reproduces the torch net's motion basis.
"""

import numpy as np
import pytest

import rodygs_tpu.models.gaussians as G
import rodygs_tpu.models.motion as M

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402

import sys  # noqa: E402
from pathlib import Path  # noqa: E402

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "scripts"))
from convert_reference_ckpt import convert_checkpoint  # noqa: E402

W, B, MULTIRES = 32, 4, 5
T_EMB_DIM = 2 * MULTIRES + 1


class _TorchBasis(nn.Module):
    """Key-compatible with the reference's MLPMotionBasis (field `basis`)."""

    def __init__(self):
        super().__init__()
        self.basis = nn.Sequential(
            nn.Linear(W // 2, W // 4), nn.GELU(), nn.Linear(W // 4, 7))


class _TorchNet(nn.Module):
    """Key-compatible with the reference's MLPBasisNetwork."""

    def __init__(self):
        super().__init__()
        self.timenet = nn.Sequential(
            nn.Linear(T_EMB_DIM, W), nn.GELU(),
            nn.Linear(W, W), nn.GELU(),
            nn.Linear(W, W // 2), nn.GELU())
        self.basis_xyz = nn.ModuleList([_TorchBasis() for _ in range(B)])
        for m in self.modules():
            if isinstance(m, nn.Linear):
                nn.init.normal_(m.weight, mean=0, std=0.5)
                nn.init.normal_(m.bias, mean=0, std=0.1)

    def forward(self, t_emb):
        out = self.timenet(t_emb)
        return torch.stack([basis.basis(out) for basis in self.basis_xyz])


def _reference_style_ckpt(n=30, seed=0):
    rng = np.random.default_rng(seed)
    tt = lambda a: torch.tensor(np.asarray(a, np.float32))  # noqa: E731
    model = {
        "_xyz": tt(rng.normal(size=(n, 3))),
        "_features_dc": tt(rng.normal(size=(n, 1, 3))),
        "_features_rest": tt(rng.normal(size=(n, 3, 3))),
        "_scaling": tt(rng.normal(size=(n, 3))),
        "_rotation": tt(rng.normal(size=(n, 4))),
        "_opacity": tt(rng.normal(size=(n, 1))),
    }
    net = _TorchNet()
    times = rng.uniform(0, 1, size=n).astype(np.float32)
    times[: n // 3] = times[0]  # repeated birth times
    sd = {
        "iteration": 1234,
        "active_sh_degree": 2,
        "model": dict(
            model,
            _motion_coeff=tt(rng.normal(size=(n, 1, B))),
            _deform_network=net.state_dict(),
            _timestep=tt(times),
        ),
        "optim": {
            "max_radii2D": tt(rng.uniform(0, 30, size=n)),
            "xyz_gradient_accum": tt(rng.uniform(0, 1, size=(n, 1))),
            "denom": tt(rng.integers(0, 5, size=(n, 1))),
        },
        "spatial_lr_scale": 3.5,
        "camera": {
            "R_c2ws_quat": tt(rng.normal(size=(8, 4))),
            "T_c2ws": tt(rng.normal(size=(8, 3))),
        },
    }
    return sd, net, times


class TestConvertReferenceCkpt:
    def test_store_and_camera_roundtrip(self):
        sd, _, times = _reference_style_ckpt()
        out = convert_checkpoint(sd, 1234, capacity_factor=2.0)

        assert out["active_sh_degree"] == 2
        assert out["spatial_lr_scale"] == pytest.approx(3.5)
        store = G.from_state_dict(out["model"])
        cap = store.params.xyz.shape[0]
        assert cap == 60  # 30 * capacity_factor
        assert int(G.num_alive(store)) == 30
        np.testing.assert_allclose(np.asarray(store.params.xyz)[:30],
                                   sd["model"]["_xyz"].numpy())
        # dead padding is masked out
        assert not np.asarray(store.alive)[30:].any()
        # time_ind indexes the sorted unique times
        uniq = np.sort(np.unique(times))
        np.testing.assert_allclose(
            uniq[np.asarray(store.time_ind)[:30]], times)
        np.testing.assert_allclose(out["camera"]["q_c2w"],
                                   sd["camera"]["R_c2ws_quat"].numpy())
        np.testing.assert_allclose(out["optim"]["denom"][:30],
                                   sd["optim"]["denom"].numpy()[:, 0])
        assert out["optim"]["denom"].shape == (60,)

    def test_deform_network_matches_torch(self):
        sd, net, _ = _reference_style_ckpt(seed=3)
        out = convert_checkpoint(sd, 1234)
        params = out["model"]["_deform_network"]
        cfg = M.MotionNetConfig(netwidth=W, num_basis=B,
                                t_emb_multires=MULTIRES)

        rng = np.random.default_rng(1)
        for _ in range(3):
            t_emb = rng.normal(size=(T_EMB_DIM,)).astype(np.float32)
            ours = np.asarray(M.basis_from_embedding(
                params, cfg, np.asarray(t_emb)))
            with torch.no_grad():
                want = net(torch.tensor(t_emb)).numpy()
            np.testing.assert_allclose(ours, want, atol=2e-5)

    def test_motion_coeff_2d_form_upgraded(self):
        sd, _, _ = _reference_style_ckpt()
        sd["model"]["_motion_coeff"] = sd["model"]["_motion_coeff"][:, 0, :]
        out = convert_checkpoint(sd, 1234)
        assert out["model"]["_motion_coeff"].shape == (30, 1, B)
