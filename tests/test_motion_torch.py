"""Independent torch cross-check of the motion model (the same treatment
losses/preprocess/compositing got): a transliteration of the reference's
`TimestepEmbedder` / `MLPBasisNetwork` / `MLPMotionBasis` /
`get_gaussian_deformation` (`src/model/rodygs_dynamic.py:122-327`) — torch
nn.Modules with a Python loop over the per-basis heads — fed the SAME
weights as `models/motion.py`'s batched-einsum formulation.

Covers: Fourier time embedding order, the 3-layer timenet with exact (erf)
GELU, the B 2-layer heads, coefficient application, inverse-motion
canonicalization, and the translation-only spatial_lr_scale."""

import numpy as np
import pytest
import torch
import torch.nn as nn

import jax
import jax.numpy as jnp

from rodygs_tpu.models.motion import (
    MotionNetConfig, embed_time, gaussian_deformation, init_motion_params,
    motion_basis)


def torch_embed(t: float, multires: int, log_sampling: bool):
    if log_sampling:
        freqs = 2.0 ** torch.linspace(0.0, multires - 1, multires,
                                      dtype=torch.float64)
    else:
        freqs = torch.linspace(1.0, 2.0 ** (multires - 1), multires,
                               dtype=torch.float64)
    freqs = freqs * np.pi
    emb = [torch.tensor(t, dtype=torch.float64)]
    for f in freqs:
        for func in (torch.sin, torch.cos):
            emb.append(func(torch.tensor(t, dtype=torch.float64) * f))
    return torch.stack(emb)


class TorchBasisNetwork(nn.Module):
    """Reference MLPBasisNetwork transliteration, weights injected."""

    def __init__(self, cfg: MotionNetConfig, params):
        super().__init__()
        w = cfg.netwidth
        act = nn.GELU() if cfg.activation != "relu" else nn.ReLU()
        self.cfg = cfg
        self.timenet = nn.Sequential(
            nn.Linear(cfg.t_embed_dim, w), act,
            nn.Linear(w, w), act,
            nn.Linear(w, w // 2), act,
        )
        tn = params["timenet"]
        with torch.no_grad():
            for i, (wk, bk) in enumerate((("w0", "b0"), ("w1", "b1"),
                                          ("w2", "b2"))):
                lin = self.timenet[2 * i]
                lin.weight.copy_(torch.tensor(np.asarray(tn[wk]).T))
                lin.bias.copy_(torch.tensor(np.asarray(tn[bk])))
        self.heads = nn.ModuleList()
        hd = params["heads"]
        for b in range(cfg.num_basis):
            head = nn.Sequential(nn.Linear(w // 2, w // 4), act,
                                 nn.Linear(w // 4, 7))
            with torch.no_grad():
                head[0].weight.copy_(torch.tensor(np.asarray(hd["w0"][b]).T))
                head[0].bias.copy_(torch.tensor(np.asarray(hd["b0"][b])))
                head[2].weight.copy_(torch.tensor(np.asarray(hd["w1"][b]).T))
                head[2].bias.copy_(torch.tensor(np.asarray(hd["b1"][b])))
            self.heads.append(head)
        self.double()

    def basis(self, t: float):
        emb = torch_embed(t, self.cfg.t_emb_multires, self.cfg.t_log_sampling)
        out = self.timenet(emb)
        return torch.stack([h(out) for h in self.heads])  # [B, 7]

    def forward(self, coeff, t: float):
        tot = coeff @ self.basis(t)  # [N, 7]
        return tot[:, :3], tot[:, 3:]


@pytest.fixture(scope="module")
def net():
    cfg = MotionNetConfig(netwidth=64, num_basis=8, t_emb_multires=10)
    params = init_motion_params(jax.random.key(2), cfg)
    return cfg, params, TorchBasisNetwork(cfg, params)


class TestMotionTorchParity:
    def test_time_embedding_matches(self):
        # single-precision on BOTH sides — the reference embeds in f32
        # (torch.linspace default). Components whose t*freq argument is
        # f32-well-conditioned (freq <= ~2^15) must match tightly; above
        # that (the shipped multires=26 reaches 2^25*pi) a one-ULP
        # difference in linspace/sin range reduction flips the value
        # entirely, so those features are implementation-defined in ANY
        # f32 implementation (including between reference GPU/CPU runs) —
        # only boundedness is checked there.
        for multires, log_s in ((10, False), (26, False), (6, True)):
            for t in (0.0, 0.13, 0.5, 0.97):
                mine = np.asarray(embed_time(jnp.float32(t), multires, log_s))
                if log_s:
                    freqs = 2.0 ** torch.linspace(0.0, multires - 1, multires)
                else:
                    freqs = torch.linspace(1.0, 2.0 ** (multires - 1),
                                           multires)
                freqs = freqs * np.pi
                tt = torch.tensor(t, dtype=torch.float32)
                ref = torch.stack(
                    [tt] + [f(tt * fr) for fr in freqs
                            for f in (torch.sin, torch.cos)]).numpy()
                strict = 1 + 2 * int((freqs.numpy() <= 2.0 ** 15).sum())
                np.testing.assert_allclose(mine[:strict], ref[:strict],
                                           atol=1e-4)
                assert np.abs(mine).max() <= 1.0 + 1e-6
                assert mine.shape == ref.shape

    def test_basis_matches(self, net):
        cfg, params, tnet = net
        for t in (0.0, 0.25, 0.8):
            mine = np.asarray(motion_basis(params, cfg, jnp.float32(t)))
            ref = tnet.basis(t).detach().numpy()
            np.testing.assert_allclose(mine, ref, atol=1e-5)

    def test_deformation_matches_incl_inverse_motion(self, net):
        cfg, params, tnet = net
        rng = np.random.default_rng(0)
        n, T = 40, 5
        coeff = rng.normal(0, 0.5, size=(n, 1, cfg.num_basis)).astype(np.float32)
        times_table = np.linspace(0.0, 1.0, T).astype(np.float32)
        time_ind = rng.integers(0, T, size=n)
        lr_scale = 3.7
        t = 0.42

        transl, rot = gaussian_deformation(
            params, cfg, jnp.asarray(coeff), jnp.float32(t), lr_scale,
            inverse_motion=True, time_ind=jnp.asarray(time_ind),
            times_table=jnp.asarray(times_table))

        # reference semantics: subtract each gaussian's birth-time motion,
        # then scale ONLY the translation (`rodygs_dynamic.py:122-138`)
        c64 = torch.tensor(coeff[:, 0, :], dtype=torch.float64)
        ref_tr, ref_rot = tnet(c64, t)
        table = torch.stack([tnet.basis(float(tt)) for tt in times_table])
        birth = torch.einsum("nb,nbk->nk", c64, table[time_ind])
        ref_tr = (ref_tr - birth[:, :3]) * lr_scale
        ref_rot = ref_rot - birth[:, 3:]

        np.testing.assert_allclose(np.asarray(transl),
                                   ref_tr.detach().numpy(), atol=5e-5)
        np.testing.assert_allclose(np.asarray(rot),
                                   ref_rot.detach().numpy(), atol=5e-5)

    def test_motion_basis_reg_matches_reference_forward(self):
        """Transliteration of `MotionBasisRegularizaiton.forward`
        (`src/trainer/losses.py:468-525`) incl. the faithful quirk: the
        reference's `derivate_motion` never passes `is_rot=True`, so its
        rotation "derivative" is elementwise matrix subtraction (the
        matmul branch at `losses.py:483-485` is dead). Covers
        rot_degree/transl_degree in {-1, 0, 1} x all 5 coeff banks."""
        from rodygs_tpu.train.losses import _COEFF_BANK, motion_basis_reg

        def torch_quat_to_matrix(q):
            r, i, j, k = torch.unbind(q, -1)
            two_s = 2.0 / (q * q).sum(-1)
            o = torch.stack((
                1 - two_s * (j * j + k * k), two_s * (i * j - k * r),
                two_s * (i * k + j * r), two_s * (i * j + k * r),
                1 - two_s * (i * i + k * k), two_s * (j * k - i * r),
                two_s * (i * k - j * r), two_s * (j * k + i * r),
                1 - two_s * (i * i + j * j)), -1)
            return o.reshape(q.shape[:-1] + (3, 3))

        def ref_forward(table_np, transl_degree, rot_degree, mode,
                        use_matmul_rot=False):
            table = torch.tensor(table_np, dtype=torch.float32)
            transl, rotq = table[..., :3], table[..., 3:]
            rotm = torch_quat_to_matrix(rotq.reshape(-1, 4)).reshape(
                *rotq.shape[:-1], 3, 3)

            def deriv(x, degree, is_rot=False):
                for _ in range(degree):
                    if is_rot and use_matmul_rot:
                        x = x[1:] @ x[:-1].transpose(-1, -2)
                    else:
                        x = x[1:] - x[:-1]
                return x

            td = deriv(transl, transl_degree + 1)
            rd = deriv(rotm, rot_degree + 1, is_rot=True)
            coeff = torch.tensor(_COEFF_BANK[mode], dtype=torch.float32)
            if mode != "vanilla":
                coeff = coeff / coeff.max() * 1.3
            coeff = coeff[: table.shape[1]]
            tn = (torch.norm(td, dim=-1) * coeff[None]).mean()
            rn = (torch.norm(torch.eye(3)[None, None] - rd, dim=(-1, -2))
                  * coeff[None]).mean()
            if transl_degree < 0:
                tn = torch.zeros(())
            if rot_degree < 0:
                rn = torch.zeros(())
            return float(tn + rn)

        rng = np.random.default_rng(7)
        T, B = 9, 16
        table = rng.normal(0, 0.1, size=(T, B, 7)).astype(np.float32)
        ctx = {"motion_table": jnp.asarray(table)}
        for mode in _COEFF_BANK:
            for td in (-1, 0, 1):
                for rd in (-1, 0, 1):
                    mine = float(motion_basis_reg(
                        ctx, transl_degree=td, rot_degree=rd,
                        freq_div_mode=mode))
                    ref = ref_forward(table, td, rd, mode)
                    np.testing.assert_allclose(mine, ref, atol=2e-5,
                                               err_msg=f"{mode} td={td} rd={rd}")
        # opt-in intended math: matches the matmul variant, not the faithful
        for rd in (0, 1):
            mine = float(motion_basis_reg(
                ctx, transl_degree=0, rot_degree=rd,
                freq_div_mode="cum_exponential",
                apply_rot_matmul_derivative=True))
            ref_mm = ref_forward(table, 0, rd, "cum_exponential",
                                 use_matmul_rot=True)
            ref_faithful = ref_forward(table, 0, rd, "cum_exponential")
            np.testing.assert_allclose(mine, ref_mm, atol=2e-5)
            assert abs(mine - ref_faithful) > 1e-3  # genuinely different

    def test_exact_gelu_not_tanh_approximation(self, net):
        """The reference's nn.GELU() is the exact erf form; the tanh
        approximation drifts ~3e-4 relative — enough to fail the 1e-5
        parity above if regressed."""
        cfg, params, tnet = net
        mine = np.asarray(motion_basis(params, cfg, jnp.float32(0.3)))
        ref = tnet.basis(0.3).detach().numpy()
        assert np.abs(mine - ref).max() < 1e-5
