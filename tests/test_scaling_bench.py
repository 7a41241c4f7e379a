"""In-suite validation of the scaling-efficiency harness (VERDICT r2
missing #4 / BASELINE ">80% rays/s at N>=2 hosts"): the sweep must run on
the virtual 8-device CPU mesh — the same dry form that validates the
pod-ready path without hardware — produce well-formed rows for every
requested mesh shape, and define efficiency against the 1-device
baseline."""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "scripts"))

import scaling_bench  # noqa: E402


class TestCandidateMeshes:
    def test_factorizations_cover_device_count(self):
        shapes = scaling_bench.candidate_meshes(8)
        assert (1, 1, 1) in shapes
        for d, g, t in shapes:
            assert d * g * t in (1, 8)
        # pure axes all present
        for s in [(8, 1, 1), (1, 8, 1), (1, 1, 8), (2, 2, 2)]:
            assert s in shapes

    def test_no_gauss_filter(self):
        shapes = scaling_bench.candidate_meshes(8, include_gauss=False)
        assert all(g == 1 for _, g, _ in shapes)


class TestSweepVirtualMesh:
    def test_sweep_runs_and_reports_efficiency(self, tmp_path):
        out = tmp_path / "scaling.json"
        summary = scaling_bench.main([
            "--width", "96", "--height", "64", "--n", "1500",
            "--iters", "2", "--meshes", "8x1x1,2x2x2",
            "--out", str(out)])
        assert out.exists()
        assert summary["n_devices"] == 8
        rows = {tuple(r["mesh"][k] for k in ("data", "gauss", "tile")): r
                for r in summary["meshes"]}
        assert set(rows) == {(1, 1, 1), (8, 1, 1), (2, 2, 2)}
        for shape, r in rows.items():
            assert "error" not in r, (shape, r)
            assert r["step_ms"] > 0
            assert r["rays_per_s"] > 0
        assert rows[(1, 1, 1)]["efficiency"] == 1.0
        # efficiency = rays / (baseline * devices), positive and consistent.
        # No tight upper bound: with iters=2 on a shared host, the 1-device
        # baseline window can be arbitrarily inflated by unrelated CPU load
        # (observed: a concurrent TPU job's host-side compile pushed eff
        # past a 1.5 noise cap). Correctness is the formula consistency
        # below; the magnitude is only meaningful on an idle machine.
        for shape in [(8, 1, 1), (2, 2, 2)]:
            eff = rows[shape]["efficiency"]
            assert 0 < eff < 100
            expect = rows[shape]["rays_per_s"] / (
                summary["baseline_rays_per_s"] * 8)
            np.testing.assert_allclose(eff, expect, atol=1e-3)
