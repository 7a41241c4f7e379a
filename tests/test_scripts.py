"""Preprocessing-script tests: PLY IO, depth unprojection round-trip,
dataset converter output contract."""

import json
import pickle
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "scripts"))

from rodygs_tpu.utils.ply import fetch_pointcloud, read_ply, write_ply


class TestPlyIO:
    def test_roundtrip_with_time(self, tmp_path):
        rng = np.random.default_rng(0)
        pts = rng.normal(size=(100, 3)).astype(np.float32)
        cols = rng.uniform(size=(100, 3)).astype(np.float32)
        t = rng.uniform(size=100).astype(np.float32)
        write_ply(tmp_path / "a.ply", pts, colors=cols, time=t)
        p2, c2, n2, t2 = fetch_pointcloud(tmp_path / "a.ply")
        np.testing.assert_allclose(p2, pts, atol=1e-6)
        np.testing.assert_allclose(c2, cols, atol=1 / 255.0)
        np.testing.assert_allclose(t2[:, 0], t, atol=1e-6)

    def test_ascii_ply(self, tmp_path):
        content = """ply
format ascii 1.0
element vertex 2
property float x
property float y
property float z
end_header
1.0 2.0 3.0
4.0 5.0 6.0
"""
        (tmp_path / "b.ply").write_bytes(content.encode())
        v = read_ply(tmp_path / "b.ply")
        np.testing.assert_allclose(v["x"], [1.0, 4.0])
        np.testing.assert_allclose(v["z"], [3.0, 6.0])


class TestUnprojection:
    def test_unproject_depth_geometry(self):
        from mast3r_unproject import unproject_depth

        # flat wall at z=2 in front of an identity camera
        h, w, focal = 32, 48, 40.0
        img = np.zeros((h, w, 3), np.uint8)
        depth = np.full((h, w), 2.0)
        c2w = np.eye(4)
        pts, _ = unproject_depth(focal, c2w, img, depth)
        assert pts.shape == (h * w, 3)
        np.testing.assert_allclose(pts[:, 2], 2.0, atol=1e-5)
        # the central pixel unprojects near the optical axis
        center = pts.reshape(h, w, 3)[h // 2, w // 2]
        np.testing.assert_allclose(center[:2], [0.0, 0.0], atol=0.1)

    def test_full_unprojection_pipeline(self, tmp_path):
        from PIL import Image

        from mast3r_unproject import mast3r_unprojection

        h, w = 24, 32
        n_frames = 3
        exp = tmp_path / "mast3r_opt" / "exp0"
        exp.mkdir(parents=True)
        (tmp_path / "train").mkdir()
        (tmp_path / "tam_mask").mkdir()
        rng = np.random.default_rng(0)
        depths = rng.uniform(0.3, 1.0, size=(n_frames, h * w)).astype(np.float32)
        c2ws = np.tile(np.eye(4, dtype=np.float32), (n_frames, 1, 1))
        with open(exp / "global_params.pkl", "wb") as f:
            pickle.dump({
                "focals": [30.0], "cam2worlds": c2ws,
                "depths": depths, "max_depths": [4.0],
                "masks": np.ones((n_frames, h, w), bool),
            }, f)
        imagepaths, maskpaths = [], []
        for i in range(n_frames):
            img = (rng.uniform(size=(h, w, 3)) * 255).astype(np.uint8)
            p = tmp_path / "train" / f"rgb_{i:05d}.png"
            Image.fromarray(img).save(p)
            imagepaths.append(str(p))
            mask = np.zeros((h, w), np.uint8)
            mask[:, w // 2:] = 255
            mp = tmp_path / "tam_mask" / f"{i:06d}.png"
            Image.fromarray(mask).save(mp)
            maskpaths.append(str(mp))

        mast3r_unprojection(str(exp), maskpaths, imagepaths, skip_dynamic=False)
        for sub in ("static", "dynamic", "depth"):
            assert (exp / sub).exists()
        s_pts, _, _, _ = fetch_pointcloud(exp / "static" / "0000_static.ply")
        d_pts, _, _, _ = fetch_pointcloud(exp / "dynamic" / "0000_dynamic.ply")
        assert len(s_pts) + len(d_pts) == h * w
        # dynamic points come from the right half -> positive camera-x
        assert (d_pts[:, 0] > -1e-5).all()
        d = np.load(exp / "depth" / "00000_depth.npy")
        assert d.shape == (h, w)
        assert d.max() <= 4.0 + 1e-5


class TestConverters:
    def test_kubric_converter(self, tmp_path):
        from PIL import Image

        import kubricmrig2format as conv

        src = tmp_path / "kubric"
        for split in ("train", "test"):
            (src / split).mkdir(parents=True)
        n = 10
        rng = np.random.default_rng(1)
        quats = rng.normal(size=(n, 4))
        quats /= np.linalg.norm(quats, axis=1, keepdims=True)
        meta = {
            "metadata": {"resolution": [16, 24], "num_frames": n},
            "camera": {
                "field_of_view": 0.8,
                "quaternions": quats.tolist(),
                "positions": rng.normal(size=(n, 3)).tolist(),
            },
        }
        for split in ("train", "test"):
            with open(src / split / "metadata.json", "w") as f:
                json.dump(meta, f)
            for i in range(n):
                Image.fromarray(np.zeros((16, 24, 4), np.uint8)).save(
                    src / split / f"rgba_{i:05d}.png")

        out = tmp_path / "out"
        conv.convert(str(src), str(out))
        for split, expected in [("train", n), ("val", 1), ("test", n - 1)]:
            with open(out / f"{split}_transforms.json") as f:
                t = json.load(f)
            assert len(t["frames"]) == expected
            m = np.asarray(t["frames"][0]["transform_matrix"])
            # valid rigid transform (orthonormal rotation block)
            np.testing.assert_allclose(m[:3, :3] @ m[:3, :3].T, np.eye(3),
                                       atol=1e-5)
            np.testing.assert_allclose(m[3], [0, 0, 0, 1], atol=1e-12)


class TestNativeOps:
    """Native layer vs numpy fallback equivalence (utils/native.py)."""

    def test_composite_matches_numpy(self):
        from rodygs_tpu.utils import native

        rng = np.random.default_rng(0)
        rgba = rng.integers(0, 256, size=(33, 47, 4), dtype=np.uint8)
        got = native.composite_rgba_to_rgb(rgba)
        data = rgba.astype(np.float32) / 255.0
        expect = np.clip(data[..., :3] * data[..., 3:4], 0, 1)
        np.testing.assert_allclose(got, expect, atol=1e-6)

    def test_depth_normalize_matches(self):
        from rodygs_tpu.utils import native

        d = np.random.default_rng(1).uniform(0.5, 9.0, size=(40, 50)).astype(np.float32)
        got = native.negate_minmax_normalize(d)
        nd = -d
        expect = (nd - nd.min()) / (nd.max() - nd.min())
        np.testing.assert_allclose(got, expect, atol=1e-6)

    def test_png_pack_matches(self):
        from rodygs_tpu.utils import native

        img = np.random.default_rng(2).uniform(-0.1, 1.1, size=(16, 20, 3)).astype(np.float32)
        got = native.f32_rgb_to_u16_bgr(img)
        expect = (np.clip(img, 0, 1)[..., ::-1] * 65535.0).astype(np.uint16)
        np.testing.assert_array_equal(got, expect)

    def test_native_unproject_matches_python(self):
        from rodygs_tpu.utils import native

        if native.get_lib() is None:
            pytest.skip("no native toolchain")
        h, w, focal = 12, 18, 25.0
        rng = np.random.default_rng(3)
        depth = rng.uniform(0.5, 3.0, size=(h, w)).astype(np.float32)
        c2w = np.eye(4, dtype=np.float32)
        c2w[:3, 3] = [0.3, -0.2, 0.1]
        got = native.unproject_depth_native(depth, c2w, focal)
        xs, ys = np.meshgrid(np.arange(w), np.arange(h))
        pix = np.stack([xs.ravel(), ys.ravel(), np.ones(h * w)], axis=0)
        k_inv = np.linalg.inv(np.array([[focal, 0, w / 2], [0, focal, h / 2], [0, 0, 1]]))
        pts = (c2w[:3, :3] @ (k_inv @ pix * depth.reshape(1, -1)) + c2w[:3, 3:4]).T
        np.testing.assert_allclose(got, pts, atol=1e-4)
