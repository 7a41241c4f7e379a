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


class TestNvidiaConverter:
    def test_llff_pose_conversion_and_split(self, tmp_path):
        from PIL import Image

        import nvidia2format as conv

        n_train, n_test = 6, 3
        rng = np.random.default_rng(2)
        h, w, focal = 480.0, 640.0, 500.0
        # LLFF poses_bounds: [R|t|hwf] rows in down-right-back convention
        poses = np.zeros((n_train, 3, 5))
        rots = []
        for i in range(n_train):
            q = rng.normal(size=4)
            q /= np.linalg.norm(q)
            ww, x, y, z = q
            r = np.array([
                [1 - 2 * (y * y + z * z), 2 * (x * y - ww * z), 2 * (x * z + ww * y)],
                [2 * (x * y + ww * z), 1 - 2 * (x * x + z * z), 2 * (y * z - ww * x)],
                [2 * (x * z - ww * y), 2 * (y * z + ww * x), 1 - 2 * (x * x + y * y)]])
            rots.append(r)
            poses[i, :, :3] = r
            poses[i, :, 3] = rng.normal(size=3)
            poses[i, :, 4] = [h, w, focal]
        pb = np.concatenate([poses.reshape(n_train, 15),
                             np.ones((n_train, 2))], axis=1)

        train_dir = tmp_path / "nvidia" / "train"
        (train_dir / "images_2").mkdir(parents=True)
        np.save(train_dir / "poses_bounds.npy", pb)
        img = Image.fromarray(np.zeros((8, 8, 3), np.uint8))
        for i in range(n_train):
            img.save(train_dir / "images_2" / f"{i:03d}.png")
        test_dir = tmp_path / "nvidia" / "test"
        test_dir.mkdir()
        for j in range(n_test):
            img.save(test_dir / f"v{j:03d}.png")

        out = tmp_path / "out"
        conv.convert(str(train_dir), str(test_dir), str(out))

        with open(out / "train_transforms.json") as f:
            tr = json.load(f)
        with open(out / "test_transforms.json") as f:
            te = json.load(f)
        assert len(tr["frames"]) == n_train and len(te["frames"]) == n_test
        # intrinsics at the 2x downsample
        import math
        assert tr["camera_angle_x"] == pytest.approx(
            math.degrees(2 * math.atan((w / 2) / (2 * (focal / 2)))))
        # LLFF (down,right,back) -> OpenCV (right,down,front): the converted
        # rotation's columns are [col1, col0, -col2] of the LLFF rotation
        m0 = np.asarray(tr["frames"][0]["transform_matrix"])
        want = np.stack([rots[0][:, 1], rots[0][:, 0], -rots[0][:, 2]], axis=1)
        np.testing.assert_allclose(m0[:3, :3], want, atol=1e-12)
        # the reference's `-poses[..., 2:4]` negates the TRANSLATION column
        # along with the back axis (scripts/nvidia2format.py:52-54 of the
        # reference) — preserved verbatim here
        np.testing.assert_allclose(m0[:3, 3], -poses[0, :, 3], atol=1e-12)
        # all test frames share the FIRST train camera pose (reference
        # nvidia2format semantics: held-out viewpoint = camera 0)
        for fr in te["frames"]:
            np.testing.assert_allclose(
                np.asarray(fr["transform_matrix"])[:3, :3], want, atol=1e-12)
        # frame timing spans [0, 1)
        times = [fr["time"] for fr in tr["frames"]]
        np.testing.assert_allclose(times, np.arange(n_train) / n_train)


class TestIphoneConverter:
    def test_dycheck_split_and_orientation(self, tmp_path):
        from PIL import Image

        import iphone2format as conv

        n = 17
        rng = np.random.default_rng(3)
        src = tmp_path / "dycheck"
        (src / "splits").mkdir(parents=True)
        (src / "camera").mkdir()
        (src / "rgb" / "1x").mkdir(parents=True)
        names = [f"0_{i:05d}" for i in range(n)]
        with open(src / "splits" / "train.json", "w") as f:
            json.dump({"frame_names": names}, f)
        img = Image.fromarray(np.zeros((8, 8, 3), np.uint8))
        oris = []
        for i, nm in enumerate(names):
            q = rng.normal(size=4)
            q /= np.linalg.norm(q)
            ww, x, y, z = q
            r = np.array([
                [1 - 2 * (y * y + z * z), 2 * (x * y - ww * z), 2 * (x * z + ww * y)],
                [2 * (x * y + ww * z), 1 - 2 * (x * x + z * z), 2 * (y * z - ww * x)],
                [2 * (x * z - ww * y), 2 * (y * z + ww * x), 1 - 2 * (x * x + y * y)]])
            oris.append(r)
            with open(src / "camera" / f"{nm}.json", "w") as f:
                json.dump({"orientation": r.tolist(),
                           "position": rng.normal(size=3).tolist(),
                           "focal_length": 700.0}, f)
            img.save(src / "rgb" / "1x" / f"{nm}.png")

        out = tmp_path / "out"
        conv.convert(str(src), str(out))

        with open(out / "train_transforms.json") as f:
            tr = json.load(f)
        with open(out / "test_transforms.json") as f:
            te = json.load(f)
        # every 8th frame offset 4 goes to test (reference iphone2format)
        test_idx = [i for i in range(n) if (i + 4) % 8 == 0]
        assert len(te["frames"]) == len(test_idx)
        assert len(tr["frames"]) == n - len(test_idx)
        # c2w rotation = inverse(orientation) (DyCheck stores w2c orientation)
        m = np.asarray(te["frames"][0]["transform_matrix"])
        np.testing.assert_allclose(m[:3, :3], np.linalg.inv(oris[test_idx[0]]),
                                   atol=1e-10)
        # times use the ORIGINAL frame index, not the per-split counter
        np.testing.assert_allclose(
            [fr["time"] for fr in te["frames"]],
            [i / n for i in test_idx])


class TestTnTConverter:
    def _write_colmap_model(self, sparse_dir, images, width, height, focal):
        import struct

        with open(sparse_dir / "cameras.bin", "wb") as f:
            f.write(struct.pack("<Q", 1))
            f.write(struct.pack("<iiQQ", 1, 0, width, height))  # SIMPLE_PINHOLE
            f.write(struct.pack("<ddd", focal, width / 2, height / 2))
        with open(sparse_dir / "images.bin", "wb") as f:
            f.write(struct.pack("<Q", len(images)))
            for iid, (name, qvec, tvec) in enumerate(images, start=1):
                f.write(struct.pack("<idddddddi", iid, *qvec, *tvec, 1))
                f.write(name.encode() + b"\x00")
                f.write(struct.pack("<Q", 0))  # no 2D points

    def test_colmap_to_c2w_and_split(self, tmp_path):
        from PIL import Image

        import tnt2format as conv
        from colmap_io import qvec2rotmat

        n = 10
        rng = np.random.default_rng(4)
        src = tmp_path / "tnt"
        sparse = src / "sparse" / "0"
        sparse.mkdir(parents=True)
        (src / "images").mkdir()
        img = Image.fromarray(np.zeros((8, 8, 3), np.uint8))
        entries = []
        for i in range(n):
            q = rng.normal(size=4)
            q /= np.linalg.norm(q)
            t = rng.normal(size=3)
            name = f"frame_{i:04d}.png"
            entries.append((name, q, t))
            img.save(src / "images" / name)
        self._write_colmap_model(sparse, entries, 32, 24, 30.0)

        out = tmp_path / "out"
        conv.convert(str(src), str(out))

        with open(out / "train_transforms.json") as f:
            tr = json.load(f)
        with open(out / "test_transforms.json") as f:
            te = json.load(f)
        test_idx = [i for i in range(n) if (i + 4) % 8 == 0]
        assert len(te["frames"]) == len(test_idx)
        assert len(tr["frames"]) == n - len(test_idx)
        # c2w = [R^T | -R^T t] from the stored world->camera (qvec, tvec)
        name, q, t = entries[test_idx[0]]
        r = qvec2rotmat(q)
        m = np.asarray(te["frames"][0]["transform_matrix"])
        np.testing.assert_allclose(m[:3, :3], r.T, atol=1e-10)
        np.testing.assert_allclose(m[:3, 3], -r.T @ t, atol=1e-10)
        import math
        assert tr["camera_angle_x"] == pytest.approx(
            math.degrees(2 * math.atan(32 / (2 * 30.0))))
