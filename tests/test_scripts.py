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


class TestMast3rDriver:
    """Structure tests for the alignment-driver logic (VERDICT r4 #9):
    everything `scripts/run_mast3r/run.py:36-358` does around the external
    net — pair graph, window clamping, two-stage cosine LR orchestration,
    geometry export contract — driven with a mocked model/scene."""

    def test_swin_pair_graph_and_clamping(self):
        from mast3r_driver import build_pair_graph, clamp_winsize

        pairs = build_pair_graph(5, "swin", winsize=2, symmetrize=False)
        assert set(pairs) == {(0, 1), (0, 2), (1, 2), (1, 3), (2, 3),
                              (2, 4), (3, 4)}
        sym = build_pair_graph(5, "swin", winsize=2, symmetrize=True)
        assert len(sym) == 2 * len(pairs)
        assert set(sym) == set(pairs) | {(b, a) for a, b in pairs}
        # oversized window clamps to F-1 (noncyclic) / ceil((F-1)/2) cyclic
        assert clamp_winsize(5, "swin", False, 100) == 4
        assert clamp_winsize(5, "swin", True, 100) == 2
        full = build_pair_graph(5, "swin", winsize=100, symmetrize=False)
        assert len(full) == 10  # complete graph C(5,2)
        # cyclic wraps without duplicate/self pairs
        cyc = build_pair_graph(6, "swin", winsize=2, win_cyclic=True,
                               symmetrize=False)
        assert (0, 5) in cyc and all(a != b for a, b in cyc)
        assert len(cyc) == len(set(cyc))

    def test_logwin_and_oneref_graphs(self):
        from mast3r_driver import build_pair_graph

        lg = build_pair_graph(9, "logwin", winsize=3, symmetrize=False)
        # powers-of-two offsets from frame 0: 1, 2, 4
        assert {(0, 1), (0, 2), (0, 4)} <= set(lg)
        assert (0, 3) not in lg
        star = build_pair_graph(5, "oneref", refid=2, symmetrize=False)
        assert set(star) == {(2, 0), (2, 1), (2, 3), (2, 4)}

    def test_two_stage_schedule_orchestration(self):
        from mast3r_driver import (TwoStageSchedule, cosine_lr,
                                   run_two_stage_alignment)

        class MockBackend:
            def __init__(self):
                self.trace = []
                self.pairs = None

            def prepare(self, pairs):
                self.pairs = pairs

            def step(self, stage, lr, opt_depth):
                self.trace.append((stage, lr, opt_depth))

            def finalize(self):
                return "scene"

        sched = TwoStageSchedule(lr1=0.07, niter1=10, lr2=0.014, niter2=4,
                                 optim_level="refine+depth")
        be = MockBackend()
        out = run_two_stage_alignment(be, [(0, 1)], sched,
                                      log=lambda *_: None)
        assert out == "scene" and be.pairs == [(0, 1)]
        coarse = [t for t in be.trace if t[0] == "coarse"]
        refine = [t for t in be.trace if t[0] == "refine"]
        assert len(coarse) == 10 and len(refine) == 4
        # coarse: pose-only, starts at lr1, cosine-anneals to ~0
        assert all(not d for _, _, d in coarse)
        assert coarse[0][1] == pytest.approx(0.07)
        assert coarse[-1][1] == pytest.approx(0.0, abs=1e-9)
        lrs = [lr for _, lr, _ in coarse]
        assert all(a >= b for a, b in zip(lrs, lrs[1:]))  # monotone anneal
        # refine stage optimizes depth at the lower LR
        assert all(d for _, _, d in refine)
        assert refine[0][1] == pytest.approx(0.014)
        # optim_level="coarse" zeroes stage 2 (`run.py:266-267`)
        be2 = MockBackend()
        run_two_stage_alignment(
            be2, [], TwoStageSchedule(niter1=3, optim_level="coarse"),
            log=lambda *_: None)
        assert {t[0] for t in be2.trace} == {"coarse"}
        # cosine shape: halfway point is half the span
        assert cosine_lr(0.5, 0.2, 0.0) == pytest.approx(0.1)

    def _mock_scene(self, n=3, h=12, w=16, seed=0):
        rng = np.random.default_rng(seed)
        imgs = [rng.uniform(size=(h, w, 3)).astype(np.float32)
                for _ in range(n)]
        depths = [rng.uniform(1.0, 5.0, size=(h, w)).astype(np.float32)
                  for _ in range(n)]
        pts = [rng.normal(size=(h * w, 3)).astype(np.float32)
               for _ in range(n)]
        confs = [rng.uniform(0.0, 3.0, size=(h, w)).astype(np.float32)
                 for _ in range(n)]
        c2ws = np.tile(np.eye(4, dtype=np.float32), (n, 1, 1))
        c2ws[:, 0, 3] = np.arange(n)

        class MockScene:
            def __init__(self):
                self.imgs = imgs
                self.raw_depths = depths
                self.confs = confs

            def get_focals(self):
                return np.asarray([30.0])

            def get_im_poses(self):
                return c2ws

            def get_dense_pts3d(self, clean_depth=True):
                return pts, depths, confs

        return MockScene()

    def test_run_driver_export_contract(self, tmp_path):
        from mast3r_driver import run_driver

        scene = self._mock_scene()
        out = tmp_path / "mast3r_opt" / "exp0"
        gd = run_driver(scene, out, min_conf_thr=1.5)
        assert (out / "global_params.pkl").exists()
        with open(out / "global_params.pkl", "rb") as f:
            disk = pickle.load(f)
        assert set(disk) == {"focals", "cam2worlds", "pointcloud_paths",
                             "max_depths", "depths", "masks"}
        # depths normalized by ONE global max (`run.py:102-104`), not
        # per-frame; raw depth reconstructs exactly
        dm = disk["max_depths"]
        assert len(set(dm)) == 1
        raw_max = max(float(d.max()) for d in scene.raw_depths)
        assert dm[0] == pytest.approx(raw_max)
        for i in range(3):
            np.testing.assert_allclose(disk["depths"][i] * dm[0],
                                       scene.raw_depths[i], rtol=1e-6)
        # per-frame artifacts: confident colored ply + cam_params pkl +
        # inverted mask png
        from PIL import Image
        for i in range(3):
            pts_i, cols_i, _, _ = fetch_pointcloud(
                out / "op_results" / f"pointcloud_{i:04d}.ply")
            n_conf = int((scene.confs[i] > 1.5).sum())
            assert len(pts_i) == n_conf and len(cols_i) == n_conf
            with open(out / "op_results" / f"pointcloud_{i:04d}.pkl",
                      "rb") as f:
                cam = pickle.load(f)
            assert cam["focal"] == pytest.approx(30.0)
            assert cam["cam2world"].shape == (4, 4)
            assert cam["depth_max"] == pytest.approx(raw_max)
            png = np.asarray(Image.open(
                out / "op_results" / "masks" / f"{i:04d}.png"))
            np.testing.assert_array_equal(
                png == 255, ~(scene.confs[i] > 1.5))

    def test_driver_output_feeds_unprojection(self, tmp_path):
        """End-to-end: the driver's global_params.pkl is directly
        consumable by mast3r_unprojection (the next pipeline stage)."""
        from PIL import Image

        from mast3r_driver import run_driver
        from mast3r_unproject import mast3r_unprojection

        h, w, n = 12, 16, 3
        scene = self._mock_scene(n=n, h=h, w=w)
        exp = tmp_path / "mast3r_opt" / "exp0"
        run_driver(scene, exp)
        rng = np.random.default_rng(1)
        imagepaths, maskpaths = [], []
        (tmp_path / "train").mkdir()
        (tmp_path / "tam_mask").mkdir()
        for i in range(n):
            img = (rng.uniform(size=(h, w, 3)) * 255).astype(np.uint8)
            p = tmp_path / "train" / f"rgb_{i:05d}.png"
            Image.fromarray(img).save(p)
            imagepaths.append(str(p))
            m = np.zeros((h, w), np.uint8)
            m[:, w // 2:] = 255
            mp = tmp_path / "tam_mask" / f"{i:06d}.png"
            Image.fromarray(m).save(mp)
            maskpaths.append(str(mp))
        mast3r_unprojection(str(exp), maskpaths, imagepaths,
                            skip_dynamic=False)
        for sub in ("static", "dynamic", "depth"):
            assert (exp / sub).exists()


class TestDepthAnythingRunner:
    """Batch-loop structure tests (VERDICT r4 missing #1): the reference's
    real inference loop (`run_depthanything.py:84-139`) driven with a
    mocked model — input-spec resolution, raw-npy contract, visualization
    normalization."""

    def test_resolve_filenames_txt_file_and_dir(self, tmp_path):
        from run_depthanything import resolve_filenames

        d = tmp_path / "imgs" / "sub"
        d.mkdir(parents=True)
        (tmp_path / "imgs" / "a.png").write_bytes(b"x")
        (d / "b.png").write_bytes(b"x")
        assert resolve_filenames(str(tmp_path / "imgs")) == [
            str(tmp_path / "imgs" / "a.png"), str(d / "b.png")]
        lst = tmp_path / "list.txt"
        lst.write_text("one.png\ntwo.png")
        assert resolve_filenames(str(lst)) == ["one.png", "two.png"]
        single = tmp_path / "imgs" / "a.png"
        assert resolve_filenames(str(single)) == [str(single)]

    def test_run_batch_writes_raw_npy_consumed_by_reader(self, tmp_path):
        from run_depthanything import run_batch

        h, w = 10, 14
        rng = np.random.default_rng(0)
        imgs = {f"f{i}.png": (rng.uniform(size=(h, w, 3)) * 255)
                .astype(np.uint8) for i in range(3)}
        depths = {k: rng.uniform(1.0, 9.0, size=(h, w)).astype(np.float32)
                  for k in imgs}
        calls = []

        def read_fn(p):
            return imgs[Path(p).name]

        def infer(img):
            k = next(k for k, v in imgs.items() if v is img)
            calls.append(k)
            return depths[k]

        out = tmp_path / "depth_anything"
        written = run_batch([f"d/{k}" for k in imgs], infer, read_fn,
                            str(out), save_viz=False, log=lambda *_: None)
        assert calls == list(imgs)
        assert len(written) == 3
        for k in imgs:
            stem = Path(k).stem
            np.testing.assert_array_equal(np.load(out / f"{stem}.npy"),
                                          depths[k])
        # the training-side reader consumes these files directly
        from rodygs_tpu.data.readers import DepthAnythingReader

        r = DepthAnythingReader()
        d0 = r(str(tmp_path), "f0.png")
        assert d0.shape == (h, w)
        # reader contract: negated + min-max normalized to [0,1]
        assert float(d0.min()) == pytest.approx(0.0)
        assert float(d0.max()) == pytest.approx(1.0)
        # far (large raw depth) maps low after negation
        am = np.unravel_index(np.argmax(depths["f0.png"]), (h, w))
        assert d0[am] == pytest.approx(0.0)

    def test_visualization_modes(self, tmp_path):
        from run_depthanything import run_batch, visualize_depth

        depth = np.linspace(0, 1, 12, dtype=np.float32).reshape(3, 4)
        gray = visualize_depth(depth, grayscale=True)
        assert gray.shape == (3, 4, 3)
        assert gray[0, 0, 0] == 0 and gray[-1, -1, 0] == 255
        assert (gray[..., 0] == gray[..., 1]).all()
        spectral = visualize_depth(depth, grayscale=False)
        assert spectral.shape == (3, 4, 3)
        assert not (spectral[..., 0] == spectral[..., 1]).all()
        # constant depth must not divide by zero
        flat = visualize_depth(np.ones((2, 2), np.float32), grayscale=True)
        assert (flat == 0).all()
        # side-by-side viz: width = img + 50px split + viz
        img = np.zeros((3, 4, 3), np.uint8)
        run_batch(["x.png"], lambda _: depth, lambda _: img,
                  str(tmp_path), raw_depth=False, save_viz=True,
                  pred_only=False, log=lambda *_: None)
        import cv2

        png = cv2.imread(str(tmp_path / "x.png"))
        assert png.shape == (3, 4 + 50 + 4, 3)
