"""Rasterizer correctness: Pallas tile kernel vs the pure-jnp slow-gold
compositor, and gradient checks (SURVEY.md §4 item (b); BASELINE.json
configs[0]: forward + backward grad check on CPU)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rodygs_tpu.ops.sh import rgb2sh
from rodygs_tpu.render.binning import bin_splats, tile_grid
from rodygs_tpu.render.camera import make_camera
from rodygs_tpu.render.composite_ref import composite_reference
from rodygs_tpu.render.preprocess import preprocess
from rodygs_tpu.render.rasterize import render

W, H = 64, 48


def make_scene(n=300, seed=0, sh_extra=False):
    rng = np.random.default_rng(seed)
    means = rng.uniform([-1.5, -1.0, 2.0], [1.5, 1.0, 6.0], size=(n, 3)).astype(np.float32)
    scales = np.exp(rng.uniform(-3.2, -1.8, size=(n, 3))).astype(np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=1, keepdims=True)
    opac = rng.uniform(0.2, 0.95, size=(n,)).astype(np.float32)
    k = 16
    shs = np.zeros((n, k, 3), dtype=np.float32)
    shs[:, 0] = np.asarray(rgb2sh(rng.uniform(0.1, 0.9, size=(n, 3)).astype(np.float32)))
    if sh_extra:
        shs[:, 1:] = rng.normal(0, 0.05, size=(n, k - 1, 3)).astype(np.float32)
    cam = make_camera([1.0, 0.0, 0.0, 0.0], [0.0, 0.0, 0.0], 0.9, 0.7, 0.0)
    return (jnp.asarray(means), jnp.asarray(scales), jnp.asarray(quats),
            jnp.asarray(opac), jnp.asarray(shs), cam)


class TestForwardVsGold:
    @pytest.mark.parametrize("sh_degree,sh_extra", [(0, False), (3, True)])
    def test_kernel_matches_reference(self, sh_degree, sh_extra):
        means, scales, quats, opac, shs, cam = make_scene(sh_extra=sh_extra)
        splats = preprocess(means, scales, quats, opac, shs, sh_degree, cam, W, H)
        gold = composite_reference(splats, W, H)
        out = render(means, shs, opac, scales, quats, cam, sh_degree, W, H)
        assert not bool(out["overflow"])
        np.testing.assert_allclose(
            out["rendered_image"], gold["rendered_image"], atol=2e-5)
        np.testing.assert_allclose(
            out["rendered_depth"], gold["rendered_depth"], atol=2e-4)
        np.testing.assert_allclose(
            out["rendered_alpha"], gold["rendered_alpha"], atol=2e-5)
        np.testing.assert_allclose(
            out["rendered_normal"], gold["rendered_normal"], atol=2e-4)

    def test_background_compositing(self):
        means, scales, quats, opac, shs, cam = make_scene(n=50)
        bg = jnp.array([0.2, 0.4, 0.6])
        out = render(means, shs, opac, scales, quats, cam, 0, W, H, bg=bg)
        # Pixels with zero alpha must equal bg exactly.
        alpha = np.asarray(out["rendered_alpha"])
        img = np.asarray(out["rendered_image"])
        empty = alpha < 1e-6
        assert empty.any()
        np.testing.assert_allclose(img[empty], np.broadcast_to(bg, img[empty].shape), atol=1e-6)

    def test_radii_and_visibility(self):
        means, scales, quats, opac, shs, cam = make_scene(n=100)
        # Push half behind the camera.
        means = means.at[:50, 2].set(-5.0)
        out = render(means, shs, opac, scales, quats, cam, 0, W, H)
        vis = np.asarray(out["visibility_filter"])
        assert not vis[:50].any()
        assert vis[50:].sum() > 0


class TestBackward:
    def test_grads_match_gold(self):
        means, scales, quats, opac, shs, cam = make_scene(n=120, sh_extra=True)
        target = jnp.zeros((H, W, 3)) + 0.3

        def loss_kernel(means, scales, quats, opac, shs, cam):
            out = render(means, shs, opac, scales, quats, cam, 2, W, H)
            return jnp.mean((out["rendered_image"] - target) ** 2) + 0.1 * jnp.mean(
                out["rendered_depth"]) + 0.05 * jnp.mean(out["rendered_alpha"])

        def loss_gold(means, scales, quats, opac, shs, cam):
            splats = preprocess(means, scales, quats, opac, shs, 2, cam, W, H)
            out = composite_reference(splats, W, H)
            return jnp.mean((out["rendered_image"] - target) ** 2) + 0.1 * jnp.mean(
                out["rendered_depth"]) + 0.05 * jnp.mean(out["rendered_alpha"])

        gk = jax.grad(loss_kernel, argnums=(0, 1, 2, 3, 4, 5))(
            means, scales, quats, opac, shs, cam)
        gg = jax.grad(loss_gold, argnums=(0, 1, 2, 3, 4, 5))(
            means, scales, quats, opac, shs, cam)
        names = ["means", "scales", "quats", "opac", "shs", "camera"]
        for name, a, b in zip(names[:5], gk[:5], gg[:5]):
            a, b = np.asarray(a), np.asarray(b)
            scale = np.abs(b).max() + 1e-8
            np.testing.assert_allclose(a / scale, b / scale, atol=5e-4, err_msg=name)
        # Camera pytree grads (pose!): compare leaf by leaf.
        for la, lb in zip(jax.tree.leaves(gk[5]), jax.tree.leaves(gg[5])):
            la, lb = np.asarray(la), np.asarray(lb)
            scale = np.abs(lb).max() + 1e-8
            np.testing.assert_allclose(la / scale, lb / scale, atol=5e-4)

    def test_pose_grads_nonzero(self):
        means, scales, quats, opac, shs, cam = make_scene(n=60)

        def loss(cam):
            out = render(means, shs, opac, scales, quats, cam, 0, W, H)
            return jnp.sum(out["rendered_image"])

        g = jax.grad(loss)(cam)
        assert np.abs(np.asarray(g.q_c2w)).max() > 0
        assert np.abs(np.asarray(g.t_c2w)).max() > 0

    def test_pose_grad_only_gates_cov_and_sh(self):
        """Frozen-camera fast path (VERDICT r3 #8, the reference's
        enable_cov_grad/enable_sh_grad=False gates): identical primal,
        pose grads still flow (through mean2d+depth), and the gated
        parameter paths (scaling/rotation/SH) return exactly zero."""
        means, scales, quats, opac, shs, cam = make_scene(n=60, sh_extra=True)

        def make_loss(gate):
            def loss(means, scales, quats, opac, shs, cam):
                out = render(means, shs, opac, scales, quats, cam, 2, W, H,
                             pose_grad_only=gate)
                return jnp.mean((out["rendered_image"] - 0.4) ** 2)
            return loss

        # primal unchanged
        full = float(make_loss(False)(means, scales, quats, opac, shs, cam))
        gated = float(make_loss(True)(means, scales, quats, opac, shs, cam))
        np.testing.assert_allclose(gated, full, rtol=1e-6)

        g = jax.grad(make_loss(True), argnums=(0, 1, 2, 3, 4, 5))(
            means, scales, quats, opac, shs, cam)
        # pose grads alive and finite
        for leaf in jax.tree.leaves(g[5]):
            assert np.isfinite(np.asarray(leaf)).all()
        assert np.abs(np.asarray(g[5].q_c2w)).max() > 0
        assert np.abs(np.asarray(g[5].t_c2w)).max() > 0
        # means still reach the image through mean2d
        assert np.abs(np.asarray(g[0])).max() > 0
        # gated paths are EXACT zeros: cov (scales/quats), opacity, SH
        for name, leaf in [("scales", g[1]), ("quats", g[2]),
                           ("opac", g[3]), ("shs", g[4])]:
            assert np.abs(np.asarray(leaf)).max() == 0.0, name

    def test_means2d_offset_grad_is_screen_grad(self):
        means, scales, quats, opac, shs, cam = make_scene(n=40)
        zero = jnp.zeros((2, 40))

        def loss(off):
            out = render(means, shs, opac, scales, quats, cam, 0, W, H,
                         means2d_offset=off)
            return jnp.mean((out["rendered_image"] - 0.5) ** 2)

        g = jax.grad(loss)(zero)
        assert np.isfinite(np.asarray(g)).all()
        assert np.abs(np.asarray(g)).max() > 0

    def test_finite_difference_opacity(self):
        means, scales, quats, opac, shs, cam = make_scene(n=30)

        def loss(opac):
            out = render(means, shs, opac, scales, quats, cam, 0, W, H)
            return jnp.sum(out["rendered_image"] ** 2)

        g = np.asarray(jax.grad(loss)(opac))
        eps = 1e-3
        for i in [0, 7, 19]:
            lp = float(loss(opac.at[i].add(eps)))
            lm = float(loss(opac.at[i].add(-eps)))
            fd = (lp - lm) / (2 * eps)
            np.testing.assert_allclose(g[i], fd, rtol=0.05, atol=1e-3)


class TestBinning:
    def test_fragment_counts(self):
        means, scales, quats, opac, shs, cam = make_scene(n=80)
        splats = preprocess(means, scales, quats, opac, shs, 0, cam, W, H)
        tx, ty = tile_grid(W, H)
        b = bin_splats(splats.mean2d, splats.depth, splats.radius,
                       splats.visible, tx, ty, max_fragments=1 << 15)
        assert not bool(b.overflow)
        # every real (non-dummy) slot id is < N
        gid = np.asarray(b.padded_gid)
        n = 80
        real = gid[gid < n]
        assert len(real) == int(b.num_fragments)
        # ranges are within the (chunk-rounded) sorted array
        starts = np.asarray(b.tile_starts)
        counts = np.asarray(b.tile_counts)
        assert (starts + counts <= len(gid)).all()
        assert len(gid) % 128 == 0

    def test_depth_order_within_tiles(self):
        means, scales, quats, opac, shs, cam = make_scene(n=80)
        splats = preprocess(means, scales, quats, opac, shs, 0, cam, W, H)
        tx, ty = tile_grid(W, H)
        b = bin_splats(splats.mean2d, splats.depth, splats.radius,
                       splats.visible, tx, ty, max_fragments=1 << 15)
        gid = np.asarray(b.padded_gid)
        depth = np.asarray(splats.depth)
        starts = np.asarray(b.tile_starts)
        counts = np.asarray(b.tile_counts)
        for t in range(len(starts)):
            seg = gid[starts[t]:starts[t] + counts[t]]
            assert (seg < 80).all()  # real fragments only inside ranges
            if len(seg) > 1:
                d = depth[seg]
                assert (np.diff(d) >= -1e-6).all()


class TestCompactBinning:
    """The compact fragment path (render/compact.py) vs the legacy
    broadcast-tier path — same outputs and gradients bit-for-bit on scenes
    where neither overflows, plus the whole-gaussian drop semantics."""

    def test_matches_legacy_fwd_and_bwd(self):
        means, scales, quats, opac, shs, cam = make_scene(n=250, sh_extra=True)
        # tight_rect off: this test checks the compact INDEX STRUCTURE is
        # bit-equal to the legacy path, which requires both to enumerate the
        # same (circle-rect) fragment set. TestTightRect covers the tight
        # cut's own (ulp-level) equivalence.
        kw = dict(sh_degree=3, image_width=W, image_height=H,
                  tight_rect=False)
        out_c = render(means, shs, opac, scales, quats, cam,
                       binning_mode="compact", **kw)
        out_l = render(means, shs, opac, scales, quats, cam,
                       binning_mode="legacy", **kw)
        assert not bool(out_c["overflow"])
        assert int(out_c["dropped"]) == 0
        for k in ("rendered_image", "rendered_depth", "rendered_alpha",
                  "rendered_normal"):
            np.testing.assert_array_equal(np.asarray(out_c[k]),
                                          np.asarray(out_l[k]), err_msg=k)

        target = jnp.full((H, W, 3), 0.3)

        def loss(mode, means, scales, quats, opac, shs, cam):
            out = render(means, shs, opac, scales, quats, cam,
                         binning_mode=mode, **kw)
            return (jnp.mean((out["rendered_image"] - target) ** 2)
                    + 0.1 * jnp.mean(out["rendered_depth"])
                    + 0.05 * jnp.mean(out["rendered_alpha"]))

        gc = jax.grad(functools.partial(loss, "compact"),
                      argnums=(0, 1, 2, 3, 4, 5))(
            means, scales, quats, opac, shs, cam)
        gl = jax.grad(functools.partial(loss, "legacy"),
                      argnums=(0, 1, 2, 3, 4, 5))(
            means, scales, quats, opac, shs, cam)
        for a, b in zip(jax.tree.leaves(gc), jax.tree.leaves(gl)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_drop_semantics_under_overflow(self):
        # Blow past the lean capacity (6N): big splats covering many tiles.
        means, scales, quats, opac, shs, cam = make_scene(n=120)
        scales = jnp.full_like(scales, 0.8)
        out = render(means, shs, opac, scales, quats, cam, 0, W, H,
                     fragment_profile="lean")
        assert bool(out["overflow"])
        assert int(out["dropped"]) > 0
        # dropped + kept == true demand
        assert int(out["num_fragments"]) > int(out["dropped"])
        img = np.asarray(out["rendered_image"])
        assert np.isfinite(img).all()
        # escalating the ladder until capacity fits recovers the gold image
        from rodygs_tpu.render.compact import PROFILE_LADDER, fragment_capacity
        fit = None
        for p in PROFILE_LADDER:
            if fragment_capacity(120, p) >= int(out["num_fragments"]):
                fit = p
                break
        assert fit is not None
        out_ok = render(means, shs, opac, scales, quats, cam, 0, W, H,
                        fragment_profile=fit)
        assert not bool(out_ok["overflow"])
        assert int(out_ok["dropped"]) == 0
        splats = preprocess(means, scales, quats, opac, shs, 0, cam, W, H)
        gold = composite_reference(splats, W, H)
        np.testing.assert_allclose(out_ok["rendered_image"],
                                   gold["rendered_image"], atol=2e-5)

    def test_tile_ranges_exact_vs_brute_force(self):
        from rodygs_tpu.render.compact import build_binning, fragment_capacity, tile_rect
        means, scales, quats, opac, shs, cam = make_scene(n=90, seed=5)
        splats = preprocess(means, scales, quats, opac, shs, 0, cam, W, H)
        tx, ty = tile_grid(W, H)
        cb = build_binning(splats, tx, ty, fragment_capacity(90, "huge"))
        xmin, ymin, xmax, ymax = (np.asarray(v) for v in tile_rect(
            splats.mean2d, splats.radius, tx, ty))
        vis = np.asarray(splats.visible) & (xmax > xmin) & (ymax > ymin)
        counts = np.zeros(tx * ty, np.int64)
        for g in range(90):
            if not vis[g]:
                continue
            for yy in range(ymin[g], ymax[g]):
                counts[yy * tx + xmin[g]:yy * tx + xmax[g]] += 1
        np.testing.assert_array_equal(np.asarray(cb.tile_counts), counts)
        np.testing.assert_array_equal(
            np.asarray(cb.tile_starts), np.cumsum(counts) - counts)


class TestOptionalNormalChannel:
    """include_normal=False drops the 3 normal rows from the fragment sort
    and backward unsort (no shipped loss supervises normals): every other
    channel and every gradient must be bit-identical to the full path."""

    def test_outputs_and_grads_match(self):
        means, scales, quats, opac, shs, cam = make_scene(n=200, sh_extra=True)
        kw = dict(sh_degree=3, image_width=W, image_height=H)
        out_full = render(means, shs, opac, scales, quats, cam, **kw)
        out_lite = render(means, shs, opac, scales, quats, cam,
                          include_normal=False, **kw)
        for k in ("rendered_image", "rendered_depth", "rendered_alpha"):
            np.testing.assert_array_equal(np.asarray(out_full[k]),
                                          np.asarray(out_lite[k]), err_msg=k)
        assert np.asarray(out_lite["rendered_normal"]).max() == 0.0
        assert np.abs(np.asarray(out_full["rendered_normal"])).max() > 0

        target = jnp.full((H, W, 3), 0.3)

        def loss(inc, means, scales, quats, opac, shs, cam):
            out = render(means, shs, opac, scales, quats, cam,
                         include_normal=inc, **kw)
            return (jnp.mean((out["rendered_image"] - target) ** 2)
                    + 0.1 * jnp.mean(out["rendered_depth"])
                    + 0.05 * jnp.mean(out["rendered_alpha"]))

        gf = jax.grad(functools.partial(loss, True),
                      argnums=(0, 1, 2, 3, 4, 5))(
            means, scales, quats, opac, shs, cam)
        gl = jax.grad(functools.partial(loss, False),
                      argnums=(0, 1, 2, 3, 4, 5))(
            means, scales, quats, opac, shs, cam)
        for a, b in zip(jax.tree.leaves(gf), jax.tree.leaves(gl)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestBwdUnsortModes:
    """The two backward-unsort strategies of the compact path — the stable
    sort on the presort index vs the inverse-permutation gather — must be
    numerically identical (compact.composite_compact docstring; the faster
    one is a hardware measurement, RODYGS_BWD_UNSORT)."""

    def test_gather_matches_sort(self):
        from rodygs_tpu.render.binning import tile_grid
        from rodygs_tpu.render.compact import (build_binning, build_table,
                                               composite_compact,
                                               fragment_capacity,
                                               padded_width)
        from rodygs_tpu.render.preprocess import preprocess

        means, scales, quats, opac, shs, cam = make_scene(n=200)
        tiles_x, tiles_y = tile_grid(W, H)
        splats = preprocess(means, scales, quats, opac, shs, 0, cam, W, H)
        n = splats.mean2d.shape[1]
        cb = build_binning(splats, tiles_x, tiles_y,
                           fragment_capacity(n, "lean"))
        nw = padded_width(n)
        rec13 = jnp.concatenate([
            splats.mean2d, splats.conic, splats.opacity[None, :],
            splats.rgb, splats.depth[None, :], splats.normal], axis=0)
        table = build_table(jnp.pad(rec13, ((0, 0), (0, nw - n))),
                            cb.aux_rows)
        offset = jnp.zeros((1,), jnp.int32)

        def loss(table, mode):
            out = composite_compact(table, cb.bases, cb.f_kept,
                                    cb.tile_starts, cb.tile_counts, offset,
                                    tiles_x, tiles_y, True, mode)
            return jnp.mean(out ** 2) + jnp.mean(out)

        out_s = composite_compact(table, cb.bases, cb.f_kept, cb.tile_starts,
                                  cb.tile_counts, offset, tiles_x, tiles_y,
                                  True, "sort")
        out_g = composite_compact(table, cb.bases, cb.f_kept, cb.tile_starts,
                                  cb.tile_counts, offset, tiles_x, tiles_y,
                                  True, "gather")
        np.testing.assert_array_equal(np.asarray(out_s), np.asarray(out_g))

        g_s = jax.grad(loss)(table, "sort")
        g_g = jax.grad(loss)(table, "gather")
        assert float(jnp.abs(g_s).max()) > 0  # non-degenerate
        np.testing.assert_array_equal(np.asarray(g_s), np.asarray(g_g))


class TestBf16Payload:
    """Opt-in bf16 fragment-payload packing (compact.pack_bf16_payload,
    RODYGS_BF16_RECORDS): the sort legs carry op/rgb/normal rows rounded to
    bf16 and packed in pairs. Geometry/depth rows must survive bit-exactly;
    the rendered output must stay within the documented ~2e-3 envelope of
    the f32 path (VERDICT r1 item #10 — a bandwidth lever, NOT the default:
    it intentionally breaks the 1e-5 gold-parity contract)."""

    @pytest.mark.parametrize("n_rows", [10, 13])
    def test_pack_roundtrip(self, n_rows):
        from rodygs_tpu.render.compact import (bf16_payload_rows,
                                               pack_bf16_payload,
                                               unpack_bf16_payload,
                                               _BF16_KEEP_ROWS)

        rng = np.random.default_rng(3)
        rec = jnp.asarray(
            rng.normal(0, 10.0, size=(n_rows, 256)).astype(np.float32))
        packed = pack_bf16_payload(rec)
        assert packed.shape == (bf16_payload_rows(n_rows), 256)
        assert packed.dtype == jnp.int32
        back = unpack_bf16_payload(packed, n_rows)
        ref = np.asarray(rec)
        got = np.asarray(back)
        for r in range(n_rows):
            if r in _BF16_KEEP_ROWS:
                np.testing.assert_array_equal(got[r], ref[r])  # bit-exact
            else:
                expected = np.asarray(
                    jnp.asarray(ref[r]).astype(jnp.bfloat16).astype(
                        jnp.float32))
                np.testing.assert_array_equal(got[r], expected)

    @pytest.mark.parametrize("bwd_unsort,include_normal",
                             [("sort", True), ("gather", True),
                              ("sort", False)])
    def test_render_close_to_f32_path(self, bwd_unsort, include_normal,
                                      monkeypatch):
        import rodygs_tpu.render.rasterize as R

        monkeypatch.setattr(R, "_BWD_UNSORT", bwd_unsort)
        means, scales, quats, opac, shs, cam = make_scene(n=250, sh_extra=True)

        def run(bf16):
            def loss_fn(means, opac):
                out = render(means, shs, opac, scales, quats, cam, 3, W, H,
                             bf16_records=bf16,
                             include_normal=include_normal)
                img = out["rendered_image"]
                return (jnp.mean(img ** 2)
                        + 0.1 * jnp.mean(out["rendered_depth"])), img

            (l, img), g = jax.value_and_grad(
                loss_fn, argnums=(0, 1), has_aux=True)(means, opac)
            return img, g

        img32, g32 = run(False)
        img16, g16 = run(True)
        # forward: documented ~2e-3 envelope
        assert float(jnp.abs(img16 - img32).max()) < 1e-2
        # gradients: bf16 rounding of the payload + gradient rows; compare
        # per-tensor against the f32 gradient scale
        for a, b in zip(jax.tree.leaves(g16), jax.tree.leaves(g32)):
            scale = max(float(jnp.abs(b).max()), 1e-6)
            assert float(jnp.abs(a - b).max()) / scale < 3e-2
        assert float(jnp.abs(jax.tree.leaves(g16)[0]).max()) > 0


class TestFwdRecordsModes:
    """The two forward record-carry strategies — rows riding the fragment
    sort vs a post-sort permutation gather — must be bit-identical
    (compact.composite_compact fwd_records; RODYGS_FWD_RECORDS A/B knob)."""

    def test_gather_matches_sort(self):
        from rodygs_tpu.render.binning import tile_grid
        from rodygs_tpu.render.compact import (build_binning, build_table,
                                               composite_compact,
                                               fragment_capacity,
                                               padded_width)
        from rodygs_tpu.render.preprocess import preprocess

        means, scales, quats, opac, shs, cam = make_scene(n=200)
        tiles_x, tiles_y = tile_grid(W, H)
        splats = preprocess(means, scales, quats, opac, shs, 0, cam, W, H)
        n = splats.mean2d.shape[1]
        cb = build_binning(splats, tiles_x, tiles_y,
                           fragment_capacity(n, "lean"))
        nw = padded_width(n)
        rec13 = jnp.concatenate([
            splats.mean2d, splats.conic, splats.opacity[None, :],
            splats.rgb, splats.depth[None, :], splats.normal], axis=0)
        table = build_table(jnp.pad(rec13, ((0, 0), (0, nw - n))),
                            cb.aux_rows)
        offset = jnp.zeros((1,), jnp.int32)

        def run(fwd_mode):
            def loss(table):
                out = composite_compact(table, cb.bases, cb.f_kept,
                                        cb.tile_starts, cb.tile_counts,
                                        offset, tiles_x, tiles_y, True,
                                        "sort", False, fwd_mode)
                return jnp.mean(out ** 2), out

            (l, out), g = jax.value_and_grad(loss, has_aux=True)(table)
            return out, g

        out_s, g_s = run("sort")
        out_g, g_g = run("gather")
        np.testing.assert_array_equal(np.asarray(out_s), np.asarray(out_g))
        assert float(jnp.abs(g_s).max()) > 0
        np.testing.assert_array_equal(np.asarray(g_s), np.asarray(g_g))


class TestColorsPrecomp:
    """colors_precomp bypasses SH evaluation (reference rasterizer contract:
    exactly one of shs/colors_precomp drives the color). For colors in [0,1],
    passing rgb2sh(c) at degree 0 and passing c precomputed must agree."""

    def test_matches_sh0(self):
        means, scales, quats, opac, shs, cam = make_scene(n=80)
        cols = jnp.clip(jnp.asarray(np.asarray(shs[:, 0])) * 0.28209479177387814 + 0.5,
                        0.0, 1.0)
        out_sh = render(means, shs, opac, scales, quats, cam, 0, W, H)
        out_pc = render(means, shs, opac, scales, quats, cam, 0, W, H,
                        colors_precomp=cols)
        np.testing.assert_allclose(np.asarray(out_pc["rendered_image"]),
                                   np.asarray(out_sh["rendered_image"]),
                                   atol=1e-5)


class TestTightRect:
    """Tight alpha-cut fragment rects (compact.tight_tile_rect): the binning
    intersects each gaussian's circle rect with the AABB of its
    alpha >= 1/255 ellipse. Every excluded fragment is one the compositor
    skips exactly (alpha threshold), so forward AND backward match the
    loose (reference circle-rect) binning to fp-summation-order noise (the
    transmittance prefix repacks into different 128-lane chunks, so sums
    re-associate at the ulp level) while the fragment demand strictly drops
    on anisotropic / low-opacity scenes."""

    @staticmethod
    def _aniso_scene(n=200, seed=3):
        rng = np.random.default_rng(seed)
        means = rng.uniform([-1.5, -1.0, 2.0], [1.5, 1.0, 6.0],
                            size=(n, 3)).astype(np.float32)
        # strongly anisotropic: one long axis, two short
        scales = np.exp(rng.uniform(-3.5, -3.0, size=(n, 3))).astype(np.float32)
        scales[:, 0] *= np.exp(rng.uniform(1.0, 2.0, size=(n,))).astype(np.float32)
        quats = rng.normal(size=(n, 4)).astype(np.float32)
        quats /= np.linalg.norm(quats, axis=1, keepdims=True)
        # include low opacities (post-reset regime) and a few below 1/255
        opac = rng.uniform(0.003, 0.5, size=(n,)).astype(np.float32)
        opac[: n // 8] = rng.uniform(1e-4, 3e-3, size=(n // 8,)).astype(np.float32)
        k = 4
        shs = np.zeros((n, k, 3), dtype=np.float32)
        shs[:, 0] = np.asarray(
            rgb2sh(rng.uniform(0.1, 0.9, size=(n, 3)).astype(np.float32)))
        cam = make_camera([1.0, 0.0, 0.0, 0.0], [0.0, 0.0, 0.0], 0.9, 0.7, 0.0)
        return (jnp.asarray(means), jnp.asarray(scales), jnp.asarray(quats),
                jnp.asarray(opac), jnp.asarray(shs), cam)

    def test_bit_identical_and_fewer_fragments(self):
        means, scales, quats, opac, shs, cam = self._aniso_scene()
        target = jnp.linspace(0.0, 1.0, H * W * 3).reshape(H, W, 3)

        def run(tight):
            def loss(args):
                means, scales, quats, opac, shs = args
                out = render(means, shs, opac, scales, quats, cam, 1, W, H,
                             tight_rect=tight)
                l = (jnp.mean((out["rendered_image"] - target) ** 2)
                     + 0.1 * jnp.mean(out["rendered_depth"])
                     + 0.05 * jnp.mean(out["rendered_alpha"]))
                return l, out
            (l, out), g = jax.value_and_grad(loss, has_aux=True)(
                (means, scales, quats, opac, shs))
            return out, g

        out_t, g_t = run(True)
        out_l, g_l = run(False)
        assert not bool(out_l["overflow"]) and not bool(out_t["overflow"])
        for ch in ("rendered_image", "rendered_depth", "rendered_normal",
                   "rendered_alpha"):
            np.testing.assert_allclose(
                np.asarray(out_t[ch]), np.asarray(out_l[ch]), atol=1e-6,
                err_msg=ch)
        for a, b in zip(jax.tree.leaves(g_t), jax.tree.leaves(g_l)):
            a, b = np.asarray(a), np.asarray(b)
            scale = np.abs(b).max() + 1e-8
            np.testing.assert_allclose(a / scale, b / scale, atol=5e-6)
        # radii/visibility contract unchanged (densify stats depend on it)
        np.testing.assert_array_equal(np.asarray(out_t["radii"]),
                                      np.asarray(out_l["radii"]))
        # the whole point: strictly fewer fragments enumerated
        ft = int(out_t["num_fragments"])
        fl = int(out_l["num_fragments"])
        assert ft < fl, (ft, fl)
        # anisotropic + low-op scene: expect a substantial cut, not epsilon
        assert ft < 0.7 * fl, (ft, fl)

    def test_matches_gold(self):
        """Tight mode vs the independent per-pixel gold compositor."""
        means, scales, quats, opac, shs, cam = self._aniso_scene(n=120, seed=5)
        from rodygs_tpu.render.preprocess import preprocess as pp
        splats = pp(means, scales, quats, opac, shs, 1, cam, W, H)
        gold = composite_reference(splats, W, H)
        out = render(means, shs, opac, scales, quats, cam, 1, W, H,
                     tight_rect=True)
        np.testing.assert_allclose(
            out["rendered_image"], gold["rendered_image"], atol=2e-5)
        np.testing.assert_allclose(
            out["rendered_alpha"], gold["rendered_alpha"], atol=2e-5)

    def test_subthreshold_opacity_emits_nothing(self):
        """Gaussians with opacity <= 1/255 can never pass the alpha test;
        tight rects collapse them to (at most) a single skipped fragment."""
        means, scales, quats, opac, shs, cam = make_scene(n=60)
        tiny = jnp.full_like(opac, 1.0 / 300.0)
        out_t = render(means, shs, tiny, scales, quats, cam, 0, W, H,
                       tight_rect=True)
        out_l = render(means, shs, tiny, scales, quats, cam, 0, W, H,
                       tight_rect=False)
        np.testing.assert_array_equal(np.asarray(out_t["rendered_image"]),
                                      np.asarray(out_l["rendered_image"]))
        assert float(jnp.abs(out_t["rendered_alpha"]).max()) == 0.0
        assert int(out_t["num_fragments"]) <= means.shape[0]


class TestRowSpans:
    """tight_rect="rows": exact per-tile-row ellipse spans. Same exclusion
    argument as the AABB (every cut fragment has alpha < 1/255, skipped
    exactly by the compositor), so forward/backward match the loose binning
    to fp-summation-order noise while cutting strictly more fragments than
    the AABB mode."""

    def test_matches_loose_and_cuts_more(self):
        means, scales, quats, opac, shs, cam = TestTightRect._aniso_scene()
        target = jnp.linspace(0.0, 1.0, H * W * 3).reshape(H, W, 3)

        def run(tight):
            def loss(args):
                means, scales, quats, opac, shs = args
                out = render(means, shs, opac, scales, quats, cam, 1, W, H,
                             tight_rect=tight)
                l = (jnp.mean((out["rendered_image"] - target) ** 2)
                     + 0.1 * jnp.mean(out["rendered_depth"])
                     + 0.05 * jnp.mean(out["rendered_alpha"]))
                return l, out
            (l, out), g = jax.value_and_grad(loss, has_aux=True)(
                (means, scales, quats, opac, shs))
            return out, g

        out_r, g_r = run("rows")
        out_a, _ = run(True)
        out_l, g_l = run(False)
        assert not bool(out_r["overflow"])
        for ch in ("rendered_image", "rendered_depth", "rendered_normal",
                   "rendered_alpha"):
            np.testing.assert_allclose(
                np.asarray(out_r[ch]), np.asarray(out_l[ch]), atol=1e-6,
                err_msg=ch)
        for a, b in zip(jax.tree.leaves(g_r), jax.tree.leaves(g_l)):
            a, b = np.asarray(a), np.asarray(b)
            scale = np.abs(b).max() + 1e-8
            np.testing.assert_allclose(a / scale, b / scale, atol=5e-6)
        fr = int(out_r["num_fragments"])
        fa = int(out_a["num_fragments"])
        fl = int(out_l["num_fragments"])
        assert fr < fa < fl, (fr, fa, fl)

    def test_matches_gold_large_blobs(self):
        """Bigger, overlapping, diagonal splats (span up to many tiles —
        exercises both the per-row path and the tall-rect fallback)."""
        rng = np.random.default_rng(9)
        n = 80
        means = rng.uniform([-1.0, -0.8, 1.5], [1.0, 0.8, 4.0],
                            size=(n, 3)).astype(np.float32)
        scales = np.exp(rng.uniform(-2.6, -1.2, size=(n, 3))).astype(np.float32)
        scales[:, 0] *= np.exp(rng.uniform(0.5, 1.5, size=(n,))).astype(np.float32)
        quats = rng.normal(size=(n, 4)).astype(np.float32)
        quats /= np.linalg.norm(quats, axis=1, keepdims=True)
        opac = rng.uniform(0.05, 0.99, size=(n,)).astype(np.float32)
        shs = np.zeros((n, 4, 3), dtype=np.float32)
        shs[:, 0] = np.asarray(
            rgb2sh(rng.uniform(0.1, 0.9, size=(n, 3)).astype(np.float32)))
        cam = make_camera([1.0, 0.0, 0.0, 0.0], [0.0, 0.0, 0.0], 0.9, 0.7, 0.0)
        means, scales, quats, opac, shs = map(
            jnp.asarray, (means, scales, quats, opac, shs))
        splats = preprocess(means, scales, quats, opac, shs, 1, cam, W, H)
        gold = composite_reference(splats, W, H)
        out = render(means, shs, opac, scales, quats, cam, 1, W, H,
                     tight_rect="rows", fragment_profile="huge")
        assert not bool(out["overflow"])
        np.testing.assert_allclose(
            out["rendered_image"], gold["rendered_image"], atol=2e-5)
        np.testing.assert_allclose(
            out["rendered_alpha"], gold["rendered_alpha"], atol=2e-5)
        np.testing.assert_allclose(
            out["rendered_depth"], gold["rendered_depth"], atol=2e-4)

    def test_drop_semantics_under_overflow(self):
        """Capacity clamp with rows mode: exact dropped counts, no NaNs."""
        means, scales, quats, opac, shs, cam = TestTightRect._aniso_scene(n=500)
        out = render(means, shs, opac, scales, quats, cam, 1, W, H,
                     tight_rect="rows", fragment_profile=512)
        assert bool(out["overflow"])
        assert int(out["dropped"]) > 0
        assert np.isfinite(np.asarray(out["rendered_image"])).all()


class TestSortBands:
    """Banded fragment sort (compact.build_binning bands>1 /
    render(sort_bands=)): per-band independent sorts over balanced tile-row
    ranges must reproduce the bands=1 structure — identical per-tile
    fragment sets in identical depth order (images ~1 ulp: only 128-lane
    compositing-chunk boundaries move), identical demand diagnostics, and
    matching gradients. scripts/sort_microbench3.py measured the on-chip
    win this buys (one 5.76M sort = 64.5 ms vs 4 x 1.24M = 42.6 ms)."""

    @pytest.mark.parametrize("tight", [True, "rows", False])
    def test_matches_unbanded(self, tight):
        means, scales, quats, opac, shs, cam = make_scene(n=400, sh_extra=True)
        o1 = render(means, shs, opac, scales, quats, cam, 3, W, H,
                    tight_rect=tight, sort_bands=1, fragment_profile="wide")
        o3 = render(means, shs, opac, scales, quats, cam, 3, W, H,
                    tight_rect=tight, sort_bands=3, fragment_profile="wide")
        assert not bool(o3["overflow"])
        assert int(o1["num_fragments"]) == int(o3["num_fragments"])
        np.testing.assert_allclose(o1["rendered_image"],
                                   o3["rendered_image"], atol=2e-6)
        np.testing.assert_allclose(o1["rendered_depth"],
                                   o3["rendered_depth"], atol=2e-5)
        np.testing.assert_allclose(o1["rendered_alpha"],
                                   o3["rendered_alpha"], atol=2e-6)

    def test_grads_match_unbanded(self):
        means, scales, quats, opac, shs, cam = make_scene(n=300)

        def loss(bands, means, scales, quats, opac, shs):
            o = render(means, shs, opac, scales, quats, cam, 0, W, H,
                       tight_rect="rows", sort_bands=bands,
                       fragment_profile="wide")
            return (o["rendered_image"].sum()
                    + 0.1 * o["rendered_depth"].sum()
                    + 0.3 * o["rendered_alpha"].sum())

        args = (means, scales, quats, opac, shs)
        g1 = jax.grad(functools.partial(loss, 1),
                      argnums=(0, 1, 2, 3, 4))(*args)
        g3 = jax.grad(functools.partial(loss, 3),
                      argnums=(0, 1, 2, 3, 4))(*args)
        for a, b in zip(g1, g3):
            scale = max(float(jnp.abs(a).max()), 1.0)
            np.testing.assert_allclose(a / scale, b / scale, atol=3e-6)

    def test_pose_grads_match_unbanded(self):
        means, scales, quats, opac, shs, cam = make_scene(n=200)

        def loss(bands, cam):
            o = render(means, shs, opac, scales, quats, cam, 0, W, H,
                       sort_bands=bands, fragment_profile="wide")
            return o["rendered_image"].sum()

        g1 = jax.grad(functools.partial(loss, 1))(cam)
        g3 = jax.grad(functools.partial(loss, 3))(cam)
        np.testing.assert_allclose(g1.q_c2w, g3.q_c2w, rtol=0, atol=1e-4)
        np.testing.assert_allclose(g1.t_c2w, g3.t_c2w, rtol=0, atol=1e-4)

    def test_overflow_per_band_semantics(self):
        """A banded render at starved capacity drops whole gaussians per
        band with exact counts and finite output."""
        means, scales, quats, opac, shs, cam = make_scene(n=300)
        scales = jnp.full_like(scales, 0.8)
        out = render(means, shs, opac, scales, quats, cam, 0, W, H,
                     sort_bands=3, fragment_profile=1536)
        assert bool(out["overflow"])
        assert int(out["dropped"]) > 0
        assert np.isfinite(np.asarray(out["rendered_image"])).all()

    def test_band_capacity_math(self):
        from rodygs_tpu.render.compact import (bands_decision, fit_capacity,
                                               fragment_capacity,
                                               join_profile,
                                               profile_for_demand,
                                               split_profile)
        # structural floor scales with bands
        assert fit_capacity(1000, 50_000, bands=4) >= 4 * 1000 + 50_000
        # a banded floor big enough to cross a 1.5-grid step grows the fit
        assert fit_capacity(20_000, 50_000, bands=1) < fit_capacity(
            20_000, 50_000, bands=4)
        # escalation accounts for the banded floor
        p1 = profile_for_demand(1000, 4_000, "lean", bands=1)
        p4 = profile_for_demand(1000, 4_000, "lean", bands=4)
        assert p1 is None          # 6N lean covers 1.25 x 4k real
        assert p4 is not None      # but not with the 4k banded floor
        # (profile, bands) tuples round-trip and don't change capacity
        assert split_profile(("huge", 3)) == ("huge", 3)
        assert split_profile(["huge", 3]) == ("huge", 3)   # JSON round-trip
        assert split_profile("huge") == ("huge", 1)
        assert join_profile("huge", 1) == "huge"
        assert join_profile("huge", 3) == ("huge", 3)
        assert (fragment_capacity(240_000, ("huge", 3))
                == fragment_capacity(240_000, "huge"))
        # demand-driven band decision: the 1080p bench state (240k store,
        # huge=5.76M capacity, 4.72M real demand) upgrades to 2 bands with
        # the 10% headroom margin (3 bands only clears the 3% keep margin);
        # small extents and floor-dominated states stay unbanded
        assert bands_decision(240_000, 5_760_000, 4_718_876) == 2
        from rodygs_tpu.render.compact import bands_viable
        assert bands_viable(240_000, 5_760_000, 4_718_876, 3)
        assert bands_decision(100_000, 720_000, 500_000) == 1
        assert bands_decision(262_144, 1_841_152, 1_200_000) == 1

    def test_poller_picks_bands_and_recovers(self):
        """EscalationPoller: the steady-state fit carries a band count, a
        banded overflow whose demand still fits drops bands before growing
        capacity, and band-only adjustments need 2-poll agreement."""
        from rodygs_tpu.render.compact import fit_capacity
        from rodygs_tpu.train.trainer_static import EscalationPoller

        n = 240_000
        m = lambda demand, ovf=False: {  # noqa: E731
            "num_fragments": demand, "overflow": ovf}
        # settled state with headroom: bands-only upgrade, 2-poll agreement
        p = EscalationPoller()
        p._initial_fit_pending = False
        assert p.poll(125, m(4_000_000), n, "huge") is None
        assert p.poll(150, m(4_000_000), n, "huge") == ("huge", 4)
        # banded overflow: drop to the largest still-viable band count
        # (demand 5.4M leaves no 2-band headroom at huge -> unbanded)
        p = EscalationPoller()
        p._initial_fit_pending = False
        got = p.poll(125, m(5_400_000, ovf=True), n, ("huge", 3))
        assert got == "huge"
        # a viability loss without overflow downgrades IMMEDIATELY
        p = EscalationPoller()
        p._initial_fit_pending = False
        p.poll(125, m(5_500_000), n, ("huge", 3))
        got = p.poll(150, m(5_500_000), n, ("huge", 3))
        assert got == "huge"
        # band-only upgrade over an explicit fitted capacity
        p = EscalationPoller()
        p._initial_fit_pending = False
        cap = fit_capacity(n, 4_000_000)
        assert p.poll(125, m(4_000_000), n, cap) is None
        got = p.poll(150, m(4_000_000), n, cap)
        assert got == (cap, 3)
        # no thrash: at the upgraded state the keep-margin holds, and the
        # upgrade margin no longer asks for more
        p2 = EscalationPoller()
        p2._initial_fit_pending = False
        assert p2.poll(125, m(4_000_000), n, (cap, 3)) is None
        assert p2.poll(150, m(4_000_000), n, (cap, 3)) is None
