"""Stage-2b (NSR) unit tests: hash encoding, SDF field init/gradients, NeuS
alpha math vs closed form, sampling, cameras, and a short end-to-end
convergence check on a synthetic sphere."""

import pytest as _pytest_mark

pytestmark = _pytest_mark.mark.slow

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from drawingspinup_tpu.models.fields import (
    MLPConfig, RadianceConfig, SDFFieldConfig, init_sdf_field, init_variance,
    inv_s, sdf_forward, sdf_with_grad,
)
from drawingspinup_tpu.models.hashgrid import (
    HashGridConfig, encode, finite_difference_eps, init_table,
    progressive_mask,
)
from drawingspinup_tpu.render import neus
from drawingspinup_tpu.render.cameras import (
    VIEW_AZIMUTHS_DEG, opengl_to_opencv, ortho_ray_grid, rays_to_world,
    view_matrices, w2c_opengl,
)
from drawingspinup_tpu.train import losses as L
from drawingspinup_tpu.train import nsr

TINY_GRID = HashGridConfig(n_levels=4, log2_hashmap_size=12,
                           base_resolution=4, per_level_scale=1.5,
                           start_level=4, update_steps=100)


class TestHashGrid:
    def test_interpolation_continuity(self, rng):
        cfg = TINY_GRID
        table = tuple(t * 1e4 for t in
                      init_table(cfg, jax.random.PRNGKey(0)))  # amplify
        x = jnp.asarray(rng.random((32, 3)).astype(np.float32))
        e1 = encode(table, x, cfg)
        e2 = encode(table, x + 1e-5, cfg)
        assert np.abs(np.asarray(e1 - e2)).max() < 1e-2  # continuous

    def test_include_xyz(self, rng):
        cfg = TINY_GRID
        table = init_table(cfg, jax.random.PRNGKey(0))
        x = jnp.asarray(rng.random((8, 3)).astype(np.float32))
        out = encode(table, x, cfg)
        assert out.shape == (8, cfg.n_output_dims)
        np.testing.assert_allclose(np.asarray(out[:, :3]),
                                   np.asarray(x) * 2 - 1, atol=1e-6)

    def test_progressive_mask(self):
        cfg = TINY_GRID  # start_level=4 == n_levels → all active at step 0
        m = np.asarray(progressive_mask(cfg, jnp.asarray(0)))
        assert m.sum() == 4
        cfg2 = dataclasses.replace(cfg, start_level=2)
        m2 = np.asarray(progressive_mask(cfg2, jnp.asarray(0)))
        assert m2.tolist() == [1, 1, 0, 0]
        m3 = np.asarray(progressive_mask(cfg2, jnp.asarray(150)))
        assert m3.tolist() == [1, 1, 1, 0]

    def test_fd_eps_progressive(self):
        cfg = dataclasses.replace(TINY_GRID, start_level=2)
        e0 = float(finite_difference_eps(cfg, jnp.asarray(0)))
        e2 = float(finite_difference_eps(cfg, jnp.asarray(250)))
        assert e2 < e0  # eps shrinks as levels activate

    def test_n_active_gating_matches_mask(self, rng):
        """Static level gating (gathers elided) ≡ multiplying by the band
        mask — for both encode and the spatial-jacobian path, values AND
        table gradients."""
        from drawingspinup_tpu.models.hashgrid import encode_with_spatial_grad
        cfg = dataclasses.replace(TINY_GRID, start_level=2)
        table = init_table(cfg, jax.random.PRNGKey(0))
        x = jnp.asarray(rng.random((32, 3)).astype(np.float32))
        for step in (0, 150):
            mask = progressive_mask(cfg, jnp.asarray(step))
            n_act = cfg.current_level(step)
            e_mask = encode(table, x, cfg, mask)
            e_gate = encode(table, x, cfg, mask, n_active=n_act)
            np.testing.assert_allclose(np.asarray(e_mask),
                                       np.asarray(e_gate), atol=1e-7)
            em, dm = encode_with_spatial_grad(table, x, cfg, mask)
            eg, dg = encode_with_spatial_grad(table, x, cfg, mask,
                                              n_active=n_act)
            np.testing.assert_allclose(np.asarray(em), np.asarray(eg),
                                       atol=1e-7)
            np.testing.assert_allclose(np.asarray(dm), np.asarray(dg),
                                       atol=1e-7)
            g_mask = jax.grad(lambda t: jnp.sum(
                encode(t, x, cfg, mask) ** 2))(table)
            g_gate = jax.grad(lambda t: jnp.sum(
                encode(t, x, cfg, mask, n_active=n_act) ** 2))(table)
            for gm, gg in zip(g_mask, g_gate):
                np.testing.assert_allclose(np.asarray(gm), np.asarray(gg),
                                           atol=1e-7)

    def test_dense_cell_rows_equivalence(self, rng):
        """Widened (8F)-cell-row dense path == per-corner path: encode is
        bit-equal, interior spatial jacobian bit-equal, f32 table grads
        equal to roundoff. (At coordinates exactly 1.0 the wide path keeps
        the correct one-sided slope where the narrow one degenerates — a
        measure-zero difference, excluded here.)"""
        from drawingspinup_tpu.models.hashgrid import encode_with_spatial_grad
        cfg_w = dataclasses.replace(TINY_GRID, dense_cell_rows=True)
        cfg_n = dataclasses.replace(TINY_GRID, dense_cell_rows=False)
        tab = init_table(cfg_w, jax.random.PRNGKey(0))
        x = jnp.asarray(rng.random((257, 3)) * 0.999, jnp.float32)
        np.testing.assert_array_equal(np.asarray(encode(tab, x, cfg_w)),
                                      np.asarray(encode(tab, x, cfg_n)))
        ea, da = encode_with_spatial_grad(tab, x, cfg_w)
        eb, db = encode_with_spatial_grad(tab, x, cfg_n)
        np.testing.assert_array_equal(np.asarray(ea), np.asarray(eb))
        np.testing.assert_array_equal(np.asarray(da), np.asarray(db))

        def loss(t, c):
            return (encode(t, x, c) ** 2).sum()

        ga, gb = jax.grad(loss)(tab, cfg_w), jax.grad(loss)(tab, cfg_n)
        for p, q in zip(ga, gb):
            np.testing.assert_allclose(np.asarray(p), np.asarray(q),
                                       atol=1e-6)

    def test_dense_max_rows_extends_dense_levels(self, rng):
        """dense_max_rows lets levels larger than table_size store dense:
        tables size to (r+1)³, encoding stays continuous, and the value is
        interpolation-exact at grid corners (no hash collisions)."""
        cfg = dataclasses.replace(TINY_GRID, log2_hashmap_size=9,
                                  dense_max_rows=1 << 22)
        res = cfg.level_resolutions()           # 4, 6, 9, 13
        assert (int(res[-1]) + 1) ** 3 > cfg.table_size  # would hash in tcnn
        tab = init_table(cfg, jax.random.PRNGKey(0))
        assert tab[-1].shape[0] == (int(res[-1]) + 1) ** 3
        # corner exactness on the finest level: encode at a lattice point
        # returns that corner's stored feature
        r = int(res[-1])
        corner = np.array([[2 / r, 3 / r, 5 / r]], np.float32)
        out = encode(tab, jnp.asarray(corner), cfg)
        idx = 2 + (r + 1) * (3 + (r + 1) * 5)
        np.testing.assert_allclose(
            np.asarray(out[0, 3 + 3 * cfg.n_features_per_level:
                           3 + 4 * cfg.n_features_per_level]),
            np.asarray(tab[-1][idx]), atol=1e-7)
        # tcnn layout (dense_max_rows=0) hashes that level instead
        cfg0 = dataclasses.replace(cfg, dense_max_rows=0)
        tab0 = init_table(cfg0, jax.random.PRNGKey(0))
        assert tab0[-1].shape[0] == cfg.table_size

    def test_grad_matches_autodiff_dense_region(self, rng):
        """FD gradient ≈ autodiff gradient for smooth (dense-grid) encoding."""
        cfg = SDFFieldConfig(grid=TINY_GRID)
        params = init_sdf_field(cfg, jax.random.PRNGKey(0))
        x = jnp.asarray((rng.random((16, 3)) * 1.2 - 0.6).astype(np.float32))
        sdf, grad, feat = sdf_with_grad(cfg, params, x, eps=1e-3)
        auto = jax.vmap(jax.grad(
            lambda p: sdf_forward(cfg, params, p[None])[0][0]))(x)
        # sphere-init SDF is smooth; FD with small eps ≈ autodiff
        np.testing.assert_allclose(np.asarray(grad), np.asarray(auto),
                                   atol=2e-2)


class TestSphereInit:
    def test_sdf_approximates_sphere(self, rng):
        cfg = SDFFieldConfig(grid=TINY_GRID)
        params = init_sdf_field(cfg, jax.random.PRNGKey(0))
        pts = (rng.random((256, 3)) * 2 - 1).astype(np.float32)
        sdf, _ = sdf_forward(cfg, params, jnp.asarray(pts))
        r = np.linalg.norm(pts, axis=-1)
        # sphere init: sdf ≈ |x| - 0.5 up to scale; check sign agreement
        inside, outside = r < 0.35, r > 0.75
        sdf = np.asarray(sdf)
        assert (sdf[inside] < 0).mean() > 0.9
        assert (sdf[outside] > 0).mean() > 0.9


class TestNeusMath:
    def test_alpha_closed_form(self):
        """Alpha for head-on ray (cos=-1, anneal=1) matches the NeuS paper
        formula max((Φ(prev)−Φ(next))/Φ(prev), 0)."""
        sdf = jnp.asarray([[0.1, 0.02, -0.05]])
        normal = jnp.asarray([[[0, 0, -1.0]]] * 1).reshape(1, 1, 3)
        normal = jnp.broadcast_to(normal, (1, 3, 3))
        dirs = jnp.broadcast_to(jnp.asarray([0, 0, 1.0]), (1, 3, 3))
        dists = jnp.full((1, 3), 0.07)
        a = neus.neus_alpha(sdf, normal, dirs, dists, jnp.asarray(20.0),
                            jnp.asarray(1.0))

        def phi(x):
            return 1 / (1 + np.exp(-x * 20.0))

        prev = phi(np.asarray(sdf) + 0.5 * 0.07)
        nxt = phi(np.asarray(sdf) - 0.5 * 0.07)
        expect = np.clip((prev - nxt + 1e-5) / (prev + 1e-5), 0, 1)
        np.testing.assert_allclose(np.asarray(a), expect, atol=1e-5)

    def test_composite_opaque_surface(self):
        alpha = jnp.asarray([[0.0, 1.0, 0.5]])
        vals = {"rgb": jnp.asarray([[[1., 0, 0], [0, 1., 0], [0, 0, 1.]]])}
        out = neus.composite(alpha, vals)
        np.testing.assert_allclose(np.asarray(out["comp_rgb"]),
                                   [[0, 1.0, 0]], atol=1e-6)
        assert float(out["opacity"][0, 0]) == pytest.approx(1.0, abs=1e-6)

    def test_aabb(self):
        o = jnp.asarray([[0., 0, -2], [3., 3, -2]])
        d = jnp.asarray([[0., 0, 1], [0., 0, 1]])
        tn, tf = neus.aabb_intersect(o, d, 1.0)
        assert float(tn[0]) == pytest.approx(1.0) and float(tf[0]) == pytest.approx(3.0)
        assert float(tf[1]) <= float(tn[1])  # miss

    def test_sample_pdf_concentrates(self):
        t = jnp.linspace(0, 1, 16)[None].repeat(2, 0)
        w = jnp.zeros((2, 16)).at[:, 8].set(10.0)
        s = neus.sample_pdf(None, t, w, 32, randomized=False)
        med = np.median(np.asarray(s))
        assert abs(med - float(t[0, 8])) < 0.1


class TestCameras:
    def test_front_matches_reference_convention(self):
        rt = w2c_opengl("front")
        np.testing.assert_allclose(rt[0], [1, 0, 0, 0], atol=1e-6)
        np.testing.assert_allclose(rt[1], [0, 0, 1, 0], atol=1e-6)
        np.testing.assert_allclose(rt[2], [0, -1, 0, -1.3], atol=1e-6)

    def test_right_matches_reference_convention(self):
        rt = w2c_opengl("right")
        np.testing.assert_allclose(rt[0], [0, 1, 0, 0], atol=1e-6)
        np.testing.assert_allclose(rt[2], [1, 0, 0, -1.3], atol=1e-6)

    def test_front_rays_look_along_world_y(self):
        c2ws, _ = view_matrices(["front"])
        o, d = ortho_ray_grid(4, 4)
        ro, rd = rays_to_world(o.reshape(-1, 3), d.reshape(-1, 3), c2ws[0])
        np.testing.assert_allclose(rd, np.tile([[0, 1, 0]], (16, 1)),
                                   atol=1e-6)
        assert ro[:, 1].min() == pytest.approx(-1.3, abs=1e-6)


class TestLosses:
    def test_ranking_keeps_smallest(self):
        err = jnp.asarray([5.0, 1.0, 2.0, 100.0])
        out = float(L.ranking_loss(err, penalize_ratio=0.5))
        assert out == pytest.approx((1.0 + 2.0) / 2)

    def test_ranking_masked(self):
        err = jnp.asarray([5.0, 1.0, 2.0, 0.001])
        mask = jnp.asarray([1.0, 1.0, 1.0, 0.0])
        out = float(L.ranking_loss(err, penalize_ratio=0.67, mask=mask))
        assert out == pytest.approx((1.0 + 2.0) / 2)

    def test_bce_stable(self):
        v = float(L.binary_cross_entropy(jnp.asarray(0.0), jnp.asarray(1.0)))
        assert np.isfinite(v)


def make_sphere_dataset(n_views=4, size=32, radius=0.5):
    """Analytic ortho renders of a matte colored sphere."""
    from drawingspinup_tpu.core import VIEWS
    views = list(VIEWS[:n_views])
    c2ws, _ = view_matrices(views)
    origins, dirs = ortho_ray_grid(size, size)
    images, normals, masks = [], [], []
    for c2w in c2ws:
        ro, rd = rays_to_world(origins.reshape(-1, 3), dirs.reshape(-1, 3), c2w)
        # ray-sphere: |o + t d| = radius
        b = np.sum(ro * rd, -1)
        c = np.sum(ro * ro, -1) - radius ** 2
        disc = b * b - c
        hit = disc > 0
        t = -b - np.sqrt(np.maximum(disc, 0))
        p = ro + t[:, None] * rd
        n = p / radius
        col = np.clip(0.5 + 0.5 * n, 0, 1)
        img = np.where(hit[:, None], col, 0.0).reshape(size, size, 3)
        nrm = np.where(hit[:, None], n, 0.0).reshape(size, size, 3)
        images.append(img)
        normals.append(nrm)
        masks.append(hit.reshape(size, size).astype(np.float32))
    return {
        "images": jnp.asarray(np.stack(images), jnp.float32),
        "normals": jnp.asarray(np.stack(normals), jnp.float32),
        "masks": jnp.asarray(np.stack(masks), jnp.float32),
        "view_weights": jnp.ones((n_views,), jnp.float32),
        "c2w": jnp.asarray(c2ws, jnp.float32),
    }


TINY_NSR = nsr.NSRConfig(
    sdf=SDFFieldConfig(grid=TINY_GRID,
                       mlp=MLPConfig(n_neurons=32, n_hidden_layers=1,
                                     sphere_init=True, weight_norm=True)),
    radiance=RadianceConfig(mlp=MLPConfig(n_neurons=32, n_hidden_layers=1,
                                          output_activation="sigmoid")),
    train_num_rays=128, n_coarse=24, n_fine=24, n_random_pts=128,
    max_steps=60, constant_steps=20, cos_anneal_end=100,
)


class TestTrainStep:
    def test_loss_decreases_on_sphere(self):
        data = make_sphere_dataset()
        cfg = TINY_NSR
        tx = nsr.make_optimizer(cfg)
        state = nsr.init_state(cfg, jax.random.PRNGKey(0))
        key = jax.random.PRNGKey(1)
        first = None
        for i in range(60):
            key, k = jax.random.split(key)
            state, logs = nsr.train_step(cfg, tx, state, data, k)
            if i == 0:
                first = float(logs["loss"])
        last = float(logs["loss"])
        assert np.isfinite(last)
        assert last < first, (first, last)

    def test_bf16_tables_converge(self):
        """bfloat16 table storage (f32 math, f32 Adam moments) still drives
        the sphere loss down; tables stay bf16 through the update."""
        data = make_sphere_dataset()
        grid = dataclasses.replace(TINY_GRID, table_dtype="bfloat16")
        cfg = dataclasses.replace(
            TINY_NSR, sdf=dataclasses.replace(TINY_NSR.sdf, grid=grid))
        tx = nsr.make_optimizer(cfg)
        state = nsr.init_state(cfg, jax.random.PRNGKey(0))
        assert state.params["geometry"]["table"][0].dtype == jnp.bfloat16
        key = jax.random.PRNGKey(1)
        first = None
        for i in range(60):
            key, k = jax.random.split(key)
            state, logs = nsr.train_step(cfg, tx, state, data, k)
            if i == 0:
                first = float(logs["loss"])
        assert state.params["geometry"]["table"][0].dtype == jnp.bfloat16
        last = float(logs["loss"])
        assert np.isfinite(last) and last < first, (first, last)

    def test_n_active_step_equivalent(self):
        """A train step with static level gating produces the same loss and
        parameters as the mask-only graph."""
        data = make_sphere_dataset()
        grid = dataclasses.replace(TINY_GRID, start_level=2)
        cfg = dataclasses.replace(
            TINY_NSR, sdf=dataclasses.replace(TINY_NSR.sdf, grid=grid))
        tx = nsr.make_optimizer(cfg)
        state0 = nsr.init_state(cfg, jax.random.PRNGKey(0))
        k = jax.random.PRNGKey(7)
        s_full, logs_full = nsr.train_step(cfg, tx, state0, data, k)
        n_act = grid.current_level(0)
        assert n_act < grid.n_levels
        s_gate, logs_gate = nsr.train_step(cfg, tx, state0, data, k,
                                           n_active=n_act)
        np.testing.assert_allclose(float(logs_full["loss"]),
                                   float(logs_gate["loss"]), rtol=1e-5)
        for a, b in zip(jax.tree_util.tree_leaves(s_full.params),
                        jax.tree_util.tree_leaves(s_gate.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-6)

    def test_render_image_shapes(self):
        cfg = TINY_NSR
        state = nsr.init_state(cfg, jax.random.PRNGKey(0))
        c2ws, _ = view_matrices(["front"])
        out = nsr.render_image(cfg, state.params, c2ws[0], 16, 16)
        assert out["comp_rgb"].shape == (16, 16, 3)
        assert out["opacity"].shape == (16, 16, 1)


class TestVisualHull:
    """render/hull.py: static per-ray [t_near, t_far] from multi-view masks
    (the TPU replacement for the reference's dynamic occupancy pruning,
    instant_nsr/models/neus.py:118-129)."""

    def _sphere_hull(self, size=64, radius=0.5, **kw):
        from drawingspinup_tpu.render.hull import hull_t_ranges
        data = make_sphere_dataset(n_views=4, size=size, radius=radius)
        tr = hull_t_ranges(data["masks"], data["c2w"], 1.0,
                           compute_hw=size, n_march=96, dilate_px=2, **kw)
        return data, np.asarray(tr)

    def test_intervals_contain_true_surface(self):
        """For every mask-hit ray the analytic sphere entry/exit t's lie
        inside the hull interval (conservativeness)."""
        size, radius = 64, 0.5
        data, tr = self._sphere_hull(size, radius)
        c2ws = np.asarray(data["c2w"])
        origins, dirs = ortho_ray_grid(size, size)
        for v in range(c2ws.shape[0]):
            ro, rd = rays_to_world(origins.reshape(-1, 3),
                                   dirs.reshape(-1, 3), c2ws[v])
            b = np.sum(ro * rd, -1)
            c = np.sum(ro * ro, -1) - radius ** 2
            disc = b * b - c
            hit = disc > 1e-4
            t_in = (-b - np.sqrt(np.maximum(disc, 0)))[hit]
            t_out = (-b + np.sqrt(np.maximum(disc, 0)))[hit]
            tn = tr[v, :, :, 0].reshape(-1)[hit]
            tf = tr[v, :, :, 1].reshape(-1)[hit]
            assert np.all(tn <= t_in + 1e-3), (v, np.max(tn - t_in))
            assert np.all(tf >= t_out - 1e-3), (v, np.max(t_out - tf))

    def test_intervals_tighter_than_aabb(self):
        """Mean hull span over hit rays is well under the AABB span."""
        size = 64
        data, tr = self._sphere_hull(size)
        masks = np.asarray(data["masks"]) > 0.5
        span = tr[..., 1] - tr[..., 0]
        mean_hull = float(span[masks].mean())
        # AABB span for a unit-radius scene box is ~2.0 for interior rays
        assert mean_hull < 1.5, mean_hull

    def test_miss_rays_keep_full_span(self):
        """Corner rays (far outside every mask) carry the full AABB span so
        mask-BCE carving supervision is preserved."""
        size = 64
        data, tr = self._sphere_hull(size)
        c2ws = np.asarray(data["c2w"])
        origins, dirs = ortho_ray_grid(size, size)
        ro, rd = rays_to_world(origins.reshape(-1, 3), dirs.reshape(-1, 3),
                               c2ws[0])
        t_nb, t_fb = neus.aabb_intersect(jnp.asarray(ro), jnp.asarray(rd),
                                         1.0)
        t_nb = np.asarray(t_nb).reshape(size, size)
        t_fb = np.asarray(t_fb).reshape(size, size)
        # corner pixel: outside the dilated sphere silhouette in view 0
        assert not np.asarray(data["masks"])[0, 1, 1]
        np.testing.assert_allclose(tr[0, 1, 1, 0], t_nb[1, 1], atol=1e-3)
        np.testing.assert_allclose(tr[0, 1, 1, 1], t_fb[1, 1], atol=1e-3)

    def test_train_step_with_t_range(self):
        """train_step consumes data['t_range'] and still converges on the
        sphere."""
        from drawingspinup_tpu.render.hull import hull_t_ranges
        data = make_sphere_dataset(n_views=4, size=32)
        data["t_range"] = hull_t_ranges(data["masks"], data["c2w"], 1.0,
                                        compute_hw=32, n_march=64,
                                        dilate_px=2)
        cfg = TINY_NSR
        tx = nsr.make_optimizer(cfg)
        state = nsr.init_state(cfg, jax.random.PRNGKey(0))
        key = jax.random.PRNGKey(1)
        first = None
        for i in range(60):
            key, k = jax.random.split(key)
            state, logs = nsr.train_step(cfg, tx, state, data, k)
            if i == 0:
                first = float(logs["loss"])
        last = float(logs["loss"])
        assert np.isfinite(last) and last < first, (first, last)
