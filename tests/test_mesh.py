"""Mesh pipeline tests: marching tets, native decimation/raster/raycast,
laplacian + biharmonic solvers, thinning, color projection, full save_mesh."""
import numpy as np
import pytest

from drawingspinup_tpu import native
from drawingspinup_tpu.ops import skeleton as sk
from drawingspinup_tpu.render import mesh_post
from drawingspinup_tpu.render.marching import extract_isosurface

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native lib unavailable")


def sphere_mesh(n=48, radius=18, decim=3000):
    g = np.mgrid[0:n, 0:n, 0:n].astype(np.float32)
    r = np.sqrt(((g - n / 2) ** 2).sum(0))
    v, f = extract_isosurface((r < radius).astype(np.float32), sigma=1.0)
    v = (v / (n - 1)) * 2 - 1  # → [-1, 1]
    if decim:
        v, f = native.decimate(v, f, decim)
    return v, f


class TestMarching:
    def test_watertight_sphere(self):
        v, f = sphere_mesh(decim=None)
        edges = np.sort(np.concatenate(
            [f[:, [0, 1]], f[:, [1, 2]], f[:, [2, 0]]]), axis=1)
        _, cnt = np.unique(edges[:, 0] * 10 ** 9 + edges[:, 1],
                           return_counts=True)
        assert set(cnt) == {2}

    def test_empty_field(self):
        v, f = extract_isosurface(np.zeros((8, 8, 8), np.float32))
        assert len(v) == 0 and len(f) == 0


class TestNative:
    def test_decimate_preserves_shape(self):
        v, f = sphere_mesh(decim=None)
        v2, f2 = native.decimate(v, f, 2000)
        assert len(f2) <= 2100
        r = np.linalg.norm(v2, axis=1)
        target = 18 / 24  # radius in normalized coords
        assert abs(r.mean() - target) < 0.05

    def test_rasterize_and_raycast(self):
        v, f = sphere_mesh()
        pv = ((v[:, :2] + 1) / 2 * 63).astype(np.float32)
        rv = np.concatenate([pv, v[:, 2:3]], axis=1)
        depth, fid, bary = native.rasterize(rv, f, 64, 64, 0)
        cover = (fid >= 0).mean()
        assert 0.3 < cover < 0.6  # disc of r=0.75 in [-1,1]² ≈ 0.44
        assert np.abs(bary[fid >= 0].sum(-1) - 1).max() < 1e-4
        # raycast through the center from below
        q = np.array([[32.0, 32.0, -10.0]], np.float32)
        hz, hf = native.raycast_z(rv, f, q, +1)
        assert hf[0] >= 0 and hz[0] == pytest.approx(-0.75, abs=0.05)


class TestSkeleton:
    def test_skeletonize_bar(self):
        m = np.zeros((32, 32), np.uint8)
        m[14:18, 4:28] = 255
        s = sk.skeletonize(m)
        rows = np.nonzero(s.sum(axis=1))[0]
        assert len(rows) <= 3  # thinned to ~1px line
        eps = sk.end_points(s)
        assert len(eps) == 2

    def test_distance_transform(self):
        m = np.zeros((16, 16), np.uint8)
        m[4:12, 4:12] = 255
        d = sk.distance_transform_l2(m)
        assert d[7, 7] == pytest.approx(4, abs=0.5)
        assert d[0, 0] == 0


class TestSolvers:
    def test_laplacian_smooth_shrinks_noise(self, rng):
        v, f = sphere_mesh()
        noisy = v + rng.normal(0, 0.02, v.shape).astype(np.float32)
        sm = mesh_post.laplacian_smooth(noisy, f, lamb=2, iterations=5)
        r_noisy = np.linalg.norm(noisy, axis=1).std()
        r_sm = np.linalg.norm(sm, axis=1).std()
        assert r_sm < r_noisy

    def test_biharmonic_interpolates(self):
        v, f = sphere_mesh()
        # constrain top cap up, bottom cap fixed → smooth blend between
        top = np.nonzero(v[:, 2] > 0.6)[0]
        bot = np.nonzero(v[:, 2] < -0.6)[0]
        b = np.concatenate([top, bot])
        bc = np.zeros((len(b), 3), np.float32)
        bc[: len(top), 2] = 0.1
        d = mesh_post.harmonic_deformation(v, f, b, bc, k=2)
        np.testing.assert_allclose(d[top, 2], 0.1, atol=1e-5)
        np.testing.assert_allclose(d[bot, 2], 0.0, atol=1e-5)
        mid = np.nonzero(np.abs(v[:, 2]) < 0.2)[0]
        assert 0.0 < d[mid, 2].mean() < 0.1  # smooth in-between


class TestColorProjection:
    def test_front_back_assignment(self):
        v, f = sphere_mesh()
        v2 = v * 0.4  # within [-0.5, 0.5] export space
        res = 128
        front = np.zeros((res, res, 3), np.float32)
        front[..., 0] = 1.0  # red front image
        back = np.zeros((res, res, 3), np.float32)
        back[..., 2] = 1.0  # blue back image
        mask = np.ones((res, res), np.float32)
        colors = mesh_post.color_projection(v2, f, front, back, mask, res=res)
        front_verts = v2[:, 2] > 0.2
        back_verts = v2[:, 2] < -0.2
        assert colors[front_verts, 0].mean() > 0.8  # red
        assert colors[back_verts, 2].mean() > 0.8   # blue


class TestSaveMesh:
    def test_full_pipeline(self, tmp_path):
        v, f = sphere_mesh()
        # in isosurface output space the reference passes verts scaled by
        # bbox; our sphere is already in [-1, 1]
        res = 64
        front = np.full((res, res, 3), 0.5, np.float32)
        mask = np.ones((res, res), np.float32)
        path = str(tmp_path / "out.obj")
        out = mesh_post.save_mesh(path, v, f, front_mask=mask,
                                  front_color=front, back_color=front,
                                  thinning=False, smoothing=True,
                                  color_back_projection=True, shearing=True)
        from drawingspinup_tpu.core.io import read_obj
        v2, f2, c2 = read_obj(out)
        assert len(v2) == len(v) and len(f2) == len(f)
        assert c2 is not None and np.abs(c2 - 0.5).mean() < 0.1

    def test_thinning_runs(self):
        v, f = sphere_mesh(decim=2000)
        v2 = v.copy()
        mask = np.zeros((64, 64), np.uint8)
        mask[28:36, 8:56] = 255  # a thin horizontal bar drawing
        out = mesh_post.thinning_processing(v2 * 0.4, f, mask)
        assert out.shape == v2.shape
        assert np.isfinite(out).all()


class TestUVAtlas:
    """Chart-based unwrap (VERDICT r3 next #10 — replaces the planar
    projection whose charts overlapped for any non-height-field mesh)."""

    def _sphere_mesh(self):
        n = 48
        x = np.linspace(-1, 1, n, dtype=np.float32)
        xx, yy, zz = np.meshgrid(x, x, x, indexing="ij")
        binary = (xx ** 2 + yy ** 2 + zz ** 2) < 0.55
        v, f = extract_isosurface(binary, sigma=1.0)
        return v / n, f

    def test_charts_disjoint_and_faithful(self, tmp_path):
        v, f = self._sphere_mesh()
        colors = np.clip(0.5 + v / np.abs(v).max() * 0.5, 0, 1)
        v2, f2, uvs, tex = mesh_post.uv_atlas(v, f, colors, tex_res=512)
        assert len(v2) >= len(v)                # vertices split at borders
        assert uvs.min() >= 0.0 and uvs.max() <= 1.0
        assert f2.max() < len(v2)
        # geometry preserved: every remapped vertex is an original vertex
        from scipy.spatial import cKDTree
        d, _ = cKDTree(v).query(v2, 1)
        assert d.max() < 1e-6

        # charts disjoint: each texel's rasterized face belongs to at most
        # one chart already by construction; verify the stronger property
        # that nearest-sampling the texture at every vertex's uv returns
        # (approximately) that vertex's color — impossible if charts overlap
        R = tex.shape[0]
        px = np.clip((uvs[:, 0] * (R - 1)).round().astype(int), 0, R - 1)
        py = np.clip(((1 - uvs[:, 1]) * (R - 1)).round().astype(int),
                     0, R - 1)
        sampled = tex[py, px]
        colors2_err = np.abs(sampled - colors[
            cKDTree(v).query(v2, 1)[1]]).mean()
        assert colors2_err < 0.12, colors2_err  # bilinear-footprint noise

        # full export path writes a valid textured OBJ + mtl + png
        from drawingspinup_tpu.core.io import write_obj
        p = str(tmp_path / "uv.obj")
        write_obj(p, v2, f2, uvs=uvs, texture_png=tex)
        import os
        assert os.path.exists(p.replace(".obj", ".mtl"))
        assert os.path.exists(p.replace(".obj", ".png"))
        assert "vt " in open(p).read()

    def test_nonheightfield_folded_sheet(self):
        """An S-fold in z (two sheets over the same xy region) — the round-3
        planar projection collapsed these onto one chart; now the sheets
        land in different charts/atlas regions and both keep their colors."""
        n = 24
        g = np.linspace(0, 1, n, dtype=np.float32)
        xs, ys = np.meshgrid(g, g, indexing="ij")
        verts, faces, colors = [], [], []
        for zi, (z, col) in enumerate(
                (((0.0), (1.0, 0.0, 0.0)), ((0.4), (0.0, 1.0, 0.0)))):
            base = len(verts) // 1 if not verts else len(np.concatenate(verts))
            sheet = np.stack([xs.ravel(), ys.ravel(),
                              np.full(n * n, z, np.float32)], 1)
            verts.append(sheet)
            colors.append(np.tile(np.asarray(col, np.float32), (n * n, 1)))
            idx = np.arange(n * n).reshape(n, n)
            a, b, c, d = (idx[:-1, :-1].ravel(), idx[1:, :-1].ravel(),
                          idx[:-1, 1:].ravel(), idx[1:, 1:].ravel())
            quad = np.stack([np.stack([a, b, d], 1),
                             np.stack([a, d, c], 1)]).reshape(-1, 3)
            faces.append(quad + base)
        v = np.concatenate(verts)
        f = np.concatenate(faces)
        c = np.concatenate(colors)
        v2, f2, uvs, tex = mesh_post.uv_atlas(v, f, c, tex_res=256)
        R = tex.shape[0]
        px = np.clip((uvs[:, 0] * (R - 1)).round().astype(int), 0, R - 1)
        py = np.clip(((1 - uvs[:, 1]) * (R - 1)).round().astype(int),
                     0, R - 1)
        sampled = tex[py, px]
        from scipy.spatial import cKDTree
        orig = cKDTree(v).query(v2, 1)[1]
        err = np.abs(sampled - c[orig]).mean()
        assert err < 0.05, err   # both sheets keep their own color
