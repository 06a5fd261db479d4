"""Native C++ export-tail kernels vs their numpy oracles.

native/march.cc (dsu_gaussian3d, dsu_march_tets_run) and
native/decimate.cc (dsu_decimate_fast) must reproduce the pure-Python
implementations in render/marching.py — same separable gaussian
(scipy reflect/truncate=4 semantics), same parity-mirrored 6-tet
decomposition/case tables/edge interpolation, same gradient-based winding.
Vertex/face ORDER legitimately differs (hash-map discovery order vs sorted
unique edge keys), so geometry is compared canonically.
"""
import numpy as np
import pytest
from scipy import ndimage
from scipy.spatial import cKDTree

from drawingspinup_tpu import native
from drawingspinup_tpu.render import marching

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native lib unavailable")


def _smooth_random_field(n, seed, sigma=2.0):
    rng = np.random.default_rng(seed)
    f = rng.standard_normal((n, n, n)).astype(np.float32)
    return ndimage.gaussian_filter(f, sigma=sigma).astype(np.float32)


def _sphere_field(n, r=0.35):
    x = np.linspace(-0.5, 0.5, n, dtype=np.float32)
    xx, yy, zz = np.meshgrid(x, x, x, indexing="ij")
    return (r - np.sqrt(xx ** 2 + yy ** 2 + zz ** 2)).astype(np.float32)


def _canonical(verts, faces, decimals=4):
    """Order-independent mesh form: faces as cyclically-rotated tuples of
    rounded vertex coordinates (rotation canonicalizes start vertex but
    PRESERVES winding — a flipped face does not match)."""
    coords = np.round(verts, decimals)
    out = set()
    for f in faces:
        tri = [tuple(coords[i]) for i in f]
        k = min(range(3), key=lambda i: tri[i])
        out.add((tri[k], tri[(k + 1) % 3], tri[(k + 2) % 3]))
    return out


class TestGaussian3D:
    @pytest.mark.parametrize("sigma", [0.7, 1.0, 2.5])
    def test_matches_scipy(self, sigma):
        rng = np.random.default_rng(3)
        f = (rng.random((33, 33, 33)) > 0.6).astype(np.float32)
        want = ndimage.gaussian_filter(f, sigma=sigma)
        got = native.gaussian3d(f, sigma)
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_native_twin_matches_smooth_binary(self):
        # the scipy-free fallback must stay interchangeable with production
        rng = np.random.default_rng(4)
        b = rng.random((17, 17, 17)) > 0.5
        np.testing.assert_allclose(
            native.gaussian3d(b.astype(np.float32), 1.0),
            marching.smooth_binary(b, 1.0), atol=1e-5)


class TestMarchTets:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_parity_random_field(self, seed):
        f = _smooth_random_field(20, seed)
        v_py, f_py = marching.marching_tetrahedra(f, 0.0, use_native=False)
        v_na, f_na = native.march_tets(f, 0.0)
        assert len(v_py) == len(v_na)
        assert len(f_py) == len(f_na)
        # identical vertex sets
        sp = sorted(map(tuple, np.round(v_py, 4)))
        sn = sorted(map(tuple, np.round(v_na, 4)))
        np.testing.assert_allclose(np.array(sp), np.array(sn), atol=1e-4)
        # identical faces including winding
        assert _canonical(v_py, f_py) == _canonical(v_na, f_na)

    def test_parity_sphere(self):
        f = _sphere_field(32)
        v_py, f_py = marching.marching_tetrahedra(f, 0.0, use_native=False)
        v_na, f_na = native.march_tets(f, 0.0)
        assert _canonical(v_py, f_py) == _canonical(v_na, f_na)

    def test_empty_field(self):
        f = -np.ones((8, 8, 8), np.float32)
        v, fc = native.march_tets(f, 0.0)
        assert len(v) == 0 and len(fc) == 0

    def test_extract_isosurface_uses_native(self):
        # the production entry must produce the same geometry both ways
        b = _sphere_field(24) > 0
        v1, f1 = marching.extract_isosurface(b, sigma=1.0)
        v2, f2 = marching.marching_tetrahedra(
            ndimage.gaussian_filter(b.astype(np.float32), 1.0), 0.5,
            use_native=False)
        assert _canonical(v1, f1) == _canonical(v2, f2)


class TestDecimateFast:
    def test_same_contract_as_plain(self):
        f = _sphere_field(48)
        v, fc = native.march_tets(f, 0.0)
        target = 1500
        v1, f1 = native.decimate(v, fc, target)
        v2, f2 = native.decimate(v, fc, target, fast=True)
        assert len(f1) <= target and len(f2) <= target
        assert len(f2) > target * 0.5
        # both results stay on the ORIGINAL dense surface (vertex-to-vertex
        # distance between the two decimations is ~edge length, not a
        # surface-error proxy); dense vertex spacing is ~1 cell
        tree = cKDTree(v)
        d_plain, _ = tree.query(v1)
        d_fast, _ = tree.query(v2)
        assert d_fast.mean() < max(2.0 * d_plain.mean(), 0.5)
        assert d_fast.max() < 2.0

    def test_fast_keeps_sphere_radius(self):
        f = _sphere_field(48, r=0.4)
        v, fc = native.march_tets(f, 0.0)
        v2, f2 = native.decimate(v, fc, 2000, fast=True)
        c = v2.mean(0)
        rad = np.linalg.norm(v2 - c, axis=1)
        # index coords: r=0.4 over [-0.5,0.5] mapped to 48 cells → ~18.8
        assert abs(rad.mean() - 0.4 * 47) < 0.5
        assert rad.std() < 0.3


def test_u8_march_matches_quantized_f32():
    """The u8 fast path (device-smooth export) must march EXACTLY like the
    same field as f32/255 — edge interpolation is affine-invariant."""
    import numpy as np

    from drawingspinup_tpu.render.marching import marching_tetrahedra
    z, y, x = np.mgrid[0:48, 0:48, 0:48].astype(np.float32)
    sm = np.clip(1.0 - (np.sqrt((x - 24) ** 2 + (y - 24) ** 2
                                + (z - 24) ** 2) - 14) / 4, 0, 1)
    u8 = np.round(sm * 255).astype(np.uint8)
    vf, ff = marching_tetrahedra(u8.astype(np.float32) / 255.0, 0.5)
    vu, fu = marching_tetrahedra(u8, 0.5)
    assert len(vf) == len(vu) and np.array_equal(ff, fu)
    assert np.abs(vf - vu).max() < 1e-4
