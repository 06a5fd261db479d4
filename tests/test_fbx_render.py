"""FBX reader/writer round-trip, skinning math, and the full Blender-free
render driver on a synthetic two-bone rig."""

import pytest as _pytest_mark

pytestmark = _pytest_mark.mark.slow

import os

import numpy as np
import pytest

from drawingspinup_tpu import native
from drawingspinup_tpu.core.io import write_obj
from drawingspinup_tpu.render import fbx as F
from drawingspinup_tpu.render import animation as A


def p70(entries):
    node = F.Node("Properties70")
    for name, vals in entries.items():
        node.children.append(
            F.Node("P", [name, name, "", "A"] + list(vals)))
    return node


def bar_mesh(n_seg=8, half=0.08, height=2.0):
    """A vertical bar along z (square cross-section), segmented so skinning
    can bend it."""
    verts, faces = [], []
    ring = [(-half, -half), (half, -half), (half, half), (-half, half)]
    for s in range(n_seg + 1):
        z = height * s / n_seg
        for (x, y) in ring:
            verts.append([x, y, z])
    for s in range(n_seg):
        for k in range(4):
            a = s * 4 + k
            b = s * 4 + (k + 1) % 4
            c = (s + 1) * 4 + k
            d = (s + 1) * 4 + (k + 1) % 4
            faces += [[a, b, d], [a, d, c]]
    return np.asarray(verts, np.float32), np.asarray(faces, np.int64)


def trans4(t):
    m = np.eye(4)
    m[:3, 3] = t
    return m


def make_rig_fbx(path, animate=True):
    """Two-bone chain along z with 90° X-rotation of the child over 1 s."""
    verts, faces = bar_mesh()
    poly = []
    for f in faces:
        poly += [int(f[0]), int(f[1]), ~int(f[2])]

    geom = F.Node("Geometry", [150, "Geometry::bar", "Mesh"])
    geom.children.append(F.Node("Vertices",
                                [verts.astype(np.float64).ravel()]))
    geom.children.append(F.Node("PolygonVertexIndex",
                                [np.asarray(poly, np.int32)]))

    mesh_model = F.Node("Model", [100, "Model::bar", "Mesh"])
    bone0 = F.Node("Model", [200, "Model::root", "LimbNode"])
    bone0.children.append(p70({"Lcl Translation": (0.0, 0.0, 0.0)}))
    bone1 = F.Node("Model", [201, "Model::upper", "LimbNode"])
    bone1.children.append(p70({"Lcl Translation": (0.0, 0.0, 1.0)}))

    lower = verts[:, 2] < 1.0
    c0 = F.Node("Deformer", [300, "SubDeformer::c0", "Cluster"])
    c0.children.append(F.Node("Indexes",
                              [np.nonzero(lower)[0].astype(np.int32)]))
    c0.children.append(F.Node("Weights",
                              [np.ones(lower.sum(), np.float64)]))
    c0.children.append(F.Node("Transform", [np.eye(4).ravel()]))
    c0.children.append(F.Node("TransformLink", [np.eye(4).ravel()]))
    c1 = F.Node("Deformer", [301, "SubDeformer::c1", "Cluster"])
    c1.children.append(F.Node("Indexes",
                              [np.nonzero(~lower)[0].astype(np.int32)]))
    c1.children.append(F.Node("Weights",
                              [np.ones((~lower).sum(), np.float64)]))
    c1.children.append(F.Node("Transform", [np.eye(4).ravel()]))
    # column-major flatten: writer stores raw; parser transposes
    c1.children.append(F.Node("TransformLink",
                              [trans4([0, 0, 1.0]).T.ravel()]))

    objects = F.Node("Objects")
    objects.children += [geom, mesh_model, bone0, bone1, c0, c1]

    conns = F.Node("Connections")

    def C(kind, a, b, prop=None):
        props = [kind, a, b] + ([prop] if prop else [])
        conns.children.append(F.Node("C", props))

    C("OO", 150, 100)
    C("OO", 201, 200)
    C("OO", 200, 300)
    C("OO", 201, 301)

    if animate:
        t = (np.array([0.0, 1.0]) * F.KTIME_PER_SEC).astype(np.int64)
        cx = F.Node("AnimationCurve", [500, "AnimCurve::x", ""])
        cx.children.append(F.Node("KeyTime", [t]))
        cx.children.append(F.Node("KeyValueFloat",
                                  [np.array([0.0, 90.0], np.float32)]))
        cn = F.Node("AnimationCurveNode", [400, "AnimCurveNode::R", ""])
        cn.children.append(p70({"d|X": (0.0,), "d|Y": (0.0,),
                                "d|Z": (0.0,)}))
        objects.children += [cx, cn]
        C("OP", 500, 400, "d|X")
        C("OP", 400, 201, "Lcl Rotation")

    F.write_fbx(path, [objects, conns])
    return verts, faces


class TestFbxRoundtrip:
    def test_parse_scene(self, tmp_path):
        path = str(tmp_path / "rig.fbx")
        verts, faces = make_rig_fbx(path)
        scene = F.load_scene(path)
        np.testing.assert_allclose(scene.vertices, verts, atol=1e-6)
        assert len(scene.faces) == len(faces)
        assert scene.mesh_model == 100
        assert len(scene.clusters) == 2
        assert scene.models[201].parent == 200
        assert 201 in scene.anim
        assert "Lcl Rotation" in scene.anim[201]
        lo, hi = scene.frame_range()
        assert (lo, hi) == (0.0, 1.0)

    def test_bone_world_animation(self, tmp_path):
        path = str(tmp_path / "rig.fbx")
        make_rig_fbx(path)
        scene = F.load_scene(path)
        w0 = F.world_matrices(scene, 0.0)
        w1 = F.world_matrices(scene, 1.0)
        # at t=0 bone1 sits at (0,0,1) unrotated
        np.testing.assert_allclose(w0[201][:3, 3], [0, 0, 1], atol=1e-6)
        # at t=1 it is rotated 90° about X: its local +z maps to world -y
        z_axis = w1[201][:3, :3] @ np.array([0, 0, 1.0])
        np.testing.assert_allclose(z_axis, [0, -1, 0], atol=1e-5)


class TestSkinning:
    def test_bend(self, tmp_path):
        import jax.numpy as jnp
        path = str(tmp_path / "rig.fbx")
        verts, faces = make_rig_fbx(path)
        scene = F.load_scene(path)
        bones = [c.bone_model for c in scene.clusters]
        w, _ = A.cluster_weights(scene, len(verts))
        inv_bind = np.stack([np.linalg.inv(c.transform_link)
                             for c in scene.clusters])
        bind = np.stack([c.transform for c in scene.clusters])
        bw = F.evaluate_bone_worlds(scene, [0.0, 1.0], bones)
        mats = np.einsum("tbij,bjk,bkl->tbil", bw, inv_bind, bind)
        posed = np.asarray(A.skin_all_frames(
            jnp.asarray(verts), jnp.asarray(w), jnp.asarray(mats)))
        # t=0: identity
        np.testing.assert_allclose(posed[0], verts, atol=1e-5)
        # t=1: the tip (rest (0,0,2)) rotates about X around the joint at
        # z=1 → lands at (0,-1,1)
        tip = verts[:, 2].argmax()
        np.testing.assert_allclose(posed[1, tip, :], [0, -1, 1], atol=0.1)

    def test_auto_weights_partition(self):
        verts, _ = bar_mesh()
        heads = np.array([[0, 0, 0], [0, 0, 1.0]], np.float32)
        tails = np.array([[0, 0, 1.0], [0, 0, 2.0]], np.float32)
        w = A.auto_weights(verts, heads, tails)
        np.testing.assert_allclose(w.sum(1), 1.0, atol=1e-5)
        assert w[verts[:, 2] < 0.4, 0].mean() > 0.9   # bottom → bone0
        assert w[verts[:, 2] > 1.6, 1].mean() > 0.9   # top → bone1


@pytest.mark.skipif(not native.available(), reason="native lib unavailable")
class TestRenderAnimation:
    def test_passes_written(self, tmp_path):
        fbx_path = str(tmp_path / "rig.fbx")
        verts, faces = make_rig_fbx(fbx_path)
        mesh_path = str(tmp_path / "mesh.obj")
        colors = np.tile([[0.8, 0.3, 0.2]], (len(verts), 1))
        write_obj(mesh_path, verts, faces, vertex_colors=colors)
        out = str(tmp_path / "render")
        info = A.render_animation(fbx_path, mesh_path, out, base_res=64)
        assert info["frames"] >= 2
        from drawingspinup_tpu.core.io import read_image
        c = read_image(os.path.join(out, "color", "0001.png"))
        p = read_image(os.path.join(out, "pos", "0001.png"))
        e = read_image(os.path.join(out, "edge", "0001.png"))
        assert c.shape[-1] == 4 and p.shape[-1] == 4
        alpha = c[..., 3]
        assert alpha.max() > 0.5  # something rendered
        inside = alpha > 0.5
        # color pass ≈ the OBJ vertex color
        np.testing.assert_allclose(c[inside][:, :3].mean(0), [0.8, 0.3, 0.2],
                                   atol=0.1)
        # NOCS pos z-gradient: pos G/B channels span [0,1]
        assert p[inside][:, 2].max() - p[inside][:, 2].min() > 0.5
