"""Mesh rasterization (reference kpconv/utils/mesh.py:37-123 analog)."""

import numpy as np
import pytest

from seggroup_tpu.data.mesh import rasterize_mesh


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def test_rasterize_density_and_membership(rng):
    # one large unit right triangle in the z=0 plane
    verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    faces = np.array([[0, 1, 2]])
    pts, _, fid, _ = rasterize_mesh(verts, faces, dl=0.05)
    assert (fid == 0).all()
    # all samples inside the triangle (barycentric nonneg, z = 0)
    assert np.allclose(pts[:, 2], 0)
    assert (pts[:, 0] >= -1e-6).all() and (pts[:, 1] >= -1e-6).all()
    assert (pts[:, 0] + pts[:, 1] <= 1 + 1e-6).all()
    # dense: nearest-sample spacing ~dl, and corners present
    for c in verts:
        assert np.linalg.norm(pts - c, axis=1).min() < 1e-6
    n_expected = 0.5 / (0.05 ** 2)  # area / dl^2
    assert len(pts) > 0.5 * n_expected


def test_small_faces_keep_vertices_only(rng):
    verts = rng.normal(size=(30, 3)).astype(np.float32) * 0.001  # << dl
    faces = np.array([[i, i + 1, i + 2] for i in range(0, 27, 3)])
    pts, _, _, _ = rasterize_mesh(verts, faces, dl=0.5)
    # m=1 lattice = just the 3 corners per face
    assert len(pts) == 3 * len(faces)


def test_feature_interpolation(rng):
    verts = np.array([[0, 0, 0], [2, 0, 0], [0, 2, 0]], np.float32)
    faces = np.array([[0, 1, 2]])
    feats = np.array([[1.0], [3.0], [5.0]], np.float32)
    pts, f, _, _ = rasterize_mesh(verts, faces, dl=0.25, features=feats)
    # interpolation is linear: f == 1 + x + 2y
    want = 1.0 + pts[:, 0] + 2.0 * pts[:, 1]
    np.testing.assert_allclose(f[:, 0], want, rtol=1e-5, atol=1e-5)


def test_corner_maps_vertex_labels(rng):
    verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    faces = np.array([[0, 1, 2]])
    labels = np.array([7, 8, 9])
    pts, _, fid, corner = rasterize_mesh(verts, faces, dl=0.2)
    lab = labels[faces[fid, corner]]
    # exact at the corners themselves
    for i, c in enumerate(verts):
        at = np.linalg.norm(pts - c, axis=1) < 1e-6
        assert (lab[at] == labels[i]).all()
    # barycentric-nearest mostly agrees with euclidean-nearest (they differ
    # only near equidistance lines on non-equilateral triangles)
    d = np.stack([np.linalg.norm(pts - verts[i], axis=1) for i in range(3)], 1)
    agree = (lab == labels[np.argmin(d, 1)]).mean()
    assert agree > 0.6, agree
