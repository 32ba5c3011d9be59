"""Camera geometry ops vs NumPy references and round-trip identities."""

import pytest
import jax.numpy as jnp
import numpy as np

from pose_estimation_amitai_tpu.ops import geometry as G

pytestmark = pytest.mark.quick  # gate-style subset: python -m pytest -m quick


def _synthetic_camera(rng, idx=0):
    """Plausible K[R|t] camera looking at the origin from a random direction."""
    K = np.array([[1400.0, 0.0, 400.0], [0.0, 1400.0, 400.0], [0.0, 0.0, 1.0]])
    theta = idx * np.pi / 2 + 0.3
    Rz = np.array(
        [[np.cos(theta), -np.sin(theta), 0], [np.sin(theta), np.cos(theta), 0], [0, 0, 1.0]]
    )
    Rx = np.array([[1.0, 0, 0], [0, np.cos(0.4), -np.sin(0.4)], [0, np.sin(0.4), np.cos(0.4)]])
    R = Rx @ Rz
    t = np.array([[0.01], [0.02], [2.0 + 0.1 * idx]])
    P = K @ np.hstack([R, t])
    return P, K, R, t


def _points(rng, n=12):
    return (rng.random((n, 3)) - 0.5) * 0.2


def test_triangulate_pair_roundtrip(rng):
    Pa, *_ = _synthetic_camera(rng, 0)
    Pb, *_ = _synthetic_camera(rng, 1)
    X = _points(rng)
    pa = np.asarray(G.reproject(jnp.asarray(Pa), jnp.asarray(X)))
    pb = np.asarray(G.reproject(jnp.asarray(Pb), jnp.asarray(X)))
    got = np.asarray(
        G.triangulate_pair(jnp.asarray(Pa), jnp.asarray(Pb), jnp.asarray(pa), jnp.asarray(pb))
    )
    np.testing.assert_allclose(got, X, atol=1e-4)


def test_estimate_projection_dlt_recovers_camera(rng):
    P, *_ = _synthetic_camera(rng, 2)
    X = _points(rng, 16)
    x2d = np.asarray(G.reproject(jnp.asarray(P), jnp.asarray(X)))
    P_est = np.asarray(G.estimate_projection_dlt(jnp.asarray(X), jnp.asarray(x2d)))
    # Same projective action: reprojections must match.
    x2d_est = np.asarray(G.reproject(jnp.asarray(P_est), jnp.asarray(X)))
    # f32 SVD on ~500px coordinates: sub-0.05px reprojection is exact
    # for all practical purposes
    np.testing.assert_allclose(x2d_est, x2d, atol=5e-2)


def test_rq3_decomposition_properties(rng):
    A = rng.random((3, 3)) + np.eye(3)
    R, Q = (np.asarray(m) for m in G.rq3(jnp.asarray(A)))
    np.testing.assert_allclose(R @ Q, A, atol=1e-5)
    np.testing.assert_allclose(Q @ Q.T, np.eye(3), atol=1e-5)
    assert np.all(np.diag(R) > 0)
    assert abs(R[1, 0]) < 1e-5 and abs(R[2, 0]) < 1e-5 and abs(R[2, 1]) < 1e-5


def test_decompose_camera_roundtrip(rng):
    P, K, R, t = _synthetic_camera(rng, 1)
    Kd, Rd, td = (np.asarray(m) for m in G.decompose_camera(jnp.asarray(P)))
    P_re = Kd @ np.hstack([Rd, td])
    np.testing.assert_allclose(P_re / P_re[2, 3], P / P[2, 3], atol=1e-4)
    np.testing.assert_allclose(Kd / Kd[2, 2], K, atol=1e-3)


def test_crop_adjusted_matrices_shift_principal_point(rng):
    Ps, Ks, Rs, ts = [], [], [], []
    for i in range(4):
        P, K, R, t = _synthetic_camera(rng, i)
        Ps.append(P), Ks.append(K), Rs.append(R), ts.append(t)
    cropzone = np.array([[300, 200], [310, 210], [290, 190], [305, 195]], np.float32)
    P_crop, P_inv = G.crop_adjusted_matrices(
        jnp.asarray(np.stack(Ks)), jnp.asarray(np.stack(Rs)), jnp.asarray(np.stack(ts)),
        jnp.asarray(cropzone),
    )
    assert P_crop.shape == (4, 3, 4) and P_inv.shape == (4, 4, 3)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(P_crop), axis=(1, 2)), 1.0, atol=1e-5)
    # A world point projected through the cropped camera lands at
    # full-sensor coords minus the crop offset (with the y flip).
    X = _points(rng, 5)
    full = np.asarray(G.reproject(jnp.asarray(np.stack(Ps)[0]), jnp.asarray(X)))
    crop = np.asarray(G.reproject(np.asarray(P_crop)[0], jnp.asarray(X)))
    dx = cropzone[0, 1]
    dy = 800 + 1 - cropzone[0, 0] - 192
    np.testing.assert_allclose(crop[:, 0], full[:, 0] - dx, atol=1e-3)
    np.testing.assert_allclose(crop[:, 1], full[:, 1] - dy, atol=1e-3)


def test_reprojection_error_zero_for_consistent_points(rng):
    cams = [_synthetic_camera(rng, i) for i in range(4)]
    Ps = np.stack([c[0] for c in cams])
    X = _points(rng, 8)
    cropzone = np.array([[300, 200], [310, 210], [290, 190], [305, 195]], np.float32)
    # Build crop-local points that uncrop back to the true projections.
    pts_local = []
    for i in range(4):
        full = np.asarray(G.reproject(jnp.asarray(Ps[i]), jnp.asarray(X)))
        x_local = full[:, 0] - cropzone[i, 1]
        y_local = (801 - full[:, 1]) - cropzone[i, 0]
        pts_local.append(np.stack([x_local, y_local], axis=1))
    score = float(
        G.reprojection_error_score(
            jnp.asarray(np.stack(pts_local)), jnp.asarray(cropzone), jnp.asarray(Ps)
        )
    )
    assert score < 1e-2, score


def test_ftl_roundtrip_shapes(rng):
    latent = jnp.asarray(rng.random((2, 48, 48, 400)).astype(np.float32))
    P = jnp.asarray(rng.random((2, 3, 4)).astype(np.float32))
    P_inv = jnp.asarray(rng.random((2, 4, 3)).astype(np.float32))
    proj = G.ftl_project(latent, P)
    assert proj.shape == (2, 48, 48, 300)
    lifted = G.ftl_inverse(proj, P_inv)
    assert lifted.shape == (2, 48, 48, 400)


def test_ftl_matches_explicit_matmul(rng):
    latent = rng.random((1, 4, 4, 8)).astype(np.float32)  # G=2 groups of 4
    P = rng.random((1, 3, 4)).astype(np.float32)
    got = np.asarray(G.ftl_project(jnp.asarray(latent), jnp.asarray(P)))
    z = latent.reshape(1, 4, 4, 2, 4)
    want = np.einsum("bhwgj,bij->bhwgi", z, P).reshape(1, 4, 4, 6)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_triangulate_multiview(rng):
    cams = [_synthetic_camera(rng, i) for i in range(4)]
    Ps = np.stack([c[0] for c in cams])
    X = _points(rng, 6)
    pts = np.stack(
        [np.asarray(G.reproject(jnp.asarray(Ps[i]), jnp.asarray(X))) for i in range(4)]
    )
    got = np.asarray(G.triangulate_multiview(jnp.asarray(Ps), jnp.asarray(pts)))
    np.testing.assert_allclose(got, X, atol=1e-4)
