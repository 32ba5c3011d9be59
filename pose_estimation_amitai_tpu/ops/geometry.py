"""Multi-view camera geometry as jittable JAX code.

TPU-native replacements for the reference's NumPy/OpenCV camera math:

* two-view SVD triangulation — ``cv2.triangulatePoints`` and the hand-rolled
  SVD version (reference: pytorch/Datagenerators.py:322-345,
  tensorflow/Custom_data_generator.py:209-214)
* DLT projection-matrix estimation from 3D<->2D correspondences
  (reference: tensorflow/Custom_data_generator.py:224-247)
* RQ decomposition + camera decomposition P -> K, R, t
  (reference: pytorch/Datagenerators.py:427-512 — ``RQ3``/``DecomposeCamera``)
* crop-zone-adjusted camera matrices (principal-point shift per crop,
  reference: pytorch/Datagenerators.py:382-402)
* pairwise reprojection-error score used by the left/right consistency
  checker (reference: pytorch/preprocessor.py:305-346)
* FTL / inverse-FTL feature-transform-layer projections used by the
  disentanglement model (reference: pytorch/CNNs.py:329-352)

Everything here is pure ``jnp`` (``jnp.linalg.svd``/``pinv`` are jittable and
batchable via vmap), so the geometry rides inside jitted train/infer steps
instead of bouncing to the host like the reference does.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..constants import SENSOR_HEIGHT


# ---------------------------------------------------------------------------
# Triangulation
# ---------------------------------------------------------------------------
def triangulate_pair(
    Pa: jax.Array, Pb: jax.Array, points_a: jax.Array, points_b: jax.Array
) -> jax.Array:
    """Two-view linear (DLT) triangulation via SVD.

    Same construction as the reference's ``custom_triangulation``
    (pytorch/Datagenerators.py:322-345): stack the four cross-product rows,
    take the right-singular vector of the smallest singular value, and
    de-homogenise.

    Args:
      Pa, Pb: (3, 4) projection matrices.
      points_a, points_b: (N, 2) pixel coordinates in each view.

    Returns:
      (N, 3) triangulated points.
    """
    p1a, p2a, p3a = Pa[0], Pa[1], Pa[2]
    p1b, p2b, p3b = Pb[0], Pb[1], Pb[2]
    A = jnp.stack(
        [
            points_a[:, 0:1] * p3a - p1a,
            points_a[:, 1:2] * p3a - p2a,
            points_b[:, 0:1] * p3b - p1b,
            points_b[:, 1:2] * p3b - p2b,
        ],
        axis=1,
    )  # (N, 4, 4)
    # Row + column equilibration: exact for the null space (solve
    # (A S) y = 0 with X = S y), but keeps the SVD well-conditioned in f32 —
    # the reference runs NumPy f64 on host; we stay f32 on device.
    A = A / (jnp.linalg.norm(A, axis=-1, keepdims=True) + 1e-12)
    col = jnp.linalg.norm(A, axis=1, keepdims=True) + 1e-12  # (N, 1, 4)
    _, _, vt = jnp.linalg.svd(A / col)
    X = vt[:, -1, :] / col[:, 0, :]  # (N, 4)
    return X[:, :3] / X[:, 3:4]


def reproject(P: jax.Array, points_3d: jax.Array) -> jax.Array:
    """Project (N, 3) world points through a (3, 4) camera: returns (N, 2)."""
    ones = jnp.ones((points_3d.shape[0], 1), dtype=points_3d.dtype)
    ph = jnp.concatenate([points_3d, ones], axis=1)  # (N, 4)
    proj = ph @ P.T  # (N, 3)
    return proj[:, :2] / proj[:, 2:3]


_CAMERA_PAIRS = ((0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3))


def uncrop_points(
    points_2d: jax.Array, cropzone: jax.Array
) -> jax.Array:
    """Map crop-local pixel coords to full-sensor coords (y flipped).

    Reference: pytorch/preprocessor.py:313-317 and ``uncrop``
    (pytorch/Datagenerators.py:416-424): x += crop_x, y += crop_y, then
    y -> (SENSOR_HEIGHT + 1) - y.

    Args:
      points_2d: (..., N, 2) crop-local [x, y].
      cropzone: (..., 2) [y_crop, x_crop] per camera.
    """
    x = points_2d[..., 0] + cropzone[..., 1:2]
    y = points_2d[..., 1] + cropzone[..., 0:1]
    y = (SENSOR_HEIGHT + 1) - y
    return jnp.stack([x, y], axis=-1)


def reprojection_error_score(
    points_2d: jax.Array, cropzone: jax.Array, camera_matrices: jax.Array
) -> jax.Array:
    """Mean pairwise triangulation-reprojection error over all 6 camera pairs.

    The scoring function of the left/right 3D-consistency checker
    (reference: pytorch/preprocessor.py:305-346, ``get_reprojection_error``).

    Args:
      points_2d: (4, N, 2) crop-local peaks per camera.
      cropzone: (4, 2) [y, x] crop offsets.
      camera_matrices: (4, 3, 4) full-sensor DLT matrices.

    Returns:
      scalar mean reprojection error in pixels.
    """
    full = uncrop_points(points_2d, cropzone)  # (4, N, 2)
    errs = []
    for a, b in _CAMERA_PAIRS:
        Pa, Pb = camera_matrices[a], camera_matrices[b]
        pts3d = triangulate_pair(Pa, Pb, full[a], full[b])
        ea = jnp.mean(jnp.linalg.norm(full[a] - reproject(Pa, pts3d), axis=-1))
        eb = jnp.mean(jnp.linalg.norm(full[b] - reproject(Pb, pts3d), axis=-1))
        errs.append((ea + eb) / 2.0)
    return jnp.mean(jnp.stack(errs))


def triangulate_multiview(
    Ps: jax.Array, points_2d: jax.Array
) -> jax.Array:
    """All-pairs triangulation averaged over the 6 camera pairs.

    Inference helper for lifting decoded 2D peaks to 3D (the reference's
    practice is per-pair cv2.triangulatePoints, SURVEY §3.5).

    Args:
      Ps: (4, 3, 4) cameras; points_2d: (4, N, 2) full-sensor coords.

    Returns:
      (N, 3) mean of pairwise triangulations.
    """
    acc = []
    for a, b in _CAMERA_PAIRS:
        acc.append(triangulate_pair(Ps[a], Ps[b], points_2d[a], points_2d[b]))
    return jnp.mean(jnp.stack(acc), axis=0)


# ---------------------------------------------------------------------------
# DLT estimation
# ---------------------------------------------------------------------------
def estimate_projection_dlt(
    points_3d: jax.Array, points_2d: jax.Array
) -> jax.Array:
    """Estimate a 3x4 projection matrix from >=6 3D<->2D correspondences.

    SVD null-space construction, normalised so P[2,3] == 1
    (reference: tensorflow/Custom_data_generator.py:224-247).
    """
    X, Y, Z = points_3d[:, 0], points_3d[:, 1], points_3d[:, 2]
    x, y = points_2d[:, 0], points_2d[:, 1]
    zeros = jnp.zeros_like(X)
    ones = jnp.ones_like(X)
    row_x = jnp.stack(
        [-X, -Y, -Z, -ones, zeros, zeros, zeros, zeros, x * X, x * Y, x * Z, x],
        axis=1,
    )
    row_y = jnp.stack(
        [zeros, zeros, zeros, zeros, -X, -Y, -Z, -ones, y * X, y * Y, y * Z, y],
        axis=1,
    )
    A = jnp.concatenate([row_x, row_y], axis=0)
    _, _, vt = jnp.linalg.svd(A)
    P = vt[-1].reshape(3, 4)
    return P / P[2, 3]


# ---------------------------------------------------------------------------
# Camera decomposition
# ---------------------------------------------------------------------------
def rq3(A: jax.Array) -> tuple[jax.Array, jax.Array]:
    """RQ decomposition of a 3x3 matrix via three Givens rotations.

    Same algorithm as the reference's ``RQ3``
    (pytorch/Datagenerators.py:427-468), expressed with jnp so it jits and
    vmaps. Returns (R upper-triangular, Q orthonormal) with positive diagonal
    on R.
    """
    eps = 1e-10
    A = A.at[2, 2].add(eps)
    d = jnp.sqrt(A[2, 2] ** 2 + A[2, 1] ** 2)
    c, s = -A[2, 2] / d, A[2, 1] / d
    Qx = jnp.array([[1.0, 0.0, 0.0], [0.0, c, -s], [0.0, s, c]])
    R = A @ Qx

    R = R.at[2, 2].add(eps)
    d = jnp.sqrt(R[2, 2] ** 2 + R[2, 0] ** 2)
    c, s = R[2, 2] / d, R[2, 0] / d
    Qy = jnp.array([[c, 0.0, s], [0.0, 1.0, 0.0], [-s, 0.0, c]])
    R = R @ Qy

    R = R.at[1, 1].add(eps)
    d = jnp.sqrt(R[1, 1] ** 2 + R[1, 0] ** 2)
    c, s = -R[1, 1] / d, R[1, 0] / d
    Qz = jnp.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]])
    R = R @ Qz

    Q = Qz.T @ Qy.T @ Qx.T
    # Make diagonal of R positive.
    sign = jnp.sign(jnp.diag(R))
    sign = jnp.where(sign == 0, 1.0, sign)
    R = R * sign[None, :]
    Q = Q * sign[:, None]
    return R, Q


def decompose_camera(P: jax.Array) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Decompose a 3x4 projection matrix into (K, R, t).

    Mirrors ``DecomposeCamera`` + the t = -R @ C assembly
    (reference: pytorch/Datagenerators.py:404-413, 471-512).
    """
    M = P[:, :3]
    p1, p2, p3, p4 = P[:, 0], P[:, 1], P[:, 2], P[:, 3]
    X = jnp.linalg.det(jnp.stack([p2, p3, p4], axis=1))
    Y = -jnp.linalg.det(jnp.stack([p1, p3, p4], axis=1))
    Z = jnp.linalg.det(jnp.stack([p1, p2, p4], axis=1))
    T = -jnp.linalg.det(M)
    C = jnp.stack([X, Y, Z]) / T
    K, R = rq3(M)
    t = -(R @ C)[:, None]
    return K, R, t


def crop_adjusted_matrices(
    Ks: jax.Array,
    Rs: jax.Array,
    ts: jax.Array,
    cropzone: jax.Array,
    crop_size: int = 192,
) -> tuple[jax.Array, jax.Array]:
    """Per-crop camera matrices: shift each K's principal point by the crop.

    Reference: ``get_cropped_camera_matrices``
    (pytorch/Datagenerators.py:382-402): dx = x_crop,
    dy = SENSOR_HEIGHT + 1 - y_crop - crop_size; P' = K' [R|t], normalised by
    Frobenius norm; plus pinv, likewise normalised. The resulting frame is
    ``(x_local, crop_size - y_local)`` — crop-local with y flipped.

    Args:
      Ks: (4, 3, 3); Rs: (4, 3, 3); ts: (4, 3, 1); cropzone: (4, 2) [y, x].
      crop_size: crop window height (the reference hard-codes 192; pass the
        actual image size for non-192 datasets).

    Returns:
      (Ps (4, 3, 4), P_invs (4, 4, 3)).
    """

    def per_cam(K, R, t, cz):
        K = K / K[2, 2]
        dx = cz[1]
        dy = SENSOR_HEIGHT + 1 - cz[0] - crop_size
        Kp = K.at[0, 2].add(-dx).at[1, 2].add(-dy)
        P = Kp @ jnp.concatenate([R, t], axis=1)
        P = P / jnp.linalg.norm(P)
        Pinv = jnp.linalg.pinv(P)
        Pinv = Pinv / jnp.linalg.norm(Pinv)
        return P, Pinv

    return jax.vmap(per_cam)(Ks, Rs, ts, cropzone.astype(jnp.float32))


def compose_affine_into_cameras(
    mats: jax.Array, P: jax.Array, P_inv: jax.Array,
    crop_size: int = 192,
) -> tuple[jax.Array, jax.Array]:
    """Fold 2D image-space affines into camera matrices: P' = F @ M @ F @ P.

    When a training view is warped by a forward affine M (pixel coords
    p' = M p, last row (0, 0, 1) so homogeneous scale is preserved), the
    camera that explains the warped pixels keeps the FTL projection of any
    3D latent on the warped pixels — augmentation stays geometry-consistent
    for the disentangled models (the reference's ``CameraMatrixGenerator``
    simply never augments, pytorch/Datagenerators.py:242-270; composing
    lets us augment WITH consistent geometry instead of not at all).

    Convention: the crop-adjusted cameras (:func:`crop_adjusted_matrices`)
    project to (x, v) with image ROW = crop_size - v — the ``uncrop`` y-flip
    (pytorch/Datagenerators.py:416-424) baked into the dy shift; verified:
    v = y_full - dy = crop_size - row independent of sensor size and crop.
    The warp M acts on (x, row), so the composition conjugates by the
    self-inverse flip F = [[1,0,0],[0,-1,crop_size],[0,0,1]]: P' = (F M F) P.
    ``crop_size`` must match the one given to :func:`crop_adjusted_matrices`
    (the reference hard-codes 192).
    Plain M @ P would encode a rotation of -theta in the camera's
    convention — per-sample camera/target inconsistency.

    For full-row-rank P (3x4), ``pinv(A @ P) = pinv(P) @ inv(A)`` exactly,
    so the pseudo-inverse updates without an SVD. Both outputs are
    re-normalised to unit Frobenius norm per camera, matching the
    convention of :func:`crop_adjusted_matrices`
    (pytorch/Datagenerators.py:398-401).

    Args:
      mats: (..., 3, 3) forward affines in image (x, row) coords;
        P: (..., 3, 4); P_inv: (..., 4, 3) (leading axes broadcast,
        e.g. (B, V, ...)).

    Returns:
      (P', P_inv') with the same shapes.
    """
    flip = jnp.array(
        [[1.0, 0.0, 0.0], [0.0, -1.0, float(crop_size)], [0.0, 0.0, 1.0]],
        jnp.float32,
    )
    mats = flip @ mats.astype(jnp.float32) @ flip
    new_P = mats @ P.astype(jnp.float32)
    new_P = new_P / jnp.linalg.norm(new_P, axis=(-2, -1), keepdims=True)
    new_P_inv = P_inv.astype(jnp.float32) @ jnp.linalg.inv(mats)
    new_P_inv = new_P_inv / jnp.linalg.norm(
        new_P_inv, axis=(-2, -1), keepdims=True
    )
    return new_P.astype(P.dtype), new_P_inv.astype(P_inv.dtype)


# ---------------------------------------------------------------------------
# Feature Transform Layer math (disentanglement model)
# ---------------------------------------------------------------------------
def ftl_project(latent: jax.Array, P: jax.Array) -> jax.Array:
    """FTL: project a canonical latent through a camera matrix.

    The latent's channel axis is viewed as G groups of 4 (homogeneous 3D-ish
    coordinates) and each group is multiplied by the (3, 4) camera, yielding
    G groups of 3 (reference: pytorch/CNNs.py:329-339, NHWC here).

    Args:
      latent: (..., H, W, 4*G); P: (..., 3, 4) broadcastable per batch.

    Returns:
      (..., H, W, 3*G).
    """
    *lead, h, w, c = latent.shape
    g = c // 4
    z = latent.reshape(*lead, h, w, g, 4)
    # einsum over the homogeneous coordinate: out[..., g, i] = P[i, j] z[..., g, j]
    out = jnp.einsum("...hwgj,...ij->...hwgi", z, P)
    return out.reshape(*lead, h, w, g * 3)


def ftl_inverse(latent: jax.Array, P_inv: jax.Array) -> jax.Array:
    """Inverse FTL: lift per-view latents to canonical space via pinv(P).

    Reference: pytorch/CNNs.py:343-352 (groups of 3 -> groups of 4).
    """
    *lead, h, w, c = latent.shape
    g = c // 3
    z = latent.reshape(*lead, h, w, g, 3)
    out = jnp.einsum("...hwgj,...ij->...hwgi", z, P_inv)
    return out.reshape(*lead, h, w, g * 4)
