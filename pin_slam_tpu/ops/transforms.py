"""SO(3)/SE(3)/quaternion math in JAX (f32 on device) and NumPy (f64 on host).

The reference keeps all poses in torch.float64 (reference: utils/config.py:314-316).
On TPU we instead keep pose *chains* in host-side float64 NumPy and run all
per-frame device math in float32 in a sensor-anchored frame, which keeps
coordinates small and well-conditioned. Quaternions are (w, x, y, z).

Replaces the torch quaternion helpers (reference: utils/tools.py:428-514) and
the tracker Lie helpers (reference: utils/tracker.py:773-810).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# --------------------------------------------------------------------------
# JAX (device, f32)
# --------------------------------------------------------------------------


def skew(v: jnp.ndarray) -> jnp.ndarray:
    """Skew-symmetric matrix of batched 3-vectors [..., 3] -> [..., 3, 3]."""
    zeros = jnp.zeros_like(v[..., 0])
    return jnp.stack(
        [
            jnp.stack([zeros, -v[..., 2], v[..., 1]], axis=-1),
            jnp.stack([v[..., 2], zeros, -v[..., 0]], axis=-1),
            jnp.stack([-v[..., 1], v[..., 0], zeros], axis=-1),
        ],
        axis=-2,
    )


def so3_exp(w: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues' formula, batched axis-angle [..., 3] -> rotation [..., 3, 3].

    Taylor expansions near zero, with *gradient-safe* guards: the untaken
    `jnp.where` branch must stay finite (0/0 there poisons the backward pass
    — e.g. bundle adjustment initializes pose deltas at exactly zero).
    """
    theta2 = jnp.sum(w * w, axis=-1)
    small = theta2 < 1e-10
    t2_safe = jnp.where(small, 1.0, theta2)  # keep untaken branch finite
    theta = jnp.sqrt(t2_safe)
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta2 / 24.0,
                  (1.0 - jnp.cos(theta)) / t2_safe)
    S = skew(w)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), S.shape)
    return eye + a[..., None, None] * S + b[..., None, None] * (S @ S)


def se3_exp(xi: jnp.ndarray) -> jnp.ndarray:
    """se(3) twist [..., 6] (rot, trans ordering as in the reference
    tracker J = [p x grad, grad]) -> [..., 4, 4] homogeneous transform.

    Note: the reference applies the translation directly (T[:3,3] = t) rather
    than through the SE(3) V matrix (reference: utils/tracker.py:677-679);
    we do the same for parity of the GN update rule.
    """
    R = so3_exp(xi[..., :3])
    t = xi[..., 3:]
    T = jnp.zeros(xi.shape[:-1] + (4, 4), dtype=xi.dtype)
    T = T.at[..., :3, :3].set(R)
    T = T.at[..., :3, 3].set(t)
    T = T.at[..., 3, 3].set(1.0)
    return T


def rotation_angle(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation angle (rad) of [..., 3, 3] (reference: utils/tracker.py:798-810)."""
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos = jnp.clip((trace - 1.0) / 2.0, -1.0, 1.0)
    return jnp.arccos(cos)


def transform_points(points: jnp.ndarray, T: jnp.ndarray) -> jnp.ndarray:
    """Apply one 4x4 transform to [N, 3] points (reference: utils/tools.py:534-553)."""
    return points @ T[:3, :3].T + T[:3, 3]


def transform_points_batch(points: jnp.ndarray, T: jnp.ndarray) -> jnp.ndarray:
    """Apply per-point 4x4 transforms [N,4,4] to [N,3] points
    (reference: utils/tools.py:556-580)."""
    return jnp.einsum("nij,nj->ni", T[:, :3, :3], points) + T[:, :3, 3]


def transform_points_by_ts(points: jnp.ndarray, ts: jnp.ndarray,
                           diffs: jnp.ndarray) -> jnp.ndarray:
    """Transform [N,3] points by per-point timestamp-indexed 4x4 transforms
    diffs [maxT,4,4], without materializing an [N,4,4] gather: on TPU the
    trailing (4,4) dims pad to full (8,128) tiles, so `diffs[ts]` costs
    ~2000 bytes/point of HBM (a 24M-sample pool transform = 49 GB, OOM).
    Twelve separate [N] coefficient gathers have no tile padding and fuse
    into the elementwise affine math."""
    ts = jnp.clip(ts, 0, diffs.shape[0] - 1)
    x, y, z = points[:, 0], points[:, 1], points[:, 2]
    out = []
    for i in range(3):
        r0 = diffs[:, i, 0][ts]
        r1 = diffs[:, i, 1][ts]
        r2 = diffs[:, i, 2][ts]
        t = diffs[:, i, 3][ts]
        out.append(r0 * x + r1 * y + r2 * z + t)
    return jnp.stack(out, axis=-1)


# quaternions (w, x, y, z) --------------------------------------------------


def quat_multiply(q1: jnp.ndarray, q2: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product of batched quaternions [..., 4]."""
    w1, x1, y1, z1 = q1[..., 0], q1[..., 1], q1[..., 2], q1[..., 3]
    w2, x2, y2, z2 = q2[..., 0], q2[..., 1], q2[..., 2], q2[..., 3]
    return jnp.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        axis=-1,
    )


def quat_rotate(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vectors v [..., 3] by quaternions q [..., 4]."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    u = jnp.stack([x, y, z], axis=-1)
    uv = jnp.cross(u, v)
    uuv = jnp.cross(u, uv)
    return v + 2.0 * (w[..., None] * uv + uuv)


def rotmat_to_quat(R: jnp.ndarray) -> jnp.ndarray:
    """Batched rotation matrix [..., 3, 3] -> quaternion [..., 4] (w,x,y,z).

    Branch-free Shepperd-style conversion safe under jit.
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    def safe_sqrt(x):
        return jnp.sqrt(jnp.maximum(x, 1e-12))

    qw0 = safe_sqrt(1.0 + tr) / 2.0
    q0 = jnp.stack(
        [qw0, (m21 - m12) / (4 * qw0), (m02 - m20) / (4 * qw0),
         (m10 - m01) / (4 * qw0)], axis=-1)
    qx1 = safe_sqrt(1.0 + m00 - m11 - m22) / 2.0
    q1 = jnp.stack(
        [(m21 - m12) / (4 * qx1), qx1, (m01 + m10) / (4 * qx1),
         (m02 + m20) / (4 * qx1)], axis=-1)
    qy2 = safe_sqrt(1.0 - m00 + m11 - m22) / 2.0
    q2 = jnp.stack(
        [(m02 - m20) / (4 * qy2), (m01 + m10) / (4 * qy2), qy2,
         (m12 + m21) / (4 * qy2)], axis=-1)
    qz3 = safe_sqrt(1.0 - m00 - m11 + m22) / 2.0
    q3 = jnp.stack(
        [(m10 - m01) / (4 * qz3), (m02 + m20) / (4 * qz3),
         (m12 + m21) / (4 * qz3), qz3], axis=-1)

    cond1 = (m00 > m11) & (m00 > m22)
    cond2 = m11 > m22
    q_neg = jnp.where(cond1[..., None], q1, jnp.where(cond2[..., None], q2, q3))
    q = jnp.where((tr > 0)[..., None], q0, q_neg)
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


# --------------------------------------------------------------------------
# NumPy (host, f64) — pose chain bookkeeping
# --------------------------------------------------------------------------


def np_rotation_angle_deg(R: np.ndarray) -> float:
    tr = np.trace(R[:3, :3])
    return float(np.degrees(np.arccos(np.clip((tr - 1.0) / 2.0, -1.0, 1.0))))


def np_se3_inv(T: np.ndarray) -> np.ndarray:
    Ti = np.eye(4, dtype=np.float64)
    Ti[:3, :3] = T[:3, :3].T
    Ti[:3, 3] = -T[:3, :3].T @ T[:3, 3]
    return Ti


def np_slerp_rotmats(R: np.ndarray, ratios: np.ndarray) -> np.ndarray:
    """Interpolate from identity to rotation R by per-point ratios [N] -> [N,3,3].

    Host-side axis-angle scaling (replaces roma.rotmat_slerp,
    reference: utils/tools.py:770).
    """
    angle = np.arccos(np.clip((np.trace(R) - 1.0) / 2.0, -1.0, 1.0))
    if angle < 1e-9:
        return np.broadcast_to(np.eye(3), (ratios.shape[0], 3, 3)).copy()
    axis = np.array([
        R[2, 1] - R[1, 2], R[0, 2] - R[2, 0], R[1, 0] - R[0, 1]
    ]) / (2.0 * np.sin(angle))
    thetas = ratios * angle
    K = np.array([
        [0, -axis[2], axis[1]],
        [axis[2], 0, -axis[0]],
        [-axis[1], axis[0], 0],
    ])
    sin_t = np.sin(thetas)[:, None, None]
    cos_t = np.cos(thetas)[:, None, None]
    eye = np.eye(3)[None]
    return eye + sin_t * K[None] + (1.0 - cos_t) * (K @ K)[None]
