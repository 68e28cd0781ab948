"""SE(3) rigid-transform algebra as JAX pytrees.

A ground-up functional replacement for the reference's torch ``Rigid`` /
``Rotation`` classes (src/mdgen/rigid_utils.py:282,813). Rotations are carried
as (..., 3, 3) matrices — the MXU-friendly representation — with quaternion
conversion helpers for the 7-tensor latent encoding
(quat4 ‖ trans3, src/mdgen/rigid_utils.py:168,191 conventions).

All ops are shape-polymorphic over leading batch dims and jit/vmap/grad-safe.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

_PREC = jax.lax.Precision.HIGHEST


# ---------------------------------------------------------------------------
# Quaternion <-> rotation matrix (scalar-first (w, x, y, z) convention)
# ---------------------------------------------------------------------------
def quat_to_rotmat(quat: jnp.ndarray) -> jnp.ndarray:
    """Unit-norm-insensitive quaternion to rotation matrix; quat (..., 4)."""
    w, x, y, z = jnp.moveaxis(quat, -1, 0)
    ww, xx, yy, zz = w * w, x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    rows = [
        [ww + xx - yy - zz, 2 * (xy - wz), 2 * (xz + wy)],
        [2 * (xy + wz), ww - xx + yy - zz, 2 * (yz - wx)],
        [2 * (xz - wy), 2 * (yz + wx), ww - xx - yy + zz],
    ]
    return jnp.stack([jnp.stack(r, axis=-1) for r in rows], axis=-2)


def rotmat_to_quat(rot: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix to quaternion, branch-free Shepperd construction.

    Sign convention is arbitrary (as in the reference's eigenvector method,
    src/mdgen/rigid_utils.py:191-211); callers needing a canonical sign must
    normalize, e.g. to a non-negative real part.
    """
    m00, m01, m02 = rot[..., 0, 0], rot[..., 0, 1], rot[..., 0, 2]
    m10, m11, m12 = rot[..., 1, 0], rot[..., 1, 1], rot[..., 1, 2]
    m20, m21, m22 = rot[..., 2, 0], rot[..., 2, 1], rot[..., 2, 2]

    # four candidate constructions, each stable in a different region
    qw = jnp.stack([1.0 + m00 + m11 + m22, m21 - m12, m02 - m20, m10 - m01], -1)
    qx = jnp.stack([m21 - m12, 1.0 + m00 - m11 - m22, m01 + m10, m02 + m20], -1)
    qy = jnp.stack([m02 - m20, m01 + m10, 1.0 - m00 + m11 - m22, m12 + m21], -1)
    qz = jnp.stack([m10 - m01, m02 + m20, m12 + m21, 1.0 - m00 - m11 + m22], -1)

    traces = jnp.stack(
        [1.0 + m00 + m11 + m22, 1.0 + m00 - m11 - m22, 1.0 - m00 + m11 - m22, 1.0 - m00 - m11 + m22],
        -1,
    )
    best = jnp.argmax(traces, axis=-1)
    cand = jnp.stack([qw, qx, qy, qz], axis=-2)  # (..., 4 candidates, 4)
    q = jnp.take_along_axis(cand, best[..., None, None].astype(jnp.int32), axis=-2)[..., 0, :]
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def quat_multiply(q1: jnp.ndarray, q2: jnp.ndarray) -> jnp.ndarray:
    w1, x1, y1, z1 = jnp.moveaxis(q1, -1, 0)
    w2, x2, y2, z2 = jnp.moveaxis(q2, -1, 0)
    return jnp.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        axis=-1,
    )


# ---------------------------------------------------------------------------
# Rigid pytree
# ---------------------------------------------------------------------------
@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Rigid:
    """A batch of SE(3) transforms: rotation matrices (..., 3, 3) + translations (..., 3)."""

    rot: jnp.ndarray
    trans: jnp.ndarray

    # -- constructors -------------------------------------------------------
    @staticmethod
    def identity(shape: Tuple[int, ...], dtype=jnp.float32) -> "Rigid":
        rot = jnp.broadcast_to(jnp.eye(3, dtype=dtype), (*shape, 3, 3))
        return Rigid(rot, jnp.zeros((*shape, 3), dtype=dtype))

    @staticmethod
    def from_quat_trans(quat: jnp.ndarray, trans: jnp.ndarray, normalize: bool = True) -> "Rigid":
        if normalize:
            quat = quat / jnp.linalg.norm(quat, axis=-1, keepdims=True)
        return Rigid(quat_to_rotmat(quat), trans)

    @staticmethod
    def from_tensor_7(t7: jnp.ndarray, normalize_quats: bool = True) -> "Rigid":
        return Rigid.from_quat_trans(t7[..., :4], t7[..., 4:], normalize=normalize_quats)

    @staticmethod
    def from_tensor_4x4(m: jnp.ndarray) -> "Rigid":
        return Rigid(m[..., :3, :3], m[..., :3, 3])

    @staticmethod
    def from_3_points(
        p_neg_x_axis: jnp.ndarray, origin: jnp.ndarray, p_xy_plane: jnp.ndarray, eps: float = 1e-8
    ) -> "Rigid":
        """Gram-Schmidt frame from 3 points (AF2 algorithm 21); columns = (e0, e1, e2).

        Matches src/mdgen/rigid_utils.py:1176-1218: e0 points from
        ``p_neg_x_axis`` to ``origin``, e1 toward ``p_xy_plane``.
        """
        e0 = origin - p_neg_x_axis
        e1 = p_xy_plane - origin
        e0 = e0 / jnp.sqrt(jnp.sum(e0 * e0, axis=-1, keepdims=True) + eps)
        e1 = e1 - e0 * jnp.sum(e0 * e1, axis=-1, keepdims=True)
        e1 = e1 / jnp.sqrt(jnp.sum(e1 * e1, axis=-1, keepdims=True) + eps)
        e2 = jnp.cross(e0, e1)
        rot = jnp.stack([e0, e1, e2], axis=-1)  # columns
        return Rigid(rot, origin)

    # -- core algebra -------------------------------------------------------
    def compose(self, other: "Rigid") -> "Rigid":
        # geometry runs in full f32 even on TPU (bf16 matmul error is fatal here)
        rot = jnp.einsum("...ij,...jk->...ik", self.rot, other.rot, precision=_PREC)
        trans = jnp.einsum("...ij,...j->...i", self.rot, other.trans, precision=_PREC) + self.trans
        return Rigid(rot, trans)

    def invert(self) -> "Rigid":
        rot_inv = jnp.swapaxes(self.rot, -1, -2)
        return Rigid(rot_inv, -jnp.einsum("...ij,...j->...i", rot_inv, self.trans, precision=_PREC))

    def apply(self, pts: jnp.ndarray) -> jnp.ndarray:
        """Apply to points (..., 3); leading dims broadcast against self."""
        return jnp.einsum("...ij,...j->...i", self.rot, pts, precision=_PREC) + self.trans

    def invert_apply(self, pts: jnp.ndarray) -> jnp.ndarray:
        return jnp.einsum("...ji,...j->...i", self.rot, pts - self.trans, precision=_PREC)

    # -- encodings ----------------------------------------------------------
    def to_tensor_7(self) -> jnp.ndarray:
        return jnp.concatenate([rotmat_to_quat(self.rot), self.trans], axis=-1)

    def to_tensor_4x4(self) -> jnp.ndarray:
        shape = self.rot.shape[:-2]
        m = jnp.zeros((*shape, 4, 4), dtype=self.rot.dtype)
        m = m.at[..., :3, :3].set(self.rot)
        m = m.at[..., :3, 3].set(self.trans)
        return m.at[..., 3, 3].set(1.0)

    # -- structural ---------------------------------------------------------
    @property
    def shape(self) -> Tuple[int, ...]:
        return self.trans.shape[:-1]

    @property
    def dtype(self):
        return self.trans.dtype

    def __getitem__(self, idx) -> "Rigid":
        """Index over batch dims only (the trailing matrix/vector dims are preserved)."""
        if not isinstance(idx, tuple):
            idx = (idx,)
        return Rigid(
            self.rot[idx + (slice(None), slice(None))], self.trans[idx + (slice(None),)]
        )

    def unsqueeze(self, axis: int) -> "Rigid":
        rot_axis = axis if axis >= 0 else axis - 2
        trans_axis = axis if axis >= 0 else axis - 1
        return Rigid(jnp.expand_dims(self.rot, rot_axis), jnp.expand_dims(self.trans, trans_axis))

    @staticmethod
    def cat(rigids, axis: int) -> "Rigid":
        rot_axis = axis if axis >= 0 else axis - 2
        trans_axis = axis if axis >= 0 else axis - 1
        return Rigid(
            jnp.concatenate([r.rot for r in rigids], axis=rot_axis),
            jnp.concatenate([r.trans for r in rigids], axis=trans_axis),
        )

    def scale_translation(self, factor) -> "Rigid":
        return Rigid(self.rot, self.trans * factor)

    def astype(self, dtype) -> "Rigid":
        return Rigid(self.rot.astype(dtype), self.trans.astype(dtype))


def rigid_vecs_flip() -> np.ndarray:
    """diag(-1, 1, -1) used to flip backbone frames (src/mdgen/geometry.py:227-230)."""
    return np.diag(np.array([-1.0, 1.0, -1.0], dtype=np.float32))
