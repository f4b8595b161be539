"""Ray-triangle intersection as a matrix multiply (MXU path).

The TPU's FLOPs live in the 128x128 systolic array; elementwise VPU code
leaves them idle. Möller-Trumbore is secretly bilinear: with n = e1 x e2,

    det   = -(d . n)                                   (linear in d)
    t_num =  (o . n) - (v0 . n)                        (affine in o)
    u_num =  d . (e2 x o) - d . (e2 x v0)  = d^T skew(e2) o - d.(e2 x v0)
    v_num =  d . (o x e1) - d . (v0 x e1)  = -d^T skew(e1) o - d.(v0 x e1)

so for a feature vector f(ray) = [1, o, d, vec(d (x) o)] in R^16 every
per-triangle quantity is one dot product: the whole batch-vs-all-triangles
test is a single (B, 16) @ (16, 4F) GEMM, followed by cheap elementwise
validity math and a first-win min-reduction. Equivalent to the reference's
per-lane MT (pt_intersect.cl:92-129) up to float reassociation.

Works under NumPy (einsum) and JAX (jnp.dot -> MXU). The coefficient matrix
is built from the triangle SoA inside the traced function — XLA hoists it
out of frame/scan loops, and it stays differentiable w.r.t. geometry.
"""

from __future__ import annotations

import numpy as np

from pbr_tpu.ops.intersect import INF
from pbr_tpu.ops.vec import Vec3
from pbr_tpu.scene.types import TrianglesSoA
from pbr_tpu.utils.config import EPSILON5


def _is_jax(xp) -> bool:
    return xp.__name__.startswith("jax")


def triangle_coefficients(xp, tris: TrianglesSoA):
    """Build the (16, 4F) coefficient matrix W.

    Feature order: [1, ox, oy, oz, dx, dy, dz, dx*ox, dx*oy, dx*oz,
    dy*ox, dy*oy, dy*oz, dz*ox, dz*oy, dz*oz].
    Output order per face: [det, t_num, u_num, v_num] interleaved as
    4 blocks of F columns (W[:, 0:F] = det coeffs, etc.) for contiguous
    slicing.
    """
    v0, e1, e2 = tris.v0, tris.e1, tris.e2
    nx = e1.y * e2.z - e1.z * e2.y
    ny = e1.z * e2.x - e1.x * e2.z
    nz = e1.x * e2.y - e1.y * e2.x
    f = v0.x.shape[0]
    zeros = xp.zeros((f,), dtype=xp.float32)

    def col(c0, o, d, dxo):
        """Stack one output's coefficients into a (16, F) block."""
        rows = [c0] + list(o) + list(d) + [dxo[i][j] for i in range(3) for j in range(3)]
        return xp.stack(rows, axis=0)

    z3 = (zeros, zeros, zeros)
    zdxo = [[zeros] * 3 for _ in range(3)]

    # det = -(d . n)
    w_det = col(zeros, z3, (-nx, -ny, -nz), zdxo)
    # t_num = (o . n) - v0 . n
    w_t = col(-(v0.x * nx + v0.y * ny + v0.z * nz), (nx, ny, nz), z3, zdxo)
    # u_num: d^T skew(e2) o - d . (e2 x v0)
    e2xv0 = (
        e2.y * v0.z - e2.z * v0.y,
        e2.z * v0.x - e2.x * v0.z,
        e2.x * v0.y - e2.y * v0.x,
    )
    sk_e2 = [
        [zeros, -e2.z, e2.y],
        [e2.z, zeros, -e2.x],
        [-e2.y, e2.x, zeros],
    ]
    w_u = col(zeros, z3, (-e2xv0[0], -e2xv0[1], -e2xv0[2]), sk_e2)
    # v_num: -d^T skew(e1) o - d . (v0 x e1)
    v0xe1 = (
        v0.y * e1.z - v0.z * e1.y,
        v0.z * e1.x - v0.x * e1.z,
        v0.x * e1.y - v0.y * e1.x,
    )
    sk_ne1 = [
        [zeros, e1.z, -e1.y],
        [-e1.z, zeros, e1.x],
        [e1.y, -e1.x, zeros],
    ]
    w_v = col(zeros, z3, (-v0xe1[0], -v0xe1[1], -v0xe1[2]), sk_ne1)

    return xp.concatenate([w_det, w_t, w_u, w_v], axis=1)  # (16, 4F)


def ray_features(xp, o: Vec3, d: Vec3):
    """(B..., 16) feature tensor for the GEMM (flattened batch dims)."""
    ones = xp.ones_like(o.x)
    feats = [
        ones,
        o.x, o.y, o.z,
        d.x, d.y, d.z,
        d.x * o.x, d.x * o.y, d.x * o.z,
        d.y * o.x, d.y * o.y, d.y * o.z,
        d.z * o.x, d.z * o.y, d.z * o.z,
    ]
    return xp.stack(feats, axis=-1)


def intersect_gemm(xp, o: Vec3, d: Vec3, tris: TrianglesSoA):
    """Nearest-hit over all triangles via one GEMM. Contract identical to
    ``intersect_brute``: (t, face) with t=+inf / face=-1 on miss, first face
    wins ties."""
    nf = int(tris.v0.x.shape[0])
    w = triangle_coefficients(xp, tris)  # (16, 4F)
    shape = o.x.shape
    feats = ray_features(xp, o, d).reshape(-1, 16)  # (B, 16)

    if _is_jax(xp):
        import jax

        out = jax.lax.dot_general(
            feats,
            w,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=xp.float32,
        )
    else:
        out = feats @ w
    det = out[:, 0:nf]
    t_num = out[:, nf : 2 * nf]
    u_num = out[:, 2 * nf : 3 * nf]
    v_num = out[:, 3 * nf : 4 * nf]

    inv_det = np.float32(1.0) / det
    t = t_num * inv_det
    u = u_num * inv_det
    v = v_num * inv_det
    valid = (t >= np.float32(EPSILON5)) & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
    t = xp.where(valid, t, INF)
    face = xp.argmin(t, axis=-1).astype(xp.int32)
    if _is_jax(xp):
        t_best = xp.take_along_axis(t, face[:, None].astype(xp.int32), axis=-1)[:, 0]
    else:
        t_best = np.take_along_axis(t, face[:, None].astype(np.int64), axis=-1)[:, 0]
    face = xp.where(xp.isfinite(t_best), face, xp.int32(-1))
    return t_best.reshape(shape), face.reshape(shape)
