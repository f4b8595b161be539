"""Phong-tessellation patch intersection (optional feature).

Vectorized re-derivation of the reference's curved-patch intersector
(``pt_phongtess.cl``, after "Direct Ray Tracing of Phong Tessellation",
Ogaki & Tokuyoshi — cited at pt_intersect.cl:170): triangles whose vertex
normals differ are treated as quadratic Phong patches controlled by
``alpha`` (config ``render.phong_tessellation``); the ray is converted to
two Hesse-form planes (pt_utils.cl:208-218), the patch intersection reduces
to a cubic in one plane parameter then quadratics in a barycentric
coordinate, with a Newton polish on every root (pt_utils.cl:108-199
solveCubic).

Everything is elementwise over ray batches with masks replacing the
reference's scalar early-outs; the per-face scalar loop mirrors
``intersect_brute``. Off by default — the reference ships it disabled
(config.json:102-105) and its CHANGELOG notes artifacts; it is numerically
the most delicate kernel (SURVEY.md §7 "Hard parts").
"""

from __future__ import annotations

import numpy as np

from pbr_tpu.ops.intersect import INF, moller_trumbore
from pbr_tpu.ops.vec import Vec3, project_on_plane, safe_normalized, where3
from pbr_tpu.scene.types import TrianglesSoA
from pbr_tpu.utils.config import EPSILON5

F32 = np.float32
_THIRD = F32(1.0 / 3.0)
_THIRD_HALF = F32(1.0 / 6.0)


def _guard_div(xp, num, den):
    ok = den != 0.0
    return xp.where(ok, num / xp.where(ok, den, F32(1.0)), F32(0.0))


def solve_cubic(xp, a0, a1, a2, a3):
    """Vectorized solveCubic (pt_utils.cl:108-199): roots of
    a0 x³ + a1 x² + a2 x + a3 = 0 with Newton polish.

    Returns ``(x0, x1, x2, count)``; only the first ``count`` slots are
    meaningful (count in {0,1,2,3}).
    """
    with np.errstate(all="ignore") if xp is np else _null():
        # --- cubic branch -------------------------------------------------
        w = _guard_div(xp, a1, a0) * _THIRD
        p_lin = _guard_div(xp, a2, a0) * _THIRD - w * w
        p = p_lin * p_lin * p_lin
        q = F32(0.5) * _guard_div(xp, a2 * w - a3, a0) - w * w * w
        dis = q * q + p

        # three real roots (dis < 0); reference computes q / sqrt(-p)
        phi = xp.arccos(xp.clip(_guard_div(xp, q, xp.sqrt(xp.maximum(-p, 0.0))), -1.0, 1.0))
        pp = 2.0 * xp.power(xp.maximum(-p, 0.0), _THIRD_HALF)
        u0 = pp * xp.cos(phi * _THIRD) - w
        u1 = pp * xp.cos((phi + F32(2.0 * np.pi)) * _THIRD) - w
        u2 = pp * xp.cos((phi + F32(4.0 * np.pi)) * _THIRD) - w
        c_x0 = xp.minimum(u0, xp.minimum(u1, u2))
        c_x2 = xp.maximum(u0, xp.maximum(u1, u2))
        c_x1 = xp.maximum(
            xp.minimum(u0, u1),
            xp.maximum(xp.minimum(u0, u2), xp.minimum(u1, u2)),
        )

        def newton3(x):
            num = a3 + x * (a2 + x * (a1 + x * a0))
            den = a2 + x * (2.0 * a1 + x * 3.0 * a0)
            return x - _guard_div(xp, num, den)

        c_x0, c_x1, c_x2 = newton3(c_x0), newton3(c_x1), newton3(c_x2)

        # single real root (dis >= 0)
        sq = xp.sqrt(xp.maximum(dis, 0.0))
        s_x0 = newton3(xp.cbrt(q + sq) + xp.cbrt(q - sq) - w)

        # --- quadratic branch --------------------------------------------
        pq = F32(0.5) * _guard_div(xp, a2, a1)
        qdis = pq * pq - _guard_div(xp, a3, a1)
        qs = xp.sqrt(xp.maximum(qdis, 0.0))

        def newton2(x):
            num = a3 + x * (a2 + x * a1)
            den = a2 + x * 2.0 * a1
            return x - _guard_div(xp, num, den)

        q_x0 = newton2(-pq - qs)
        q_x1 = newton2(-pq + qs)

        # --- linear branch ------------------------------------------------
        l_x0 = _guard_div(xp, -a3, a2)

        is_cubic = xp.abs(a0) > 0.0
        is_quad = ~is_cubic & (xp.abs(a1) > 0.0)
        is_lin = ~is_cubic & ~is_quad & (xp.abs(a2) > 0.0)
        three = is_cubic & (dis < 0.0)
        one_c = is_cubic & ~three
        two_q = is_quad & (qdis >= 0.0)

        x0 = xp.where(
            three, c_x0, xp.where(one_c, s_x0, xp.where(two_q, q_x0, l_x0))
        )
        x1 = xp.where(three, c_x1, xp.where(two_q, q_x1, F32(-1.0)))
        x2 = xp.where(three, c_x2, F32(-1.0))
        count = (
            xp.where(three, 3, 0)
            + xp.where(one_c, 1, 0)
            + xp.where(two_q, 2, 0)
            + xp.where(is_lin, 1, 0)
        ).astype(xp.int32)
        return x0, x1, x2, count


class _null:
    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


def _ray_planes(xp, o: Vec3, d: Vec3):
    """Two planes intersecting in the ray (getPlanesFromRay,
    pt_utils.cl:208-218)."""
    n1 = safe_normalized(o.cross(d))
    n2 = safe_normalized(n1.cross(d))
    return n1, n2, n1.dot(o), n2.dot(o)


def _axis_component(xp, v: Vec3, domain):
    """v[domain] per-lane (getBestRayDomain consumer, pt_phongtess.cl:196)."""
    return xp.where(domain == 0, v.x, xp.where(domain == 1, v.y, v.z))


def phongtess_patch_intersect(
    xp, o: Vec3, d: Vec3, P1: Vec3, P2: Vec3, P3: Vec3, N1: Vec3, N2: Vec3, N3: Vec3,
    alpha, t_best, t_near=None, t_far=None,
):
    """Ray vs one Phong patch (phongTessTriAndRayIntersect,
    pt_phongtess.cl:56-212), elementwise over the ray batch.

    Returns ``(t, u, v, valid)`` — the nearest acceptable root with
    t in [|t_near|, min(t_best, t_far)].
    """
    if t_near is None:
        t_near = F32(0.0)
    if t_far is None:
        t_far = INF

    E01 = P2 - P1
    E12 = P3 - P2
    E20 = P1 - P3
    C1 = (N2 * N2.dot(E01) - N1 * N1.dot(E01)) * alpha
    C2 = (N3 * N3.dot(E12) - N2 * N2.dot(E12)) * alpha
    C3 = (N1 * N1.dot(E20) - N3 * N3.dot(E20)) * alpha

    n1, n2, o1, o2 = _ray_planes(xp, o, d)
    a = (-n1).dot(C3)
    b = (-n1).dot(C2)
    c = n1.dot(P3) - o1
    dd = n1.dot(C1 - C2 - C3) * F32(0.5)
    e = n1.dot(C3 + E20) * F32(0.5)
    f = n1.dot(C2 - E12) * F32(0.5)
    l = (-n2).dot(C3)
    m = (-n2).dot(C2)
    n_ = n2.dot(P3) - o2
    o_ = n2.dot(C1 - C2 - C3) * F32(0.5)
    p = n2.dot(C3 + E20) * F32(0.5)
    q = n2.dot(C2 - E12) * F32(0.5)

    a3c = (l * m * n_ + 2.0 * o_ * p * q) - (l * q * q + m * p * p + n_ * o_ * o_)
    a2c = (a * m * n_ + l * b * n_ + l * m * c + 2.0 * (dd * p * q + o_ * e * q + o_ * p * f)) - (
        a * q * q + b * p * p + c * o_ * o_ + 2.0 * (l * f * q + m * e * p + n_ * dd * o_)
    )
    a1c = (a * b * n_ + a * m * c + l * b * c + 2.0 * (o_ * e * f + dd * e * q + dd * p * f)) - (
        l * f * f + m * e * e + n_ * dd * dd + 2.0 * (a * f * q + b * e * p + c * dd * o_)
    )
    a0c = (a * b * c + 2.0 * dd * e * f) - (a * f * f + b * e * e + c * dd * dd)

    # Reference naming (pt_phongtess.cl:99-106): their "a0" is the x³
    # coefficient and "a3" the constant; solveCubic takes highest first.
    x0, x1, x2, count = solve_cubic(xp, a0c, a1c, a2c, a3c)
    any_roots = count > 0

    # Pick x minimizing mD² - mA·mB (sequential strict-greater update,
    # pt_phongtess.cl:117-125).
    x = xp.zeros_like(a)
    determinant = xp.full_like(a, INF)
    for i, xi in enumerate((x0, x1, x2)):
        mA = a * xi + l
        mB = b * xi + m
        mD = dd * xi + o_
        tmp = mD * mD - mA * mB
        use = (i < count) & (determinant > tmp)
        x = xp.where(use, xi, x)
        determinant = xp.where(use, tmp, determinant)
    ok = any_roots & (determinant > 0.0)

    dabs = Vec3(xp.abs(d.x), xp.abs(d.y), xp.abs(d.z))
    domain = xp.where(dabs.y > dabs.z, 1, 2).astype(xp.int32)
    domain = xp.where(
        (dabs.x > dabs.y), xp.where(dabs.x > dabs.z, 0, 2).astype(xp.int32), domain
    )

    mA = a * x + l
    mB = b * x + m
    mC = c * x + n_
    mD = dd * x + o_
    mE = e * x + p
    mF = f * x + q
    a_less_b = xp.abs(mA) < xp.abs(mB)
    mBorA = xp.where(a_less_b, mB, mA)
    inv = _guard_div(xp, xp.ones_like(mBorA), mBorA)
    mA, mB, mC, mD, mE, mF = (v * inv for v in (mA, mB, mC, mD, mE, mF))

    mAorB = xp.where(a_less_b, mA, mB)
    mEorF = xp.where(a_less_b, 2.0 * mE, 2.0 * mF)
    mForE = xp.where(a_less_b, mF, mE)
    ab = xp.where(a_less_b, a, b)
    ba = xp.where(a_less_b, b, a)
    ef = xp.where(a_less_b, e, f)
    fe = xp.where(a_less_b, f, e)

    sqrtAorB = xp.sqrt(xp.maximum(mD * mD - mAorB, 0.0))
    sqrtC = xp.sqrt(xp.maximum(mForE * mForE - mC, 0.0))
    lab1 = mD + sqrtAorB
    lab2 = mD - sqrtAorB
    lc1 = mForE + sqrtC
    lc2 = mForE - sqrtC
    # The factored product's u-coefficient is the CROSS pairing
    # lab1*lc2 + lab2*lc1; if the same-index pairing matches mEorF better,
    # the lc labels are crossed — swap (pt_phongtess.cl:166-168).
    swap_lc = xp.abs(mEorF - lab1 * lc1 - lab2 * lc2) < xp.abs(
        mEorF - lab1 * lc2 - lab2 * lc1
    )
    lc1, lc2 = (
        xp.where(swap_lc, lc2, lc1),
        xp.where(swap_lc, lc1, lc2),
    )

    t_out = xp.full_like(a, INF)
    u_out = xp.zeros_like(a)
    v_out = xp.zeros_like(a)
    for loop in range(2):
        g = -lab1 if loop == 0 else -lab2
        h = -lc1 if loop == 0 else -lc2
        c0 = ab + g * (2.0 * dd + ba * g)
        c1 = 2.0 * (h * (dd + ba * g) + ef + fe * g)
        c2 = h * (ba * h + 2.0 * fe) + c
        r0, r1, _, rcount = solve_cubic(xp, xp.zeros_like(c0), c0, c1, c2)
        for i, u in enumerate((r0, r1)):
            v = g * u + h
            wbar = 1.0 - u - v
            root_ok = ok & (i < rcount) & (u >= 0.0) & (v >= 0.0) & (wbar >= 0.0)
            uu = xp.where(a_less_b, u, v)
            vv = xp.where(a_less_b, v, u)
            # tessellated point (phongTessellation, pt_phongtess.cl:14-26)
            ww = 1.0 - uu - vv
            p_bary = P1 * uu + P2 * vv + P3 * ww
            p_tess = (
                project_on_plane(p_bary, P1, N1) * uu
                + project_on_plane(p_bary, P2, N2) * vv
                + project_on_plane(p_bary, P3, N3) * ww
            )
            pt = p_bary * (1.0 - alpha) + p_tess * alpha - o
            t_param = _guard_div(
                xp, _axis_component(xp, pt, domain), _axis_component(xp, d, domain)
            )
            accept = (
                root_ok
                & (t_param >= xp.abs(t_near))
                & (t_param <= xp.minimum(t_out, xp.minimum(t_best, t_far)))
            )
            t_out = xp.where(accept, t_param, t_out)
            u_out = xp.where(accept, uu, u_out)
            v_out = xp.where(accept, vv, v_out)

    return t_out, u_out, v_out, xp.isfinite(t_out)


def phongtess_normal(
    xp, d: Vec3, N1: Vec3, N2: Vec3, N3: Vec3, C1: Vec3, C2: Vec3, C3: Vec3,
    E12: Vec3, E20: Vec3, u, v,
) -> Vec3:
    """Patch shading normal (getPhongTessNormal, pt_utils.cl:282-294):
    surface-derivative normal unless it back-faces the reflection of the
    smooth normal."""
    w = 1.0 - u - v
    du = C3 * (w - u) + (C1 - C2) * v + E20
    dv = C2 * (w - v) + (C1 - C3) * u - E12
    ns = safe_normalized(du.cross(dv))
    npn = safe_normalized(N1 * u + N2 * v + N3 * w)
    r = d - npn * (2.0 * npn.dot(d))
    return where3(ns.dot(r) < 0.0, ns, npn)


def patch_constants(P1, P2, P3, N1, N2, N3, alpha):
    """(C1, C2, C3, E12, E20) for the normal evaluation."""
    E01 = P2 - P1
    E12 = P3 - P2
    E20 = P1 - P3
    C1 = (N2 * N2.dot(E01) - N1 * N1.dot(E01)) * alpha
    C2 = (N3 * N3.dot(E12) - N2 * N2.dot(E12)) * alpha
    C3 = (N1 * N1.dot(E20) - N3 * N3.dot(E20)) * alpha
    return C1, C2, C3, E12, E20


def face_is_flat(xp, tris: TrianglesSoA):
    """Per-face flag: all three vertex normals equal (checkFaceIntersection,
    pt_intersect.cl:151-165) — flat faces use plain Möller-Trumbore."""
    eq = lambda a, b: (a.x == b.x) & (a.y == b.y) & (a.z == b.z)  # noqa: E731
    return eq(tris.n0, tris.n1) & eq(tris.n1, tris.n2)


def _face_vec(v: Vec3, f: int) -> Vec3:
    return Vec3(v.x[f], v.y[f], v.z[f])


def intersect_brute_phongtess(xp, o: Vec3, d: Vec3, tris: TrianglesSoA, alpha):
    """Nearest-hit over all faces with Phong tessellation for curved faces
    (vertex normals differ) and Möller-Trumbore for flat ones. Returns
    ``(t, face, u, v)`` — u/v are patch coordinates for curved winners
    (0 for flat)."""
    flat = face_is_flat(xp, tris)
    nf = int(tris.mtl.shape[0])
    t_best = xp.full_like(o.x, INF)
    f_best = xp.full_like(o.x, -1, dtype=xp.int32)
    u_best = xp.zeros_like(o.x)
    v_best = xp.zeros_like(o.x)
    for f in range(nf):
        P1 = _face_vec(tris.v0, f)
        e1 = _face_vec(tris.e1, f)
        e2 = _face_vec(tris.e2, f)
        P2 = P1 + e1
        P3 = P1 + e2
        # Flatness is data (traced); evaluate both intersectors for the
        # face and select — the feature is opt-in, so the 2x face cost only
        # applies when phong_tessellation > 0 (like the reference paying
        # the PHONGTESS compile-time specialization, pt_intersect.cl:151).
        t_f, valid_f = moller_trumbore(xp, o, d, P1, e1, e2)
        N1 = _face_vec(tris.n0, f)
        N2 = _face_vec(tris.n1, f)
        N3 = _face_vec(tris.n2, f)
        t_c, uu, vv, valid_c = phongtess_patch_intersect(
            xp, o, d, P1, P2, P3, N1, N2, N3, alpha, t_best
        )
        is_flat = flat[f]
        t = xp.where(is_flat, t_f, t_c)
        valid = xp.where(is_flat, valid_f, valid_c & (t_c >= F32(EPSILON5)))
        uu = xp.where(is_flat, xp.zeros_like(uu), uu)
        vv = xp.where(is_flat, xp.zeros_like(vv), vv)
        better = valid & (t < t_best)
        t_best = xp.where(better, t, t_best)
        f_best = xp.where(better, xp.int32(f), f_best)
        u_best = xp.where(better, uu, u_best)
        v_best = xp.where(better, vv, v_best)
    return t_best, f_best, u_best, v_best
