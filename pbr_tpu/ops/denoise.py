"""Feature-guided noise filter (the completed ``noise_filtering.cl``).

The reference ships an *unfinished* feature-based denoiser
(``noise_filtering.cl:441-468``, Random-Parameter-Filtering style): it
gathers neighborhood means/sigma of hit points, normals, and texture colors
(``:1-380``) but the weight computation is TODO stubs (``:386-399,409-428``)
and the host wiring is commented out (``PathTracer.cpp:155-160``). This
module delivers the working capability, TPU-native:

- **Features** come from one extra primary-hit pass (`first_hit_features`):
  first-hit shading normal, hit distance, and diffuse albedo per pixel —
  the same guides the reference's kernel gathers (hit point / normal /
  texture color, ``noise_filtering.cl:300-360``).
- **Filter** is an edge-avoiding a-trous wavelet transform (Dammertz et al.
  2010, the standard production descendant of RPF): a 5x5 B3-spline
  stencil applied at power-of-two dilations, with per-tap cross-bilateral
  weights from the feature buffers. On TPU each tap is a dense shifted
  multiply-add over the whole (H, W) image — pure VPU work that XLA fuses
  into a handful of kernels; there is no gather, no data-dependent control
  flow, and the pass is differentiable end to end.

Backend-generic: ``xp`` is numpy (oracle) or jax.numpy (compiled).
"""

from __future__ import annotations

import numpy as np

from pbr_tpu.ops.intersect import INF, gather_vec3, geometric_normal
from pbr_tpu.ops.traverse import intersect_scene
from pbr_tpu.ops.vec import Vec3
from pbr_tpu.scene.camera import pixel_dim

F32 = np.float32

# 5-tap B3-spline, the a-trous generating kernel (outer product -> 5x5).
_B3 = (1.0 / 16.0, 1.0 / 4.0, 3.0 / 8.0, 1.0 / 4.0, 1.0 / 16.0)


def first_hit_features(xp, scene, cam, settings, max_leaf: int = 2):
    """One deterministic primary-hit pass -> (normal, depth, albedo).

    Center-of-pixel pinhole rays (no AA jitter, no DoF — feature buffers
    must be noise-free); returns ``(H, W, 3)`` normal, ``(H, W)`` depth,
    ``(H, W, 3)`` albedo arrays. Misses get normal 0, depth = max finite
    depth, albedo = sky color (so the sky filters as one flat region).
    """
    w, h = settings.width, settings.height
    ids = xp.arange(w * h, dtype=xp.int32)
    px = (ids % w).astype(xp.float32)
    py = (ids // w).astype(xp.float32)
    pxdim = F32(pixel_dim(w, h, settings.fov))

    ones = xp.ones_like(px)
    b3 = lambda v: Vec3(v.x * ones, v.y * ones, v.z * ones)  # noqa: E731
    eye, cw, cu, cv = b3(cam.eye), b3(cam.w), b3(cam.u), b3(cam.v)
    fx = 1.0 - F32(w) + 2.0 * px
    fy = 1.0 - F32(h) + 2.0 * py
    d = (cw + (cu * fx + cv * fy) * (pxdim * F32(0.5))).normalized()

    t, face = intersect_scene(
        xp, eye, d, scene, max_leaf=max_leaf, mode=settings.intersector
    )
    hit = xp.isfinite(t)
    face_safe = xp.maximum(face, 0)
    e1 = gather_vec3(scene.tris.e1, face_safe)
    e2 = gather_vec3(scene.tris.e2, face_safe)
    n = geometric_normal(e1, e2)
    # Orient toward the viewer, like the shading pass (pathtracing.cl:298).
    flip = n.dot(-d) <= 0.0
    n = Vec3(
        xp.where(flip, -n.x, n.x),
        xp.where(flip, -n.y, n.y),
        xp.where(flip, -n.z, n.z),
    )
    mats = scene.materials
    midx = scene.tris.mtl[face_safe]
    kd = gather_vec3(mats.kd, midx)
    sky = settings.sky_light

    zero = xp.zeros_like(px)
    nx = xp.where(hit, n.x, zero)
    ny = xp.where(hit, n.y, zero)
    nz = xp.where(hit, n.z, zero)
    t_hit = xp.where(hit, t, F32(0.0))
    t_max = xp.maximum(xp.max(t_hit), F32(1.0))
    depth = xp.where(hit, t, t_max)
    ax = xp.where(hit, kd.x, F32(sky[0]))
    ay = xp.where(hit, kd.y, F32(sky[1]))
    az = xp.where(hit, kd.z, F32(sky[2]))

    normal_img = xp.stack([nx, ny, nz], axis=-1).reshape(h, w, 3)
    depth_img = depth.reshape(h, w)
    albedo_img = xp.stack([ax, ay, az], axis=-1).reshape(h, w, 3)
    return normal_img, depth_img, albedo_img


def _shift2d(xp, img, dy: int, dx: int):
    """Edge-clamped 2D shift of an (H, W, ...) image by a static offset —
    dense slicing + pad, no gather (TPU-friendly)."""
    h, w = img.shape[0], img.shape[1]
    ys = max(dy, 0), h + min(dy, 0)
    xs = max(dx, 0), w + min(dx, 0)
    core = img[ys[0]:ys[1], xs[0]:xs[1]]
    pad = [(max(-dy, 0), max(dy, 0)), (max(-dx, 0), max(dx, 0))]
    pad += [(0, 0)] * (img.ndim - 2)
    return xp.pad(core, pad, mode="edge")


def noise_filter(
    xp,
    color,
    normal,
    depth,
    albedo=None,
    *,
    iterations: int = 3,
    sigma_color: float = 0.35,
    sigma_normal: float = 64.0,
    sigma_depth: float = 0.02,
):
    """Edge-avoiding a-trous filter over an ``(H, W, 3)`` radiance image.

    ``normal`` (H, W, 3), ``depth`` (H, W) come from `first_hit_features`.
    When ``albedo`` is given the filter runs on demodulated irradiance
    (color / albedo) and re-modulates at the end, so texture/albedo detail
    is untouched while lighting noise is smoothed — the role the
    reference's "texture color" feature buffer was meant to play.

    Weights per tap q at center p (all smooth -> differentiable):
      w = B3(q) * exp(-|c_p-c_q|^2 / sc) * max(0, n_p.n_q)^sn
                * exp(-|z_p-z_q| / (sz * z_range))
    """
    one = F32(1.0)
    if albedo is not None:
        safe_alb = xp.maximum(albedo, F32(1e-3))
        img = color / safe_alb
    else:
        img = color

    n = normal
    z = depth
    z_range = xp.maximum(xp.max(z) - xp.min(z), F32(1e-6))
    # sigma_color is relative to the image's own RMS variation, so the
    # filter adapts to radiance scale / noise level (the role of the
    # per-neighborhood sigmas the reference's kernel gathered).
    mean_c = xp.mean(img, axis=(0, 1), keepdims=True)
    rms = xp.sqrt(xp.maximum(xp.mean(xp.sum((img - mean_c) ** 2, axis=-1)), F32(1e-12)))
    sc = F32(sigma_color) * rms
    inv_sc = one / xp.maximum(F32(2.0) * sc * sc, F32(1e-12))
    inv_sz = one / (F32(sigma_depth) * z_range)

    for it in range(iterations):
        step = 1 << it
        acc = xp.zeros_like(img)
        wsum = xp.zeros_like(z)
        for j in range(-2, 3):
            for i in range(-2, 3):
                k = F32(_B3[j + 2] * _B3[i + 2])
                cq = _shift2d(xp, img, j * step, i * step)
                nq = _shift2d(xp, n, j * step, i * step)
                zq = _shift2d(xp, z, j * step, i * step)
                dc = xp.sum((img - cq) ** 2, axis=-1)
                w_c = xp.exp(-dc * inv_sc)
                ndot = xp.maximum(xp.sum(n * nq, axis=-1), F32(0.0))
                w_n = ndot ** F32(sigma_normal)
                w_z = xp.exp(-xp.abs(z - zq) * inv_sz)
                w = k * w_c * w_n * w_z
                acc = acc + cq * w[..., None]
                wsum = wsum + w
        img = acc / xp.maximum(wsum, F32(1e-8))[..., None]

    if albedo is not None:
        img = img * safe_alb
    return img


def denoise_render(xp, color_img, scene, cam, settings, **kwargs):
    """Convenience wrapper: features from the scene + filter in one call.
    ``color_img``: (H, W, 3) linear radiance (the progressive accumulator)."""
    normal, depth, albedo = first_hit_features(xp, scene, cam, settings)
    return noise_filter(xp, color_img, normal, depth, albedo, **kwargs)
