"""Independent scalar NumPy path tracer — the cross-validation oracle.

Written directly from the Metal megakernel listing (Raytracing.metal:221-831)
as the specification, deliberately NOT sharing code with mrt_tpu's vectorized
pipeline, so systematic errors in the JAX wavefront can't hide. Brute-force
intersection; scalar per-pixel loops; tiny scenes only.
"""

from __future__ import annotations

import numpy as np

from mrt_tpu.core.halton import halton_np


def _normalize(v):
    return v / max(np.linalg.norm(v), 1e-20)


def _intersect_all(o, d, v0, v1, v2, t_min, t_max):
    """Brute-force Möller–Trumbore over all triangles. Returns (tri, t, u, v)
    of the closest hit or (-1, inf, 0, 0)."""
    e1 = v1 - v0
    e2 = v2 - v0
    p = np.cross(d, e2)
    det = np.einsum("ij,ij->i", e1, p)
    valid = np.abs(det) > 1e-9
    inv = np.where(valid, 1.0 / np.where(valid, det, 1.0), 0.0)
    tv = o - v0
    u = np.einsum("ij,ij->i", tv, p) * inv
    q = np.cross(tv, e1)
    v = np.einsum("ij,ij->i", q, np.broadcast_to(d, v0.shape)) * inv
    t = np.einsum("ij,ij->i", e2, q) * inv
    hit = valid & (u >= 0) & (v >= 0) & (u + v <= 1) & (t >= t_min) & (t <= t_max)
    t = np.where(hit, t, np.inf)
    i = int(np.argmin(t))
    if not np.isfinite(t[i]):
        return -1, np.inf, 0.0, 0.0
    return i, float(t[i]), float(u[i]), float(v[i])


def _any_hit(o, d, v0, v1, v2, t_min, t_max):
    tri, t, _, _ = _intersect_all(o, d, v0, v1, v2, t_min, t_max)
    return tri >= 0


def _interp(attr, idx, tri, u, v):
    """interpolateVertexAttribute (Raytracing.metal:61-74)."""
    i1, i2, i0 = idx[tri, 1], idx[tri, 2], idx[tri, 0]
    return u * attr[i1] + v * attr[i2] + (1.0 - u - v) * attr[i0]


def _sample_tex(img, u, v):
    """Bilinear repeat sample with half-pixel centers after UV y-flip
    (Raytracing.metal:413-421 / the atlas sampler's addressing)."""
    h, w = img.shape[0], img.shape[1]
    v = 1.0 - v  # y-flip
    u -= np.floor(u)
    v -= np.floor(v)
    x = u * w - 0.5
    y = v * h - 0.5
    x0, y0 = np.floor(x), np.floor(y)
    fx, fy = x - x0, y - y0
    gx0, gx1 = int(x0 % w), int((x0 + 1) % w)
    gy0, gy1 = int(y0 % h), int((y0 + 1) % h)
    top = img[gy0, gx0] * (1 - fx) + img[gy0, gx1] * fx
    bot = img[gy1, gx0] * (1 - fx) + img[gy1, gx1] * fx
    return top * (1 - fy) + bot * fy


def _sample_cosine(u):
    phi = 2.0 * np.pi * u[0]
    cos_theta = np.sqrt(u[1])
    sin_theta = np.sqrt(max(1.0 - cos_theta * cos_theta, 0.0))
    return np.array([sin_theta * np.cos(phi), cos_theta, sin_theta * np.sin(phi)])


def _align(sample, normal):
    up = normal
    right = _normalize(np.cross(normal, np.array([0.0072, 1.0, 0.0034])))
    forward = np.cross(right, up)
    return sample[0] * right + sample[1] * up + sample[2] * forward


def render_oracle(
    width,
    height,
    camera,  # dict: position, right, up, forward (numpy (3,))
    offsets,  # (H, W) int halton offsets
    verts_w,  # (V,3) world positions
    normals_w,  # (V,3) world normals (NOT normalized per vertex)
    indices,  # (T,3)
    tri_resource,  # (T,)
    base_color,  # (R,3)
    emission,  # (R,3)
    lights,  # list of dicts: type, position, color, forward, right, up,
    #          cone_angle, direction
    spp=1,
    max_bounces=2,
    frame_index=0,
    opacity=None,  # (R,) or None (=1)
    ior=None,  # (R,) or None (=1)
    env_map=None,  # (He,We,3) or None
    env_intensity=1.0,
    legacy=False,
    uvs=None,  # (V,2) vertex uvs (needed when tex_base is given)
    tex_base=None,  # per-resource: None or (Ht,Wt,3) LINEAR base-color image
    tex_normal=None,  # per-resource: None or (Hn,Wn,3) raw [0,1] normal map
    tex_rough=None,  # per-resource: None or (H,W,3); channel 0 = roughness
    tex_metal=None,  # per-resource: None or (H,W,3); channel 0 = metallic
    tex_opacity=None,  # per-resource: None or (H,W,3); channel 0 multiplies opacity
    tex_emission=None,  # per-resource: None or (H,W,3) LINEAR; replaces emission
):
    """One frame; roughness=1 / metal=0 (untextured OBJ materials) with
    optional per-resource base-color textures (repeat addressing, half-pixel
    centers, UV y-flip — Raytracing.metal:399-456 sampling semantics);
    glass branch, environment light, legacy mode supported.
    Returns (H, W, 3) radiance."""
    v0 = verts_w[indices[:, 0]]
    v1 = verts_w[indices[:, 1]]
    v2 = verts_w[indices[:, 2]]
    n_lights = len(lights)
    n_res = len(base_color)
    if opacity is None:
        opacity = np.ones(n_res)
    if ior is None:
        ior = np.ones(n_res)

    def sample_env(d):
        he, we = env_map.shape[0], env_map.shape[1]
        ue = 0.5 + np.arctan2(d[2], d[0]) / (2 * np.pi)
        ve = min(max(0.5 - np.arcsin(max(min(d[1], 1.0), -1.0)) / np.pi, 0.0), 1.0)
        x = ue * we - 0.5
        y = ve * he - 0.5
        x0, y0 = int(np.floor(x)), int(np.floor(y))
        fx, fy = x - x0, y - y0
        xi0, xi1 = x0 % we, (x0 + 1) % we
        yi0 = min(max(y0, 0), he - 1)
        yi1 = min(max(y0 + 1, 0), he - 1)
        top = env_map[yi0, xi0] * (1 - fx) + env_map[yi0, xi1] * fx
        bot = env_map[yi1, xi0] * (1 - fx) + env_map[yi1, xi1] * fx
        return (top * (1 - fy) + bot * fy) * env_intensity

    img = np.zeros((height, width, 3))

    for y in range(height):
        for x in range(width):
            offset = int(offsets[y, x])
            total = np.zeros(3)
            for s in range(spp):
                frame_offset = frame_index * spp + s
                i_h = offset + frame_offset
                r0 = halton_np(i_h, 0)
                r1 = halton_np(i_h, 1)
                u = (x + r0) / width * 2.0 - 1.0
                v = (y + r1) / height * 2.0 - 1.0
                ro = camera["position"].copy()
                rd = _normalize(u * camera["right"] + v * camera["up"] + camera["forward"])

                color = np.ones(3)
                acc = np.zeros(3)
                bounce = 0
                step = 0
                tpasses = 0
                guard = 0
                while bounce < max_bounces and guard < 64:
                    guard += 1
                    tri, t, bu, bv = _intersect_all(ro, rd, v0, v1, v2, 0.0, np.inf)
                    if tri < 0:
                        if env_map is not None:
                            acc = acc + color * sample_env(rd)
                        break
                    p = ro + rd * t
                    nrm_raw = _interp(normals_w, indices, tri, bu, bv)
                    if np.linalg.norm(nrm_raw) < 1e-10:
                        nrm = -rd
                    else:
                        nrm = _normalize(nrm_raw)
                    res = tri_resource[tri]
                    albedo = base_color[res].copy()
                    if tex_base is not None and tex_base[res] is not None:
                        uv = _interp(uvs, indices, tri, bu, bv)
                        albedo = albedo * _sample_tex(tex_base[res], uv[0], uv[1])

                    # tangent-basis normal mapping (Raytracing.metal:185-218,
                    # 492-504): per-triangle uv-gradient tangent, Gram-Schmidt
                    # against the interpolated normal, TBN-transformed sample
                    if tex_normal is not None and tex_normal[res] is not None:
                        i0, i1_, i2_ = indices[tri]
                        e1 = verts_w[i1_] - verts_w[i0]
                        e2 = verts_w[i2_] - verts_w[i0]
                        duv1 = uvs[i1_] - uvs[i0]
                        duv2 = uvs[i2_] - uvs[i0]
                        den = duv1[0] * duv2[1] - duv1[1] * duv2[0]
                        if abs(den) >= 1e-8:
                            rdet = 1.0 / den
                            tangent = (e1 * duv2[1] - e2 * duv1[1]) * rdet
                            bit = (e2 * duv1[0] - e1 * duv2[0]) * rdet
                            if (np.linalg.norm(tangent) > 1e-8
                                    and np.linalg.norm(bit) > 1e-8):
                                uv = _interp(uvs, indices, tri, bu, bv)
                                world_t = tangent - nrm * np.dot(tangent, nrm)
                                world_t = _normalize(world_t)
                                world_b = _normalize(np.cross(nrm, world_t))
                                nm = _sample_tex(tex_normal[res], uv[0], uv[1]) * 2.0 - 1.0
                                nrm = _normalize(
                                    nm[0] * world_t + nm[1] * world_b + nm[2] * nrm
                                )

                    # glass / transparency branch (Raytracing.metal:517-576)
                    op_c = min(max(opacity[res], 0.0), 1.0)
                    if tex_opacity is not None and tex_opacity[res] is not None:
                        uv = _interp(uvs, indices, tri, bu, bv)
                        op_c *= _sample_tex(tex_opacity[res], uv[0], uv[1])[0]
                    ior_c = max(ior[res], 1.0)
                    if op_c < 0.999 or ior_c > 1.01:
                        N = nrm.copy()
                        I = rd
                        cosi = max(min(np.dot(-I, N), 1.0), -1.0)
                        eta_i, eta_t = 1.0, ior_c
                        if cosi < 0:
                            cosi = -cosi
                            N = -N
                            eta_i, eta_t = eta_t, eta_i
                        eta = eta_i / eta_t
                        k = 1.0 - eta * eta * (1.0 - cosi * cosi)
                        f0 = ((eta_t - eta_i) / (eta_t + eta_i)) ** 2
                        F = f0 + (1 - f0) * (1 - cosi) ** 5
                        transmission = 1.0 - op_c
                        rw = F
                        tw = (1 - F) * transmission
                        total_w = max(rw + tw, 1e-4)
                        choice = halton_np(i_h, 2 + step * 6 + 5)
                        if k < 0 or choice < rw / total_w:
                            rdir = _normalize(I - 2 * np.dot(I, N) * N)
                            ro = p + rdir * 1e-3
                            rd = rdir
                            color = color * total_w
                            consume = True
                        else:
                            cost = np.sqrt(max(k, 0.0))
                            rdir = _normalize(eta * I + (eta * cosi - cost) * N)
                            ro = p + rdir * 1e-3
                            rd = rdir
                            color = color * total_w * albedo
                            consume = False
                        step += 1
                        if consume:
                            bounce += 1
                            tpasses = 0
                        else:
                            tpasses += 1
                            if tpasses > max_bounces:
                                bounce += 1
                                tpasses = 0
                        continue

                    emis = emission[res]
                    if tex_emission is not None and tex_emission[res] is not None:
                        uv = _interp(uvs, indices, tri, bu, bv)
                        emis = _sample_tex(tex_emission[res], uv[0], uv[1])
                    acc = acc + color * emis

                    # pick 1 of N lights (dim 2 + step*6 + 0)
                    ls = halton_np(i_h, 2 + step * 6 + 0)
                    li = min(int(ls * n_lights), n_lights - 1)
                    L = lights[li]
                    if L["type"] == 4:  # area
                        ra = halton_np(i_h, 2 + step * 6 + 1) * 2 - 1
                        rb = halton_np(i_h, 2 + step * 6 + 2) * 2 - 1
                        sp_ = L["position"] + L["right"] * ra + L["up"] * rb
                        ldir = sp_ - p
                        ldist = np.linalg.norm(ldir)
                        inv_d = 1.0 / max(ldist, 1e-3)
                        ldir = ldir * inv_d
                        lcol = L["color"] * inv_d * inv_d
                        lcol = lcol * max(min(np.dot(-ldir, L["forward"]), 1.0), 0.0)
                    elif L["type"] == 2:  # spot
                        vec = L["position"] - p
                        ldist = np.linalg.norm(vec)
                        inv_d = 1.0 / max(ldist, 1e-3)
                        ldir = vec * inv_d
                        cone = _normalize(L["direction"])
                        if np.dot(-ldir, cone) > np.cos(L["cone_angle"]):
                            lcol = L["color"] * inv_d * inv_d
                        else:
                            lcol = np.zeros(3)
                    elif L["type"] == 3:  # point
                        vec = L["position"] - p
                        ldist = np.linalg.norm(vec)
                        inv_d = 1.0 / max(ldist, 1e-3)
                        ldir = vec * inv_d
                        lcol = L["color"] * inv_d * inv_d
                    else:  # sun
                        ldir = -_normalize(L["direction"])
                        ldist = np.inf
                        lcol = L["color"]
                    lcol = lcol * n_lights

                    if legacy:
                        Ld = _normalize(ldir)
                        ndl = max(min(np.dot(nrm, Ld), 1.0), 0.0)
                        legacy_color = color * albedo
                        if np.linalg.norm(legacy_color) < 0.001:
                            break
                        if np.linalg.norm(lcol) > 1e-4 and ndl > 0:
                            so = p + nrm * 1e-3
                            if not _any_hit(so, Ld if False else ldir, v0, v1, v2, 0.0, ldist - 1e-3):
                                acc = acc + legacy_color * lcol * ndl
                        color = legacy_color  # * ao with ao=1
                        if np.linalg.norm(color) < 0.001:
                            break
                        rb0 = halton_np(i_h, 2 + step * 5 + 3)
                        rb1 = halton_np(i_h, 2 + step * 5 + 4)
                        bdir = _align(_sample_cosine(np.array([rb0, rb1])), nrm)
                        ro = p + nrm * 1e-3
                        rd = bdir
                        step += 1
                        bounce += 1
                        tpasses = 0
                        continue

                    roughness, metallic = 1.0, 0.0
                    if tex_rough is not None and tex_rough[res] is not None:
                        uv = _interp(uvs, indices, tri, bu, bv)
                        roughness = _sample_tex(tex_rough[res], uv[0], uv[1])[0]
                    if tex_metal is not None and tex_metal[res] is not None:
                        uv = _interp(uvs, indices, tri, bu, bv)
                        metallic = _sample_tex(tex_metal[res], uv[0], uv[1])[0]
                    if np.linalg.norm(lcol) > 1e-4:
                        # PBR direct (Raytracing.metal:692-711)
                        pr = min(max(roughness, 0.04), 1.0)
                        alpha = pr * pr
                        F0 = 0.04 + (albedo - 0.04) * metallic
                        V = _normalize(-rd)
                        Ld = _normalize(ldir)
                        H = _normalize(V + Ld)
                        ndl = max(min(np.dot(nrm, Ld), 1.0), 0.0)
                        ndv = max(min(np.dot(nrm, V), 1.0), 0.0)
                        ndh = max(min(np.dot(nrm, H), 1.0), 0.0)
                        vdh = max(min(np.dot(V, H), 1.0), 0.0)
                        F = F0 + (1 - F0) * (1 - vdh) ** 5
                        a2 = alpha * alpha
                        denom = ndh * ndh * (a2 - 1) + 1
                        D = a2 / max(np.pi * denom * denom, 1e-7)
                        k = (pr + 1) ** 2 / 8
                        G = (ndv / max(ndv * (1 - k) + k, 1e-7)) * (
                            ndl / max(ndl * (1 - k) + k, 1e-7)
                        )
                        spec = D * G * F / max(4 * ndv * ndl, 1e-4)
                        kD = (1 - F) * (1 - metallic)
                        direct = (kD * albedo / np.pi + spec) * lcol * ndl
                        so = p + nrm * 1e-3
                        if not _any_hit(so, ldir, v0, v1, v2, 0.0, ldist - 1e-3):
                            acc = acc + color * direct

                    color = color * albedo * (1.0 - metallic)  # *ao with ao=1
                    if np.linalg.norm(color) < 0.001:
                        break

                    rb0 = halton_np(i_h, 2 + step * 5 + 3)
                    rb1 = halton_np(i_h, 2 + step * 5 + 4)
                    bdir = _align(_sample_cosine(np.array([rb0, rb1])), nrm)
                    ro = p + nrm * 1e-3
                    rd = bdir
                    step += 1
                    bounce += 1
                total = total + acc
            img[y, x] = total / max(spp, 1)
    return img
