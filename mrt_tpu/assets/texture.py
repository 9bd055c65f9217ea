"""Texture atlas — the TPU-native replacement for the per-submesh
``texture2d`` binding set (SubMesh.swift:176-241, Raytracing.metal:420-456).

Per-hit texture fetches are a gather storm on TPU (SURVEY.md §7 hard part 4),
so all maps of all resources are packed into ONE device-resident RGB atlas;
a hit gathers its resource's rect and bilinearly samples inside it with
repeat addressing. Fallback colors follow SubMesh.swift:176-241 (white /
black / neutral-normal 1x1 tiles).

Mipmaps: the reference generates them (SubMesh.swift:189-206) but its
compute-kernel ``sample()`` has no derivatives, so Metal samples LOD 0
(Raytracing.metal:421). We generate a full mip chain at pack time and
optionally sample it trilinearly with a ray-cone LOD (``sample_trilinear``)
— a beyond-reference feature, OFF by default (``RenderSettings.use_mipmaps``)
so default output matches the reference semantics exactly.

sRGB: baseColor maps are sRGB-decoded to linear at pack time
(``type: .sRGB`` load at SubMesh.swift:187).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

# map-type slots, fixed order = the argument-buffer texture order
# (SubMesh.swift:38-54 slots 6-12)
MAP_BASECOLOR = 0
MAP_NORMAL = 1
MAP_ROUGHNESS = 2
MAP_METALLIC = 3
MAP_AO = 4
MAP_OPACITY = 5
MAP_EMISSION = 6
N_MAP_TYPES = 7

_SRGB_MAPS = {MAP_BASECOLOR, MAP_EMISSION}
_FALLBACKS = {
    MAP_BASECOLOR: (1.0, 1.0, 1.0),  # white (SubMesh.swift:214)
    MAP_NORMAL: (0.5, 0.5, 1.0),  # neutral normal (SubMesh.swift:231)
    MAP_ROUGHNESS: (1.0, 1.0, 1.0),
    MAP_METALLIC: (0.0, 0.0, 0.0),  # black (SubMesh.swift:222)
    MAP_AO: (1.0, 1.0, 1.0),
    MAP_OPACITY: (1.0, 1.0, 1.0),
    MAP_EMISSION: (0.0, 0.0, 0.0),
}


MAX_MIPS = 12  # level-0 up to 2048px wide fits; deeper chains clamp


# channel-packed atlas layout (see TextureAtlas.packed): all maps of a
# resource live at ONE rect as channels of a 16-wide texel, so a hit's whole
# texture set is 1 rect gather + 4 taps instead of (1+4) x N_MAP_TYPES.
# Gather cost is per ROW, ~width-free to 128 f32 (docs/PERF.md).
PACKED_C = 16
_PACKED_SLICE = {  # map type -> (start, width) in the packed texel
    MAP_BASECOLOR: (0, 3),
    MAP_NORMAL: (3, 3),
    MAP_EMISSION: (6, 3),
    MAP_ROUGHNESS: (9, 1),
    MAP_METALLIC: (10, 1),
    MAP_AO: (11, 1),
    MAP_OPACITY: (12, 1),
}


class TextureAtlas(NamedTuple):
    """Device atlas + per-(resource, map-type) rects."""

    texels: jnp.ndarray  # (H, W, 3) f32 linear
    rects: jnp.ndarray  # (R, N_MAP_TYPES, 4) int32: x0, y0, w, h (level 0)
    has_map: jnp.ndarray  # (R, N_MAP_TYPES) bool
    # mip chain: level-l rect per (resource, map); level 0 == rects
    mip_rects: jnp.ndarray  # (R, N_MAP_TYPES, MAX_MIPS, 4) int32
    n_levels: jnp.ndarray  # (R, N_MAP_TYPES) int32 >= 1
    # channel-packed LOD-0 twin: all maps of a resource at one rect, at the
    # resource's largest map size (smaller maps bilinearly resampled at pack
    # time; missing maps baked as their fallback constants — the reference
    # binds constant fallback TILES, SubMesh.swift:176-241, so constants are
    # exact; mixed-size materials get pack-time filtering instead of
    # sample-time, a sub-texel difference).
    packed: jnp.ndarray  # (Hp, Wp, PACKED_C) f32
    packed_rects: jnp.ndarray  # (R, 4) int32 x0, y0, w, h
    # gp banding: when the packed atlas is row-band-sharded across a
    # geometry axis (dist/geometry.band_atlas), ``packed`` holds only this
    # chip's band and ``band_lo`` its first global row; None on a single
    # chip / replicated atlas.
    band_lo: jnp.ndarray | None = None

    @property
    def height(self) -> int:
        return self.texels.shape[0]

    @property
    def width(self) -> int:
        return self.texels.shape[1]


def srgb_to_linear(c: np.ndarray) -> np.ndarray:
    c = np.clip(c, 0.0, 1.0)
    return np.where(c <= 0.04045, c / 12.92, ((c + 0.055) / 1.055) ** 2.4).astype(np.float32)


def load_image(path: str) -> np.ndarray | None:
    """Load an image file to (H, W, 3) float32 in [0, 1]; None on failure
    (texture-load fallback posture, SubMesh.swift:104,176-241)."""
    try:
        from PIL import Image

        img = Image.open(path).convert("RGB")
        return np.asarray(img, np.float32) / 255.0
    except Exception:
        return None


@dataclasses.dataclass
class AtlasBuilder:
    """Shelf-packs images; duplicates (same path) share one rect."""

    max_width: int = 4096

    def __post_init__(self):
        self._images: list = []  # (array, x0, y0)
        self._by_path: dict = {}
        self._shelf_x = 0
        self._shelf_y = 0
        self._shelf_h = 0
        self._height = 0
        self._width = 0
        self._resources: list = []  # per resource: {map_type: (rect, has)}

    def _place(self, img: np.ndarray) -> tuple[int, int]:
        h, w = img.shape[:2]
        if self._shelf_x + w > self.max_width:
            self._shelf_y += self._shelf_h
            self._shelf_x = 0
            self._shelf_h = 0
        x0, y0 = self._shelf_x, self._shelf_y
        self._shelf_x += w
        self._shelf_h = max(self._shelf_h, h)
        self._height = max(self._height, y0 + h)
        self._width = max(self._width, x0 + w)
        self._images.append((img, x0, y0))
        return x0, y0

    @staticmethod
    def _downsample(img: np.ndarray) -> np.ndarray:
        """2x2 box filter (the mipmap generation the reference gets from
        generateMipmaps, SubMesh.swift:189-206). Odd dims replicate the edge."""
        h, w = img.shape[:2]
        if h % 2:
            img = np.concatenate([img, img[-1:]], axis=0)
            h += 1
        if w % 2:
            img = np.concatenate([img, img[:, -1:]], axis=1)
            w += 1
        return img.reshape(h // 2, 2, w // 2, 2, 3).mean(axis=(1, 3)).astype(np.float32)

    def add_resource(self, maps: dict[int, str | np.ndarray | None]) -> int:
        """Register one resource (submesh). ``maps`` maps MAP_* -> path/array/None.
        Returns the resource index."""
        entry = {}
        for map_type in range(N_MAP_TYPES):
            src = maps.get(map_type)
            img = None
            if isinstance(src, str):
                # dedup key includes colorspace: the same file used as an
                # sRGB map (baseColor/emission) and as a linear map packs
                # DIFFERENT texels, so they must not share a rect
                pkey = (src, map_type in _SRGB_MAPS)
                if pkey in self._by_path:
                    entry[map_type] = (self._by_path[pkey], True)
                    continue
                img = load_image(src)
            elif isinstance(src, np.ndarray):
                img = src.astype(np.float32)
                if img.ndim == 2:
                    img = np.repeat(img[:, :, None], 3, axis=2)
            if img is None:
                entry[map_type] = ([(0, 0, 1, 1)], False)
                continue
            if map_type in _SRGB_MAPS:
                img = srgb_to_linear(img)
            # place the full mip chain; level 0 first
            chain = []
            level = img
            while len(chain) < MAX_MIPS:
                x0, y0 = self._place(level)
                chain.append((x0, y0, level.shape[1], level.shape[0]))
                if max(level.shape[0], level.shape[1]) <= 1:
                    break
                level = self._downsample(level)
            if isinstance(src, str):
                self._by_path[(src, map_type in _SRGB_MAPS)] = chain
            entry[map_type] = (chain, True)
        self._resources.append(entry)
        return len(self._resources) - 1

    def build(self) -> TextureAtlas:
        n_res = max(len(self._resources), 1)
        # Fallback 1x1 tiles live at a reserved row appended below the shelves.
        fb_y = self._height
        fb_rects = {}
        for map_type in range(N_MAP_TYPES):
            fb_rects[map_type] = (map_type, fb_y, 1, 1)
        height = self._height + 1
        width = max(self._width, N_MAP_TYPES, 1)

        texels = np.zeros((height, width, 3), np.float32)
        for img, x0, y0 in self._images:
            texels[y0 : y0 + img.shape[0], x0 : x0 + img.shape[1], :] = img[:, :, :3]
        for map_type, (x0, y0, _, _) in fb_rects.items():
            texels[y0, x0, :] = _FALLBACKS[map_type]

        rects = np.zeros((n_res, N_MAP_TYPES, 4), np.int32)
        has = np.zeros((n_res, N_MAP_TYPES), bool)
        mip_rects = np.zeros((n_res, N_MAP_TYPES, MAX_MIPS, 4), np.int32)
        n_levels = np.ones((n_res, N_MAP_TYPES), np.int32)
        for r in range(n_res):
            entry = self._resources[r] if r < len(self._resources) else {}
            for map_type in range(N_MAP_TYPES):
                chain, present = entry.get(map_type, ([(0, 0, 1, 1)], False))
                if not present:
                    chain = [fb_rects[map_type]]
                rects[r, map_type] = chain[0]
                has[r, map_type] = present
                n_levels[r, map_type] = len(chain)
                for li in range(MAX_MIPS):
                    mip_rects[r, map_type, li] = chain[min(li, len(chain) - 1)]
        packed, packed_rects = self._build_packed(texels, rects, has)
        # host mirror for callers that need has_map host-side: reading the
        # device copy back would be a device->host transfer, and ONE such
        # transfer permanently degrades every later dispatch ~300x on the
        # axon TPU runtime (docs/PERF.md round 2j)
        self.has_np = has
        return TextureAtlas(
            texels=jnp.asarray(texels), rects=jnp.asarray(rects),
            has_map=jnp.asarray(has), mip_rects=jnp.asarray(mip_rects),
            n_levels=jnp.asarray(n_levels),
            packed=jnp.asarray(packed), packed_rects=jnp.asarray(packed_rects),
        )

    @staticmethod
    def _build_packed(texels, rects, has):
        """Channel-packed twin: per resource, one rect at its largest map's
        size with every map resampled into PACKED_C channels."""
        n_res = rects.shape[0]
        sizes = []
        for r in range(n_res):
            w = h = 1
            for mt in range(N_MAP_TYPES):
                if has[r, mt]:
                    w = max(w, int(rects[r, mt, 2]))
                    h = max(h, int(rects[r, mt, 3]))
            sizes.append((w, h))

        # shelf-pack the per-resource tiles
        max_w = max(4096, max(w for w, _ in sizes))
        sx = sy = sh = 0
        out_rects = np.zeros((n_res, 4), np.int32)
        for r, (w, h) in enumerate(sizes):
            if sx + w > max_w:
                sy += sh
                sx = 0
                sh = 0
            out_rects[r] = (sx, sy, w, h)
            sx += w
            sh = max(sh, h)
        Hp, Wp = sy + sh if n_res else 1, max(max(x + w for (x, _, w, _) in
                                                 [tuple(rr) for rr in out_rects]), 1)
        packed = np.zeros((max(Hp, 1), Wp, PACKED_C), np.float32)
        for r, (w, h) in enumerate(sizes):
            x0, y0 = int(out_rects[r, 0]), int(out_rects[r, 1])
            for mt in range(N_MAP_TYPES):
                c0, cw = _PACKED_SLICE[mt]
                if has[r, mt]:
                    rx, ry, rw, rh = (int(v) for v in rects[r, mt])
                    src = texels[ry : ry + rh, rx : rx + rw, :]
                    img = src if (rw == w and rh == h) else _resize_bilinear(src, h, w)
                else:
                    img = np.broadcast_to(
                        np.asarray(_FALLBACKS[mt], np.float32), (h, w, 3))
                packed[y0 : y0 + h, x0 : x0 + w, c0 : c0 + cw] = img[:, :, :cw]
        return packed, out_rects


def _resize_bilinear(img: np.ndarray, h: int, w: int) -> np.ndarray:
    """Pack-time numpy bilinear resize (half-pixel centers, edge clamp)."""
    sh, sw = img.shape[:2]
    ys = (np.arange(h, dtype=np.float32) + 0.5) * sh / h - 0.5
    xs = (np.arange(w, dtype=np.float32) + 0.5) * sw / w - 0.5
    y0 = np.clip(np.floor(ys).astype(np.int64), 0, sh - 1)
    x0 = np.clip(np.floor(xs).astype(np.int64), 0, sw - 1)
    y1 = np.minimum(y0 + 1, sh - 1)
    x1 = np.minimum(x0 + 1, sw - 1)
    fy = np.clip(ys - y0, 0.0, 1.0)[:, None, None]
    fx = np.clip(xs - x0, 0.0, 1.0)[None, :, None]
    top = img[y0][:, x0] * (1 - fx) + img[y0][:, x1] * fx
    bot = img[y1][:, x0] * (1 - fx) + img[y1][:, x1] * fx
    return (top * (1 - fy) + bot * fy).astype(np.float32)


def _packed_taps(packed_rects: jnp.ndarray, resource: jnp.ndarray, uv: jnp.ndarray):
    """Shared bilinear tap addressing for the channel-packed atlas: the 4
    GLOBAL tap coordinates (gx0, gx1, gy0, gy1) with repeat addressing
    inside the resource's rect, plus the (R, 1) bilinear weights fx, fy."""
    rect = jnp.take(packed_rects, resource, axis=0)  # (R,4)
    x0 = rect[:, 0].astype(jnp.float32)
    y0 = rect[:, 1].astype(jnp.float32)
    w = rect[:, 2].astype(jnp.float32)
    h = rect[:, 3].astype(jnp.float32)

    u = uv[:, 0] - jnp.floor(uv[:, 0])
    v = uv[:, 1] - jnp.floor(uv[:, 1])
    x = u * w - 0.5
    y = v * h - 0.5
    xf = jnp.floor(x)
    yf = jnp.floor(y)
    fx = (x - xf)[:, None]
    fy = (y - yf)[:, None]

    gx0 = (x0 + jnp.mod(xf, w)).astype(jnp.int32)
    gx1 = (x0 + jnp.mod(xf + 1.0, w)).astype(jnp.int32)
    gy0 = (y0 + jnp.mod(yf, h)).astype(jnp.int32)
    gy1 = (y0 + jnp.mod(yf + 1.0, h)).astype(jnp.int32)
    return gx0, gx1, gy0, gy1, fx, fy


def sample_packed(atlas: TextureAtlas, resource: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """One bilinear sample of the channel-packed atlas: EVERY map of the
    hit's resource in (R, PACKED_C) from 1 rect gather + 4 texel-row taps
    (vs (1+4) x N_MAP_TYPES narrow gathers with the per-map layout).
    Repeat addressing inside the rect, like sample_bilinear."""
    gx0, gx1, gy0, gy1, fx, fy = _packed_taps(atlas.packed_rects, resource, uv)
    width = atlas.packed.shape[1]
    flat = atlas.packed.reshape(-1, PACKED_C)

    def fetch(gx, gy):
        return jnp.take(flat, gy * width + gx, axis=0)

    c00 = fetch(gx0, gy0)
    c10 = fetch(gx1, gy0)
    c01 = fetch(gx0, gy1)
    c11 = fetch(gx1, gy1)
    top = c00 * (1 - fx) + c10 * fx
    bot = c01 * (1 - fx) + c11 * fx
    return top * (1 - fy) + bot * fy


def sample_packed_banded(atlas: TextureAtlas, resource: jnp.ndarray,
                         uv: jnp.ndarray, axis_name: str) -> jnp.ndarray:
    """gp-sharded sample_packed: ``atlas.packed`` holds only this chip's
    horizontal BAND of the packed atlas (global rows
    [band_lo, band_lo + Hb)); each chip fetches the bilinear taps it owns
    (others contribute zeros) and one psum over ``axis_name`` reconstructs
    the full (R, PACKED_C) sample on every chip. Row ownership is
    exclusive, so the psum is exact up to the f32 summation order of the
    4 tap terms (vs sample_packed's nested bilinear order).

    Replaces the fully-replicated atlas of the round-2 gp design
    (VERDICT round-1 missing #6: "ideally atlas pages") — per-chip packed
    texel memory scales 1/n_gp."""
    gx0, gx1, gy0, gy1, fx, fy = _packed_taps(atlas.packed_rects, resource, uv)
    band = atlas.packed
    hb, width = band.shape[0], band.shape[1]
    flat = band.reshape(-1, PACKED_C)
    lo = atlas.band_lo

    def fetch(gx, gy):
        ly = gy - lo
        own = (ly >= 0) & (ly < hb)
        idx = jnp.clip(ly, 0, hb - 1) * width + gx
        return jnp.where(own[:, None], jnp.take(flat, idx, axis=0), 0.0)

    c00 = fetch(gx0, gy0)
    c10 = fetch(gx1, gy0)
    c01 = fetch(gx0, gy1)
    c11 = fetch(gx1, gy1)
    local = (c00 * (1 - fx) + c10 * fx) * (1 - fy) \
        + (c01 * (1 - fx) + c11 * fx) * fy
    return jax.lax.psum(local, axis_name)


def band_atlas(atlas: TextureAtlas, n_bands: int) -> jnp.ndarray:
    """Split the packed atlas into ``n_bands`` equal row bands (rows padded
    up) for P('gp') sharding: (n_bands, Hb, Wp, PACKED_C). Pass the result
    to dist.geometry's step as ``atlas_bands``."""
    packed = atlas.packed
    hp, wp, c = packed.shape
    hb = -(-hp // n_bands)
    pad = n_bands * hb - hp
    if pad:
        packed = jnp.pad(packed, ((0, pad), (0, 0), (0, 0)))
    return packed.reshape(n_bands, hb, wp, c)


def packed_map(sampled: jnp.ndarray, map_type: int) -> jnp.ndarray:
    """(R, PACKED_C) packed sample -> this map's (R, 3) value (scalar maps
    broadcast, matching the grayscale-replicated per-map layout)."""
    c0, cw = _PACKED_SLICE[map_type]
    if cw == 3:
        return sampled[:, c0 : c0 + 3]
    c = sampled[:, c0]
    return jnp.stack([c, c, c], axis=-1)


def sample_bilinear(atlas: TextureAtlas, resource: jnp.ndarray, map_type: int, uv: jnp.ndarray) -> jnp.ndarray:
    """Bilinear LOD-0 sample with repeat addressing inside each rect — matches
    the kernel's sampler (min/mag linear, address::repeat, Raytracing.metal:421).

    resource: (R,) int32 per-ray resource ids. uv: (R, 2). Returns (R, 3).
    """
    rect = atlas.rects[resource, map_type]  # (R,4)
    return _bilinear_rect(atlas, rect, uv)


def sample_trilinear(atlas: TextureAtlas, resource: jnp.ndarray, map_type: int,
                     uv: jnp.ndarray, lod_base: jnp.ndarray) -> jnp.ndarray:
    """Trilinear mip sample with a ray-cone LOD (beyond-reference: the Metal
    compute kernel has no derivatives and reads LOD 0, Raytracing.metal:421).

    ``lod_base``: (R,) log2 of the ray-cone footprint in UV units; the
    per-map LOD adds log2 of the map's level-0 texel size so one footprint
    drives all maps of a hit regardless of their resolutions.
    """
    f32 = jnp.float32
    r0 = atlas.rects[resource, map_type]
    nl = atlas.n_levels[resource, map_type].astype(f32)
    size0 = jnp.maximum(r0[:, 2].astype(f32) * r0[:, 3].astype(f32), 1.0)
    lod = jnp.clip(lod_base + 0.5 * jnp.log2(size0), 0.0, nl - 1.0)
    l0 = jnp.floor(lod)
    l1 = jnp.minimum(l0 + 1.0, nl - 1.0)
    frac = (lod - l0)[:, None]
    flat_mr = atlas.mip_rects.reshape(-1, 4)
    base = (resource * N_MAP_TYPES + map_type) * MAX_MIPS
    rect0 = jnp.take(flat_mr, base + l0.astype(jnp.int32), axis=0)
    rect1 = jnp.take(flat_mr, base + l1.astype(jnp.int32), axis=0)
    c0 = _bilinear_rect(atlas, rect0, uv)
    c1 = _bilinear_rect(atlas, rect1, uv)
    return c0 * (1.0 - frac) + c1 * frac


def _bilinear_rect(atlas: TextureAtlas, rect: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample with repeat addressing inside a per-lane rect (R,4)."""
    x0 = rect[:, 0].astype(jnp.float32)
    y0 = rect[:, 1].astype(jnp.float32)
    w = rect[:, 2].astype(jnp.float32)
    h = rect[:, 3].astype(jnp.float32)

    u = uv[:, 0] - jnp.floor(uv[:, 0])
    v = uv[:, 1] - jnp.floor(uv[:, 1])
    x = u * w - 0.5
    y = v * h - 0.5
    xf = jnp.floor(x)
    yf = jnp.floor(y)
    fx = (x - xf)[:, None]
    fy = (y - yf)[:, None]

    def wrap(i, n):
        return jnp.mod(i, n)

    xi0 = wrap(xf, w)
    xi1 = wrap(xf + 1.0, w)
    yi0 = wrap(yf, h)
    yi1 = wrap(yf + 1.0, h)

    width = atlas.width
    flat = atlas.texels.reshape(-1, 3)

    def fetch(xi, yi):
        gx = (x0 + xi).astype(jnp.int32)
        gy = (y0 + yi).astype(jnp.int32)
        return jnp.take(flat, gy * width + gx, axis=0)

    c00 = fetch(xi0, yi0)
    c10 = fetch(xi1, yi0)
    c01 = fetch(xi0, yi1)
    c11 = fetch(xi1, yi1)
    top = c00 * (1 - fx) + c10 * fx
    bot = c01 * (1 - fx) + c11 * fx
    return top * (1 - fy) + bot * fy
