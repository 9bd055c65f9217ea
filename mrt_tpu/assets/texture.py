"""Texture atlas — the TPU-native replacement for the per-submesh
``texture2d`` binding set (SubMesh.swift:176-241, Raytracing.metal:420-456).

Per-hit texture fetches are a gather storm on TPU (SURVEY.md §7 hard part 4),
so all maps of all resources are packed into ONE device-resident RGB atlas;
a hit gathers its resource's rect and bilinearly samples inside it with
repeat addressing. Fallback colors follow SubMesh.swift:176-241 (white /
black / neutral-normal 1x1 tiles).

Note on mipmaps: the reference generates them but its compute-kernel
``sample()`` has no derivatives, so Metal samples LOD 0 — we match that and
sample level 0 bilinear only.

sRGB: baseColor maps are sRGB-decoded to linear at pack time
(``type: .sRGB`` load at SubMesh.swift:187).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

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


class TextureAtlas(NamedTuple):
    """Device atlas + per-(resource, map-type) rects."""

    texels: jnp.ndarray  # (H, W, 3) f32 linear
    rects: jnp.ndarray  # (R, N_MAP_TYPES, 4) int32: x0, y0, w, h
    has_map: jnp.ndarray  # (R, N_MAP_TYPES) bool

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
                    rect = self._by_path[pkey]
                    entry[map_type] = (rect, True)
                    continue
                img = load_image(src)
            elif isinstance(src, np.ndarray):
                img = src.astype(np.float32)
                if img.ndim == 2:
                    img = np.repeat(img[:, :, None], 3, axis=2)
            if img is None:
                entry[map_type] = ((0, 0, 1, 1), False)
                continue
            if map_type in _SRGB_MAPS:
                img = srgb_to_linear(img)
            x0, y0 = self._place(img)
            rect = (x0, y0, img.shape[1], img.shape[0])
            if isinstance(src, str):
                self._by_path[(src, map_type in _SRGB_MAPS)] = rect
            entry[map_type] = (rect, True)
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
        for r in range(n_res):
            entry = self._resources[r] if r < len(self._resources) else {}
            for map_type in range(N_MAP_TYPES):
                rect, present = entry.get(map_type, ((0, 0, 1, 1), False))
                if not present:
                    rect = fb_rects[map_type]
                rects[r, map_type] = rect
                has[r, map_type] = present
        return TextureAtlas(
            texels=jnp.asarray(texels), rects=jnp.asarray(rects), has_map=jnp.asarray(has)
        )


def sample_bilinear(atlas: TextureAtlas, resource: jnp.ndarray, map_type: int, uv: jnp.ndarray) -> jnp.ndarray:
    """Bilinear LOD-0 sample with repeat addressing inside each rect — matches
    the kernel's sampler (min/mag linear, address::repeat, Raytracing.metal:421).

    resource: (R,) int32 per-ray resource ids. uv: (R, 2). Returns (R, 3).
    """
    rect = atlas.rects[resource, map_type]  # (R,4)
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
