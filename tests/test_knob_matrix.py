"""Env-knob matrix smoke: the round-3 TPU queue (scripts/r3_tpu_queue.sh)
sweeps import-time knobs; each combo must render finite, non-trivial
images that agree with the default config. Fresh subprocess per combo
(knobs are read at module import)."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, sys
sys.path.insert(0, %r)
import numpy as np
from mrt_tpu.engine.renderer import Renderer, UPSCALER_OFF
from mrt_tpu.engine.scene import Model, Scene

scene = Scene(width=48, height=48)
scene.models = [Model("sphere", position=[0, 0.5, 0], scale=0.5),
                Model("plane", scale=10)]
r = Renderer(scene, output_width=48, output_height=48)
r.upscaler_mode = UPSCALER_OFF
r.samples_per_pixel = 1
r.max_bounces = 2
r.use_motion_adaptive_sampling = False
import os
if os.environ.get("MRT_TWOLEVEL"):  # bench.py-style knob (not import-time)
    r.two_level = os.environ["MRT_TWOLEVEL"] == "1"
for _ in range(2):
    r.draw()
img = np.asarray(r.accum)
print(json.dumps(dict(mean=float(img.mean()), finite=bool(np.isfinite(img).all()))))
""" % (REPO,)

COMBOS = [
    {},
    # MRT_PASSES/MRT_PASSCAP only affect the flat (two_level=False) path
    # (the two-level tail-continuation knob lost on TPU and was deleted,
    # docs/PERF.md round 4d)
    {"MRT_PASSES": "2", "MRT_PASSCAP": "8", "MRT_TWOLEVEL": "0"},
    {"MRT_ROW": "64", "MRT_ARITY": "8", "MRT_LEAF_K": "6"},
    # band-only partition sort (counting inverse; round 5) — bit-exact,
    # on both the two-level default and the flat path
    {"MRT_BANDSORT": "1"},
    {"MRT_BANDSORT": "1", "MRT_TWOLEVEL": "0"},
    # tail-aware DP collapse weight (round 5a, banked negative but the
    # builder path must stay correct): different tree, same image
    {"MRT_COLLAPSE_GAMMA": "1.25"},
]


def _run_child(child, env_extra):
    env = dict(os.environ, JAX_PLATFORMS="cpu", **env_extra)
    env.pop("PYTHONPATH", None)
    p = subprocess.run([sys.executable, "-c", child], capture_output=True,
                       text=True, env=env, cwd=REPO, timeout=600)
    assert p.returncode == 0, f"{env_extra}: {p.stderr[-500:]}"
    return json.loads(p.stdout.strip().splitlines()[-1])


def _run(env_extra):
    out = _run_child(CHILD, env_extra)
    assert out["finite"], env_extra
    return out["mean"]


@pytest.mark.parametrize("combo", COMBOS[1:], ids=lambda c: "+".join(
    f"{k}={v}" for k, v in c.items()))
def test_knob_combo_matches_default(combo):
    base = _run({})
    got = _run(combo)
    assert base > 1e-4
    # knob combos change traversal ORDER/layout, never radiometry; tiny
    # ULP drift is allowed, structural breakage is not
    assert abs(got - base) / base < 1e-3, (combo, base, got)


MASK_CHILD = r"""
import json, sys
sys.path.insert(0, %r)
import numpy as np
from mrt_tpu.core import types as T
from mrt_tpu.engine.renderer import Renderer, UPSCALER_OFF
from mrt_tpu.engine.scene import Model, Scene

means = {}
for key, mask in (("geom", T.GEOMETRY_MASK_GEOMETRY),
                  ("light", T.GEOMETRY_MASK_LIGHT)):
    scene = Scene(width=32, height=32)
    scene.models = [Model("sphere", position=[0, 1.3, 0], scale=0.3,
                          geometry_mask=mask),
                    Model("plane", scale=10)]
    r = Renderer(scene, output_width=32, output_height=32, seed=5)
    r.upscaler_mode = UPSCALER_OFF
    r.samples_per_pixel = 2
    r.max_bounces = 2
    r.use_motion_adaptive_sampling = False
    for _ in range(6):
        img = np.asarray(r.draw())
    means[key] = float(img.mean())
    assert np.isfinite(img).all()
print(json.dumps(means))
""" % (REPO,)


@pytest.mark.parametrize("combo", [
    {"MRT_PASSES": "2", "MRT_PASSCAP": "8", "MRT_TWOLEVEL": "0"},
], ids=lambda c: "+".join(f"{k}={v}" for k, v in c.items()))
def test_geometry_masks_survive_knob_combos(combo):
    """The per-lane ray_mask state must ride through the flat multipass
    alive-resort unchanged (a LIGHT-masked occluder stops shadowing under
    every execution strategy)."""
    out = _run_child(MASK_CHILD, combo)
    assert out["light"] > out["geom"] * 1.05, (combo, out)


AO_CHILD = r"""
import json, sys, tempfile
sys.path.insert(0, %r)
import numpy as np
from PIL import Image
from mrt_tpu.assets.obj import MaterialDef
from mrt_tpu.assets.procedural import plane
from mrt_tpu.engine.renderer import Renderer, UPSCALER_OFF
from mrt_tpu.engine.scene import Model, Scene
from mrt_tpu.core import types as T

dark = np.full((4, 4, 3), 40, np.uint8)  # AO = 0.157: strong occlusion
p = tempfile.mktemp(suffix=".png")
Image.fromarray(dark, "RGB").save(p)

mat = MaterialDef(name="f", base_color=(0.9, 0.9, 0.9), map_ao=p)
scene = Scene(width=32, height=32)
scene.models = [Model("floor", mesh=plane(material=mat), scale=10)]
r = Renderer(scene, output_width=32, output_height=32, seed=3)
r.upscaler_mode = UPSCALER_OFF
r.samples_per_pixel = 1
r.max_bounces = 1
r.use_motion_adaptive_sampling = False
r.apply_view_preset("top")
# AO debug view (Raytracing.metal:478-480): the sampled AO value when the
# gate is compiled in, magenta when gated out
r.debug_texture_mode = T.DEBUG_MODE_AO
img = np.asarray(r.draw())
assert np.isfinite(img).all()
lit = img[img.sum(-1) > 1e-5]
print(json.dumps(dict(
    enable_ao=T.ENABLE_AO,
    r=float(lit[:, 0].mean()), g=float(lit[:, 1].mean()), b=float(lit[:, 2].mean()),
)))
""" % (REPO,)


def test_ao_map_compile_gate():
    """AO is compile-gated like the reference's function constant
    (ShaderTypes.h:155-157): MRT_ENABLE_AO=1 compiles the AO-map path in
    (debug view shows the sampled value, Raytracing.metal:478-480); gated
    out, the debug view shows the magenta no-texture sentinel."""
    off = _run_child(AO_CHILD, {})
    assert not off["enable_ao"]
    # magenta sentinel: R ~ B >> G
    assert off["r"] > 0.9 and off["b"] > 0.9 and off["g"] < 0.1, off

    on = _run_child(AO_CHILD, {"MRT_ENABLE_AO": "1"})
    assert on["enable_ao"]
    # grayscale AO value ~0.157 in all channels
    for c in ("r", "g", "b"):
        assert abs(on[c] - 40.0 / 255.0) < 0.05, on
