"""Interactive terminal driver — the GameViewController analog
(GameViewController.swift:70-341): the same ~15 runtime controls wired to the
renderer, driven by a REPL instead of AppKit gestures. Frames stream to a PNG
(or a kitty/iterm-capable terminal via --ansi preview).

Controls (one command per line):
  orbit DX DY     pan-equivalent orbit (sensitivity 0.005, Renderer.swift:1330)
  zoom D          magnify-equivalent zoom
  preset NAME     front|back|left|right|top|bottom|isometric|free
  w/a/s/d         move player model (TPS), q/e rotate (GameViewController:345-372)
  spp N           samples per pixel {1,2,4,8,16}
  bounces N       max bounces 1-5
  scale F         render scale {0.34,0.5,0.67,0.75,1.0}
  accum F         accumulation weight 0-0.95
  upscaler M      off|spatial|temporal|denoised
  shading M       pbr|legacy
  debug N         0-7 debug texture mode
  light F         light intensity 0-50
  mode M          world|tps
  frames N        draw N frames (default 1 per command)
  save PATH       write current image
  stats           print frame stats
  quit
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    if "--cpu" in sys.argv:
        import jax

        jax.config.update("jax_platforms", "cpu")
    size = int(sys.argv[sys.argv.index("--size") + 1]) if "--size" in sys.argv else 256
    out = sys.argv[sys.argv.index("--out") + 1] if "--out" in sys.argv else "/tmp/mrt_frame.png"

    from mrt_tpu import Renderer, make_app_scene
    from mrt_tpu.core import types as T
    from mrt_tpu.upscale.presenter import write_png

    scene = make_app_scene(width=size, height=size)
    r = Renderer(scene, output_width=size, output_height=size)
    shading = {"pbr": T.SHADING_MODE_PBR, "legacy": T.SHADING_MODE_LEGACY}
    ansi = "--ansi" in sys.argv

    def show_ansi(img, cols=48):
        """Truecolor half-block terminal preview (kitty/iterm/vt are fine):
        two image rows per text row via the upper-half-block glyph."""
        h, w = img.shape[:2]
        step = max(1, w // cols)
        small = img[:: 2 * step, ::step]
        lower = img[step :: 2 * step, ::step]
        lines = []
        for y in range(min(small.shape[0], lower.shape[0])):
            row = []
            for x in range(small.shape[1]):
                tr, tg, tb = (int(v) for v in small[y, x])
                br, bg, bb = (int(v) for v in lower[y, x])
                row.append(f"\x1b[38;2;{tr};{tg};{tb}m"
                           f"\x1b[48;2;{br};{bg};{bb}m▀")
            lines.append("".join(row) + "\x1b[0m")
        print("\n".join(lines))

    def frame(n=1):
        for _ in range(n):
            r.draw()
        img = r.output_image()
        write_png(out, img)
        if ansi:
            show_ansi(img)
        print(f"frame {r.frame_index} -> {out}")

    frame()
    for line in sys.stdin:
        parts = line.strip().split()
        if not parts:
            frame()
            continue
        cmd, args = parts[0].lower(), parts[1:]
        try:
            if cmd == "quit":
                break
            elif cmd == "orbit":
                r.orbit(float(args[0]), float(args[1]))
            elif cmd == "zoom":
                r.zoom(float(args[0]))
            elif cmd == "preset":
                r.apply_view_preset(args[0])
            elif cmd in ("w", "s"):
                scene.move_model(r.player_model_index, forward=0.1 if cmd == "w" else -0.1)
            elif cmd in ("a", "d"):
                scene.move_model(r.player_model_index, right=-0.1 if cmd == "a" else 0.1)
            elif cmd in ("q", "e"):
                scene.rotate_model(r.player_model_index, 0.1 if cmd == "q" else -0.1)
            elif cmd == "spp":
                r.samples_per_pixel = int(args[0])
            elif cmd == "bounces":
                r.max_bounces = max(1, min(5, int(args[0])))
            elif cmd == "scale":
                r.render_scale = float(args[0])
            elif cmd == "accum":
                r.accumulation_weight = float(np.clip(float(args[0]), 0, 0.95))
            elif cmd == "upscaler":
                r.upscaler_mode = args[0]
            elif cmd == "shading":
                r.shading_mode = shading[args[0]]
            elif cmd == "debug":
                r.debug_texture_mode = int(args[0])
            elif cmd == "light":
                scene.set_light_intensity(float(np.clip(float(args[0]), 0, 50)))
            elif cmd == "mode":
                r.view_mode = args[0]
            elif cmd == "frames":
                frame(int(args[0]))
                continue
            elif cmd == "loop":
                # free-running render loop with an orbiting camera — the
                # display-link analog (Renderer.swift:1405-1503): N frames
                # drawn back-to-back with an FPS readout
                import time as _time

                n = int(args[0]) if args else 30
                dx = float(args[1]) if len(args) > 1 else 2.0
                t0 = _time.perf_counter()
                for _ in range(n):
                    r.orbit(dx, 0.0)
                    r.draw()
                img = r.output_image()
                dt = _time.perf_counter() - t0
                write_png(out, img)
                if ansi:
                    show_ansi(img)
                print(f"loop {n} frames in {dt:.2f}s = {n/dt:.2f} fps")
                continue
            elif cmd == "save":
                write_png(args[0], r.output_image())
                print("saved", args[0])
                continue
            elif cmd == "stats":
                print(r.stats.report())
                continue
            elif cmd == "instancing":  # two-level BLAS/TLAS on/off
                r.two_level = args[0] in ("1", "on", "true")
            elif cmd == "stream":  # traversal stream window (0 = chunked)
                r.traversal_stream = int(args[0])
            elif cmd == "priming":  # hit/occluder priming on/off
                r.hit_priming = args[0] in ("1", "on", "true")
            else:
                print("unknown command:", cmd)
                continue
            frame()
        except Exception as e:  # keep the loop alive on bad input
            print("error:", e)


if __name__ == "__main__":
    main()
