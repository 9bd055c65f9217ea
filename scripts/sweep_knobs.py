"""Execution-strategy knob sweep at the quick-bench config (512x512,
spp=2, bounces=4, app scene): fuse_shadow_rays / chunks / tile size.

Run detached: nohup python scripts/sweep_knobs.py > /tmp/knobs.log 2>&1 &
Cases can be passed on the CLI as JSON env-dicts (and extra bench.py args
after --), e.g.:
  python scripts/sweep_knobs.py '{}' '{"MRT_UNROLL": "4"}' -- --quick
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CASES = [
    {"MRT_CHUNKS": "8"},
    {"MRT_CHUNKS": "4"},
    {"MRT_CHUNKS": "32"},
    {"MRT_UNROLL": "4"},
    {"MRT_CHUNKS": "8", "MRT_UNROLL": "4"},
]


def main():
    args = sys.argv[1:]
    bench_args = ["--quick"]
    if "--" in args:
        i = args.index("--")
        args, bench_args = args[:i], args[i + 1:]
    cases = [json.loads(a) for a in args] if args else CASES
    for env in cases:
        e = dict(os.environ, **env)
        p = subprocess.run([sys.executable, os.path.join(REPO, "bench.py")] + bench_args,
                           capture_output=True, text=True, timeout=1800, env=e)
        lines = [ln for ln in p.stdout.splitlines() if ln.startswith("{")]
        val = json.loads(lines[-1])["value"] if lines else None
        print(json.dumps({"env": env, "mrays_s": val}), flush=True)


if __name__ == "__main__":
    main()
