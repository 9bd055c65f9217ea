"""Sweep XLA MSA/VMEM flags against the real traversal at table sizes above
the measured VMEM-placement cliff (scripts/microbench_tablesize.py found
0.87 MB tables trace at 0.1 ns/pop vs ~25 ns/pop at 3.5 MB+ — the table gets
placed in VMEM below some budget). Goal: find the flag that raises the
budget so the 9.5 MB flagship table (and bigger) goes to VMEM.

Each combo runs in a subprocess (XLA flags bind at backend init).

Run detached: nohup python scripts/sweep_vmem_flags.py > /tmp/vmemflags.log 2>&1 &
"""

import json
import os
import subprocess
import sys

CHILD = """
import json, time, sys
sys.path.insert(0, %(repo)r)
import numpy as np, jax, jax.numpy as jnp
from mrt_tpu.bvh import wide
from mrt_tpu.core import types as T

n_tris = %(n_tris)d
rng = np.random.default_rng(0)
c = rng.uniform(0, 1, (n_tris, 3)).astype(np.float32)
e = 0.6 / np.sqrt(n_tris)
v0, v1, v2 = c, c + rng.normal(size=(n_tris,3)).astype(np.float32)*e, c + rng.normal(size=(n_tris,3)).astype(np.float32)*e
bvh = wide.build(v0, v1, v2)

N = 65536
rng = np.random.default_rng(1)
o = rng.uniform(0, 1, (N, 3)).astype(np.float32); o[:, 2] = -1.0
d = rng.normal(0, 0.05, (N, 3)).astype(np.float32); d[:, 2] = 1.0
d /= np.linalg.norm(d, axis=1, keepdims=True)
rays = T.Rays(jnp.asarray(o), jnp.asarray(d), jnp.full((N,), np.inf, jnp.float32))
mask = jnp.ones((N,), bool)
fn = jax.jit(lambda table, ro, rd, rm, msk: wide._traverse(
    wide.WideBVH(table, bvh.node_child, bvh.leaf_tri, bvh.n_internal, bvh.depth),
    T.Rays(ro, rd, rm), 1e-4, False, msk, chunks=16, sort_rays=True, profile=True))
args = (bvh.table, rays.origin, rays.direction, rays.max_distance, mask)
st = fn(*args); jax.block_until_ready(st)
best = 1e9
for _ in range(3):
    t0 = time.perf_counter(); st = fn(*args); jax.block_until_ready(st)
    best = min(best, time.perf_counter() - t0)
pops = int(np.sum(np.asarray(st["pops"])))
print(json.dumps(dict(n_tris=n_tris, rows=bvh.n_rows,
                      mb=round(bvh.n_rows*wide.ROW*4/1e6, 2),
                      ns_per_pop=round(best/pops*1e9, 2),
                      mrays_s=round(N/best/1e6, 2))), flush=True)
"""

COMBOS = [
    ("baseline", ""),
    ("msa_max", "--xla_vf_max_vmem_used_by_memory_space_assignment=100663296"),
    ("cpp_on", "--xla_vf_vmem_enable_cross_program_prefetch=true"),
    ("cpp_permissive", "--xla_msa_cross_program_prefetch_permissive_mode=true"),
    ("msa_max+permissive",
     "--xla_vf_max_vmem_used_by_memory_space_assignment=100663296 "
     "--xla_msa_cross_program_prefetch_permissive_mode=true"),
    ("scoped_vmem", "--xla_tpu_scoped_vmem_limit_kib=98304"),
]


def main():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sizes = [30_000, 100_000]
    if len(sys.argv) > 1:
        sizes = [int(s) for s in sys.argv[1:]]
    for n_tris in sizes:
        for name, flags in COMBOS:
            env = dict(os.environ)
            env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") + " " + flags).strip()
            code = CHILD % dict(repo=repo, n_tris=n_tris)
            try:
                out = subprocess.run(
                    [sys.executable, "-c", code], env=env, capture_output=True,
                    text=True, timeout=1200,
                )
                line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")]
                payload = json.loads(line[-1]) if line else {"error": out.stderr[-300:]}
            except Exception as exc:  # noqa: BLE001
                payload = {"error": str(exc)[:300]}
            print(json.dumps({"combo": name, **payload}), flush=True)
    print(json.dumps({"done": True}), flush=True)


if __name__ == "__main__":
    main()
