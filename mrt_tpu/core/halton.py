"""Vectorized Halton QMC sampler with the reference's exact dimension schedule.

Port targets (for RMSE parity with the Metal reference):
* prime table + radical inverse: ``Raytracing.metal:28-57``
* per-pixel decorrelation offsets ``arc4random() % 2^20``: ``Renderer.swift:719-738``
* dimension schedule: AA jitter uses dims (0,1); light pick / area-light sample /
  transparency choice use ``2 + step*6 + {0,1,2,5}``; the bounce direction uses
  ``2 + step*5 + {3,4}`` — the reference's inconsistent 6- vs 5-stride is
  intentional here too (``Raytracing.metal:273,545,588,600,677,763``).

TPU-first: the radical-inverse while loop becomes a fixed-trip-count
``fori_loop`` with masking (data-dependent trip counts don't exist under XLA).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# First 100 primes (Raytracing.metal:28-34).
PRIMES = np.array(
    [
        2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37, 41, 43, 47, 53, 59, 61, 67, 71,
        73, 79, 83, 89, 97, 101, 103, 107, 109, 113, 127, 131, 137, 139, 149, 151,
        157, 163, 167, 173, 179, 181, 191, 193, 197, 199, 211, 223, 227, 229, 233,
        239, 241, 251, 257, 263, 269, 271, 277, 281, 283, 293, 307, 311, 313, 317,
        331, 337, 347, 349, 353, 359, 367, 373, 379, 383, 389, 397, 401, 409, 419,
        421, 431, 433, 439, 443, 449, 457, 461, 463, 467, 479, 487, 491, 499, 503,
        509, 521, 523, 541,
    ],
    dtype=np.int32,
)

_PRIMES_J = jnp.asarray(PRIMES)

# i < 2^20 (random offset) + frame budget; 32 base-2 digits covers any int32.
_MAX_DIGITS = 32

# Offsets are arc4random() % 2^20 (Renderer.swift:736).
RANDOM_OFFSET_MOD = 1 << 20


def halton_base(i: jnp.ndarray, b: jnp.ndarray,
                max_digits: int = _MAX_DIGITS) -> jnp.ndarray:
    """Radical inverse of ``i`` in (per-lane) base ``b``.

    ``max_digits`` bounds the fixed-trip digit loop; it must satisfy
    ``b ** max_digits > max(i)`` for exactness. 14 covers ANY int32 input
    for b >= 5 (5^14 > 2^31) — the per-step dimension schedule only ever
    produces bases >= primes[2] = 5, so per-bounce call sites pass 14 and
    skip 18 dead iterations of int div/mod on every lane.
    """
    i = jnp.asarray(i, jnp.int32)
    b_f = b.astype(jnp.float32)
    inv_b = 1.0 / b_f

    def body(_, carry):
        i_cur, f, r = carry
        active = i_cur > 0
        f_next = f * inv_b
        r_next = r + f_next * (i_cur % b).astype(jnp.float32)
        i_next = i_cur // b
        return (
            jnp.where(active, i_next, i_cur),
            jnp.where(active, f_next, f),
            jnp.where(active, r_next, r),
        )

    shape = jnp.broadcast_shapes(i.shape, b.shape)
    i0 = jnp.broadcast_to(i, shape)
    f0 = jnp.ones(shape, jnp.float32)
    r0 = jnp.zeros(shape, jnp.float32)
    _, _, r = jax.lax.fori_loop(0, max_digits, body, (i0, f0, r0))
    return r


def halton(i: jnp.ndarray, d: jnp.ndarray) -> jnp.ndarray:
    """Radical inverse of ``i`` in base ``primes[d]`` (Raytracing.metal:42-57).

    ``i``: int32 array (any shape). ``d``: int32 array broadcastable to ``i``
    (dimension index into the prime table, may be traced — per-ray ``step``
    values diverge after transparency hits).
    """
    d = jnp.asarray(d, jnp.int32)
    return halton_base(i, _PRIMES_J[jnp.clip(d, 0, 99)])


# All six per-bounce sample dimensions are functions of the SAME per-lane
# ``step``, and every dim clips at 99 — at step >= 19 all six rows are
# identical (primes[99]). One (20, 6)-row gather therefore replaces six
# separate per-lane prime-table gathers per bounce (each 65k-row gather
# profiled at ~0.5 ms; docs/PERF.md round 2b).
_STEP_BASE_COLS = ("light_pick", "area_a", "area_b", "transparency",
                   "bounce_x", "bounce_y")
_STEP_BASES = np.stack(
    [
        np.array([
            PRIMES[min(2 + s * 6 + 0, 99)],
            PRIMES[min(2 + s * 6 + 1, 99)],
            PRIMES[min(2 + s * 6 + 2, 99)],
            PRIMES[min(2 + s * 6 + 5, 99)],
            PRIMES[min(2 + s * 5 + 3, 99)],
            PRIMES[min(2 + s * 5 + 4, 99)],
        ], dtype=np.int32)
        for s in range(20)
    ],
    axis=0,
)
# Paired rows [bases(s) | bases(s+1)] so a bounce iteration needs ONE gather
# even though the glass branch advances ``step`` mid-iteration: callers pick
# cur/next per lane with a select afterwards.
_STEP_BASES_PAIR_J = jnp.asarray(
    np.concatenate([_STEP_BASES, _STEP_BASES[np.minimum(np.arange(20) + 1, 19)]],
                   axis=1)
)
# (12, 20) f32 transpose for the one-hot-matmul lookup in step_bases_pair.
_STEP_BASES_PAIR_T_F = jnp.asarray(
    np.concatenate([_STEP_BASES, _STEP_BASES[np.minimum(np.arange(20) + 1, 19)]],
                   axis=1).T.astype(np.float32)
)

# base >= 5 everywhere in the step schedule -> 14 digits cover any int32
STEP_MAX_DIGITS = 14


def step_bases_pair(step: jnp.ndarray):
    """Per-lane bases for all six per-step dims, for ``step`` AND ``step+1``.

    Lookup is a one-hot MATMUL against the tiny (20, 12) base table, not a
    gather: a (N, 12) row-gather output is sublane-packed, and unpacking its
    12 columns into lane vectors compiled to a ~492k-cycle kLoop relayout per
    bounce iteration (measured, docs/PERF.md round 2d). ``bases.T @ onehot``
    produces (12, N) directly lane-major — column extraction is free — and
    the 12x20xN matmul is noise on the MXU. Returns (cur, nxt) dicts keyed
    by ``_STEP_BASE_COLS``."""
    s = jnp.clip(step, 0, 19)
    onehot = (s[None, :] == jnp.arange(20, dtype=jnp.int32)[:, None]).astype(
        jnp.float32)  # (20, N)
    rows = _STEP_BASES_PAIR_T_F @ onehot  # (12, N), primes <= 541 exact in f32
    rows = rows.astype(jnp.int32)
    cur = {k: rows[j] for j, k in enumerate(_STEP_BASE_COLS)}
    nxt = {k: rows[6 + j] for j, k in enumerate(_STEP_BASE_COLS)}
    return cur, nxt


def halton_np(i: int, d: int) -> float:
    """Scalar NumPy twin of :func:`halton` — the test oracle."""
    b = int(PRIMES[d])
    f = 1.0
    inv_b = np.float32(1.0) / np.float32(b)
    r = np.float32(0.0)
    while i > 0:
        f = np.float32(f * inv_b)
        r = np.float32(r + f * np.float32(i % b))
        i //= b
    return float(r)


def make_pixel_offsets(key: jax.Array, height: int, width: int) -> jnp.ndarray:
    """Per-pixel random Halton index offsets, mirroring the random texture fill
    ``arc4random() % (1024*1024)`` (Renderer.swift:719-738). Returns (H,W) int32."""
    bits = jax.random.randint(key, (height, width), 0, RANDOM_OFFSET_MOD, dtype=jnp.int32)
    return bits


# --- dimension schedule helpers (Raytracing.metal) -------------------------------

def dim_aa() -> tuple[int, int]:
    """Anti-aliasing jitter dims (Raytracing.metal:273-274)."""
    return 0, 1


def dim_light_pick(step: jnp.ndarray) -> jnp.ndarray:
    """Raytracing.metal:588."""
    return 2 + step * 6 + 0


def dim_area_sample(step: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Raytracing.metal:600-601."""
    return 2 + step * 6 + 1, 2 + step * 6 + 2


def dim_transparency(step: jnp.ndarray) -> jnp.ndarray:
    """Raytracing.metal:545."""
    return 2 + step * 6 + 5


def dim_bounce(step: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """NOTE the 5-stride (not 6) — load-bearing quirk (Raytracing.metal:677,763)."""
    return 2 + step * 5 + 3, 2 + step * 5 + 4
