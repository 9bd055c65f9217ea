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

# Digit budget for the generic (base >= 2) path: the f32 divide core is
# exact for i < 2^24, and 2^24 needs exactly 24 base-2 digits — trips beyond
# that are dead weight now that the loop is statically unrolled (each extra
# stage is real VPU work, not a masked no-op inside a while).
_MAX_DIGITS = 24

# Offsets are arc4random() % 2^20 (Renderer.swift:736).
RANDOM_OFFSET_MOD = 1 << 20


def halton_base(i: jnp.ndarray, b: jnp.ndarray,
                max_digits: int = _MAX_DIGITS) -> jnp.ndarray:
    """Radical inverse of ``i`` in (per-lane) base ``b``.

    ``max_digits`` bounds the fixed-trip digit loop; it must satisfy
    ``b ** max_digits >= 2^24`` for exactness over the supported index
    range [0, 2^24): 24 covers base 2 (the worst case); the per-step
    dimension schedule only ever produces bases >= primes[2] = 5, so
    per-bounce call sites pass STEP_MAX_DIGITS = 11 (5^11 > 2^24) and skip
    13 dead iterations on every lane. Indices are wrapped into [0, 2^24)
    below (f32 ints are exact there; the wrap is the identity for every
    reachable render index and degrades an over-long accumulation to a
    sequence restart instead of corrupt digits).

    TPU codegen (docs/PERF.md round 4b): the digit loop is STATICALLY
    UNROLLED (a ``fori_loop`` here profiled at 112 ms per bounce-dim per
    2-frame 1080p capture — six of them were 13% of device time; while-loop
    machinery dominated the ~10 useful trips) and the per-digit divide runs
    ENTIRELY in f32 via the reciprocal + two-sided fixup below — XLA lowers
    a vectorized s32 divide-by-traced-divisor to a long multi-op sequence,
    while the f32 path is 6 VPU ops and bit-exact for every index below
    2^24 (any real render; see the bound note in the body).

    Bit-identity with the pre-round-4b int loop: digits are the exact
    ``i % b`` values (f32-represented small ints), ``f`` decays by the same
    rounded ``1/b`` products, and exhausted lanes (``i == 0``) contribute
    exact zeros — the old per-trip ``where`` masking was value-neutral and
    is dropped. Verified digit-exact vs the scalar NumPy oracle across all
    100 prime bases and adversarial near-multiple indices
    (tests/test_halton.py).
    """
    i = jnp.asarray(i, jnp.int32) & jnp.int32((1 << 24) - 1)  # see docstring
    shape = jnp.broadcast_shapes(i.shape, jnp.shape(b))
    b_f = jnp.broadcast_to(b, shape).astype(jnp.float32)
    inv_b = 1.0 / b_f
    # f32 holds ints exactly below 2^24; the reciprocal-floor quotient with a
    # +/-1 fixup is then exact (b <= 541 << 2^24 / i). Indices are
    # offset (< 2^20) + frame_index * spp — reaching 2^24 would take ~4M
    # accumulated samples per pixel (hours at any measured FPS, and the
    # image converged long before); halton_np remains the any-range oracle.
    i_f = jnp.broadcast_to(i, shape).astype(jnp.float32)
    f = jnp.ones(shape, jnp.float32)
    r = jnp.zeros(shape, jnp.float32)
    for _ in range(max_digits):
        q = jnp.floor(i_f * inv_b)
        rem = i_f - q * b_f
        # floor(i * rn(1/b)) can be off by one in either direction: clamp
        # the remainder back into [0, b).
        under = rem < 0.0
        q = jnp.where(under, q - 1.0, q)
        rem = jnp.where(under, rem + b_f, rem)
        over = rem >= b_f
        q = jnp.where(over, q + 1.0, q)
        rem = jnp.where(over, rem - b_f, rem)
        f = f * inv_b
        r = r + f * rem
        i_f = q
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

# base >= 5 everywhere in the step schedule; the f32 divide core is exact to
# i < 2^24 and 5^11 > 2^24, so 11 digits cover the entire exact range (the
# old value 14 targeted "any int32", which the divide core no longer
# reaches anyway — digits 12-14 were provably dead stages).
STEP_MAX_DIGITS = 11


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
