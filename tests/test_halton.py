"""Halton sampler parity tests (Raytracing.metal:28-57 semantics)."""

import jax.numpy as jnp
import numpy as np

from mrt_tpu.core import halton as H


def test_halton_matches_scalar_oracle():
    rng = np.random.default_rng(0)
    i = rng.integers(0, 1 << 20, size=256).astype(np.int32)
    d = rng.integers(0, 100, size=256).astype(np.int32)
    got = np.asarray(H.halton(jnp.asarray(i), jnp.asarray(d)))
    want = np.array([H.halton_np(int(a), int(b)) for a, b in zip(i, d)], np.float32)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)


def test_halton_base2_known_values():
    # radical inverse base 2: 1 -> 0.5, 2 -> 0.25, 3 -> 0.75, 4 -> 0.125
    i = jnp.asarray([1, 2, 3, 4], jnp.int32)
    got = np.asarray(H.halton(i, jnp.zeros(4, jnp.int32)))
    np.testing.assert_allclose(got, [0.5, 0.25, 0.75, 0.125], atol=1e-7)


def test_halton_zero_index_is_zero():
    assert float(H.halton(jnp.asarray(0), jnp.asarray(5))) == 0.0


def test_halton_range():
    i = jnp.arange(1, 2000, dtype=jnp.int32)
    for d in (0, 1, 7, 99):
        vals = np.asarray(H.halton(i, jnp.full_like(i, d)))
        assert (vals > 0).all() and (vals < 1).all()


def test_dimension_schedule_quirk():
    # The 6-stride for light/transparency dims vs 5-stride for bounce dims
    # (Raytracing.metal:545,588,763) must be preserved verbatim.
    step = jnp.asarray(3)
    assert int(H.dim_light_pick(step)) == 2 + 3 * 6
    a, b = H.dim_area_sample(step)
    assert (int(a), int(b)) == (2 + 3 * 6 + 1, 2 + 3 * 6 + 2)
    assert int(H.dim_transparency(step)) == 2 + 3 * 6 + 5
    x, y = H.dim_bounce(step)
    assert (int(x), int(y)) == (2 + 3 * 5 + 3, 2 + 3 * 5 + 4)


def test_pixel_offsets_range():
    import jax

    offs = np.asarray(H.make_pixel_offsets(jax.random.PRNGKey(1), 16, 32))
    assert offs.shape == (16, 32)
    assert offs.min() >= 0 and offs.max() < H.RANDOM_OFFSET_MOD


def test_halton_f32_divide_exact_adversarial():
    """The unrolled f32 reciprocal-divide core (round 4b) must produce EXACT
    digits wherever f32 can represent the index (i < 2^24): sweep every
    prime base with indices sitting directly on/next to quotient boundaries
    (k*b - 1, k*b, k*b + 1 for k spanning the range) plus dense low ranges
    and random high ones — bitwise equality vs the scalar int oracle."""
    rng = np.random.default_rng(7)
    for d in range(100):
        b = int(H.PRIMES[d])
        ks = np.unique(rng.integers(1, (1 << 24) // b, size=64))
        near = np.concatenate([ks * b - 1, ks * b, ks * b + 1])
        dense = np.arange(0, 4096, 97)
        high = rng.integers(1 << 20, 1 << 24, size=64)
        i = np.unique(np.concatenate([near, dense, high])).astype(np.int64)
        i = i[(i >= 0) & (i < (1 << 24))].astype(np.int32)
        got = np.asarray(H.halton(jnp.asarray(i), jnp.full(i.shape, d, jnp.int32)))
        want = np.array([H.halton_np(int(v), d) for v in i], np.float32)
        assert (got == want).all(), f"base {b}: mismatch"


def test_halton_step_digits_cover_exact_range():
    # STEP_MAX_DIGITS must cover the full f32-exact index range for the
    # smallest schedule base (primes[2] = 5).
    assert 5 ** H.STEP_MAX_DIGITS > (1 << 24)
    assert 2 ** H._MAX_DIGITS >= (1 << 24)

def test_halton_top_band_deterministic():
    """ADVICE r4: the +/-1 fixup's unverified edge was q*b possibly rounding
    when i is within b of 2^24. Deterministically sweep the ENTIRE top band
    [2^24 - 541, 2^24) (541 = largest prime base) for all 100 bases —
    bitwise equality vs the scalar oracle."""
    top = np.arange((1 << 24) - 541, 1 << 24, dtype=np.int32)
    ij = jnp.asarray(top)
    for d in range(100):
        got = np.asarray(H.halton(ij, jnp.full(top.shape, d, jnp.int32)))
        want = np.array([H.halton_np(int(v), d) for v in top], np.float32)
        assert (got == want).all(), f"base {int(H.PRIMES[d])}: top-band mismatch"


def test_halton_wraps_above_2_24():
    """Indices >= 2^24 wrap into [0, 2^24) (graceful sequence restart, not
    corrupt digits): halton(i + 2^24) == halton(i)."""
    i = np.array([0, 1, 12345, (1 << 24) - 1], np.int32)
    hi = (i.astype(np.int64) + (1 << 24)).astype(np.int32)
    for d in (0, 1, 5, 99):
        a = np.asarray(H.halton(jnp.asarray(i), jnp.int32(d)))
        b = np.asarray(H.halton(jnp.asarray(hi), jnp.int32(d)))
        assert (a == b).all()
