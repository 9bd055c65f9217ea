"""LBVH build/refit/traversal tests — the Morton/LBVH-invariant and
Möller–Trumbore-vs-brute-force pyramid from SURVEY.md §4."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mrt_tpu.bvh import intersect, lbvh, traverse
from mrt_tpu.core.types import Rays


def random_tris(n, rng, spread=4.0, size=0.4):
    base = (rng.random((n, 3)) * 2 - 1) * spread
    v0 = base + (rng.random((n, 3)) - 0.5) * size
    v1 = base + (rng.random((n, 3)) - 0.5) * size
    v2 = base + (rng.random((n, 3)) - 0.5) * size
    return v0.astype(np.float32), v1.astype(np.float32), v2.astype(np.float32)


def random_rays(n, rng, spread=6.0):
    origin = ((rng.random((n, 3)) * 2 - 1) * spread).astype(np.float32)
    d = rng.standard_normal((n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return Rays(
        origin=jnp.asarray(origin),
        direction=jnp.asarray(d),
        max_distance=jnp.full((n,), np.inf, jnp.float32),
    )


@pytest.mark.parametrize("n_tris", [1, 2, 7, 64, 500])
def test_bvh_invariants(n_tris):
    rng = np.random.default_rng(n_tris)
    v0, v1, v2 = random_tris(n_tris, rng)
    bvh = lbvh.build(v0, v1, v2)

    assert sorted(np.asarray(bvh.leaf_tri).tolist()) == list(range(n_tris))

    bmin = np.asarray(bvh.bbox_min)
    bmax = np.asarray(bvh.bbox_max)
    left = np.asarray(bvh.left)
    right = np.asarray(bvh.right)

    # Parent AABB must contain both children.
    for i in range(bvh.n_internal):
        for c in (left[i], right[i]):
            assert (bmin[i] <= bmin[c] + 1e-6).all(), (i, c)
            assert (bmax[i] >= bmax[c] - 1e-6).all(), (i, c)

    # Every node except the root has exactly one parent.
    parent = np.asarray(bvh.parent)
    assert (parent[1:] >= 0).all() or n_tris == 1
    assert parent[0] == -1 if n_tris > 1 else parent[0] == -1

    # Leaf AABBs contain their triangles.
    n_int = bvh.n_internal
    for i in range(n_tris):
        t = int(np.asarray(bvh.leaf_tri)[i])
        tri = np.stack([v0[t], v1[t], v2[t]])
        assert (bmin[n_int + i] <= tri.min(0) + 1e-5).all()
        assert (bmax[n_int + i] >= tri.max(0) - 1e-5).all()


@pytest.mark.parametrize("n_tris,n_rays", [(1, 64), (13, 128), (300, 256)])
def test_closest_hit_matches_brute_force(n_tris, n_rays):
    rng = np.random.default_rng(42 + n_tris)
    v0, v1, v2 = random_tris(n_tris, rng)
    bvh = lbvh.build(v0, v1, v2)
    rays = random_rays(n_rays, rng)

    jv0, jv1, jv2 = map(jnp.asarray, (v0, v1, v2))
    got = jax.jit(traverse.closest_hit, static_argnums=())(bvh, jv0, jv1, jv2, rays)
    want = intersect.brute_force_closest_hit(rays, jv0, jv1, jv2)

    got_t = np.asarray(got.t)
    want_t = np.asarray(want.t)
    hit_agree = np.asarray(got.triangle >= 0) == np.asarray(want.triangle >= 0)
    assert hit_agree.all()
    m = np.asarray(want.triangle >= 0)
    np.testing.assert_allclose(got_t[m], want_t[m], rtol=1e-4, atol=1e-5)
    # Same triangle except exact t-ties.
    tie = np.isclose(got_t, want_t, rtol=1e-4, atol=1e-5)
    assert (np.asarray(got.triangle)[m] == np.asarray(want.triangle)[m])[tie[m]].all()
    np.testing.assert_allclose(np.asarray(got.u)[m], np.asarray(want.u)[m], rtol=1e-3, atol=1e-5)


@pytest.mark.parametrize("n_tris,n_rays", [(13, 128), (300, 256)])
def test_any_hit_matches_brute_force(n_tris, n_rays):
    rng = np.random.default_rng(7 + n_tris)
    v0, v1, v2 = random_tris(n_tris, rng)
    bvh = lbvh.build(v0, v1, v2)
    rays = random_rays(n_rays, rng)
    # Finite max distance exercises the "don't overshoot the light" cap
    # (Raytracing.metal:726).
    rays = rays._replace(max_distance=jnp.full_like(rays.max_distance, 5.0))

    jv0, jv1, jv2 = map(jnp.asarray, (v0, v1, v2))
    got = np.asarray(traverse.any_hit(bvh, jv0, jv1, jv2, rays))
    want = np.asarray(intersect.brute_force_any_hit(rays, jv0, jv1, jv2))
    assert (got == want).all()


def test_any_hit_mask_disables_lanes():
    rng = np.random.default_rng(3)
    v0, v1, v2 = random_tris(20, rng)
    bvh = lbvh.build(v0, v1, v2)
    rays = random_rays(64, rng)
    jv0, jv1, jv2 = map(jnp.asarray, (v0, v1, v2))
    mask = jnp.asarray(rng.random(64) > 0.5)
    got = np.asarray(traverse.any_hit(bvh, jv0, jv1, jv2, rays, mask=mask))
    assert (~got[~np.asarray(mask)]).all()


def test_refit_tracks_moved_vertices():
    rng = np.random.default_rng(11)
    v0, v1, v2 = random_tris(100, rng)
    bvh = lbvh.build(v0, v1, v2)

    # Deform (the skinning analog) and refit with FIXED topology.
    shift = rng.standard_normal((100, 3)).astype(np.float32) * 0.5
    w0, w1, w2 = v0 + shift, v1 + shift, v2 + shift
    refitted = jax.jit(lbvh.refit)(bvh, jnp.asarray(w0), jnp.asarray(w1), jnp.asarray(w2))

    # Invariants hold post-refit.
    bmin = np.asarray(refitted.bbox_min)
    bmax = np.asarray(refitted.bbox_max)
    left = np.asarray(refitted.left)
    right = np.asarray(refitted.right)
    for i in range(refitted.n_internal):
        for c in (left[i], right[i]):
            assert (bmin[i] <= bmin[c] + 1e-6).all()
            assert (bmax[i] >= bmax[c] - 1e-6).all()

    # Traversal over the refitted tree still matches brute force.
    rays = random_rays(128, rng)
    jw = list(map(jnp.asarray, (w0, w1, w2)))
    got = traverse.closest_hit(refitted, *jw, rays)
    want = intersect.brute_force_closest_hit(rays, *jw)
    assert (np.asarray(got.triangle >= 0) == np.asarray(want.triangle >= 0)).all()
    m = np.asarray(want.triangle >= 0)
    np.testing.assert_allclose(np.asarray(got.t)[m], np.asarray(want.t)[m], rtol=1e-4, atol=1e-5)


def test_moller_trumbore_known_triangle():
    v0 = jnp.asarray([0.0, 0.0, 0.0])
    v1 = jnp.asarray([1.0, 0.0, 0.0])
    v2 = jnp.asarray([0.0, 1.0, 0.0])
    o = jnp.asarray([0.25, 0.25, 1.0])
    d = jnp.asarray([0.0, 0.0, -1.0])
    hit, t, u, v = intersect.ray_triangle(o, d, v0, v1, v2)
    assert bool(hit)
    np.testing.assert_allclose(float(t), 1.0, atol=1e-6)
    # (u, v) weight vertices 1 and 2 — Metal intersector convention.
    np.testing.assert_allclose([float(u), float(v)], [0.25, 0.25], atol=1e-6)
    # backface hit allowed (no culling): approach from -z
    hit_b, t_b, _, _ = intersect.ray_triangle(
        jnp.asarray([0.25, 0.25, -1.0]), jnp.asarray([0.0, 0.0, 1.0]), v0, v1, v2
    )
    assert bool(hit_b)
    np.testing.assert_allclose(float(t_b), 1.0, atol=1e-6)


def test_chunked_sorted_traversal_matches_flat():
    """Sorted+chunked traversal is an execution strategy, not a semantic
    change: results must match the flat path exactly."""
    from mrt_tpu.bvh import wide

    rng = np.random.default_rng(21)
    v0, v1, v2 = random_tris(400, rng)
    w = wide.build(v0, v1, v2, method="lbvh")
    rays = random_rays(256, rng)
    mask = jnp.asarray(rng.random(256) > 0.3)

    flat = wide.closest_hit(w, rays, mask=mask)
    chunked = wide.closest_hit(w, rays, mask=mask, chunks=8, sort_rays=True)
    np.testing.assert_array_equal(np.asarray(flat.triangle), np.asarray(chunked.triangle))
    np.testing.assert_allclose(np.asarray(flat.t)[np.asarray(mask)],
                               np.asarray(chunked.t)[np.asarray(mask)], rtol=1e-6)

    f_any = wide.any_hit(w, rays, mask=mask)
    c_any = wide.any_hit(w, rays, mask=mask, chunks=8, sort_rays=True)
    np.testing.assert_array_equal(np.asarray(f_any), np.asarray(c_any))


def test_primed_traversal_matches_unprimed():
    """Hit/occluder priming is a pure optimization: any mix of correct, stale,
    and absent candidate triangles must leave closest-hit results identical
    and any-hit truth identical."""
    from mrt_tpu.bvh import wide

    rng = np.random.default_rng(55)
    v0, v1, v2 = random_tris(400, rng)
    w = wide.build(v0, v1, v2, method="lbvh")
    rays = random_rays(256, rng)
    tri_rows = jnp.concatenate([jnp.asarray(v0), jnp.asarray(v1), jnp.asarray(v2)], axis=1)

    base = wide.closest_hit(w, rays, t_min=1e-4)
    # candidates: the true hit for some lanes, random tris for others, -1 rest
    true_tri = np.asarray(base.triangle)
    cand = np.where(
        rng.random(256) < 0.4, true_tri,
        np.where(rng.random(256) < 0.5, rng.integers(0, 400, 256), -1),
    ).astype(np.int32)
    primed = wide.closest_hit(
        w, rays, t_min=1e-4, prime_tri=jnp.asarray(cand), tri_rows=tri_rows,
        chunks=8, sort_rays=True,
    )
    np.testing.assert_array_equal(np.asarray(primed.triangle), true_tri)
    m = true_tri >= 0
    np.testing.assert_allclose(np.asarray(primed.t)[m], np.asarray(base.t)[m], rtol=1e-6)

    capped = rays._replace(max_distance=jnp.full_like(rays.max_distance, 5.0))
    occ_base = np.asarray(wide.any_hit(w, capped, t_min=1e-4))
    occ_primed, occ_tri = wide.any_hit(
        w, capped, t_min=1e-4, prime_tri=jnp.asarray(cand), tri_rows=tri_rows,
        return_tri=True, chunks=8, sort_rays=True,
    )
    np.testing.assert_array_equal(np.asarray(occ_primed), occ_base)
    # reported occluder must really block (whatever tri it is)
    ot = np.asarray(occ_tri)
    assert (ot[np.asarray(occ_primed)] >= 0).all()
    assert (ot[~np.asarray(occ_primed)] == -1).all()


def test_native_sah_matches_lbvh_results():
    from mrt_tpu.bvh import wide
    from mrt_tpu.utils import native

    if not native.available():
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(31)
    v0, v1, v2 = random_tris(600, rng)
    rays = random_rays(128, rng)
    a = wide.closest_hit(wide.build(v0, v1, v2, method="sah"), rays)
    b = wide.closest_hit(wide.build(v0, v1, v2, method="lbvh"), rays)
    assert (np.asarray(a.triangle >= 0) == np.asarray(b.triangle >= 0)).all()
    m = np.asarray(a.triangle >= 0)
    np.testing.assert_allclose(np.asarray(a.t)[m], np.asarray(b.t)[m], rtol=1e-5)


def test_packed_child_sort_contract():
    """_sort_children_packed must (a) return the same VALID-child set as the
    float carry-meta network, (b) order children by quantized-t-then-id
    (the packed key drops t's low 20 bits by design), and (c) report the
    same n_push counts."""
    from mrt_tpu.bvh import wide

    rng = np.random.default_rng(5)
    R, A = 257, wide.ARITY
    t = jnp.asarray(np.where(rng.random((R, A)) < 0.3, np.inf,
                             rng.uniform(0, 1e3, (R, A)).astype(np.float32)))
    # unique ids per row (duplicate ids would make the expected-order map
    # ambiguous), ~20% empty slots
    meta_np = np.stack([rng.choice(5000, A, replace=False) for _ in range(R)])
    meta_np[rng.random((R, A)) < 0.2] = -1
    meta = jnp.asarray(meta_np, jnp.int32)
    t = jnp.where(meta < 0, jnp.inf, t)

    cands, valid = wide._sort_children_packed(t, meta)
    cols_t, cols_m = wide._sort_children(t, meta)
    ref_m = np.stack([np.asarray(c) for c in cols_m], axis=1)
    ref_valid = np.isfinite(np.stack([np.asarray(c) for c in cols_t], axis=1))

    got_m, got_valid = np.asarray(cands), np.asarray(valid)
    assert (got_valid == ref_valid).all()  # same n_push everywhere
    for r in range(R):
        g = got_m[r][got_valid[r]]
        f = ref_m[r][ref_valid[r]]
        assert set(g.tolist()) == set(f.tolist())  # same child set
        # packed order: quantized t major, id minor
        tq = (np.asarray(t[r]).view(np.int32) >> 20).astype(np.int64)
        by_id = {int(m): tq[k] for k, m in enumerate(np.asarray(meta[r])) if m >= 0}
        keys = [(by_id[int(m)], int(m)) for m in g]
        assert keys == sorted(keys)


def test_stack_alloc_clamps_degenerate_bounds():
    """Stacks narrower than ARITY break _stack_push_sorted's concat width
    (while_loop carry mismatch, int32[n,1] vs int32[n,ARITY]) — degenerate
    TLAS chains (one instance, leaf-only BLAS) compute an exact bound of 1,
    so allocation must clamp to ARITY."""
    from mrt_tpu.bvh import wide

    assert wide._stack_alloc(1, 3) == wide.ARITY
    assert wide._stack_alloc(None, 0) >= wide.ARITY
    assert wide._stack_alloc(57, 3) == 57

    # a pure chain graph (TLAS root -> instance -> BLAS leaf) has exact
    # bound 1 — the case that produced width-1 stacks before the clamp
    chain = {0: [1], 1: [2], 2: []}
    assert wide.exact_stack_bound(lambda n: chain[n]) == 1


def test_sbvh_spatial_splits_match_lbvh_results():
    """SBVH (spatial reference splitting + clipped leaf bounds, PERF.md
    round 4g) must find the same hits as the LBVH twin — including on
    scene-spanning triangles, the case that actually triggers splits."""
    from mrt_tpu.bvh import wide
    from mrt_tpu.utils import native

    if not native.available():
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(32)
    v0, v1, v2 = random_tris(600, rng)
    # two huge floor tris spanning the whole cloud: guaranteed straddlers
    lo, hi = -10.0, 10.0
    fv0 = np.array([[lo, 0.0, lo], [lo, 0.0, lo]], np.float32)
    fv1 = np.array([[hi, 0.0, lo], [hi, 0.0, hi]], np.float32)
    fv2 = np.array([[hi, 0.0, hi], [lo, 0.0, hi]], np.float32)
    v0 = np.concatenate([v0, fv0])
    v1 = np.concatenate([v1, fv1])
    v2 = np.concatenate([v2, fv2])
    rays = random_rays(256, rng)
    sb = wide.build(v0, v1, v2, method="sah", spatial=True)
    assert sb.leaf_clip is not None
    # the floor tris must actually be referenced more than once each
    ids = np.asarray(sb.leaf_tri)
    assert (ids == 600).sum() + (ids == 601).sum() > 2
    a = wide.closest_hit(sb, rays)
    b = wide.closest_hit(wide.build(v0, v1, v2, method="lbvh"), rays)
    assert (np.asarray(a.triangle >= 0) == np.asarray(b.triangle >= 0)).all()
    m = np.asarray(a.triangle >= 0)
    np.testing.assert_allclose(np.asarray(a.t)[m], np.asarray(b.t)[m], rtol=1e-5)
    # occlusion agrees too
    capped = rays._replace(max_distance=jnp.full_like(rays.max_distance, 8.0))
    np.testing.assert_array_equal(
        np.asarray(wide.any_hit(sb, capped, t_min=1e-4)),
        np.asarray(wide.any_hit(wide.build(v0, v1, v2, method="lbvh"), capped,
                                t_min=1e-4)))


def test_band_partition_matches_argsort():
    """_band_partition's counting inverse must equal argsort(perm) exactly,
    and perm must equal the stable argsort of the band key (round 5,
    sort/permute band replacement)."""
    import numpy as np
    import jax.numpy as jnp
    from mrt_tpu.bvh.wide import _band_partition

    rng = np.random.default_rng(11)
    for P in (256, 2048, 65536):
        for hi in (2, 128, 256):  # degenerate few-band and full-range cases
            band = rng.integers(0, hi, P).astype(np.int32)
            perm, inv = _band_partition(jnp.asarray(band), n_bands=256)
            perm, inv = np.asarray(perm), np.asarray(inv)
            ref = np.argsort(band, kind="stable")
            assert np.array_equal(perm, ref)
            assert np.array_equal(inv, np.argsort(ref))
