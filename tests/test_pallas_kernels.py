import jax
import jax.numpy as jnp
import numpy as np

from multi_orb_slam_tpu.ops import orb, pallas_kernels as pk


class TestFastScoreKernel:
    def test_matches_jnp_interior(self):
        rng = np.random.RandomState(0)
        img = jnp.asarray(rng.uniform(0, 255, (120, 160)).astype(np.float32))
        ref = np.asarray(jax.jit(orb.fast_score)(img))
        got = np.asarray(pk.fast_score_pallas(img, interpret=True))
        # the roll-based jnp version wraps at edges; compare the interior
        np.testing.assert_allclose(got[8:-8, 8:-8], ref[8:-8, 8:-8], atol=1e-5)


class TestWindowMatchKernel:
    def test_matches_reference_semantics(self):
        rng = np.random.RandomState(1)
        L, F = 300, 256
        q_uv = jnp.asarray(rng.uniform(0, 300, (L, 2)).astype(np.float32))
        q_rad = jnp.asarray(rng.uniform(5, 30, L).astype(np.float32))
        q_lmin = jnp.asarray(rng.randint(0, 3, L).astype(np.int32))
        q_lmax = q_lmin + 2
        q_ur = jnp.asarray(np.where(rng.rand(L) < 0.5,
                                    rng.uniform(0, 300, L), -1e9).astype(np.float32))
        q_desc = jnp.asarray(
            rng.randint(0, 2**32, (L, 8), dtype=np.uint64).astype(np.uint32))
        f_xy = jnp.asarray(rng.uniform(0, 300, (F, 2)).astype(np.float32))
        f_ur = jnp.asarray(np.where(rng.rand(F) < 0.7,
                                    rng.uniform(0, 300, F), -1).astype(np.float32))
        f_level = jnp.asarray(rng.randint(0, 8, F).astype(np.int32))
        f_mask = jnp.asarray(rng.rand(F) < 0.9)
        f_desc = jnp.asarray(
            rng.randint(0, 2**32, (F, 8), dtype=np.uint64).astype(np.uint32))
        args = (q_uv, q_rad, q_lmin, q_lmax, q_ur, q_desc,
                f_xy, f_ur, f_level, f_mask, f_desc)
        bi_r, bd_r, b2_r, b2i_r = pk.window_match_reference(*args)
        bi_p, bd_p, b2_p, b2i_p = pk.window_match_pallas(*args, interpret=True)
        # distances must agree exactly; indices may differ only among ties
        np.testing.assert_array_equal(np.asarray(bd_r), np.asarray(bd_p))
        np.testing.assert_array_equal(np.asarray(b2_r), np.asarray(b2_p))
        # where a unique best exists, indices agree
        d_ref = np.asarray(bd_r)
        uniq = d_ref < np.asarray(b2_r)
        np.testing.assert_array_equal(
            np.asarray(bi_r)[uniq], np.asarray(bi_p)[uniq])


def test_point_sums_pallas_parity():
    """One-hot MXU point-block accumulation == masked gather (interpret)."""
    import numpy as np
    import jax.numpy as jnp
    from multi_orb_slam_tpu.ops import pallas_kernels as pk

    rng = np.random.RandomState(3)
    LC, F, P, D = 4, 128, 700, 30   # P not a multiple of the tile width
    inv = np.full((LC, P), -1, np.int32)
    for r in range(LC):
        sel = rng.choice(P, F, replace=False)
        inv[r, sel] = np.arange(F)
    V = rng.randn(LC, F, D).astype(np.float32)
    s, g = pk.point_sums_pallas(jnp.asarray(V), jnp.asarray(inv), True)
    gref = np.zeros((LC, P, D), np.float32)
    for r in range(LC):
        ok = inv[r] >= 0
        gref[r, ok] = V[r, inv[r, ok]]
    np.testing.assert_allclose(np.asarray(g), gref, atol=1e-6)
    np.testing.assert_allclose(np.asarray(s), gref.sum(0), atol=1e-5)
