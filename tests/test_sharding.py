"""Multi-device tests on the virtual 8-device CPU mesh: row-tiled halo
exchange, frame batching, and mesh-shape determinism (SURVEY.md §4's
implied test plan: same result across mesh shapes)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from papteam_opticalflow_tpu.models.coarse2fine import coarse2fine_flow_chw
from papteam_opticalflow_tpu.parallel.batch import batched_coarse2fine_flow
from papteam_opticalflow_tpu.parallel.halo import with_halo_rows
from papteam_opticalflow_tpu.parallel.mesh import make_mesh
from papteam_opticalflow_tpu.parallel.tiled import tiled_coarse2fine_flow
from papteam_opticalflow_tpu.utils.params import FlowParams

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)

PARAMS = FlowParams(use_pallas_sor=False)
RNG = np.random.default_rng(11)


def make_pair(h=45, w=64):
    im1 = RNG.random((3, h, w))
    im2 = np.roll(im1, 2, axis=2) * 0.97 + 0.01
    return jnp.asarray(im1), jnp.asarray(im2)


class TestHalo:
    def test_with_halo_rows_roundtrip(self):
        from jax import shard_map
        from jax.sharding import Mesh, PartitionSpec as P

        mesh = Mesh(np.array(jax.devices()).reshape(8), ("ty",))
        x = jnp.arange(8 * 4 * 6, dtype=jnp.float64).reshape(8 * 4, 6)

        def f(xl):
            return with_halo_rows(xl, 2, "ty")

        out = shard_map(
            f, mesh=mesh, in_specs=(P("ty", None),), out_specs=P("ty", None),
            check_vma=False,
        )(x)
        out = np.asarray(out).reshape(8, 8, 6)
        xs = np.asarray(x).reshape(8, 4, 6)
        # Interior shard: halo rows are true neighbor rows.
        np.testing.assert_array_equal(out[3][:2], xs[2][-2:])
        np.testing.assert_array_equal(out[3][-2:], xs[4][:2])
        # Boundary shards: edge replication.
        np.testing.assert_array_equal(out[0][0], xs[0][0])
        np.testing.assert_array_equal(out[7][-1], xs[7][-1])


class TestTiled:
    @pytest.mark.parametrize("nty", [2, 8])
    def test_tiled_matches_single_device(self, nty):
        im1, im2 = make_pair()
        u0, v0, w0 = coarse2fine_flow_chw(im1, im2, 3, PARAMS)
        mesh = jax.sharding.Mesh(np.array(jax.devices()[:nty]).reshape(nty), ("ty",))
        u1, v1, w1 = tiled_coarse2fine_flow(im1, im2, 3, PARAMS, mesh)
        np.testing.assert_allclose(np.asarray(u0), np.asarray(u1), atol=1e-10)
        np.testing.assert_allclose(np.asarray(v0), np.asarray(v1), atol=1e-10)
        np.testing.assert_allclose(np.asarray(w0), np.asarray(w1), atol=1e-10)

    def test_ragged_height_ghost_rows(self):
        # H=45 over 8 shards -> h=6, 3 ghost rows in the last shard.
        im1, im2 = make_pair(45, 32)
        u0, v0, _ = coarse2fine_flow_chw(im1, im2, 2, PARAMS)
        mesh = jax.sharding.Mesh(np.array(jax.devices()).reshape(8), ("ty",))
        u1, v1, _ = tiled_coarse2fine_flow(im1, im2, 2, PARAMS, mesh)
        np.testing.assert_allclose(np.asarray(u0), np.asarray(u1), atol=1e-10)


class TestBatched:
    def test_dp_and_mixed_meshes_agree(self):
        b = 8
        im1s = jnp.asarray(RNG.random((b, 3, 33, 48)))
        im2s = jnp.asarray(np.roll(np.asarray(im1s), 1, axis=3))
        u_ref = jnp.stack(
            [coarse2fine_flow_chw(im1s[i], im2s[i], 2, PARAMS)[0] for i in range(b)]
        )
        for nf, nt, nx in [(8, 1, 1), (4, 2, 1), (2, 4, 1), (1, 8, 1),
                           (2, 2, 2), (1, 2, 4)]:
            mesh = make_mesh(nf, nt, n_tx=nx)
            u, v, w = batched_coarse2fine_flow(im1s, im2s, 2, PARAMS, mesh)
            np.testing.assert_allclose(
                np.asarray(u), np.asarray(u_ref), atol=1e-10,
                err_msg=f"mesh ({nf},{nt},{nx})",
            )

    def test_vmapped_single_chip_matches_unbatched(self):
        from papteam_opticalflow_tpu.parallel.batch import vmapped_coarse2fine_flow

        b = 3
        im1s = jnp.asarray(RNG.random((b, 3, 33, 48)))
        im2s = jnp.asarray(np.roll(np.asarray(im1s), 1, axis=3))
        u, v, w = vmapped_coarse2fine_flow(im1s, im2s, 2, PARAMS)
        for i in range(b):
            u0, v0, w0 = coarse2fine_flow_chw(im1s[i], im2s[i], 2, PARAMS)
            np.testing.assert_allclose(np.asarray(u[i]), np.asarray(u0), atol=1e-10)
            np.testing.assert_allclose(np.asarray(w[i]), np.asarray(w0), atol=1e-10)

    def test_batch_not_divisible_raises(self):
        im1s = jnp.asarray(RNG.random((3, 3, 16, 16)))
        with pytest.raises(AssertionError):
            batched_coarse2fine_flow(im1s, im1s, 2, PARAMS, make_mesh(8, 1))


class TestGraftEntry:
    def test_entry_compiles(self):
        import sys
        sys.path.insert(0, "/root/repo")
        import __graft_entry__ as ge

        fn, args = ge.entry()
        out = jax.jit(fn)(*args)
        assert all(bool(jnp.isfinite(o).all()) for o in out)

    def test_dryrun_multichip(self):
        import __graft_entry__ as ge

        ge.dryrun_multichip(8)
