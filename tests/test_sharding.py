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

    @pytest.mark.parametrize("h_img,nty", [(45, 8), (28, 8), (34, 8), (35, 8), (20, 6)])
    def test_ragged_height_ghost_rows(self, h_img, nty):
        # H=45/nty=8 -> h=6, 3 ghost rows in the last shard (partial ghost).
        # H in {28,34,35}/nty=8 and H=20/nty=6 create FULLY-ghost shards
        # ((nty-1)*h >= H) with h >= 4 — the regime where the r4 halo fast
        # path went stale (ADVICE r4 high): these must route through the
        # gather construction and still match single-chip to 1e-10.
        im1, im2 = make_pair(h_img, 32)
        u0, v0, _ = coarse2fine_flow_chw(im1, im2, 2, PARAMS)
        mesh = jax.sharding.Mesh(np.array(jax.devices()[:nty]).reshape(nty), ("ty",))
        u1, v1, _ = tiled_coarse2fine_flow(im1, im2, 2, PARAMS, mesh)
        np.testing.assert_allclose(np.asarray(u0), np.asarray(u1), atol=1e-10)
        np.testing.assert_allclose(np.asarray(v0), np.asarray(v1), atol=1e-10)


def _collect_ppermute_depths(jaxpr, depth=0, out=None):
    """Loop-nesting depth (while/scan) of every ppermute eqn in a jaxpr."""
    out = [] if out is None else out
    for eqn in jaxpr.eqns:
        is_loop = eqn.primitive.name in ("while", "scan")
        if eqn.primitive.name == "ppermute":
            out.append(depth)
        for v in eqn.params.values():
            vs = v if isinstance(v, (tuple, list)) else (v,)
            for sub in vs:
                if hasattr(sub, "jaxpr"):  # ClosedJaxpr
                    sub = sub.jaxpr
                if hasattr(sub, "eqns"):
                    _collect_ppermute_depths(sub, depth + is_loop, out)
    return out


class TestTiledPallasBand:
    def test_band_kernel_inside_shard_map_matches(self, monkeypatch):
        """The sharded ghost-zone solver's Pallas band path (interpret
        mode) must match the XLA band path bit-for-float: same arithmetic,
        different executor (VERDICT r1 missing item 2)."""
        import papteam_opticalflow_tpu.models.sor_dispatch as dispatch
        import papteam_opticalflow_tpu.ops.pallas.sor as psor

        im1, im2 = make_pair(40, 48)
        u0, v0, w0 = tiled_coarse2fine_flow(
            im1, im2, 2, PARAMS,
            jax.sharding.Mesh(np.array(jax.devices()[:2]).reshape(2), ("ty",)),
        )
        monkeypatch.setattr(psor, "_INTERPRET", True)
        monkeypatch.setattr(dispatch, "_pallas_available", lambda: True)
        params = FlowParams()  # use_pallas_sor defaults True
        u1, v1, w1 = tiled_coarse2fine_flow(
            im1, im2, 2, params,
            jax.sharding.Mesh(np.array(jax.devices()[:2]).reshape(2), ("ty",)),
        )
        np.testing.assert_allclose(np.asarray(u0), np.asarray(u1), atol=1e-12)
        np.testing.assert_allclose(np.asarray(v0), np.asarray(v1), atol=1e-12)


class TestGhostZoneCollectives:
    """The sharded SOR must NOT exchange halos inside the sweep loop
    (VERDICT r1 #1): system planes are exchanged once per inner iteration
    and du/dv once per ghost-zone chunk, so executed ppermutes per inner
    iteration are 2 + 2*ceil(n_sor/S) instead of 8*n_sor."""

    def test_no_ppermute_inside_sweep_loop(self):
        from jax import shard_map
        from jax.sharding import Mesh, PartitionSpec as P
        from papteam_opticalflow_tpu.parallel.tiled import pair_flow_tiled

        mesh = Mesh(np.array(jax.devices()[:2]).reshape(2), ("ty",))
        im1, im2 = make_pair(48, 64)

        def f(a, b):
            return pair_flow_tiled(a, b, 2, PARAMS, "ty")

        traced = jax.make_jaxpr(
            lambda a, b: shard_map(
                f, mesh=mesh, in_specs=(P(), P()), out_specs=(P(), P(), P()),
                check_vma=False,
            )(a, b)
        )(im1, im2)
        depths = _collect_ppermute_depths(traced.jaxpr)
        assert depths, "expected halo exchanges in the tiled solver"
        # Nesting: outer fixed-point fori = depth 1, chunk fori = depth 2,
        # sweep fori = depth 3.  Any ppermute at depth >= 3 would run every
        # sweep — the latency-bound pattern this design removes.
        assert max(depths) <= 2, (
            f"ppermute inside the SOR sweep loop (depths={depths})"
        )

    def test_chunk_trace_count(self):
        """Standalone _ghost_zone_sor: 2 stacked exchanges traced for the
        system planes + full-chunk body (+2 for a remainder chunk)."""
        from jax import shard_map
        from jax.sharding import Mesh, PartitionSpec as P
        from papteam_opticalflow_tpu.parallel.tiled import _ghost_zone_sor

        mesh = Mesh(np.array(jax.devices()[:2]).reshape(2), ("ty",))
        h, w = 64, 32

        def run(n_sor):
            def f(*planes):
                du = jnp.zeros((h // 2, w), jnp.float64)
                idx = jax.lax.axis_index("ty")
                return _ghost_zone_sor(
                    du, du, *planes,
                    r0=idx * (h // 2), real_h=h, n_sor=n_sor,
                    alpha=0.012, omega=1.8, sweeps_per_exchange=8,
                    axis_name="ty",
                )

            args = [jnp.ones((h, w), jnp.float64)] * 6
            return jax.make_jaxpr(
                lambda *a: shard_map(
                    f, mesh=mesh, in_specs=(P("ty", None),) * 6,
                    out_specs=(P("ty", None),) * 2, check_vma=False,
                )(*a)
            )(*args)

        # n_sor=16 = 2 full chunks, no remainder: planes (2) + chunk (2).
        assert len(_collect_ppermute_depths(run(16).jaxpr)) == 4
        # n_sor=30 adds one remainder chunk: + 2.
        assert len(_collect_ppermute_depths(run(30).jaxpr)) == 6


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
