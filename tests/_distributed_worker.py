"""Worker process for the two-process jax.distributed test.

Launched by ``tests/test_distributed.py`` as::

    python _distributed_worker.py <coordinator_port> <num_processes> <pid>

Each process brings up 4 virtual CPU devices; the global mesh is
``('frame'=num_processes, 'ty'=4)`` so frame data-parallelism crosses the
process (DCN-analogue) boundary while each pair's solve is row-tiled over
the process-local devices — the SURVEY.md §5.8 host-orchestration story in
miniature.  The worker checks its own addressable shard of the global
result against the locally computed single-device flow and prints
``DISTRIBUTED_OK`` on success.
"""

import os
import sys

port, nprocs, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=4"
).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from papteam_opticalflow_tpu.models.coarse2fine import (  # noqa: E402
    coarse2fine_flow_chw,
)
from papteam_opticalflow_tpu.parallel.batch import (  # noqa: E402
    batched_coarse2fine_flow,
)
from papteam_opticalflow_tpu.parallel.distributed import (  # noqa: E402
    initialize,
    shard_work_items,
)
from papteam_opticalflow_tpu.parallel.mesh import make_mesh  # noqa: E402
from papteam_opticalflow_tpu.utils.params import FlowParams  # noqa: E402

initialize(
    coordinator_address=f"127.0.0.1:{port}",
    num_processes=nprocs,
    process_id=pid,
)
assert jax.process_count() == nprocs, jax.process_count()
assert len(jax.devices()) == 4 * nprocs, len(jax.devices())

# Deterministic global inputs: every process derives the same batch, then
# owns its strided slice of the work list.
B = nprocs
rng = np.random.default_rng(3)
im1s = rng.random((B, 3, 24, 32))
im2s = np.roll(im1s, 1, axis=3) * 0.97 + 0.01
my_items = shard_work_items(list(range(B)))
assert my_items == list(range(B))[pid::nprocs], my_items

mesh = make_mesh(n_frame=nprocs, n_ty=4)
params = FlowParams(use_pallas_sor=False)
sharding = NamedSharding(mesh, P("frame"))

x1 = jax.make_array_from_process_local_data(sharding, im1s[pid : pid + 1])
x2 = jax.make_array_from_process_local_data(sharding, im2s[pid : pid + 1])
assert x1.shape == (B, 3, 24, 32)

u, v, w = batched_coarse2fine_flow(x1, x2, 2, params, mesh)

# Local single-device oracle for this process's own pair.
u_ref, v_ref, w_ref = coarse2fine_flow_chw(
    jnp.asarray(im1s[pid]), jnp.asarray(im2s[pid]), 2, params
)

for shard in u.addressable_shards:
    b0 = shard.index[0].start or 0
    if b0 == pid:
        np.testing.assert_allclose(
            np.asarray(shard.data)[0], np.asarray(u_ref), atol=1e-10
        )
got_v = [np.asarray(s.data) for s in v.addressable_shards]
assert got_v, "process holds no shard of the result"

print(f"DISTRIBUTED_OK pid={pid}", flush=True)
