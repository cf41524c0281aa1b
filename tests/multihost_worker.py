"""Worker process for the multi-host DCN smoke test (launched by
test_multihost.py): initializes jax.distributed over localhost, runs the
real data-parallel train step on a multi-process global mesh, prints the
losses.

Usage: python multihost_worker.py <process_id> <num_processes> <port> [ndev]

``ndev`` (default 1) = virtual CPU devices PER PROCESS, so 2x2 exercises a
mesh whose "dp" axis spans both intra-process devices and the DCN process
boundary — the realistic multi-host topology (VERDICT r3 #7).
"""

import sys

import numpy as np

import jax

pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
ndev = int(sys.argv[4]) if len(sys.argv) > 4 else 1

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")
jax.config.update("jax_num_cpu_devices", ndev)

from pamnet_tpu.parallel import initialize_distributed  # noqa: E402

initialize_distributed(
    coordinator_address=f"localhost:{port}", num_processes=nproc, process_id=pid
)

import jax.numpy as jnp  # noqa: E402, F401
from jax.experimental import multihost_utils  # noqa: E402
from jax.sharding import PartitionSpec as P  # noqa: E402

from multihost_common import make_batches, CFG, PADS  # noqa: E402, F401
from pamnet_tpu.models import init_pamnet  # noqa: E402
from pamnet_tpu.train.loop import (  # noqa: E402
    init_train_state, make_dp_train_step, make_mesh, make_optimizer,
)

total = nproc * ndev
assert jax.device_count() == total, (jax.device_count(), total)
assert jax.local_device_count() == ndev

mesh = make_mesh(total)
batches = make_batches(total)  # identical on every process (seeded)
# This process's shard of the global batch axis: its ndev local microbatches.
local = jax.tree.map(
    lambda *xs: np.stack([np.asarray(x) for x in xs]),
    *batches[pid * ndev:(pid + 1) * ndev],
)
global_batch = multihost_utils.host_local_array_to_global_array(
    local, mesh, P("dp")
)

params = init_pamnet(jax.random.PRNGKey(0), CFG)
optimizer = make_optimizer(1e-3)
state = init_train_state(params, optimizer)
step = make_dp_train_step(CFG, optimizer, "l1", mesh)

losses = []
for _ in range(2):
    state, loss = step(state, global_batch)
    local_loss = multihost_utils.global_array_to_host_local_array(loss, mesh, P())
    losses.append(float(np.asarray(local_loss)))
print(f"LOSSES {pid} {losses[0]:.8f} {losses[1]:.8f}", flush=True)

# Cross-shard rotation across the process boundary: the --shard_rotate
# collective (train/loop.py DeviceDataTrainer._rotate) is a jitted
# jnp.roll with pinned out_shardings over the dp mesh — here rolled by one
# process's worth of rows, so every microbatch this process now holds
# CAME FROM the other process over gloo.  Verify content exactly against
# the host-side expectation.
from jax.sharding import NamedSharding  # noqa: E402

shard = NamedSharding(mesh, P("dp"))
roll = jax.jit(
    lambda t: jax.tree.map(lambda x: jnp.roll(x, ndev, axis=0), t),
    out_shardings=shard,
)
rolled_local = multihost_utils.global_array_to_host_local_array(
    roll(global_batch), mesh, P("dp")
)
expected_src = [(pid * ndev + k - ndev) % total for k in range(ndev)]
for k, src in enumerate(expected_src):
    got = jax.tree.map(lambda x: np.asarray(x[k]), rolled_local)
    want = batches[src]
    for g, w in zip(jax.tree.leaves(got), jax.tree.leaves(want), strict=True):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))
print(f"ROTATE {pid} OK", flush=True)
