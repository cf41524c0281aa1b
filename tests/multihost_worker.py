"""Worker process for the multi-host DCN smoke test (launched by
test_multihost.py): initializes jax.distributed over localhost, runs the
real data-parallel train step on a 2-process global mesh, prints the losses.

Usage: python multihost_worker.py <process_id> <num_processes> <port>
"""

import sys

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")

pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])

from pamnet_tpu.parallel import initialize_distributed  # noqa: E402

initialize_distributed(
    coordinator_address=f"localhost:{port}", num_processes=nproc, process_id=pid
)

import jax.numpy as jnp  # noqa: E402
from jax.experimental import multihost_utils  # noqa: E402
from jax.sharding import PartitionSpec as P  # noqa: E402

from multihost_common import make_batches, CFG, PADS  # noqa: E402
from pamnet_tpu.models import init_pamnet  # noqa: E402
from pamnet_tpu.train.loop import (  # noqa: E402
    init_train_state, make_dp_train_step, make_mesh, make_optimizer,
)

assert jax.device_count() == nproc, (jax.device_count(), nproc)
assert jax.local_device_count() == 1

mesh = make_mesh(nproc)
batches = make_batches()  # identical on every process (seeded)
local = jax.tree.map(lambda x: np.asarray(x)[None], batches[pid])
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
