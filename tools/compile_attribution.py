"""Attribute bench 'compile+first block': trace/lower vs compile vs first exec."""
import time, os, sys
import numpy as np
sys.path.insert(0, "/root/repo")
from pamnet_tpu.utils.runtime import enable_compilation_cache
enable_compilation_cache()
import jax, jax.numpy as jnp
from pamnet_tpu.config import PAMNetConfig
from pamnet_tpu.data.loader import GraphLoader
from pamnet_tpu.data.synthetic import synthetic_qm9_dataset
from pamnet_tpu.models import init_pamnet
from pamnet_tpu.train.loop import (init_train_state, make_optimizer,
    make_multistep_train_step, stack_microbatches)
from pamnet_tpu.train.schedules import warmup_exponential

cfg = PAMNetConfig(dataset="QM9", dim=128, n_layer=6, cutoff_l=5.0,
                   cutoff_g=5.0, compute_dtype="bfloat16")
mols = synthetic_qm9_dataset(512, seed=480)
loader = GraphLoader(mols, "qm9", 5.0, 5.0, batch_size=32, shuffle=False, drop_last=True)
batches = []
for i, gb in enumerate(loader):
    batches.append(jax.tree.map(lambda x: jax.device_put(jnp.asarray(x)), gb))
    if i >= 7: break
params = init_pamnet(jax.random.PRNGKey(480), cfg)
opt = make_optimizer(warmup_exponential(1e-4, steps_per_epoch=16), clip_norm=1000.0)
state = init_train_state(params, opt, use_ema=True)
S = len(batches); reps = 512 // S
stacked = stack_microbatches(batches)
t0=time.time()
tiled = jax.tree.map(lambda x: jnp.concatenate([x]*reps), stacked)
jax.block_until_ready(tiled); t1=time.time()
print(f"tile+stage (block_until_ready, lies): {t1-t0:.1f}s")
run = make_multistep_train_step(cfg, opt, "l1", ema_decay=0.999)
lowered = run.lower(state, tiled); t2=time.time()
print(f"trace+lower: {t2-t1:.1f}s")
compiled = lowered.compile(); t3=time.time()
print(f"compile(): {t3-t2:.1f}s")
st, losses = compiled(state, tiled)
_ = float(losses[-1]); t4=time.time()
print(f"first exec (512 steps, forced): {t4-t3:.1f}s")
st, losses = compiled(st, tiled)
_ = float(losses[-1]); t5=time.time()
print(f"second exec: {t5-t4:.1f}s")
