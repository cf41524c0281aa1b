"""Observability utilities."""

import numpy as np

from pamnet_tpu.utils.profiling import CSVLogger, StepTimer


def test_step_timer():
    import time

    t = StepTimer(warmup=1)
    for _ in range(5):
        t.tick()
        time.sleep(0.01)
    assert 0.005 < t.mean_step_seconds < 0.1
    assert t.throughput(32) > 0
    assert "ms/step" in t.summary(32)


def test_csv_logger(tmp_path):
    path = str(tmp_path / "metrics.csv")
    log = CSVLogger(path, ["epoch", "train_mae", "val_mae"])
    log.log(epoch=1, train_mae=0.5, val_mae=0.6)
    log.log(epoch=2, train_mae=0.4)
    lines = open(path).read().splitlines()
    assert lines[0] == "epoch,train_mae,val_mae"
    assert lines[1] == "1,0.5,0.6"
    assert lines[2] == "2,0.4,"


def test_trace_context(tmp_path):
    import jax
    import jax.numpy as jnp

    from pamnet_tpu.utils.profiling import trace

    with trace(str(tmp_path)):
        jnp.ones(8).sum().block_until_ready()
    import glob

    assert glob.glob(str(tmp_path / "plugins" / "profile" / "*" / "*"))
