"""Host collation micro-benchmark: time collate_structures (the per-step host
cost) with and without the native C++ fast path, at the QM9 headline recipe
(batch 32).  The target is collation < device step time (~5-6 ms/step on the
tunneled v5e; DEVNOTES.md), so prefetch fully hides it on the 1-core host.

Usage: python tools/collate_prof.py [batch_size]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from pamnet_tpu.data import native
from pamnet_tpu.data.batch import collate_structures
from pamnet_tpu.data.loader import GraphLoader
from pamnet_tpu.data.synthetic import synthetic_qm9_dataset


def main():
    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    mols = synthetic_qm9_dataset(16 * bs, seed=480)
    t0 = time.time()
    loader = GraphLoader(mols, "qm9", 5.0, 5.0, batch_size=bs, shuffle=False,
                         drop_last=True)
    print(f"structure build ({len(mols)} mols): {time.time()-t0:.2f}s")
    idx_batches = loader.batches()

    def run(tag, plan, reps=20):
        best = 1e9
        for _ in range(reps):
            t0 = time.time()
            for idxs in idx_batches:
                if plan is not None:
                    collate_structures(None, loader.pads,
                                       build_tables=loader.build_tables,
                                       build_perms=loader.build_perms,
                                       plan=plan, idxs=idxs)
                else:
                    collate_structures(
                        [loader.structs[i] for i in idxs], loader.pads,
                        build_tables=loader.build_tables,
                        build_perms=loader.build_perms,
                    )
            best = min(best, (time.time() - t0) / len(idx_batches))
        print(f"{tag}: {best*1e3:.3f} ms/batch (batch={bs})")
        return best

    assert native.has_collate(), "build csrc first (make -C csrc)"
    from pamnet_tpu.data.batch import CollatePlan

    t0 = time.time()
    plan = CollatePlan(loader.structs)
    print(f"plan build: {(time.time()-t0)*1e3:.1f} ms for {len(mols)} structs")
    run("native plan collate", plan)
    run("numpy  list collate", None)


if __name__ == "__main__":
    main()
