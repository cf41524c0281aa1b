"""Host->device staging that packs a pytree into one wire buffer per dtype.

Transferring a ``GraphBatch`` (or a stacked group of them) leaf-by-leaf
pays one host->device round trip per leaf — ~35 leaves x ~90 ms RTT on
this pool's tunneled TPU (DEVNOTES.md), which dominated epoch time at the
110k-molecule scale.  On local hardware the same pattern costs one DMA
descriptor per leaf; batching is still strictly better.

``pack``: concatenate all leaves of each dtype into a single flat host
buffer (one memcpy per leaf) + a static meta record.
``unpack``: a jitted device-side slice+reshape per leaf (no wire traffic,
fuses into one cheap program compiled once per batch signature).
``make_stager``: returns a drop-in ``to_device`` replacement.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp


def _meta_of(treedef, leaves):
    dtypes = sorted({np.dtype(l.dtype).str for l in leaves})
    order: list[tuple[int, int, int, tuple]] = []  # (dtype_i, offset, size, shape)
    offsets = {d: 0 for d in dtypes}
    for leaf in leaves:
        d = np.dtype(leaf.dtype).str
        di = dtypes.index(d)
        order.append((di, offsets[d], int(leaf.size), tuple(leaf.shape)))
        offsets[d] += int(leaf.size)
    totals = tuple(offsets[d] for d in dtypes)
    return (treedef, tuple(dtypes), tuple(order), totals)


def pack(tree):
    """-> (bufs: tuple of 1-D host arrays, one per dtype; meta: hashable)."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    leaves = [np.asarray(l) for l in leaves]
    meta = _meta_of(treedef, leaves)
    _, dtypes, order, totals = meta
    bufs = [np.empty(n, np.dtype(d)) for d, n in zip(dtypes, totals)]
    for leaf, (di, off, size, _) in zip(leaves, order):
        bufs[di][off:off + size] = leaf.reshape(-1)
    return tuple(bufs), meta


@functools.lru_cache(maxsize=64)
def _unpacker(meta):
    treedef, dtypes, order, _ = meta

    @jax.jit
    def unpack(*bufs):
        leaves = [
            bufs[di][off:off + size].reshape(shape)  # static slices
            for di, off, size, shape in order
        ]
        return jax.tree_util.tree_unflatten(treedef, leaves)

    return unpack


import os as _os


def _transfer(buf: np.ndarray):
    """Transfer one host buffer, sharded across parallel threads.

    Hypothesis tested on this pool's tunnel (large transfers run slower per
    byte than ~32 MB ones): threads do NOT overlap the tunnel's chunk round
    trips — same-process A/B measured 8x32 MB across 8 threads at 140.6 s
    vs 37.7 s for one 256 MB transfer (the client serializes and the
    threading adds overhead).  Sharding is therefore DISABLED by default;
    the knobs remain for other transports: PAMNET_WIRE_SHARD_MB (0 =
    single buffer per dtype) and PAMNET_WIRE_THREADS (default 8)."""
    shard_mb = int(_os.environ.get("PAMNET_WIRE_SHARD_MB", 0))
    shard = shard_mb * (1 << 20) // max(buf.itemsize, 1)
    if shard_mb <= 0 or buf.size <= shard:
        return [jnp.asarray(buf)]
    import concurrent.futures as _cf

    pieces = [buf[i:i + shard] for i in range(0, buf.size, shard)]
    workers = min(int(_os.environ.get("PAMNET_WIRE_THREADS", 8)), len(pieces))
    with _cf.ThreadPoolExecutor(max_workers=workers) as ex:
        return list(ex.map(jnp.asarray, pieces))


@functools.lru_cache(maxsize=64)
def _concatenator(n_parts_per_buf: tuple):
    @jax.jit
    def cat(*parts):
        out, k = [], 0
        for n in n_parts_per_buf:
            chunk = parts[k:k + n]
            out.append(chunk[0] if n == 1 else jnp.concatenate(chunk))
            k += n
        return tuple(out)

    return cat


def stage(tree):
    """Pack on host, transfer one (sharded) buffer per dtype, unpack on
    device."""
    bufs, meta = pack(tree)
    shards = [_transfer(b) for b in bufs]
    if all(len(s) == 1 for s in shards):  # default path: no extra dispatch
        dev = [s[0] for s in shards]
    else:
        dev = _concatenator(tuple(len(s) for s in shards))(
            *[p for s in shards for p in s]
        )
    return _unpacker(meta)(*dev)


def make_stager():
    """A ``to_device`` drop-in: tree -> device tree via packed transfer."""
    return stage
