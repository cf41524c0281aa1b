"""Batch loader: per-molecule structure cache + padded batch assembly with a
background prefetch thread.

The TPU-native replacement for PyG's ``DataLoader`` collation: graph
structure is built once per molecule (host numpy / C++), batches are
assembled by index offsetting, padded to a fixed-size bucket, and prefetched
so host collation overlaps device compute.
"""

from __future__ import annotations

import queue
import threading

import numpy as np

from pamnet_tpu.data.batch import (
    GraphBatch,
    PadSizes,
    collate_structures,
    precompute_structure,
    structure_counts,
    structure_group_maxima,
)


class GraphLoader:
    """Iterates padded ``GraphBatch``es over a molecule list.

    Args:
      mols: list of molecule dicts (see ``precompute_structure``).
      dataset_kind: "qm9" | "pdbbind" | "rna".
      pads: fixed bucket; if None, computed from the dataset's worst-case
        batch so every batch compiles to a single shape.
      strict_pads: with explicit ``pads``, raise instead of silently widening
        when this split exceeds them.  Multi-process DP callers MUST use this
        (or pre-compute global worst-case pads): per-process widening would
        diverge batch shapes across shards and break shard_map collectives.
      drop_last: drop the trailing partial batch (training) or pad it (eval).
      ladder_pads: pad each batch to a geometric bucket of ITS OWN counts
        (capped at the worst-case pads) instead of one fixed worst-case
        bucket.  Partial/tail batches then run in proportionally smaller
        compiled shapes — e.g. the 5-graph tail of the 21-structure RNA
        scoring set stops paying 16-graph triplet-gather cost.  Costs one
        XLA compile per distinct bucket (O(log sizes) by construction);
        intended for inference.  ``"exact"`` pads each batch to its own
        counts rounded to ``align`` only (no geometric growth): the
        tightest shapes, one compile per DISTINCT batch shape — right for
        a fixed scoring set iterated many times (the geometric ladder
        overshoots counts ~20% on average), wrong for serve-style open
        request streams (unbounded compile count — serve_rna.py keeps the
        geometric buckets).  Keep False for shard_map DP (uniform shapes
        across shards) and scan-block training (uniform shapes along the
        scan axis).
      plan_pads: FREEZE the batch composition at construction and pin the
        pads to the maxima over the planned batches, instead of the
        adversarial "sum of the batch_size largest molecules" bound that
        must cover every possible shuffle.  Real batch sums concentrate
        (32 random molecules ≈ batch_size * mean), so the worst-case bound
        wastes 1.4-1.8x in padded rows at the QM9 recipe — rows the
        HBM-bound edge gathers pay for.  With ``shuffle=True`` the frozen
        plan is one seeded permutation; epochs reshuffle the batch ORDER
        only (the same documented composition-vs-reference divergence as
        ``DeviceDataTrainer``, train/loop.py).  Shapes stay uniform across
        batches, so scan blocks and shard_map DP remain valid.  With
        ``drop_last`` the dropped remainder (``len(mols) % batch_size``
        molecules) is also FROZEN — excluded from every epoch, not a
        rotating per-epoch remainder (a warning is emitted).
      balanced_batches: build the frozen plan by LPT greedy packing on
        mean-normalized counts (largest molecules first, each to the
        currently-lightest batch), minimizing the worst batch sums —
        tightens plan pads toward batch_size * mean.  Implies
        ``plan_pads``.  Composition is then size-driven rather than
        random; per-epoch ORDER shuffling still applies.
      cache_collate: memoize each batch's collated ``GraphBatch`` the first
        time it is built and yield the cached (bit-identical, by identity)
        arrays on every later epoch.  Valid only when the batch composition
        is frozen (``plan_pads``/``balanced_batches``, or ``shuffle=False``)
        — then the collated wire for a given batch is a pure function of
        its frozen molecule set, so epochs 2+ pay ZERO host collation on
        this host's single core (per-epoch shuffling permutes batch order
        only).  Memory: ~n_batches x wire bytes (0.16 MB/batch at the QM9
        recipe with the compact wire -> ~0.5 GB for the full 110k split);
        bound it with ``cache_collate_max_mb`` — batches beyond the budget
        keep collating per epoch (partial caching still helps).
      cache_collate_max_mb: optional cache budget in MB (None = unbounded).
    """

    def __init__(
        self,
        mols: list[dict],
        dataset_kind: str,
        cutoff_l: float,
        cutoff_g: float,
        batch_size: int,
        variant: str = "full",
        shuffle: bool = False,
        seed: int = 0,
        pads: PadSizes | None = None,
        strict_pads: bool = False,
        drop_last: bool = False,
        ladder_pads: bool = False,
        plan_pads: bool = False,
        balanced_batches: bool = False,
        align: int = 128,
        build_tables: "bool | str" = True,
        build_perms: bool | None = None,
        wire_geometry: str = "host",
        compact_wire: bool = False,
        precompute_basis: bool = True,
        num_spherical: int = 7,
        num_radial: int = 6,
        envelope_exponent: int = 5,
        cache_dir: str | None = None,
        cache_workers: int = 0,
        cache_collate: bool = False,
        cache_collate_max_mb: float | None = None,
    ):
        self.dataset_kind = dataset_kind
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.ladder_pads = ladder_pads
        self._align = align
        self.build_tables = build_tables
        # wire_geometry="derive": ship positions + integer tables only; the
        # model recomputes distances/angles/bases inside the compiled step
        # (collate_structures docstring).  Implies skipping the host basis
        # precompute — it would never reach the wire.
        if wire_geometry not in ("host", "derive"):
            raise ValueError(
                f"wire_geometry must be 'host'|'derive', got {wire_geometry!r}")
        self.wire_geometry = wire_geometry
        if wire_geometry == "derive":
            precompute_basis = False
        # compact_wire: int16 indices where bounds fit + counts instead of
        # masks/node_graph; consumers hydrate inside the compiled step
        # (collate_structures docstring).
        self.compact_wire = compact_wire
        # Gather-backward scan-routing aux arrays (collate build_perms):
        # only training steps differentiate through gathers, so default to
        # following build_tables (training loaders build both; inference/
        # eval loaders build neither).  --no_ell_tables TRAINING loaders
        # pass True explicitly: perms are tiny next to ELL tables and keep
        # the routed backwards scatter-free there.
        self.build_perms = build_tables if build_perms is None else build_perms
        self._rng = np.random.default_rng(seed)
        if not mols:
            raise ValueError("GraphLoader needs at least one molecule")
        if cache_dir is not None:
            # On-disk, content-addressed, resumable structure cache
            # (data/structcache.py) — the analog of the reference's one-time
            # process() artifact (qm9_dataset.py:170-265).
            from pamnet_tpu.data.structcache import BuildSpec, load_or_build

            self.structs = load_or_build(
                mols,
                BuildSpec(dataset_kind, cutoff_l, cutoff_g, variant,
                          precompute_basis, num_spherical, num_radial,
                          envelope_exponent),
                cache_dir, num_workers=cache_workers,
                progress=len(mols) >= 10_000,  # cold builds at scale take minutes
            )
        else:
            self.structs = [
                precompute_structure(m, dataset_kind, cutoff_l, cutoff_g, variant)
                for m in mols
            ]
            if precompute_basis:
                from pamnet_tpu.data.batch import attach_basis

                for s in self.structs:
                    attach_basis(s, cutoff_l, num_spherical, num_radial,
                                 envelope_exponent)
        self.plan_pads = plan_pads or balanced_batches
        self.balanced_batches = balanced_batches
        if cache_collate and shuffle and not self.plan_pads:
            raise ValueError(
                "cache_collate requires a frozen batch composition "
                "(plan_pads/balanced_batches, or shuffle=False): a per-epoch "
                "reshuffle changes which molecules share a batch, so cached "
                "wires would be stale"
            )
        self.cache_collate = cache_collate
        self._collate_cache: dict[tuple, object] = {}
        self._collate_cache_bytes = 0
        self._collate_cache_cap = (
            None if cache_collate_max_mb is None
            else int(cache_collate_max_mb * 1e6)
        )
        self._collate_cache_full = False
        own = self._worst_case_pads(align)
        if self.plan_pads:
            self._fixed_plan = self._build_plan()
            own = self._plan_max_pads(own, align)
        if pads is None:
            pads = own
        else:
            # Explicit pads are a MINIMUM bucket: widen any dimension this
            # split exceeds (e.g. a test molecule with a larger aggregation
            # group than every training molecule — sharing the train bucket
            # verbatim crashed mid-run on exactly that).
            import dataclasses as _dc

            merged = {
                f.name: max(getattr(pads, f.name), getattr(own, f.name))
                for f in _dc.fields(PadSizes)
            }
            widened = _dc.replace(pads, **merged)
            if widened != pads:
                if strict_pads:
                    raise ValueError(
                        f"provided pads do not cover this split's worst case "
                        f"({pads} vs required {widened}); strict_pads=True "
                        f"forbids widening (shared compiled shapes)"
                    )
                import warnings

                warnings.warn(
                    f"GraphLoader: widening provided pads to cover this "
                    f"split's worst case ({pads} -> {widened}); multi-process "
                    f"callers must pre-compute global pads or use "
                    f"strict_pads=True",
                    stacklevel=2,
                )
            pads = widened
        self.pads = pads

    def _worst_case_pads(self, align: int) -> PadSizes:
        """Upper bound: sum of the batch_size largest counts per dimension,
        plus dataset-max ELL table widths.  One compiled shape for the whole
        dataset."""
        counts = np.array([structure_counts(s) for s in self.structs])
        self._counts = counts  # (M, 5): n, eg, el, t2, t1 per structure
        b = min(self.batch_size, len(self.structs))
        tops = np.sort(counts, axis=0)[-b:]  # (b, 5) largest per column
        n, eg, el, t2, t1 = tops.sum(axis=0)
        # Exact dataset-max widths (NOT rounded up): ELL aggregation reads
        # G*K rows, so every padded slot is a wasted 128-lane row read;
        # exact-K measured +1.7% at the QM9 recipe over round-to-8 widths
        # with identical losses (DEVNOTES round-3).  K is a middle dim of
        # the (G, K, D) gather — no layout alignment needed.
        ks = np.array([structure_group_maxima(s) for s in self.structs]).max(0)
        ks = np.maximum(ks.astype(int), 1)
        base = PadSizes.for_counts(
            n, max(eg, 1), max(el, 1), max(t2, 1), max(t1, 1),
            self.batch_size, align=align,
        )
        import dataclasses

        return dataclasses.replace(
            base,
            kg_dst=int(ks[0]), kg_src=int(ks[1]),
            kl_dst=int(ks[2]), kl_src=int(ks[3]),
            k2_ji=int(ks[4]), k2_kj=int(ks[5]),
            k1_ji=int(ks[6]), k1_jj=int(ks[7]),
        )

    def _build_plan(self) -> "list[list[int]]":
        """Frozen batch composition for ``plan_pads``: a seeded shuffle (or
        identity) chunked into batches, or LPT greedy packing when
        ``balanced_batches`` — sort molecules by mean-normalized total count
        descending, place each into the least-loaded non-full batch."""
        m = len(self.structs)
        nb = m // self.batch_size if self.drop_last else -(-m // self.batch_size)
        if nb == 0:  # drop_last with fewer molecules than one batch
            return []
        if self.drop_last and m % self.batch_size:
            import warnings

            # Streaming (non-plan) loaders drop a DIFFERENT remainder every
            # epoch; a frozen plan drops the same molecules for the whole
            # run.  Surface it so "every molecule trains" assumptions don't
            # silently break on non-divisible splits.
            warnings.warn(
                f"GraphLoader(plan_pads/balanced_batches, drop_last=True): "
                f"{m % self.batch_size} of {m} molecules are excluded from "
                f"EVERY epoch (frozen batch composition)",
                stacklevel=3,
            )
        if not self.balanced_batches:
            order = (
                self._rng.permutation(m) if self.shuffle else np.arange(m)
            )
            plan = [
                order[i : i + self.batch_size].tolist()
                for i in range(0, len(order), self.batch_size)
            ]
            if self.drop_last and len(plan[-1]) < self.batch_size:
                plan.pop()
            return plan
        import heapq

        c = self._counts.astype(np.float64)
        cost = (c / np.maximum(c.mean(axis=0), 1e-9)).sum(axis=1)
        plan = [[] for _ in range(nb)]
        cap = self.batch_size
        if self.drop_last and nb * cap < m:
            # Drop a RANDOM remainder (dropping the cheapest molecules
            # would bias the kept set toward large ones).
            keep = self._rng.choice(m, nb * cap, replace=False)
            mask = np.zeros(m, dtype=bool)
            mask[keep] = True
            cost = np.where(mask, cost, -np.inf)
            kept = np.argsort(-cost)[: nb * cap]
        else:
            kept = np.argsort(-cost)
        # LPT via a heap of (load, batch): pop the lightest batch, place the
        # next-largest molecule, push back unless full — O(M log nb), which
        # matters at the 110k+ scale (the naive argmin-per-molecule scan is
        # O(M * nb)).
        heap = [(0.0, b) for b in range(nb)]
        for i in kept:
            load, b = heapq.heappop(heap)
            plan[b].append(int(i))
            if len(plan[b]) < cap:
                heapq.heappush(heap, (load + float(cost[i]), b))
        return plan

    def _plan_max_pads(self, worst: PadSizes, align: int) -> PadSizes:
        """Pads pinned to the frozen plan's actual per-batch maxima (ELL
        widths stay the dataset-wide maxima from ``worst``)."""
        import dataclasses as _dc

        if not self._fixed_plan:  # drop_last left zero batches
            return worst
        sums = np.stack(
            [self._counts[idxs].sum(axis=0) for idxs in self._fixed_plan]
        )
        n, eg, el, t2, t1 = sums.max(axis=0)
        base = PadSizes.for_counts(
            int(n), max(int(eg), 1), max(int(el), 1), max(int(t2), 1),
            max(int(t1), 1), self.batch_size, align=align,
        )
        return _dc.replace(
            worst,
            n=min(base.n, worst.n), eg=min(base.eg, worst.eg),
            el=min(base.el, worst.el), t2=min(base.t2, worst.t2),
            t1=min(base.t1, worst.t1), g=min(base.g, worst.g),
        )

    def __len__(self) -> int:
        n = len(self.structs)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def num_molecules(self) -> int:
        return len(self.structs)

    def batches(self) -> "list[list[int]]":
        if self.plan_pads:
            # Frozen composition (the pads are pinned to it); per-epoch
            # shuffling permutes batch ORDER only, like DeviceDataTrainer.
            plan = self._fixed_plan
            if self.shuffle:
                plan = [plan[i] for i in self._rng.permutation(len(plan))]
            return [list(b) for b in plan]
        order = np.arange(len(self.structs))
        if self.shuffle:
            order = self._rng.permutation(order)
        out = []
        for i in range(0, len(order), self.batch_size):
            chunk = order[i : i + self.batch_size]
            if self.drop_last and len(chunk) < self.batch_size:
                break
            out.append(chunk.tolist())
        return out

    def _batch_pads(self, idxs: list[int]) -> PadSizes:
        """Geometric bucket (or, with ``ladder_pads="exact"``, the
        align-rounded exact counts) for ONE batch's summed counts, capped
        at the fixed worst-case pads (which always cover the counts, so
        the cap is safe); ELL widths stay the dataset-wide maxima so table
        shapes only vary with the bucketed group dims."""
        import dataclasses as _dc

        n, eg, el, t2, t1 = self._counts[idxs].sum(axis=0)
        mk = (PadSizes.for_counts if self.ladder_pads == "exact"
              else PadSizes.bucketed)
        b = mk(int(n), max(int(eg), 1), max(int(el), 1),
               max(int(t2), 1), max(int(t1), 1), len(idxs),
               align=self._align)
        w = self.pads
        return _dc.replace(
            w,
            n=min(b.n, w.n), eg=min(b.eg, w.eg), el=min(b.el, w.el),
            t2=min(b.t2, w.t2), t1=min(b.t1, w.t1), g=min(b.g, w.g),
        )

    def _plan(self):
        """Native collate plan (built lazily, once): per-field address/length
        tables so each batch field is a single C concat-offset-pad pass."""
        if not hasattr(self, "_plan_cache"):
            from pamnet_tpu.data import native
            from pamnet_tpu.data.batch import CollatePlan

            self._plan_cache = (
                CollatePlan(self.structs) if native.has_collate() else None
            )
        return self._plan_cache

    @staticmethod
    def _batch_nbytes(gb: GraphBatch) -> int:
        total = 0
        for f in gb:
            if isinstance(f, np.ndarray):
                total += f.nbytes
            elif isinstance(f, dict):
                total += sum(
                    v.nbytes for v in f.values() if isinstance(v, np.ndarray)
                )
        return total

    def _cache_put(self, key: tuple, gb: GraphBatch) -> None:
        nb = self._batch_nbytes(gb)
        cap = self._collate_cache_cap
        if cap is not None and self._collate_cache_bytes + nb > cap:
            if not self._collate_cache_full:
                self._collate_cache_full = True
                import warnings

                warnings.warn(
                    f"GraphLoader(cache_collate): budget reached at "
                    f"{len(self._collate_cache)} batches "
                    f"({self._collate_cache_bytes / 1e6:.0f} MB); remaining "
                    f"batches keep collating per epoch",
                    stacklevel=2,
                )
            return
        self._collate_cache[key] = gb
        self._collate_cache_bytes += nb

    def __iter__(self):
        plan = self._plan()
        cache = self._collate_cache if self.cache_collate else None
        for idxs in self.batches():
            if cache is not None:
                key = tuple(idxs)
                hit = cache.get(key)
                if hit is not None:
                    # Consumers treat batches as immutable pytrees (staging
                    # stacks into fresh arrays), so yielding the same object
                    # across epochs is safe and collation-free.
                    yield hit
                    continue
            pads = self._batch_pads(idxs) if self.ladder_pads else self.pads
            if plan is not None:
                gb = collate_structures(
                    None, pads, build_tables=self.build_tables,
                    build_perms=self.build_perms, plan=plan, idxs=idxs,
                    wire_geometry=self.wire_geometry,
                    compact_wire=self.compact_wire,
                )
            else:
                gb = collate_structures(
                    [self.structs[i] for i in idxs], pads,
                    build_tables=self.build_tables,
                    build_perms=self.build_perms,
                    wire_geometry=self.wire_geometry,
                    compact_wire=self.compact_wire,
                )
            if cache is not None:
                self._cache_put(key, gb)
            yield gb

    def prefetch(self, depth: int = 2):
        """Iterate with a background collation thread (overlaps host batch
        assembly with device compute).  Worker exceptions re-raise in the
        consumer — a silently truncated epoch would corrupt training.
        (Host->device staging overlap is layered on top by the trainers:
        ``train/loop.py::_staged`` stacks/transfers in its own thread.)"""
        q: queue.Queue = queue.Queue(maxsize=depth)
        stop = object()

        def worker():
            try:
                for gb in self:
                    q.put(gb)
                q.put(stop)
            except BaseException as e:  # noqa: BLE001 - relayed to consumer
                q.put(e)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is stop:
                break
            if isinstance(item, BaseException):
                raise item
            yield item
