"""Multi-host data-partition loaders (VERDICT round-2 item 6): every process
computes the identical global batch permutation but materializes ONLY its own
slice (`select`), with lazy per-host caching — so no host preprocesses the
full dataset to use 1/N of it (the round-2 behavior), while the global-batch
semantics stay bit-identical to the slice-a-global-batch path. Pure numpy —
fast tier."""

import numpy as np

from minipig_gan_tpu.data.pipeline import (
    BatchLoader, CachedDataset, WrapAroundLoader,
)


class CountingPre:
    """Stand-in preprocessor that records which items it materialized."""

    def __init__(self):
        self.calls = []

    def __call__(self, pair):
        i = pair["idx"]
        self.calls.append(i)
        return {"t1w": np.full((2, 2, 2, 1), float(i), np.float32)}


def make_ds(n=8, cache_num=100, lazy=False):
    pre = CountingPre()
    pairs = [{"idx": i} for i in range(n)]
    return CachedDataset(pairs, pre, cache_num=cache_num, num_workers=2,
                         lazy=lazy), pre


def batches(loader):
    return list(loader.epoch())


def test_select_partitions_global_batch_exactly():
    """Concatenating every host's select slice reproduces the full global
    batch, batch by batch — the equivalence that makes per-host loading a
    pure partition of the round-2 global-stream slicing."""
    n, bs, n_proc = 8, 4, 2
    ds_full, _ = make_ds(n)
    full = batches(BatchLoader(ds_full, bs, shuffle=True, seed=7,
                               drop_last=True))
    per_host = []
    for p in range(n_proc):
        ds_p, _ = make_ds(n)
        lo = p * (bs // n_proc)
        per_host.append(batches(BatchLoader(
            ds_p, bs, shuffle=True, seed=7, drop_last=True,
            select=(lo, lo + bs // n_proc))))
    assert len(full) == len(per_host[0]) == len(per_host[1]) == 2
    for b, (h0, h1) in zip(full, zip(*per_host)):
        np.testing.assert_array_equal(
            b["t1w"], np.concatenate([h0["t1w"], h1["t1w"]]))


def test_lazy_select_preprocesses_only_local_slice():
    """With lazy caching + select, a host materializes exactly the items in
    its own columns of each global batch — 1/n_proc of the epoch."""
    n, bs = 8, 4
    ds, pre = make_ds(n, lazy=True)
    out = batches(BatchLoader(ds, bs, shuffle=True, seed=3, drop_last=True,
                              select=(0, 2)))
    assert all(b["t1w"].shape[0] == 2 for b in out)
    served = sorted(int(b["t1w"][i, 0, 0, 0, 0]) for b in out for i in range(2))
    assert sorted(pre.calls) == served
    assert len(pre.calls) == (n // bs) * 2  # half the epoch, not all of it
    # second epoch with the same permutation stream hits the memoized cache
    # for repeated items only (here: new permutation -> possibly new items,
    # but never MORE than the slice size per batch)
    n_before = len(pre.calls)
    batches(BatchLoader(ds, bs, shuffle=False, seed=3, drop_last=True,
                        select=(0, 2)))
    assert len(pre.calls) <= n_before + (n // bs) * 2


def test_lazy_cache_eviction_bound():
    ds, pre = make_ds(8, cache_num=3, lazy=True)
    for i in range(8):
        ds[i]
    assert len(ds._cache) <= 3
    assert ds.n_preprocessed == 8
    # FIFO: most recent stay cached
    assert 7 in ds._cache


def test_eager_default_unchanged():
    ds, pre = make_ds(8, cache_num=8, lazy=False)
    assert ds.n_preprocessed == 8  # built up-front, reference semantics
    ds[0]
    assert len(pre.calls) == 8  # no extra work on access


def test_wraparound_select():
    ds_full, _ = make_ds(6)
    ds_sel, pre = make_ds(6, lazy=True)
    full = WrapAroundLoader(ds_full, 4)
    sel = WrapAroundLoader(ds_sel, 4, select=(2, 4))
    for _ in range(3):  # crosses the wrap boundary
        b_full = next(full)
        b_sel = next(sel)
        np.testing.assert_array_equal(b_full["t1w"][2:4], b_sel["t1w"])
    assert set(pre.calls) <= set(range(6))
    assert len(set(pre.calls)) < 6  # never materialized the other slice
