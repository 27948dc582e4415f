"""Host input pipeline: preprocessing cache + async batch prefetch.

TPU-native replacement for the reference's MONAI `CacheDataset` +
multi-worker torch `DataLoader` stack (/root/reference/code/GAN/
GAN_final.py:402-437): volumes are preprocessed once (NIfTI read -> physical
resample onto the canonical grid -> percentile window to [-1, 1]) by a thread
pool into a pinned in-RAM cache of fixed-shape float32 arrays, then batches
stream to the device through a double-buffered background prefetcher so the
host never blocks the train step (HBM staging overlap; SURVEY.md §2
host-parallelism plan).

The per-item transform pipeline reproduces the 6-stage Compose at
GAN_final.py:381-398:
  LoadITKImaged            -> nifti.read_nifti           (+ meta capture)
  ResampleT1T2d            -> ops.resample (human canonical grid, both keys)
  ITKImageToNumpyd         -> (native: arrays already numpy)
  ScaleIntensityRangePercentilesd(1, 99, -1, 1, clip)
  AddChanneld              -> trailing channel dim (NDHWC)
  ToTensord                -> jnp arrays at batch time
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

from ..config import DataConfig
from ..ops.percentile import scale_intensity_range_percentiles  # noqa: F401 (device variant)
from ..ops.resample import GridSpec, human_canonical_grid, resample_numpy
from .nifti import ImageMeta, read_nifti


def percentile_normalize_numpy(vol: np.ndarray, lower: float, upper: float,
                               b_min: float, b_max: float) -> np.ndarray:
    """Host mirror of MONAI ScaleIntensityRangePercentilesd (clip=True)."""
    a_min = np.percentile(vol, lower)
    a_max = np.percentile(vol, upper)
    denom = (a_max - a_min) or 1.0
    out = (vol - a_min) / denom * (b_max - b_min) + b_min
    return np.clip(out, min(b_min, b_max), max(b_min, b_max)).astype(np.float32)


class PairPreprocessor:
    """One T1w/T2w pair -> dict of normalized (D, H, W, 1) float32 volumes.

    `keep_meta=True` also returns each key's ImageMeta and the grid meta —
    the equivalent of the `{k}_meta_dict` entries the reference's transforms
    thread through (transforms.py:30-44) for later NIfTI-out."""

    def __init__(self, cfg: DataConfig, grid: Optional[GridSpec] = None,
                 reader: Optional[Callable] = None, use_native: bool = True,
                 device: Optional[bool] = None):
        self.cfg = cfg
        self.grid = grid or human_canonical_grid(
            tuple(cfg.spatial_size), cfg.fov_mm
        )
        self.device = (bool(getattr(cfg, "device_preprocess", False))
                       if device is None else device)
        self._native = False
        if reader is None:
            if use_native:
                from . import native

                if native.native_available():
                    reader = native.read_nifti_native
                    self._native = True
            reader = reader or read_nifti
        self.reader = reader

    def _device_resample_normalize(self, vol, meta) -> np.ndarray:
        """Config-4 path: resample + percentile window on the accelerator —
        the fused Pallas separable kernel on TPU (diagonal grids), XLA
        separable/gather elsewhere, then the on-device percentile window."""
        import jax

        from ..ops.resample import resample as resample_device

        use_pallas = jax.devices()[0].platform not in ("cpu",)
        res = resample_device(vol, meta, self.grid, use_pallas=use_pallas)
        norm = jax.jit(
            scale_intensity_range_percentiles, static_argnums=(1, 2, 3, 4)
        )(res, float(self.cfg.lower_percentile),
          float(self.cfg.upper_percentile),
          float(self.cfg.b_min), float(self.cfg.b_max))
        return np.asarray(jax.device_get(norm), np.float32)

    def _resample(self, vol, meta):
        if self._native:
            from . import native

            return native.resample_native(vol, meta, self.grid)
        return resample_numpy(vol, meta, self.grid)

    def _normalize(self, vol):
        if self._native:
            from . import native

            return native.percentile_scale_native(
                vol, self.cfg.lower_percentile, self.cfg.upper_percentile,
                self.cfg.b_min, self.cfg.b_max,
            )
        return percentile_normalize_numpy(
            vol, self.cfg.lower_percentile, self.cfg.upper_percentile,
            self.cfg.b_min, self.cfg.b_max,
        )

    def __call__(self, pair: Dict[str, str], keep_meta: bool = False) -> Dict:
        out: Dict = {}
        for key in ("t1w", "t2w"):
            if key not in pair:
                continue
            vol, meta = self.reader(pair[key])
            if self.device:
                norm = self._device_resample_normalize(vol, meta)
            else:
                res = self._resample(vol, meta)
                norm = self._normalize(res)
            out[key] = norm[..., None]  # AddChanneld -> (D, H, W, 1)
            if keep_meta:
                out[f"{key}_meta"] = meta
                out[f"{key}_raw"] = vol
        if keep_meta:
            out["grid_meta"] = self.grid.meta()
        return out


class CachedDataset:
    """Preprocess-once in-RAM cache (CacheDataset semantics, GAN_final.py:
    400-419: cache_num items eagerly via num_workers; the rest lazily).

    `lazy=True` skips the eager build and instead memoizes items on first
    access, bounded by cache_num with FIFO eviction. This is the multi-host
    mode: each process then preprocesses and holds ONLY the items its local
    batch slice actually reads (~1/process_count of the stream) instead of
    every process eagerly preprocessing the identical first cache_num items
    it will mostly never serve. At reference scale the eager full cache is
    impossible anyway (4,731 pairs x 16 MB = ~76 GB/host); lazy + loader
    `select` bounds both RAM and preprocessing to the host's own share.
    """

    def __init__(self, pairs: Sequence[Dict[str, str]],
                 preprocessor: PairPreprocessor,
                 cache_num: int = 500, num_workers: int = 8,
                 lazy: bool = False):
        self.pairs = list(pairs)
        self.pre = preprocessor
        self._cache: Dict[int, Dict[str, np.ndarray]] = {}
        self._cache_num = min(cache_num, len(self.pairs))
        self._lazy = lazy
        self._lock = threading.Lock()
        self.n_preprocessed = 0  # observability: total preprocess calls
        if not lazy and self._cache_num > 0:
            with ThreadPoolExecutor(max_workers=max(1, num_workers)) as ex:
                for i, item in zip(range(self._cache_num),
                                   ex.map(self.pre, self.pairs[:self._cache_num])):
                    self._cache[i] = item
            self.n_preprocessed = self._cache_num

    def __len__(self) -> int:
        return len(self.pairs)

    def __getitem__(self, i: int) -> Dict[str, np.ndarray]:
        with self._lock:
            if i in self._cache:
                return self._cache[i]
        item = self.pre(self.pairs[i])
        with self._lock:
            self.n_preprocessed += 1
            if self._lazy and self._cache_num > 0:
                if len(self._cache) >= self._cache_num:
                    # FIFO eviction (dict preserves insertion order)
                    self._cache.pop(next(iter(self._cache)))
                self._cache[i] = item
        return item


class BatchLoader:
    """Shuffled batcher over a CachedDataset (torch DataLoader semantics:
    shuffle per epoch, keep the last partial batch — GAN_final.py:421-425).

    `select=(lo, hi)` yields only columns [lo, hi) of every GLOBAL batch —
    the multi-host data-parallel partition. The permutation is a pure
    function of the seed, so every process computes the identical global
    batch order and materializes (preprocesses) ONLY its own slice's items:
    a true partition of each global batch with no item ever loaded by two
    hosts, and no host streaming data it doesn't feed to its chips."""

    def __init__(self, dataset: CachedDataset, batch_size: int,
                 shuffle: bool = True, seed: int = 0, drop_last: bool = False,
                 select: Optional[Tuple[int, int]] = None):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.select = select
        self._rng = np.random.RandomState(seed)

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def epoch(self) -> Iterator[Dict[str, np.ndarray]]:
        order = np.arange(len(self.dataset))
        if self.shuffle:
            self._rng.shuffle(order)
        for start in range(0, len(order), self.batch_size):
            idx = order[start : start + self.batch_size]
            if self.drop_last and len(idx) < self.batch_size:
                return
            if self.select is not None:
                idx = idx[self.select[0]:self.select[1]]
            items = [self.dataset[int(i)] for i in idx]
            yield {
                k: np.stack([it[k] for it in items])
                for k in items[0]
                if isinstance(items[0][k], np.ndarray)
            }


class WrapAroundLoader:
    """Infinite wrap-around batcher — the reference's hand-rolled
    `CustomDataLoader` (test_runs/GAN.py:204-233): sequential batches that
    reset to index 0 when fewer than batch_size items remain, so every batch
    is full-size (its workaround for drop-last). Useful for steady-state
    benchmarking and fixed-shape step counts."""

    def __init__(self, dataset: CachedDataset, batch_size: int,
                 select: Optional[Tuple[int, int]] = None):
        self.dataset = dataset
        self.batch_size = batch_size
        self.select = select  # multi-host local slice, as in BatchLoader
        self._idx = 0

    def __iter__(self):
        return self

    def __next__(self) -> Dict[str, np.ndarray]:
        if self._idx + self.batch_size > len(self.dataset):
            self._idx = 0
        cols = range(self.batch_size) if self.select is None else \
            range(self.select[0], self.select[1])
        items = [self.dataset[self._idx + i] for i in cols]
        self._idx += self.batch_size
        return {
            k: np.stack([it[k] for it in items])
            for k in items[0]
            if isinstance(items[0][k], np.ndarray)
        }


class DevicePrefetcher:
    """Double-buffered host->device staging: a background thread device_puts
    the next batch (sharded over the mesh) while the current step runs."""

    def __init__(self, batches: Iterator, put: Callable, depth: int = 2):
        self._q: "queue.Queue" = queue.Queue(maxsize=max(1, depth))
        self._put = put
        self._done = object()
        self._error: Optional[BaseException] = None

        def worker():
            try:
                for b in batches:
                    self._q.put(self._put(b))
            except BaseException as e:  # noqa: BLE001 — re-raised in consumer
                self._error = e
            finally:
                self._q.put(self._done)

        self._thread = threading.Thread(target=worker, daemon=True)
        self._thread.start()

    def __iter__(self):
        return self

    def __next__(self):
        item = self._q.get()
        if item is self._done:
            if self._error is not None:
                raise self._error
            raise StopIteration
        return item


def pad_batch(batch: Dict[str, np.ndarray], batch_size: int) -> Tuple[Dict[str, np.ndarray], int]:
    """Static-shape helper: pad a partial batch up to `batch_size` by repeating
    the last item; returns (padded, n_real). Keeps jit shapes unique."""
    n = next(iter(batch.values())).shape[0]
    if n == batch_size:
        return batch, n
    reps = batch_size - n
    out = {
        k: np.concatenate([v, np.repeat(v[-1:], reps, axis=0)])
        for k, v in batch.items()
    }
    return out, n
