"""Typed configuration for the whole framework.

The reference has essentially no config system — hyperparameters live in
Lightning `save_hyperparameters` calls and hard-coded absolute paths
(/root/reference/code/GAN/GAN_final.py:214-231,445; inferrence.py:91-92).
Here every subsystem is driven by these dataclasses; CLIs parse overrides
with `--key value` / `--section.key value` flags and can round-trip to JSON
(`to_json`/`from_json`) so checkpoints carry their exact provenance, the way
Lightning persisted hparams.yaml (GAN_final.py:231, inferrence.py:103).
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any, Dict, Optional, Tuple


@dataclass(frozen=True)
class GeneratorConfig:
    """CasNet (GAN_final.py:92-122). Defaults = the canonical trained model."""

    n_unet_blocks: int = 6
    channels: Tuple[int, ...] = (16, 32, 64, 128)
    strides: Tuple[int, ...] = (2, 2, 2)
    num_res_units: int = 2
    use_scan: bool = True
    # Explicit per-UNet-block rematerialization. OFF by default: measured on
    # the v5e chip, XLA's own scheduler fits the canonical 128^3 batch-4
    # accum-2 GAN step in HBM without it and runs ~5% faster (221 vs 211
    # slices/s, tpu_tests/remat_experiments.py; BENCH_NOTES.md). Turn on for
    # configs whose activations exceed HBM (larger volumes/microbatches).
    remat: bool = False


@dataclass(frozen=True)
class DiscriminatorConfig:
    """kind: 'global' (GAN_final.py:159-209), 'patch' (test_runs/GAN.py:136-198),
    or 'monai' (test_runs/perceptual_test.py:127-171)."""

    kind: str = "global"
    features: Tuple[int, ...] = (64, 128, 256, 256)
    # rematerialize discriminator blocks in the backward pass (global kind)
    remat: bool = True
    patch_features: Tuple[int, ...] = (64, 128, 256, 512)
    patch_hidden: int = 64
    use_perceptual: bool = True  # GAN.py vs GAN2.py ablation switch
    # MONAI 0.4.0 Discriminator defaults dropout=0.25 and the reference
    # does not override it (perceptual_test.py:131-140) — train-mode
    # nn.Dropout between conv and PReLU ('monai' kind only).
    monai_dropout: float = 0.25


@dataclass(frozen=True)
class PatchConfig:
    """RandSpatialCropSamplesd(roi=16^3, num_samples=128)
    (test_runs/GAN.py:263-272)."""

    roi_size: Tuple[int, int, int] = (16, 16, 16)
    num_samples: int = 128
    # route the in-step patch crop through the Pallas DMA kernel
    # (ops/pallas/patches_kernel.py) instead of the XLA gather; TPU only
    use_pallas: bool = False


@dataclass(frozen=True)
class TrainConfig:
    """GAN hparams (GAN_final.py:214-231: g_lr=d_lr=5e-4, b1=.5, b2=.999,
    one_sided=0.9, train bs=4 @ GAN_final.py:421-425; test_runs lr=2e-4)."""

    g_lr: float = 5e-4
    d_lr: float = 5e-4
    b1: float = 0.5
    b2: float = 0.999
    batch_size: int = 4
    one_sided_label_value: float = 0.9
    # microbatch count for gradient accumulation: activation memory scales
    # with batch_size/accum_steps while the optimizer sees the full batch
    accum_steps: int = 1
    max_steps: int = 1_000_000
    # cosine-decay the Adam LRs to lr_decay_alpha*lr over this many steps;
    # 0 keeps the reference's fixed-LR semantics (GAN_final.py:214-231)
    lr_decay_steps: int = 0
    # reference-plus: weight of the gradient-difference loss added to the
    # generator objective (losses.py::gradient_difference_loss; 0 = off,
    # keeping the reference's exact L1-only recon term). Counters L1's
    # over-smoothing, which the binned-MI eval punishes (results/README.md,
    # "Mutual information").
    gdl_weight: float = 0.0
    lr_decay_alpha: float = 0.05
    seed: int = 0
    # 'gan' = full pix2pix loop; 'generator_only' = L1 regression slice
    # (BASELINE.json config 1); 'patch' = patch+perceptual loop (config 3).
    mode: str = "gan"
    # Fast mode (deviates from reference semantics, off by default): the D
    # sub-step reuses the G sub-step's generated volumes instead of re-running
    # the generator with the just-updated params (GAN_final.py:289-291 runs a
    # fresh forward) — saves one full generator forward of the three per step;
    # G BN stats then update once per step instead of twice.
    reuse_g_forward: bool = False
    # Fast mode (requires reuse_g_forward): compute the G and D updates
    # from ONE joint loss per microbatch in a single scan. In 'gan' mode
    # the two fake-pass D forwards (G sub-step vs D sub-step) are
    # structurally identical HLO, so XLA CSE merges them; in 'patch' mode
    # the sub-steps draw independent patch sets (reference semantics) so
    # only the scan merge applies. Generated volumes flow to the D terms
    # as live values instead of a scanned stack. Same update math as
    # reuse_g; BN running-stat EMA order interleaves per microbatch.
    # CAVEAT (kind='monai'): a discriminator with train-mode dropout draws
    # DIFFERENT rng masks in the G-loss and D-loss fake passes (fresh masks
    # per apply — torch semantics), so the two forwards are no longer
    # identical HLO and the CSE merge does not happen: fused is correct but
    # buys only the single-scan win there, like patch mode.
    fused_step: bool = False
    # numeric policy: params fp32; compute dtype for convs.
    compute_dtype: str = "bfloat16"
    # Schedule conv backward passes behind an optimization barrier
    # (ops/fastconv.py): stops XLA re-fusing the BN/LReLU backward chain
    # into every gradient convolution (measured ~2x on in-step wgrads,
    # BENCH_NOTES round-4). Same math, different schedule.
    conv_grad_barrier: bool = True
    # Unroll the microbatch-accumulation loops as python loops instead of
    # lax.scan (identical math and update order, equivalence-tested).
    # MEASURED NEGATIVE at the canonical 128^3 config: even with
    # optimization-barrier serialization between microbatches the allocator
    # needs 19.2G vs the scan's 16.8G (31.8G unserialized) and OOMs —
    # lax.scan's buffer reuse is load-bearing for whole-volume training.
    # Useful only for small-volume configs; default stays scan.
    unroll_accum: bool = False
    log_every: int = 10
    # cadence of the rolling `last` resume checkpoint; the three loss
    # monitors are evaluated every `monitor_every` steps (1 = every step,
    # Lightning ModelCheckpoint parity, GAN_final.py:448-472) and save on
    # improvement. Raise monitor_every on hosts where a full-state fetch is
    # expensive (e.g. tunneled devices) — early training improves nearly
    # every step and would otherwise checkpoint-storm.
    monitor_every: int = 1
    # With monitor_every > 1, keep a device-side copy of the train state at
    # each monitored key's within-window argmin step, so monitor checkpoints
    # save the EXACT state that achieved the monitored value (Lightning
    # ModelCheckpoint semantics, GAN_final.py:448-472) instead of the
    # window-boundary state (<= monitor_every-1 steps of drift). Costs one
    # extra state copy in HBM per monitored key (~3 x ~200 MB at the
    # canonical config) plus a per-step masked select over the state (~1 ms
    # at HBM rate vs the 2.2 s step). Turn off if HBM-constrained.
    monitor_exact: bool = True
    # Defer the monitor-checkpoint DECISION (and its full-state
    # device->host fetch) to every Nth monitor window (1 = every window,
    # current/Lightning-parity behavior). With monitor_exact the device-side
    # argmin tracker spans the deferred windows, so the saved weights are
    # still the EXACT argmin state over the span — only the save cadence
    # (and hence the index granularity) coarsens; the FINAL best checkpoint
    # per key is identical. Measured motive: on a tunneled device
    # (~10 MB/s host link) early training improves nearly every window and
    # each improvement fetches the full ~165 MB train state — ~0.7 s/step
    # of the canonical quality run's wall. monitor_save_every=5 amortizes
    # that 5x at the cost of <=5 windows of monitor-checkpoint durability
    # (the rolling `last` + archive ladder are unaffected).
    monitor_save_every: int = 1
    checkpoint_every: int = 500
    # checkpoints kept per loss monitor (reference: save_top_k=1)
    keep_top_k: int = 1
    image_log_every_epochs: int = 1


@dataclass(frozen=True)
class DataConfig:
    """Dataset + preprocessing (GAN_final.py:321-437, transforms.py)."""

    structure_json: str = ""
    spatial_size: Tuple[int, int, int] = (128, 128, 128)
    # human canonical grid: identity direction, 256mm FOV (transforms.py:140-147)
    fov_mm: float = 256.0
    # percentile window -> [-1, 1] (GAN_final.py:386-394)
    lower_percentile: float = 1.0
    upper_percentile: float = 99.0
    b_min: float = -1.0
    b_max: float = 1.0
    # on-device preprocessing (SURVEY.md §7 config 4): resample + percentile
    # normalization run jit-compiled on the accelerator instead of host
    # numpy/C++; the diagonal-grid resample uses the fused Pallas kernel on
    # TPU (one HBM read vs three einsum passes)
    device_preprocess: bool = False
    cache_num: int = 500
    num_workers: int = 8
    shuffle: bool = True
    # fill the final partial batch by wrapping to the dataset start instead
    # of dropping it (the reference's CustomDataLoader workaround,
    # test_runs/GAN.py:204-233); sequential like the original
    wrap_last_batch: bool = False
    prefetch: int = 2
    # synthetic fallback (CPU-testable fixture; SURVEY.md §7.1)
    synthetic_num_pairs: int = 0
    # deep structures per synthetic subject (data/synthetic.py
    # _BLOB_CLASSES): T1-isointense/T2-distinct anatomy that makes the
    # T1-identity MI baseline realistically weak. 0 = historical fixture.
    synthetic_blobs: int = 0
    # T1 scanner-bias-field amplitude (data/synthetic.py): smooth
    # multiplicative gain the identity baseline cannot undo but a
    # global-context generator can. 0 = historical fixture.
    synthetic_t1_bias: float = 0.0


@dataclass(frozen=True)
class MeshConfig:
    """Device mesh. data = DP axis (grad psum over ICI); spatial = optional
    volume-sharding axis for >HBM volumes (SURVEY.md §2 parallelism plan)."""

    data: int = -1  # -1 = all devices
    spatial: int = 1


@dataclass(frozen=True)
class Config:
    generator: GeneratorConfig = field(default_factory=GeneratorConfig)
    discriminator: DiscriminatorConfig = field(default_factory=DiscriminatorConfig)
    patch: PatchConfig = field(default_factory=PatchConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    data: DataConfig = field(default_factory=DataConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)
    log_dir: str = "./runs"


# --------------------------------------------------------------------------
# (De)serialization + flat-flag overrides
# --------------------------------------------------------------------------

def to_dict(cfg: Any) -> Any:
    if dataclasses.is_dataclass(cfg):
        return {f.name: to_dict(getattr(cfg, f.name)) for f in dataclasses.fields(cfg)}
    if isinstance(cfg, tuple):
        return list(cfg)
    return cfg


def to_json(cfg: Config) -> str:
    return json.dumps(to_dict(cfg), indent=2)


def _from_dict(cls, d: Dict[str, Any]):
    import typing

    hints = typing.get_type_hints(cls)  # resolves PEP-563 string annotations
    kwargs = {}
    for f in dataclasses.fields(cls):
        if f.name not in d:
            continue
        v = d[f.name]
        ftype = hints.get(f.name, f.type)
        if isinstance(ftype, type) and dataclasses.is_dataclass(ftype):
            kwargs[f.name] = _from_dict(ftype, v)
        elif isinstance(v, list):
            kwargs[f.name] = tuple(v)
        else:
            kwargs[f.name] = v
    return cls(**kwargs)


def from_dict(d: Dict[str, Any]) -> Config:
    return _from_dict(Config, d)


def from_json(s: str) -> Config:
    return from_dict(json.loads(s))


def apply_overrides(cfg: Config, overrides: Dict[str, str]) -> Config:
    """Apply {'train.g_lr': '1e-3', 'generator.n_unet_blocks': '4'}-style
    dotted-path string overrides with type coercion."""
    d = to_dict(cfg)
    for path, raw in overrides.items():
        parts = path.split(".")
        node = d
        for p in parts[:-1]:
            if p not in node:
                raise KeyError(f"unknown config section {p!r} in {path!r}")
            node = node[p]
        key = parts[-1]
        if key not in node:
            raise KeyError(f"unknown config key {path!r}")
        cur = node[key]
        if isinstance(cur, bool):
            node[key] = str(raw).lower() in ("1", "true", "yes", "on")
        elif isinstance(cur, int) and not isinstance(cur, bool):
            node[key] = int(raw)
        elif isinstance(cur, float):
            node[key] = float(raw)
        elif isinstance(cur, list):
            node[key] = [type(cur[0])(x) if cur else x for x in str(raw).split(",")]
        else:
            node[key] = raw
    return from_dict(d)
