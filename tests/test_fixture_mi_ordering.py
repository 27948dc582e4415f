"""Regression guard for the round-3 fixture's MI ordering (results/README.md
"Mutual information" section): a denoising generator stand-in must beat the
T1-identity baseline on estimated MI at the committed bins=64 convention —
the property the round-2 fixture (shared texture realization, ~1% noise)
violated, inverting the reference's real-data anchors
(/root/reference/code/eval/*.xml: gen 0.292 > identity 0.196)."""

import numpy as np

from minipig_gan_tpu.data.synthetic import synthetic_pair
from minipig_gan_tpu.ops.metrics import mutual_information
from minipig_gan_tpu.ops.percentile import (
    rescale_to_uint8_range,
    scale_intensity_range_percentiles,
)

def _norm(v):
    return np.asarray(scale_intensity_range_percentiles(v, 1.0, 99.0, -1.0, 1.0))


def _lut(src, tgt, bins=32):
    qs = np.quantile(src, np.linspace(0, 1, bins + 1)[1:-1])
    cls = np.digitize(src, qs)
    out = np.zeros_like(tgt)
    for c in range(bins):
        m = cls == c
        if m.any():
            out[m] = float(tgt[m].mean())
    return out


def _box(v, r=2):
    out = v.astype(np.float64)
    k = 2 * r + 1
    for ax in range(3):
        c = np.cumsum(np.pad(out, [(r + 1, r) if a == ax else (0, 0)
                                   for a in range(3)], mode="edge"), axis=ax)
        out = (np.take(c, range(k, c.shape[ax]), axis=ax)
               - np.take(c, range(c.shape[ax] - k), axis=ax)) / k
    return out.astype(np.float32)


def test_denoising_generator_beats_identity_mi():
    margins = []
    for seed in range(3):
        t1, t2, _ = synthetic_pair(shape_zyx=(48, 48, 48), seed=seed)
        t1n, t2n = _norm(t1), _norm(t2)
        gen = _lut(_box(t1n), t2n)  # receptive-field denoise + tissue LUT
        g8 = rescale_to_uint8_range(gen)
        t8 = rescale_to_uint8_range(t2n)
        i8 = rescale_to_uint8_range(t1n)
        mi_gen = float(mutual_information(g8, t8, bins=64))
        mi_ident = float(mutual_information(i8, t8, bins=64))
        margins.append(mi_gen - mi_ident)
    # mean margin positive with room to spare (measured +0.057±0.004 at 64^3)
    assert np.mean(margins) > 0.02, margins
