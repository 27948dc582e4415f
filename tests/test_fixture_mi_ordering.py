"""Regression guard for the synthetic fixture's oracle orderings
(results/README.md "Mutual information" section; calibration tool:
tpu_tests/oracle_floor.py).

The fixture must keep the reference's real-data orderings ACHIEVABLE under
the reference's own eval chain (independent [0,255] min/max rescale + round,
inferrence.py:150-162): a perfect clean-T2 generator — the T2 volume
regenerated from the same seed with receiver noise zeroed — must beat the
T1-identity baseline on estimated MI (reference anchors: gen 0.292 >
identity 0.196, /root/reference/code/eval/*.xml) and decisively on MAE
(reference: 4.365 vs 11.851, ratio 37%). Two historical fixtures violated
this: the round-2 fixture's identical texture realization made identity MI
unrealistically strong, and the first round-3 fixture's noise=0.12 made the
MAE/MSE/PSNR oracles structurally UN-winnable (perfect generator MAE 29.1 vs
identity 12.3 — the eval rewarded noise-matching)."""

import numpy as np

from minipig_gan_tpu.data.synthetic import synthetic_pair
from minipig_gan_tpu.ops.metrics import mutual_information
from minipig_gan_tpu.ops.percentile import (
    rescale_to_uint8_range,
    scale_intensity_range_percentiles,
)

def _norm(v):
    return np.asarray(scale_intensity_range_percentiles(v, 1.0, 99.0, -1.0, 1.0))


def test_perfect_generator_beats_identity_on_mi_and_mae():
    mi_margins, mae_ratios = [], []
    for seed in range(3):
        t1, t2, _ = synthetic_pair(shape_zyx=(48, 48, 48), seed=seed)
        # clean twin: same RandomState draw order, receiver noise zeroed
        _, t2_clean, _ = synthetic_pair(shape_zyx=(48, 48, 48), seed=seed,
                                        noise=0.0)
        g8 = np.asarray(rescale_to_uint8_range(_norm(t2_clean)))
        t8 = np.asarray(rescale_to_uint8_range(_norm(t2)))
        i8 = np.asarray(rescale_to_uint8_range(_norm(t1)))
        mi_margins.append(float(mutual_information(g8, t8, bins=64))
                          - float(mutual_information(i8, t8, bins=64)))
        mae_ratios.append(np.abs(g8 - t8).mean() / np.abs(i8 - t8).mean())
    # measured at the committed defaults: MI margin ~+0.05, MAE ratio ~0.5
    assert np.mean(mi_margins) > 0.02, mi_margins
    assert np.mean(mae_ratios) < 0.7, mae_ratios
