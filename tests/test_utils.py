"""Tests for utils (profiling meter, viz overlays)."""

import random

import numpy as np

from abcnet_tpu.utils.profiling import StepTimer


def test_step_timer_rates():
    t = StepTimer(batch_size=4, window=10)
    assert t.ms_per_step() is None
    base = 100.0
    for i in range(5):
        t._times.append(base + i * 0.05)   # 50 ms/step
    assert abs(t.ms_per_step() - 50.0) < 1e-6
    assert abs(t.images_per_sec() - 80.0) < 1e-6


def test_viz_overlays():
    from abcnet_tpu.data.encode import (encode_targets_np,
                                        parse_atoms_string,
                                        parse_bonds_string)
    from abcnet_tpu.data.generate import generate_sample
    from abcnet_tpu.utils.viz import overlay_targets

    rng = random.Random(2)
    s = None
    while s is None:
        s = generate_sample(rng)
    t = encode_targets_np(parse_atoms_string(s.atoms_string),
                          parse_bonds_string(s.bonds_string))
    img = overlay_targets(s.image, t)
    assert img.shape == (512, 512, 3)
    # red atom markers and green rays must appear
    assert (img == [255, 0, 0]).all(-1).any()
    assert (img == [0, 200, 0]).all(-1).any()
