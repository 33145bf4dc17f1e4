"""Real-photo degradation effects (data/augment r3): halftone, moiré,
crumple, thermal fade — determinism, range, and actually-degrades checks,
plus the gauntlet scenario plumbing."""

import numpy as np

from twinvoice_tpu.data.augment import PerturbSpec, apply_spec
from twinvoice_tpu.data.synthetic import render_invoice


def _page():
    img, _ = render_invoice("AB12345678", "2025-01-15", 777, seed=5)
    return np.asarray(img)


def _mask(img):
    m = np.zeros(img.shape, np.uint8)
    m[40:80, 30:200, 0] = 255
    return m


def test_each_effect_changes_image_keeps_mask():
    img = _page()
    mask = _mask(img)
    for name, kw in [
        ("halftone", dict(halftone=0.7)),
        ("screen_moire", dict(screen_moire=0.5)),
        ("crumple", dict(crumple=0.8)),
        ("thermal_fade", dict(thermal_fade=0.7)),
    ]:
        out, m2 = apply_spec(img, mask, PerturbSpec(**kw),
                             np.random.default_rng(0))
        assert out.dtype == np.uint8 and out.shape == img.shape, name
        diff = np.abs(out.astype(np.int16) - img).mean()
        assert diff > 2.0, (name, diff)  # visibly degraded
        # photometric-only: geometry identity keeps the mask untouched
        np.testing.assert_array_equal(m2, mask)


def test_effects_deterministic_given_rng():
    img = _page()
    spec = PerturbSpec(halftone=0.6, crumple=0.5, thermal_fade=0.4)
    a, _ = apply_spec(img, None, spec, np.random.default_rng(9))
    b, _ = apply_spec(img, None, spec, np.random.default_rng(9))
    np.testing.assert_array_equal(a, b)


def test_thermal_fade_lightens_ink():
    img = _page()
    out, _ = apply_spec(img, None, PerturbSpec(thermal_fade=0.8),
                        np.random.default_rng(1))
    dark = img.mean(-1) < 100  # ink pixels
    assert dark.any()
    assert out.mean(-1)[dark].mean() > img.mean(-1)[dark].mean() + 10


def test_gauntlet_scenario_tiers():
    from twinvoice_tpu.eval import make_base_cases, perturb_cases
    from twinvoice_tpu.eval.gauntlet import SCENARIOS

    cases = make_base_cases(2, seed=901_000)
    for name in SCENARIOS:
        out = perturb_cases(cases, name, seed=3)
        assert len(out) == 2 and out[0].level == name
        assert out[0].image.shape == cases[0].image.shape
        d = np.abs(out[0].image.astype(np.int16) - cases[0].image).mean()
        assert d > 1.0, (name, d)
        # reproducible
        again = perturb_cases(cases, name, seed=3)
        np.testing.assert_array_equal(out[0].image, again[0].image)
