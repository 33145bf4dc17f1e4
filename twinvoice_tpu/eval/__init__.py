from twinvoice_tpu.eval.gauntlet import (  # noqa: F401
    GauntletCase,
    LEVELS,
    make_base_cases,
    perturb_cases,
    run_segmenter_gauntlet,
    run_e2e_gauntlet,
)
