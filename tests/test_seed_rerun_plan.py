"""Variant planning for the parity seed-rerun queue (tools/parity/seed_rerun.py).

A planning bug here wastes ~80 CPU-minutes per redundant run, so the
top-up logic is tested as a pure function.
"""

from tools.parity.seed_rerun import plan_variants


def test_fresh_task_runs_all_variants():
    assert plan_variants([], [1337, 2024], True) == [
        {"seed": 1337},
        {"seed": 2024},
        {"seed": 42, "torch_init": True},
    ]


def test_partial_prior_pass_topped_up_not_redone():
    # an older single-seed pass (pre-torch_init code) left original + 1337
    prior = [
        {"seed": 42, "psnr": 26.0, "original": True},
        {"seed": 1337, "psnr": 26.1},
    ]
    assert plan_variants(prior, [1337, 2024], True) == [
        {"seed": 2024},
        {"seed": 42, "torch_init": True},
    ]


def test_complete_pass_is_noop():
    done = [
        {"seed": 42, "psnr": 26.0, "original": True},
        {"seed": 1337, "psnr": 26.1},
        {"seed": 2024, "psnr": 26.2},
        {"seed": 42, "torch_init": True, "psnr": 26.5},
    ]
    assert plan_variants(done, [1337, 2024], True) == []


def test_torch_init_opt_out_and_seed42_rerun():
    prior = [{"seed": 42, "psnr": 26.0, "original": True}]
    assert plan_variants(prior, [2024], False) == [{"seed": 2024}]
    # the 'original' marker must not suppress an explicitly requested
    # fresh seed-42 training run
    assert plan_variants(prior, [42], False) == [{"seed": 42}]
