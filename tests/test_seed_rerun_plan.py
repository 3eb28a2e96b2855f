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

# --- claim + merge (two queues racing on one workdir) ---

import json
import os

from tools.parity.seed_rerun import _merge_runs, claim_workdir


def test_claim_skips_live_pid_and_takes_over_stale(tmp_path):
    wd = str(tmp_path)
    claim = tmp_path / "seed_rerun.claim"
    # live foreign claimant (pid 1 is always alive) -> skip
    claim.write_text("1\n")
    assert claim_workdir(wd) is False
    # stale claimant (dead pid) -> take over, claim rewritten to our pid
    claim.write_text("99999999\n")
    assert claim_workdir(wd) is True
    assert int(claim.read_text().split()[0]) == os.getpid()
    # our own claim (re-entry) -> proceed
    assert claim_workdir(wd) is True
    # garbage claim content -> treated as stale
    claim.write_text("not-a-pid\n")
    assert claim_workdir(wd) is True


def test_merge_runs_unions_by_variant_and_fresh_wins():
    disk = [
        {"seed": 42, "psnr": 26.0, "original": True},
        {"seed": 1337, "psnr": 26.1},
    ]
    new = [
        {"seed": 1337, "psnr": 27.3},  # fresh result for same variant wins
        {"seed": 42, "torch_init": True, "psnr": 26.5},
    ]
    merged = _merge_runs(disk, new)
    by = {(r.get("seed"), bool(r.get("torch_init")), bool(r.get("original"))): r
          for r in merged}
    assert len(merged) == 3
    assert by[(1337, False, False)]["psnr"] == 27.3
    assert by[(42, False, True)]["psnr"] == 26.0
    assert by[(42, True, False)]["psnr"] == 26.5
