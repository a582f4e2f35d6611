"""Orchestrator end-to-end smoke: quick preset on a tiny synthetic tree.

Mirrors the fork driver's quick mode (ref: sr/main.py:1303-1317): every step
runs in-process, artifacts are verified structurally, and the analyzer
scrapes results — all hermetic.
"""

import json
import os
import time

import numpy as np
import pytest

from mulut_tpu.pipelines.orchestrator import (
    Analyzer,
    MuLutConfig,
    Pipeline,
    StepTimeoutError,
)
from mulut_tpu.data.synthetic import create_synthetic_dataset


def test_quick_pipeline(tmp_path):
    base = str(tmp_path)
    create_synthetic_dataset(os.path.join(base, "data"), n_train=4, size=64,
                             scales=(4,))
    cfg = MuLutConfig(
        base_dir=base, mode="quick", nf=4,
        train_iters={"quick": 4}, finetune_iters={"quick": 2},
        batch_sizes={"quick": 4}, step_timeouts={"quick": 1200},
    )
    report = Pipeline(cfg).run_complete_evaluation()

    for step in ("training", "transfer", "finetune", "test"):
        assert report["steps"][step]["verified"], report["steps"][step]

    assert "Set5" in report["results"]
    psnr = report["results"]["Set5"][0]
    # sanity only: a 4-iteration nf=4 net produces a valid (not good) image
    assert np.isfinite(psnr) and psnr > 4.0

    analysis = Analyzer(cfg).analyze_results()
    assert len(analysis["luts"]) >= 12  # LUT_* and LUT_ft_* for 2x3 units
    json.dumps(report, default=str)  # serializable


def _hang():
    time.sleep(60)


def test_budget_kills_hanging_step(tmp_path):
    """A hung step dies at its budget and the pipeline report completes
    (the reference kills its step subprocess at timeout,
    ref: sr/main.py:756-788)."""
    cfg = MuLutConfig(base_dir=str(tmp_path), mode="quick",
                      step_timeouts={"quick": 1})
    pipe = Pipeline(cfg)
    t0 = time.time()
    ok = pipe._run_step("hang", _hang, verify=lambda: False)
    elapsed = time.time() - t0
    assert not ok
    assert elapsed < 10  # killed at ~1 s, not after 60
    step = pipe.report["steps"]["hang"]
    assert step["timeout"] and not step["ok"]

    # a later step still runs: the pipeline survived the hang
    assert pipe._run_step("after", lambda: None, verify=lambda: True)


def test_budget_kills_hanging_step_isolated(tmp_path):
    """isolate=True enforces via subprocess terminate (hard kill) and
    returns step results through the queue."""
    cfg = MuLutConfig(base_dir=str(tmp_path), mode="quick",
                      step_timeouts={"quick": 1})
    pipe = Pipeline(cfg, isolate=True)
    t0 = time.time()
    ok = pipe._run_step("hang", _hang, verify=lambda: False)
    assert not ok and time.time() - t0 < 15
    assert pipe.report["steps"]["hang"]["timeout"]

    got = {}
    pipe._run_step("res", lambda: 41 + 1, verify=lambda: True,
                   on_result=lambda r: got.setdefault("v", r))
    assert got["v"] == 42  # results cross the process boundary


def test_budget_raises_in_full_mode(tmp_path):
    cfg = MuLutConfig(base_dir=str(tmp_path), mode="full",
                      step_timeouts={"full": 1})
    pipe = Pipeline(cfg)
    with pytest.raises(StepTimeoutError):
        pipe._run_step("hang", _hang, verify=lambda: False)
