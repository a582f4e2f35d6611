"""Orchestrator end-to-end smoke: quick preset on a tiny synthetic tree.

Mirrors the fork driver's quick mode (ref: sr/main.py:1303-1317): every step
runs in-process, artifacts are verified structurally, and the analyzer
scrapes results — all hermetic.
"""

import json
import os

import numpy as np

from mulut_tpu.pipelines.orchestrator import Analyzer, MuLutConfig, Pipeline
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
