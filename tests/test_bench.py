"""The driver contract: `python bench.py` prints ONE parseable JSON line.

Runs bench.main() in-process on tiny shapes (hidden test hooks) so CI
catches a broken bench before the driver does.  The autotune candidates
themselves (16-corner tables, scoped-VMEM budgets) are parity-covered by
test_folded_engine/test_tail_kernel; here we pin the orchestration: every
candidate runs, mismatching candidates are skipped, and the JSON schema
holds.
"""

import importlib.util
import json
import os

import pytest


def _load_bench():
    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(os.path.dirname(__file__), "..", "bench.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _run(capsys, monkeypatch, env):
    # keep CI hermetic: don't let bench.main() turn on the persistent
    # compile cache for the whole pytest process
    monkeypatch.setenv("MULUT_COMPILE_CACHE", "0")
    for k, v in env.items():
        monkeypatch.setenv(k, v)
    _load_bench().main()
    out = capsys.readouterr()
    lines = [ln for ln in out.out.strip().splitlines() if ln]
    assert len(lines) == 1, f"expected ONE stdout line, got {lines}"
    rec = json.loads(lines[0])
    assert rec["metric"] == "lut_retrieval_throughput"
    assert rec["unit"] == "MPix/s"
    assert rec["value"] > 0 and rec["vs_baseline"] > 0
    return rec, out.err


def test_bench_json_contract_xla_path(capsys, monkeypatch):
    # plain CPU: supports_tail_kernel is False -> single XLA candidate
    rec, err = _run(capsys, monkeypatch, {
        "MULUT_BENCH_SHAPE": "24x32x1",
        "MULUT_BENCH_N": "1",
    })
    assert "config=xla" in err


@pytest.mark.slow
def test_bench_autotune_runs_all_candidates(capsys, monkeypatch):
    # interpret-mode Pallas lets the full TPU autotune path run on CPU
    rec, err = _run(capsys, monkeypatch, {
        "MULUT_BENCH_SHAPE": "24x32x1",
        "MULUT_BENCH_N": "1",
        "MULUT_BENCH_INTERPRET": "1",
    })
    for label in ("stock", "y16+f16sd+k1sd", "y16+f16sd+k1sd+s1y8"):
        assert f"[{label}]" in err
    # bit-parity gate: no candidate may have been skipped for mismatch
    assert "MISMATCH" not in err


@pytest.mark.slow
def test_bench_budget_emits_best_so_far(capsys, monkeypatch):
    # A zero budget lets exactly the FIRST candidate run (the measured
    # winner / LutEvaluator default config) and must still emit a valid
    # JSON line — the cold-start contract under external runner timeouts.
    rec, err = _run(capsys, monkeypatch, {
        "MULUT_BENCH_SHAPE": "24x32x1",
        "MULUT_BENCH_N": "1",
        "MULUT_BENCH_INTERPRET": "1",
        "MULUT_BENCH_BUDGET_S": "0",
    })
    assert "[budget]" in err
    assert "[stock]" not in err  # later candidates were skipped
    assert "config=y16+f16sd+k1sd+s1y8" in err
