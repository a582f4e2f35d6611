"""Pipeline orchestrator: presets, step runner, artifact checks, analyzer.

The TPU-native counterpart of the fork's Colab driver (ref: sr/main.py:66-1631):
  * `MuLutConfig` — directory layout + quick/test/full iteration presets
    (ref: sr/main.py:66-113).
  * `Pipeline` — runs train -> transfer -> finetune -> test IN-PROCESS (the
    reference shells out per step, ref: sr/main.py:733-790; one process is
    the right shape here since every step shares the same jit cache and
    device), with per-step wall-clock budgets, continue-on-error in
    quick/test modes, structural output verification after each step
    (ref: sr/main.py:850-1002) and dummy-LUT fallback injection so later
    steps stay exercisable (ref: sr/main.py:935-956, 1004-1025).
  * `Analyzer` — LUT size report + PSNR scraped from the run logs
    (ref: sr/main.py:1104-1274; plots are optional and gated on matplotlib).
  * `quick_evaluation` / `test_evaluation` / `full_evaluation` entry points
    (ref: sr/main.py:1303-1363).

Dataset download helpers are replaced by the hermetic synthetic-dataset
generator (`data.synthetic`): this environment has no egress, and the
reference's downloaders (ref: sr/main.py:181-399) only feed the same
directory trees.
"""

from __future__ import annotations

import glob
import json
import os
import re
import time
import traceback
from dataclasses import dataclass, field

import numpy as np


@dataclass
class MuLutConfig:
    """Directory + run-scale presets (ref: sr/main.py:66-113)."""

    base_dir: str = "."
    scale: int = 4
    stages: int = 2
    modes: str = "sdy"
    interval: int = 4
    nf: int = 64

    # full / test / quick presets (ref: sr/main.py:95-101)
    mode: str = "quick"  # quick | test | full
    train_iters: dict = field(default_factory=lambda: {
        "quick": 100, "test": 2000, "full": 200000
    })
    finetune_iters: dict = field(default_factory=lambda: {
        "quick": 20, "test": 200, "full": 2000
    })
    batch_sizes: dict = field(default_factory=lambda: {
        "quick": 8, "test": 16, "full": 32
    })
    step_timeouts: dict = field(default_factory=lambda: {
        "quick": 600, "test": 3600, "full": 86400
    })
    crop_sizes: dict = field(default_factory=lambda: {
        "quick": 16, "test": 32, "full": 48
    })

    @property
    def exp_dir(self) -> str:
        return os.path.join(
            self.base_dir, "models", f"sr_x{self.scale}{self.modes}"
        )

    @property
    def data_dir(self) -> str:
        return os.path.join(self.base_dir, "data")

    @property
    def train_dir(self) -> str:
        return os.path.join(self.data_dir, "DIV2K")

    @property
    def val_dir(self) -> str:
        return os.path.join(self.data_dir, "SRBenchmark")

    @property
    def results_dir(self) -> str:
        return os.path.join(self.base_dir, "results")

    @property
    def total_iter(self) -> int:
        return self.train_iters[self.mode]

    @property
    def ft_iter(self) -> int:
        return self.finetune_iters[self.mode]

    @property
    def batch_size(self) -> int:
        return self.batch_sizes[self.mode]

    @property
    def lenient(self) -> bool:
        """quick/test modes continue past step failures (ref: sr/main.py:771-773)."""
        return self.mode in ("quick", "test")


class _Opt:
    """Plain attribute bag standing in for parsed CLI options."""

    def __init__(self, **kw):
        self.__dict__.update(kw)


def _train_opt(cfg: MuLutConfig):
    total = cfg.total_iter
    return _Opt(
        scale=cfg.scale, stages=cfg.stages, modes=cfg.modes, nf=cfg.nf,
        interval=cfg.interval, expDir=cfg.exp_dir,
        valoutDir=os.path.join(cfg.exp_dir, "val"),
        trainDir=cfg.train_dir, valDir=cfg.val_dir,
        batchSize=cfg.batch_size, cropSize=cfg.crop_sizes[cfg.mode],
        workerNum=2,
        startIter=0, totalIter=total,
        displayStep=max(1, total // 10), valStep=max(1, total),
        saveStep=max(1, total), lr0=1e-3, lr1=1e-4, weightDecay=0.0,
        gpuNum=1, debug=(cfg.mode != "full"),
    )


def _finetune_opt(cfg: MuLutConfig):
    total = cfg.ft_iter
    opt = _train_opt(cfg)
    opt.totalIter = total
    opt.batchSize = min(256, cfg.batch_size * 8)
    opt.displayStep = max(1, total // 10)
    opt.valStep = max(1, total)
    opt.startIter = 0
    return opt


def _test_opt(cfg: MuLutConfig):
    return _Opt(
        scale=cfg.scale, stages=cfg.stages, modes=cfg.modes,
        interval=cfg.interval, expDir=cfg.exp_dir, lutName="LUT_ft",
        testDir=cfg.val_dir, resultRoot=cfg.results_dir,
        loadIter=cfg.total_iter, debug=(cfg.mode != "full"),
    )


class StepTimeoutError(RuntimeError):
    """A pipeline step exceeded its wall-clock budget."""


class Pipeline:
    """Step runner with ENFORCED budgets, verification, and fallbacks.

    Budgets kill, not just flag (the reference's subprocess runner kills at
    60/300/3600 s, ref: sr/main.py:756-788):

      * default (in-process): a SIGALRM watchdog raises `StepTimeoutError`
        inside the step at its budget.  Steps share one process — and
        therefore one jit cache and one device — which is the right
        TPU-native default; the alarm interrupts the step's Python loop
        (pipeline steps iterate in Python every few tens of ms).  Only
        armed on the main thread (POSIX signal restriction).
      * `isolate=True`: each step runs in a forked subprocess with
        `join(budget)` + terminate/kill — a hard kill even for steps stuck
        inside native code, at the cost of per-step jit re-compilation
        (closest to the reference's subprocess-per-step shape).

    A timed-out step is recorded `{"timeout": true, "ok": false}`; lenient
    (quick/test) modes continue to the next step, full mode raises.
    """

    def __init__(self, cfg: MuLutConfig, *, isolate: bool = False):
        self.cfg = cfg
        self.isolate = isolate
        self.report: dict = {"mode": cfg.mode, "steps": {}}

    # -- structural verifications (ref: sr/main.py:850-1002) ---------------

    def _verify_training_output(self) -> bool:
        return bool(glob.glob(os.path.join(self.cfg.exp_dir, "Model_*.npz")))

    def _verify_lut_output(self) -> bool:
        pats = glob.glob(os.path.join(self.cfg.exp_dir, "LUT_x*.npy"))
        return len(pats) >= self.cfg.stages * len(self.cfg.modes)

    def _verify_finetuned_lut_output(self) -> bool:
        pats = glob.glob(os.path.join(self.cfg.exp_dir, "LUT_ft_*.npy"))
        return len(pats) >= self.cfg.stages * len(self.cfg.modes)

    # -- fallback artifacts (ref: sr/main.py:935-956, 1004-1025) -----------

    def _create_dummy_luts(self, name: str) -> None:
        from ..utils.lut_io import lut_filename

        cfg = self.cfg
        L = 2 ** (8 - cfg.interval) + 1
        rng = np.random.default_rng(0)
        os.makedirs(cfg.exp_dir, exist_ok=True)
        for s in range(cfg.stages):
            v = cfg.scale ** 2 if s + 1 == cfg.stages else 1
            for m in cfg.modes:
                path = os.path.join(
                    cfg.exp_dir,
                    lut_filename(name, cfg.scale, cfg.interval, s + 1, m),
                )
                np.save(
                    path,
                    rng.integers(-127, 128, (L ** 4, v), dtype=np.int64)
                    .astype(np.int8),
                )

    # -- step execution ----------------------------------------------------

    def _call_with_budget(self, fn, budget: float):
        """Run `fn()` under the budget; raise StepTimeoutError when it hits.

        Returns fn's result (also from the subprocess in isolate mode, via
        a queue — the reference's subprocess runner loses step results and
        re-scrapes logs instead, ref: sr/main.py:1178-1186).
        """
        if self.isolate:
            import multiprocessing
            import queue as queue_mod

            ctx = multiprocessing.get_context("fork")
            q = ctx.Queue()

            def _target():
                q.put(fn())

            p = ctx.Process(target=_target, daemon=True)
            p.start()
            p.join(budget)
            if p.is_alive():
                p.terminate()
                p.join(5)
                if p.is_alive():
                    p.kill()
                    p.join()
                raise StepTimeoutError(
                    f"step exceeded its {budget}s budget (subprocess killed)"
                )
            if p.exitcode != 0:
                raise RuntimeError(f"step subprocess exited {p.exitcode}")
            try:
                return q.get_nowait()
            except queue_mod.Empty:
                return None

        import signal
        import threading

        if threading.current_thread() is not threading.main_thread():
            return fn()  # SIGALRM only works on the main thread

        def _handler(signum, frame):
            raise StepTimeoutError(f"step exceeded its {budget}s budget")

        old = signal.signal(signal.SIGALRM, _handler)
        signal.setitimer(signal.ITIMER_REAL, budget)
        try:
            return fn()
        finally:
            signal.setitimer(signal.ITIMER_REAL, 0)
            signal.signal(signal.SIGALRM, old)

    def _run_step(self, name: str, fn, verify, fallback=None,
                  on_result=None) -> bool:
        budget = self.cfg.step_timeouts[self.cfg.mode]
        t0 = time.time()
        ok, err, timed_out, result = True, None, False, None
        try:
            result = self._call_with_budget(fn, budget)
        except StepTimeoutError as e:
            ok, err, timed_out = False, str(e), True
            if not self.cfg.lenient:
                raise
            traceback.print_exc()
        except Exception as e:  # noqa: BLE001 - lenient modes must survive
            ok, err = False, f"{type(e).__name__}: {e}"
            if not self.cfg.lenient:
                raise
            traceback.print_exc()
        elapsed = time.time() - t0
        if ok and on_result is not None and result is not None:
            on_result(result)
        verified = verify()
        if not verified and fallback is not None and self.cfg.lenient:
            fallback()
            verified = verify()
        self.report["steps"][name] = {
            "ok": ok, "verified": verified, "seconds": round(elapsed, 2),
            "budget": budget, "error": err,
        }
        if timed_out:
            self.report["steps"][name]["timeout"] = True
        return ok and verified

    def run_complete_evaluation(self) -> dict:
        """train -> transfer -> finetune -> test (ref: sr/main.py:1050-1102)."""
        from .evaluate import run_test
        from .finetune import finetune
        from .train import train
        from .transfer import transfer_to_luts

        cfg = self.cfg
        os.makedirs(cfg.exp_dir, exist_ok=True)
        os.makedirs(os.path.join(cfg.exp_dir, "val"), exist_ok=True)

        def _step_train():
            train(_train_opt(cfg))

        def _step_transfer():
            from ..models.torch_import import load_params_npz
            from ..utils.lut_io import lut_filename, parse_stage_key

            ckpts = sorted(glob.glob(os.path.join(cfg.exp_dir, "Model_*.npz")))
            params = load_params_npz(ckpts[-1])
            luts = transfer_to_luts(
                params, modes=cfg.modes, stages=cfg.stages, interval=cfg.interval
            )
            for key, arr in luts.items():
                stage, mode = parse_stage_key(key)
                np.save(
                    os.path.join(
                        cfg.exp_dir,
                        lut_filename("LUT", cfg.scale, cfg.interval, stage, mode),
                    ),
                    arr,
                )

        def _step_finetune():
            finetune(_finetune_opt(cfg))

        def _step_test():
            return run_test(_test_opt(cfg), datasets=("Set5",))

        self._run_step("training", _step_train, self._verify_training_output)
        self._run_step(
            "transfer", _step_transfer, self._verify_lut_output,
            fallback=lambda: self._create_dummy_luts("LUT"),
        )
        self._run_step(
            "finetune", _step_finetune, self._verify_finetuned_lut_output,
            fallback=lambda: self._create_dummy_luts("LUT_ft"),
        )
        self._run_step(
            "test", _step_test, lambda: "results" in self.report,
            on_result=lambda res: self.report.__setitem__("results", res),
        )
        return self.report


class Analyzer:
    """Artifact/log analysis (ref: sr/main.py:1104-1274)."""

    def __init__(self, cfg: MuLutConfig):
        self.cfg = cfg

    def lut_size_report(self) -> dict:
        sizes = {}
        for path in sorted(glob.glob(os.path.join(self.cfg.exp_dir, "LUT*.npy"))):
            arr = np.load(path)
            sizes[os.path.basename(path)] = {
                "shape": list(arr.shape), "dtype": str(arr.dtype),
                "kb": round(arr.nbytes / 1024, 1),
            }
        return sizes

    def scrape_psnr(self) -> dict:
        """Pull 'Dataset <name> ... PSNR: <val>' lines from run logs
        (ref: sr/main.py:1178-1186)."""
        results: dict = {}
        for log in glob.glob(os.path.join(self.cfg.exp_dir, "*.log")):
            for line in open(log, errors="ignore"):
                m = re.search(
                    r"Dataset\s+(\S+)\s*\|\s*AVG\s+(?:Val\s+|LUT\s+)?PSNR:\s*([0-9.]+)",
                    line,
                )
                if m:
                    results.setdefault(os.path.basename(log), {})[m.group(1)] = \
                        float(m.group(2))
        return results

    def analyze_results(self) -> dict:
        report = {"luts": self.lut_size_report(), "psnr": self.scrape_psnr()}
        try:  # plots are best-effort (ref: sr/main.py:1228-1251)
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt

            psnr = {
                k: v for log in report["psnr"].values() for k, v in log.items()
            }
            if psnr:
                fig, ax = plt.subplots(figsize=(6, 3))
                ax.bar(list(psnr), list(psnr.values()))
                ax.set_ylabel("PSNR (dB)")
                os.makedirs(self.cfg.results_dir, exist_ok=True)
                fig.savefig(
                    os.path.join(self.cfg.results_dir, "psnr_summary.png"),
                    bbox_inches="tight",
                )
                plt.close(fig)
        except Exception:  # noqa: BLE001
            pass
        return report


def run_evaluation(mode: str, base_dir: str = ".", *, synthetic: bool = True,
                   **cfg_kw) -> dict:
    """End-to-end preset runner (ref: sr/main.py:1303-1365).

    With `synthetic=True` (default — no egress in this environment) a
    hermetic dataset tree is fabricated first when the data dirs are absent.
    """
    cfg = MuLutConfig(base_dir=base_dir, mode=mode, **cfg_kw)
    if synthetic and not os.path.isdir(os.path.join(cfg.train_dir, "HR")):
        from ..data.synthetic import create_synthetic_dataset

        create_synthetic_dataset(cfg.data_dir, scales=(cfg.scale,))

    pipeline = Pipeline(cfg)
    report = pipeline.run_complete_evaluation()
    report["analysis"] = Analyzer(cfg).analyze_results()
    out = os.path.join(cfg.base_dir, f"evaluation_{mode}.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=2, default=str)
    return report


def quick_evaluation(base_dir: str = ".", **kw) -> dict:
    return run_evaluation("quick", base_dir, **kw)


def test_evaluation(base_dir: str = ".", **kw) -> dict:
    return run_evaluation("test", base_dir, **kw)


def full_evaluation(base_dir: str = ".", **kw) -> dict:
    return run_evaluation("full", base_dir, **kw)
