"""r4: distill the reference checkpoint into mxu units; score real Set5.

VERDICT r3 Next #1 — the mxu deployment arch's quality story was synthetic
only.  This script converts the shipped dense checkpoint
(/root/reference/models/sr_x2sdy/Model_200000.pth) into mxu weights by
per-unit domain distillation (pipelines/distill.py), saves them as npz
artifacts, and scores them on real Set5 through the SAME evaluator path a
deployment would use (NetEvaluator fast=True — the Pallas stage-ensemble
kernel), against the dense teacher's own scores.

Run on the chip:  python experiments/_r4_distill.py [--iters 6000]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "sr"))

import numpy as np

from mulut_tpu.utils import lab

CKPT = "/root/reference/models/sr_x2sdy/Model_200000.pth"
BENCH = "/root/reference/data/SRBenchmark"
ART = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                   "artifacts")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=6000)
    p.add_argument("--batch", type=int, default=65536)
    p.add_argument("--nf", type=int, default=128)
    p.add_argument("--depths", type=int, nargs="+", default=[2, 3])
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--skip-teacher", action="store_true")
    args = p.parse_args()

    lab.setup()
    from Test import run_benchmark

    from mulut_tpu.models.torch_import import (
        save_params_npz,
        srnets_params_from_torch,
    )
    from mulut_tpu.pipelines.distill import distill_srnets
    from mulut_tpu.pipelines.evaluate import NetEvaluator

    dense = srnets_params_from_torch(CKPT, modes="sdy", stages=2)
    os.makedirs(ART, exist_ok=True)
    results = {}

    if not args.skip_teacher:
        ev = NetEvaluator(dense, stages=2, modes="sdy", scale=4, fast=True)
        print("== dense teacher (fast/bf16 kernel) ==", flush=True)
        results["dense-fast"] = run_benchmark(ev, BENCH, ["Set5"])

    for depth in args.depths:
        tag = f"mxu-nf{args.nf}-d{depth}"
        print(f"== distilling {tag} ({args.iters} iters) ==", flush=True)
        students, metrics = distill_srnets(
            dense, modes="sdy", stages=2, scale=4, nf=args.nf,
            depth=depth, iters=args.iters, batch=args.batch,
            seed=args.seed, verbose=True,
        )
        path = os.path.join(ART, f"mxu_distilled_x4sdy_nf{args.nf}_d{depth}.npz")
        save_params_npz(path, {k: {n: np.asarray(a) for n, a in u.items()}
                               for k, u in students.items()})
        print(f"saved {path}", flush=True)
        ev = NetEvaluator(students, stages=2, modes="sdy", scale=4,
                          fast=True)
        print(f"== {tag} distilled (fast/bf16 kernel) ==", flush=True)
        results[tag] = run_benchmark(ev, BENCH, ["Set5"])
        results[tag + "-lattice"] = {
            k: round(m["lattice_max_levels"], 2) for k, m in metrics.items()
        }

    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
