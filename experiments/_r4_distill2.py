"""r4: image-space distillation fine-tune of the per-unit mxu students.

Stage 2 of VERDICT r3 Next #1: per-unit domain distillation landed the mxu
students at Set5 30.323 (d2) / 30.385 (d3) vs the dense teacher's 30.592
(experiments/_r4_distill.py).  This pass fine-tunes the COMPOSED student
cascade onto the frozen dense cascade's outputs over synthetic natural-ish
crops (pipelines/distill.distill_finetune_cascade) — aligning the students
on the statistics the composition actually sees — then re-scores real Set5
and saves the fine-tuned artifacts.

Run on the chip:  python experiments/_r4_distill2.py [--iters 3000]
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
    p.add_argument("--iters", type=int, default=3000)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--crop", type=int, default=48)
    p.add_argument("--lr0", type=float, default=2e-4)
    p.add_argument("--nf", type=int, default=128)
    p.add_argument("--depths", type=int, nargs="+", default=[2, 3])
    p.add_argument("--sigma", type=float, default=0.0)
    p.add_argument("--real", action="store_true",
                   help="mix crops from the shipped real DIV2K LR training "
                        "image (data/DIV2K/LR/X4/0001x4.png — training "
                        "side, never a test image) into the input pool; "
                        "the synthetic-only pass measured NEGATIVE on "
                        "Set5 (30.323 -> 30.269)")
    p.add_argument("--extra-weight", type=float, default=0.7)
    p.add_argument("--suffix", type=str, default="_ft")
    p.add_argument("--src-suffix", type=str, default="")
    args = p.parse_args()

    lab.setup()
    from Test import run_benchmark

    from mulut_tpu.models.torch_import import (
        load_params_npz,
        save_params_npz,
        srnets_params_from_torch,
    )
    from mulut_tpu.pipelines.distill import distill_finetune_cascade
    from mulut_tpu.pipelines.evaluate import NetEvaluator

    dense = srnets_params_from_torch(CKPT, modes="sdy", stages=2)
    extra = None
    if args.real:
        from mulut_tpu.utils import load_image

        extra = [load_image(
            "/root/reference/data/DIV2K/LR/X4/0001x4.png")]
    results = {}
    for depth in args.depths:
        tag = f"mxu-nf{args.nf}-d{depth}"
        src = os.path.join(
            ART,
            f"mxu_distilled_x4sdy_nf{args.nf}_d{depth}{args.src_suffix}.npz")
        students = load_params_npz(src)
        print(f"== e2e fine-tune {tag} ({args.iters} iters, "
              f"real={args.real}) ==", flush=True)
        students, losses = distill_finetune_cascade(
            students, dense, modes="sdy", stages=2, scale=4,
            iters=args.iters, batch=args.batch, crop=args.crop,
            lr0=args.lr0, sigma=args.sigma, extra_images=extra,
            extra_weight=args.extra_weight, verbose=True,
        )
        dst = src.replace(args.src_suffix + ".npz", args.suffix + ".npz") \
            if args.src_suffix else src.replace(".npz", args.suffix + ".npz")
        save_params_npz(dst, {k: {n: np.asarray(a) for n, a in u.items()}
                              for k, u in students.items()})
        print(f"saved {dst}", flush=True)
        ev = NetEvaluator(students, stages=2, modes="sdy", scale=4,
                          fast=True)
        print(f"== {tag} after e2e fine-tune ==", flush=True)
        results[tag + args.suffix] = run_benchmark(ev, BENCH, ["Set5"])
        results[tag + "-loss"] = {
            "first": round(losses[0], 6),
            "last": round(float(np.mean(losses[-50:])), 6),
        }

    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
