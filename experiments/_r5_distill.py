"""r5: quality frontier — distill configs aimed at beating dense on BOTH
axes (VERDICT r4 Next #3: Set5 >= 30.55 at > 232 full-color MPix/s).

Candidates (the r4 recipe scales with capacity: nf128 30.42, nf256-d2
30.495; dense teacher 30.592 @ 231.6 MPix/s):
  * nf256-d23: stage-1 d2 + stage-2 d3 (per-stage depth) — the extra
    layer goes where the hardest unit lives (s2_s, PERF.md); stage-1 is
    REUSED from the shipped nf256-d2 domain artifact, only the three
    stage-2 units are distilled fresh.
  * nf256-d2-x: the shipped nf256-d2 chain continued with a THIRD e2e
    pass at lr 2e-5 (the r4 ladder stopped at two).

Each candidate runs the measured three-stage recipe: [domain distill] ->
e2e pass(es) over 70-80% real crops of the one shipped DIV2K LR training
image + rigid aug -> Set5 score after each stage; artifacts saved with
explicit suffixes and the deploy speed measured through the r5
window/rs kernel.

Run:  python experiments/_r5_distill.py [--candidates nf256-d23 nf256-d2-x]
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
REAL_LR = "/root/reference/data/DIV2K/LR/X4/0001x4.png"
ART = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                   "artifacts")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--candidates", nargs="+",
                   default=["nf256-d23", "nf256-d2-x"])
    p.add_argument("--iters", type=int, default=6000)
    p.add_argument("--e2e-iters", type=int, default=3000)
    p.add_argument("--skip-speed", action="store_true")
    p.add_argument("--batch", type=int, default=65536)
    p.add_argument("--cpu", action="store_true",
                   help="smoke mode: tiny shapes, no artifact writes")
    args = p.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    lab.setup()
    import jax
    import jax.numpy as jnp

    from Test import run_benchmark

    from mulut_tpu.models.torch_import import (
        load_params_npz,
        save_params_npz,
        srnets_params_from_torch,
    )
    from mulut_tpu.pipelines.distill import (
        distill_finetune_cascade,
        distill_unit,
    )
    from mulut_tpu.pipelines.evaluate import NetEvaluator
    from mulut_tpu.utils import load_image

    dense = srnets_params_from_torch(CKPT, modes="sdy", stages=2)
    real = [load_image(REAL_LR)]
    results = {}

    def score(tag, students):
        if args.cpu:
            print(f"[cpu-smoke] skip Set5 score {tag}", flush=True)
            return
        ev = NetEvaluator(students, stages=2, modes="sdy", scale=4,
                          fast=True)
        print(f"== {tag} ==", flush=True)
        results[tag] = run_benchmark(ev, BENCH, ["Set5"])

    def save(name, students):
        if args.cpu:
            print(f"[cpu-smoke] skip save {name}", flush=True)
            return
        save_params_npz(
            os.path.join(ART, name),
            {k: {n: np.asarray(a) for n, a in u.items()}
             for k, u in students.items()})
        print(f"saved artifacts/{name}", flush=True)

    def e2e(students, *, lr0, extra_weight, iters, seed=0):
        out, _ = distill_finetune_cascade(
            students, dense, modes="sdy", stages=2, scale=4,
            iters=iters, batch=16, crop=48, lr0=lr0,
            extra_images=real, extra_weight=extra_weight, seed=seed,
            verbose=True)
        return out

    def speed(tag, students):
        ev = NetEvaluator(students, stages=2, modes="sdy", scale=4,
                          fast=True)
        ev._build_yuv()
        rng = np.random.default_rng(0)
        rgb = jnp.asarray(rng.integers(0, 256, (8, 270, 480, 3),
                                       dtype=np.uint8))
        ev._yuv_run(rgb)
        dt = lab.device_time(lambda: ev._yuv_run(rgb), n=6)
        results[tag + "/speed"] = {
            "ms": round(dt * 1e3, 1),
            "MPix/s": round(8 * 270 * 480 * 16 / dt / 1e6, 1)}
        print(results[tag + "/speed"], flush=True)

    for cand in args.candidates:
        if cand == "nf256-d23":
            base = load_params_npz(
                os.path.join(ART, "mxu_distilled_x4sdy_nf256_d2.npz"))
            students = {k: v for k, v in base.items()
                        if k.startswith("s1_")}
            key = jax.random.PRNGKey(23)
            for m in "sdy":
                key, sub = jax.random.split(key)
                print(f"distilling s2_{m} (nf256 d3) ...", flush=True)
                students[f"s2_{m}"], met = distill_unit(
                    sub, dense[f"s2_{m}"], nf=256, depth=3, upscale=4,
                    iters=args.iters, batch=args.batch,
                    log_every=max(1, args.iters // 3))
                print(f"  s2_{m}: lattice mse {met['lattice_mse']:.3e} "
                      f"max {met['lattice_max_levels']:.1f} levels",
                      flush=True)
            save("mxu_distilled_x4sdy_nf256_d23.npz", students)
            score("nf256-d23/domain", students)
            students = e2e(students, lr0=1e-4, extra_weight=0.7,
                           iters=args.e2e_iters)
            save("mxu_distilled_x4sdy_nf256_d23_ftr.npz", students)
            score("nf256-d23/ftr", students)
            students = e2e(students, lr0=5e-5, extra_weight=0.8,
                           iters=args.e2e_iters)
            save("mxu_distilled_x4sdy_nf256_d23_ftr2.npz", students)
            score("nf256-d23/ftr2", students)
            if not args.skip_speed:
                speed("nf256-d23", students)
        elif cand == "nf256-d2-x":
            students = load_params_npz(
                os.path.join(ART, "mxu_distilled_x4sdy_nf256_d2_ftr2.npz"))
            students = e2e(students, lr0=2e-5, extra_weight=0.8,
                           iters=args.e2e_iters, seed=3)
            save("mxu_distilled_x4sdy_nf256_d2_ftr3.npz", students)
            score("nf256-d2-x/ftr3", students)
            if not args.skip_speed:
                speed("nf256-d2-x", students)
        else:
            print(f"unknown candidate {cand}", flush=True)

    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
