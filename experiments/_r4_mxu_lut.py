"""r4: the distilled mxu students through steps 2+4 (LUT transfer + eval).

VERDICT r3 Next #8 — the LUT-transfer contract is architecture-blind
(4 taps in -> v lanes out), so a distilled-mxu -> transfer -> eval chain
must land within the dense arch's own 4-bit LUT quantization gap.  This
script caches dense and mxu params into int8 LUT artifacts
(pipelines/transfer.transfer_to_luts — identical file format to the
reference's step 2) and scores the LUT-retrieval path on real Set5 next
to each net's own score.

Reference anchor: the dense checkpoint's cached-LUT (pre-finetune) score
is 30.52 (models/sr_x2sdy/lutft.log "Iter 1 | Set5 | 30.52"); the shipped
fine-tuned LUTs score 30.61.

Run on the chip:  python experiments/_r4_mxu_lut.py
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "sr"))

from mulut_tpu.utils import lab

CKPT = "/root/reference/models/sr_x2sdy/Model_200000.pth"
BENCH = "/root/reference/data/SRBenchmark"
ART = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                   "artifacts")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--students", nargs="+",
                   default=["mxu_distilled_x4sdy_nf128_d2.npz",
                            "mxu_distilled_x4sdy_nf128_d3.npz"])
    args = p.parse_args()

    lab.setup()
    from Test import run_benchmark

    from mulut_tpu.models.torch_import import (
        load_params_npz,
        srnets_params_from_torch,
    )
    from mulut_tpu.pipelines.evaluate import LutEvaluator
    from mulut_tpu.pipelines.transfer import transfer_to_luts

    cases = [("dense", srnets_params_from_torch(CKPT, modes="sdy", stages=2))]
    for name in args.students:
        cases.append((name.replace(".npz", ""),
                      load_params_npz(os.path.join(ART, name))))

    results = {}
    for tag, params in cases:
        print(f"== transfer {tag} -> LUTs, eval Set5 ==", flush=True)
        luts = transfer_to_luts(params, modes="sdy", stages=2, interval=4)
        ev = LutEvaluator(luts, stages=2, modes="sdy", scale=4, bucket=128)
        results[tag + "-lut"] = run_benchmark(ev, BENCH, ["Set5"])

    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
