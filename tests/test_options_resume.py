"""Config persistence + checkpoint/resume behavior.

The reference's --startIter resume is broken (two-positional-arg torch.load,
SURVEY.md §2.4.14); ours must actually work.  Options must round-trip through
opt.pkl (ref: common/option.py:66-90).
"""

import os

import jax
import numpy as np


def test_options_roundtrip_and_exp_dir(tmp_path):
    from mulut_tpu.utils.options import TrainOptions

    exp = str(tmp_path / "exp1")
    inst = TrainOptions()
    opt = inst.parse(["-e", exp, "--batchSize", "7", "--modes", "sd",
                      "--debug"])
    assert opt.batchSize == 7 and opt.modes == "sd"
    # debug rewrites step counts (ref: common/option.py:147-151)
    assert opt.totalIter == 200 and opt.valStep == 50
    assert os.path.isfile(os.path.join(exp, "opt.pkl"))
    assert os.path.isfile(os.path.join(exp, "opt.txt"))

    # --load_from_opt_file restores saved values over defaults
    inst2 = TrainOptions()
    opt2 = inst2.parse(["-e", exp, "--load_from_opt_file", "--debug"])
    assert opt2.batchSize == 7 and opt2.modes == "sd"


def test_auto_numbered_exp_dir(tmp_path, monkeypatch):
    from mulut_tpu.utils.options import TestOptions

    inst = TestOptions()
    opt = inst.parse(["--modelRoot", str(tmp_path), "--debug"])
    assert opt.expDir.endswith("expr_1")
    opt2 = TestOptions().parse(["--modelRoot", str(tmp_path), "--debug"])
    assert opt2.expDir.endswith("expr_2")


def test_checkpoint_roundtrip(tmp_path):
    from mulut_tpu.models.srnet import init_srnets
    from mulut_tpu.models.torch_import import load_params_npz, save_params_npz

    params = init_srnets(jax.random.PRNGKey(1), nf=4, scale=2, modes="sd",
                         stages=2)
    path = str(tmp_path / "Model_000010.npz")
    save_params_npz(path, params)
    loaded = load_params_npz(path)
    assert sorted(loaded) == sorted(params)
    for k in params:
        for name in params[k]:
            np.testing.assert_array_equal(
                np.asarray(params[k][name]), np.asarray(loaded[k][name])
            )
