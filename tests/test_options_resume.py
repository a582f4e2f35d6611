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


def test_protected_tree_never_written(tmp_path, monkeypatch):
    """Parsing with an expDir inside a protected tree (e.g. the read-only
    reference checkout) must not write code/opt/val snapshots there."""
    from mulut_tpu.utils import options as O

    protected = tmp_path / "reference" / "models" / "sr_x2sdy"
    os.makedirs(protected)
    monkeypatch.setattr(
        O, "PROTECTED_ROOTS", (str(tmp_path / "reference"),)
    )

    O.TestOptions().parse(["-e", str(protected)])
    assert os.listdir(protected) == []  # no code/ snapshot

    O.TrainOptions().parse(["-e", str(protected)])
    assert os.listdir(protected) == []  # no opt.*, no val/

    # a normal expDir still gets the snapshot
    normal = tmp_path / "exp"
    O.TestOptions().parse(["-e", str(normal)])
    assert os.path.isdir(normal / "code")


def test_parse_stage_key():
    import pytest

    from mulut_tpu.utils.lut_io import parse_stage_key

    assert parse_stage_key("s1_s") == (1, "s")
    assert parse_stage_key("s12_y") == (12, "y")  # stages >= 10
    with pytest.raises(ValueError):
        parse_stage_key("weight_s1_s")


def test_lut_io_accepts_both_bit_labels(tmp_path):
    """interval != 4: the producer writes {interval}bit, the reference
    consumer looks for {8-interval}bit — load_luts must find either."""
    from mulut_tpu.utils.lut_io import load_luts, save_lut

    rng = np.random.default_rng(0)
    L = 2 ** (8 - 3) + 1
    for s, v in ((1, 1), (2, 4)):
        save_lut(str(tmp_path), rng.integers(-127, 128, (L ** 4, v)),
                 name="LUT", scale=2, interval=3, stage=s, mode="s")
    luts = load_luts(str(tmp_path), stages=2, modes="s", scale=2, interval=3,
                     name="LUT")
    assert luts["s1_s"].shape == (L ** 4, 1)
    assert luts["s2_s"].shape == (L ** 4, 4)


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


def test_op_breakdown_parses_trace(tmp_path):
    """op_breakdown aggregates device op durations from a perfetto trace."""
    import gzip
    import json
    import os

    from mulut_tpu.utils.profiling import op_breakdown

    d = tmp_path / "plugins" / "profile" / "2026_01_01"
    os.makedirs(d)
    events = [
        {"ph": "X", "name": "fusion.1", "dur": 1500,
         "args": {"hlo_category": "loop fusion", "long_name": "%fusion.1"}},
        {"ph": "X", "name": "fusion.1", "dur": 500,
         "args": {"hlo_category": "loop fusion", "long_name": "%fusion.1"}},
        {"ph": "X", "name": "copy.2", "dur": 800,
         "args": {"hlo_category": "data formatting", "long_name": "%copy.2"}},
        {"ph": "X", "name": "host thing", "dur": 9999, "args": {}},  # skipped
    ]
    with gzip.open(d / "vm.trace.json.gz", "wt") as f:
        json.dump({"traceEvents": events}, f)
    rows = op_breakdown(str(tmp_path))
    assert rows[0][:2] == (2.0, "fusion.1")
    assert rows[1][:2] == (0.8, "copy.2")
    assert op_breakdown(str(tmp_path / "nope")) == []
