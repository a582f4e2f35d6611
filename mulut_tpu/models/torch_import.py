"""Convert reference PyTorch checkpoints into mulut_tpu parameter pytrees.

The reference saves whole-model pickles (ref: sr/1_train_model.py:63-64),
whose unpickling requires the classes `model.SRNets`, `common.network.*` to
exist.  We register minimal stub classes under those module names — enough
for pickle to restore instance state — then read the state_dict.  No
reference code is imported or executed.

State-dict layout (measured from models/sr_x2sdy/Model_200000.pth):
  s{stage}_{mode}.model.conv1.conv.{weight,bias}    head conv (nf,1,K,K)
  s{stage}_{mode}.model.conv{2..5}.conv1.conv.*     dense 1x1 convs
  s{stage}_{mode}.model.conv6.conv.*                output 1x1 conv

Mapping to the tap-MLP layout (see models/blocks.py): the head conv's K*K
(or 1x4) kernel entries are exactly the four tap weights in (a, b, c, d)
order for every mode geometry, so conv weights flatten/transpose into dense
matrices with no numerical change.
"""

from __future__ import annotations

import sys
import types

import jax.numpy as jnp
import numpy as np


def _install_stub_modules():
    import torch.nn as nn

    class _Stub(nn.Module):
        pass

    names = ["SRNets", "SRNet", "MuLUT", "MuLUTUnit", "MuLUTcUnit", "DenseConv",
             "Conv", "ActConv", "DNNet", "DMNet", "DNNets", "DMNets"]
    for mod_name in ["model", "common", "common.network"]:
        if mod_name not in sys.modules:
            sys.modules[mod_name] = types.ModuleType(mod_name)
        for cls in names:
            if not hasattr(sys.modules[mod_name], cls):
                setattr(sys.modules[mod_name], cls, type(cls, (_Stub,), {}))


def load_torch_state_dict(path: str) -> dict:
    """Load a reference .pth (whole-model pickle or state_dict) -> ndarray dict."""
    import torch

    _install_stub_modules()
    obj = torch.load(path, map_location="cpu", weights_only=False)
    state = obj if isinstance(obj, dict) else obj.state_dict()
    return {k: v.detach().numpy() for k, v in state.items()}


def _unit_from_state(state: dict, prefix: str) -> dict:
    """One MuLUT unit's tap-MLP params from torch conv tensors."""
    params = {}
    w1 = state[f"{prefix}.conv1.conv.weight"]  # (nf, 1, kh, kw)
    params["w1"] = jnp.asarray(w1.reshape(w1.shape[0], -1).T)  # (4, nf)
    params["b1"] = jnp.asarray(state[f"{prefix}.conv1.conv.bias"])
    for i in range(2, 6):
        dense_key = f"{prefix}.conv{i}.conv1.conv"
        plain_key = f"{prefix}.conv{i}.conv"
        key = dense_key if f"{dense_key}.weight" in state else plain_key
        w = state[f"{key}.weight"]  # (out, in, 1, 1)
        params[f"w{i}"] = jnp.asarray(w.reshape(w.shape[0], w.shape[1]).T)
        params[f"b{i}"] = jnp.asarray(state[f"{key}.bias"])
    w6 = state[f"{prefix}.conv6.conv.weight"]
    params["w6"] = jnp.asarray(w6.reshape(w6.shape[0], w6.shape[1]).T)
    params["b6"] = jnp.asarray(state[f"{prefix}.conv6.conv.bias"])
    return params


def srnets_params_from_torch(path: str, *, modes: str = "sdy",
                             stages: int = 2) -> dict:
    """Reference SRNets checkpoint -> mulut_tpu srnets params pytree."""
    state = load_torch_state_dict(path)
    params = {}
    for s in range(stages):
        for mode in modes:
            key = f"s{s + 1}_{mode}"
            params[key] = _unit_from_state(state, f"{key}.model")
    return params


def save_params_npz(path: str, params: dict) -> None:
    flat = {}
    for unit_key, unit in params.items():
        for name, arr in unit.items():
            flat[f"{unit_key}/{name}"] = np.asarray(arr)
    np.savez(path, **flat)


def load_params_npz(path: str) -> dict:
    flat = np.load(path)
    params: dict = {}
    for k in flat.files:
        unit_key, name = k.split("/")
        params.setdefault(unit_key, {})[name] = jnp.asarray(flat[k])
    return params


def save_opt_state_npz(path: str, opt_state) -> None:
    """Persist an optax optimizer state (any pytree of arrays).

    Completes the reference's abandoned intent — its optimizer save is
    commented out (ref: sr/1_train_model.py:65-66) and its resume is broken
    (ref: sr/1_train_model.py:157-164) — so a resumed run here keeps the
    Adam moments AND the step counts that drive the cosine-LR phase.
    """
    import jax

    leaves = jax.tree_util.tree_leaves(opt_state)
    np.savez(path, **{f"leaf_{i}": np.asarray(a) for i, a in enumerate(leaves)})


def load_opt_state_npz(path: str, template):
    """Restore an optimizer state saved by `save_opt_state_npz`.

    `template` is a freshly-initialized state from the SAME optimizer
    config (e.g. `optimizer.init(params)`) — it supplies the treedef; the
    file supplies the leaves.
    """
    import jax

    flat = np.load(path)
    treedef = jax.tree_util.tree_structure(template)
    n = treedef.num_leaves
    assert len(flat.files) == n, (
        f"optimizer-state leaf count mismatch: file has {len(flat.files)}, "
        f"optimizer expects {n} — was the optimizer config changed?"
    )
    leaves = [jnp.asarray(flat[f"leaf_{i}"]) for i in range(n)]
    return jax.tree_util.tree_unflatten(treedef, leaves)
