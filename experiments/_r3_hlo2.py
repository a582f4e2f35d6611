import functools, re
import numpy as np
import jax
import jax.numpy as jnp
from mulut_tpu.ops.ensemble import prepare_expanded_luts_cached
import importlib.util, sys
sys.argv = ["_r3_tail.py", "--asmodule"]
spec = importlib.util.spec_from_file_location("r3tail", "/root/repo/_r3_tail.py")
t = importlib.util.module_from_spec(spec)
# prevent __main__ block from running: exec with __name__ set by loader (it is 'r3tail') -> safe
spec.loader.exec_module(t)

scale, stages, modes, interval = 4, 2, "sdy", 4
rng = np.random.default_rng(0)
luts = {}
for s in range(stages):
    v = scale * scale if s + 1 == stages else 1
    for m in modes:
        luts[f"s{s + 1}_{m}"] = np.load(
            "/root/reference/models/sr_x2sdy/"
            f"LUT_ft_x4_4bit_int8_s{s + 1}_{m}.npy").reshape(-1, v).astype(np.int8)
tabs = prepare_expanded_luts_cached(luts, interval=interval)
img = jnp.zeros((8, 3, 270, 480), jnp.int32)
run = jax.jit(functools.partial(t.cascade_tail_kernel, stages=2, modes=modes,
                                scale=scale, interval=interval))
txt = run.lower(tabs, img).compile().as_text()
open("/tmp/r3_tail.hlo", "w").write(txt)
print("len", len(txt))
