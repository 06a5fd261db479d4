"""A/B: vmapped multi-uid NSR train step vs sequential single-uid steps.

PERF_NOTES r1 deprioritized this on scatter-target-size grounds; VERDICT r1
asks for the measurement. U uids share one launch: real work ×U, fixed
overhead ×1. Reported: ms/step-per-uid at n_active=6 (the most expensive
phase), U ∈ {1, 2, 4}.
"""
import os, sys, time, dataclasses
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))
from drawingspinup_tpu.core import jax_setup
jax_setup.setup()
import jax, jax.numpy as jnp, numpy as np
from functools import partial
from drawingspinup_tpu.train import nsr
from bench_nsr import make_sphere_dataset

N_ACTIVE = 6

def bf16(cfg):
    grid = dataclasses.replace(cfg.sdf.grid, table_dtype="bfloat16")
    return dataclasses.replace(cfg, sdf=dataclasses.replace(cfg.sdf, grid=grid))

cfg = bf16(nsr.NSRConfig())
tx = nsr.make_optimizer(cfg)
data = make_sphere_dataset(size=1024)

def stack_tree(tree, U):
    return jax.tree_util.tree_map(lambda a: jnp.stack([a] * U), tree)

@partial(jax.jit, static_argnames=("U",))
def batched_step(states, datas, keys, U):
    def one(state, data, key):
        return nsr.train_step.__wrapped__(cfg, tx, state, data, key,
                                          n_active=N_ACTIVE)
    return jax.vmap(one)(states, datas, keys)

def sync(logs):
    return float(np.asarray(jax.tree_util.tree_leaves(logs)[0]).ravel()[0])

results = {}
for U in (1, 2, 4):
    state = nsr.init_state(cfg, jax.random.PRNGKey(0))
    states = stack_tree(state, U)
    datas = stack_tree(data, U)
    key = jax.random.PRNGKey(1)
    keys = jax.random.split(key, U)
    t_c0 = time.time()
    states, logs = batched_step(states, datas, keys, U)
    sync(logs)
    compile_s = time.time() - t_c0
    # warm
    for i in range(3):
        states, logs = batched_step(states, datas, jax.random.split(jax.random.fold_in(key, i), U), U)
    sync(logs)
    best = 1e9
    for rep in range(2):
        t0 = time.time()
        n = 10
        for i in range(n):
            states, logs = batched_step(states, datas, jax.random.split(jax.random.fold_in(key, 100+rep*n+i), U), U)
        sync(logs)
        best = min(best, (time.time() - t0) / n)
    per_uid = best * 1000 / U
    results[U] = per_uid
    print(f"U={U}: {best*1000:7.1f} ms/step  {per_uid:7.1f} ms/uid  (compile {compile_s:.0f}s)")
print({u: round(v,1) for u,v in results.items()})
