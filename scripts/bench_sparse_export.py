"""A/B the mc512 export grid eval: dense slabs vs surface-band sparse
(pipelines/stage2_recon.py::eval_sdf_grid_sparse). Random sphere-init
params — index traffic is param-independent; the sphere's active-block
count is the lower end of a character's, so the sparse win is reported
with the active fraction for honesty."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from drawingspinup_tpu.core import jax_setup
jax_setup.setup()
import jax, numpy as np
from drawingspinup_tpu.pipelines import stage2_recon as s2
from drawingspinup_tpu.train import nsr

cfg = nsr.NSRConfig()
import dataclasses
grid = dataclasses.replace(cfg.sdf.grid, table_dtype="bfloat16")
cfg = dataclasses.replace(cfg, sdf=dataclasses.replace(cfg.sdf, grid=grid))
state = nsr.init_state(cfg, jax.random.PRNGKey(0))
vmin = np.array([-0.75, -0.95, -0.45], np.float32)  # character-ish bbox
vmax = np.array([0.75, 0.95, 0.45], np.float32)
R = 512
step = cfg.max_steps

for rep in range(2):
    t0 = time.time()
    dense = s2.eval_sdf_grid(cfg, state.params, vmin, vmax, R, step=step)
    t_dense = time.time() - t0
    t0 = time.time()
    sparse = s2.eval_sdf_grid_sparse(cfg, state.params, vmin, vmax, R, step=step)
    t_sparse = time.time() - t0
    same_sign = np.array_equal(sparse <= 0, dense <= 0)
    print(f"rep{rep}: dense {t_dense:.1f}s  sparse {t_sparse:.1f}s  "
          f"sign-equal={same_sign}")
nb = R // 4
blk = np.abs(dense).reshape(nb,4,nb,4,nb,4).min(axis=(1,3,5))
cell = float(np.max((vmax - vmin) / nb))
print(f"active fraction: {(blk < 2*cell).mean():.3%}")
