"""Decompose the export grid phase (isosurface_level at mc512) on chip:
bbox coarse eval / bounds / sparse coarse / band select+fill / fine
launches / scatter. DSU_PROFILE_EXPORT=1 substep prints + total, twice
(second rep is program-resident)."""
import os, sys, time
os.environ["DSU_PROFILE_EXPORT"] = "1"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from drawingspinup_tpu.core import jax_setup
jax_setup.setup()
import dataclasses
import jax, numpy as np
from drawingspinup_tpu.pipelines import stage2_recon as s2
from drawingspinup_tpu.train import nsr

cfg = nsr.NSRConfig()
grid = dataclasses.replace(cfg.sdf.grid, table_dtype="bfloat16")
cfg = dataclasses.replace(cfg, sdf=dataclasses.replace(cfg.sdf, grid=grid))
state = nsr.init_state(cfg, jax.random.PRNGKey(0))
for rep in range(2):
    t0 = time.time()
    level, vmin, vmax = s2.isosurface_level(cfg, state.params,
                                            resolution=512,
                                            step=cfg.max_steps)
    print(f"rep{rep}: isosurface_level total {time.time()-t0:.1f}s  "
          f"bbox={vmin.round(2)}..{vmax.round(2)}", flush=True)
