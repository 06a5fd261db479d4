"""Synthetic test-data builders, re-exported for reuse (uid datasets, sphere
multi-view renders, rigged FBX files)."""
from test_fbx_render import bar_mesh, make_rig_fbx
from test_nsr import make_sphere_dataset
from drawingspinup_tpu.utils.synthetic import write_sphere_mv
from test_stage3 import make_synthetic_keyframe

__all__ = ["bar_mesh", "make_rig_fbx", "make_sphere_dataset",
           "write_sphere_mv", "make_synthetic_keyframe"]
