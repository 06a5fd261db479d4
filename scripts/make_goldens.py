"""Generate the committed golden artifacts for tests/test_goldens.py.

Runs the deterministic toy pipeline (tests/golden_pipeline.py) under the
EXACT test backend (CPU, 8 virtual devices) and copies the per-uid artifact
tree + mesh stats into tests/data/goldens/. Re-run ONLY when an intentional
behavior change moves the artifacts; the diff then documents the shift.

Usage: python scripts/make_goldens.py
"""
import os
import shutil
import sys

# replicate tests/conftest.py BEFORE jax import
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, repo)
sys.path.insert(0, os.path.join(repo, "tests"))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
assert jax.devices()[0].platform == "cpu" and len(jax.devices()) == 8


def main():
    import json
    import tempfile

    import golden_pipeline as gp

    with tempfile.TemporaryDirectory() as root:
        paths = gp.run_toy_pipeline(root)
        stats = gp.mesh_stats(paths)
        dst = os.path.join(gp.GOLDENS_ROOT, gp.GOLDEN_UID)
        if os.path.isdir(dst):
            shutil.rmtree(dst)
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        shutil.copytree(os.path.join(root, gp.GOLDEN_UID), dst)
        # checkpoints/train logs are run-state, not artifacts — keep lean
        import glob
        for ck in ([os.path.join(dst, "mesh", "ckpt")]
                   + glob.glob(os.path.join(dst, "mesh", "logs_*"))):
            if os.path.isdir(ck):
                shutil.rmtree(ck)
        with open(os.path.join(os.path.dirname(dst), "..", "stats.json"),
                  "w") as f:
            json.dump({"mesh": stats}, f, indent=2, sort_keys=True)
    print(f"goldens written to {dst}")
    n = sum(len(fs) for _, _, fs in os.walk(dst))
    sz = sum(os.path.getsize(os.path.join(d, x))
             for d, _, fs in os.walk(dst) for x in fs)
    print(f"{n} files, {sz / 1e6:.2f} MB")


if __name__ == "__main__":
    main()
