"""Recon-stage-only timing at production budget on synthetic sphere mv
views: two uids back-to-back in one process so the second uid is the
warm/marginal number. Prints recon_uid's per-phase breakdown (data/ckpt/
grid/march/save) — the numbers the export-tail roadmap needs.

Usage: python scripts/profile_recon_stage.py [--root DIR] [--uids N]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

from drawingspinup_tpu.core import jax_setup

jax_setup.setup()

import numpy as np

from drawingspinup_tpu.core import UidPaths
from drawingspinup_tpu.core.io import write_image


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/recon_prof_root")
    ap.add_argument("--uids", type=int, default=2)
    args = ap.parse_args()

    from test_stage2_pipeline import write_sphere_mv

    uids = [f"prof{i}" for i in range(args.uids)]
    uid_file = os.path.join(args.root, "uids.txt")
    os.makedirs(args.root, exist_ok=True)
    with open(uid_file, "w") as f:
        f.write("\n".join(uids))

    from drawingspinup_tpu.cli import recon as recon_cli

    for uid in uids:
        paths = UidPaths(args.root, uid)
        write_sphere_mv(args.root, uid, size=1024)
        # drawing mask for carving/color-bp parity with the e2e path
        yy, xx = np.mgrid[0:512, 0:512]
        body = np.hypot(yy - 256, xx - 256) < 190
        os.makedirs(os.path.dirname(paths.mask), exist_ok=True)
        write_image(paths.mask, body.astype(np.float32))

        t0 = time.time()
        recon_cli.main(["--uid", uid, "--root", args.root,
                        f"dataset.uid_list_file={uid_file}"])
        print(f"### [{uid}] recon stage total: {time.time() - t0:.1f}s",
              flush=True)


if __name__ == "__main__":
    main()
