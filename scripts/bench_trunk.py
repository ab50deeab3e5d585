#!/usr/bin/env python
"""A/B bench: stage-1 ViT-L trunk forward, fp32 vs bfloat16 activations
(VERDICT round-1 item 8; ``Dust3rConfig.dtype``, heads stay fp32).

The pairwise inference forward is the stage-1 hot loop (SURVEY §3.1: a
24-layer ViT-L encode + dual 12-layer decode per pair). bf16 keeps the
MXU on its fast path and halves activation HBM traffic; the DPT heads and
all geometry stay fp32 (tests/test_croco_model.py asserts closeness).

Prints one JSON line per dtype with pair/s, plus the speedup. Chained
protocol (each input depends on the previous output) per docs/PERF.md.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--height", type=int, default=288)
    ap.add_argument("--width", type=int, default=512)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv)

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import dataclasses

    import jax.numpy as jnp

    from das3r_tpu.models.croco.dust3r import (DUST3R_LARGE_CONFIG,
                                               AsymmetricCroCo3D)

    H, W, B = args.height, args.width, args.batch
    key = jax.random.PRNGKey(0)
    img = jax.random.uniform(key, (B, 3, H, W), jnp.float32, -1, 1)

    results = {}
    params = None
    for name, dtype in (("float32", jnp.float32), ("bfloat16", jnp.bfloat16)):
        cfg = dataclasses.replace(DUST3R_LARGE_CONFIG, dtype=dtype)
        model = AsymmetricCroCo3D(cfg)
        if params is None:
            params = model.init(jax.random.PRNGKey(1), img[:1], img[:1])[
                "params"]

        @jax.jit
        def chain(x, params=params, model=model):
            def one(x, _):
                r1, r2 = model.apply({"params": params}, x, x)
                # feed a prediction-dependent perturbation forward
                d = r1["conf"].mean() * 1e-6
                return x + d, ()
            x, _ = jax.lax.scan(one, x, None, length=args.iters)
            return x

        t0 = time.time()
        jax.block_until_ready(chain(img))
        print(f"# {name} compile+first {time.time() - t0:.1f} s", flush=True)
        dt = float("inf")
        for k in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(chain(img + 1e-5 * (k + 1)))
            dt = min(dt, time.perf_counter() - t0)
        pairs_s = B * args.iters / dt
        results[name] = pairs_s
        print(json.dumps({
            "metric": f"trunk_fwd_pairs_per_s_{name}_{H}x{W}",
            "value": round(pairs_s, 3), "unit": "pairs/s",
            "vs_baseline": 0.0}), flush=True)

    print(json.dumps({
        "metric": "trunk_bf16_speedup", "unit": "x",
        "value": round(results["bfloat16"] / results["float32"], 3),
        "vs_baseline": round(results["bfloat16"] / results["float32"], 3),
    }), flush=True)


if __name__ == "__main__":
    main()
