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
import functools
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
    ap.add_argument("--size", choices=("large", "base"), default="large",
                    help="'base' = ViT-B-scale trunk (enc 12x768, dec "
                    "6x512). The full ViT-L program reliably crashes this "
                    "environment's remote-compile relay (broken pipe at "
                    "every resolution tried, docs/PERF.md known "
                    "ceilings); the base trunk exercises the same "
                    "MXU/bf16 question and compiles.")
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
        if args.size == "base":
            cfg = dataclasses.replace(
                cfg, enc_embed_dim=768, enc_depth=12, enc_num_heads=12,
                dec_embed_dim=512, dec_depth=6, dec_num_heads=8)
        model = AsymmetricCroCo3D(cfg)
        if params is None:
            params = model.init(jax.random.PRNGKey(1), img[:1], img[:1])[
                "params"]

        @functools.partial(jax.jit, static_argnames=())
        def chain(x, p, model=model):
            # params MUST be a jit argument: closing over them bakes the
            # full weight tree into the HLO as literals, and this
            # environment's remote-compile relay rejects the payload
            # (HTTP 413 at ViT-L scale).
            def one(x, _):
                r1, r2 = model.apply({"params": p}, x, x)
                # feed a prediction-dependent perturbation forward
                d = r1["conf"].mean() * 1e-6
                return x + d, ()
            x, _ = jax.lax.scan(one, x, None, length=args.iters)
            return x

        pj = jax.device_put(params)
        t0 = time.time()
        x = chain(img, pj)
        _ = float(jnp.sum(x))     # host fetch: the only reliable barrier
        print(f"# {name} compile+first {time.time() - t0:.1f} s", flush=True)
        # block_until_ready does NOT reliably block through the relay (a
        # ViT-L "forward" once measured 0.1 ms with it); chain the windows
        # through each other AND end on a scalar host fetch, timing the
        # whole sequence. The fetch cost (~1 relay round trip) is
        # amortized over windows * iters forwards.
        windows = 3
        t0 = time.perf_counter()
        for k in range(windows):
            x = chain(x, pj)
        _ = float(jnp.sum(x))
        dt = time.perf_counter() - t0
        pairs_s = B * args.iters * windows / dt
        results[name] = pairs_s
        print(json.dumps({
            "metric": f"trunk_fwd_pairs_per_s_{name}_{args.size}_{H}x{W}",
            "value": round(pairs_s, 3), "unit": "pairs/s",
            "vs_baseline": 0.0}), flush=True)

    print(json.dumps({
        "metric": "trunk_bf16_speedup", "unit": "x",
        "value": round(results["bfloat16"] / results["float32"], 3),
        "vs_baseline": round(results["bfloat16"] / results["float32"], 3),
    }), flush=True)


if __name__ == "__main__":
    main()
