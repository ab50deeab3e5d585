"""Primitive A/B for the split-table sort strategy (round 4): at the 1.5M
scene the adaptive split table has ~21.4M slots of which ~6M are live.
Compare on TPU:
  a) sort the full slot table (sentinels sort to the end)   [current]
  b) flat cumsum + scatter-compact to the entry cap, then sort the cap
Chained-scan protocol, scalar-fetch barrier.
"""
import json
import sys
import time

import jax
import jax.numpy as jnp

SLOTS = 21_400_000 // 1024 * 1024
LIVE = 6_000_000
E_CAP = 6_838_272            # 1024-aligned
SENT = jnp.uint32(0xFFFFFFFF)
ITERS = 5


def main():
    k = jax.random.PRNGKey(0)
    keys = jax.random.randint(k, (SLOTS,), 0, 2**31 - 1,
                              dtype=jnp.int32).astype(jnp.uint32)
    valid = jax.random.uniform(jax.random.PRNGKey(1), (SLOTS,)) \
        < (LIVE / SLOTS)
    keys = jnp.where(valid, keys, SENT)

    def full_sort(keys):
        return jax.lax.sort(keys, dimension=0)[:E_CAP]

    def compact_sort(keys):
        live = keys != SENT
        pos = jnp.cumsum(live.astype(jnp.int32)) - live
        in_buf = live & (pos < E_CAP)
        posc = jnp.where(in_buf, pos, E_CAP)
        buf = jnp.full((E_CAP + 1,), SENT).at[posc].set(
            jnp.where(in_buf, keys, SENT), unique_indices=True)[:-1]
        return jax.lax.sort(buf, dimension=0)

    for name, fn in (("full_sort", full_sort),
                     ("compact_sort", compact_sort)):
        @jax.jit
        def chain(keys, fn=fn):
            def body(c, _):
                out = fn(c)
                # feed a key-dependent perturbation back so iterations chain
                return c.at[0].set(c[0] ^ out[0]), ()
            c, _ = jax.lax.scan(body, keys, None, length=ITERS)
            return jnp.sum(c[::4096].astype(jnp.float32))

        _ = float(chain(keys))
        dt = float("inf")
        for i in range(3):
            t0 = time.perf_counter()
            _ = float(chain(keys.at[1].set(jnp.uint32(i + 1))))
            dt = min(dt, time.perf_counter() - t0)
        print(json.dumps({"variant": name,
                          "ms_per_iter": round(dt / ITERS * 1e3, 1)}),
              flush=True)


if __name__ == "__main__":
    main()
