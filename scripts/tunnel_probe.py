"""Probe chip health + tunnel primitive costs (CLAUDE.md hazard check).

Measures the serving-latency floor components on the real chip:
device_put of small arrays, jit dispatch (enqueue), blocking readback
of a tiny output, and a full tiny roundtrip. Run before long TPU work.
"""
import os
import sys
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))

import jax
import jax.numpy as jnp
import numpy as np

t0 = time.time()
dev = jax.devices()[0]
print(f"devices: {jax.devices()} ({time.time()-t0:.1f}s)", file=sys.stderr)

t0 = time.time()
x = jnp.arange(4096)
y = jax.jit(lambda a: jnp.sort(a))(x)
y.block_until_ready()
print(f"tiny jit sort compile+run: {time.time()-t0:.1f}s", file=sys.stderr)

N = 50
# device_put of one small array
t0 = time.time()
for i in range(N):
    jax.device_put(np.arange(16, dtype=np.int32))
dt1 = (time.time() - t0) / N * 1000

# device_put of a 7-leaf pytree of small arrays (one call)
tree = {k: np.arange(16, dtype=np.int32) for k in "abcdefg"}
t0 = time.time()
for i in range(N):
    jax.device_put(tree)
dt2 = (time.time() - t0) / N * 1000

# 7 separate jnp.asarray calls (the current SegmentSearcher.execute style)
t0 = time.time()
for i in range(N):
    jax.tree.map(jnp.asarray, tree)
dt3 = (time.time() - t0) / N * 1000

# dispatch-only of a warm jit fn (no readback)
f = jax.jit(lambda a: (a * 2).sum())
xb = jax.device_put(np.arange(4096, dtype=np.int32))
f(xb).block_until_ready()
t0 = time.time()
outs = [f(xb) for _ in range(N)]
dt4 = (time.time() - t0) / N * 1000
outs[-1].block_until_ready()

# tiny-scalar readback (np.asarray on a ready result)
r = f(xb)
r.block_until_ready()
t0 = time.time()
for i in range(N):
    np.asarray(r)
dt5 = (time.time() - t0) / N * 1000

# full roundtrip: upload 7 small arrays + dispatch + read tiny result
g = jax.jit(lambda t: sum(a.sum() for a in t.values()))
g(jax.device_put(tree)).block_until_ready()
t0 = time.time()
for i in range(N):
    np.asarray(g(jax.device_put(tree)))
dt6 = (time.time() - t0) / N * 1000

print(f"device_put 1 small arr:   {dt1:7.2f} ms", file=sys.stderr)
print(f"device_put 7-leaf tree:   {dt2:7.2f} ms", file=sys.stderr)
print(f"7x jnp.asarray:           {dt3:7.2f} ms", file=sys.stderr)
print(f"warm dispatch (no sync):  {dt4:7.2f} ms", file=sys.stderr)
print(f"tiny readback:            {dt5:7.2f} ms", file=sys.stderr)
print(f"full tiny roundtrip:      {dt6:7.2f} ms", file=sys.stderr)
