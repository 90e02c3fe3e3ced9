"""Probe: does an int4 matmul beat int8 on this v5e via XLA?

If int4 ran at 2x int8 MAC rate, the +/-1 sweep roof would double.
Times a [8192, 1024] x [1024, 8192] dot in int8 vs int4 (values +/-1),
d2h-forced completion.
"""
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vid_dup_finder_lib_tpu.utils.jaxconfig import enable_compilation_cache

enable_compilation_cache()
M = N = 8192
K = 1024
rng = np.random.default_rng(0)
a8 = rng.choice(np.array([-1, 1], np.int8), (M, K))
b8 = rng.choice(np.array([-1, 1], np.int8), (K, N))


@jax.jit
def dot8(a, b):
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )


def timeit(f, a, b, iters=20):
    out = f(a, b)
    int(np.asarray(out[0, 0]))  # force
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(a, b)
    int(np.asarray(out[0, 0]))
    dt = (time.perf_counter() - t0) / iters
    macs = M * N * K
    return dt, macs / dt / 1e12


ad = jnp.asarray(a8)
bd = jnp.asarray(b8)
dt, tops = timeit(dot8, ad, bd)
print(f"int8:  {dt*1e3:.2f} ms  {tops:.1f} TMAC/s")

try:
    a4 = ad.astype(jnp.int4)
    b4 = bd.astype(jnp.int4)

    @jax.jit
    def dot4(a, b):
        return jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )

    dt4, tops4 = timeit(dot4, a4, b4)
    print(f"int4:  {dt4*1e3:.2f} ms  {tops4:.1f} TMAC/s  (x{dt/dt4:.2f} vs int8)")
except Exception as e:
    print("int4 unsupported:", type(e).__name__, str(e)[:200])
