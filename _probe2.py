import time, numpy as np, jax, jax.numpy as jnp
def log(*a): print(*a, flush=True)
E, N, D, H = 226304, 13312, 512, 8
rng = np.random.default_rng(0)
data = jnp.asarray(rng.normal(size=(E, D)).astype(np.float32))
datah = jnp.asarray(rng.normal(size=(E, H)).astype(np.float32))
ids = jnp.asarray(np.sort(rng.integers(0, N, E)).astype(np.int32))
ptr = jnp.asarray(np.searchsorted(np.asarray(ids), np.arange(N+1)).astype(np.int32))

def timeit(name, f, *a, n=5):
    t0=time.perf_counter(); r=f(*a); jax.device_get(r)
    log(name, "compile+run:", round(time.perf_counter()-t0,1), "s")
    t0=time.perf_counter()
    for _ in range(n): r=f(*a)
    jax.device_get(r)
    log(name, ":", round((time.perf_counter()-t0)/n*1e3,2), "ms")

log("start")
timeit("cumsum ExD", jax.jit(lambda d: jnp.cumsum(d, axis=0).sum()), data)
timeit("cumsum ExH", jax.jit(lambda d: jnp.cumsum(d, axis=0).sum()), datah)
from pyhgt_tpu.ops.sorted_hgt import seg_sum_csr, seg_max_csr
timeit("seg_sum_csr ExD", jax.jit(lambda d,p: seg_sum_csr(d,p).sum()), data, ptr)
timeit("seg_max_csr ExH", jax.jit(lambda d,i,p: seg_max_csr(d,i,p).sum()), datah, ids, ptr)
