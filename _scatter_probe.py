import time, sys, numpy as np, jax, jax.numpy as jnp
def log(*a): print(*a, flush=True)
E, N, D, H = 226304, 13312, 512, 8
rng = np.random.default_rng(0)
ids_rand = jnp.asarray(rng.integers(0, N, E).astype(np.int32))
ids_sorted = jnp.sort(ids_rand)
data = jnp.asarray(rng.normal(size=(E, D)).astype(np.float32))
datah = jnp.asarray(rng.normal(size=(E, H)).astype(np.float32))
def timeit(f, *a, n=5):
    t0=time.perf_counter(); r=f(*a); jax.device_get(r)
    log("  compile+1run:", round(time.perf_counter()-t0,1), "s")
    t0=time.perf_counter()
    for _ in range(n): r=f(*a)
    jax.device_get(r)
    return (time.perf_counter()-t0)/n*1e3
log("probe start")
f = jax.jit(lambda d, i: jax.ops.segment_sum(d, i, num_segments=N, indices_are_sorted=True).sum())
log("segsum ExD sorted=True:", timeit(f, data, ids_sorted), "ms")
f = jax.jit(lambda d, i: jax.ops.segment_max(d, i, num_segments=N, indices_are_sorted=True).sum())
log("segmax ExH sorted=True:", timeit(f, datah, ids_sorted), "ms")
src = jnp.asarray(rng.normal(size=(N, D)).astype(np.float32))
f = jax.jit(lambda s, i: s[i].sum())
log("gather NxD:", timeit(f, src, ids_rand), "ms")
def seg_scan_sum(data, ids):
    def comb(a, b):
        (sa, ia), (sb, ib) = a, b
        return (jnp.where(ia == ib, sa + sb, sb), ib)
    s, _ = jax.lax.associative_scan(comb, (data, jnp.broadcast_to(ids[:, None], (ids.shape[0], 1))))
    return s
f = jax.jit(lambda d, i: seg_scan_sum(d, i)[-1].sum())
log("assoc-scan ExD:", timeit(f, data, ids_sorted), "ms")
