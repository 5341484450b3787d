import time, numpy as np, jax, jax.numpy as jnp
def log(*a): print(*a, flush=True)
from pyhgt_tpu.flagship import build_flagship, synth_flagship_batch
from pyhgt_tpu.ops.sorted_hgt import hgt_edge_stage
fl = build_flagship("bench")
batch, labels = synth_flagship_batch(fl, seed=0, edge_fill=1.0)
se = fl.sort(batch)
E = se.edge_tgt.shape[0]; D=512; H=8; dk=64
N = fl.layout.num_types*fl.layout.node_cap
B = len(fl.layout.blocks); G = B*fl.layout.node_cap
ids = jax.device_put(se.edge_tgt); ptr = jax.device_put(se.seg_ptr_tgt)
gidx = jax.device_put(se.gidx); tabidx = jax.device_put(se.tabidx)
perm = jax.device_put(se.perm_src); sps = jax.device_put(se.seg_ptr_src)
permt = jax.device_put(se.perm_tab); spt = jax.device_put(se.seg_ptr_tab)
mask_f = jax.device_put(se.edge_mask.astype(np.float32))
key = jax.random.key(0)
q_n = jax.random.normal(key, (N,D)); k_rel = jax.random.normal(key, (G,D))
v_rel = jax.random.normal(key, (G,D))
k_tab = jax.random.normal(key, (B*240,D)); v_tab = jax.random.normal(key, (B*240,D))
pri_e = jax.random.normal(key, (E,H))
jax.device_get(pri_e.sum()); log("data ready")
args = (ids, gidx, tabidx, mask_f, ptr, perm, sps, permt, spt)
def timeit(name, f, *a, n=5):
    t0=time.perf_counter(); r=f(*a); jax.device_get(r)
    c=time.perf_counter()-t0
    t0=time.perf_counter()
    for _ in range(n): r=f(*a)
    jax.device_get(r)
    log(f"{name}: {(time.perf_counter()-t0)/n*1e3:.2f} ms (compile {c:.1f}s)")
def lossf(*xs):
    return hgt_edge_stage(*xs[:6], (H,dk,True), *args).sum()
gf = jax.grad(lossf, argnums=(0,1,2,3,4,5))
g_scalar = jax.jit(lambda *xs: sum(jnp.sum(jnp.abs(t)) for t in gf(*xs)))
timeit("edge fwd+bwd (scalar)", g_scalar, q_n, k_rel, v_rel, k_tab, v_tab, pri_e)
# no-RTE variant
args0 = args
def lossf0(*xs):
    return hgt_edge_stage(*xs[:6], (H,dk,False), *args0).sum()
g0 = jax.jit(lambda *xs: sum(jnp.sum(jnp.abs(t)) for t in jax.grad(lossf0, argnums=(0,1,2,5))(*xs)))
timeit("edge fwd+bwd noRTE", g0, q_n, k_rel, v_rel, k_tab, v_tab, pri_e)
# bf16 inputs
tb = lambda x: x.astype(jnp.bfloat16)
gb = jax.jit(lambda *xs: sum(jnp.sum(jnp.abs(t).astype(jnp.float32)) for t in jax.grad(
    lambda *ys: hgt_edge_stage(*ys[:6], (H,dk,True), *args).sum().astype(jnp.float32), argnums=(0,1,2,3,4,5))(*xs)))
timeit("edge fwd+bwd bf16", gb, tb(q_n), tb(k_rel), tb(v_rel), tb(k_tab), tb(v_tab), tb(pri_e))
