import time, numpy as np, jax, jax.numpy as jnp
def log(*a): print(*a, flush=True)
from pyhgt_tpu.flagship import build_flagship, synth_flagship_batch
from pyhgt_tpu.ops.sorted_hgt import fast_cumsum, seg_max_scan, seg_sum_csr, hgt_edge_stage
fl = build_flagship("bench")
batch, labels = synth_flagship_batch(fl, seed=0, edge_fill=1.0)
se = fl.sort(batch)
E = se.edge_tgt.shape[0]; D = 512; H=8; dk=64
N = fl.layout.num_types*fl.layout.node_cap
B = len(fl.layout.blocks)
G = B*fl.layout.node_cap
log("E",E,"N",N,"G",G)
# small int arrays: upload (few MB); big float arrays: create on device
ids = jax.device_put(se.edge_tgt); ptr = jax.device_put(se.seg_ptr_tgt)
gidx = jax.device_put(se.gidx); tabidx = jax.device_put(se.tabidx)
perm = jax.device_put(se.perm_src); sps = jax.device_put(se.seg_ptr_src)
permt = jax.device_put(se.perm_tab); spt = jax.device_put(se.seg_ptr_tab)
mask_f = jax.device_put(se.edge_mask.astype(np.float32))
key = jax.random.key(0)
mk = lambda *s: jax.random.normal(jax.random.fold_in(key, hash(s)%2**31), s, jnp.float32)
dataD = jax.jit(mk, static_argnums=None)(E, D) if False else jax.random.normal(key, (E,D))
dataH = jax.random.normal(key, (E,H))
src = jax.random.normal(key, (G,D))
q_n = jax.random.normal(key, (N,D))
v_rel = jax.random.normal(key, (G,D))
k_tab = jax.random.normal(key, (B*240,D))
v_tab = jax.random.normal(key, (B*240,D))
pri_e = jax.random.normal(key, (E,H))
jax.device_get(pri_e.sum())
log("data ready")
def timeit(name, f, *a, n=5):
    t0=time.perf_counter(); r=f(*a); jax.device_get(r)
    c=time.perf_counter()-t0
    t0=time.perf_counter()
    for _ in range(n): r=f(*a)
    jax.device_get(r)
    log(f"{name}: {(time.perf_counter()-t0)/n*1e3:.2f} ms (compile {c:.1f}s)")
timeit("fast_cumsum ExD", jax.jit(lambda d: fast_cumsum(d).sum()), dataD)
timeit("seg_sum_csr ExD", jax.jit(lambda d,p: seg_sum_csr(d,p).sum()), dataD, ptr)
timeit("seg_max_scan ExH", jax.jit(lambda d,i: seg_max_scan(d,i).sum()), dataH, ids)
timeit("gather GxD by gidx", jax.jit(lambda s,i: s[i].sum()), src, gidx)
timeit("permute ExD", jax.jit(lambda d,p: d[p].sum()), dataD, perm)
args = (ids, gidx, tabidx, mask_f, ptr, perm, sps, permt, spt)
fwd = jax.jit(lambda *xs: hgt_edge_stage(*xs[:6], (H,dk,True), *args).sum())
timeit("edge stage fwd", fwd, q_n, src, v_rel, k_tab, v_tab, pri_e)
g = jax.jit(jax.grad(lambda *xs: hgt_edge_stage(*xs[:6], (H,dk,True), *args).sum(), argnums=(0,1,2,3,4,5)))
timeit("edge stage fwd+bwd", lambda *xs: g(*xs), q_n, src, v_rel, k_tab, v_tab, pri_e)
