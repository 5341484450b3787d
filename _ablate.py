import time, numpy as np, jax, jax.numpy as jnp
from pyhgt_tpu.flagship import build_flagship, synth_flagship_batch

fl = build_flagship("bench")
batch, labels = synth_flagship_batch(fl, seed=0, edge_fill=1.0)
params = fl.init_params(jax.random.key(0), batch)
bargs = tuple(jax.device_put(np.asarray(a)) for a in fl.batch_args(batch))

def timeit(f, *a, n=5):
    r = f(*a); jax.device_get(r)  # compile+sync
    t0=time.perf_counter()
    for _ in range(n): r = f(*a)
    jax.device_get(r)
    return (time.perf_counter()-t0)/n*1e3

# (a) full forward
fwd = jax.jit(fl.forward_fn())
print("fwd full ms:", timeit(fwd, params, *bargs), flush=True)

# (b) one conv core, isolating pieces
from pyhgt_tpu.ops.hgt import typed_linear, _block_relation_transform, _rte_block_tables
from pyhgt_tpu.ops import segment_softmax, segment_sum
em = fl.em
p = params['params']['gnn']['convs_0']['base_conv']
nf, es, et, dt, emk, nmk = bargs
H = fl.cfg.n_heads; Dout = fl.cfg.n_hid; dk = Dout//H
T, C, _ = nf.shape; N=T*C; E=es.shape[0]
x = jnp.zeros((T, C, Dout))

def dense_only(x, p):
    q = typed_linear(x, p['wq'], p['bq'])
    k = typed_linear(x, p['wk'], p['bk'])
    v = typed_linear(x, p['wv'], p['bv'])
    k_rel = _block_relation_transform(k.reshape(T,C,H,dk), p['rel_att'], em)
    v_rel = _block_relation_transform(v.reshape(T,C,H,dk), p['rel_msg'], em)
    return q.sum()+k_rel.sum()+v_rel.sum()
print("dense-only ms:", timeit(jax.jit(dense_only), x, p), flush=True)

def gathers_only(x, p, es, et):
    k = typed_linear(x, p['wk'], p['bk'])
    k_rel = _block_relation_transform(k.reshape(T,C,H,dk), p['rel_att'], em).reshape(-1, Dout)
    gidx = es + jnp.asarray(em.gather_off)
    k_e = k_rel[gidx]
    q = typed_linear(x, p['wq'], p['bq']).reshape(N, Dout)
    q_e = q[et]
    att = (q_e*k_e).reshape(E,H,dk).sum(-1)
    return att.sum()
print("dense+gather ms:", timeit(jax.jit(gathers_only), x, p, es, et), flush=True)

def seg_only(et, emk):
    att = jnp.ones((E, H))
    w = segment_softmax(att, et, N, mask=emk)
    return w.sum()
print("segment-softmax ms:", timeit(jax.jit(seg_only), et, emk), flush=True)

def scatter_only(et, emk):
    msg = jnp.ones((E, Dout))
    return segment_sum(msg, et, N, mask=emk).sum()
print("segment-sum ExD ms:", timeit(jax.jit(scatter_only), et, emk), flush=True)
