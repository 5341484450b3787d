import time, numpy as np, jax
from pyhgt_tpu.flagship import build_flagship, synth_flagship_batch
from pyhgt_tpu.train.optim import cosine_schedule, make_optimizer
from pyhgt_tpu.train.step import TrainState, make_train_step

fl = build_flagship("bench")
batch, labels = synth_flagship_batch(fl, seed=0, edge_fill=1.0)
params = fl.init_params(jax.random.key(0), batch)
tx = make_optimizer(cosine_schedule(1e-3, 1000), weight_decay=0.01, clip_norm=0.25, params=params)
state = TrainState.create(params, tx)
step = make_train_step(fl.loss_fn(), tx)
stack = jax.tree.map(lambda x: np.asarray(x)[None], batch)
y = np.asarray(labels)[None]
bargs = tuple(jax.device_put(a) for a in (stack.node_feat, stack.edge_src, stack.edge_tgt, stack.edge_dt, stack.edge_mask, stack.node_mask))
y = jax.device_put(y); rng = jax.random.key(1)
for _ in range(3):
    state, loss = step(state, rng, *bargs, y)
print("warm loss:", float(loss), flush=True)
# per-step sync timing
ts=[]
for i in range(10):
    t0=time.perf_counter()
    state, loss = step(state, rng, *bargs, y)
    lv=float(loss)  # hard sync
    ts.append(time.perf_counter()-t0)
print("per-step sync ms:", [round(t*1e3,2) for t in ts], flush=True)
# async chain of 20, one final sync
t0=time.perf_counter()
for i in range(20):
    state, loss = step(state, rng, *bargs, y)
loss.block_until_ready()
print("async chain avg ms:", (time.perf_counter()-t0)/20*1e3, flush=True)
