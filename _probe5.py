import time, numpy as np, jax, jax.numpy as jnp
from pyhgt_tpu.flagship import build_flagship, synth_flagship_batch
from pyhgt_tpu.train.optim import cosine_schedule, make_optimizer
from pyhgt_tpu.train.step import TrainState, make_train_step, nll_loss
fl = build_flagship("bench")
batch, labels = synth_flagship_batch(fl, seed=0, edge_fill=1.0)
se = fl.sort(batch)
params = fl.init_params(jax.random.key(0), batch, se)
tx = make_optimizer(cosine_schedule(1e-3,1000), weight_decay=0.01, clip_norm=0.25, params=params)
em = fl.em; model = fl.model

def loss_novmap(p, rng, nf, es, et, dt, emk, nmk, se_, y):
    logp = model.apply(p, nf, es, et, dt, emk, nmk, em, se=se_,
                       deterministic=False, rngs={"dropout": rng})
    return nll_loss(logp, y)

step = make_train_step(loss_novmap, tx)
state = TrainState.create(params, tx)
bargs = tuple(jax.device_put(np.asarray(a)) for a in fl.batch_args(batch))
se_d = jax.device_put(se)
y = jax.device_put(np.asarray(labels))
rng = jax.random.key(1)
for _ in range(3):
    state, loss = step(state, rng, *bargs, se_d, y)
print("warm", float(loss), flush=True)
t0=time.perf_counter()
for _ in range(10):
    state, loss = step(state, rng, *bargs, se_d, y)
lv = float(loss)
print("no-vmap step ms:", (time.perf_counter()-t0)/10*1e3, flush=True)
