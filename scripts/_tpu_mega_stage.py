import os, time, json, sys
os.makedirs("/tmp/jax_cache", exist_ok=True)
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
print("backend:", jax.default_backend(), jax.devices(), flush=True)

from pointnerf_slam_tpu.models.decoders import MLPConfig, init_mlp
from pointnerf_slam_tpu.render.renderer import RenderConfig
from pointnerf_slam_tpu.ops.megakernel import make_fused_render

CFG = MLPConfig(dim=3, c_dim=0, color=True, hidden_size=256, skips=(), n_blocks=4)
RCFG = RenderConfig(N_samples=32, N_surface=0, N_importance=12)
BOUND = jnp.array([[-4.,4.],[-4.,4.],[-4.,4.]])
n = 5120
ks = jax.random.split(jax.random.PRNGKey(0), 5)
params = init_mlp(ks[0], CFG)
o = jax.random.uniform(ks[1], (n,3), minval=-1, maxval=1)
d = jax.random.normal(ks[2], (n,3)); d = d/jnp.linalg.norm(d,axis=1,keepdims=True)*1.1
gt_d = jax.random.uniform(ks[3], (n,), minval=0.5, maxval=2.5)
t_reg = jax.random.uniform(ks[4], (n, 32))
gt_c = jax.random.uniform(jax.random.PRNGKey(9), (n,3))

fused = make_fused_render(RCFG, with_reg=True)

def loss_fused(p, ro, rd):
    dep, var, col, sig = fused(p, ro, rd, gt_d, t_reg, BOUND)
    return jnp.sum(jnp.abs(gt_d-dep)) + 0.05*jnp.sum(jnp.abs(gt_c-col)) + 0.0005*jnp.sum(jnp.abs(sig))

t0=time.time()
f_fwd = jax.jit(loss_fused)
lf = float(f_fwd(params, o, d))
print("FWD-ONLY compile+run", round(time.time()-t0,1), "s, loss", lf, flush=True)

t0=time.time()
vg_f = jax.jit(jax.value_and_grad(loss_fused))
lf, gf = vg_f(params, o, d)
lf = float(lf)
print("FWD+BWD compile+run", round(time.time()-t0,1), "s, loss", lf, flush=True)
gnorm = float(sum(jnp.sum(x*x) for x in jax.tree_util.tree_leaves(gf)))
print("grad sqnorm", gnorm, "finite:", np.isfinite(gnorm), flush=True)

# quick timing: scanned 20-iter fwd+bwd
def body(c, _):
    l, g = jax.value_and_grad(loss_fused)(c, o, d)
    c = jax.tree_util.tree_map(lambda a, b: a - 1e-9*b, c, g)
    return c, l
run = jax.jit(lambda p: jax.lax.scan(body, p, None, length=20))
t0=time.time(); p2, ls = run(params); _ = float(ls[-1])
print("scan20 compile+run", round(time.time()-t0,1), flush=True)
t0=time.time(); p2, ls = run(params); _ = float(ls[-1])
dt = time.time()-t0
print(json.dumps({"fused_it_s": 20/dt, "ms_per_iter": dt*50}), flush=True)
