import os, time, json
os.makedirs("/tmp/jax_cache", exist_ok=True)
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
print("backend:", jax.default_backend(), jax.devices())

from pointnerf_slam_tpu.models.decoders import MLPConfig, init_mlp
from pointnerf_slam_tpu.render.renderer import RenderConfig, render_rays, regulation
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

def loss_xla(p, ro, rd):
    dep, var, col, _ = render_rays(p, CFG, RCFG, ro, rd, BOUND, None, gt_d)
    sig = regulation(p, CFG, RCFG, ro, rd, gt_d, BOUND, jax.random.PRNGKey(7))
    return jnp.sum(jnp.abs(gt_d-dep)) + 0.05*jnp.sum(jnp.abs(gt_c-col)) + 0.0005*jnp.sum(jnp.abs(sig))

t0=time.time()
vg_f = jax.jit(jax.value_and_grad(loss_fused))
lf, gf = vg_f(params, o, d)
lf = float(lf); print("fused compile+run", round(time.time()-t0,1), "s, loss", lf)
gnorm = float(sum(jnp.sum(x*x) for x in jax.tree_util.tree_leaves(gf)))
print("fused grad sqnorm", gnorm, "finite:", np.isfinite(gnorm))

t0=time.time()
vg_x = jax.jit(jax.value_and_grad(loss_xla))
lx, gx = vg_x(params, o, d)
lx = float(lx); print("xla compile+run", round(time.time()-t0,1), "s, loss", lx)
print("loss rel diff:", abs(lf-lx)/abs(lx))

# timing: scanned 50-iteration loops of value_and_grad
def scan_time(fn, label):
    def body(c, _):
        l, g = jax.value_and_grad(fn)(c, o, d)
        c = jax.tree_util.tree_map(lambda a, b: a - 1e-9*b, c, g)
        return c, l
    run = jax.jit(lambda p: jax.lax.scan(body, p, None, length=50))
    p2, ls = run(params); _ = float(ls[-1])  # compile+sync
    t0=time.time(); p2, ls = run(params); _ = float(ls[-1])
    dt = time.time()-t0
    print(label, f"{50/dt:.1f} it/s ({dt*20:.1f} ms/iter)")
    return 50/dt

r_f = scan_time(loss_fused, "fused scan50:")
r_x = scan_time(loss_xla,   "xla   scan50:")
print(json.dumps({"fused_it_s": r_f, "xla_it_s": r_x, "speedup": r_f/r_x}))
