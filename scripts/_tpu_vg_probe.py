import os, time, json
os.makedirs("/tmp/jax_cache", exist_ok=True)
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
print("backend:", jax.default_backend(), jax.devices(), flush=True)
import optax

from pointnerf_slam_tpu.models.decoders import MLPConfig, init_mlp
from pointnerf_slam_tpu.render.renderer import RenderConfig
from pointnerf_slam_tpu.ops.fused_vg import make_fused_vg

CFG = MLPConfig(dim=3, c_dim=0, color=True, hidden_size=256, skips=(), n_blocks=4)
RCFG = RenderConfig(N_samples=32, N_surface=0, N_importance=12)
BOUND = jnp.array([[-4.,4.],[-4.,4.],[-4.,4.]])
n = 5120
ks = jax.random.split(jax.random.PRNGKey(0), 6)
params = init_mlp(ks[0], CFG)
o = jax.random.uniform(ks[1], (n,3), minval=-1, maxval=1)
d = jax.random.normal(ks[2], (n,3)); d = d/jnp.linalg.norm(d,axis=1,keepdims=True)*1.1
gt_d = jax.random.uniform(ks[3], (n,), minval=0.5, maxval=2.5)
gt_c = jax.random.uniform(ks[4], (n,3))
t_reg = jax.random.uniform(ks[5], (n, 32))
ray_w = jnp.ones((n,))

vg_map = make_fused_vg(RCFG, "mapper", 0.05, 0.0005)
vg_trk = make_fused_vg(RCFG, "tracker", 0.5)

tx = optax.adam(1e-3)

def scan_time(vg, label, iters=20):
    def body(carry, _):
        p, st = carry
        loss, gp, _, _, _ = vg(p, o, d, gt_d, gt_c, ray_w, t_reg, BOUND)
        upd, st = tx.update(gp, st)
        p = optax.apply_updates(p, upd)
        return (p, st), loss
    run = jax.jit(lambda p: jax.lax.scan(body, (p, tx.init(p)), None, length=iters))
    t0=time.time(); (p2, _), ls = run(params); l0 = float(ls[-1])
    print(label, "compile+run", round(time.time()-t0,1), "s, loss", l0, "finite", np.isfinite(l0), flush=True)
    t0=time.time(); (p2, _), ls = run(params); _ = float(ls[-1])
    dt = time.time()-t0
    print(label, f"{iters/dt:.1f} it/s ({dt*1000/iters:.2f} ms/iter)", flush=True)
    return iters/dt

r_m = scan_time(vg_map, "mapper-vg")
r_t = scan_time(vg_trk, "tracker-vg")
print(json.dumps({"mapper_it_s": r_m, "tracker_it_s": r_t}), flush=True)
