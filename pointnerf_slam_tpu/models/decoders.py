"""Neural scene decoders: the iMAP* single MLP and the NICE grid stack.

Functional (params-as-pytree) re-design of the reference decoder family
(src/conv_onet/models/decoder.py:91-342, factory src/conv_onet/config.py:4-33):

  - `MLP`: Gaussian-Fourier (or NeRF) embedded point MLP with optional
    per-layer feature-grid conditioning (c_dim != 0) and skip concats.
    iMAP* flagship config: c_dim=0, hidden=256, n_blocks=4, skips=(),
    fourier embedding (93-d, scale 25, learnable), RGBA output.
  - `MLP_no_xyz` semantics: grid feature is the network input (coarse level).
  - `NICE`: coarse/middle/fine/color four-decoder stack with staged forward.

Init matches the reference: xavier_uniform with gain sqrt(2) for relu layers,
gain 1 for the output layer; zero biases; B ~ N(0,1)*25.

Everything is jit/vmap/pjit-friendly: apply functions are pure, params are
plain dicts, and static structure lives in frozen dataclass configs.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.coords import normalize_3d_coordinate
from ..ops.grid_sample import trilinear_sample
from .embeddings import apply_fourier, init_fourier, nerf_positional_embedding


@dataclasses.dataclass(frozen=True)
class MLPConfig:
    name: str = ""
    dim: int = 3
    c_dim: int = 128
    hidden_size: int = 256
    n_blocks: int = 5
    leaky: bool = False
    color: bool = False
    skips: Tuple[int, ...] = (2,)
    pos_embedding_method: str = "fourier"
    concat_feature: bool = False
    no_xyz: bool = False  # MLP_no_xyz variant: grid feature is the input
    grid_len: float = 0.16
    # 'bfloat16' runs the hidden matmuls on the MXU in bf16 with f32
    # accumulation (params stay f32) — ~4x matmul peak on v5e
    compute_dtype: str = "float32"
    # fused Pallas kernel for the flagship config (TPU only; avoids HBM
    # round-trips for layer activations — ops/fused_mlp.py). Measured on
    # v5e: XLA's default lowering already overlaps the activation traffic
    # (mapper 55 it/s plain vs 46 fused), so this stays off by default;
    # kept as the substrate for a future fully-fused sample->MLP->composite
    # megakernel.
    fused: bool = False

    @property
    def embedding_size(self) -> int:
        if self.no_xyz:
            return self.hidden_size
        if self.pos_embedding_method == "fourier":
            return 93
        if self.pos_embedding_method == "same":
            return self.dim
        if self.pos_embedding_method == "nerf":
            multires = 10 if "color" in self.name else 5
            return multires * 6 + self.dim
        if self.pos_embedding_method == "fc_relu":
            return 93
        raise ValueError(self.pos_embedding_method)

    @property
    def out_dim(self) -> int:
        return 4 if self.color else 1


def _xavier_uniform(key, in_dim: int, out_dim: int, gain: float):
    limit = gain * math.sqrt(6.0 / (in_dim + out_dim))
    return jax.random.uniform(key, (in_dim, out_dim), minval=-limit,
                              maxval=limit)


def _init_dense(key, in_dim: int, out_dim: int, activation: str = "relu"):
    gain = math.sqrt(2.0) if activation == "relu" else 1.0
    return {"w": _xavier_uniform(key, in_dim, out_dim, gain),
            "b": jnp.zeros((out_dim,))}


def _dense(p, x, dtype=None):
    if dtype is not None and dtype != jnp.float32:
        return jnp.dot(x.astype(dtype), p["w"].astype(dtype),
                       preferred_element_type=jnp.float32) + p["b"]
    return x @ p["w"] + p["b"]


def init_mlp(key, cfg: MLPConfig):
    """Initialize MLP params pytree."""
    keys = jax.random.split(key, cfg.n_blocks * 2 + 3)
    params = {}
    k = iter(keys)

    if not cfg.no_xyz:
        if cfg.pos_embedding_method == "fourier":
            params["embedder"] = init_fourier(next(k), cfg.dim, 93, 25.0)
        elif cfg.pos_embedding_method == "fc_relu":
            params["embedder"] = _init_dense(next(k), cfg.dim, 93, "relu")

    emb = cfg.embedding_size
    h = cfg.hidden_size
    layers = []
    in_dim = emb if not cfg.no_xyz else cfg.hidden_size
    for i in range(cfg.n_blocks):
        layers.append(_init_dense(next(k), in_dim, h, "relu"))
        # layer i+1's input widens if layer i is a skip layer
        if i in cfg.skips:
            in_dim = h + (emb if not cfg.no_xyz else cfg.c_dim)
        else:
            in_dim = h
    params["layers"] = layers

    if cfg.c_dim != 0 and not cfg.no_xyz:
        c_in = cfg.c_dim * (2 if cfg.concat_feature else 1)
        params["fc_c"] = [_init_dense(next(k), c_in, h, "linear")
                          for _ in range(cfg.n_blocks)]

    params["out"] = _init_dense(next(k), h, cfg.out_dim, "linear")
    return params


def _sample_feature(grid, p, bound):
    p_nor = normalize_3d_coordinate(p, bound)
    return trilinear_sample(grid, p_nor)


def apply_mlp(params, cfg: MLPConfig, p: jnp.ndarray,
              c_grid: Optional[dict] = None,
              bound: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Evaluate the decoder at points p (N, 3) -> (N, 4) or (N,).

    Mirrors the reference forward exactly (decoder.py:177-203,262-274):
    per-block Linear -> relu -> (+ fc_c[i](c)) -> (skip concat).
    """
    if cfg.fused and jax.default_backend() == "tpu":
        from ..ops.fused_mlp import fused_imap_mlp, supports_fused
        if supports_fused(cfg):
            return fused_imap_mlp(params, p)

    act = (lambda x: jax.nn.leaky_relu(x, 0.2)) if cfg.leaky else jax.nn.relu
    cdt = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else None

    c = None
    if cfg.no_xyz:
        c = _sample_feature(c_grid["grid_" + cfg.name], p, bound)
        h = c
        emb = c
    else:
        if cfg.c_dim != 0:
            c = _sample_feature(c_grid["grid_" + cfg.name], p, bound)
            if cfg.concat_feature:
                c_mid = jax.lax.stop_gradient(
                    _sample_feature(c_grid["grid_middle"], p, bound))
                c = jnp.concatenate([c, c_mid], axis=-1)
        if cfg.pos_embedding_method == "fourier":
            emb = apply_fourier(params["embedder"], p)
        elif cfg.pos_embedding_method == "same":
            emb = p
        elif cfg.pos_embedding_method == "nerf":
            multires = 10 if "color" in cfg.name else 5
            emb = nerf_positional_embedding(
                p, multires, log_sampling=("color" in cfg.name))
        elif cfg.pos_embedding_method == "fc_relu":
            emb = act(_dense(params["embedder"], p))
        h = emb

    for i, layer in enumerate(params["layers"]):
        h = act(_dense(layer, h, cdt))
        if cfg.c_dim != 0 and not cfg.no_xyz:
            h = h + _dense(params["fc_c"][i], c, cdt)
        if i in cfg.skips:
            h = jnp.concatenate([emb, h], axis=-1)

    out = _dense(params["out"], h, cdt)
    if not cfg.color:
        out = out[..., 0]
    return out


# ---------------------------------------------------------------------------
# NICE stack
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class NICEConfig:
    dim: int = 3
    c_dim: int = 32
    hidden_size: int = 32
    coarse: bool = False
    coarse_grid_len: float = 2.0
    middle_grid_len: float = 0.16
    fine_grid_len: float = 0.16
    color_grid_len: float = 0.16
    pos_embedding_method: str = "fourier"

    @property
    def sub_configs(self):
        subs = {}
        if self.coarse:
            subs["coarse"] = MLPConfig(
                name="coarse", dim=self.dim, c_dim=self.c_dim, color=False,
                hidden_size=self.hidden_size, no_xyz=True, skips=(2,),
                n_blocks=5, grid_len=self.coarse_grid_len)
        subs["middle"] = MLPConfig(
            name="middle", dim=self.dim, c_dim=self.c_dim, color=False,
            skips=(2,), n_blocks=5, hidden_size=self.hidden_size,
            grid_len=self.middle_grid_len,
            pos_embedding_method=self.pos_embedding_method)
        subs["fine"] = MLPConfig(
            name="fine", dim=self.dim, c_dim=self.c_dim, color=False,
            skips=(2,), n_blocks=5, hidden_size=self.hidden_size,
            grid_len=self.fine_grid_len, concat_feature=True,
            pos_embedding_method=self.pos_embedding_method)
        subs["color"] = MLPConfig(
            name="color", dim=self.dim, c_dim=self.c_dim, color=True,
            skips=(2,), n_blocks=5, hidden_size=self.hidden_size,
            grid_len=self.color_grid_len,
            pos_embedding_method=self.pos_embedding_method)
        return subs


def init_nice(key, cfg: NICEConfig):
    subs = cfg.sub_configs
    keys = jax.random.split(key, len(subs))
    return {name: init_mlp(k, sub)
            for k, (name, sub) in zip(keys, subs.items())}


def apply_nice(params, cfg: NICEConfig, p: jnp.ndarray, c_grid: dict,
               stage: str, bound: jnp.ndarray) -> jnp.ndarray:
    """Staged forward (decoder.py:312-342): returns (N, 4) raw RGBA where
    only the alpha channel is populated for geometry stages."""
    subs = cfg.sub_configs
    n = p.shape[0]

    def occ_only(occ):
        return jnp.concatenate(
            [jnp.zeros((n, 3), occ.dtype), occ[:, None]], axis=-1)

    if stage == "coarse":
        occ = apply_mlp(params["coarse"], subs["coarse"], p, c_grid, bound)
        return occ_only(occ)
    if stage == "middle":
        occ = apply_mlp(params["middle"], subs["middle"], p, c_grid, bound)
        return occ_only(occ)
    if stage == "fine":
        fine = apply_mlp(params["fine"], subs["fine"], p, c_grid, bound)
        mid = apply_mlp(params["middle"], subs["middle"], p, c_grid, bound)
        return occ_only(fine + mid)
    if stage == "color":
        fine = apply_mlp(params["fine"], subs["fine"], p, c_grid, bound)
        raw = apply_mlp(params["color"], subs["color"], p, c_grid, bound)
        mid = apply_mlp(params["middle"], subs["middle"], p, c_grid, bound)
        return raw.at[..., -1].set(fine + mid)
    raise ValueError(stage)


# ---------------------------------------------------------------------------
# Factory (reference src/config.py:63-79 + src/conv_onet/config.py:4-33)
# ---------------------------------------------------------------------------

def get_model(cfg: dict, nice: bool = False):
    """Build (config, init_fn) for the configured scene model.

    Returns (model_cfg, init_fn) where init_fn(key) -> params.
    """
    dim = cfg["data"]["dim"]
    c_dim = cfg["model"]["c_dim"]
    pos = cfg["model"]["pos_embedding_method"]
    if nice:
        mcfg = NICEConfig(
            dim=dim, c_dim=c_dim, coarse=cfg["coarse"],
            hidden_size=cfg["model"].get("hidden_size", 32),
            coarse_grid_len=cfg["grid_len"]["coarse"],
            middle_grid_len=cfg["grid_len"]["middle"],
            fine_grid_len=cfg["grid_len"]["fine"],
            color_grid_len=cfg["grid_len"]["color"],
            pos_embedding_method=pos)
        return mcfg, (lambda key: init_nice(key, mcfg))
    # hidden_size/n_blocks overridable for small-scale tests; reference
    # hardcodes 256/4 (src/conv_onet/config.py:29-32)
    mcfg = MLPConfig(dim=dim, c_dim=0, color=True,
                     hidden_size=cfg["model"].get("hidden_size", 256),
                     skips=(), n_blocks=cfg["model"].get("n_blocks", 4),
                     pos_embedding_method=pos,
                     compute_dtype=cfg["model"].get("compute_dtype",
                                                    "float32"))
    return mcfg, (lambda key: init_mlp(key, mcfg))
