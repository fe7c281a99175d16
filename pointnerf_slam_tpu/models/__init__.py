from .decoders import (
    MLPConfig,
    NICEConfig,
    init_mlp,
    apply_mlp,
    init_nice,
    apply_nice,
    get_model,
)
from .embeddings import (
    init_fourier,
    apply_fourier,
    nerf_positional_embedding,
)
