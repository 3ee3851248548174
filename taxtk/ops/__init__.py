import os

# persistent compilation cache: TPU (remote) compiles of the DP kernels are
# expensive; cache them across processes
try:
    import jax

    _cache_dir = os.environ.get(
        "TAXTK_JAX_CACHE", os.path.expanduser("~/.cache/taxtk-jax")
    )
    os.makedirs(_cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:  # pragma: no cover - cache is best-effort
    pass

from .blosum import BLOSUM62, AA_ORDER
from .dna_align import batched_edit_distance, dna_alignment_stats
from .protein_align import batched_protein_align

__all__ = [
    "BLOSUM62",
    "AA_ORDER",
    "batched_edit_distance",
    "dna_alignment_stats",
    "batched_protein_align",
]
