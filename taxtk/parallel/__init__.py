"""Parallelism: device-mesh kernels (mesh), multi-host query sharding
(distributed), and refpack sharding (refpack).

Lazy attribute exports: `taxtk.parallel.refpack` and `.distributed` are
pure-IO and must stay importable (e.g. the `split-refpack` CLI) without
pulling in jax, which `.mesh` requires.
"""

__all__ = ["make_mesh", "distributed_classify_step", "dryrun_step"]


def __getattr__(name):
    if name in __all__:
        from . import mesh

        return getattr(mesh, name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
