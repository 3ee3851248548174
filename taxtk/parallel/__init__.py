from .mesh import make_mesh, distributed_classify_step, dryrun_step

__all__ = ["make_mesh", "distributed_classify_step", "dryrun_step"]
