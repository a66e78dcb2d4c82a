from . import mesh, dist_ntt, pipeline  # noqa: F401
