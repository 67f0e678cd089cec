from . import fri_dist, mesh, ntt_dist  # noqa: F401
