from . import limbs, ntt  # noqa: F401
