from . import bits, hashing, xgcd  # noqa: F401
