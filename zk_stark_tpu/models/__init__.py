from .rescue_prime import RescuePrime  # noqa: F401
from .rpsss import RPSSS  # noqa: F401
