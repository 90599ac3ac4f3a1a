from . import orb, hamming  # noqa: F401
