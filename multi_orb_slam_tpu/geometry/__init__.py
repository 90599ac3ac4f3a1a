from . import se3, sim3, camera, align  # noqa: F401
