from . import gaussians, motion  # noqa: F401
