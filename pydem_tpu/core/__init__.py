from . import conditioning, receivers, slope_direction, stencil, twi, uca  # noqa: F401
