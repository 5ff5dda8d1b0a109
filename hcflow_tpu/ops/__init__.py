from . import actnorm, coupling, densities, invconv, nets, quant, squeeze  # noqa: F401
