from . import special, kernels, assembly  # noqa: F401
