from .mixed_correlation import MixedCorrelation  # noqa: F401
