from .synthetic import synthetic_contrast_batch, SyntheticContrastSource  # noqa: F401
