from .synthetic import synthetic_contrast_batch, SyntheticContrastSource  # noqa: F401
from .pipeline import build_contrast_source, DataSource, mixing_weights  # noqa: F401
