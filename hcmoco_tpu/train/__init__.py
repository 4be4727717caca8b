from .schedules import learning_rate_fn  # noqa: F401
from .state import TrainState, create_train_state  # noqa: F401
from .contrast_step import make_contrast_train_step  # noqa: F401
