from .fps import fps_pallas  # noqa: F401
from .ball_query import ball_query_pallas  # noqa: F401
from .three_nn import three_nn_pallas  # noqa: F401
