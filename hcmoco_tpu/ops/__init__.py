from .point_ops import (  # noqa: F401
    furthest_point_sample,
    ball_query,
    gather_points,
    group_points,
    three_nn,
    three_interpolate,
)
