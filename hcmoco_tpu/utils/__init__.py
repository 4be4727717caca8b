from .meters import AverageMeter, MetricLogger  # noqa: F401
