from .config import (  # noqa: F401
    HRNetStageSpec,
    HRNetConfig,
    HRNET_W18,
    HRNET_W32,
    HRNET_W48,
    MethodPreset,
    METHOD_PRESETS,
    TrainConfig,
    resolve_config,
)
