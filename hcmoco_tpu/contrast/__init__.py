from .memory import (  # noqa: F401
    MemoryState,
    init_memory,
    sample_negative_indices,
    memory_logits,
    update_memory,
    cmc3_forward,
    MoCoState,
    init_moco,
    moco_logits,
    moco_enqueue,
)
from .losses import (  # noqa: F401
    nce_loss_and_acc,
    compute_loss_accuracy,
    soft_pri3d_loss,
    joints_pri3d_loss,
    cross_subject_scl_loss,
    gather_joint_features,
    gaussian_joint_pooling,
)
