from .hrnet import HRNet  # noqa: F401
from .sgcn import SemGCN, skeleton_adjacency  # noqa: F401
from .heads import l2_normalize, ProjectionHead, FCNHead, LinearClassifier  # noqa: F401
from .build import build_model, HCMoCoModel  # noqa: F401
