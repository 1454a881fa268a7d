"""ekf_vio_tpu — a TPU-native tightly-coupled EKF visual-inertial odometry
engine (JAX / XLA / Pallas / pjit).

Built from scratch with the capabilities of the reference C++/ROS node
k-sheridan/ekf_vio (see SURVEY.md): a single EKF jointly estimating a
22-dim base camera state and every tracked feature (normalized image
coords + inverse depth) with full cross-correlations, fed by FAST corner
detection and pyramidal KLT tracking — redesigned TPU-first: static-shape
masked feature slots, dense blocked covariance algebra on the MXU, exact
autodiff Jacobians, Pallas front-end kernels, and mesh-sharded scaling.
"""

from ekf_vio_tpu.config import VIOConfig
from ekf_vio_tpu.core.filter import (
    FilterState,
    add_features,
    check_sigma,
    drop_features,
    init_state,
    predict,
    update_with_feature_positions,
)

__version__ = "0.1.0"

__all__ = [
    "VIOConfig",
    "FilterState",
    "init_state",
    "add_features",
    "drop_features",
    "predict",
    "update_with_feature_positions",
    "check_sigma",
]
