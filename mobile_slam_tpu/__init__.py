"""mobile_slam_tpu — a TPU-native visual-inertial odometry framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the
VINS-Mono-derived C++ engine in chansoopark98/Mobile-SLAM: pyramidal-KLT
feature frontend, IMU preintegration, SfM + visual-inertial initialization,
sliding-window bundle adjustment with FEJ marginalization, four camera
models, a headless push-style VIOEngine API, EuRoC dataset ingestion,
TUM-format trajectory output, and an ATE/RPE evaluator.
"""

__version__ = "0.1.0"

from mobile_slam_tpu.config import (  # noqa: F401
    CameraConfig,
    EstimatorConfig,
    TrackerConfig,
    VIOConfig,
    load_config,
    validate_config,
)
