"""orbslam3_tpu: TPU-native visual-inertial SLAM engine (JAX/XLA/Pallas).

Feature-parity target: ORB-SLAM3 V1.0 (reference fork geoeo/ORB_SLAM3_V1.0);
see SURVEY.md for the component map.
"""

import os

import jax

# Persistent compilation cache: compiles on the tunneled TPU backend are
# expensive (tens of seconds per program); cache them across processes.
_cache_dir = os.environ.get(
    "ORBSLAM3_TPU_JAX_CACHE", os.path.expanduser("~/.cache/orbslam3_tpu_jax"))
try:
    os.makedirs(_cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
except Exception:  # pragma: no cover - cache is best-effort
    pass

__version__ = "0.1.0"
