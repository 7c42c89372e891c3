"""video3d_tpu: TPU-native 3D video -> 4K depth pipeline."""

__version__ = "0.1.0"
