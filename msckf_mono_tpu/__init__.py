"""msckf_mono_tpu: a TPU-native (JAX/XLA/Pallas) MSCKF visual-inertial
estimation engine with the capabilities of daniilidis-group/msckf_mono,
re-designed batch-first for TPU hardware. See SURVEY.md for the blueprint."""

__version__ = "0.1.0"
