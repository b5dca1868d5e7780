"""stamp_tpu — a TPU-native whole-slide-image pipeline with the capabilities of STAMP.

The public surface (CLI commands, YAML config schema, on-disk ``.h5`` feature
format, checkpoint metadata, prediction-CSV columns) is drop-in compatible with
the reference (KatherLab/STAMP v2.5.0); the compute internals are JAX / XLA /
Pallas, designed mesh-first for TPU.

Version parity note: checkpoints record ``stamp_version`` and are gated on load
(reference: src/stamp/modeling/models/__init__.py:92-105), so we keep the same
version string as the reference release we are capability-matched to.
"""

__version__ = "2.5.0"
