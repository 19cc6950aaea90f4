# Submodules (core, gates, measurement) are imported directly to avoid
# circular imports with qbot_tpu.basis; `from qbot_tpu.ops import core` works.
