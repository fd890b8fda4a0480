from pdecontrol_tpu.ops import stencils, kuramoto, burgers  # noqa: F401
