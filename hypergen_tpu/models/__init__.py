"""End-to-end jitted models: genome -> sketch HV, and sketch-DB comparators."""

from hypergen_tpu.models.sketcher import Sketcher, make_sketch_step  # noqa: F401
