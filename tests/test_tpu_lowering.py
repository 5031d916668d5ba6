"""Chip-free TPU lowering check for the production Pallas step.

The CPU suite exercises the packed kernel in interpret mode, which skips
TPU-specific lowering entirely; historically only the HG_TEST_TPU suite
(needs the relay) caught lowering regressions. jax's AOT path lowers for
the TPU platform on any host — it runs the full Pallas -> Mosaic MLIR
serialization and XLA HLO lowering for the production step (catching
grid/ shape/dtype/kernel-construction errors) without a device. The
Mosaic *backend* compile (vector layout assignment, e.g. the r2 "Invalid
relayout" class) still needs the real compiler, so this narrows, not
replaces, the TPU suite.
"""

import jax
import numpy as np
import pytest

from hypergen_tpu.models.sketcher import Sketcher, packed_row_words
from hypergen_tpu.params import SketchParams

PROD_NC = 32  # the 4.19 Mbp production bucket


@pytest.mark.parametrize("method", ["t1ha2", "mmhash"])
def test_packed_step_lowers_for_tpu(method):
    p = SketchParams(sketch_method=method)
    sk = Sketcher(p, use_pallas=True)
    assert sk.packed_mode
    step, cap, enc_cap, be_cap = sk._get_step(PROD_NC, validity="packed")
    B, C = sk.batch, sk.C
    W = packed_row_words(PROD_NC, C)
    pw = np.zeros((B, W), np.uint32)
    runs = np.full((B, sk.run_cap, 2), np.int32(0x7FFFFFFF), np.int32)
    n_pos = np.full(B, PROD_NC * C, np.int32)
    lowered = step.trace(pw, runs, n_pos).lower(lowering_platforms=("tpu",))
    text = lowered.as_text()
    # the fused kernel must actually be in there as a Mosaic custom call
    assert "tpu_custom_call" in text
