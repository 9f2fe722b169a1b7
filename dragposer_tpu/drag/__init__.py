"""Drag-optimization runtime: latent-space pose optimization (the product)."""

from dragposer_tpu.drag.engine import (  # noqa: F401
    DragEngine,
    DragHyper,
    DragModel,
    DragState,
    frame_step,
    init_state,
    run_sequence,
)
