from vimz_tpu.circuits.spec import CIRCUITS, StepCircuit, synthesize

__all__ = ["CIRCUITS", "StepCircuit", "synthesize"]
