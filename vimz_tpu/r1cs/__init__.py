from vimz_tpu.r1cs.builder import LC, Builder, R1CS

__all__ = ["LC", "Builder", "R1CS"]
