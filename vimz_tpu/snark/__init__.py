from vimz_tpu.snark.spartan import (
    SpartanProof,
    SpartanProver,
    SpartanVerifier,
)

__all__ = ["SpartanProof", "SpartanProver", "SpartanVerifier"]
