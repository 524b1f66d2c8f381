from vimz_tpu.folding.nova import FoldingProver, FoldingVerifier, FoldProof

__all__ = ["FoldingProver", "FoldingVerifier", "FoldProof"]
