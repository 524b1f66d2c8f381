from vimz_tpu.parallel.mesh import fold_mesh, sharded_cross_term, sharded_msm_partials

__all__ = ["fold_mesh", "sharded_cross_term", "sharded_msm_partials"]
