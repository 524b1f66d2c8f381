from vimz_tpu.utils.backend import force_cpu, cpu_mesh_devices

__all__ = ["force_cpu", "cpu_mesh_devices"]
