from m3asr_tpu.parallel.mesh import (make_mesh, moe_param_sharding,
                                     batch_sharding)  # noqa: F401
