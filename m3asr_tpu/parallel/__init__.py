from m3asr_tpu.parallel.mesh import (make_mesh, moe_param_sharding,
                                     param_sharding, batch_sharding,
                                     feat_sharding, activation_sharding,
                                     constrain_act, pipeline)  # noqa: F401
