from .dist import (all_gather_objects, gather_objects, get_rank,
                   get_world_size, initialize, is_main_process,
                   sync_batch_stats)
from .fsdp import (fsdp_shardings, fsdp_spec, jit_fsdp_step,
                   shard_train_state)
from .mesh import data_sharding, make_mesh, replicated, shard_batch
from .sharded_eval import make_sharded_tscd_eval, make_sharded_yolox_eval
from .tensor_parallel import (jit_tp_eval, jit_tp_step, shard_params_tp,
                              tp_shardings, tp_spec)

__all__ = ["all_gather_objects", "gather_objects", "get_rank",
           "get_world_size", "initialize", "is_main_process",
           "sync_batch_stats", "data_sharding", "make_mesh",
           "replicated", "shard_batch", "make_sharded_tscd_eval",
           "make_sharded_yolox_eval", "fsdp_shardings", "fsdp_spec",
           "jit_fsdp_step", "shard_train_state", "jit_tp_eval",
           "jit_tp_step", "shard_params_tp", "tp_shardings", "tp_spec"]
