from a2m.parallel.launch import (is_distributed, maybe_initialize,
                                 sync_global_moments)
from a2m.parallel.mesh import (TP_RULES, balanced_host_slices,
                               batch_sharding, global_put,
                               host_interval_slice, make_mesh,
                               make_sharded_train_steps, param_shardings,
                               param_spec, replicate_states, replicated,
                               shard_batch)

__all__ = ['TP_RULES', 'balanced_host_slices', 'batch_sharding',
           'global_put', 'host_interval_slice', 'is_distributed',
           'make_mesh',
           'make_sharded_train_steps', 'maybe_initialize', 'param_shardings',
           'param_spec', 'replicate_states', 'replicated', 'shard_batch',
           'sync_global_moments']
