from a2m.parallel.mesh import (TP_RULES, balanced_host_slices,
                               batch_sharding, host_interval_slice,
                               make_mesh, make_sharded_train_steps,
                               param_shardings, param_spec, replicate_states,
                               replicated, shard_batch)

__all__ = ['TP_RULES', 'balanced_host_slices', 'batch_sharding',
           'host_interval_slice', 'make_mesh',
           'make_sharded_train_steps', 'param_shardings', 'param_spec',
           'replicate_states', 'replicated', 'shard_batch']
