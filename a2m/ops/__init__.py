from a2m.ops.precise import precise_log, precise_sqrt

__all__ = ['precise_log', 'precise_sqrt']
