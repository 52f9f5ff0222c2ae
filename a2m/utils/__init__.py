from a2m.utils.profiling import Timers, device_trace, trace_annotation

__all__ = ['Timers', 'device_trace', 'trace_annotation']
