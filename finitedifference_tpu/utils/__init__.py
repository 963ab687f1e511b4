from finitedifference_tpu.utils.timers import phase_breakdown, Timer

__all__ = ["phase_breakdown", "Timer"]
