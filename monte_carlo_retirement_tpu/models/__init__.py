from .retirement import SimParams, arithmetic_to_log_params

__all__ = ["SimParams", "arithmetic_to_log_params"]
