from .common import ceil_div, round_up, round_down, is_power_of_two

__all__ = ["ceil_div", "round_up", "round_down", "is_power_of_two"]
