from .adam_decay import AdamDecayState, adam_decay, reinit_moments

__all__ = ["adam_decay", "reinit_moments", "AdamDecayState"]
