"""PAMNet model family (full two-plex + efficient `_s` variant)."""

from pamnet_tpu.models.pamnet import init_pamnet, apply_pamnet, count_parameters

__all__ = ["init_pamnet", "apply_pamnet", "count_parameters"]
